package graft

import graft.functions.{Scalars, TextAnalysis => TA}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExpressions.{asColumn, builder, builderRaw, litString, vecDot}

/** SparkSessionExtensions hook (SURVEY §2.10 / custom-operator ladder):
  * registers the engine's Pinot-named + training-pipeline functions into
  * the session FunctionRegistry, so the SQL surface
  * (`spark.sql("SELECT lang_id(text) ...")` / PinotSql shim output) resolves
  * them natively. Each registration lifts the codegen-friendly Column
  * implementation — no UDF wrapping, the planner sees the same expression
  * trees the Scala API builds.
  *
  * Wire-up: `SparkSession.builder.withExtensions(new GraftExtensions)`
  * or config `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // TimePredicateFilterOptimizer analog: unwraps time functions in
    // predicates so pushdown/pruning reach the raw time column
    ext.injectOptimizerRule(_ => graft.rules.TimePredicateRewrite())
    // star-tree plan routing: fitting aggregates answered from registered
    // materialized summaries instead of the fact scan
    ext.injectOptimizerRule(_ => graft.rules.StarTreeRoute())
    // JsonStatementOptimizer analog: N json paths over one column share
    // one document parse per row. PreCBO (after the pushdown fixpoint)
    // on purpose — see the rule's scaladoc
    ext.injectPreCBORule(_ => graft.rules.JsonSharedParse())
    // TEXT_MATCH routing: registered postings indexes answer SQL
    // text_match filters (semi-join plan); everything else lowers per-row.
    // Resolution-time so lowered Column trees pass through the analyzer.
    ext.injectResolutionRule(_ => graft.rules.TextMatchRoute())
    ext.injectResolutionRule(_ => graft.rules.JsonIndexRoute())
    // Pinot dialect at the session-parser level, gated on
    // spark.graft.sql.dialect=pinot (strict passthrough otherwise)
    ext.injectParser((_, delegate) => new graft.sql.PinotParser(delegate))
    // erases the per-statement query-options marker at physical planning
    // (parser binds options into the plan; StarTreeRoute consumes them)
    ext.injectPlannerStrategy(_ => graft.sql.GraftOptionsStrategy)

    def reg(name: String, usage: String)(f: Seq[org.apache.spark.sql.Column]
      => org.apache.spark.sql.Column): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder(f)))

    def regRaw(name: String, usage: String)(
      f: Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.Column): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builderRaw(f)))

    // ---- Pinot SQL function surface (QueryRewriterFactory parity) ----
    // SQL function resolution is case-insensitive, so DISTINCTCOUNT(expr)
    // parses with arbitrary nested arguments and resolves here — the
    // dialect needs no string rewriting for any of these. Only PERCENTILE
    // (0-100 fraction, collides with Spark's) stays a parser-level
    // rewrite (PinotAst), gated on spark.graft.sql.dialect.
    reg("distinctcount", "exact distinct count (Pinot DISTINCTCOUNT)") {
      a => count_distinct(a(0))
    }
    reg("distinctcountbitmap", "exact distinct count (bitmap variant)") {
      a => count_distinct(a(0))
    }
    reg("distinctcounthll", "approximate distinct count (HLL)") {
      a => approx_count_distinct(a(0))
    }
    reg("distinctcountthetasketch", "theta-sketch distinct count") {
      a => theta_sketch_estimate(theta_sketch_agg(a(0))).cast("long")
    }
    reg("minmaxrange", "max(x) - min(x)") {
      a => max(a(0)) - min(a(0))
    }
    reg("percentileest", "approximate percentile, fraction in 0-100") {
      a => percentile_approx(a(0), a(1) / 100.0, lit(1000))
    }
    reg("percentiletdigest", "approximate percentile, fraction in 0-100") {
      a => percentile_approx(a(0), a(1) / 100.0, lit(1000))
    }
    reg("firstwithtime", "value at minimum time (3rd type arg ignored)") {
      a => min_by(a(0), a(1))
    }
    reg("lastwithtime", "value at maximum time (3rd type arg ignored)") {
      a => max_by(a(0), a(1))
    }
    reg("toepochseconds", "timestamp → epoch seconds") {
      a => unix_timestamp(a(0))
    }
    reg("fromepochseconds", "epoch seconds → timestamp") {
      a => timestamp_seconds(a(0))
    }
    // ---- Pinot datetime transforms (DateTimeFunctions.java names) ----
    regRaw("datetimeconvert",
      "dateTimeConvert(col, inFmt, outFmt, granularity) — " +
        "'size:UNIT:FORMAT[:pattern]' spec strings") { args =>
      Scalars.dateTimeConvert(asColumn(args(0)),
        litString(args(1), "dateTimeConvert input format"),
        litString(args(2), "dateTimeConvert output format"),
        litString(args(3), "dateTimeConvert granularity"))
    }
    regRaw("timeconvert",
      "timeConvert(col, fromUnit, toUnit) epoch unit conversion") { args =>
      Scalars.timeConvert(asColumn(args(0)),
        litString(args(1), "timeConvert from unit"),
        litString(args(2), "timeConvert to unit"))
    }
    regRaw("datetrunc",
      "dateTrunc(unit, epochValue[, timeUnit]) calendar truncation (UTC)"
    ) { args =>
      val unit = litString(args(0), "dateTrunc unit")
      if (args.length >= 3)
        Scalars.dateTrunc(unit, asColumn(args(1)),
          litString(args(2), "dateTrunc time unit"))
      else Scalars.dateTrunc(unit, asColumn(args(1)))
    }
    regRaw("todatetime",
      "toDateTime(epochMillis, pattern) — format epoch millis") { args =>
      Scalars.toDateTime(asColumn(args(0)),
        litString(args(1), "toDateTime pattern"))
    }
    regRaw("fromdatetime",
      "fromDateTime(dateString, pattern) — parse to epoch millis") { args =>
      Scalars.fromDateTime(asColumn(args(0)),
        litString(args(1), "fromDateTime pattern"))
    }
    reg("yearofweek", "ISO week-year of a timestamp") {
      a => Scalars.yearOfWeek(a(0))
    }
    reg("yow", "ISO week-year of a timestamp (alias)") {
      a => Scalars.yearOfWeek(a(0))
    }
    reg("toepochminutes", "timestamp → epoch minutes") {
      a => Scalars.toEpochMinutes(a(0))
    }
    reg("toepochhours", "timestamp → epoch hours") {
      a => Scalars.toEpochHours(a(0))
    }
    reg("toepochdays", "timestamp → epoch days") {
      a => Scalars.toEpochDays(a(0))
    }
    reg("fromepochdays", "epoch days → timestamp") {
      a => Scalars.fromEpochDays(a(0))
    }

    reg("arraylength", "array cardinality") { a => size(a(0)) }
    reg("jsonformat", "struct/map → json string") { a => to_json(a(0)) }
    reg("mapvalue", "map value lookup (null when absent)") {
      a => Scalars.mapValue(a(0), a(1))
    }
    regRaw("regexpextract",
      "regexpExtract(value, regexp[, group[, default]]): group of first " +
        "match, default when no match") { args =>
      val pattern = litString(args(1), "regexpExtract pattern")
      val group = if (args.length > 2)
        litString(args(2), "regexpExtract group").toInt else 0
      val default = if (args.length > 3)
        litString(args(3), "regexpExtract default") else ""
      Scalars.regexpExtract(asColumn(args(0)), pattern, group, default)
    }
    reg("text_contains", "native text containment") {
      a => contains(a(0), a(1))
    }
    regRaw("text_match",
      "Lucene grammar text match: AND/OR/NOT, \"phrase\", wildcards, fuzzy~N"
    ) { args =>
      // resolves to a marker; TextMatchRoute lowers it onto a registered
      // postings index (semi-join) or to the per-row tree. The query
      // string must parse at registration time so bad grammar fails fast.
      val q = litString(args(1), "TEXT_MATCH query")
      graft.operators.TextMatch.parse(q)
      asColumn(graft.rules.TextMatchMarker(args(0), q))
    }
    regRaw("json_match",
      "JSON_MATCH predicate: nested paths + [*] array wildcards") { args =>
      // resolves to a marker; JsonIndexRoute lowers it onto a registered
      // json posting table (semi-join) or to the per-row jsonpath tree.
      // The predicate must parse at registration time so bad grammar
      // fails fast.
      val p = litString(args(1), "JSON_MATCH predicate")
      Scalars.jsonMatch(lit(""), p) // grammar validation only
      asColumn(graft.rules.JsonMatchMarker(args(0), p))
    }
    regRaw("jsonextractscalar",
      "json path extraction with Pinot type name cast") { args =>
      val t = litString(args(2), "jsonExtractScalar type").toUpperCase match {
        case "INT" => "int"
        case "LONG" => "long"
        case "FLOAT" => "float"
        case "DOUBLE" => "double"
        case "STRING" => "string"
        case other => throw new IllegalArgumentException(
          s"unsupported jsonExtractScalar type $other")
      }
      Scalars.jsonExtractScalar(asColumn(args(0)),
        litString(args(1), "jsonExtractScalar path")).cast(t)
    }

    reg("vec_dot", "dot product of two float vectors") {
      a => vecDot(a(0), a(1))
    }
    reg("vec_cosine", "cosine similarity of two float vectors") {
      a => graft.functions.Vectors.cosine(a(0), a(1))
    }
    reg("hash60", "deterministic 60-bit md5-derived hash") {
      a => Scalars.hash60(a(0))
    }
    reg("hamming_distance", "hamming distance of equal-length strings") {
      a => Scalars.hammingDistance(a(0), a(1))
    }
    reg("strcmp", "three-way string compare") {
      a => Scalars.strcmp(a(0), a(1))
    }
    reg("lang_id", "stopword-heuristic language id") {
      a => TA.langId(a(0))
    }
    reg("canonicalize",
      "dedup canonicalization: lowercase, non-alnum -> space, collapse") {
      a => graft.operators.Dedup.canonicalize(a(0))
    }
    reg("nfc_normalize", "Unicode NFC normalization (UAX #15)") {
      a => TA.nfcNormalize(a(0))
    }
    reg("quality_score", "composite document quality in [0,1]") {
      a => TA.qualityScore(a(0))
    }
    reg("token_count", "whitespace token count") {
      a => TA.tokenCount(a(0))
    }
    reg("doc_fingerprint", "min-hash document fingerprint") {
      a => TA.fingerprint(a(0))
    }
    reg("simhash16", "16-bit simhash of text") {
      a => TA.simHash(a(0), 16)
    }
    reg("subword_count", "BPE-ish subword estimate (ceil(chars/4) per token)") {
      a => TA.subwordCount(a(0))
    }
    reg("gopher_signals",
      "Gopher quality-rule struct (symbol/bullet/ellipsis/alpha/stopword)") {
      a => TA.gopherSignals(a(0))
    }
    reg("image_hash", "64-bit perceptual aHash of an image binary") {
      a => graft.operators.Multimodal.imageHash(a(0))
    }
    reg("hamming64", "bit_count(xor) distance of two simhash longs") {
      a => TA.simHashDistance(a(0), a(1))
    }
    reg("code_signals",
      "StarCoder code-quality struct (line metrics + threshold conjunct)") {
      a => TA.codeSignals(a(0))
    }
    reg("script_profile",
      "Unicode-script fraction struct + dominant script label") {
      a => TA.scriptProfile(a(0))
    }
    reg("fix_encoding", "mojibake repair (ftfy fix_encoding core)") {
      a => TA.fixEncoding(a(0))
    }
  }
}
