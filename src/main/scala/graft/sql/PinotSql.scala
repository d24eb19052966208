package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pinot SQL dialect shim (SURVEY §7 step 4).
  *
  * The reference compiles SQL through Calcite's babel parser with a handful
  * of broker-side rewrites (`QueryRewriterFactory.java:36-39`) and dialect
  * quirks. Spark SQL already accepts ~95% of the surface; this shim rewrites
  * the Pinot-isms, registers Pinot-named functions, and applies the default
  * LIMIT 10 (`query.thrift:34`).
  *
  * Deliberately string/regex-level: the reference's own rewrites operate on
  * the parse tree of a *single-table* query language — the patterns below
  * are unambiguous there. A full Calcite-style dialect would ride a custom
  * Spark parser extension (SparkSessionExtensions.injectParser) — not needed
  * for the reference surface. */
object PinotSql {
  /** Rewrite a Pinot SQL string into Spark SQL. The long tail of
    * identically-named functions (abs, ceil, lower, year, md5, …) passes
    * through untouched — Spark resolves them natively. */
  def rewrite(sql: String): String = {
    var s = sql
    // TEXT_MATCH(col, 'expr') / TEXT_CONTAINS(col, 'word') → LIKE/RLIKE
    s = s.replaceAll("(?i)TEXT_CONTAINS\\s*\\(\\s*([\\w.]+)\\s*,\\s*'([^']*)'\\s*\\)",
      "contains($1, '$2')")
    s = s.replaceAll("(?i)TEXT_MATCH\\s*\\(\\s*([\\w.]+)\\s*,\\s*'([^']*)'\\s*\\)",
      "$1 RLIKE '$2'")
    // JSON_MATCH(col, '"$.path" = ''v''') → get_json_object equality
    s = s.replaceAll(
      "(?i)JSON_MATCH\\s*\\(\\s*([\\w.]+)\\s*,\\s*'\"([^\"]+)\"\\s*=\\s*''([^']*)''\\s*'\\s*\\)",
      "get_json_object($1, '$2') = '$3'")
    // REGEXP_LIKE(col, 'p') → col RLIKE 'p'
    s = s.replaceAll("(?i)REGEXP_LIKE\\s*\\(\\s*([\\w.]+)\\s*,\\s*'([^']*)'\\s*\\)",
      "$1 RLIKE '$2'")
    // IN_SUBQUERY(col, 'inner sql') → col IN (inner sql)
    s = s.replaceAll("(?i)IN_SUBQUERY\\s*\\(\\s*([\\w.]+)\\s*,\\s*'([^']*)'\\s*\\)\\s*=\\s*1",
      "$1 IN ($2)")
    // jsonExtractScalar(col, path, type) → CAST(get_json_object(..) AS type)
    s = s.replaceAll(
      "(?i)jsonExtractScalar\\s*\\(\\s*([\\w.]+)\\s*,\\s*'([^']*)'\\s*,\\s*'(INT|LONG|FLOAT|DOUBLE|STRING)'\\s*\\)",
      "CAST(get_json_object($1, '$2') AS $3)")
    s = s.replaceAll("(?i)\\bAS INT\\)", "AS INTEGER)")
    s = s.replaceAll("(?i)\\bAS LONG\\)", "AS BIGINT)")
    // DISTINCTCOUNT family → COUNT(DISTINCT col) / approx / theta sketch
    s = s.replaceAll("(?i)DISTINCTCOUNTHLL\\s*\\(", "approx_count_distinct(")
    s = s.replaceAll(
      "(?i)DISTINCTCOUNTTHETASKETCH\\s*\\(\\s*([^)]+)\\)",
      "CAST(theta_sketch_estimate(theta_sketch_agg($1)) AS BIGINT)")
    s = s.replaceAll("(?i)DISTINCTCOUNT(?:BITMAP)?\\s*\\(\\s*([^)]+)\\)",
      "COUNT(DISTINCT $1)")
    // firstWithTime/lastWithTime(value, timeCol, 'type') → min_by/max_by
    s = s.replaceAll(
      "(?i)FIRSTWITHTIME\\s*\\(\\s*([\\w.\"]+)\\s*,\\s*([\\w.\"]+)\\s*(?:,\\s*'[^']*')?\\s*\\)",
      "min_by($1, $2)")
    s = s.replaceAll(
      "(?i)LASTWITHTIME\\s*\\(\\s*([\\w.\"]+)\\s*,\\s*([\\w.\"]+)\\s*(?:,\\s*'[^']*')?\\s*\\)",
      "max_by($1, $2)")
    // identical-arity renames
    Seq("TOEPOCHSECONDS" -> "unix_timestamp",
      "FROMEPOCHSECONDS" -> "timestamp_seconds",
      "ARRAYLENGTH" -> "size",
      "JSONFORMAT" -> "to_json").foreach { case (from, to) =>
      s = s.replaceAll(s"(?i)\\b$from\\s*\\(", s"$to(")
    }
    s = s.replaceAll("(?i)MINMAXRANGE\\s*\\(\\s*([\\w.]+)\\s*\\)",
      "(max($1) - min($1))")
    s = s.replaceAll("(?i)PERCENTILE\\s*\\(\\s*([\\w.]+)\\s*,\\s*([0-9.]+)\\s*\\)",
      "percentile($1, $2 / 100.0)")
    // default LIMIT 10 on selections without an explicit LIMIT (the
    // reference caps every query; aggregations-without-group-by excluded)
    val hasLimit = "(?i)\\bLIMIT\\s+\\d+".r.findFirstIn(s).isDefined
    val isPlainAgg = "(?i)\\bGROUP\\s+BY\\b".r.findFirstIn(s).isEmpty &&
      "(?i)\\b(SUM|COUNT|MIN|MAX|AVG)\\s*\\(".r.findFirstIn(s).isDefined
    if (!hasLimit && !isPlainAgg) s = s + " LIMIT 10"
    s
  }

  /** Run a Pinot-dialect query against registered temp views. GAPFILL
    * selections route to the [[graft.operators.Gapfill]] plan (SURVEY §7
    * step 4); everything else goes through [[rewrite]] + spark.sql. */
  def sql(spark: SparkSession, pinotSql: String): DataFrame =
    gapfillPlan(spark, pinotSql).getOrElse(spark.sql(rewrite(pinotSql)))

  // GAPFILL(bucketCol, 'start', 'end', stepSec), key..., FILL(col,
  // 'FILL_PREVIOUS_VALUE' | 'FILL_DEFAULT_VALUE'[, default])... FROM table
  // — the canonical single-table shape of the reference's gapfill SQL
  // (GapfillUtils/GapfillProcessor), routed onto the spine+window plan.
  private val GapfillRe =
    ("(?is)^\\s*SELECT\\s+GAPFILL\\(\\s*([\\w.]+)\\s*,\\s*'([^']+)'\\s*," +
      "\\s*'([^']+)'\\s*,\\s*(\\d+)\\s*\\)\\s*,(.*?)\\s+FROM\\s+([\\w.]+)" +
      "\\s*$").r
  private val FillRe =
    "(?i)^FILL\\(\\s*([\\w.]+)\\s*,\\s*'FILL_(PREVIOUS_VALUE|DEFAULT_VALUE)'\\s*(?:,\\s*([^)]+))?\\)$".r

  /** Split on top-level commas (FILL(...) args keep their commas). */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.toSeq
  }

  private def gapfillPlan(spark: SparkSession, pinotSql: String)
  : Option[DataFrame] = pinotSql match {
    case GapfillRe(bucketCol, start, end, stepSec, items, table) =>
      import graft.operators.Gapfill
      import org.apache.spark.sql.functions.{expr, lit}
      val (fills, keys) = splitTop(items).partition(
        _.toUpperCase.startsWith("FILL("))
      val fillModes = fills.map {
        // the regex is (?i): normalize the captured mode before matching
        case FillRe(c, mode, d) => mode.toUpperCase match {
          case "PREVIOUS_VALUE" => c -> Gapfill.FillPrevious
          case "DEFAULT_VALUE" =>
            c -> Gapfill.FillDefault(if (d == null) lit(null) else expr(d))
          case other =>
            throw new IllegalArgumentException(s"bad FILL mode: $other")
        }
        case other =>
          throw new IllegalArgumentException(s"bad FILL spec: $other")
      }.toMap
      Some(Gapfill.gapfill(spark.table(table), bucketCol, keys,
        java.sql.Timestamp.valueOf(start), java.sql.Timestamp.valueOf(end),
        stepSec.toLong, fillModes))
    case _ => None
  }
}
