package graft

import graft.functions.{Scalars, TextAnalysis => TA}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.GraftExpressions.{builder, vecDot}

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
    // Pinot dialect at the session-parser level, gated on
    // spark.graft.sql.dialect=pinot (strict passthrough otherwise)
    ext.injectParser((_, delegate) => new graft.sql.PinotParser(delegate))

    def reg(name: String, usage: String)(f: Seq[org.apache.spark.sql.Column]
      => org.apache.spark.sql.Column): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder(f)))

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
    reg("hamming64", "bit_count(xor) distance of two simhash longs") {
      a => TA.simHashDistance(a(0), a(1))
    }
  }
}
