package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * All ops are Catalyst higher-order functions (`zip_with` + `aggregate`) —
  * codegen'd, null-safe, and distributed; no UDFs, no driver-side loops.
  * Sums run left-to-right in both Spark and DuckDB's `list_sum`, which keeps
  * the double arithmetic bit-comparable for the oracle gate.
  */
object Vectors {
  /** Σ aᵢ·bᵢ in double precision — native codegen'd expression (primitive
    * float loop in whole-stage codegen; see
    * org.apache.spark.sql.graft.VecDotProduct). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftExpressions.vecDot(a, b)

  /** HOF formulation of [[dot]] — interpreted; kept as the reference
    * implementation the native expression is spec-checked against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]. */
  /** Zero-norm guard: an all-zero vector yields NULL (SQL's answer for
    * an undefined similarity), never 0/0 = NaN — NaN sorts GREATEST in
    * Spark, so an unguarded NaN would outrank every real match and
    * pass every `>= cut` gate (ADVICE r14). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / org.apache.spark.sql.functions.nullif(
      norm2(a) * norm2(b), org.apache.spark.sql.functions.lit(0.0))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Sign-bit bucket key from `nBits` fixed coordinates — the cheap
    * random-hyperplane LSH used by the bucketed ANN path (coordinates of a
    * random embedding are already N(0,1)-ish, so axis-aligned planes are a
    * valid draw). Scale path: candidates are co-bucketed, so the pair join
    * is an equi-join on this key instead of a cross join. */
  def signBucket(a: Column, nBits: Int): Column =
    (0 until nBits).map(i =>
      when(element_at(a, i + 1) >= 0f, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)
}
