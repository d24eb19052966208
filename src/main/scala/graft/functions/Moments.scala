package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** fourthMoment (reference `FourthMomentAggregationFunction.java`) as a
  * typed Spark `Aggregator` — the partial/merge/final contract of the
  * reference's `AggregationFunction` SPI, realized with the numerically
  * stable streaming central-moment updates (Pébay's parallel formulas).
  * Each partition streams its rows (reduce), partials merge pairwise
  * across partitions (merge) — associative, so the result is independent
  * of partitioning, which is what makes it safe on a 1000-executor job. */
object Moments {
  /** Central-moment state: count, mean, and 2nd..4th central sums. */
  final case class M(n: Long, mean: Double, m2: Double, m3: Double, m4: Double)

  private def update(s: M, x: Double): M = {
    val n1 = s.n
    val n = n1 + 1
    val delta = x - s.mean
    val dn = delta / n
    val dn2 = dn * dn
    val t1 = delta * dn * n1
    M(n,
      s.mean + dn,
      s.m2 + t1,
      s.m3 + t1 * dn * (n - 2) - 3 * dn * s.m2,
      s.m4 + t1 * dn2 * (n.toDouble * n - 3 * n + 3) + 6 * dn2 * s.m2 -
        4 * dn * s.m3)
  }

  private def combine(a: M, b: M): M = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val n = a.n + b.n
    val delta = b.mean - a.mean
    val dn = delta / n
    val na = a.n.toDouble; val nb = b.n.toDouble
    val m2 = a.m2 + b.m2 + delta * dn * na * nb
    val m3 = a.m3 + b.m3 +
      delta * dn * dn * na * nb * (na - nb) +
      3 * dn * (na * b.m2 - nb * a.m2)
    val m4 = a.m4 + b.m4 +
      delta * math.pow(dn, 3) * na * nb * (na * na - na * nb + nb * nb) +
      6 * dn * dn * (na * na * b.m2 + nb * nb * a.m2) +
      4 * dn * (na * b.m3 - nb * a.m3)
    M(n, a.mean + dn * nb, m2, m3, m4)
  }

  /** Final: the fourth central moment m4/n (the reference's result). */
  val fourthMoment: Aggregator[Double, M, Double] =
    new Aggregator[Double, M, Double] {
      def zero: M = M(0L, 0d, 0d, 0d, 0d)
      def reduce(s: M, x: Double): M = update(s, x)
      def merge(a: M, b: M): M = combine(a, b)
      def finish(s: M): Double = if (s.n == 0) Double.NaN else s.m4 / s.n
      def bufferEncoder: Encoder[M] = Encoders.product[M]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form: fourthMomentAgg(colOfDouble). */
  def fourthMomentAgg(c: Column): Column = udaf(fourthMoment).apply(c)
}
