package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation-function surface (SURVEY §2.5; reference enum
  * `AggregationFunctionType.java:31-97`, impls in
  * `pinot-core/.../query/aggregation/function/`).
  *
  * Spark's hash aggregate already implements the reference's
  * partial/combine/final contract (`aggregate → merge → extractFinalResult`)
  * — every helper here is a Column so it rides partial aggregation +
  * whole-stage codegen, and therefore scales: map-side combine first, one
  * shuffle on the group keys, no driver involvement.
  */
object Aggregates {
  /** minMaxRange(c) = max - min (MinMaxRangeAggregationFunction). */
  def minMaxRange(c: Column): Column = max(c) - min(c)

  /** firstWithTime / lastWithTime (FirstWithTimeAggregationFunction):
    * value at the earliest / latest time. */
  def firstWithTime(v: Column, t: Column): Column = min_by(v, t)
  def lastWithTime(v: Column, t: Column): Column = max_by(v, t)

  /** sumPrecision: exact BigDecimal sum (SumPrecisionAggregationFunction). */
  def sumPrecision(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(38, scale)))

  /** distinctCount (exact) / HLL approximation
    * (DistinctCount[HLL]AggregationFunction). */
  def distinctCount(c: Column): Column = count_distinct(c)
  def distinctCountHLL(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)
  def distinctSum(c: Column): Column = sum_distinct(c)
  def distinctAvg(c: Column): Column =
    sum_distinct(c) / count_distinct(c)

  /** distinctCountThetaSketch / RawThetaSketch
    * (DistinctCountThetaSketchAggregationFunction: mergeable DataSketches
    * theta state with set algebra across sketches — union/intersection/
    * a-not-b — evaluated broker-side). Spark 4 ships the identical
    * DataSketches theta surface natively: `theta_sketch_agg` is the raw
    * serialized sketch (mergeable across jobs/clusters), the set algebra
    * is `theta_union/intersection/difference[_agg]`, and the estimate
    * finishes it. Below the nominal-entry budget (2^lgK retained keys) a
    * theta sketch is in exact mode, so estimates equal exact distinct
    * counts — which is what makes the oracle gate possible. */
  def thetaSketch(c: Column, lgK: Int = 12): Column = theta_sketch_agg(c, lgK)
  def thetaUnionAgg(c: Column, lgK: Int = 12): Column = theta_union_agg(c, lgK)
  def thetaIntersectionAgg(c: Column): Column = theta_intersection_agg(c)
  def thetaEstimate(sketch: Column): Column = theta_sketch_estimate(sketch)
  def distinctCountThetaSketch(c: Column, lgK: Int = 12): Column =
    theta_sketch_estimate(theta_sketch_agg(c, lgK))

  /** distinctCountSmartHLL (DistinctCountSmartHLLAggregationFunction:
    * exact set until the value budget, HLL beyond). A theta sketch sized
    * to the budget has the identical contract — exact mode until 2^lgK
    * retained keys, estimate beyond — in ONE mergeable aggregate, where a
    * literal exact-then-convert switch would need a second pass. */
  def distinctCountSmart(c: Column, threshold: Int = 4096): Column = {
    val lgK = math.max(4, math.min(26,
      32 - Integer.numberOfLeadingZeros(math.max(1, threshold - 1))))
    theta_sketch_estimate(theta_sketch_agg(c, lgK)).cast("long")
  }

  /** segmentPartitionedDistinctCount
    * (SegmentPartitionedDistinctCountAggregationFunction: when the table
    * is PARTITIONED on the column, per-segment distinct counts sum to the
    * global distinct count — no cross-segment value-set merge). Spark
    * analog: per-partition exact distinct, then a sum of one long per
    * partition — the shuffle carries partition counts, never value sets.
    * Correct iff equal values never span partitions (the caller's layout
    * contract, same as the reference's `partitionedColumn` config: use on
    * ingest-bucketed / `repartition(col)`-ed data). At 100 TB this turns
    * a distinct-count's value-set exchange into 1 long per partition. */
  def segmentPartitionedDistinctCount(df: org.apache.spark.sql.DataFrame,
                                      c: String): org.apache.spark.sql.DataFrame = {
    // per-partition imperative dedup (the reference's per-segment
    // operator): a groupBy(partition_id).agg(count_distinct) formulation
    // would still shuffle the deduped VALUES; this ships exactly one long
    // per partition, like the reference's per-segment counts.
    val perPartition = df.select(col(c).cast("string"))
      .mapPartitions { it =>
        val seen = new java.util.HashSet[String]()
        it.foreach { r => if (!r.isNullAt(0)) seen.add(r.getString(0)) }
        Iterator.single(seen.size.toLong)
      }(org.apache.spark.sql.Encoders.scalaLong)
    perPartition.toDF("__n").agg(sum(col("__n")).as("distinct_cnt"))
  }

  /** percentileSmartTDigest (strategy-switching wrapper: raw values until
    * the threshold, sketch beyond). Native TypedImperativeAggregate —
    * KLL stands in for TDigest (same mergeable bounded-error contract,
    * already shipped in this environment's DataSketches). */
  def percentileSmart(c: Column, frac: Double,
                      threshold: Int = 4096): Column =
    org.apache.spark.sql.graft.SmartPercentileAgg.column(
      c.cast("double"), frac, threshold)

  /** percentile exact (PercentileAggregationFunction) and estimate
    * (PercentileEst/TDigest — Spark's approx_percentile is the
    * sketch-backed analog). */
  def percentileExact(c: Column, p: Double): Column = percentile(c, lit(p))
  def percentileEst(c: Column, p: Double, acc: Int = 10000): Column =
    percentile_approx(c, lit(p), lit(acc))

  /** Exact interpolated percentiles via a per-group SORT instead of
    * Spark's `percentile` aggregate (which builds a value→count hashmap
    * per group — heavy when most values are distinct). One ranked window
    * pass marks the two boundary rows per requested p, then a thin
    * aggregate interpolates: idx = (n−1)·p, result =
    * v[⌊idx⌋] + (idx−⌊idx⌋)·(v[⌈idx⌉]−v[⌊idx⌋]) — quantile_cont
    * semantics. Scale note: the group's rows sort within one task (same
    * constraint as any exact per-group percentile); genuinely huge single
    * groups should use percentileEst or a distributed-selection pass.
    * Nulls are ignored, matching both `percentile` and quantile_cont —
    * with one edge: a group whose values are ALL null disappears from the
    * output (the native aggregate would keep it with a null result);
    * left-join against the distinct group keys if those groups matter. */
  def percentilesBySort(df: DataFrame, groupCols: Seq[String], v: String,
                        ps: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val part = Window.partitionBy(groupCols.map(col): _*)
    val w = part.orderBy(col(v))
    val ranked = df.filter(col(v).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(part))
    // boundary row positions per percentile (1-based; __n is constant
    // within a group, so these are per-row predicates)
    def idxOf(p: Double): Column = (col("__n") - 1) * p
    val isBoundary = ps.map { case (_, p) =>
      col("__rn") === floor(idxOf(p)) + 1 || col("__rn") === ceil(idxOf(p)) + 1
    }.reduce(_ || _)
    val aggs = ps.map { case (name, p) =>
      val vLo = max(when(col("__rn") === floor(idxOf(p)) + 1, col(v)))
      val vHi = max(when(col("__rn") === ceil(idxOf(p)) + 1, col(v)))
      // frac from the group's n (max(__n) — constant per group)
      val idx = (max(col("__n")) - 1) * p
      val frac = idx - floor(idx)
      (vLo + frac * (vHi - vLo)).as(name)
    }
    ranked.filter(isBoundary)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** idSet(col): order-insensitive distinct membership set
    * (IdSetAggregationFunction serializes a bitmap; the relational
    * equivalent is a sorted distinct array). */
  def idSet(c: Column): Column = array_sort(collect_set(c))

  /** FILTER-clause aggregation (FilteredAggregationOperator):
    * agg(expr) FILTER (WHERE cond). */
  def sumIf(c: Column, cond: Column): Column = sum(when(cond, c))
  def countIf(cond: Column): Column = count(when(cond, 1))
  def avgIf(c: Column, cond: Column): Column = avg(when(cond, c))

  /** Fixed-width histogram (HistogramAggregationFunction): counts per bucket
    * over [lo, hi) in `nBuckets` equal bins, clamped at the edges.
    * Composable pre-groupBy bucket id — the groupBy(count) that follows is a
    * plain partial-aggregated shuffle. */
  def bucketOf(c: Column, lo: Double, hi: Double, nBuckets: Int): Column = {
    val w = (hi - lo) / nBuckets
    least(greatest(floor((c - lo) / w), lit(0)), lit(nBuckets - 1)).cast("int")
  }

  /** Histogram as a single aggregate: array of bucket counts. Statically
    * expanded per bucket (an aggregate can't reference a HOF lambda var). */
  def histogram(c: Column, lo: Double, hi: Double, nBuckets: Int): Column = {
    val b = bucketOf(c, lo, hi, nBuckets)
    array((0 until nBuckets).map(i =>
      coalesce(sum(when(b === i, 1L)), lit(0L))): _*)
  }

  /** Bucket index for ARBITRARY ascending edges (the reference's
    * histogram(col, ARRAY[e0, e1, …]) form): bucket i covers
    * [e_i, e_{i+1}); values below e_0 → bucket 0 clamp is NOT applied —
    * they fall out (-1), above the last edge → last bucket, matching
    * HistogramAggregationFunction's edge semantics. */
  def bucketOfEdges(c: Column, edges: Seq[Double]): Column =
    edges.init.zipWithIndex.foldRight(
      when(c >= edges.last, edges.size - 2).otherwise(-1): Column) {
      case ((e, i), els) =>
        when(c >= e && c < edges(i + 1), i).otherwise(els)
    }.cast("int")

  // ---- exact-moment machinery -------------------------------------------
  // The variance/skewness/kurtosis family (Variance/FourthMoment
  // AggregationFunction) is order-sensitive in double arithmetic. For
  // oracle-exact results we aggregate raw power sums in DECIMAL (exact,
  // commutative ⇒ deterministic under any partitioning — this is what makes
  // the answer reproducible on a 1000-executor cluster too), then finish the
  // formula in double. Spark's native var_pop/skewness remain available for
  // approximate use; specs assert they agree to 1e-9.

  /** Decimal power sums S1..S4 of a 2-dp column with |x| < 10^4. */
  def powerSums(c: Column): Seq[Column] = {
    val d = c.cast(DecimalType(6, 2))
    Seq(sum(d), sum(d * d), sum(d * d * d), sum(d * d * d * d))
  }

  /** Scaled-long power sums: quantize the 2-dp column to q = round(x·100),
    * take per-row powers in primitive longs, and de-scale after the exact
    * sum. Same exact values as [[powerSums]], but the hot path is integer
    * multiplies instead of the BigDecimal chain the (6,2)-decimal powers
    * fall into (precision > 18 from d³ up). The per-row q⁴ product bounds
    * the safe domain: q⁴ ≤ Long.Max requires |q| ≤ 55108, i.e. **|x| ≤
    * 551**. Inputs outside that raise an error at runtime (one primitive
    * compare per row) rather than wrapping silently — for wider columns use
    * [[powerSums]]. S3/S4 totals exceed long range quickly (q⁴ ≤ 9.2·10¹⁸
    * per row), so they accumulate in DECIMAL(38,0) — per-row values stay
    * compact longs, and the sums are exact at any row count. S1/S2 totals
    * fit long through ~10¹² rows. Returns s1..s4 as already-descaled
    * doubles; divide-after-cast order is part of the oracle contract (both
    * engines cast the exact integer sum to double, then divide by the same
    * power of ten). */
  def powerSumsScaled(c: Column): Seq[Column] = {
    // floor(Long.Max ** 0.25): beyond this q²·q² wraps in long arithmetic.
    val safeQ = 55108L
    val q0 = round(c * 100).cast("long")
    val q = when(abs(q0) > safeQ,
      raise_error(concat(lit("powerSumsScaled: |x| > 551 overflows q^4: "),
        q0.cast("string"))).cast("long")).otherwise(q0)
    val q2 = q * q
    Seq(
      sum(q).cast("double") / 1e2,
      sum(q2).cast("double") / 1e4,
      sum((q2 * q).cast(DecimalType(38, 0))).cast("double") / 1e6,
      sum((q2 * q2).cast(DecimalType(38, 0))).cast("double") / 1e8)
  }

  /** Finish (n, s1..s4 as double) into the stats family. Returns named
    * columns: var_pop, var_samp, stddev_pop, stddev_samp, skewness,
    * kurtosis (Spark/Pinot population skew & excess kurtosis). */
  def momentStats(n: Column, s1: Column, s2: Column, s3: Column, s4: Column)
  : Seq[Column] = {
    val mean = s1 / n
    val m2 = s2 / n - mean * mean
    val m3 = s3 / n - lit(3.0) * mean * (s2 / n) + lit(2.0) * mean * mean * mean
    val m4 = s4 / n - lit(4.0) * mean * (s3 / n) +
      lit(6.0) * mean * mean * (s2 / n) - lit(3.0) * mean * mean * mean * mean
    Seq(
      m2.as("var_pop"),
      (m2 * n / (n - lit(1.0))).as("var_samp"),
      sqrt(m2).as("stddev_pop"),
      sqrt(m2 * n / (n - lit(1.0))).as("stddev_samp"),
      (m3 / pow(m2, 1.5)).as("skewness"),
      (m4 / (m2 * m2) - lit(3.0)).as("kurtosis"))
  }
}
