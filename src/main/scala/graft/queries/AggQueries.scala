package graft.queries

import graft.{Par, ParSql, Q, Tables}
import graft.functions.{Aggregates => Ag}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation operator coverage (SURVEY §2.5, reference
  * `AggregationFunctionType.java:31-97`). Every query is partial-agg +
  * single-shuffle shaped: Catalyst plans map-side combine before the
  * exchange on the group keys, which is the same partial/final contract the
  * reference's combine operators implement per segment/server. */
object AggQueries {

  val all: Seq[Q] = Seq(

    // count/min/max/sum/avg — TPC-H Q1 shape (the reference bench's
    // "sum group-by" template, contrib/pinot-druid-benchmark).
    Q("q_agg_tpch_q1",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        // quantized-long money arithmetic: qty/price/disc/tax are 2-dp →
        // exact as round(x·100) longs. Per-row products bounded by
        // price_q(≤1.1e7)·(100-disc_q)(≤100)·(100+tax_q)(≤110) ≤ 1.2e11 —
        // far inside long range; sums accumulate in DECIMAL(38,0).
        val qty = Par.q2(col("l_quantity"))
        val price = Par.q2(col("l_extendedprice"))
        val disc = Par.q2(col("l_discount"))
        val tax = Par.q2(col("l_tax"))
        l.filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            Par.qsum(qty, 1e2).as("sum_qty"),
            Par.qsum(price, 1e2).as("sum_base_price"),
            Par.qsum(price * (lit(100L) - disc), 1e4).as("sum_disc_price"),
            Par.qsum(price * (lit(100L) - disc) * (lit(100L) + tax), 1e6)
              .as("sum_charge"),
            (Par.qsum(qty, 1e2) / count(col("l_quantity"))).as("avg_qty"),
            (Par.qsum(price, 1e2) / count(col("l_extendedprice")))
              .as("avg_price"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${ParSql.qsum(ParSql.q2("l_quantity"), "1e2")} AS sum_qty,
        ${ParSql.qsum(ParSql.q2("l_extendedprice"), "1e2")} AS sum_base_price,
        ${ParSql.qsum(s"${ParSql.q2("l_extendedprice")} * (100 - ${ParSql.q2("l_discount")})", "1e4")} AS sum_disc_price,
        ${ParSql.qsum(s"${ParSql.q2("l_extendedprice")} * (100 - ${ParSql.q2("l_discount")}) * (100 + ${ParSql.q2("l_tax")})", "1e6")} AS sum_charge,
        (${ParSql.qsum(ParSql.q2("l_quantity"), "1e2")} / COUNT(l_quantity)) AS avg_qty,
        (${ParSql.qsum(ParSql.q2("l_extendedprice"), "1e2")} / COUNT(l_extendedprice)) AS avg_price,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""")),

    // global (no GROUP BY) aggregation — v1 AggregationOperator path
    Q("q_agg_global",
      (s, d) => Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        count_distinct(col("l_partkey")).as("nd_part"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        Par.dsum(col("l_extendedprice")).as("sum_price")),
      Some(s"""SELECT COUNT(*) AS n, COUNT(DISTINCT l_partkey) AS nd_part,
        MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
        ${ParSql.dsum("l_extendedprice")} AS sum_price FROM lineitem""")),

    // minMaxRange (MinMaxRangeAggregationFunction)
    Q("q_agg_minmaxrange",
      (s, d) => Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(min(col("l_extendedprice")).as("min_p"),
          max(col("l_extendedprice")).as("max_p"),
          Ag.minMaxRange(col("l_extendedprice")).as("range_p")),
      Some("""SELECT l_returnflag, MIN(l_extendedprice) AS min_p,
        MAX(l_extendedprice) AS max_p,
        MAX(l_extendedprice) - MIN(l_extendedprice) AS range_p
        FROM lineitem GROUP BY l_returnflag""")),

    // mode (ModeAggregationFunction) — deterministic tiebreak: highest value
    Q("q_agg_mode",
      (s, d) => {
        val counts = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_quantity")).count()
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("count").desc, col("l_quantity").desc)
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), col("l_quantity").as("mode_qty"))
      },
      Some("""SELECT l_returnflag, l_quantity AS mode_qty FROM (
        SELECT l_returnflag, l_quantity,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag
            ORDER BY COUNT(*) DESC, l_quantity DESC) AS rn
        FROM lineitem GROUP BY l_returnflag, l_quantity) WHERE rn = 1""")),

    // firstWithTime / lastWithTime (min_by/max_by on the time column)
    Q("q_agg_first_last",
      (s, d) => Tables.events(s, d).groupBy(col("user_id"))
        .agg(Ag.firstWithTime(col("value"), col("ts")).as("first_val"),
          Ag.lastWithTime(col("value"), col("ts")).as("last_val"),
          Ag.firstWithTime(col("event_type"), col("ts")).as("first_type"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
          count(lit(1)).as("n")),
      Some(Par.evOracle("""SELECT user_id,
        arg_min("value", ts) AS first_val, arg_max("value", ts) AS last_val,
        arg_min(event_type, ts) AS first_type,
        MIN(ts) AS first_ts, MAX(ts) AS last_ts, COUNT(*) AS n
        FROM ev GROUP BY user_id"""))),

    // distinctCount exact (DistinctCountAggregationFunction)
    Q("q_agg_distinct",
      (s, d) => Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(count_distinct(col("l_partkey")).as("nd_part"),
          count_distinct(col("l_suppkey")).as("nd_supp"),
          count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part,
        COUNT(DISTINCT l_suppkey) AS nd_supp, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag""")),

    // segmentPartitionedDistinctCount: per-partition distincts summed —
    // valid because the input is repartitioned ON the column (the
    // reference's partitionedColumn layout contract), so the shuffle
    // after the layout carries ONE long per partition, never value sets.
    Q("q_agg_partitioned_distinct",
      (s, d) => graft.functions.Aggregates.segmentPartitionedDistinctCount(
        Tables.orders(s, d).repartition(8, col("o_custkey")), "o_custkey"),
      Some("SELECT COUNT(DISTINCT o_custkey) AS distinct_cnt FROM orders")),

    // distinctSum / distinctAvg (exact decimal lift for determinism)
    Q("q_agg_distinct_sum",
      (s, d) => Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(sum_distinct(Par.money(col("l_quantity"))).cast("double")
          .as("dsum_qty"),
          (sum_distinct(Par.money(col("l_quantity"))) /
            count_distinct(col("l_quantity"))).cast("double").as("davg_qty")),
      Some("""SELECT l_returnflag,
        CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS dsum_qty,
        CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) /
             COUNT(DISTINCT l_quantity) AS DOUBLE) AS davg_qty
        FROM lineitem GROUP BY l_returnflag""")),

    // percentile exact (PercentileAggregationFunction; linear interpolation)
    Q("q_agg_percentile",
      (s, d) => {
        val pct = Ag.percentilesBySort(Tables.lineitem(s, d),
          Seq("l_returnflag"), "l_extendedprice",
          Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
        pct.select(col("l_returnflag"), Par.r6(col("p50")).as("p50"),
          Par.r6(col("p90")).as("p90"), Par.r6(col("p99")).as("p99"))
      },
      Some("""SELECT l_returnflag,
        ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
        ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
        FROM lineitem GROUP BY l_returnflag""")),

    // variance family from exact decimal moments (Variance/FourthMoment
    // AggregationFunction) — order-insensitive, cluster-reproducible
    Q("q_agg_variance",
      (s, d) => {
        val sums = Tables.lineitem(s, d).groupBy(col("l_returnflag"))
          .agg(count(lit(1)).cast("double").as("n"),
            Ag.powerSumsScaled(col("l_quantity")).zipWithIndex
              .map { case (c, i) => c.as(s"s${i + 1}") }: _*)
        val names = Seq("var_pop", "var_samp", "stddev_pop", "stddev_samp",
          "skewness", "kurtosis")
        val stats = Ag.momentStats(col("n"), col("s1"), col("s2"), col("s3"),
          col("s4")).zip(names).map { case (c, nm) => Par.r6(c).as(nm) }
        sums.select(col("l_returnflag") +: stats: _*)
      },
      Some(momentOracleSql)),

    // covariance / correlation from exact decimal cross-moments
    Q("q_agg_covar",
      (s, d) => {
        // scaled-long cross-moments: per-row products are primitive-long
        // multiplies on q = round(v·100); squared/cross totals overflow
        // long quickly (yq² ≤ 1.2·10¹⁴ per row), so those accumulate in
        // DECIMAL(38,0) — per-row values stay compact, sums stay exact at
        // any row count. Cast-then-descale order is the oracle contract.
        val xq = round(col("l_quantity") * 100).cast("long")
        val yq = round(col("l_extendedprice") * 100).cast("long")
        val m = Tables.lineitem(s, d).groupBy(col("l_returnflag")).agg(
          count(lit(1)).cast("double").as("n"),
          (sum(xq).cast("double") / 1e2).as("sx"),
          (sum(yq).cast("double") / 1e2).as("sy"),
          (sum((xq * xq).cast(DecimalType(38, 0))).cast("double") / 1e4)
            .as("sxx"),
          (sum((yq * yq).cast(DecimalType(38, 0))).cast("double") / 1e4)
            .as("syy"),
          (sum((xq * yq).cast(DecimalType(38, 0))).cast("double") / 1e4)
            .as("sxy"))
        val covp = col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n"))
        val vx = col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n"))
        val vy = col("syy") / col("n") - (col("sy") / col("n")) * (col("sy") / col("n"))
        m.select(col("l_returnflag"),
          Par.r6(covp).as("covar_pop"),
          Par.r6(covp * col("n") / (col("n") - 1)).as("covar_samp"),
          Par.r6(covp / sqrt(vx * vy)).as("corr"))
      },
      Some("""SELECT l_returnflag,
        ROUND(sxy/n - (sx/n)*(sy/n), 6) AS covar_pop,
        ROUND((sxy/n - (sx/n)*(sy/n)) * n / (n - 1), 6) AS covar_samp,
        ROUND((sxy/n - (sx/n)*(sy/n)) /
              SQRT((sxx/n - (sx/n)*(sx/n)) * (syy/n - (sy/n)*(sy/n))), 6) AS corr
        FROM (SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(x) AS DOUBLE)/1e2 AS sx, CAST(SUM(y) AS DOUBLE)/1e2 AS sy,
          CAST(SUM(x*x) AS DOUBLE)/1e4 AS sxx,
          CAST(SUM(y*y) AS DOUBLE)/1e4 AS syy,
          CAST(SUM(x*y) AS DOUBLE)/1e4 AS sxy
          FROM (SELECT l_returnflag,
            CAST(ROUND(l_quantity*100) AS BIGINT) AS x,
            CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y FROM lineitem)
          GROUP BY l_returnflag)""")),

    // boolAnd / boolOr (BooleanAnd/OrAggregationFunction)
    Q("q_agg_bool",
      (s, d) => Tables.lineitem(s, d).groupBy(col("l_linestatus"))
        .agg(bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_quantity") > 49).as("any_big"),
          bool_and(col("l_discount") < 0.05).as("all_small_disc")),
      Some("""SELECT l_linestatus, BOOL_AND(l_quantity > 0) AS all_pos,
        BOOL_OR(l_quantity > 49) AS any_big,
        BOOL_AND(l_discount < 0.05) AS all_small_disc
        FROM lineitem GROUP BY l_linestatus""")),

    // histogram (HistogramAggregationFunction): 10 equal bins over [0,50)
    Q("q_agg_histogram",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(Ag.bucketOf(col("l_quantity"), 0, 50, 10).as("bucket"))
        .agg(count(lit(1)).as("cnt")),
      Some("""SELECT CAST(LEAST(GREATEST(FLOOR(l_quantity / 5), 0), 9) AS INT)
        AS bucket, COUNT(*) AS cnt FROM lineitem GROUP BY 1""")),

    // FILTER-clause aggregation (FilteredAggregationOperator)
    Q("q_agg_filtered",
      (s, d) => Tables.lineitem(s, d).groupBy(col("l_returnflag")).agg(
        Ag.sumIf(Par.money(col("l_quantity")), col("l_discount") <= 0.02)
          .cast("double").as("sum_low_disc"),
        Ag.countIf(col("l_quantity") > 25).as("n_big"),
        Ag.sumIf(Par.money(col("l_extendedprice")), col("l_linestatus") === "F")
          .cast("double").as("sum_f")),
      Some("""SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
          FILTER (WHERE l_discount <= 0.02) AS DOUBLE) AS sum_low_disc,
        COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
          FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS sum_f
        FROM lineitem GROUP BY l_returnflag""")),

    // sumPrecision (SumPrecisionAggregationFunction — exact BigDecimal)
    Q("q_agg_sumprecision",
      (s, d) => Tables.orders(s, d).agg(
        Ag.sumPrecision(col("o_totalprice")).cast("string").as("sum_exact_str"),
        Ag.sumPrecision(col("o_totalprice")).cast("double").as("sum_exact")),
      Some("""SELECT
        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS sum_exact_str,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_exact
        FROM orders""")),

    // idSet (IdSetAggregationFunction → sorted distinct membership set)
    // membership set serialized to CSV: the driver's pandas compare cannot
    // sort array-typed columns, so the set crosses the gate as a string
    Q("q_agg_idset",
      (s, d) => Tables.nation(s, d)
        .join(Tables.region(s, d),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(Ag.idSet(col("n_name")), ",").as("nations")),
      Some("""SELECT r_name,
        array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name""")),

    // DISTINCT select (DistinctAggregationFunction / DistinctOperator)
    Q("q_agg_distinct_select",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus")).distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // GROUP BY + HAVING (broker HavingFilterHandler,
    // GroupByDataTableReducer.java:171)
    Q("q_agg_having",
      (s, d) => Tables.lineitem(s, d).groupBy(col("l_suppkey"))
        .agg(Par.dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .filter(col("sum_qty") > 15000),
      Some(s"""SELECT l_suppkey, ${ParSql.dsum("l_quantity")} AS sum_qty,
        COUNT(*) AS n FROM lineitem GROUP BY l_suppkey
        HAVING ${ParSql.dsum("l_quantity")} > 15000""")),

    // distinctCountHLL — engines' HLL impls differ, so the sketch value
    // itself is not cross-engine-comparable. TOLERANCE ORACLE instead:
    // the same query computes the exact distinct count (which DuckDB
    // replays bit-for-bit — the cross-engine anchor proving the scan and
    // grouping) and the estimate-within-3·rsd boolean, which the oracle
    // expects to be true. rsd=0.05 → bound 0.15.
    // Optimization round 19 (guide §2.3): two COUNT(DISTINCT x) over
    // DIFFERENT columns in one agg made Catalyst expand every row ×3
    // (one branch per distinct column + one for the HLLs) before the
    // shuffle. Computed instead as two pre-distincted single-key aggs
    // joined on the 3-row group key: exact counts are counts over the
    // distinct pairs, and the HLL estimate is IDENTICAL on distinct
    // input (register insertion is a max — duplicate-idempotent). Plan:
    // 2 pruned scans + 2 pair-distinct aggs, zero Expand.
    Q("q_agg_approx_hll",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        // count(col(c)), not count(lit(1)): COUNT(DISTINCT c) ignores
        // NULL c, so the pre-distincted rewrite must too (ADVICE r19 —
        // identical here since lineitem keys are non-null, but the
        // pattern must stay copy-safe for nullable columns)
        def side(c: String, nd: String, h: String) =
          li.select(col("l_returnflag"), col(c)).distinct()
            .groupBy(col("l_returnflag"))
            .agg(count(col(c)).as(nd),
              approx_count_distinct(col(c), 0.05).as(h))
        side("l_partkey", "nd_part", "hp")
          .join(side("l_orderkey", "nd_order", "ho"), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("nd_part"), col("nd_order"),
            (abs(col("hp") - col("nd_part")).cast("double") /
              col("nd_part") <= 0.15).as("hll_part_ok"),
            (abs(col("ho") - col("nd_order")).cast("double") /
              col("nd_order") <= 0.15).as("hll_order_ok"))
      },
      Some("""SELECT l_returnflag,
          COUNT(DISTINCT l_partkey) AS nd_part,
          COUNT(DISTINCT l_orderkey) AS nd_order,
          true AS hll_part_ok, true AS hll_order_ok
        FROM lineitem GROUP BY l_returnflag""")),

    // percentileEst / TDigest analog. With accuracy >= group size the GK
    // sketch is uncompressed and exact: the returned element equals the
    // discrete lower quantile, so this gates against quantile_disc
    // (valid while groups stay under 1e6 rows — true at the sf0.01 gate;
    // production accuracy trades this back to approximate)
    Q("q_agg_approx_percentile",
      (s, d) => Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(Ag.percentileEst(col("l_extendedprice"), 0.5, 1000000)
          .as("p50_est"),
          Ag.percentileEst(col("l_extendedprice"), 0.95, 1000000)
            .as("p95_est")),
      Some("""SELECT l_returnflag,
        quantile_disc(l_extendedprice, 0.5) AS p50_est,
        quantile_disc(l_extendedprice, 0.95) AS p95_est
        FROM lineitem GROUP BY l_returnflag""")),

    // IdSet set operations (distinctCountThetaSketch's AND/OR semantics,
    // exact bitmap-style variant): users who clicked ∩/∪ purchased
    Q("q_agg_idset_ops",
      (s, d) => {
        val sets = Tables.events(s, d).agg(
          collect_set(when(col("event_type") === "click", col("user_id")))
            .as("c"),
          collect_set(when(col("event_type") === "purchase", col("user_id")))
            .as("p"))
        sets.select(size(col("c")).as("n_click"),
          size(col("p")).as("n_purchase"),
          size(array_intersect(col("c"), col("p"))).as("n_both"),
          size(array_union(col("c"), col("p"))).as("n_either"))
      },
      Some("""WITH c AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'click'),
        p AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase')
        SELECT CAST((SELECT COUNT(*) FROM c) AS INT) AS n_click,
          CAST((SELECT COUNT(*) FROM p) AS INT) AS n_purchase,
          CAST((SELECT COUNT(*) FROM (SELECT * FROM c INTERSECT
            SELECT * FROM p)) AS INT) AS n_both,
          CAST((SELECT COUNT(*) FROM (SELECT * FROM c UNION
            SELECT * FROM p)) AS INT) AS n_either""")),

    // serialized IdSet sketch (IdSetAggregationFunction → bytes; set
    // algebra on the serialized form, inIdSet-style) — same answer as
    // q_agg_idset_ops through the sketch path
    Q("q_agg_idset_sketch",
      (s, d) => {
        import graft.functions.IdSetSketch
        val ev = Tables.events(s, d)
        val sk = ev.agg(
          IdSetSketch.idSetAgg(when(col("event_type") === "click",
            col("user_id"))).as("c"),
          IdSetSketch.idSetAgg(when(col("event_type") === "purchase",
            col("user_id"))).as("p"))
        sk.select(
          IdSetSketch.cardinality(col("c")).as("n_click"),
          IdSetSketch.cardinality(col("p")).as("n_purchase"),
          IdSetSketch.cardinality(IdSetSketch.intersect(col("c"), col("p")))
            .as("n_both"),
          IdSetSketch.cardinality(IdSetSketch.union(col("c"), col("p")))
            .as("n_either"))
      },
      Some("""WITH c AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'click'),
        p AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase')
        SELECT CAST((SELECT COUNT(*) FROM c) AS INT) AS n_click,
          CAST((SELECT COUNT(*) FROM p) AS INT) AS n_purchase,
          CAST((SELECT COUNT(*) FROM (SELECT * FROM c INTERSECT
            SELECT * FROM p)) AS INT) AS n_both,
          CAST((SELECT COUNT(*) FROM (SELECT * FROM c UNION
            SELECT * FROM p)) AS INT) AS n_either""")),

    // fourthMoment (custom Aggregator, partial/merge/final contract).
    // TOLERANCE ORACLE: the same query derives the exact m4 from scaled
    // power sums (op order mirrored in the oracle SQL → bit-identical
    // doubles, like q_agg_variance) and checks the streaming aggregator
    // against it at 1e-9 relative — Pébay's parallel updates are
    // algebraically exact, only float noise separates them.
    Q("q_agg_fourthmoment",
      (s, d) => {
        val ps = Ag.powerSumsScaled(col("l_quantity"))
        val base = Tables.lineitem(s, d).groupBy(col("l_returnflag"))
          .agg(graft.functions.Moments
              .fourthMomentAgg(col("l_quantity").cast("double"))
              .as("m4_stream"),
            count(lit(1)).cast("double").as("n"),
            ps(0).as("s1"), ps(1).as("s2"), ps(2).as("s3"), ps(3).as("s4"))
        val mean = col("s1") / col("n")
        val m4x = col("s4") / col("n") -
          lit(4.0) * mean * (col("s3") / col("n")) +
          lit(6.0) * mean * mean * (col("s2") / col("n")) -
          lit(3.0) * mean * mean * mean * mean
        base.select(col("l_returnflag"),
          round(m4x, 6).as("m4_exact"),
          (abs(col("m4_stream") - m4x) <=
            abs(m4x) * 1e-9 + 1e-9).as("m4_ok"))
      },
      Some("""-- reltol:1e-9
        SELECT l_returnflag,
          ROUND(s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n), 6) AS m4_exact,
          true AS m4_ok
        FROM (SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(q) AS DOUBLE)/1e2 AS s1,
          CAST(SUM(q*q) AS DOUBLE)/1e4 AS s2,
          CAST(SUM(q*q*q) AS DOUBLE)/1e6 AS s3,
          CAST(SUM(q*q*q*q) AS DOUBLE)/1e8 AS s4
          FROM (SELECT l_returnflag,
            CAST(ROUND(l_quantity*100) AS BIGINT) AS q FROM lineitem)
          GROUP BY l_returnflag)""")),

    // distinctCountRawHLL analog: serialized DataSketches HLL out of the
    // aggregate, mergeable across segments/partitions (rows-only gate;
    // the spec asserts the estimate's error bound + merge associativity)
    // distinctCountThetaSketch with broker-side set algebra: per-group
    // sketches of the partkey domain, then union / intersection ACROSS the
    // serialized sketches. lgK=14 (16384 nominal) keeps every sketch in
    // exact mode at oracle scale, so the estimates are exact counts; at
    // bench scale they degrade gracefully to estimates (rows still 1).
    Q("q_agg_theta",
      (s, d) => {
        val perGroup = Tables.lineitem(s, d).groupBy(col("l_returnflag"))
          .agg(Ag.thetaSketch(col("l_partkey"), 14).as("sk"))
        perGroup.agg(
          Ag.thetaEstimate(Ag.thetaUnionAgg(col("sk"), 14)).cast("long")
            .as("nd_union"),
          Ag.thetaEstimate(Ag.thetaIntersectionAgg(col("sk"))).cast("long")
            .as("nd_common"),
          count(lit(1)).as("n_groups"))
      },
      Some("""SELECT
        (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS nd_union,
        (SELECT COUNT(*) FROM (SELECT l_partkey FROM lineitem
           GROUP BY l_partkey HAVING COUNT(DISTINCT l_returnflag) =
             (SELECT COUNT(DISTINCT l_returnflag) FROM lineitem)))
          AS nd_common,
        (SELECT COUNT(DISTINCT l_returnflag) FROM lineitem) AS n_groups""")),

    // histogram with ARBITRARY edges (HistogramAggregationFunction's
    // explicit-bin form)
    Q("q_agg_histogram_edges",
      (s, d) => Tables.orders(s, d)
        .groupBy(Ag.bucketOfEdges(col("o_totalprice"),
          Seq(0, 50000, 150000, 300000, 1e9)).as("bucket"))
        .agg(count(lit(1)).as("cnt")),
      Some("""SELECT CASE
          WHEN o_totalprice >= 0 AND o_totalprice < 50000 THEN 0
          WHEN o_totalprice >= 50000 AND o_totalprice < 150000 THEN 1
          WHEN o_totalprice >= 150000 AND o_totalprice < 300000 THEN 2
          WHEN o_totalprice >= 1000000000 THEN 3
          WHEN o_totalprice >= 300000 AND o_totalprice < 1000000000 THEN 3
          ELSE -1 END AS bucket, COUNT(*) AS cnt
        FROM orders GROUP BY 1""")),

    // Grouping sets (superset — SURVEY §2.5 notes the reference supports
    // none; Spark's rollup/cube come free with the same partial-agg plan).
    // Group keys coalesce to a sentinel so subtotal rows sort/hash stably.
    Q("q_agg_rollup",
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), Par.qsum(Par.q2(col("l_quantity")), 1e2)
          .as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty")),
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        COALESCE(l_linestatus, 'ALL') AS ls, COUNT(*) AS n,
        ${ParSql.qsum(ParSql.q2("l_quantity"), "1e2")} AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    Q("q_agg_cube",
      (s, d) => Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("n")),
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS st,
        COALESCE(o_orderpriority, 'ALL') AS prio, COUNT(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // percentileRawEst: the serialized sketch's bytes are
    // library-specific, so the gate checks RANK ERROR instead: the exact
    // realized rank of the sketch's p50 estimate (fraction of group
    // values ≤ estimate, computed exactly in the same query) must sit
    // within KLL(k=200)'s ~1.65% rank-error band of 0.5 (3σ bound 0.05),
    // the sketch must have absorbed every row (n_ok), and the exact
    // group count anchors the scan cross-engine.
    Q("q_agg_percentile_raw",
      (s, d) => {
        import graft.functions.KllSketch
        val li = Tables.lineitem(s, d)
        val est = li.groupBy(col("l_returnflag"))
          .agg(KllSketch.percentileRawAgg(col("l_extendedprice")).as("sk"))
          .select(col("l_returnflag"),
            KllSketch.kllQuantile(col("sk"), lit(0.5)).as("p50_est"),
            KllSketch.kllN(col("sk")).as("n_sketch"),
            (length(col("sk")) > 0).as("has_sketch"))
        li.join(broadcast(est), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            sum(when(col("l_extendedprice") <= col("p50_est"), 1L)
              .otherwise(0L)).as("n_le"),
            first(col("n_sketch")).as("n_sketch"),
            first(col("has_sketch")).as("has_sketch"))
          .select(col("l_returnflag"), col("n_items"),
            (col("n_sketch") === col("n_items")).as("n_ok"),
            col("has_sketch"),
            (abs(col("n_le").cast("double") / col("n_items") - 0.5) <=
              0.05).as("rank_ok"))
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n_items, true AS n_ok,
          true AS has_sketch, true AS rank_ok
        FROM lineitem GROUP BY l_returnflag""")),

    // Datasketches HLL via Spark's native hll_sketch_agg — same
    // tolerance-oracle pattern as q_agg_approx_hll: exact distinct count
    // anchors, estimate within 3·rsd (lgK=12 → rsd≈1.6%, bound 5%).
    Q("q_agg_hll_sketch",
      (s, d) => Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey")))
          .as("est"),
          (length(hll_sketch_agg(col("l_partkey"))) > 0).as("has_sketch"),
          count_distinct(col("l_partkey")).as("nd_part"))
        .select(col("l_returnflag"), col("nd_part"), col("has_sketch"),
          (abs(col("est") - col("nd_part")).cast("double") /
            col("nd_part") <= 0.05).as("hll_ok")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part,
          true AS has_sketch, true AS hll_ok
        FROM lineitem GROUP BY l_returnflag""")))

  /** Oracle for q_agg_variance: identical moment formulas over exact
    * scaled-long power sums (sum the integer powers of q = round(x·100)
    * exactly, cast to double, then de-scale — same op order as
    * Aggregates.powerSumsScaled, so the doubles are bit-identical). */
  private def momentOracleSql: String =
    """SELECT l_returnflag,
      ROUND(s2/n - (s1/n)*(s1/n), 6) AS var_pop,
      ROUND((s2/n - (s1/n)*(s1/n)) * n / (n - 1), 6) AS var_samp,
      ROUND(SQRT(s2/n - (s1/n)*(s1/n)), 6) AS stddev_pop,
      ROUND(SQRT((s2/n - (s1/n)*(s1/n)) * n / (n - 1)), 6) AS stddev_samp,
      ROUND((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n)) /
            POW(s2/n - (s1/n)*(s1/n), 1.5), 6) AS skewness,
      ROUND((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
             - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n)) /
            ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3, 6)
        AS kurtosis
      FROM (SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(q) AS DOUBLE)/1e2 AS s1,
        CAST(SUM(q*q) AS DOUBLE)/1e4 AS s2,
        CAST(SUM(q*q*q) AS DOUBLE)/1e6 AS s3,
        CAST(SUM(q*q*q*q) AS DOUBLE)/1e8 AS s4
        FROM (SELECT l_returnflag, CAST(ROUND(l_quantity*100) AS BIGINT) AS q
          FROM lineitem) GROUP BY l_returnflag)"""
}
