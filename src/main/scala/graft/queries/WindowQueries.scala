package graft.queries

import graft.{Par, ParSql, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window-function coverage (SURVEY §2.6; reference v2
  * `WindowAggregateOperator.java` — aggregate functions over
  * OVER(PARTITION BY [ORDER BY]) with RANGE UNBOUNDED frames; Spark is a
  * strict superset adding ROWS frames, ranking and lead/lag).
  *
  * Scale: one hash-exchange on the partition keys per OVER clause — the
  * same single-exchange plan `PinotWindowExchangeNodeInsertRule` builds.
  * Window sums over doubles ride the decimal lift so cumulative order
  * can't produce engine-dependent rounding.
  */
object WindowQueries {

  val all: Seq[Q] = Seq(

    // empty-OVER / partition-only aggregate attach (reference's
    // OVER(PARTITION BY) case) — per-row group stats
    Q("q_window_partition",
      (s, d) => {
        val w = Window.partitionBy(col("event_type"))
        Tables.events(s, d).select(
          col("event_id"), col("event_type"),
          count(lit(1)).over(w).as("type_n"),
          (sum(Par.money(col("value"))).over(w).cast("double") /
            count(lit(1)).over(w)).as("type_avg"),
          max(col("value")).over(w).as("type_max"),
          min(col("value")).over(w).as("type_min"))
      },
      Some("""SELECT event_id, event_type,
        COUNT(*) OVER w AS type_n,
        CAST(SUM(CAST("value" AS DECIMAL(12,2))) OVER w AS DOUBLE)
          / COUNT(*) OVER w AS type_avg,
        MAX("value") OVER w AS type_max, MIN("value") OVER w AS type_min
        FROM events WINDOW w AS (PARTITION BY event_type)""")),

    // cumulative sum, ROWS frame, unique ordering
    Q("q_window_cumsum",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          sum(Par.money(col("o_totalprice"))).over(w).cast("double")
            .as("cum_total"),
          count(lit(1)).over(w).as("cum_n"))
      },
      Some("""SELECT o_orderkey, o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
          AS cum_total,
        COUNT(*) OVER w AS cum_n
        FROM orders WINDOW w AS (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")),

    // RANGE frame over a tied order key (peers aggregate together —
    // exactly the reference's RANGE UNBOUNDED PRECEDING..CURRENT ROW)
    Q("q_window_range",
      (s, d) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_quantity"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("l_quantity"),
            sum(col("l_quantity").cast(DecimalType(6, 2))).over(w)
              .cast("double").as("range_sum"),
            count(lit(1)).over(w).as("range_n"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        CAST(SUM(CAST(l_quantity AS DECIMAL(6,2))) OVER w AS DOUBLE)
          AS range_sum,
        COUNT(*) OVER w AS range_n
        FROM lineitem WINDOW w AS (PARTITION BY l_returnflag
          ORDER BY l_quantity
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")),

    // ranking (Spark superset: rank/dense_rank/row_number)
    Q("q_window_rank",
      (s, d) => {
        val wTies = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc)
        val wUnique = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_orderpriority"),
          rank().over(wTies).as("rnk"),
          dense_rank().over(wTies).as("drnk"),
          row_number().over(wUnique).as("rn"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
        RANK() OVER (PARTITION BY o_orderpriority
          ORDER BY o_totalprice DESC) AS rnk,
        DENSE_RANK() OVER (PARTITION BY o_orderpriority
          ORDER BY o_totalprice DESC) AS drnk,
        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders""")),

    // lead/lag (Spark superset)
    Q("q_window_lead_lag",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        Tables.events(s, d).select(
          col("event_id"), col("user_id"),
          lag(col("value"), 1).over(w).as("prev_val"),
          lead(col("value"), 1).over(w).as("next_val"),
          lag(col("event_type"), 1, "none").over(w).as("prev_type"),
          round(col("value") - lag(col("value"), 1).over(w), 2).as("delta"))
      },
      Some(Par.evOracle("""SELECT event_id, user_id,
        LAG("value", 1) OVER w AS prev_val,
        LEAD("value", 1) OVER w AS next_val,
        COALESCE(LAG(event_type, 1) OVER w, 'none') AS prev_type,
        ROUND("value" - LAG("value", 1) OVER w, 2) AS delta
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)"""))),

    // windowed top-n-per-group (the reference's common
    // "top k per dimension" pattern: rank + filter)
    Q("q_window_topn_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.customer(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
            col("rn"))
      },
      Some("""SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
          ROW_NUMBER() OVER (PARTITION BY c_nationkey
            ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer) WHERE rn <= 3""")),

    // distribution functions (superset — reference v2 has aggregate-only
    // windows): ntile/percent_rank/cume_dist share one ordered window.
    // The unique (o_totalprice, o_orderkey) ordering makes every rank —
    // and therefore every bucket boundary — deterministic across engines.
    Q("q_window_distribution",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).as("quartile"),
          Par.r6(percent_rank().over(w)).as("pr"),
          Par.r6(cume_dist().over(w)).as("cd"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
        NTILE(4) OVER w AS quartile,
        ROUND(PERCENT_RANK() OVER w, 6) AS pr,
        ROUND(CUME_DIST() OVER w, 6) AS cd
        FROM orders WINDOW w AS (PARTITION BY o_orderpriority
          ORDER BY o_totalprice DESC, o_orderkey)""")),

    // sliding ROWS frame (superset — the reference allows only RANGE
    // UNBOUNDED frames): 4-row moving sum/avg per customer ordered by
    // order key; quantized-long sum keeps the doubles bit-deterministic
    Q("q_window_sliding",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
          .rowsBetween(-3, Window.currentRow)
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          (sum(Par.q2(col("o_totalprice"))).over(w).cast("double") / 1e2)
            .as("mov_sum"),
          count(lit(1)).over(w).as("mov_n"))
      },
      Some(s"""SELECT o_orderkey, o_custkey,
        CAST(SUM(${ParSql.q2("o_totalprice")}) OVER w AS DOUBLE)/1e2
          AS mov_sum,
        COUNT(*) OVER w AS mov_n
        FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""")),

    // empty OVER() — whole-input window aggregate (the reference's
    // third supported shape: WindowAggregateOperator with no partition)
    Q("q_window_global",
      (s, d) => Tables.nation(s, d).select(
        col("n_nationkey"), col("n_name"),
        count(lit(1)).over(Window.partitionBy()).as("n_total"),
        (sum(Par.q2(col("n_nationkey").cast("double")))
          .over(Window.partitionBy()).cast("double") / 1e2).as("key_sum")),
      Some(s"""SELECT n_nationkey, n_name,
        COUNT(*) OVER () AS n_total,
        CAST(SUM(${ParSql.q2("CAST(n_nationkey AS DOUBLE)")}) OVER ()
          AS DOUBLE)/1e2 AS key_sum
        FROM nation""")))
}
