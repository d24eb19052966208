package graft.queries

import graft.{Par, ParSql, Q, Tables}
import org.apache.spark.sql.functions._

/** Star Schema Benchmark flight, re-hosted on the TPC-H-ish testdata
  * (reference: `SSBQueryIntegrationTest.java:54-62` runs the 13-query SSB
  * set end-to-end as its benchmark-suite correctness gate;
  * `ssb/ssb_query_set.yaml`). SSB is a TPC-H derivative, so each flight
  * maps 1:1 onto our tables: Q1 = scan-filter-aggregate on the fact table,
  * Q2 = part/supplier dimension rollup, Q3 = customer×supplier geography
  * over time, Q4 = multi-dimension profit drill-down.
  *
  * Scale shape per flight: the fact table never shuffles for dimension
  * joins (explicit broadcast — dimensions are |dims| ≪ |facts| by star
  * design); one partial+final aggregate on the group keys; year extraction
  * rides the raw date column so partition pruning would fire on
  * date-partitioned layouts. */
object SsbQueries {
  // quantized-long revenue: price_q(≤1.1e7)·(100-disc_q)(≤100) ≤ 1.1e9
  // per row — primitive-long codegen, exact, scale 1e4 (see Par.q2/qsum)
  private val rev = Par.q2(col("l_extendedprice")) *
    (lit(100L) - Par.q2(col("l_discount")))
  private val revSql =
    s"${ParSql.q2("l_extendedprice")} * (100 - ${ParSql.q2("l_discount")})"

  def all: Seq[Q] = Seq(
    // SSB Q1.x: one-table filter + aggregate (discount-band revenue)
    Q("q_ssb_q1",
      (s, d) => Tables.lineitem(s, d)
        .filter(year(col("l_shipdate")) === 1995 &&
          col("l_discount").between(0.02, 0.04) && col("l_quantity") < 25)
        .agg(Par.qsum(Par.q2(col("l_extendedprice")) *
          Par.q2(col("l_discount")), 1e4).as("revenue"),
          count(lit(1)).as("n")),
      Some(s"""SELECT ${ParSql.qsum(
          s"${ParSql.q2("l_extendedprice")} * ${ParSql.q2("l_discount")}",
          "1e4")} AS revenue, COUNT(*) AS n
        FROM lineitem
        WHERE year(l_shipdate) = 1995
          AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 25""")),

    // SSB Q2.x: revenue per (year, brand) for one part type, via the
    // part dimension (broadcast) — fact side never shuffles pre-agg
    Q("q_ssb_q2",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_size") <= 10)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("l_shipdate")).as("yr"), col("p_brand"))
        .agg(Par.qsum(rev, 1e4).as("revenue"))
        .orderBy(col("yr"), col("p_brand")),
      Some(s"""SELECT year(l_shipdate) AS yr, p_brand,
          ${ParSql.qsum(revSql, "1e4")} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size <= 10
        GROUP BY 1, 2 ORDER BY yr, p_brand""")),

    // SSB Q3.x: customer-nation × supplier-nation revenue over time
    Q("q_ssb_q3",
      (s, d) => {
        val cust = broadcast(Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("c_nation")))
        val supp = broadcast(Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("s_nation")))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .filter(col("c_nation") === col("s_nation"))
          .groupBy(col("c_nation"), year(col("o_orderdate")).as("yr"))
          .agg(Par.qsum(rev, 1e4).as("revenue"), count(lit(1)).as("n"))
          .orderBy(col("yr"), col("c_nation"))
      },
      Some(s"""SELECT cn.n_name AS c_nation, year(o_orderdate) AS yr,
          ${ParSql.qsum(revSql, "1e4")} AS revenue, COUNT(*) AS n
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE cn.n_name = sn.n_name
        GROUP BY 1, 2 ORDER BY yr, c_nation""")),

    // SSB Q4.x: profit drill-down (revenue minus a retail-price cost
    // proxy; the testdata has no supplycost column) per (year, nation)
    Q("q_ssb_q4",
      (s, d) => {
        val cust = broadcast(Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("c_nation")))
        // fully quantized at scale 1e6: rev_q·100 = p(1-d)·1e6 and
        // qty_q·retail_q = q·r·1e4 = (q·r·0.01)·1e6 — same scale, exact
        // long arithmetic, bounded by 1.1e11 per row
        val profit = rev * lit(100L) -
          Par.q2(col("l_quantity")) * Par.q2(col("p_retailprice"))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(year(col("o_orderdate")).as("yr"), col("c_nation"))
          .agg(Par.qsum(profit, 1e6).as("profit"))
          .orderBy(col("yr"), col("c_nation"))
      },
      Some(s"""SELECT year(o_orderdate) AS yr, cn.n_name AS c_nation,
          ${ParSql.qsum(s"($revSql) * 100 - ${ParSql.q2("l_quantity")} * " +
            ParSql.q2("p_retailprice"), "1e6")}
          AS profit
        FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
        GROUP BY 1, 2 ORDER BY yr, c_nation""")))
}
