package graft.queries

import graft.{Par, ParSql, Q, Tables}
import org.apache.spark.sql.Column
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
  // Q1.x revenue variant: extendedprice × discount (the SSB definition
  // for the flight-1 band queries), same 1e4 quantization
  private val rev1 = Par.q2(col("l_extendedprice")) *
    Par.q2(col("l_discount"))
  private val rev1Sql =
    s"${ParSql.q2("l_extendedprice")} * ${ParSql.q2("l_discount")}"
  // Q4.x profit: rev·100 − qty_q·retail_q, both at scale 1e6 (see q_ssb_q4)
  private val profit = rev * lit(100L) -
    Par.q2(col("l_quantity")) * Par.q2(col("p_retailprice"))
  private val profitSql = s"($revSql) * 100 - ${ParSql.q2("l_quantity")} * " +
    ParSql.q2("p_retailprice")

  // SSB dimension analogs over the TPC-H-ish testdata. The reference's
  // star has customer/supplier city+nation+region hierarchies and a part
  // mfgr→category→brand rollup; here nation/region come from the real
  // dims and CITY is a deterministic sub-nation bucket
  // `n_name#(key mod k)` — replayed verbatim by the DuckDB oracle — so
  // the city-grained flights exercise the same finer-than-nation
  // grouping/filter shapes. p_type (6 values) stands in for the
  // category/mfgr tiers, p_brand (~25 values) for P_BRAND1.
  private def custDim(s: org.apache.spark.sql.SparkSession, d: String) =
    broadcast(Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name").as("c_nation"),
        col("r_name").as("c_region"),
        concat(col("n_name"), lit("#"), col("c_custkey") % 4)
          .as("c_city")))
  private def suppDim(s: org.apache.spark.sql.SparkSession, d: String) =
    broadcast(Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("n_name").as("s_nation"),
        col("r_name").as("s_region"),
        concat(col("n_name"), lit("#"), col("s_suppkey") % 2)
          .as("s_city")))
  // oracle twins of the dim CTEs
  private val custDimSql =
    """cd AS (SELECT c_custkey, n_name AS c_nation, r_name AS c_region,
         n_name || '#' || (c_custkey % 4) AS c_city
       FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey)"""
  private val suppDimSql =
    """sd AS (SELECT s_suppkey, n_name AS s_nation, r_name AS s_region,
         n_name || '#' || (s_suppkey % 2) AS s_city
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey)"""

  /** Q2.x skeleton: fact ⋈ broadcast(part-filter) ⋈ broadcast(supp-
    * region filter) → (yr, p_brand, revenue). Only the filters differ
    * across the flight — exactly the reference's selectivity ladder. */
  private def q2Flight(name: String, partFilter: Column, partFilterSql: String,
                       sRegion: String): Q =
    Q(name,
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(partFilter)),
          col("l_partkey") === col("p_partkey"))
        .join(suppDim(s, d).filter(col("s_region") === sRegion),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("l_shipdate")).as("yr"), col("p_brand"))
        .agg(Par.qsum(rev, 1e4).as("revenue"))
        .orderBy(col("yr"), col("p_brand")),
      Some(s"""WITH $suppDimSql
        SELECT year(l_shipdate) AS yr, p_brand,
          ${ParSql.qsum(revSql, "1e4")} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN sd ON l_suppkey = s_suppkey
        WHERE $partFilterSql AND s_region = '$sRegion'
        GROUP BY 1, 2 ORDER BY yr, p_brand"""))

  /** Q3.x skeleton: fact ⋈ orders ⋈ broadcast(cust) ⋈ broadcast(supp),
    * geography filters tighten region → nation → city across the
    * flight; grouping follows the filter grain. */
  private def q3Flight(name: String, grpC: String, grpS: String,
                       filt: Column, filtSql: String,
                       timeFilt: Column, timeFiltSql: String): Q =
    Q(name,
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(custDim(s, d), col("o_custkey") === col("c_custkey"))
        .join(suppDim(s, d), col("l_suppkey") === col("s_suppkey"))
        .filter(filt && timeFilt)
        .groupBy(col(grpC), col(grpS), year(col("o_orderdate")).as("yr"))
        .agg(Par.qsum(rev, 1e4).as("revenue"))
        .orderBy(col("yr").asc, col("revenue").desc, col(grpC), col(grpS)),
      Some(s"""WITH $custDimSql, $suppDimSql
        SELECT $grpC, $grpS, year(o_orderdate) AS yr,
          ${ParSql.qsum(revSql, "1e4")} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN cd ON o_custkey = c_custkey
          JOIN sd ON l_suppkey = s_suppkey
        WHERE ($filtSql) AND ($timeFiltSql)
        GROUP BY 1, 2, 3 ORDER BY yr, revenue DESC, $grpC, $grpS"""))

  /** Q4.x skeleton: the 4-dim profit drill-down; filters and grouping
    * tighten across the flight. */
  private def q4Flight(name: String, grp: Seq[(Column, String, String)],
                       filt: Column, filtSql: String): Q =
    Q(name,
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(custDim(s, d), col("o_custkey") === col("c_custkey"))
        .join(suppDim(s, d), col("l_suppkey") === col("s_suppkey"))
        .filter(filt)
        .groupBy(year(col("o_orderdate")).as("yr") +:
          grp.map { case (c, _, n) => c.as(n) }: _*)
        .agg(Par.qsum(profit, 1e6).as("profit"))
        .orderBy(col("yr") +: grp.map(g => col(g._3)): _*),
      Some(s"""WITH $custDimSql, $suppDimSql
        SELECT year(o_orderdate) AS yr,
          ${grp.map(g => s"${g._2} AS ${g._3}").mkString(", ")},
          ${ParSql.qsum(profitSql, "1e6")} AS profit
        FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN cd ON o_custkey = c_custkey
          JOIN sd ON l_suppkey = s_suppkey
        WHERE $filtSql
        GROUP BY ${(1 to grp.size + 1).mkString(", ")}
        ORDER BY yr, ${grp.map(_._3).mkString(", ")}"""))

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
        GROUP BY 1, 2 ORDER BY yr, c_nation""")),

    // ---- the full 13-query SSB flight (ssb_query_set.yaml:24-94),
    // re-hosted: each variant keeps the reference's selectivity/grouping
    // ladder; years/bands are shifted into the testdata's 1995-2001
    // domain. Q1.x: one-table band scans at year / yearmonth / week
    // grain — the discount·price revenue definition.
    Q("q_ssb_q1_1",
      (s, d) => Tables.lineitem(s, d)
        .filter(year(col("l_shipdate")) === 1996 &&
          col("l_discount").between(0.01, 0.03) && col("l_quantity") < 25)
        .agg(Par.qsum(rev1, 1e4).as("revenue")),
      Some(s"""SELECT ${ParSql.qsum(rev1Sql, "1e4")} AS revenue
        FROM lineitem WHERE year(l_shipdate) = 1996
          AND l_discount BETWEEN 0.01 AND 0.03 AND l_quantity < 25""")),
    Q("q_ssb_q1_2",
      (s, d) => Tables.lineitem(s, d)
        .filter(year(col("l_shipdate")) === 1997 &&
          month(col("l_shipdate")) === 1 &&
          col("l_discount").between(0.04, 0.06) &&
          col("l_quantity").between(26, 35))
        .agg(Par.qsum(rev1, 1e4).as("revenue")),
      Some(s"""SELECT ${ParSql.qsum(rev1Sql, "1e4")} AS revenue
        FROM lineitem WHERE year(l_shipdate) = 1997 AND month(l_shipdate) = 1
          AND l_discount BETWEEN 0.04 AND 0.06
          AND l_quantity BETWEEN 26 AND 35""")),
    Q("q_ssb_q1_3",
      (s, d) => Tables.lineitem(s, d)
        .filter(weekofyear(col("l_shipdate")) === 6 &&
          year(col("l_shipdate")) === 1998 &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity").between(26, 35))
        .agg(Par.qsum(rev1, 1e4).as("revenue")),
      Some(s"""SELECT ${ParSql.qsum(rev1Sql, "1e4")} AS revenue
        FROM lineitem WHERE weekofyear(l_shipdate) = 6
          AND year(l_shipdate) = 1998
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity BETWEEN 26 AND 35""")),

    // Q2.x: category → brand-range → single-brand, supplier region
    // rotating — the part-dimension selectivity ladder
    q2Flight("q_ssb_q2_1", col("p_type") === "ECONOMY",
      "p_type = 'ECONOMY'", "AMERICA"),
    q2Flight("q_ssb_q2_2",
      col("p_brand").between("Brand#21", "Brand#28"),
      "p_brand BETWEEN 'Brand#21' AND 'Brand#28'", "ASIA"),
    q2Flight("q_ssb_q2_3", col("p_brand") === "Brand#23",
      "p_brand = 'Brand#23'", "EUROPE"),

    // Q3.x: geography drill-down region → nation → cities, then a
    // month-grain time slice. Q3.4's single-yearmonth slice of the
    // two-city pairs is empty in expectation at sf0.01, so the analog
    // slices calendar-July across the span — same finer-than-year
    // equality-slice shape, still selective, never vacuous.
    q3Flight("q_ssb_q3_1", "c_nation", "s_nation",
      col("c_region") === "ASIA" && col("s_region") === "ASIA",
      "c_region = 'ASIA' AND s_region = 'ASIA'",
      year(col("o_orderdate")).between(1995, 1999),
      "year(o_orderdate) BETWEEN 1995 AND 1999"),
    q3Flight("q_ssb_q3_2", "c_city", "s_city",
      col("c_nation") === "NATION_7" && col("s_nation") === "NATION_7",
      "c_nation = 'NATION_7' AND s_nation = 'NATION_7'",
      year(col("o_orderdate")).between(1995, 1999),
      "year(o_orderdate) BETWEEN 1995 AND 1999"),
    q3Flight("q_ssb_q3_3", "c_city", "s_city",
      col("c_city").isin("NATION_7#1", "NATION_7#3") &&
        col("s_city").isin("NATION_7#0", "NATION_7#1"),
      "c_city IN ('NATION_7#1','NATION_7#3') AND " +
        "s_city IN ('NATION_7#0','NATION_7#1')",
      year(col("o_orderdate")).between(1995, 1999),
      "year(o_orderdate) BETWEEN 1995 AND 1999"),
    q3Flight("q_ssb_q3_4", "c_city", "s_city",
      col("c_city").isin("NATION_7#1", "NATION_7#3") &&
        col("s_city").isin("NATION_7#0", "NATION_7#1"),
      "c_city IN ('NATION_7#1','NATION_7#3') AND " +
        "s_city IN ('NATION_7#0','NATION_7#1')",
      month(col("o_orderdate")) === 7,
      "month(o_orderdate) = 7"),

    // Q4.x: profit drill-down — mfgr-pair analog (two p_type values)
    // region×region, then year-narrowed per-category, then single
    // supplier nation per-brand at city grain
    q4Flight("q_ssb_q4_1",
      Seq((col("c_nation"), "c_nation", "c_nation")),
      col("c_region") === "AMERICA" && col("s_region") === "AMERICA" &&
        col("p_type").isin("ECONOMY", "SMALL"),
      "c_region = 'AMERICA' AND s_region = 'AMERICA' AND " +
        "p_type IN ('ECONOMY','SMALL')"),
    q4Flight("q_ssb_q4_2",
      Seq((col("s_nation"), "s_nation", "s_nation"),
        (col("p_type"), "p_type", "p_type")),
      col("c_region") === "AMERICA" && col("s_region") === "AMERICA" &&
        year(col("o_orderdate")).isin(1999, 2000) &&
        col("p_type").isin("ECONOMY", "SMALL"),
      "c_region = 'AMERICA' AND s_region = 'AMERICA' AND " +
        "year(o_orderdate) IN (1999, 2000) AND " +
        "p_type IN ('ECONOMY','SMALL')"),
    q4Flight("q_ssb_q4_3",
      Seq((col("s_city"), "s_city", "s_city"),
        (col("p_brand"), "p_brand", "p_brand")),
      col("c_region") === "AMERICA" && col("s_nation") === "NATION_6" &&
        year(col("o_orderdate")).isin(1999, 2000) &&
        col("p_type") === "STANDARD",
      "c_region = 'AMERICA' AND s_nation = 'NATION_6' AND " +
        "year(o_orderdate) IN (1999, 2000) AND p_type = 'STANDARD'"))
}
