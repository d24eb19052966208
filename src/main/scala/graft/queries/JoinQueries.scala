package graft.queries

import graft.{Par, ParSql, Q, Tables}
import org.apache.spark.sql.functions._

/** Join coverage (SURVEY §2.4; reference v2 `HashJoinOperator.java:64-65` —
  * INNER/LEFT/RIGHT/FULL/SEMI/ANTI with non-equi post-predicates — plus the
  * v1 lookup-join (`LookupTransformFunction`) and IdSet semi-join
  * (`IN_SUBQUERY`)).
  *
  * Scale posture: dimension tables (region/nation/customer/supplier/part)
  * are `broadcast()` explicitly where the reference broadcasts its right
  * side — the fact table is never shuffled for those joins. Fact-fact joins
  * (lineitem⋈orders) shuffle on the join key once; AQE handles skew.
  */
object JoinQueries {

  val all: Seq[Q] = Seq(

    // inner equi-join chain, broadcast dims — TPC-H Q5 shape
    Q("q_join_inner",
      (s, d) => {
        // quantized-long revenue (see q_agg_tpch_q1): product ≤ 1.1e9/row
        val rev = Par.q2(col("l_extendedprice")) *
          (lit(100L) - Par.q2(col("l_discount")))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(Par.qsum(rev, 1e4).as("revenue"), count(lit(1)).as("n"))
      },
      Some(s"""SELECT n_name,
        ${ParSql.qsum(s"${ParSql.q2("l_extendedprice")} * (100 - ${ParSql.q2("l_discount")})", "1e4")} AS revenue,
        COUNT(*) AS n
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' GROUP BY n_name""")),

    // LEFT OUTER join (unmatched rows kept, HashJoinOperator:284-289)
    Q("q_join_left",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
          "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(Par.dsum(col("o_totalprice")), lit(0.0)).as("total")),
      Some(s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        COALESCE(${ParSql.dsum("o_totalprice")}, 0.0) AS total
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey""")),

    // RIGHT OUTER join
    Q("q_join_right",
      (s, d) => Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"),
          "right")
        .groupBy(col("n_name"))
        .agg(count(col("s_suppkey")).as("n_supp"),
          coalesce(Par.dsum(col("s_acctbal")), lit(0.0)).as("bal")),
      Some(s"""SELECT n_name, COUNT(s_suppkey) AS n_supp,
        COALESCE(${ParSql.dsum("s_acctbal")}, 0.0) AS bal
        FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name""")),

    // FULL OUTER join of two aggregated sides
    Q("q_join_full",
      (s, d) => {
        val cust = Tables.customer(s, d).groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val supp = Tables.supplier(s, d).groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        cust.join(supp, col("c_nationkey") === col("s_nationkey"), "full")
          .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nk"),
            coalesce(col("n_cust"), lit(0)).as("n_cust"),
            coalesce(col("n_supp"), lit(0)).as("n_supp"))
      },
      Some("""SELECT COALESCE(c_nationkey, s_nationkey) AS nk,
        COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
              GROUP BY c_nationkey) c
        FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
              GROUP BY s_nationkey) s
        ON c_nationkey = s_nationkey""")),

    // LEFT SEMI (HashJoinOperator:220-226)
    Q("q_join_semi",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment")),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""")),

    // LEFT ANTI
    Q("q_join_anti",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select(col("c_custkey"), col("c_nationkey")),
      Some("""SELECT c_custkey, c_nationkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey)""")),

    // v1 lookup join (LookupTransformFunction → broadcast dim lookup)
    Q("q_join_lookup",
      (s, d) => Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), Par.dsum(col("o_totalprice")).as("total")),
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n,
        ${ParSql.dsum("o_totalprice")} AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment""")),

    // equi-join + non-equi residual (theta on top of hash join,
    // HashJoinOperator._joinClauseEvaluators)
    Q("q_join_theta",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey") &&
            col("l_quantity") > col("p_size"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), Par.dsum(col("l_quantity")).as("sum_qty")),
      Some(s"""SELECT p_brand, COUNT(*) AS n,
        ${ParSql.dsum("l_quantity")} AS sum_qty
        FROM lineitem JOIN part
          ON l_partkey = p_partkey AND l_quantity > p_size
        GROUP BY p_brand""")),

    // range (interval) join — superset (reference has none; Spark plans
    // small interval sides as broadcast nested loop): orders tagged by the
    // year-interval they fall into
    Q("q_join_range",
      (s, d) => {
        val years = Tables.orders(s, d)
          .select(year(col("o_orderdate")).as("y")).distinct()
          .select(col("y").as("period_year"),
            make_timestamp(col("y"), lit(1), lit(1), lit(0), lit(0), lit(0))
              .as("start_ts"),
            make_timestamp(col("y") + 1, lit(1), lit(1), lit(0), lit(0),
              lit(0)).as("end_ts"))
        Tables.orders(s, d).join(broadcast(years),
            col("o_orderdate") >= col("start_ts") &&
              col("o_orderdate") < col("end_ts"))
          .groupBy(col("period_year"))
          .agg(count(lit(1)).as("n"),
            Par.dsum(col("o_totalprice")).as("total"))
      },
      Some(s"""SELECT period_year, COUNT(*) AS n,
        ${ParSql.dsum("o_totalprice")} AS total
        FROM orders JOIN (
          SELECT y AS period_year,
            make_timestamp(y, 1, 1, 0, 0, 0) AS start_ts,
            make_timestamp(y + 1, 1, 1, 0, 0, 0) AS end_ts
          FROM (SELECT DISTINCT YEAR(o_orderdate) AS y FROM orders))
        ON o_orderdate >= start_ts AND o_orderdate < end_ts
        GROUP BY period_year""")),

    // IdSet semi-join (IN_SUBQUERY / inIdSet → left_semi on the subquery)
    Q("q_join_insubquery",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000)
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), Par.dsum(col("l_extendedprice"))
          .as("sum_price")),
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
        ${ParSql.dsum("l_extendedprice")} AS sum_price
        FROM lineitem WHERE l_orderkey IN
          (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        GROUP BY l_returnflag""")),

    // correlated EXISTS (superset; exercises RewritePredicateSubquery —
    // the decorrelated plan is the same semi join a broker-side IdSet
    // materialization would feed)
    Q("q_join_exists",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT c_mktsegment, COUNT(*) AS n_cust
          FROM customer WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 350000)
          GROUP BY c_mktsegment""")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_cust
        FROM customer WHERE EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 350000)
        GROUP BY c_mktsegment""")),

    // scalar subquery (superset): one broadcast value computed once, no
    // per-row re-execution — quantized sums keep the division exact-ish
    // and identical on both sides
    Q("q_scalar_subquery",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(s"""SELECT o_orderpriority, COUNT(*) AS n_above
          FROM orders
          WHERE o_totalprice > (SELECT
            ${"CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/1e2"}
              / COUNT(o_totalprice) FROM orders)
          GROUP BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_above
        FROM orders
        WHERE o_totalprice > (SELECT
          CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/1e2
            / COUNT(o_totalprice) FROM orders)
        GROUP BY o_orderpriority""")),

    // Co-located (bucketed) join: both sides pre-hashed into buckets on the
    // join key at write time, so the SortMergeJoin runs with ZERO Exchange
    // (spec-verified) — the shuffle-once-at-ingest layout a 100 TB fact
    // table wants for repeated joins. Results are layout-independent, so
    // the oracle is the plain join.
    Q("q_join_bucketed",
      // run phase: the co-located join itself (zero-Exchange SortMergeJoin
      // over pre-bucketed scans); the one-time bucketed-table WRITES live
      // in setup so the bench measures the join, not saveAsTable ceremony
      (s, d) => {
        import graft.operators.Bucketing
        val (li, ord) = bucketedSides(s, d)
        Bucketing.coLocatedJoin(li, ord, "l_orderkey")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            (sum(col("price_q")).cast("double") / 1e2).as("sum_price"))
          .orderBy(col("o_orderpriority"))
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n_items,
          ${ParSql.qsum(ParSql.q2("l_extendedprice"), "1e2")} AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      setup = Some((s, d) => { bucketedSides(s, d); () })))

  /** Build-once bucketed join sides (ingest-time layout; reused by the
    * setup and run phases of q_join_bucketed). */
  private def bucketedSides(s: org.apache.spark.sql.SparkSession, d: String)
  : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import graft.operators.Bucketing
    val li = Bucketing.bucketed(s,
      Tables.lineitem(s, d).select(col("l_orderkey"),
        Par.q2(col("l_extendedprice")).as("price_q")),
      "lineitem", d, "l_orderkey", 8)
    val ord = Bucketing.bucketed(s,
      Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
        col("o_orderpriority")),
      "orders", d, "l_orderkey", 8)
    (li, ord)
  }
}
