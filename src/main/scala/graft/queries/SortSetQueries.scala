package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Sort/limit/offset (SURVEY §2.7: SelectionOrderByOperator, v2
  * SortOperator, default LIMIT 10) and set operations (§2.8 — absent in the
  * reference's engines, provided as the Spark-free superset).
  *
  * Top-k plans compile to `TakeOrderedAndProject` — per-partition bounded
  * heaps then a driver merge of k·partitions rows, the same bounded
  * PriorityQueue strategy as `SelectionOrderByOperator:85-110`; no global
  * sort materializes. Every ordering includes a unique tiebreaker so
  * results are deterministic across engines and partitionings.
  */
object SortSetQueries {

  val all: Seq[Q] = Seq(

    // top-n (SelectionOrderByOperator → TakeOrderedAndProject)
    Q("q_sort_topn",
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(15)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority")),
      Some("""SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""")),

    // multi-key mixed-direction sort + limit
    Q("q_sort_multi",
      (s, d) => Tables.lineitem(s, d)
        .orderBy(col("l_returnflag"), col("l_quantity").desc,
          col("l_orderkey"), col("l_linenumber"))
        .limit(50)
        .select(col("l_returnflag"), col("l_quantity"), col("l_orderkey"),
          col("l_linenumber")),
      Some("""SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber
        FROM lineitem ORDER BY l_returnflag, l_quantity DESC, l_orderkey,
        l_linenumber LIMIT 50""")),

    // limit + offset (v2 SortOperator fetch/offset; Spark 3.4+ offset)
    Q("q_sort_offset",
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_custkey"), col("o_orderkey"))
        .offset(20).limit(10)
        .select(col("o_orderkey"), col("o_custkey")),
      Some("""SELECT o_orderkey, o_custkey FROM orders
        ORDER BY o_custkey, o_orderkey LIMIT 10 OFFSET 20""")),

    // the reference's implicit default LIMIT 10 (query.thrift:34)
    Q("q_sort_default_limit",
      (s, d) => Tables.customer(s, d)
        .orderBy(col("c_custkey")).limit(10)
        .select(col("c_custkey"), col("c_name")),
      Some("""SELECT c_custkey, c_name FROM customer
        ORDER BY c_custkey LIMIT 10""")),

    // UNION ALL (v2 planner rejects LogicalUnion — Spark superset)
    Q("q_set_union_all",
      (s, d) => Tables.customer(s, d)
        .select(col("c_nationkey").as("nk"), lit("cust").as("src"))
        .unionAll(Tables.supplier(s, d)
          .select(col("s_nationkey").as("nk"), lit("supp").as("src")))
        .groupBy(col("nk")).agg(count(lit(1)).as("n"),
          count_distinct(col("src")).as("n_src")),
      Some("""SELECT nk, COUNT(*) AS n, COUNT(DISTINCT src) AS n_src FROM (
        SELECT c_nationkey AS nk, 'cust' AS src FROM customer
        UNION ALL
        SELECT s_nationkey AS nk, 'supp' AS src FROM supplier)
        GROUP BY nk""")),

    // UNION DISTINCT
    Q("q_set_union",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey")))
        .distinct(),
      Some("""SELECT c_nationkey AS nk FROM customer
        UNION SELECT s_nationkey FROM supplier""")),

    // INTERSECT
    Q("q_set_intersect",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey"))),
      Some("""SELECT c_nationkey AS nk FROM customer
        INTERSECT SELECT s_nationkey FROM supplier""")),

    // EXCEPT
    Q("q_set_except",
      (s, d) => Tables.part(s, d).select(col("p_size").as("v"))
        .except(Tables.nation(s, d).select(col("n_nationkey"))),
      Some("""SELECT p_size AS v FROM part
        EXCEPT SELECT n_nationkey FROM nation""")))
}
