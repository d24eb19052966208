package graft.queries

import graft.{Par, ParSql, Q, Tables}
import org.apache.spark.sql.functions._

/** Edge-case gates: empty results, global aggregates over zero rows,
  * high-cardinality grouping, duplicate-key join fan-out — the corners
  * where engines classically diverge. */
object EdgeQueries {

  val all: Seq[Q] = Seq(

    // filter matches nothing: grouped agg → 0 rows; both engines agree
    Q("q_edge_empty_group",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_quantity") > 1000)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, COUNT(*) AS n FROM lineitem
        WHERE l_quantity > 1000 GROUP BY l_returnflag""")),

    // global aggregate over zero rows: one row, count 0, null min/max/sum
    Q("q_edge_empty_global",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_quantity") > 1000)
        .agg(count(lit(1)).as("n"), min(col("l_quantity")).as("min_q"),
          Par.dsum(col("l_quantity")).as("sum_q")),
      Some(s"""SELECT COUNT(*) AS n, MIN(l_quantity) AS min_q,
        ${ParSql.dsum("l_quantity")} AS sum_q FROM lineitem
        WHERE l_quantity > 1000""")),

    // high-cardinality grouping (every order) + HAVING trim
    Q("q_edge_highcard",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          Par.dsum(col("l_extendedprice")).as("order_total"))
        .filter(col("n_lines") >= 5),
      Some(s"""SELECT l_orderkey, COUNT(*) AS n_lines,
        ${ParSql.dsum("l_extendedprice")} AS order_total
        FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 5""")),

    // duplicate-key fan-out: orders×lineitem rows per duplicate join key,
    // then re-aggregated (checks row multiplication semantics)
    Q("q_edge_dup_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_quantity"))
        li.as("a").join(li.as("b"), col("a.l_partkey") === col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("pk"))
          .agg(count(lit(1)).as("n_pairs"))
          .filter(col("n_pairs") >= 1000)
      },
      Some("""SELECT a.l_partkey AS pk, COUNT(*) AS n_pairs
        FROM lineitem a JOIN lineitem b ON a.l_partkey = b.l_partkey
        GROUP BY a.l_partkey HAVING COUNT(*) >= 1000""")),

    // literal-only expressions (compile-time folding; Catalyst
    // ConstantFolding ≈ CompileTimeFunctionsInvoker)
    Q("q_edge_constants",
      (s, d) => Tables.region(s, d).select(
        col("r_regionkey"),
        (lit(2) + lit(3) * lit(4)).as("arith_v"),
        upper(lit("abc")).as("upper_v"),
        concat(lit("a"), lit("b")).as("concat_v"),
        lit(null).cast("int").as("null_v"),
        when(lit(1) > lit(2), "t").otherwise("f").as("cond_v")),
      Some("""SELECT r_regionkey, 2 + 3 * 4 AS arith_v,
        UPPER('abc') AS upper_v, 'a' || 'b' AS concat_v,
        CAST(NULL AS INT) AS null_v,
        CASE WHEN 1 > 2 THEN 't' ELSE 'f' END AS cond_v FROM region""")),

    // non-ASCII string semantics: codepoint-counting length, case
    // mapping, substring, byte-based hash — engines must agree on all
    // four for multilingual corpora (length() counts CODEPOINTS in both
    // Spark and DuckDB; md5 works on UTF-8 bytes in both)
    Q("q_edge_unicode",
      (s, d) => Tables.region(s, d).select(
        col("r_regionkey"),
        length(lit("héllo wörld 你好")).as("len_cp"),
        upper(lit("héllo")).as("upper_u"),
        substring(lit("你好世界"), 2, 2).as("substr_u"),
        md5(lit("héllo 你好")).as("md5_u"),
        reverse(lit("abc日本")).as("rev_u")),
      Some("""SELECT r_regionkey,
        length('héllo wörld 你好') AS len_cp,
        UPPER('héllo') AS upper_u,
        SUBSTRING('你好世界', 2, 2) AS substr_u,
        md5('héllo 你好') AS md5_u,
        REVERSE('abc日本') AS rev_u FROM region""")))
}
