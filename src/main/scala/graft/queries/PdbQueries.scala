package graft.queries

import graft.{Par, ParSql, Q, Tables}
import org.apache.spark.sql.functions._

/** The reference's pinot-druid-benchmark harness queries, verbatim shapes
  * (`contrib/pinot-druid-benchmark/src/main/resources/pinot_queries/
  * 0..6.pql` — global sums, filtered sums, and per-shipdate group-bys over
  * TPC-H lineitem; the harness runs them single-node at SF=8). Query 6
  * filters on l_shipmode/l_receiptdate, which the testdata lacks — adapted
  * to the same shape on l_returnflag/l_shipdate.
  *
  * Money sums ride the quantized-long path (Par.q2/qsum) so the doubles
  * are bit-deterministic across engines — shape and cardinality are the
  * harness's; only the parity discipline is ours. */
object PdbQueries {
  private def li(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
  private val priceQ = Par.q2(col("l_extendedprice"))
  private val priceQSql = ParSql.q2("l_extendedprice")

  def all: Seq[Q] = Seq(
    // 0.pql: two global sums
    Q("q_pdb_0",
      (s, d) => li(s, d).agg(
        Par.qsum(priceQ, 1e2).as("sum_price"),
        Par.qsum(Par.q2(col("l_discount")), 1e2).as("sum_disc")),
      Some(s"""SELECT ${ParSql.qsum(priceQSql, "1e2")} AS sum_price,
        ${ParSql.qsum(ParSql.q2("l_discount"), "1e2")} AS sum_disc
        FROM lineitem""")),

    // 1.pql: filtered global sum (dictionary-equality filter)
    Q("q_pdb_1",
      (s, d) => li(s, d).filter(col("l_returnflag") === "R")
        .agg(Par.qsum(priceQ, 1e2).as("sum_price")),
      Some(s"""SELECT ${ParSql.qsum(priceQSql, "1e2")} AS sum_price
        FROM lineitem WHERE l_returnflag = 'R'""")),

    // 2.pql: time-range filtered global sum (segment-pruning shape)
    Q("q_pdb_2",
      (s, d) => li(s, d)
        .filter(col("l_shipdate") >= lit("1996-12-01") &&
          col("l_shipdate") <= lit("1996-12-31"))
        .agg(Par.qsum(priceQ, 1e2).as("sum_price")),
      Some(s"""SELECT ${ParSql.qsum(priceQSql, "1e2")} AS sum_price
        FROM lineitem WHERE l_shipdate BETWEEN TIMESTAMP '1996-12-01'
          AND TIMESTAMP '1996-12-31'""")),

    // 3.pql: sum grouped by ship date (high-cardinality group-by)
    Q("q_pdb_3",
      (s, d) => li(s, d).groupBy(col("l_shipdate"))
        .agg(Par.qsum(priceQ, 1e2).as("sum_price")),
      Some(s"""SELECT l_shipdate, ${ParSql.qsum(priceQSql, "1e2")}
        AS sum_price FROM lineitem GROUP BY l_shipdate""")),

    // 4.pql: two sums grouped by ship date
    Q("q_pdb_4",
      (s, d) => li(s, d).groupBy(col("l_shipdate"))
        .agg(Par.qsum(priceQ, 1e2).as("sum_price"),
          Par.qsum(Par.q2(col("l_quantity")), 1e2).as("sum_qty")),
      Some(s"""SELECT l_shipdate, ${ParSql.qsum(priceQSql, "1e2")}
        AS sum_price, ${ParSql.qsum(ParSql.q2("l_quantity"), "1e2")}
        AS sum_qty FROM lineitem GROUP BY l_shipdate""")),

    // 5.pql: range filter + group-by
    Q("q_pdb_5",
      (s, d) => li(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") <= lit("1996-12-31"))
        .groupBy(col("l_shipdate"))
        .agg(Par.qsum(priceQ, 1e2).as("sum_price")),
      Some(s"""SELECT l_shipdate, ${ParSql.qsum(priceQSql, "1e2")}
        AS sum_price FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01'
          AND TIMESTAMP '1996-12-31' GROUP BY l_shipdate""")),

    // 6.pql shape (IN filter + range + group-by), on available columns
    Q("q_pdb_6",
      (s, d) => li(s, d)
        .filter(col("l_returnflag").isin("R", "A") &&
          col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") <= lit("1997-12-31"))
        .groupBy(col("l_returnflag"))
        .agg(Par.qsum(priceQ, 1e2).as("sum_price")),
      Some(s"""SELECT l_returnflag, ${ParSql.qsum(priceQSql, "1e2")}
        AS sum_price FROM lineitem
        WHERE l_returnflag IN ('R', 'A')
          AND l_shipdate BETWEEN TIMESTAMP '1997-01-01'
          AND TIMESTAMP '1997-12-31' GROUP BY l_returnflag""")))
}
