package graft

import org.apache.spark.sql.functions._

/** TimePredicateRewrite: function-wrapped time predicates become raw-column
  * ranges that reach the parquet scan as pushed filters. */
class RulesSpec extends SparkSpec {

  private def pushedFilters(df: org.apache.spark.sql.DataFrame): String = {
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    formatted.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
  }

  test("unix_timestamp(ts) >= L is rewritten and pushed to the scan") {
    val ev = Tables.events(spark, sfDir)
    val cutoff = 1705276800L // 2024-01-15 00:00:00 UTC
    val df = ev.filter(unix_timestamp(col("ts")) >= cutoff)
    // semantics preserved
    val expect = ev.filter(col("ts") >=
      lit("2024-01-15 00:00:00").cast("timestamp")).count()
    assert(df.count() == expect)
    // events.ts is a computed column (nanos workaround) so the filter can't
    // reach that scan; prove pushdown on a raw-timestamp scan instead:
    val orders = Tables.orders(spark, sfDir)
    val o = orders.filter(unix_timestamp(col("o_orderdate")) >= 820454400L)
    assert(pushedFilters(o).contains("GreaterThanOrEqual(o_orderdate"),
      s"expected pushed range on o_orderdate:\n${pushedFilters(o)}")
    assert(o.count() ==
      orders.filter(col("o_orderdate") >=
        lit("1996-01-01 00:00:00").cast("timestamp")).count())
  }

  test("year(ts) filter prunes partitions on a date-partitioned layout") {
    // the 100 TB claim in one spec: a function-wrapped time predicate,
    // rewritten to a raw range, must reach PARTITION pruning — reading a
    // year, not the table
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val orders = Tables.orders(spark, sfDir)
    orders.withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val back = spark.read.parquet(dir)
    val yrs = back.select(col("o_year")).distinct().count()
    assert(yrs > 1) // multiple partitions exist, pruning is meaningful
    val df = back.filter(year(col("o_orderdate")) === 1997 &&
      col("o_year") === 1997)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val partLine = formatted.linesIterator
      .filter(_.contains("PartitionFilters")).mkString
    assert(partLine.contains("o_year"),
      s"expected partition filter on o_year:\n$partLine")
    // and the rewritten range is pushed for row-group skipping too
    assert(pushedFilters(df).contains("GreaterThanOrEqual(o_orderdate"))
    val expect = orders.filter(year(col("o_orderdate")) === 1997).count()
    assert(df.count() == expect)
  }

  test("strict/equality unix_timestamp comparisons keep floor semantics") {
    val orders = Tables.orders(spark, sfDir)
    val l = 820454400L
    Seq(
      (unix_timestamp(col("o_orderdate")) > l,
        col("o_orderdate") >= timestamp_seconds(lit(l + 1))),
      (unix_timestamp(col("o_orderdate")) <= l,
        col("o_orderdate") < timestamp_seconds(lit(l + 1))),
      (unix_timestamp(col("o_orderdate")) < l,
        col("o_orderdate") < timestamp_seconds(lit(l))),
      (unix_timestamp(col("o_orderdate")) === l,
        col("o_orderdate") >= timestamp_seconds(lit(l)) &&
          col("o_orderdate") < timestamp_seconds(lit(l + 1))))
      .foreach { case (rewritten, direct) =>
        assert(orders.filter(rewritten).count() ==
          orders.filter(direct).count())
      }
  }

  test("date_trunc(unit, ts) = T becomes a pushed half-open range") {
    val orders = Tables.orders(spark, sfDir)
    val df = orders.filter(
      date_trunc("month", col("o_orderdate")) ===
        lit("1997-03-01 00:00:00").cast("timestamp"))
    assert(pushedFilters(df).contains("GreaterThanOrEqual(o_orderdate") &&
      pushedFilters(df).contains("LessThan(o_orderdate"),
      s"expected pushed month range:\n${pushedFilters(df)}")
    val expect = orders.filter(
      col("o_orderdate") >= lit("1997-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp")).count()
    assert(df.count() == expect)
    // unaligned literal: no rewrite, semantics preserved (matches nothing)
    val none = orders.filter(
      date_trunc("day", col("o_orderdate")) ===
        lit("1997-03-01 12:30:00").cast("timestamp")).count()
    assert(none == 0)
  }

  test("year(ts) = Y becomes a pushed half-open range") {
    val orders = Tables.orders(spark, sfDir)
    val df = orders.filter(year(col("o_orderdate")) === 1997)
    assert(pushedFilters(df).contains("GreaterThanOrEqual(o_orderdate") &&
      pushedFilters(df).contains("LessThan(o_orderdate"),
      s"expected pushed year range:\n${pushedFilters(df)}")
    val expect = orders.filter(
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp")).count()
    assert(df.count() == expect)
  }
}
