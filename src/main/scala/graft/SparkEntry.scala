package graft

import graft.queries.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001 (TPC-H Q1 shape — the
    * reference benchmark's "sum group-by" template); driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.all.find(_.name == "q_agg_tpch_q1").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Gates with a
    * build phase compose setup-then-run (the driver contract sees one
    * function; Bench times the phases separately via Registry). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> { (s: SparkSession, d: String) =>
      q.setup.foreach(_(s, d))
      q.run(s, d)
    }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
