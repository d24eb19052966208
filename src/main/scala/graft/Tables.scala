package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-provided parquet dirs.
  *
  * Reference model: a Pinot table is a named schema'd entity served from
  * columnar segments (`pinot-spi/.../config/table/TableConfig.java`). Here a
  * table is a parquet directory scanned by Spark's vectorized reader —
  * segments map to parquet files/row-groups, segment pruning maps to
  * partition/row-group stat pruning (SURVEY §1.1).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** Register every table as a temp view so `spark.sql` works against the
    * same names the DuckDB oracle uses. Idempotent per session. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
