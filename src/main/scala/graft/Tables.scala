package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Load one table. `events.ts` has arrived as parquet TIMESTAMP(NANOS)
    * in some testdata generations and TIMESTAMP(MICROS) in others. Spark's
    * TimestampType (microsecond precision) cannot hold nanos, so with
    * `nanosAsLong` a NANOS column surfaces as LongType and we truncate to
    * micros; a MICROS column loads natively and needs nothing. The oracle's
    * `make_timestamp(epoch_ns(ts)//1000)` (QueryDef.evOracle) is the same
    * truncation for nanos and the identity for micros, so both generations
    * hash identically. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(dir, name))
      normalizeNtz(raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => raw
      })
    } else normalizeNtz(spark.read.parquet(path(dir, name)))
  }

  /** Cast every TIMESTAMP_NTZ column to the session (UTC) TimestampType.
    * The generated parquet's timestamps are not flagged UTC-adjusted, so
    * Spark surfaces them as NTZ; with a UTC session the cast keeps the
    * stored micros bit-identical while restoring the TimestampType the
    * query surface expects (unix_millis etc. reject NTZ). Applied to all
    * tables so a generator-side flag change can never split the corpus
    * into mixed timestamp types mid-round. */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        f.name
    }
    ntz.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("timestamp")))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` works against the
    * same names the DuckDB oracle uses. Idempotent per session. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
