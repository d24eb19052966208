package graft.sources

import graft.operators.NullHandling
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch ingestion (SURVEY §2.1).
  *
  * Reference: per-format record readers (`pinot-plugins/pinot-input-format/`
  * — Avro, CSV, JSON, ORC, Parquet, …) feeding a per-record transform
  * pipeline (`CompositeTransformer.java:68-71`: expression transform →
  * filter → data-type coercion → time validation → null-sentinel fill →
  * sanitization), then segment build + minion compaction tasks
  * (MergeRollup, RealtimeToOffline, Purge).
  *
  * Spark realization: `spark.read.<format>` is the record reader (already
  * vectorized for parquet/orc); the pipeline is a Column-level transform
  * chain applied before write — it fuses into the scan stage, zero extra
  * passes. Compaction = coalesced rewrite; rollup = aggregated rewrite;
  * purge = anti-filter rewrite. All are embarrassingly parallel over
  * partitions — no shuffle except rollup's keyed aggregate. */
object Ingest {

  /** Per-format readers (the reference's input-format plugins). Protobuf
    * routes to [[ProtoWire.read]] via [[readProtobuf]] (it needs a field
    * descriptor, not a Spark schema); Thrift/CLP plugins would need their
    * runtime jars — same `load` contract. */
  def read(spark: SparkSession, format: String, path: String,
           schema: Option[StructType] = None): DataFrame = {
    require(!format.equalsIgnoreCase("protobuf"),
      "protobuf needs a field descriptor — use Ingest.readProtobuf")
    require(!format.equalsIgnoreCase("thrift"),
      "thrift needs a field descriptor — use Ingest.readThrift")
    require(!format.equalsIgnoreCase("avro"),
      "avro needs a reader schema — use Ingest.readAvro")
    require(!format.toLowerCase.startsWith("confluent"),
      "confluent-avro needs a registry — use Ingest.readConfluentAvro")
    require(!format.equalsIgnoreCase("clplog") && !format.equalsIgnoreCase("clp"),
      "CLP logs need their archive layout — use ClpLog.read")
    require(!format.equalsIgnoreCase("warc"),
      "WARC needs record-level parsing — use Warc.read")
    val r = spark.read.format(format.toLowerCase match {
      case "jsonl" => "json"
      case f => f
    })
    // Format options apply regardless of schema: a CSV file's header row
    // must be skipped even when the caller supplies the schema (otherwise
    // the header parses as a data row). inferSchema only without a schema.
    val withOpts =
      if (format.equalsIgnoreCase("csv"))
        r.option("header", "true")
          .option("inferSchema", schema.isEmpty.toString)
      else r
    schema.fold(withOpts)(withOpts.schema).load(path)
  }

  /** Protobuf record reader (pinot-protobuf plugin analog): decodes
    * varint-length-delimited messages per the field descriptor. */
  def readProtobuf(spark: SparkSession, path: String,
                   fields: Seq[ProtoWire.Field]): DataFrame =
    ProtoWire.read(spark, path, fields)

  /** Thrift record reader (pinot-thrift plugin analog): decodes
    * concatenated TBinaryProtocol structs per the field descriptor. */
  def readThrift(spark: SparkSession, path: String,
                 fields: Seq[ThriftWire.Field]): DataFrame =
    ThriftWire.read(spark, path, fields)

  /** Avro container-file reader (pinot-avro plugin analog). */
  def readAvro(spark: SparkSession, path: String, readerJson: String)
  : DataFrame = ConfluentAvro.readContainer(spark, path, readerJson)

  /** Confluent-framed Avro reader (pinot-confluent-avro plugin analog):
    * magic byte + schema-registry id framing, registry as id→schema map. */
  def readConfluentAvro(spark: SparkSession, path: String,
                        registry: Map[Int, String], readerJson: String)
  : DataFrame = ConfluentAvro.read(spark, path, registry, readerJson)

  /** Ingestion transform config, mirroring CompositeTransformer's stages. */
  final case class Pipeline(
      expressions: Seq[(String, Column)] = Nil,    // ExpressionTransformer
      filter: Option[Column] = None,               // FilterTransformer
      coerce: Map[String, String] = Map.empty,     // DataTypeTransformer
      timeCol: Option[String] = None,              // TimeValidationTransformer
      timeRange: Option[(java.sql.Timestamp, java.sql.Timestamp)] = None,
      sentinelMetrics: Set[String] = Set.empty,    // NullValueTransformer
      sanitizeStrings: Boolean = true)             // SanitizationTransformer

  /** Apply the pipeline in the reference's stage order. */
  def transform(df: DataFrame, p: Pipeline): DataFrame = {
    var out = df
    p.expressions.foreach { case (name, expr) =>
      out = out.withColumn(name, expr)
    }
    p.filter.foreach(f => out = out.filter(f))
    p.coerce.foreach { case (c, t) =>
      out = out.withColumn(c, col(c).cast(t))
    }
    for (tc <- p.timeCol; (lo, hi) <- p.timeRange)
      out = out.filter(col(tc).between(lit(lo), lit(hi)))
    out = NullHandling.sentinelFill(out, p.sentinelMetrics)
    if (p.sanitizeStrings) {
      // SanitizationTransformer: strip NUL characters from string fields
      val strCols = out.schema.fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.StringType => f.name
      }
      strCols.foldLeft(out)((d, c) =>
        d.withColumn(c, regexp_replace(col(c), "\\x00", "")))
    } else out
  }

  /** Merge-compaction (minion MergeTask): rewrite many small files into
    * `numFiles` — at scale, sized so each lands near the HDFS/S3 block
    * sweet spot. */
  def compact(df: DataFrame, outPath: String, numFiles: Int): Unit =
    df.coalesce(numFiles).write.mode("overwrite").parquet(outPath)

  /** MergeRollup task: aggregate-on-rewrite at a coarser time grain. */
  def mergeRollup(df: DataFrame, timeCol: String, bucketSec: Long,
                  keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys.map(col) :+
        graft.functions.Scalars.timeBucket(col(timeCol), bucketSec)
          .as(timeCol): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Purge task: delete-by-predicate rewrite. */
  def purge(df: DataFrame, dropWhere: Column): DataFrame =
    df.filter(!dropWhere)

  /** RealtimeToOffline task (reference
    * `RealtimeToOfflineSegmentsTaskExecutor`): move the sealed realtime
    * window below `boundary` into the offline table. The offline rewrite
    * appends a plain batch partition; the hybrid view's time-boundary
    * split (`HybridTable.view` — offline < boundary ≤ realtime) keeps
    * queries exact throughout, even while the moved rows still exist on
    * the realtime side (exactly the reference's transition discipline —
    * realtime segments are only retention-dropped later). Scale: the move
    * is an embarrassingly-parallel partition rewrite; no shuffle unless a
    * rollup is folded in. */
  def realtimeToOffline(spark: SparkSession, realtimePath: String,
                        offlinePath: String, timeCol: String,
                        boundary: java.sql.Timestamp,
                        rollup: Option[DataFrame => DataFrame] = None)
  : Unit = {
    val window = spark.read.parquet(realtimePath)
      .filter(col(timeCol) < lit(boundary))
    rollup.fold(window)(f => f(window))
      .write.mode("append").parquet(offlinePath)
  }
}
