package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Scan-free metadata aggregates (reference
  * `NonScanBasedAggregationOperator.java` — min/max/count served from
  * segment metadata/dictionaries without touching a single data page;
  * `FastFilteredCountOperator` for bitmap counts).
  *
  * Parquet analog: every footer carries per-row-group record counts and
  * per-column min/max statistics. These helpers answer COUNT(*) / MIN /
  * MAX over a parquet table from footers only — at 100 TB that is
  * thousands of ~KB footer reads (distributed over executors here)
  * instead of a full scan. Pruned-but-exact: parquet stats are exact for
  * the row groups written by Spark/DuckDB writers (no truncation for
  * fixed-width types). */
object SegmentStats {

  private def parquetFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(p).isFile) Seq(p.toString)
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
  }

  /** COUNT(*) from footer record counts — no data pages read. The footer
    * reads fan out over executors (one task per file batch). */
  def fastCount(spark: SparkSession, dir: String): Long = {
    val files = parquetFiles(spark, dir)
    spark.sparkContext.parallelize(files, math.max(1, files.size / 16))
      .map { f =>
        val in = HadoopInputFile.fromPath(new Path(f), new Configuration())
        val r = ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.fold(0L)(_ + _) // not .sum(): RDD sum goes through Double (2^53)
  }

  /** MIN/MAX of a long column from row-group statistics — no data pages
    * read. Returns None when any row group lacks stats (fall back to a
    * scan; never guess). */
  def fastMinMaxLong(spark: SparkSession, dir: String, colName: String)
  : Option[(Long, Long)] = {
    val files = parquetFiles(spark, dir)
    val perFile = spark.sparkContext
      .parallelize(files, math.max(1, files.size / 16))
      .map { f =>
        val in = HadoopInputFile.fromPath(new Path(f), new Configuration())
        val r = ParquetFileReader.open(in)
        try {
          val stats = r.getFooter.getBlocks.asScala.flatMap { b =>
            b.getColumns.asScala
              .filter(_.getPath.toDotString == colName)
              .map(_.getStatistics)
          }
          if (stats.isEmpty || stats.exists(s =>
              s == null || !s.hasNonNullValue))
            None
          else Some((
            stats.map(_.genericGetMin
              .asInstanceOf[java.lang.Number].longValue).min,
            stats.map(_.genericGetMax
              .asInstanceOf[java.lang.Number].longValue).max))
        } finally r.close()
      }.collect().toSeq
    if (perFile.exists(_.isEmpty)) None
    else {
      val vs = perFile.flatten
      Some((vs.map(_._1).min, vs.map(_._2).max))
    }
  }
}
