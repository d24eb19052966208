package graft

import graft.model.Schema
import graft.operators.NullHandling
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SchemaSpec extends SparkSpec {

  private val fields = Seq(
    Schema.Field("user", StringType, Schema.Dimension),
    Schema.Field("clicks", LongType, Schema.Metric),
    Schema.Field("tags", StringType, Schema.Dimension, singleValue = false),
    Schema.Field("ts", TimestampType, Schema.Time))

  test("roles round-trip through StructField metadata; MV becomes array") {
    val st = Schema.toStructType(fields)
    assert(Schema.roleOf(st("clicks")).contains("METRIC"))
    assert(Schema.roleOf(st("user")).contains("DIMENSION"))
    assert(st("tags").dataType == ArrayType(StringType))
    assert(Schema.metricColumns(st) == Set("clicks"))
  }

  test("validate flags missing columns and type mismatches") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", "oops")).toDF("user", "clicks")
    val errs = Schema.validate(Schema.toStructType(fields), df)
    assert(errs.exists(_.contains("type mismatch clicks")))
    assert(errs.exists(_.contains("missing column: tags")))
  }

  test("metric roles drive sentinel defaults end-to-end") {
    val s = spark
    import s.implicits._
    val st = Schema.toStructType(fields.take(2))
    val df = Seq((Some("u"), Some(3L)), (None, None)).toDF("user", "clicks")
    val filled = NullHandling.sentinelFill(df, Schema.metricColumns(st))
    val r = filled.orderBy(col("clicks")).collect()
    assert(r.map(_.get(1)).toSet == Set(0L, 3L))   // metric → 0
    assert(r.map(_.get(0)).toSet == Set("u", "null")) // dimension → "null"
  }
}
