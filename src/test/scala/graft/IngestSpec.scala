package graft

import graft.operators.NullHandling
import graft.sources.Ingest
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Batch ingestion: per-format readers + the CompositeTransformer-order
  * pipeline + compaction/rollup/purge rewrites (SURVEY §2.1). */
class IngestSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-ingest").toString

  test("csv/json round-trip through format readers") {
    val src = Tables.nation(spark, sfDir)
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    src.write.mode("overwrite").json(s"$tmp/nation_json")
    val fromCsv = Ingest.read(spark, "csv", s"$tmp/nation_csv")
    val fromJson = Ingest.read(spark, "json", s"$tmp/nation_json")
    assert(fromCsv.count() == src.count())
    assert(fromJson.count() == src.count())
    assert(fromCsv.columns.toSet == src.columns.toSet)
  }

  test("orc round-trip; csv header respected when a schema is supplied") {
    val src = Tables.nation(spark, sfDir)
    src.write.mode("overwrite").orc(s"$tmp/nation_orc")
    val fromOrc = Ingest.read(spark, "orc", s"$tmp/nation_orc")
    assert(fromOrc.count() == src.count() &&
      fromOrc.schema == src.schema)
    // supplying the schema must still skip the header row (ADVICE r2)
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/n_csv2")
    val withSchema = Ingest.read(spark, "csv", s"$tmp/n_csv2",
      schema = Some(src.schema))
    assert(withSchema.count() == src.count())
    assert(withSchema.filter(col("n_name") === "n_name").count() == 0)
  }

  test("protobuf wire codec: varint/zigzag/fixed/string round-trip") {
    import graft.sources.ProtoWire
    import graft.sources.ProtoWire._
    val fields = Seq(
      Field(1, "id", PInt64), Field(2, "name", PString),
      Field(3, "score", PDouble), Field(4, "flag", PBool),
      Field(5, "delta", PSInt64), Field(6, "small", PInt32),
      Field(7, "ratio", PFloat), Field(8, "blob", PBytes))
    val values = Seq[Any](42L, "héllo wörld", 3.14159, true,
      -123456789L, -7, 2.5f, Array[Byte](0, 1, 2, -1))
    val decoded = decodeValues(encodeValues(values, fields), fields)
    assert(decoded(0) == 42L && decoded(1) == "héllo wörld" &&
      decoded(2) == 3.14159 && decoded(3) == true &&
      decoded(4) == -123456789L && decoded(5) == -7 && decoded(6) == 2.5f)
    assert(decoded(7).asInstanceOf[Array[Byte]].toSeq ==
      Seq[Byte](0, 1, 2, -1))
    // absent fields decode as null; unknown fields are skipped
    val sparse = decodeValues(
      encodeValues(Seq[Any](null, "x", null, null, null, null, null, null),
        fields), fields)
    assert(sparse(0) == null && sparse(1) == "x")
    val known = Seq(Field(2, "name", PString))
    assert(decodeValues(encodeValues(values, fields), known).head ==
      "héllo wörld") // 7 unknown fields of every wire type skipped

    // repeated: unpacked encode → decode; packed varint decode
    val rep = Seq(Field(1, "xs", PInt64, repeated = true),
      Field(2, "tags", PString, repeated = true))
    val repDecoded = decodeValues(
      encodeValues(Seq(Seq(1L, 2L, 300L), Seq("a", "b")), rep), rep)
    assert(repDecoded(0) == Seq(1L, 2L, 300L) &&
      repDecoded(1) == Seq("a", "b"))
    // hand-built packed run for field 1: tag wiretype 2, len, varints
    val packed = Array[Byte](0x0a, 4, 1, 2, (0xac - 256).toByte, 2, 0x12, 1,
      'z'.toByte)
    val packedDecoded = decodeValues(packed, rep)
    assert(packedDecoded(0) == Seq(1L, 2L, 300L) &&
      packedDecoded(1) == Seq("z"))
  }

  test("protobuf file ingest round-trips against parquet ground truth") {
    import graft.sources.ProtoWire
    import graft.sources.ProtoWire._
    val fields = Seq(Field(1, "o_orderkey", PInt64),
      Field(2, "o_orderpriority", PString),
      Field(3, "o_totalprice", PDouble))
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val dir = Files.createTempDirectory("proto_ingest").toFile
    ProtoWire.writeFile(orders, fields, s"${dir.getPath}/part0.pb")
    val back = Ingest.readProtobuf(spark, dir.getPath, fields)
    assert(back.schema == ProtoWire.schemaOf(fields))
    val a = orders.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val b = back.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(a == b, s"${a.take(2)} vs ${b.take(2)}")
  }

  test("thrift binary-protocol codec: scalars, lists, skip, round-trip") {
    import graft.sources.ThriftWire
    import graft.sources.ThriftWire._
    val fields = Seq(
      Field(1, "id", TI64), Field(2, "name", TString),
      Field(3, "score", TDouble), Field(4, "flag", TBool),
      Field(5, "small", TI32), Field(6, "tiny", TI16),
      Field(7, "blob", TBinary), Field(8, "xs", TI64, repeated = true),
      Field(9, "tags", TString, repeated = true))
    val values = Seq[Any](42L, "héllo", 3.5, true, -7, 9.toShort,
      Array[Byte](1, 2, -3), Seq(1L, -2L, 3L), Seq("a", "b"))
    val d = decodeValues(encodeValues(values, fields), fields)
    assert(d(0) == 42L && d(1) == "héllo" && d(2) == 3.5 && d(3) == true)
    assert(d(4) == -7 && d(5) == 9.toShort)
    assert(d(6).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, -3))
    assert(d(7) == Seq(1L, -2L, 3L) && d(8) == Seq("a", "b"))
    // unknown fields (every wire type incl. list) skip; absent → null
    val known = Seq(Field(2, "name", TString))
    assert(decodeValues(encodeValues(values, fields), known).head == "héllo")
    val sparse = decodeValues(encodeValues(
      Seq[Any](null, "x", null, null, null, null, null, null, null),
      fields), fields)
    assert(sparse(0) == null && sparse(1) == "x" && sparse(7) == null)
  }

  test("thrift file ingest round-trips against parquet ground truth") {
    import graft.sources.ThriftWire
    import graft.sources.ThriftWire._
    val fields = Seq(Field(1, "o_orderkey", TI64),
      Field(2, "o_orderpriority", TString),
      Field(3, "o_totalprice", TDouble))
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val dir = Files.createTempDirectory("thrift_ingest").toFile
    ThriftWire.writeFile(orders, fields, s"${dir.getPath}/part0.thrift")
    val back = Ingest.readThrift(spark, dir.getPath, fields)
    assert(back.schema == ThriftWire.schemaOf(fields))
    val a = orders.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val b = back.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("schema evolution: added column backfills sentinel default") {
    // Pinot adds columns to existing tables with defaultNullValue backfill
    // (FieldSpec); parquet analog: mergeSchema union of old/new segments,
    // then the null-sentinel pipeline fills the missing values
    val s = spark
    import s.implicits._
    val dir = s"$tmp/evolve"
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$dir/seg1")
    Seq((3L, "c", 7.5)).toDF("id", "name", "score")
      .write.mode("overwrite").parquet(s"$dir/seg2")
    val merged = s.read.option("mergeSchema", "true")
      .parquet(s"$dir/seg1", s"$dir/seg2")
    assert(merged.columns.toSet == Set("id", "name", "score"))
    val filled = NullHandling.sentinelFill(merged, metrics = Set("score"))
    val rows = filled.orderBy(col("id")).collect()
    assert(rows.map(_.getAs[Double]("score")).toSeq == Seq(0.0, 0.0, 7.5))
  }

  test("pipeline applies transform stages in reference order") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a\u0000b", Some(10), "2024-01-05 00:00:00"),
      ("keep", None, "2024-01-10 00:00:00"),
      ("drop-by-filter", Some(99), "2024-01-15 00:00:00"),
      ("drop-by-time", Some(1), "2025-06-01 00:00:00"))
      .toDF("name", "metric", "ts_str")
    val out = Ingest.transform(df, Ingest.Pipeline(
      expressions = Seq("ts" -> to_timestamp(col("ts_str"))),
      filter = Some(col("name") =!= "drop-by-filter"),
      coerce = Map("metric" -> "long"),
      timeCol = Some("ts"),
      timeRange = Some((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-12-31 00:00:00"))),
      sentinelMetrics = Set("metric")))
    val rows = out.orderBy("name").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("name")).toSeq == Seq("ab", "keep"))
    // null metric → sentinel 0; coerced to long
    assert(rows(1).getAs[Long]("metric") == 0L)
  }

  test("compact rewrites to requested file count") {
    val src = Tables.orders(spark, sfDir).repartition(8)
    Ingest.compact(src, s"$tmp/orders_compact", 2)
    val files = new java.io.File(s"$tmp/orders_compact")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 2)
    assert(spark.read.parquet(s"$tmp/orders_compact").count() == src.count())
  }

  test("mergeRollup aggregates to coarser grain; purge drops by predicate") {
    val ev = Tables.events(spark, sfDir)
    val rolled = Ingest.mergeRollup(ev, "ts", 86400, Seq("event_type"),
      Seq(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val")))
    assert(rolled.count() < ev.count())
    assert(rolled.agg(sum("cnt")).head().getLong(0) == ev.count())
    val purged = Ingest.purge(ev, col("event_type") === "error")
    assert(purged.filter(col("event_type") === "error").count() == 0)
  }
}
