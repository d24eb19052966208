package graft

import graft.sources.{ConfluentAvro, ProtoWire}
import org.apache.spark.sql.functions._

class ConfluentAvroSpec extends SparkSpec {

  private val v1 =
    """{"type":"record","name":"E","fields":[
      {"name":"id","type":"long"},
      {"name":"name","type":"string"}]}"""
  private val v2 =
    """{"type":"record","name":"E","fields":[
      {"name":"id","type":"long"},
      {"name":"name","type":"string"},
      {"name":"score","type":"double","default":-1.0},
      {"name":"tags","type":{"type":"array","items":"string"},
       "default":[]}]}"""

  test("frame: magic + big-endian schema id round-trip, malformed rejected") {
    val f = ConfluentAvro.frame(0x01020304, Array[Byte](9, 8, 7))
    assert(f(0) == 0x00.toByte)
    assert(ConfluentAvro.schemaIdOf(f) == 0x01020304)
    assert(f.length == 8)
    // wrong magic and truncated frames fail loudly, not as garbage rows
    intercept[IllegalArgumentException](
      ConfluentAvro.schemaIdOf(Array[Byte](1, 0, 0, 0, 1, 5)))
    intercept[IllegalArgumentException](
      ConfluentAvro.schemaIdOf(Array[Byte](0, 0, 0)))
  }

  test("decodeMessage: registry dispatch + schema resolution defaults") {
    val reg = Map(1 -> v1, 2 -> v2)
    val m1 = ConfluentAvro.encode(Seq(7L, "a"), v1, 1)
    val m2 = ConfluentAvro.encode(Seq(8L, "b", 2.5, Seq("x", "y")), v2, 2)
    val parser = new org.apache.avro.Schema.Parser()
    val reader = parser.parse(v2)
    val writers = reg.map { case (k, s) =>
      k -> new org.apache.avro.Schema.Parser().parse(s) }
    // v1-written message resolves through the v2 reader: defaults fill in
    val r1 = ConfluentAvro.decodeMessage(m1, writers, reader)
    assert(r1 == org.apache.spark.sql.Row(7L, "a", -1.0, Seq.empty))
    val r2 = ConfluentAvro.decodeMessage(m2, writers, reader)
    assert(r2 == org.apache.spark.sql.Row(8L, "b", 2.5, Seq("x", "y")))
    // unknown schema id names itself in the error
    val unknown = ConfluentAvro.frame(99, m1.drop(5))
    val e = intercept[IllegalArgumentException](
      ConfluentAvro.decodeMessage(unknown, writers, reader))
    assert(e.getMessage.contains("99"))
  }

  test("read: mixed-version framed archive → one DataFrame") {
    val dir = java.nio.file.Files.createTempDirectory("cav").toString
    val msgs = (1L to 20L).iterator.map { i =>
      if (i % 2 == 1) ConfluentAvro.encode(Seq(i, s"n$i", i * 0.5, Seq(s"t$i")), v2, 2)
      else ConfluentAvro.encode(Seq(i, s"n$i"), v1, 1)
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/part0.cav"), ProtoWire.frame(msgs))
    val df = ConfluentAvro.read(spark, dir, Map(1 -> v1, 2 -> v2), v2)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "score", "tags"))
    assert(df.count() == 20)
    assert(df.filter(col("score") === -1.0).count() == 10) // v1 defaults
    val odd7 = df.filter(col("id") === 7L).collect().head
    assert(odd7.getString(1) == "n7" && odd7.getDouble(2) == 3.5)
  }

  test("decode: Kafka value-column shape") {
    val s = spark
    import s.implicits._
    val payloads = Seq(
      ConfluentAvro.encode(Seq(1L, "a", 1.0, Seq[String]()), v2, 2),
      ConfluentAvro.encode(Seq(2L, "b"), v1, 1))
    val kafkaish = payloads.toDF("value")
    val out = ConfluentAvro.decode(kafkaish, "value", Map(1 -> v1, 2 -> v2), v2)
    assert(out.collect().map(r => (r.getLong(0), r.getDouble(2))).toSet ==
      Set((1L, 1.0), (2L, -1.0)))
  }

  test("readContainer: avro object container files resolve to reader schema") {
    val dir = java.nio.file.Files.createTempDirectory("avrocont").toString
    val schema = new org.apache.avro.Schema.Parser().parse(v1)
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, new java.io.File(s"$dir/part0.avro"))
    (1L to 5L).foreach { i =>
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("id", i); rec.put("name", s"n$i")
      w.append(rec)
    }
    w.close()
    // read the v1-written container through the (evolved) v2 reader
    val df = ConfluentAvro.readContainer(spark, dir, v2)
    assert(df.count() == 5)
    assert(df.agg(sum(col("id"))).collect().head.getLong(0) == 15L)
    assert(df.filter(col("score") === -1.0).count() == 5)
  }
}
