package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Confluent-framed Avro input format (reference
  * `pinot-plugins/pinot-input-format/pinot-confluent-avro/` —
  * `KafkaConfluentSchemaRegistryAvroMessageDecoder`). The wire format is
  * public (Confluent "wire format" docs): byte 0 is magic 0x00, bytes 1-4
  * a big-endian schema-registry id, the rest an Avro binary record written
  * with that id's schema.
  *
  * No live schema registry exists in this environment, so a
  * `Map[Int, schema-json]` plays its role (exactly as a field-descriptor
  * list plays the .proto descriptor for [[ProtoWire]]): decode resolves
  * the WRITER schema by the frame's id and reads through Avro schema
  * resolution into a single READER schema, so mixed schema versions in one
  * topic land in one DataFrame — the decoder's whole point in the
  * reference.
  *
  * Scale: decode is per-record and embarrassingly parallel; the streaming
  * shape is a binary `value` column (Kafka's), the batch shape a
  * varint-framed message archive (the same framing [[ProtoWire]] reads,
  * since concatenated Avro binary is not self-delimiting).
  *
  * Supported reader-schema subset: a record of string/int/long/float/
  * double/boolean/bytes fields, arrays of those, and `["null", T]`
  * nullable unions. */
object ConfluentAvro {

  val Magic: Byte = 0x00

  // ---- framing ----------------------------------------------------------

  /** magic byte + 4-byte big-endian schema id + avro binary payload. */
  def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + payload.length)
    out(0) = Magic
    out(1) = (schemaId >>> 24).toByte
    out(2) = (schemaId >>> 16).toByte
    out(3) = (schemaId >>> 8).toByte
    out(4) = schemaId.toByte
    System.arraycopy(payload, 0, out, 5, payload.length)
    out
  }

  def schemaIdOf(msg: Array[Byte]): Int = {
    require(msg.length >= 5, s"confluent frame too short: ${msg.length} bytes")
    require(msg(0) == Magic,
      f"bad confluent magic byte 0x${msg(0)}%02x (expected 0x00)")
    ((msg(1) & 0xff) << 24) | ((msg(2) & 0xff) << 16) |
      ((msg(3) & 0xff) << 8) | (msg(4) & 0xff)
  }

  // ---- avro schema → spark schema (supported subset) --------------------

  private def isNullableUnion(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.size == 2 &&
      s.getTypes.get(0).getType == Schema.Type.NULL

  private def nonNullOf(s: Schema): Schema =
    if (isNullableUnion(s)) s.getTypes.get(1) else s

  private def sparkTypeOf(s0: Schema): DataType = {
    val s = nonNullOf(s0)
    s.getType match {
      case Schema.Type.STRING => StringType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG => LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES => BinaryType
      case Schema.Type.ARRAY => ArrayType(sparkTypeOf(s.getElementType))
      case t => throw new IllegalArgumentException(
        s"unsupported avro type in reader schema: $t")
    }
  }

  /** Spark schema for an Avro record schema (JSON form). */
  def schemaOf(readerJson: String): StructType = {
    val s = new Schema.Parser().parse(readerJson)
    require(s.getType == Schema.Type.RECORD,
      s"reader schema must be a record, got ${s.getType}")
    StructType(s.getFields.toArray.map { f0 =>
      val f = f0.asInstanceOf[Schema.Field]
      StructField(f.name(), sparkTypeOf(f.schema()),
        nullable = isNullableUnion(f.schema()))
    })
  }

  // ---- decode -----------------------------------------------------------

  private def toSpark(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case s: CharSequence => s.toString
    case b: java.nio.ByteBuffer =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case a: GenericData.Array[_] =>
      import scala.jdk.CollectionConverters._
      a.asScala.map(toSpark).toSeq
    case a: java.util.Collection[_] =>
      import scala.jdk.CollectionConverters._
      a.asScala.map(toSpark).toSeq
    case other => other
  }

  private def rowOf(rec: GenericRecord, reader: Schema): Row =
    Row.fromSeq(reader.getFields.toArray.map { f0 =>
      toSpark(rec.get(f0.asInstanceOf[Schema.Field].name()))
    }.toIndexedSeq)

  /** One schema-resolving datum reader per registry id — built once per
    * partition so the hot decode path allocates nothing per record. */
  private def datumReaders(writersById: Map[Int, Schema], reader: Schema)
  : Map[Int, GenericDatumReader[GenericRecord]] =
    writersById.map { case (id, w) =>
      id -> new GenericDatumReader[GenericRecord](w, reader)
    }

  private def decodeWith(msg: Array[Byte],
                         readersById: Map[Int, GenericDatumReader[GenericRecord]],
                         reader: Schema): Row = {
    val id = schemaIdOf(msg)
    val datumReader = readersById.getOrElse(id,
      throw new IllegalArgumentException(
        s"schema id $id not in registry (known: ${readersById.keys.toSeq.sorted
          .mkString(",")})"))
    val dec = DecoderFactory.get().binaryDecoder(msg, 5, msg.length - 5, null)
    rowOf(datumReader.read(null, dec), reader)
  }

  /** Decode one framed message: resolve the writer schema by frame id,
    * read through schema resolution into `reader`. (Single-record helper;
    * the partition paths hoist the datum readers instead.) */
  def decodeMessage(msg: Array[Byte], writersById: Map[Int, Schema],
                    reader: Schema): Row =
    decodeWith(msg, datumReaders(writersById, reader), reader)

  /** Kafka-facing shape: decode a binary message column (`valueCol`) into
    * the reader schema's columns. The registry travels as JSON strings
    * (avro Schema parses per-partition). */
  def decode(df: DataFrame, valueCol: String, registry: Map[Int, String],
             readerJson: String): DataFrame = {
    val spark = df.sparkSession
    val sparkSchema = schemaOf(readerJson)
    val idx = df.schema.fieldIndex(valueCol)
    val rdd = df.rdd.mapPartitions { it =>
      val reader = new Schema.Parser().parse(readerJson)
      val readers = datumReaders(registry.map { case (k, v) =>
        k -> new Schema.Parser().parse(v) }, reader)
      it.map(r => decodeWith(r.getAs[Array[Byte]](idx), readers, reader))
    }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** Batch-archive shape: varint-length-delimited files of confluent
    * frames (per-file parallel, same framing as [[ProtoWire]]). */
  def read(spark: SparkSession, path: String, registry: Map[Int, String],
           readerJson: String): DataFrame = {
    val sparkSchema = schemaOf(readerJson)
    val rdd = spark.sparkContext.binaryFiles(path).flatMap {
      case (_, pds) =>
        val reader = new Schema.Parser().parse(readerJson)
        val readers = datumReaders(registry.map { case (k, v) =>
          k -> new Schema.Parser().parse(v) }, reader)
        ProtoWire.splitMessages(pds.toArray())
          .map(m => decodeWith(m, readers, reader))
    }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** Plain Avro Object Container Files (the reference's base
    * `pinot-input-format/pinot-avro` reader): the writer schema rides in
    * the file header; records resolve into `readerJson`. Per-file
    * parallel — container blocks have sync markers, but the many-files
    * layout is how avro archives ship. */
  def readContainer(spark: SparkSession, path: String, readerJson: String)
  : DataFrame = {
    val sparkSchema = schemaOf(readerJson)
    val rdd = spark.sparkContext.binaryFiles(path).flatMap {
      case (_, pds) =>
        val reader = new Schema.Parser().parse(readerJson)
        val stream = new org.apache.avro.file.DataFileStream(
          new java.io.ByteArrayInputStream(pds.toArray()),
          new GenericDatumReader[GenericRecord](null, reader))
        import scala.jdk.CollectionConverters._
        val rows = stream.iterator().asScala.map(rowOf(_, reader))
        // close on exhaustion — flatMap drains the iterator fully
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = rows.hasNext
            if (!h) stream.close()
            h
          }
          override def next(): Row = rows.next()
        }
    }
    spark.createDataFrame(rdd, sparkSchema)
  }

  // ---- encode (round-trip tooling / test oracle) ------------------------

  /** Encode one record (values ordered like the schema's fields) as a
    * confluent frame under `schemaId`. */
  def encode(values: Seq[Any], schemaJson: String, schemaId: Int)
  : Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val rec = new GenericData.Record(schema)
    schema.getFields.toArray.zip(values).foreach { case (f0, v) =>
      val f = f0.asInstanceOf[Schema.Field]
      val avroV = v match {
        case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
        case s: Seq[_] =>
          import scala.jdk.CollectionConverters._
          s.asJava
        case other => other
      }
      rec.put(f.name(), avroV)
    }
    val bos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    frame(schemaId, bos.toByteArray)
  }
}
