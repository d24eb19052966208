package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Protobuf input format (reference
  * `pinot-plugins/pinot-input-format/pinot-protobuf/` —
  * `ProtoBufRecordReader` reads varint-length-delimited messages guided by
  * a descriptor). No protobuf runtime ships in this environment, so this
  * is a from-scratch wire-format codec (the format is public and tiny:
  * varints, zigzag, fixed32/64, length-delimited — protobuf.dev/
  * programming-guides/encoding): a field-descriptor list plays the role of
  * the .proto descriptor and drives decode straight into Spark rows.
  *
  * Scale: decode is per-record and embarrassingly parallel; files split
  * per-file (length-delimited framing has no internal sync markers — the
  * same reason the reference reads protobuf files whole). At 100 TB the
  * layout answer is many files, which is how proto archives ship anyway.
  * Unknown fields are skipped by wire type, proto3-style; absent fields
  * decode as null.
  *
  * Supported field types: int32/int64/bool (varint), sint64 (zigzag),
  * double (fixed64), float (fixed32), string/bytes (length-delimited),
  * plus `repeated` for all of them (packed and unpacked numerics). */
object ProtoWire {

  sealed abstract class PType(val sparkType: DataType)
  case object PInt32 extends PType(IntegerType)
  case object PInt64 extends PType(LongType)
  case object PSInt64 extends PType(LongType)
  case object PBool extends PType(BooleanType)
  case object PDouble extends PType(DoubleType)
  case object PFloat extends PType(FloatType)
  case object PString extends PType(StringType)
  case object PBytes extends PType(BinaryType)

  /** One field of the message descriptor. */
  final case class Field(number: Int, name: String, ptype: PType,
                         repeated: Boolean = false) {
    def sparkField: StructField = StructField(name,
      if (repeated) ArrayType(ptype.sparkType) else ptype.sparkType)
  }

  def schemaOf(fields: Seq[Field]): StructType =
    StructType(fields.map(_.sparkField))

  // ---- wire primitives --------------------------------------------------

  private final class Cursor(val b: Array[Byte], var p: Int, val end: Int) {
    def hasNext: Boolean = p < end
  }

  private def readVarint(c: Cursor): Long = {
    var shift = 0
    var out = 0L
    var more = true
    while (more) {
      require(c.p < c.end && shift < 64, "malformed varint")
      val x = c.b(c.p)
      c.p += 1
      out |= (x & 0x7fL) << shift
      shift += 7
      more = (x & 0x80) != 0
    }
    out
  }

  private def writeVarint(out: ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    var more = true
    while (more) {
      val bits = (v & 0x7f).toByte
      v = v >>> 7
      more = v != 0
      out += (if (more) (bits | 0x80).toByte else bits)
    }
  }

  private def zigzagDecode(v: Long): Long = (v >>> 1) ^ -(v & 1)
  private def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)

  private def readFixed64(c: Cursor): Long = {
    require(c.p + 8 <= c.end, "malformed fixed64")
    var out = 0L
    var i = 0
    while (i < 8) { out |= (c.b(c.p + i) & 0xffL) << (8 * i); i += 1 }
    c.p += 8
    out
  }

  private def readFixed32(c: Cursor): Int = {
    require(c.p + 4 <= c.end, "malformed fixed32")
    var out = 0
    var i = 0
    while (i < 4) { out |= (c.b(c.p + i) & 0xff) << (8 * i); i += 1 }
    c.p += 4
    out
  }

  // ---- decode -----------------------------------------------------------

  private def decodeScalar(t: PType, c: Cursor, wireType: Int): Any =
    t match {
      case PInt32 => readVarint(c).toInt
      case PInt64 => readVarint(c)
      case PSInt64 => zigzagDecode(readVarint(c))
      case PBool => readVarint(c) != 0L
      case PDouble => java.lang.Double.longBitsToDouble(readFixed64(c))
      case PFloat => java.lang.Float.intBitsToFloat(readFixed32(c))
      case PString =>
        val len = readVarint(c).toInt
        require(c.p + len <= c.end, "malformed string")
        val s = new String(c.b, c.p, len, "UTF-8")
        c.p += len
        s
      case PBytes =>
        val len = readVarint(c).toInt
        require(c.p + len <= c.end, "malformed bytes")
        val out = java.util.Arrays.copyOfRange(c.b, c.p, c.p + len)
        c.p += len
        out
    }

  private def skipUnknown(c: Cursor, wireType: Int): Unit = wireType match {
    case 0 => readVarint(c)
    case 1 => c.p += 8
    case 2 => val len = readVarint(c).toInt; c.p += len
    case 5 => c.p += 4
    case w => throw new IllegalArgumentException(s"unsupported wire type $w")
  }

  private def isVarintType(t: PType): Boolean = t match {
    case PInt32 | PInt64 | PSInt64 | PBool => true
    case _ => false
  }

  /** Decode one message's bytes into row values ordered like `fields`. */
  def decodeValues(bytes: Array[Byte], fields: Seq[Field]): Array[Any] = {
    val byNumber = fields.iterator.zipWithIndex
      .map { case (f, i) => f.number -> ((f, i)) }.toMap
    val out = new Array[Any](fields.length)
    fields.iterator.zipWithIndex.foreach { case (f, i) =>
      if (f.repeated) out(i) = new ArrayBuffer[Any]()
    }
    val c = new Cursor(bytes, 0, bytes.length)
    while (c.hasNext) {
      val tag = readVarint(c)
      val number = (tag >>> 3).toInt
      val wireType = (tag & 7).toInt
      byNumber.get(number) match {
        case Some((f, i)) =>
          if (f.repeated) {
            val acc = out(i).asInstanceOf[ArrayBuffer[Any]]
            if (wireType == 2 && isVarintType(f.ptype)) {
              // packed numeric: one length-delimited run of varints
              val len = readVarint(c).toInt
              val inner = new Cursor(c.b, c.p, c.p + len)
              while (inner.hasNext) acc += decodeScalar(f.ptype, inner, 0)
              c.p += len
            } else if (wireType == 2 && (f.ptype == PDouble)) {
              val len = readVarint(c).toInt
              val inner = new Cursor(c.b, c.p, c.p + len)
              while (inner.hasNext) acc += decodeScalar(f.ptype, inner, 1)
              c.p += len
            } else if (wireType == 2 && (f.ptype == PFloat)) {
              val len = readVarint(c).toInt
              val inner = new Cursor(c.b, c.p, c.p + len)
              while (inner.hasNext) acc += decodeScalar(f.ptype, inner, 5)
              c.p += len
            } else acc += decodeScalar(f.ptype, c, wireType)
          } else out(i) = decodeScalar(f.ptype, c, wireType)
        case None => skipUnknown(c, wireType)
      }
    }
    // repeated fields land as Seq (Spark ArrayType); never-seen repeated
    // fields stay empty arrays (proto3: absent repeated == empty)
    fields.iterator.zipWithIndex.foreach { case (f, i) =>
      if (f.repeated) out(i) = out(i).asInstanceOf[ArrayBuffer[Any]].toSeq
    }
    out
  }

  // ---- encode (round-trip tooling / test oracle) ------------------------

  private def encodeScalar(out: ArrayBuffer[Byte], f: Field, v: Any): Unit = {
    def tag(wireType: Int): Unit = writeVarint(out, (f.number << 3) | wireType)
    f.ptype match {
      case PInt32 => tag(0); writeVarint(out, v.asInstanceOf[Int].toLong)
      case PInt64 => tag(0); writeVarint(out, v.asInstanceOf[Long])
      case PSInt64 => tag(0); writeVarint(out, zigzagEncode(v.asInstanceOf[Long]))
      case PBool => tag(0); writeVarint(out, if (v.asInstanceOf[Boolean]) 1 else 0)
      case PDouble =>
        tag(1)
        val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
        (0 until 8).foreach(i => out += ((bits >>> (8 * i)) & 0xff).toByte)
      case PFloat =>
        tag(5)
        val bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
        (0 until 4).foreach(i => out += ((bits >>> (8 * i)) & 0xff).toByte)
      case PString =>
        tag(2)
        val b = v.asInstanceOf[String].getBytes("UTF-8")
        writeVarint(out, b.length.toLong); out ++= b
      case PBytes =>
        tag(2)
        val b = v.asInstanceOf[Array[Byte]]
        writeVarint(out, b.length.toLong); out ++= b
    }
  }

  /** Encode one row's values (ordered like `fields`) into message bytes.
    * Nulls are omitted (proto3 absent); repeated values are emitted
    * unpacked — the decoder accepts both packed and unpacked. */
  def encodeValues(values: Seq[Any], fields: Seq[Field]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    fields.zip(values).foreach { case (f, v) =>
      if (v != null) {
        if (f.repeated) v.asInstanceOf[Seq[Any]]
          .foreach(x => encodeScalar(out, f, x))
        else encodeScalar(out, f, v)
      }
    }
    out.toArray
  }

  /** Split a varint-length-delimited file body into message byte slices. */
  def splitMessages(bytes: Array[Byte]): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private val c = new Cursor(bytes, 0, bytes.length)
      def hasNext: Boolean = c.hasNext
      def next(): Array[Byte] = {
        val len = readVarint(c).toInt
        require(c.p + len <= c.end, "truncated message")
        val m = java.util.Arrays.copyOfRange(c.b, c.p, c.p + len)
        c.p += len
        m
      }
    }

  /** Frame messages with varint length prefixes (file writer side). */
  def frame(messages: Iterator[Array[Byte]]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    messages.foreach { m => writeVarint(out, m.length.toLong); out ++= m }
    out.toArray
  }

  // ---- Spark integration ------------------------------------------------

  /** Read a directory/glob of varint-length-delimited protobuf files into
    * a DataFrame. Parallelism is per-file (binaryFiles), decode runs in
    * executors — the many-files layout proto archives ship in anyway. */
  def read(spark: SparkSession, path: String, fields: Seq[Field])
  : DataFrame = {
    val schema = schemaOf(fields)
    val fieldsB = spark.sparkContext.broadcast(fields.toIndexedSeq)
    val rdd = spark.sparkContext.binaryFiles(path).flatMap {
      case (_, pds) =>
        val fs = fieldsB.value
        splitMessages(pds.toArray())
          .map(m => Row.fromSeq(decodeValues(m, fs).toIndexedSeq))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Write a DataFrame column-subset as one length-delimited proto file
    * (test/tooling sink; a production sink would be a FileFormat). */
  def writeFile(df: DataFrame, fields: Seq[Field],
                outFile: String): Unit = {
    val names = fields.map(_.name)
    val rows = df.select(names.map(org.apache.spark.sql.functions.col): _*)
      .collect()
    val body = frame(rows.iterator.map(r =>
      encodeValues(names.indices.map(r.get), fields)))
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile), body)
  }
}
