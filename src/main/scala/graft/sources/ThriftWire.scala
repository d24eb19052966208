package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Thrift input format (reference
  * `pinot-plugins/pinot-input-format/pinot-thrift/` —
  * `ThriftRecordReader` deserializes TBinaryProtocol structs from a
  * stream). No thrift runtime ships here, so the binary protocol is
  * implemented directly (it is public and small: 1-byte field type,
  * 2-byte big-endian field id, typed payload, 0x00 stop byte —
  * thrift.apache.org binary-protocol spec): a field-descriptor list
  * plays the role of the generated struct class.
  *
  * Files are concatenated structs (each self-terminates at its stop
  * byte — the stream framing the reference's reader uses). Decode is
  * per-record and embarrassingly parallel; files split per-file.
  * Unknown fields skip by wire type; absent fields decode as null.
  *
  * Supported: BOOL, BYTE, I16, I32, I64, DOUBLE, STRING (utf-8), BINARY,
  * and LIST of any of those. */
object ThriftWire {

  sealed abstract class TType(val code: Byte, val sparkType: DataType)
  case object TBool extends TType(2, BooleanType)
  case object TByte extends TType(3, ByteType)
  case object TDouble extends TType(4, DoubleType)
  case object TI16 extends TType(6, ShortType)
  case object TI32 extends TType(8, IntegerType)
  case object TI64 extends TType(10, LongType)
  case object TString extends TType(11, StringType)
  case object TBinary extends TType(11, BinaryType) // same wire as STRING

  final case class Field(id: Short, name: String, ttype: TType,
                         repeated: Boolean = false) {
    def sparkField: StructField = StructField(name,
      if (repeated) ArrayType(ttype.sparkType) else ttype.sparkType)
  }

  def schemaOf(fields: Seq[Field]): StructType =
    StructType(fields.map(_.sparkField))

  private val Stop: Byte = 0
  private val ListCode: Byte = 15

  // Accessors bounds-check so truncated/corrupt input fails as a
  // descriptive "malformed thrift" error, not a raw
  // ArrayIndexOutOfBounds/NegativeArraySize — same posture as
  // ProtoWire's require() guards.
  private final class Cursor(val b: Array[Byte], var p: Int) {
    private def need(n: Int): Unit =
      require(n >= 0 && p + n <= b.length,
        s"malformed thrift: need $n bytes at offset $p of ${b.length}")
    def u8(): Int = { need(1); val v = b(p) & 0xff; p += 1; v }
    def i16(): Short = {
      need(2)
      val v = ((b(p) & 0xff) << 8 | (b(p + 1) & 0xff)).toShort
      p += 2; v
    }
    def i32(): Int = {
      need(4)
      var v = 0
      var i = 0
      while (i < 4) { v = (v << 8) | (b(p + i) & 0xff); i += 1 }
      p += 4; v
    }
    def i64(): Long = {
      need(8)
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
      p += 8; v
    }
    def bytes(n: Int): Array[Byte] = {
      need(n)
      val out = java.util.Arrays.copyOfRange(b, p, p + n)
      p += n; out
    }
  }

  private def readScalar(c: Cursor, code: Byte, asBinary: Boolean): Any =
    code match {
      case 2 => c.u8() != 0
      case 3 => c.u8().toByte
      case 4 => java.lang.Double.longBitsToDouble(c.i64())
      case 6 => c.i16()
      case 8 => c.i32()
      case 10 => c.i64()
      case 11 =>
        val raw = c.bytes(c.i32())
        if (asBinary) raw else new String(raw, "UTF-8")
      case other =>
        throw new IllegalArgumentException(s"unsupported thrift type $other")
    }

  private def skip(c: Cursor, code: Byte): Unit = code match {
    case 2 | 3 => c.u8()
    case 4 | 10 => c.i64()
    case 6 => c.i16()
    case 8 => c.i32()
    case 11 => c.bytes(c.i32())
    case 12 => // nested struct: skip its fields to the stop byte
      var t = c.u8().toByte
      while (t != Stop) { c.i16(); skip(c, t); t = c.u8().toByte }
    case 13 => // map: key type, value type, count
      val kt = c.u8().toByte; val vt = c.u8().toByte
      val n = c.i32()
      (0 until n).foreach { _ => skip(c, kt); skip(c, vt) }
    case 14 | 15 => // set / list
      val et = c.u8().toByte
      val n = c.i32()
      (0 until n).foreach(_ => skip(c, et))
    case other =>
      throw new IllegalArgumentException(s"unsupported thrift type $other")
  }

  /** Decode one struct starting at the cursor; returns values ordered
    * like `fields` and leaves the cursor after the stop byte. */
  private def decodeStruct(c: Cursor, fields: Seq[Field]): Array[Any] = {
    val byId = fields.iterator.zipWithIndex
      .map { case (f, i) => f.id -> ((f, i)) }.toMap
    val out = new Array[Any](fields.length)
    var t = c.u8().toByte
    while (t != Stop) {
      val id = c.i16()
      byId.get(id) match {
        case Some((f, i)) if !f.repeated && t == f.ttype.code =>
          out(i) = readScalar(c, t, f.ttype == TBinary)
        case Some((f, i)) if f.repeated && t == ListCode =>
          val et = c.u8().toByte
          val n = c.i32()
          require(et == f.ttype.code, s"list elem type $et for ${f.name}")
          out(i) = (0 until n)
            .map(_ => readScalar(c, et, f.ttype == TBinary))
        case _ => skip(c, t) // unknown id or unexpected type
      }
      t = c.u8().toByte
    }
    out
  }

  def decodeValues(bytes: Array[Byte], fields: Seq[Field]): Array[Any] =
    decodeStruct(new Cursor(bytes, 0), fields)

  // ---- encode (round-trip tooling / test oracle) ------------------------

  private def writeI16(out: ArrayBuffer[Byte], v: Short): Unit = {
    out += ((v >> 8) & 0xff).toByte; out += (v & 0xff).toByte
  }
  private def writeI32(out: ArrayBuffer[Byte], v: Int): Unit =
    (3 to 0 by -1).foreach(i => out += ((v >> (8 * i)) & 0xff).toByte)
  private def writeI64(out: ArrayBuffer[Byte], v: Long): Unit =
    (7 to 0 by -1).foreach(i => out += ((v >> (8 * i)) & 0xff).toByte)

  private def writeScalar(out: ArrayBuffer[Byte], t: TType, v: Any): Unit =
    t match {
      case TBool => out += (if (v.asInstanceOf[Boolean]) 1 else 0).toByte
      case TByte => out += v.asInstanceOf[Byte]
      case TDouble =>
        writeI64(out, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case TI16 => writeI16(out, v.asInstanceOf[Short])
      case TI32 => writeI32(out, v.asInstanceOf[Int])
      case TI64 => writeI64(out, v.asInstanceOf[Long])
      case TString =>
        val b = v.asInstanceOf[String].getBytes("UTF-8")
        writeI32(out, b.length); out ++= b
      case TBinary =>
        val b = v.asInstanceOf[Array[Byte]]
        writeI32(out, b.length); out ++= b
    }

  /** Encode one row's values as a TBinaryProtocol struct (nulls omitted). */
  def encodeValues(values: Seq[Any], fields: Seq[Field]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    fields.zip(values).foreach { case (f, v) =>
      if (v != null) {
        if (f.repeated) {
          out += ListCode
          writeI16(out, f.id)
          out += f.ttype.code
          val xs = v.asInstanceOf[Seq[Any]]
          writeI32(out, xs.length)
          xs.foreach(x => writeScalar(out, f.ttype, x))
        } else {
          out += f.ttype.code
          writeI16(out, f.id)
          writeScalar(out, f.ttype, v)
        }
      }
    }
    out += Stop
    out.toArray
  }

  // ---- Spark integration ------------------------------------------------

  /** Read a directory/glob of concatenated TBinaryProtocol structs. */
  def read(spark: SparkSession, path: String, fields: Seq[Field])
  : DataFrame = {
    val schema = schemaOf(fields)
    val fieldsB = spark.sparkContext.broadcast(fields.toIndexedSeq)
    val rdd = spark.sparkContext.binaryFiles(path).flatMap {
      case (_, pds) =>
        val fs = fieldsB.value
        val bytes = pds.toArray()
        val c = new Cursor(bytes, 0)
        Iterator.continually(())
          .takeWhile(_ => c.p < bytes.length)
          .map(_ => Row.fromSeq(decodeStruct(c, fs).toIndexedSeq))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Write a DataFrame column-subset as one concatenated-structs file
    * (test/tooling sink, same caveat as [[ProtoWire.writeFile]]). */
  def writeFile(df: DataFrame, fields: Seq[Field], outFile: String): Unit = {
    val names = fields.map(_.name)
    val rows = df.select(names.map(org.apache.spark.sql.functions.col): _*)
      .collect()
    val out = new ArrayBuffer[Byte]()
    rows.foreach(r => out ++= encodeValues(names.indices.map(r.get), fields))
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile), out.toArray)
  }
}
