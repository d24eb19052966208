package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class AudioSpec extends SparkSpec {

  private def sine(n: Int, freq: Double, rate: Int): Array[Short] =
    Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * freq * i / rate) * 8000).toShort)

  test("WAV PCM16 encode/decode round-trips mono and stereo") {
    val mono = sine(1000, 440, 8000)
    assert(Multimodal.decodeWavPcm16(
      Multimodal.encodeWavPcm16(mono, 8000, 1))
      .exists { case (r, c, s) =>
        r == 8000 && c == 1 && s.sameElements(mono) })
    val stereo = Array.tabulate(400)(i => (i - 200).toShort)
    assert(Multimodal.decodeWavPcm16(
      Multimodal.encodeWavPcm16(stereo, 44100, 2))
      .exists { case (r, c, s) =>
        r == 44100 && c == 2 && s.sameElements(stereo) })
  }

  test("decoder walks unknown chunks (LIST before data, odd-size pad)") {
    val smp = Array.tabulate(11)(i => (i * 3 - 15).toShort)
    val canonical = Multimodal.encodeWavPcm16(smp, 16000, 1)
    // splice a 5-byte (odd) LIST chunk between fmt and data
    val fmtEnd = 12 + 8 + 16
    val extra = java.nio.ByteBuffer.allocate(8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put(Array[Byte]('I', 'N', 'F', 'O', 'x', 0 /* pad */))
    val spliced = canonical.take(fmtEnd) ++ extra.array() ++
      canonical.drop(fmtEnd)
    assert(Multimodal.decodeWavPcm16(spliced)
      .exists { case (r, c, s) =>
        r == 16000 && c == 1 && s.sameElements(smp) })
  }

  test("decoder rejects corrupt/foreign payloads instead of throwing") {
    assert(Multimodal.decodeWavPcm16(null).isEmpty)
    assert(Multimodal.decodeWavPcm16(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeWavPcm16("RIFFxxxxJUNK".getBytes).isEmpty)
    // truncated data chunk (declared size beyond buffer)
    val good = Multimodal.encodeWavPcm16(sine(100, 440, 8000), 8000, 1)
    assert(Multimodal.decodeWavPcm16(good.take(60)).isEmpty)
    // float-format wav (format tag 3) refused
    val floatWav = good.clone()
    floatWav(20) = 3
    assert(Multimodal.decodeWavPcm16(floatWav).isEmpty)
  }

  test("audioMeta/audioFeatures/resample over a DataFrame") {
    val s = spark
    import s.implicits._
    val smp = Array.tabulate(800)(i =>
      (((i * 11) % 2048) - 1024).toShort)
    val wav = Multimodal.encodeWavPcm16(smp, 8000, 1)
    val df = Seq((1L, wav), (2L, Array[Byte](9, 9, 9))).toDF("id", "wav")

    val meta = df.select(col("id"),
        Multimodal.audioMeta(col("wav")).as("m"))
      .orderBy("id").collect()
    assert(meta(0).getStruct(1).getInt(0) == 8000)
    assert(meta(0).getStruct(1).getLong(2) == 800L)
    assert(meta(0).getStruct(1).getLong(3) == 100L) // 800 frames @8k = 100 ms
    assert(meta(0).getStruct(1).getBoolean(4))
    assert(!meta(1).getStruct(1).getBoolean(4))

    val feat = df.filter(col("id") === 1)
      .select(Multimodal.audioFeatures(col("wav")).as("f")).head().getStruct(0)
    assert(feat.getLong(0) == smp.map(v => math.abs(v.toInt).toLong).sum)
    assert(feat.getInt(1) == smp.map(v => math.abs(v.toInt)).max)

    // 1:2 upsample doubles frames; even output frames copy the source
    val rs = df.filter(col("id") === 1)
      .select(Multimodal.resampleAudio(col("wav"), 16000).as("r"))
      .head().getAs[Array[Byte]](0)
    val Some((rate2, 1, up)) = Multimodal.decodeWavPcm16(rs)
    assert(rate2 == 16000 && up.length == 1600)
    assert((0 until 800).forall(k => up(2 * k) == smp(k)))

    // identity resample (same rate) is lossless
    val same = df.filter(col("id") === 1)
      .select(Multimodal.resampleAudio(col("wav"), 8000).as("r"))
      .head().getAs[Array[Byte]](0)
    assert(Multimodal.decodeWavPcm16(same).exists(_._3.sameElements(smp)))
  }
}
