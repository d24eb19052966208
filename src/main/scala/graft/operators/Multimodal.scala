package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata and a batched decode hook.
  *
  * The decode itself is STUBBED (no media libs in this container):
  * [[fakeFeatures]] derives deterministic pseudo-features from the content
  * hash so the schema / partitioning / batch plumbing is real and testable,
  * and a production deployment swaps `fakeFeatures` for a real decoder
  * behind the same Column/`mapPartitions` contract. A JVM decode would ride
  * [[decodePartitions]] — per-partition batching, the Scala analog of
  * `mapInPandas` batch shape.
  */
object Multimodal {
  /** Attach an opaque binary content column (here: utf-8 text bytes —
    * stand-in for image/audio payloads). */
  def withBinary(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("content", col(srcCol).cast("binary"))

  /** Typed metadata over the binary payload: byte length + sniffed kind.
    * Real magic-byte sniffing replaces the prefix probe. */
  def metadataOf(bin: Column): Column = struct(
    length(bin).as("n_bytes"),
    when(substring(bin, 1, 4) === lit("RIFF".getBytes), "audio/wav")
      .when(substring(bin, 1, 2) === lit(Array(0x89.toByte, 'P'.toByte)),
        "image/png")
      .otherwise("application/octet-stream").as("mime"))

  /** STUB decode: `dim` deterministic pseudo-features in [0,1) from the
    * content hash — oracle-replicable placeholder for a real
    * decode/feature-extract. */
  def fakeFeatures(text: Column, dim: Int): Column =
    array((0 until dim).map { i =>
      (conv(substring(md5(concat(text, lit(s"#$i"))), 1, 15), 16, 10)
        .cast("long") % 1000).cast("double") / 1000.0
    }: _*)

  /** Batched per-partition decode hook (the `mapInPandas` analog): the
    * caller supplies a batch decoder over Iterator[Array[Byte]]. Partition
    * size is governed by spark.sql.files.maxPartitionBytes upstream. */
  def decodePartitions[T: org.apache.spark.sql.Encoder](
      df: DataFrame, decode: Iterator[org.apache.spark.sql.Row] => Iterator[T])
  : org.apache.spark.sql.Dataset[T] =
    df.mapPartitions(decode)

  /** STUB resize: deterministic byte-budget re-encode (truncate / zero-pad
    * to `w·h` bytes) carrying the target dims in the metadata struct — the
    * schema and per-row cost shape of a real image resize; a production
    * deployment swaps the byte op for the codec call behind the same
    * contract. */
  def resizeStub(bin: Column, w: Int, h: Int): Column = {
    val target = w * h
    struct(
      rpad(substring(bin, 1, target), target, Array[Byte](0)).as("content"),
      lit(w).as("width"), lit(h).as("height"))
  }

  /** STUB frame-sample: `n` evenly spaced fixed-width byte windows from a
    * video-role binary column, as array<struct<frame_idx, frame>> — the
    * row-explodes-to-frames plumbing (schema, ordering, per-frame
    * metadata) of a real frame sampler. */
  def frameSample(bin: Column, n: Int, frameBytes: Int = 16): Column = {
    val stride = greatest(
      (length(bin) - frameBytes).cast("double") / math.max(1, n - 1),
      lit(0.0))
    transform(sequence(lit(0), lit(n - 1)), i =>
      struct(i.as("frame_idx"),
        substring(bin, (i.cast("double") * stride).cast("int") + 1,
          lit(frameBytes)).as("frame")))
  }
}
