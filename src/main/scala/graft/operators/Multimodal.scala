package graft.operators

import java.awt.image.BufferedImage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, REAL image decode/resize over the JDK's
  * `javax.imageio` (PNG/JPEG/BMP/GIF — no external libs needed), a REAL
  * RIFF/WAVE PCM audio codec (hand-rolled chunk walker — WAV is a plain
  * container, no codec library required), and a batched decode hook.
  *
  * VIDEO has a REAL container tier too (round 11): [[decodeAvi]] walks the
  * RIFF/AVI chunk grammar the same way the WAV codec does, and under
  * MJPEG every sampled frame ([[frameSampleAvi]]) is a full JPEG the
  * JDK's ImageIO decodes — so the whole image tier applies per frame.
  * The remaining waiver is the CODEC boundary, not the container:
  * inter-coded streams (H.264 etc.) have no JDK decoder, and
  * [[frameSample]] stays as the format-agnostic byte-window fallback.
  * [[fakeFeatures]] stays as the oracle-replicable placeholder for
  * learned feature extraction (an embedding model is out of scope by
  * nature, not environment). Everything image-shaped is real:
  * [[imageMeta]] decodes actual headers, [[resizeImage]] decodes, resamples
  * (nearest / bilinear, implemented directly over the ARGB raster so the
  * arithmetic is deterministic and spec-assertable pixel-by-pixel), and
  * re-encodes PNG. The decode runs as a scalar UDF deliberately: ImageIO is
  * imperative JVM work that cannot codegen, and per-row cost (ms) dwarfs
  * the UDF boundary (ns) — at 100 TB the governing knobs are partition
  * sizing (`spark.sql.files.maxPartitionBytes`) and executor-local CPU, not
  * expression fusion. A per-partition batch decoder rides
  * [[decodePartitions]], the Scala analog of `mapInPandas` batch shape.
  */
object Multimodal {
  /** Attach an opaque binary content column (here: utf-8 text bytes —
    * stand-in for image/audio payloads). */
  def withBinary(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("content", col(srcCol).cast("binary"))

  /** Typed metadata over the binary payload: byte length + magic-byte
    * sniffed mime (PNG/JPEG/GIF/BMP/WAV) — pure codegen'd prefix
    * comparisons, no decode. */
  def metadataOf(bin: Column): Column = struct(
    length(bin).as("n_bytes"),
    when(substring(bin, 1, 4) === lit("RIFF".getBytes), "audio/wav")
      .when(substring(bin, 1, 2) === lit(Array(0x89.toByte, 'P'.toByte)),
        "image/png")
      .when(substring(bin, 1, 2) === lit(Array(0xFF.toByte, 0xD8.toByte)),
        "image/jpeg")
      .when(substring(bin, 1, 4) === lit("GIF8".getBytes), "image/gif")
      .when(substring(bin, 1, 2) === lit("BM".getBytes), "image/bmp")
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

  // ---- real image tier (javax.imageio — ships with every JDK) ----

  private def readImage(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null) None
    else try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic raster resample. Nearest samples the source pixel under
    * each destination pixel center (`sx = ⌊(x+0.5)·srcW/dstW⌋` — integer
    * upscales duplicate pixels exactly); bilinear uses the align-centers
    * rule (`sx = (x+0.5)·srcW/dstW - 0.5`) blending the 4 clamped
    * neighbors per channel. Implemented directly over ARGB ints (not
    * Graphics2D rendering hints) so results are bit-stable across JVMs and
    * the spec can assert exact pixel values. */
  private[operators] def resample(src: BufferedImage, w: Int, h: Int,
                                  bilinear: Boolean): BufferedImage = {
    val (sw, sh) = (src.getWidth, src.getHeight)
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    var y = 0
    while (y < h) {
      val syF = (y + 0.5) * sh / h - 0.5
      var x = 0
      while (x < w) {
        val sxF = (x + 0.5) * sw / w - 0.5
        val argb = if (!bilinear) {
          val sx = math.min(sw - 1, ((x + 0.5) * sw / w).toInt)
          val sy = math.min(sh - 1, ((y + 0.5) * sh / h).toInt)
          src.getRGB(sx, sy)
        } else {
          val x0 = math.min(sw - 1, math.max(0, math.floor(sxF).toInt))
          val y0 = math.min(sh - 1, math.max(0, math.floor(syF).toInt))
          val x1 = math.min(sw - 1, x0 + 1)
          val y1 = math.min(sh - 1, y0 + 1)
          val fx = math.min(1.0, math.max(0.0, sxF - x0))
          val fy = math.min(1.0, math.max(0.0, syF - y0))
          val p00 = src.getRGB(x0, y0); val p10 = src.getRGB(x1, y0)
          val p01 = src.getRGB(x0, y1); val p11 = src.getRGB(x1, y1)
          def ch(shift: Int): Int = {
            def c(p: Int) = (p >>> shift) & 0xFF
            val top = c(p00) * (1 - fx) + c(p10) * fx
            val bot = c(p01) * (1 - fx) + c(p11) * fx
            math.round(top * (1 - fy) + bot * fy).toInt & 0xFF
          }
          (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
        }
        dst.setRGB(x, y, argb)
        x += 1
      }
      y += 1
    }
    dst
  }

  /** Header-true image metadata: decoded width/height (+ decode success).
    * Returns (null,null,false) for undecodable payloads rather than
    * failing the job — corrupt rows are data, not errors, at crawl
    * scale. */
  def imageMeta(bin: Column): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      readImage(bytes) match {
        case Some(img) => (Some(img.getWidth), Some(img.getHeight), true)
        case None => (None: Option[Int], None: Option[Int], false)
      }
    }
    f(bin).cast("struct<width:int,height:int,decodable:boolean>")
  }

  /** REAL image resize: ImageIO decode → [[resample]] (nearest |
    * bilinear) → PNG re-encode, as struct(content, width, height).
    * Undecodable input → null struct (filter on `imageMeta().decodable`
    * upstream to count drops). */
  def resizeImage(bin: Column, w: Int, h: Int,
                  method: String = "bilinear"): Column = {
    require(method == "nearest" || method == "bilinear",
      s"unknown resize method: $method")
    val bilinear = method == "bilinear"
    val f = udf { (bytes: Array[Byte]) =>
      readImage(bytes).map { img =>
        (encodePng(resample(img, w, h, bilinear)), w, h)
      }
    }
    f(bin).cast("struct<content:binary,width:int,height:int>")
  }

  /** Grayscale intensity features: decode, [[resample]] to a `side×side`
    * thumbnail (bilinear), emit row-major luma in [0,1] — a real, cheap,
    * deterministic image feature vector (the classic aHash front end),
    * ready for [[Similarity]] ANN or embedding near-dup. */
  def imageFeatures(bin: Column, side: Int = 8): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      readImage(bytes).map { img =>
        val t = resample(img, side, side, bilinear = true)
        val out = new Array[Double](side * side)
        var i = 0
        while (i < out.length) {
          val p = t.getRGB(i % side, i / side)
          val luma = 0.299 * ((p >>> 16) & 0xFF) +
            0.587 * ((p >>> 8) & 0xFF) + 0.114 * (p & 0xFF)
          out(i) = luma / 255.0
          i += 1
        }
        out
      }
    }
    f(bin)
  }

  /** Perceptual image hash (aHash): decode, resample to `side×side`,
    * threshold each cell's luma against the grid mean → one bit per cell
    * (row-major, bit i = y·side + x), side 8 → a 64-bit signature. Luma
    * uses the classic BT.601 integer per-mil weights (299·R + 587·G +
    * 114·B) and the threshold compares `luma·N > Σ luma` in EXACT integer
    * arithmetic — no floats anywhere, so the hash is bit-stable across
    * engines and replayable in SQL. Near-duplicate images are then pairs
    * within small Hamming distance — feed the result straight to
    * [[Dedup.hammingPairsWithin]]. Undecodable input → null. */
  def imageHash(bin: Column, side: Int = 8,
                method: String = "bilinear"): Column = {
    require(side * side <= 64, s"side $side exceeds 64 hash bits")
    require(method == "nearest" || method == "bilinear",
      s"unknown resize method: $method")
    val bilinear = method == "bilinear"
    val f = udf { (bytes: Array[Byte]) =>
      readImage(bytes).map { img =>
        val t = resample(img, side, side, bilinear)
        val n = side * side
        val lu = new Array[Long](n)
        var i = 0
        var sum = 0L
        while (i < n) {
          val p = t.getRGB(i % side, i / side)
          lu(i) = 299L * ((p >>> 16) & 0xFF) + 587L * ((p >>> 8) & 0xFF) +
            114L * (p & 0xFF)
          sum += lu(i)
          i += 1
        }
        var h = 0L
        i = 0
        while (i < n) {
          if (lu(i) * n > sum) h |= (1L << i)
          i += 1
        }
        h
      }
    }
    f(bin)
  }

  /** Image near-dup pairs: [[imageHash]] signatures blocked by
    * [[Dedup.hammingPairsWithin]] (pigeonhole chunks, perfect recall
    * within `maxDist`). The cross-modal twin of text SimHash dedup. */
  def imageNearDupPairs(df: DataFrame, binCol: String, idCol: String,
                        maxDist: Int, side: Int = 8,
                        method: String = "bilinear"): DataFrame = {
    val sigs = df.select(col(idCol),
        imageHash(col(binCol), side, method).as("phash"))
      .filter(col("phash").isNotNull)
    Dedup.hammingPairsWithin(sigs, "phash", idCol, side * side, maxDist)
  }

  // ---- real audio tier (RIFF/WAVE PCM — no codec library needed) ----

  /** Encode 16-bit little-endian PCM frames as a canonical WAV file
    * (RIFF header + fmt + data chunks). `samples` is channel-interleaved. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int,
                     channels: Int): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      s"interleave mismatch: ${samples.length} samples, $channels channels")
    val dataBytes = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Chunk-walking WAV parser: accepts any chunk ordering, skips unknown
    * chunks (LIST/INFO/fact...) honoring RIFF's odd-size pad byte, and
    * requires format 1 (integer PCM) at 16 bits. Returns
    * (sampleRate, channels, interleaved samples); None for anything it
    * cannot decode — corrupt rows are data, not errors, at crawl scale. */
  def decodeWavPcm16(
      bytes: Array[Byte]): Option[(Int, Int, Array[Short])] =
    try {
      if (bytes == null || bytes.length < 12) return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val tag = new Array[Byte](4)
      bb.get(tag)
      if (!java.util.Arrays.equals(tag, "RIFF".getBytes("US-ASCII")))
        return None
      bb.getInt // declared RIFF size — trust actual buffer instead
      bb.get(tag)
      if (!java.util.Arrays.equals(tag, "WAVE".getBytes("US-ASCII")))
        return None
      var fmt: Option[(Int, Int, Int, Int)] = None // format,channels,rate,bits
      var data: Option[Array[Short]] = None
      while (bb.remaining() >= 8 && (fmt.isEmpty || data.isEmpty)) {
        bb.get(tag)
        val size = bb.getInt
        if (size < 0 || size > bb.remaining()) return None
        val id = new String(tag, "US-ASCII")
        if (id == "fmt " && size >= 16) {
          val p = bb.position()
          fmt = Some((bb.getShort & 0xFFFF, bb.getShort & 0xFFFF,
            bb.getInt, { bb.getInt; bb.getShort; bb.getShort & 0xFFFF }))
          bb.position(p + size + (size & 1))
        } else if (id == "data") {
          val out = new Array[Short](size / 2)
          var i = 0
          while (i < out.length) { out(i) = bb.getShort; i += 1 }
          if ((size & 1) == 1 && bb.remaining() > 0) bb.get
          data = Some(out)
        } else {
          bb.position(bb.position() + size + (size & 1))
        }
      }
      for {
        (format, ch, rate, bits) <- fmt
        if format == 1 && bits == 16 && ch > 0 && rate > 0
        s <- data
      } yield (rate, ch, s)
    } catch { case _: Exception => None }

  /** Header-true audio metadata: sample rate / channels / frame count /
    * integer-ms duration from a real parse of the RIFF chunks. */
  def audioMeta(bin: Column): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      decodeWavPcm16(bytes).map { case (rate, ch, s) =>
        val frames = (s.length / ch).toLong
        (rate, ch, frames, frames * 1000L / rate, true)
      }.getOrElse((0, 0, 0L, 0L, false))
    }
    f(bin).cast("struct<sample_rate:int,channels:int,num_frames:bigint," +
      "duration_ms:bigint,decodable:boolean>")
  }

  /** Integer-exact audio features over all (interleaved) samples: Σ|s|
    * (energy proxy), peak |s|, and strict zero crossings
    * (s[i-1]·s[i] < 0) — the cheap front end of voice-activity /
    * silence-trim curation, bit-replayable in SQL. Undecodable → null. */
  def audioFeatures(bin: Column): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      decodeWavPcm16(bytes).map { case (_, _, s) =>
        var sumAbs = 0L
        var peak = 0
        var zc = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i).toInt
          val a = math.abs(v)
          sumAbs += a
          if (a > peak) peak = a
          if (i > 0 && s(i - 1).toInt * v < 0) zc += 1
          i += 1
        }
        (sumAbs, peak, zc)
      }
    }
    f(bin).cast("struct<sum_abs:bigint,peak:int,zero_cross:bigint>")
  }

  /** REAL audio resample (mono PCM16): linear interpolation at source
    * position t = j·srcRate/dstRate, round-half-up — integer-exact at
    * rational rate ratios so the kernel is SQL-replayable (the audio twin
    * of the bilinear image gate). Re-encodes WAV at `dstRate`. */
  def resampleAudio(bin: Column, dstRate: Int): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      decodeWavPcm16(bytes).collect { case (srcRate, 1, s) if s.nonEmpty =>
        val n = math.max(1, (s.length.toLong * dstRate / srcRate).toInt)
        val out = new Array[Short](n)
        var j = 0
        while (j < n) {
          val t = j.toDouble * srcRate / dstRate
          val i0 = math.min(s.length - 1, t.toInt)
          val i1 = math.min(s.length - 1, i0 + 1)
          val fr = t - i0
          out(j) = math.floor(
            s(i0) * (1 - fr) + s(i1) * fr + 0.5).toShort
          j += 1
        }
        encodeWavPcm16(out, dstRate, 1)
      }
    }
    f(bin)
  }

  /** STUB frame-sample: `n` evenly spaced fixed-width byte windows from a
    * video-role binary column, as array<struct<frame_idx, frame>> — the
    * row-explodes-to-frames plumbing (schema, ordering, per-frame
    * metadata) of a real frame sampler. Superseded by the REAL container
    * tier below ([[frameSampleAvi]]) for RIFF/AVI payloads; kept as the
    * format-agnostic fallback for opaque blobs. */
  def frameSample(bin: Column, n: Int, frameBytes: Int = 16): Column = {
    val stride = greatest(
      (length(bin) - frameBytes).cast("double") / math.max(1, n - 1),
      lit(0.0))
    transform(sequence(lit(0), lit(n - 1)), i =>
      struct(i.as("frame_idx"),
        substring(bin, (i.cast("double") * stride).cast("int") + 1,
          lit(frameBytes)).as("frame")))
  }

  // ---- real video tier (RIFF/AVI container — the WAV playbook applied
  // to video: AVI is the same RIFF chunk grammar, so the container
  // parses with a hand-rolled walker and no codec library; per-frame
  // payloads are MJPEG (one full JPEG per '00dc' chunk), which the JDK's
  // ImageIO decodes natively — [[resizeImage]]/[[imageFeatures]] apply
  // per frame. What stays out: inter-coded codecs (H.264 etc.), which no
  // JDK facility decodes — that boundary, not the container, is the
  // remaining waiver. ----

  /** A parsed AVI: dimensions + frame cadence from the `avih` header,
    * frame payloads from the `movi` list's `..dc`/`..db` chunks. */
  final case class AviVideo(width: Int, height: Int, usPerFrame: Int,
                            frames: Vector[Array[Byte]])

  /** Encode frame payloads as a minimal RIFF/AVI-MJPEG file: `hdrl`
    * (avih + one `vids`/`MJPG` stream with BITMAPINFOHEADER) + `movi`
    * of `00dc` chunks, odd sizes padded per RIFF. Deterministic bytes
    * for deterministic inputs. */
  def encodeAviMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
                     usPerFrame: Int): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0, "bad avi params")
    def ascii(s: String) = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(ascii(id)).putInt(body.length).put(body)
      bb.array()
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", ascii(listType) ++ children)
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
        .putInt(frames.length).putInt(0).putInt(1).putInt(0)
        .putInt(width).putInt(height)
      bb.array() // 4 reserved u32s stay zero
    }
    val strh = {
      val bb = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(ascii("vids")).put(ascii("MJPG"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(usPerFrame) // scale (with rate = 1e6 → us cadence)
        .putInt(1000000)    // rate
        .putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
      bb.putShort(0).putShort(0).putShort(width.toShort)
        .putShort(height.toShort)
      bb.array()
    }
    val strf = {
      val bb = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
        .put(ascii("MJPG")).putInt(width * height * 3)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).foldLeft(Array.empty[Byte])(_ ++ _))
    chunk("RIFF", ascii("AVI ") ++ hdrl ++ movi)
  }

  /** Chunk-walking AVI parser (the [[decodeWavPcm16]] discipline): any
    * chunk order, unknown chunks skipped with RIFF odd-size padding,
    * `..dc`/`..db` frame chunks collected in file order from `movi`
    * (including `rec ` sub-lists), dimensions/cadence from `avih`. None
    * for anything it cannot parse — corrupt rows are data, not errors. */
  def decodeAvi(bytes: Array[Byte]): Option[AviVideo] =
    try {
      if (bytes == null || bytes.length < 12) return None
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val tag = new Array[Byte](4)
      bb.get(tag)
      if (!java.util.Arrays.equals(tag, "RIFF".getBytes("US-ASCII")))
        return None
      bb.getInt // declared size — trust the buffer
      bb.get(tag)
      if (!java.util.Arrays.equals(tag, "AVI ".getBytes("US-ASCII")))
        return None
      var wh: Option[(Int, Int, Int)] = None // width, height, usPerFrame
      val frames = Vector.newBuilder[Array[Byte]]
      def isFrameId(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db"))
      // Depth-capped: a crafted file nesting a LIST every 12 bytes would
      // otherwise recurse ~bytes/12 deep and StackOverflowError past the
      // Exception handler. Real AVI nests 3-4 levels; 64 is unreachable
      // by honest input, so deeper == unparsable (None), not a crash.
      val MaxListDepth = 64
      def walk(end: Int, depth: Int): Unit =
        while (bb.position() + 8 <= end) {
          bb.get(tag)
          val id = new String(tag, "US-ASCII")
          val size = bb.getInt
          if (size < 0 || bb.position() + size > end)
            throw new IllegalArgumentException("chunk overruns parent")
          val next = bb.position() + size + (size & 1)
          if (id == "LIST" && size >= 4) {
            if (depth >= MaxListDepth)
              throw new IllegalArgumentException("LIST nesting too deep")
            bb.get(tag) // list type (hdrl/strl/movi/rec /...)
            walk(bb.position() + size - 4, depth + 1)
          } else if (id == "avih" && size >= 40) {
            val p = bb.position()
            val us = bb.getInt
            bb.position(p + 32)
            wh = Some((bb.getInt, bb.getInt, us))
          } else if (isFrameId(id)) {
            val f = new Array[Byte](size)
            bb.get(f)
            frames += f
          }
          bb.position(math.min(next, end))
        }
      walk(bytes.length, 0)
      wh.collect { case (w, h, us) if w > 0 && h > 0 && us > 0 =>
        AviVideo(w, h, us, frames.result())
      }
    } catch { case _: Exception => None }

  /** Container metadata of a video-role binary column — the real-parse
    * twin of [[audioMeta]]. Unparsable → zeros + decodable=false. */
  def videoMeta(bin: Column): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      decodeAvi(bytes).map(v =>
        (v.width, v.height, v.frames.length, v.usPerFrame, true))
        .getOrElse((0, 0, 0, 0, false))
    }
    f(bin).cast("struct<width:int,height:int,n_frames:int," +
      "us_per_frame:int,decodable:boolean>")
  }

  /** REAL frame sampling from an AVI container: `n` evenly spaced frames
    * by integer index `i·(F−1) / (n−1)` (i = 0 … n−1; single-frame
    * request takes frame 0), each the frame's full payload (a decodable
    * JPEG under MJPEG) — feed [[resizeImage]]/[[imageFeatures]] per
    * frame downstream. Fewer frames than `n` → every frame once, in
    * order; unparsable input → null. The sampling arithmetic is integer
    * division, bit-replayable in SQL. */
  def frameSampleAvi(bin: Column, n: Int): Column = {
    require(n > 0, s"n must be positive, got $n")
    val f = udf { (bytes: Array[Byte]) =>
      decodeAvi(bytes).map { v =>
        val fCount = v.frames.length
        if (fCount == 0) Seq.empty[(Int, Array[Byte])]
        else if (fCount <= n)
          v.frames.zipWithIndex.map { case (fr, i) => (i, fr) }
        else
          (0 until n).map { i =>
            val idx = if (n == 1) 0 else (i * (fCount - 1)) / (n - 1)
            (idx, v.frames(idx))
          }
      }.orNull
    }
    f(bin).cast("array<struct<frame_idx:int,frame:binary>>")
  }
}
