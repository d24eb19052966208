package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) input format — the container web-scale
  * corpora actually ship in (a Common Crawl snapshot is ~90k `.warc.gz`
  * files), and the byte source the WARC→text front half of an LLM web
  * pipeline starts from ([[graft.functions.Html.htmlText]] →
  * blocklist/link-density/paragraph-dedup curation downstream). No WARC
  * library ships in this environment; the format is public and simple
  * (ISO 28500:2017; iipc/warc-specifications): one record is
  *
  * {{{
  * WARC/1.0\r\n
  * <header-name>: <value>\r\n ...        (folding continuations allowed)
  * \r\n
  * <Content-Length bytes of block>
  * \r\n\r\n                               (record separator)
  * }}}
  *
  * records concatenated. A `response` record's block is an HTTP/1.1
  * message; the payload behind the HTTP header break is the document
  * (usually HTML). `warcinfo`/`request`/`metadata` records interleave
  * and must parse (their block is the payload verbatim).
  *
  * Scale: WARC has no internal sync markers, so the parallel unit is the
  * FILE — `binaryFiles` assigns one task per archive and the parse is a
  * single linear cursor pass over the bytes, embarrassingly parallel
  * across files with zero shuffle; this is exactly how production Spark
  * jobs over Common Crawl partition the work (archives are sized ~1 GB
  * for that reason). `.warc.gz` ships per-record gzip MEMBERS
  * concatenated into one file; a single multi-member `GZIPInputStream`
  * pass decodes the whole archive, so the file stays the task unit. */
object Warc {

  /** `payload` is the HTTP payload for `application/http` blocks (the
    * document bytes), the raw block otherwise; `http_status`/
    * `http_content_type` are null for non-HTTP records. Record ids come
    * back with the spec's angle-bracket wrapping stripped. */
  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("warc_date", StringType),
    StructField("target_uri", StringType),
    StructField("content_type", StringType),
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("payload", BinaryType)))

  /** Read every record of every WARC archive under `path` (plain or
    * gzipped — sniffed per file by magic bytes, not extension). One task
    * per file; filter `warc_type === "response"` for documents. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext.binaryFiles(path).flatMap {
      case (_, pds) => parseAll(gunzipIfNeeded(pds.toArray()))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Charset-aware payload decode — the CCNet charset-handling step: a
    * web corpus is NOT uniformly UTF-8, and decoding everything as
    * UTF-8 is exactly the mis-decode mojibake repair exists to undo.
    * Honors the HTTP `Content-Type: …; charset=…` parameter: Latin-1
    * family through Spark's built-in decode, windows-1252 through the
    * native sloppy-cp1252 kernel (Spark's whitelist lacks it), UTF-8 /
    * unlabeled / unknown fall through to the UTF-8 cast. ASCII labels
    * route to the UTF-8 cast too (a strict superset on valid input).
    * Pure projection — the decode rides the same scan as the parse. */
  def payloadText(payload: org.apache.spark.sql.Column,
                  httpContentType: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val cs = lower(regexp_extract(coalesce(httpContentType, lit("")),
      "(?i)charset=\"?([A-Za-z0-9_\\-]+)", 1))
    when(cs.isin("iso-8859-1", "latin-1", "latin1", "iso8859-1"),
        decode(payload, "ISO-8859-1"))
      .when(cs.isin("windows-1252", "cp1252"),
        org.apache.spark.sql.graft.EncodingExprs.cp1252Decode(payload))
      .otherwise(payload.cast("string"))
  }

  // ---- parse ------------------------------------------------------------

  private[graft] def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b) {
      // multi-member stream: one pass decodes all concatenated members
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    } else bytes

  /** Linear single-pass record iterator over one archive's bytes.
    *
    * Truncation policy (what production readers do at crawl scale): a
    * record cut off at END of archive — header break or content block
    * running past EOF, the shape an interrupted fetch/upload leaves —
    * is DROPPED and iteration ends; every complete record before it
    * still surfaces, so one bad tail can't kill a 100 TB job. Bytes at
    * a record boundary that are not a WARC version line still throw:
    * that is framing desync (a lying Content-Length mid-file), where
    * silently skipping would misattribute payloads. */
  private[graft] def parseAll(bytes: Array[Byte]): Iterator[Row] =
    new Iterator[Row] {
      private var p = skipCrlf(0)
      private var ready: Row = _
      advance()
      private def skipCrlf(q0: Int): Int = {
        var q = q0
        while (q + 1 < bytes.length && bytes(q) == '\r' &&
          bytes(q + 1) == '\n') q += 2
        q
      }
      def hasNext: Boolean = ready != null
      def next(): Row = {
        if (ready == null) throw new NoSuchElementException
        val r = ready
        advance()
        r
      }
      private def advance(): Unit = {
        ready = null
        if (p >= bytes.length) return
        require(startsWith(p, "WARC/"),
          s"malformed WARC: no version line at offset $p")
        val headEnd = indexOfBreak(p)
        if (headEnd < 0) return // truncated tail: drop
        val head = new String(bytes, p, headEnd - p, UTF_8)
        val headers = parseHeaders(head)
        val len = headers.getOrElse("content-length",
          sys.error("malformed WARC: no Content-Length")).toInt
        val blockStart = headEnd + 4
        if (blockStart + len > bytes.length) return // truncated tail
        val block = java.util.Arrays.copyOfRange(
          bytes, blockStart, blockStart + len)
        p = skipCrlf(blockStart + len)
        val ctype = headers.get("content-type").orNull
        val isHttp =
          ctype != null && ctype.toLowerCase.startsWith("application/http")
        val (status, httpCt, payload) =
          if (isHttp) parseHttp(block) else (null, null, block)
        ready = Row(headers.get("warc-type").orNull,
          headers.get("warc-record-id").map(stripAngles).orNull,
          headers.get("warc-date").orNull,
          headers.get("warc-target-uri").map(stripAngles).orNull,
          ctype, status, httpCt, payload)
      }
      private def startsWith(q: Int, s: String): Boolean =
        q + s.length <= bytes.length &&
          s.indices.forall(i => bytes(q + i) == s.charAt(i))
      private def indexOfBreak(q0: Int): Int = {
        var q = q0
        while (q + 3 < bytes.length &&
          !(bytes(q) == '\r' && bytes(q + 1) == '\n' &&
            bytes(q + 2) == '\r' && bytes(q + 3) == '\n')) q += 1
        if (q + 3 < bytes.length) q else -1
      }
    }

  /** Named headers of one WARC or HTTP head, lowercased names, folded
    * continuation lines (leading SP/HT) appended per the grammar. The
    * first line (version / status) is skipped. */
  private def parseHeaders(head: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var last: String = null
    head.split("\r\n").iterator.drop(1).foreach { line =>
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')
          && last != null)
        out(last) = out(last) + " " + line.trim
      else {
        val i = line.indexOf(':')
        if (i > 0) {
          last = line.substring(0, i).trim.toLowerCase
          out(last) = line.substring(i + 1).trim
        }
      }
    }
    out.toMap
  }

  private def stripAngles(s: String): String =
    if (s.length >= 2 && s.charAt(0) == '<' && s.charAt(s.length - 1) == '>')
      s.substring(1, s.length - 1)
    else s

  /** Split an `application/http` block into (status, content-type,
    * payload). A block with no header break (truncated capture) keeps
    * the whole block as payload with null HTTP fields. */
  private def parseHttp(block: Array[Byte])
  : (Integer, String, Array[Byte]) = {
    var q = 0
    while (q + 3 < block.length &&
      !(block(q) == '\r' && block(q + 1) == '\n' &&
        block(q + 2) == '\r' && block(q + 3) == '\n')) q += 1
    if (q + 3 >= block.length) (null, null, block)
    else {
      val head = new String(block, 0, q, UTF_8)
      val statusLine = head.takeWhile(_ != '\r')
      val parts = statusLine.split(" ", 3)
      val status: Integer =
        if (parts.length >= 2 && parts(1).forall(_.isDigit))
          Integer.valueOf(parts(1))
        else null
      val headers = parseHeaders(head + "\r\n")
      (status, headers.get("content-type").orNull,
        java.util.Arrays.copyOfRange(block, q + 4, block.length))
    }
  }

  // ---- encode (test/tooling sink; a production sink would be a
  // FileFormat writing ~1 GB archives) ------------------------------------

  /** One WARC record; Content-Length is computed here. */
  def record(warcType: String, recordId: String, date: String,
             block: Array[Byte],
             contentType: Option[String] = None,
             targetUri: Option[String] = None): Array[Byte] = {
    val h = new StringBuilder("WARC/1.0\r\n")
    h ++= s"WARC-Type: $warcType\r\n"
    h ++= s"WARC-Record-ID: <$recordId>\r\n"
    h ++= s"WARC-Date: $date\r\n"
    targetUri.foreach(u => h ++= s"WARC-Target-URI: $u\r\n")
    contentType.foreach(c => h ++= s"Content-Type: $c\r\n")
    h ++= s"Content-Length: ${block.length}\r\n\r\n"
    val head = h.toString.getBytes(UTF_8)
    val out = new ArrayBuffer[Byte](head.length + block.length + 4)
    out ++= head
    out ++= block
    out += '\r'; out += '\n'; out += '\r'; out += '\n'
    out.toArray
  }

  /** A `response` record wrapping an HTTP response with `body` as entity
    * (status line reason phrase is free text per RFC 9112 — parsers key
    * on the code). */
  def responseRecord(uri: String, recordId: String, date: String,
                     body: Array[Byte],
                     httpContentType: String = "text/html; charset=utf-8",
                     status: Int = 200): Array[Byte] = {
    val reason = if (status == 200) "OK" else "Status"
    val http = (s"HTTP/1.1 $status $reason\r\n" +
      s"Content-Type: $httpContentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
    record("response", recordId, date, http ++ body,
      Some("application/http; msgtype=response"), Some(uri))
  }

  /** The `warcinfo` record real archives lead with. */
  def warcinfoRecord(recordId: String, date: String,
                     fields: Seq[(String, String)]): Array[Byte] =
    record("warcinfo", recordId, date,
      fields.map { case (k, v) => s"$k: $v\r\n" }.mkString.getBytes(UTF_8),
      Some("application/warc-fields"))

  /** A `conversion` record — WET's shape: the extracted-text derivative
    * of a response, `text/plain` content, no HTTP envelope (ISO 28500
    * §6.8; Common Crawl's WET files are exactly WARC conversion
    * records). */
  def conversionRecord(uri: String, recordId: String, date: String,
                       text: String): Array[Byte] =
    record("conversion", recordId, date, text.getBytes(UTF_8),
      Some("text/plain"), Some(uri))

  /** Concatenate records into one archive file (gzip whole-stream when
    * `gzip` — parseable by the same multi-member read path). */
  def writeFile(records: Iterator[Array[Byte]], outFile: String,
                gzip: Boolean = false): Unit = {
    val raw = new ArrayBuffer[Byte]()
    records.foreach(raw ++= _)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      if (gzip) gzipBytes(raw.toArray) else raw.toArray)
  }

  private def gzipBytes(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    bos.toByteArray
  }

  /** Distributed WET sink — the pipeline's OUTPUT half: curated text
    * written back as `conversion`-record archives, ONE ARCHIVE PER
    * PARTITION through the Hadoop filesystem API (works on HDFS/S3A the
    * same as local), which is the production shape — archive size is
    * governed by partitioning (repartition upstream to hit the ~1 GB
    * sweet spot), each task streams its records through one gzip
    * member, nothing aggregates on the driver. Record ids derive from
    * the URI hash so the write is deterministic for a fixed
    * partitioning. Returns the shard file names. */
  def writeWet(df: DataFrame, uriCol: String, textCol: String,
               outDir: String, date: String, gzip: Boolean = true)
  : Seq[String] = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val suffix = if (gzip) ".warc.wet.gz" else ".warc.wet"
    import org.apache.spark.sql.functions.col
    val rows = df.select(col(uriCol).cast("string"),
      col(textCol).cast("string"))
    val names = rows.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        // output-committer discipline: stream to a per-ATTEMPT temp name
        // and rename into place only after a clean close, so a task
        // attempt dying mid-write leaves a .tmp (never a truncated final
        // archive) and a zombie/speculative attempt can't interleave
        // bytes with the retry — rename is the atomic commit point
        // (best-effort atomic on object stores, exact on HDFS/local)
        val name = f"part-$pid%05d$suffix"
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val path = new org.apache.hadoop.fs.Path(outDir, name)
        val tmp = new org.apache.hadoop.fs.Path(outDir,
          s".$name.attempt-$attempt.tmp")
        val fs = path.getFileSystem(conf.value)
        val raw = fs.create(tmp, true)
        val out = if (gzip) new java.util.zip.GZIPOutputStream(raw)
          else raw: java.io.OutputStream
        var ok = false
        try {
          it.foreach { r =>
            val uri = r.getString(0)
            val id = "urn:graft:wet:" + java.lang.Long.toHexString(
              org.apache.spark.sql.graft.TextKernels.hash60(
                org.apache.spark.unsafe.types.UTF8String.fromString(uri)))
            out.write(conversionRecord(uri, id, date,
              Option(r.getString(1)).getOrElse("")))
          }
          ok = true
        } finally {
          out.close()
          if (ok) { fs.delete(path, false); fs.rename(tmp, path) }
          else fs.delete(tmp, false)
        }
        Iterator.single(name)
      }
    }.collect().toSeq
    names
  }
}
