package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.nio.file.Files

import graft.sources.Warc
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) archive codec: record framing, header folding, HTTP
  * payload split, gzip members, malformed-capture leniency. */
class WarcSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-warc").toString
  private val date = "2026-01-01T00:00:00Z"

  private def archive(gzip: Boolean, path: String): Unit = {
    val recs = Iterator(
      Warc.warcinfoRecord("urn:uuid:info-0", date,
        Seq("software" -> "graft", "format" -> "WARC File Format 1.0")),
      Warc.record("request", "urn:uuid:req-1", date,
        "GET /a HTTP/1.1\r\nHost: x.io\r\n\r\n".getBytes(UTF_8),
        Some("application/http; msgtype=request"),
        Some("https://x.io/a")),
      Warc.responseRecord("https://x.io/a", "urn:uuid:resp-1", date,
        "<html><body>Hello &amp; welcome</body></html>".getBytes(UTF_8)),
      Warc.responseRecord("https://y.io/b?q=1", "urn:uuid:resp-2", date,
        Array[Byte](0, 1, 2, -1, 127), httpContentType = "application/pdf"))
    Warc.writeFile(recs, path, gzip = gzip)
  }

  test("record round-trip: types, uri/id unwrapping, http payload split, " +
      "binary-exact payloads, non-http blocks kept whole") {
    archive(gzip = false, s"$tmp/plain.warc")
    val rows = Warc.read(spark, s"$tmp/plain.warc")
      .orderBy(col("record_id")).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("warcinfo", "request", "response", "response"))
    val info = rows(0)
    assert(info.getString(1) == "urn:uuid:info-0") // angles stripped
    assert(new String(info.getAs[Array[Byte]](7), UTF_8)
      .contains("software: graft"))
    assert(info.isNullAt(5)) // no http status on warc-fields
    val req = rows(1) // request blocks are http too: payload empty
    assert(req.getString(3) == "https://x.io/a" && req.isNullAt(5))
    val resp = rows(2)
    assert(resp.getInt(5) == 200 &&
      resp.getString(6) == "text/html; charset=utf-8")
    assert(new String(resp.getAs[Array[Byte]](7), UTF_8) ==
      "<html><body>Hello &amp; welcome</body></html>")
    val pdf = rows(3)
    assert(pdf.getString(3) == "https://y.io/b?q=1" &&
      pdf.getString(6) == "application/pdf" &&
      pdf.getAs[Array[Byte]](7).toSeq == Seq[Byte](0, 1, 2, -1, 127))
  }

  test("gzip archive parses identically to the plain twin (multi-member " +
      "path), sniffed by magic bytes not extension") {
    archive(gzip = false, s"$tmp/t.warc")
    archive(gzip = true, s"$tmp/t2.warc") // .warc name, gzip content
    val plain = Warc.read(spark, s"$tmp/t.warc")
      .orderBy(col("record_id")).collect()
    val gz = Warc.read(spark, s"$tmp/t2.warc")
      .orderBy(col("record_id")).collect()
    assert(plain.length == gz.length &&
      plain.zip(gz).forall { case (a, b) =>
        a.toSeq.dropRight(1) == b.toSeq.dropRight(1) &&
          a.getAs[Array[Byte]](7).toSeq == b.getAs[Array[Byte]](7).toSeq })
  }

  test("header folding, case-insensitive names, and a truncated http " +
      "capture falling back to whole-block payload") {
    val folded = ("WARC/1.0\r\nwarc-type: metadata\r\n" +
      "WARC-Record-ID: <urn:uuid:m-1>\r\nWARC-Date: " + date + "\r\n" +
      "WARC-Target-URI: https://long.example/\r\n\tpath\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes(UTF_8)
    val truncated = Warc.record("response", "urn:uuid:t-1", date,
      "HTTP/1.1 200 OK\r\nContent-Type: text".getBytes(UTF_8),
      Some("application/http; msgtype=response"), Some("https://t.io/"))
    Files.write(java.nio.file.Paths.get(s"$tmp/edge.warc"),
      folded ++ truncated)
    val rows = Warc.read(spark, s"$tmp/edge.warc")
      .orderBy(col("record_id")).collect()
    assert(rows(0).getString(0) == "metadata" &&
      rows(0).getString(3) == "https://long.example/ path")
    assert(new String(rows(0).getAs[Array[Byte]](7), UTF_8) == "ok")
    assert(rows(1).isNullAt(5) && new String(
      rows(1).getAs[Array[Byte]](7), UTF_8).startsWith("HTTP/1.1 200"))
  }

  test("seeded fuzz round-trip: 200 records with adversarial payloads — " +
      "embedded record separators, WARC magic, raw CRLFs — framing is " +
      "Content-Length, never delimiter scanning") {
    val rnd = new scala.util.Random(13)
    val adversarial = Seq(
      "\r\n\r\n".getBytes(UTF_8), "WARC/1.0\r\n".getBytes(UTF_8),
      "HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8), Array[Byte]())
    val recs = (0 until 200).map { i =>
      val payload =
        if (i % 7 == 0) adversarial(i % adversarial.length)
        else { val b = new Array[Byte](rnd.nextInt(300)); rnd.nextBytes(b); b }
      val id = f"urn:uuid:fuzz-$i%03d"
      (i % 3) match {
        case 0 => (id, "response", payload,
          Warc.responseRecord(s"https://f.io/$i", id, date, payload,
            httpContentType = s"application/x-$i", status = 200 + i % 4))
        case 1 => (id, "metadata", payload,
          Warc.record("metadata", id, date, payload,
            Some("application/octet-stream"), Some(s"https://f.io/$i")))
        case _ => (id, "request", payload,
          Warc.record("request", id, date,
            (s"GET /$i HTTP/1.1\r\n\r\n".getBytes(UTF_8) ++ payload),
            Some("application/http; msgtype=request"),
            Some(s"https://f.io/$i")))
      }
    }
    Warc.writeFile(recs.iterator.map(_._4), s"$tmp/fuzz.warc.gz",
      gzip = true)
    val got = Warc.read(spark, s"$tmp/fuzz.warc.gz")
      .orderBy(col("record_id")).collect()
    assert(got.length == 200)
    recs.sortBy(_._1).zip(got).foreach { case ((id, tpe, payload, _), r) =>
      assert(r.getString(1) == id && r.getString(0) == tpe)
      // http records (response/request) surface the payload behind the
      // header break; metadata surfaces the whole block — both must be
      // byte-exact
      assert(r.getAs[Array[Byte]](7).toSeq == payload.toSeq,
        s"payload drift on $id")
    }
  }

  test("payloadText: routes on the declared charset — latin-1 and " +
      "cp1252 payloads decode correctly, utf-8/unlabeled/unknown fall " +
      "through, a blind utf-8 cast would mojibake") {
    val s2 = spark
    import s2.implicits._
    val text = "café ½ “q” €"
    val rows = Seq(
      (1L, text.getBytes(UTF_8), "text/html; charset=utf-8"),
      (2L, "café ½".getBytes(ISO_8859_1), "text/html; charset=\"ISO-8859-1\""),
      (3L, text.getBytes("windows-1252"), "text/html; charset=WINDOWS-1252"),
      (4L, "plain".getBytes(UTF_8), "text/html"),
      (5L, "plain".getBytes(UTF_8), null.asInstanceOf[String]),
      (6L, text.getBytes(UTF_8), "text/html; charset=x-unknown-enc"))
      .toDF("id", "payload", "ct")
    val got = rows.select(col("id"),
        Warc.payloadText(col("payload"), col("ct")).as("t"))
      .orderBy(col("id")).collect().map(_.getString(1))
    assert(got(0) == text && got(1) == "café ½" && got(2) == text)
    assert(got(3) == "plain" && got(4) == "plain" && got(5) == text)
    // the five cp1252-undefined bytes decode sloppily (C1 controls),
    // keeping the round trip total rather than information-destroying
    val edge = Seq((1L, Array[Byte](0x81.toByte, 0x9D.toByte),
      "text/html; charset=cp1252")).toDF("id", "payload", "ct")
    assert(edge.select(Warc.payloadText(col("payload"), col("ct")))
      .head().getString(0) == "\u0081\u009d")
  }

  test("truncated archive tails drop gracefully — complete records " +
      "surface, the cut-off trailing record doesn't kill the task; " +
      "mid-file desync still throws") {
    val full = Warc.responseRecord("https://x.io/a", "urn:uuid:t-0", date,
      "<html>ok</html>".getBytes(UTF_8))
    val victim = Warc.responseRecord("https://x.io/b", "urn:uuid:t-1",
      date, "<html>cut</html>".getBytes(UTF_8))
    // cut mid-BLOCK (content-length runs past EOF) and mid-HEADER
    val cutBlock = full ++ full ++ victim.dropRight(12)
    val cutHead = full ++ victim.take(30)
    Files.write(java.nio.file.Paths.get(s"$tmp/cutb.warc"), cutBlock)
    Files.write(java.nio.file.Paths.get(s"$tmp/cuth.warc"), cutHead)
    assert(Warc.read(spark, s"$tmp/cutb.warc").count() == 2)
    assert(Warc.read(spark, s"$tmp/cuth.warc").count() == 1)
    // desync (garbage at a record boundary) is NOT tail truncation
    val desync = full ++ "GARBAGE".getBytes(UTF_8) ++ full
    intercept[Exception] {
      Warc.parseAll(desync).toList
    }
  }

  test("writeWet: one conversion-record archive per partition through " +
      "the Hadoop FS API; round-trips through the gated reader") {
    val s2 = spark
    import s2.implicits._
    val docs = (0 until 40)
      .map(i => (s"https://x.io/$i", s"curated text $i\nline two"))
      .toDF("uri", "text").repartition(4)
    val out = s"$tmp/wet"
    val names = Warc.writeWet(docs, "uri", "text", out, date)
    assert(names.size == 4 && names.forall(_.endsWith(".warc.wet.gz")))
    val back = Warc.read(spark, out)
    assert(back.count() == 40)
    val r = back.filter(col("target_uri") === "https://x.io/7")
      .head()
    assert(r.getString(0) == "conversion" &&
      r.getString(4) == "text/plain" && r.isNullAt(5) &&
      new String(r.getAs[Array[Byte]](7), UTF_8) ==
        "curated text 7\nline two")
    // uncompressed twin + null text → empty record
    val n2 = Warc.writeWet(Seq(("https://x.io/n", null: String))
      .toDF("uri", "text").coalesce(1), "uri", "text", s"$tmp/wet2",
      date, gzip = false)
    assert(n2 == Seq("part-00000.warc.wet"))
    val b2 = Warc.read(spark, s"$tmp/wet2").head()
    assert(b2.getAs[Array[Byte]](7).isEmpty)
  }

  test("multi-file archives: one task per file, every record surfaces") {
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/m"))
    archive(gzip = false, s"$tmp/m/f0.warc")
    archive(gzip = true, s"$tmp/m/f1.warc.gz")
    val df = Warc.read(spark, s"$tmp/m")
    assert(df.count() == 8)
    assert(df.filter(col("warc_type") === "response").count() == 4)
  }
}
