package graft

import graft.sources.ClpLog
import org.apache.spark.sql.functions._

class ClpLogSpec extends SparkSpec {

  test("encodeMessage: logtype/dictionary/encoded decomposition") {
    val e = ClpLog.encodeMessage(
      "Started task 123 on host-9.example.com (attempt 2, latency=4.5 ms)")
    // ints AND packed floats are encoded vars; the host token is a
    // dictionary var
    assert(e.encodedVars.length == 3)
    assert(e.encodedVars.take(2) == Seq(123L, 2L))
    assert(e.dictionaryVars == Seq("host-9.example.com"))
    assert(e.logtype ==
      s"Started task ${ClpLog.IntPlaceholder} on ${ClpLog.DictPlaceholder} " +
        s"(attempt ${ClpLog.IntPlaceholder}, latency=${ClpLog.FloatPlaceholder} ms)")
    // pure static text has no vars at all
    val s = ClpLog.encodeMessage("connection closed by peer")
    assert(s.dictionaryVars.isEmpty && s.encodedVars.isEmpty &&
      s.logtype == "connection closed by peer")
    // packed floats are byte-exact incl. leading/trailing zeros and sign
    for (f <- Seq("4.5", "0.5", "-0.5", "007.25", "123.450", "0.0",
        "99999999999999.0", "3.14159")) {
      val one = ClpLog.encodeMessage(s"v $f")
      assert(one.encodedVars.length == 1 && one.dictionaryVars.isEmpty,
        s"$f should pack")
      assert(ClpLog.decodeMessage(one.logtype, Nil, one.encodedVars) ==
        s"v $f", s"$f pack round-trip")
    }
    // >15 digits or exponent forms fall back to the dictionary
    for (f <- Seq("12345678901234.567", "1e-9", "1.5e3")) {
      val one = ClpLog.encodeMessage(s"v $f")
      assert(one.dictionaryVars == Seq(f), s"$f should stay dictionary")
    }
  }

  test("round-trip is byte-exact on adversarial messages") {
    val msgs = Seq(
      "",
      "plain static text only",
      "ids: 00123 and -0 keep their leading zeros",
      "uuid 550e8400-e29b-41d4-a716-446655440000 ip 10.0.42.1:8080",
      "huge 99999999999999999999999999 overflows to dictionary",
      s"literal placeholder ${ClpLog.DictPlaceholder} and " +
        s"${ClpLog.IntPlaceholder} and back\\slash survive",
      "float 3.14159 neg -2.5 exp 1e-9 ver v2.1.3",
      "punct (a=1) [b:2] {c,3} \"d4\" 'e5' <f6>",
      "unicode: żółć 数值 42 done",
      "tab\tand\nnewline 7")
    for (m <- msgs) {
      val e = ClpLog.encodeMessage(m)
      assert(ClpLog.decodeMessage(e.logtype, e.dictionaryVars,
        e.encodedVars) == m, s"round-trip broke on: $m")
    }
    // seeded fuzz: random delimiter/digit soup round-trips
    val rnd = new scala.util.Random(42)
    val alphabet = "ab1 .-:=()[]\\9\t"
    for (_ <- 1 to 500) {
      val m = Seq.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val e = ClpLog.encodeMessage(m)
      assert(ClpLog.decodeMessage(e.logtype, e.dictionaryVars,
        e.encodedVars) == m, s"fuzz round-trip broke on: ${m.toList}")
    }
  }

  test("read: JSONL archive → encoded columns → parquet, field-exact") {
    val dir = java.nio.file.Files.createTempDirectory("clplog").toString
    val raw = Seq(
      """{"ts":1,"level":"INFO","message":"Started task 123 on node-4"}""",
      """{"ts":2,"level":"WARN","message":"Started task 456 on node-7"}""",
      """{"ts":3,"level":"INFO","message":"GC pause 31.5 ms"}""",
      """{"ts":4,"level":"ERROR","message":"OOM on node-7: used 8123 MB"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/log.jsonl"),
      raw.mkString("\n").getBytes("UTF-8"))

    val df = ClpLog.read(spark, s"$dir/log.jsonl", Seq("message"))
    assert(df.schema.fieldNames.toSet ==
      Set("ts", "level", "message_logtype", "message_dictionaryVars",
        "message_encodedVars"))

    // the archive survives a parquet round-trip and decodes field-exact
    df.write.parquet(s"$dir/encoded")
    val back = ClpLog.decodeField(spark.read.parquet(s"$dir/encoded"),
      "message")
    val got = back.select("ts", "message").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(
      1L -> "Started task 123 on node-4",
      2L -> "Started task 456 on node-7",
      3L -> "GC pause 31.5 ms",
      4L -> "OOM on node-7: used 8123 MB"))

    // the point of logtypes: same template collapses to one group
    val byType = spark.read.parquet(s"$dir/encoded")
      .groupBy("message_logtype").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.values.toSeq.sorted == Seq(1L, 1L, 2L))
    val template = s"Started task ${ClpLog.IntPlaceholder} on " +
      s"${ClpLog.DictPlaceholder}"
    assert(byType(template) == 2L)
  }
}
