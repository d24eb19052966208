package graft

import graft.operators.Chats
import org.apache.spark.sql.functions._

class ChatsSpec extends SparkSpec {

  private def chats(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "chat")
  }

  test("turns: interchange chat JSON parses to ordered turns; malformed " +
      "documents drop instead of poisoning the corpus") {
    val good =
      """{"messages":[{"role":"system","content":"be brief"},
        |{"role":"user","content":"hi"},
        |{"role":"assistant","content":"hello"}]}""".stripMargin
    val df = chats(Seq(1L -> good, 2L -> "{not json", 3L -> "{}"))
    val got = Chats.turns(df, "chat", "id")
      .orderBy(col("id"), col("turn_idx")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, "system", "be brief"),
      (1L, 1L, "user", "hi"),
      (1L, 2L, "assistant", "hello")))
  }

  test("turnSpans + packWithMask: spans re-slice the packed text exactly, " +
      "mask covers the loss roles only, unicode lengths are characters") {
    val s = spark
    import s.implicits._
    val turns = Seq(
      (1L, 0L, "user", "héllo ✓"), // non-ascii: char offsets, not bytes
      (1L, 1L, "assistant", "ok"),
      (1L, 2L, "user", ""),
      (2L, 0L, "assistant", "solo")).toDF("id", "turn_idx", "role",
      "content")
    val spans = Chats.turnSpans(turns, "id")
    val packed = Chats.packWithMask(turns, "id")
    val joined = spans.join(packed, "id")
      .withColumn("seg", col("text").substr(
        (col("start") + 1).cast("int"),
        (col("end") - col("start")).cast("int")))
      .orderBy(col("id"), col("turn_idx")).collect()
    val segs = joined.map(r => r.getAs[String]("seg")).toSeq
    assert(segs == Seq("<|user|>héllo ✓\n", "<|assistant|>ok\n",
      "<|user|>\n", "<|assistant|>solo\n"))
    val masks = joined.map(r => r.getAs[Boolean]("mask")).toSeq
    assert(masks == Seq(false, true, false, true))
    // spans tile the text: each start = previous end, last end = length
    val byId = joined.groupBy(_.getAs[Long]("id"))
    byId.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("turn_idx"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("end") == b.getAs[Long]("start"))
        case _ => ()
      }
      assert(sorted.last.getAs[Long]("end") ==
        sorted.head.getAs[String]("text").length.toLong)
    }
    // custom loss roles: train on user turns instead
    val userMask = Chats.turnSpans(turns, "id", lossRoles = Seq("user"))
      .orderBy(col("id"), col("turn_idx")).collect()
      .map(_.getAs[Boolean]("mask")).toSeq
    assert(userMask == Seq(true, false, true, false))
  }
}
