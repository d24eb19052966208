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

  test("tokenSpans: offsets tile the packed text's BPE stream exactly " +
      "(per-turn encodes concatenate to the full-text encode), mask " +
      "mirrors the char-span mask per turn") {
    val s = spark
    import s.implicits._
    val turns = Seq(
      (1L, 0L, "system", "aa ab"),
      (1L, 1L, "user", "abab b2! cc"),
      (1L, 2L, "assistant", "ab aa"),
      (2L, 0L, "user", ""),
      (2L, 1L, "assistant", "zz")).toDF("id", "turn_idx", "role",
      "content")
    val merges = Seq(("a", "a"), ("a", "b"))
    val ts = Chats.tokenSpans(turns, "id", merges)
      .orderBy(col("id"), col("turn_idx")).collect()
    // hand-checked: role-glued tokens pass through whole (1 subword),
    // 'ab' merges to 1, 'cc' stays 2, 'b2!' passes whole
    assert(ts.map(_.getAs[Long]("n_tok")).toSeq == Seq(2L, 4L, 2L, 1L, 1L))
    assert(ts.map(_.getAs[Long]("token_start")).toSeq ==
      Seq(0L, 2L, 6L, 0L, 1L))
    assert(ts.map(_.getAs[Long]("token_end")).toSeq ==
      Seq(2L, 6L, 8L, 1L, 2L))
    assert(ts.map(_.getAs[Boolean]("mask")).toSeq ==
      Seq(false, false, true, false, true))
    // THE invariant: encoding the packed text in one shot equals the
    // per-turn encodes concatenated in turn order — token offsets
    // derived per turn are therefore offsets into the real stream
    val packed = Chats.packWithMask(turns, "id")
    val full = graft.operators.Vocab.bpeEncode(packed, "text", merges)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getSeq[String](r.fieldIndex("subwords"))).toMap
    val perTurn = graft.operators.Vocab.bpeEncode(
        turns.withColumn("rt", concat(lit("<|"), col("role"), lit("|>"),
          col("content"), lit("\n"))), "rt", merges, outCol = "sub")
      .orderBy(col("id"), col("turn_idx")).collect()
      .map(r => r.getAs[Long]("id") ->
        r.getSeq[String](r.fieldIndex("sub")))
    perTurn.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.flatMap(_._2).toSeq == full(id).toSeq,
        s"per-turn concat != full-text encode for id $id")
    }
    // mask parity with the char-span contract, turn by turn
    val charMask = Chats.turnSpans(turns, "id")
      .orderBy(col("id"), col("turn_idx")).collect()
      .map(_.getAs[Boolean]("mask")).toSeq
    assert(ts.map(_.getAs[Boolean]("mask")).toSeq == charMask)
    // and token spans tile: each start = previous end within an id
    ts.groupBy(_.getAs[Long]("id")).foreach { case (_, rows) =>
      rows.sortBy(_.getAs[Long]("turn_idx")).sliding(2).foreach {
        case Array(a, b) => assert(a.getAs[Long]("token_end") ==
          b.getAs[Long]("token_start"))
        case _ => ()
      }
    }
  }

  test("validateTurns: alternation, leading-system-only, known roles, " +
      "assistant-final — each violation class flags alone") {
    val s = spark
    import s.implicits._
    def conv(id: Long, roles: String*) =
      roles.zipWithIndex.map { case (r, i) => (id, i.toLong, r, "x") }
    val turns = (
      conv(1L, "system", "user", "assistant") ++ // valid
      conv(2L, "user", "assistant") ++ // valid, no system
      conv(3L, "system", "user", "assistant", "user") ++ // ends on user
      conv(4L, "system", "assistant") ++ // assistant can't open
      conv(5L, "user", "user", "assistant") ++ // doubled speaker
      conv(6L, "user", "assistant", "system") ++ // system not leading
      conv(7L, "user", "tool", "assistant") // unknown role
      ).toDF("id", "turn_idx", "role", "content")
    val got = Chats.validateTurns(turns, "id")
      .orderBy(col("id")).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("valid")).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false,
      5L -> false, 6L -> false, 7L -> false))
  }

  test("preferencePairs: shared prompt template matches packWithMask, " +
      "response_start is the loss boundary, malformed prompts drop") {
    val s = spark
    import s.implicits._
    val prompt =
      """{"messages":[{"role":"system","content":"be brief"},
        |{"role":"user","content":"hi"}]}""".stripMargin
    val df = Seq(
      (1L, prompt, "hello", "HELLO THERE"),
      (2L, "{broken", "x", "y")).toDF("id", "prompt", "good", "bad")
    val got = Chats.preferencePairs(df, "id", "prompt", "good", "bad")
      .collect()
    assert(got.length == 1) // malformed prompt dropped
    val r = got(0)
    val p = r.getAs[String]("prompt_text")
    assert(p == "<|system|>be brief\n<|user|>hi\n")
    assert(r.getAs[String]("chosen_text") == p + "<|assistant|>hello\n")
    assert(r.getAs[String]("rejected_text") ==
      p + "<|assistant|>HELLO THERE\n")
    // the loss boundary: both completions start exactly at prompt end
    assert(r.getAs[Long]("response_start") == p.length.toLong)
    // template parity with the SFT path: packWithMask over the same
    // prompt turns renders the identical prefix
    val packed = Chats.packWithMask(
      Chats.turns(df.filter(col("id") === 1L), "prompt", "id"), "id")
      .collect()(0).getAs[String]("text")
    assert(packed == p)
  }

  test("fitBudget: system always kept, longest tail fits, offsets " +
      "re-base over survivors, tiny budgets keep system only") {
    val s = spark
    import s.implicits._
    // rendered lengths: system 11, then 9/14/9/14 (roles u/a/u/a)
    val turns = Seq(
      (1L, 0L, "system", "be"), (1L, 1L, "user", "a"),
      (1L, 2L, "assistant", "b"), (1L, 3L, "user", "c"),
      (1L, 4L, "assistant", "d")).toDF("id", "turn_idx", "role",
      "content")
    val spans = Chats.turnSpans(turns, "id")
    def fit(budget: Long) = Chats.fitBudget(spans, "id", budget)
      .orderBy(col("turn_idx")).collect()
      .map(r => (r.getLong(1), r.getAs[Boolean]("kept"),
        Option(r.get(r.fieldIndex("new_start"))).map(_.toString.toLong)))
    // rendered: sys=13 '<|system|>be\n', u 10, a 15, u 10, a 15
    // budget 40: tail sums (excl sys) from each turn: 50,40,25,15 →
    // turns 2..4 fit (25+? wait 40 from turn1: 10+15+10+15=50; turn2:
    // 40; 40+13>40 → turn2 out; turn3: 25+13=38 ≤ 40 → kept)
    val g40 = fit(40)
    assert(g40.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, true), (1L, false), (2L, false), (3L, true), (4L, true)))
    // re-based offsets: sys 0-13, turn3 13-23, turn4 23-38
    assert(g40.collect { case (_, true, Some(st)) => st }.toSeq ==
      Seq(0L, 13L, 23L))
    // budget below any turn: only the system turn survives
    val g5 = fit(5)
    assert(g5.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, true), (1L, false), (2L, false), (3L, false), (4L, false)))
    // budget covering everything keeps everything with original shape
    val gBig = fit(1000)
    assert(gBig.forall(_._2))
  }

  test("bestOfN: keeps the top-scored candidate per pool, margin is " +
      "best minus runner-up, ties break on candidate string, " +
      "singleton pools report null margin") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "alpha", 3L), (1L, "beta", 7L), (1L, "gamma", 5L),
      (2L, "zzz", 4L), (2L, "aaa", 4L), // score tie → string asc wins
      (3L, "solo", 9L)).toDF("pid", "cand", "score")
    val got = Chats.bestOfN(df, "pid", "cand", "score")
      .orderBy(col("pid")).collect()
    assert(got.map(r => (r.getLong(0), r.getAs[String]("best"),
      r.getAs[Long]("best_score"), r.getAs[Long]("n_candidates"))).toSeq ==
      Seq((1L, "beta", 7L, 3L), (2L, "aaa", 4L, 2L), (3L, "solo", 9L, 1L)))
    // margins: 7-5=2; tie pool 4-4=0; singleton null (no evidence)
    assert(Option(got(0).get(got(0).fieldIndex("margin"))) ==
      Some(2L))
    assert(Option(got(1).get(got(1).fieldIndex("margin"))) ==
      Some(0L))
    assert(got(2).isNullAt(got(2).fieldIndex("margin")))
  }

  test("dedupeByPrompt: one survivor per prompt key — highest score, " +
      "id-as-string tiebreak — and non-key columns ride along") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "p1", 5L, "a"), (2L, "p1", 9L, "b"), (3L, "p1", 9L, "c"),
      (10L, "p2", 1L, "d"),
      (9L, "p3", 2L, "e"), (11L, "p3", 2L, "f") // "11" < "9" as string
    ).toDF("id", "prompt", "score", "extra")
    val got = Chats.dedupeByPrompt(df, "id", "prompt", "score")
      .orderBy(col("prompt")).collect()
      .map(r => (r.getAs[String]("prompt"), r.getLong(0),
        r.getAs[String]("extra")))
    assert(got.toSeq == Seq(("p1", 2L, "b"), ("p2", 10L, "d"),
      ("p3", 11L, "f")))
  }

  test("groupAdvantage: population-std normalization per pool, " +
      "zero-variance and singleton pools get advantage 0.0, " +
      "payload columns ride along") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 10L, 1L, "a"), (1L, 11L, 2L, "b"), (1L, 12L, 3L, "c"),
      (2L, 20L, 7L, "d"), (2L, 21L, 7L, "e"), // zero variance
      (3L, 30L, 4L, "f") // singleton
    ).toDF("pid", "sid", "score", "extra")
    val got = Chats.groupAdvantage(df, "pid", "score")
      .orderBy(col("sid")).collect()
    def row(i: Int) = (got(i).getAs[Long]("n_samples"),
      got(i).getAs[Double]("group_mean"),
      got(i).getAs[Double]("group_std"),
      got(i).getAs[Double]("advantage"),
      got(i).getAs[String]("extra"))
    // pool 1: mean 2, var_pop 2/3, std .81650, adv ±1.22474 / 0
    val (n0, m0, sd0, a0, e0) = row(0)
    assert(n0 == 3L && m0 == 2.0 && e0 == "a")
    assert(math.abs(sd0 - 0.816496580927726) < 1e-12)
    assert(math.abs(a0 - (-1.224744871391589)) < 1e-12)
    assert(math.abs(row(1)._4) < 1e-12)
    assert(math.abs(row(2)._4 - 1.224744871391589) < 1e-12)
    // zero-variance pool: std 0, advantage exactly 0.0 (no eps hack)
    assert(row(3) == ((2L, 7.0, 0.0, 0.0, "d")))
    assert(row(4)._4 == 0.0)
    // singleton: n=1, mean=score, std 0, advantage 0.0
    assert(row(5) == ((1L, 4.0, 0.0, 0.0, "f")))
  }

  test("pairsFromPools: best vs runner-up with score-gap margin, " +
      "singleton pools drop, ties break on candidate string") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("p1", "b", 5L), ("p1", "a", 9L), ("p1", "c", 7L),
      ("p2", "solo", 4L),
      ("p3", "y", 3L), ("p3", "x", 3L) // tie: x before y
    ).toDF("pid", "cand", "score")
    val got = Chats.pairsFromPools(df, "pid", "cand", "score")
      .orderBy(col("pid")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("p1", "a", "c", 2L, 3L),
      ("p3", "x", "y", 0L, 2L)))
  }

  test("dpoAudit: identical pairs count, exact correlation moments, " +
      "structural zero-variance -> null corr, prompt/pool skew") {
    val s = spark
    import s.implicits._
    // x = len(chosen) - len(rejected); margin y. Constructed on the
    // line y = x + 1: (1, 2), (-1, 0), (2, 3) → perfect corr 1.0
    val pairs = Seq(
      ("q1", "aa", "a", 2.0, 3L),
      ("q1", "b", "bb", 0.0, 2L),
      ("q2", "ccc", "c", 3.0, 5L)).toDF("prompt", "chosen",
      "rejected", "margin", "n_candidates")
    val got = Chats.dpoAudit(pairs, "prompt", "chosen", "rejected",
      "margin").collect()(0)
    assert(got.getAs[Long]("n_pairs") == 3L)
    assert(got.getAs[Long]("n_identical") == 0L)
    assert(got.getAs[Long]("n_prompts") == 2L)
    assert(got.getAs[Long]("max_pairs_per_prompt") == 2L)
    assert(got.getAs[Long]("max_pool") == 5L)
    assert(got.getAs[Long]("sx") == 2L)
    assert(got.getAs[Long]("sy_u") == 5000000L)
    assert(got.getAs[Long]("sxx") == 6L)
    assert(got.getAs[Long]("syy_u") == 13000000000000L)
    assert(got.getAs[Long]("sxy_u") == 8000000L)
    assert(got.getAs[Double]("len_margin_corr") == 1.0)
    // identical pair counts; constant margin → structurally null corr
    val flat = Seq(
      ("q1", "same", "same", 1.5, 2L),
      ("q2", "ab", "xyz", 1.5, 2L)).toDF("prompt", "chosen",
      "rejected", "margin", "n_candidates")
    val g2 = Chats.dpoAudit(flat, "prompt", "chosen", "rejected",
      "margin").collect()(0)
    assert(g2.getAs[Long]("n_identical") == 1L)
    assert(g2.isNullAt(g2.fieldIndex("len_margin_corr")))
  }

  // ---- tool-call / agentic traces (r17) ----

  private def toolChat(msgs: String): String =
    s"""{"messages":[$msgs]}"""
  private def m(role: String, content: String,
                extra: String = ""): String =
    s"""{"role":"$role","content":"$content"$extra}"""
  private def call(id: String, name: String, args: String): String =
    s"""{"id":"$id","name":"$name","arguments":"$args"}"""

  test("toolTurns: tool_calls and tool_call_id parse; plain chats " +
      "read with null tool fields; malformed json drops") {
    val good = toolChat(Seq(
      m("user", "weather in oslo"),
      m("assistant", "",
        s""","tool_calls":[${call("c1", "get_weather",
          """{\"city\":\"oslo\"}""")}]"""),
      m("tool", "4C rain", ""","tool_call_id":"c1""""),
      m("assistant", "cold and wet")).mkString(","))
    val plain = toolChat(m("user", "hi") + "," + m("assistant", "yo"))
    val df = chats(Seq(1L -> good, 2L -> plain, 3L -> "{nope"))
    val got = Chats.toolTurns(df, "chat", "id")
      .orderBy(col("id"), col("turn_idx")).collect()
    assert(got.length == 6)
    val asst = got(1)
    val calls = asst.getSeq[org.apache.spark.sql.Row](
      asst.fieldIndex("tool_calls"))
    assert(calls.length == 1 &&
      calls.head.getString(0) == "c1" &&
      calls.head.getString(1) == "get_weather" &&
      calls.head.getString(2) == """{"city":"oslo"}""")
    assert(got(2).getString(got(2).fieldIndex("tool_call_id")) == "c1")
    // plain chat: tool fields null
    assert(got(4).isNullAt(got(4).fieldIndex("tool_calls")) &&
      got(4).isNullAt(got(4).fieldIndex("tool_call_id")))
  }

  test("validateToolTurns: the protocol gate — every violation class " +
      "flags, order-free answers and plain chats pass") {
    val argsOk = """{\"q\":\"x\"}"""
    val cases: Seq[(Long, String, Boolean)] = Seq(
      // plain valid chat (no tools)
      (1L, toolChat(Seq(m("system", "s"), m("user", "u"),
        m("assistant", "a")).mkString(",")), true),
      // two calls answered in REVERSE order — order-free matching
      (2L, toolChat(Seq(m("user", "u"),
        m("assistant", "a", s""","tool_calls":[${call("c1", "f", argsOk)},
          |${call("c2", "g", argsOk)}]""".stripMargin.replace("\n", "")),
        m("tool", "r2", ""","tool_call_id":"c2""""),
        m("tool", "r1", ""","tool_call_id":"c1""""),
        m("assistant", "done")).mkString(",")), true),
      // wrong answer id
      (3L, toolChat(Seq(m("user", "u"),
        m("assistant", "a",
          s""","tool_calls":[${call("c1", "f", argsOk)}]"""),
        m("tool", "r", ""","tool_call_id":"cX""""),
        m("assistant", "done")).mkString(",")), false),
      // unanswered call (assistant speaks again directly)
      (4L, toolChat(Seq(m("user", "u"),
        m("assistant", "a",
          s""","tool_calls":[${call("c1", "f", argsOk)}]"""),
        m("assistant", "done")).mkString(",")), false),
      // arguments do not parse as JSON
      (5L, toolChat(Seq(m("user", "u"),
        m("assistant", "a",
          s""","tool_calls":[${call("c1", "f", "{oops")}]"""),
        m("tool", "r", ""","tool_call_id":"c1""""),
        m("assistant", "done")).mkString(",")), false),
      // duplicate declared call ids
      (6L, toolChat(Seq(m("user", "u"),
        m("assistant", "a", s""","tool_calls":[${call("c1", "f", argsOk)},
          |${call("c1", "g", argsOk)}]""".stripMargin.replace("\n", "")),
        m("tool", "r1", ""","tool_call_id":"c1""""),
        m("tool", "r2", ""","tool_call_id":"c1""""),
        m("assistant", "done")).mkString(",")), false),
      // duplicate ANSWER for a single declared call
      (7L, toolChat(Seq(m("user", "u"),
        m("assistant", "a",
          s""","tool_calls":[${call("c1", "f", argsOk)}]"""),
        m("tool", "r1", ""","tool_call_id":"c1""""),
        m("tool", "r2", ""","tool_call_id":"c1""""),
        m("assistant", "done")).mkString(",")), false),
      // tool turn with no tool_call_id
      (8L, toolChat(Seq(m("user", "u"),
        m("assistant", "a",
          s""","tool_calls":[${call("c1", "f", argsOk)}]"""),
        m("tool", "r"),
        m("assistant", "done")).mkString(",")), false),
      // tool_calls on a USER turn
      (9L, toolChat(Seq(
        m("user", "u", s""","tool_calls":[${call("c1", "f", argsOk)}]"""),
        m("assistant", "a")).mkString(",")), false),
      // tool turn before any assistant spoke
      (10L, toolChat(Seq(m("user", "u"),
        m("tool", "r", ""","tool_call_id":"c1""""),
        m("assistant", "a")).mkString(",")), false),
      // trailing assistant still has PENDING calls
      (11L, toolChat(Seq(m("user", "u"),
        m("assistant", "a",
          s""","tool_calls":[${call("c1", "f", argsOk)}]"""))
        .mkString(",")), false),
      // tool_call_id on an assistant turn
      (12L, toolChat(Seq(m("user", "u"),
        m("assistant", "a", ""","tool_call_id":"c1""""))
        .mkString(",")), false))
    val got = Chats.validateToolTurns(
        Chats.toolTurns(chats(cases.map(c => c._1 -> c._2)), "chat",
          "id"), "id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    cases.foreach { case (id, _, want) =>
      assert(got(id) == want, s"case $id")
    }
  }

  test("renderToolCalls: calls serialize into the assistant turn " +
      "(loss), results into context-marked tool turns; spans and " +
      "packed text stay exact through the standard pipeline") {
    val s = spark
    import s.implicits._
    val chat = toolChat(Seq(
      m("user", "weather"),
      m("assistant", "checking",
        s""","tool_calls":[${call("c1", "get",
          """{\"q\":\"oslo\"}""")}]"""),
      m("tool", "4C", ""","tool_call_id":"c1""""),
      m("assistant", "cold")).mkString(","))
    val rendered = Chats.renderToolCalls(
      Chats.toolTurns(chats(Seq(1L -> chat)), "chat", "id"), "id")
    val spans = Chats.turnSpans(rendered, "id")
    val packed = Chats.packWithMask(rendered, "id")
    val text = packed.collect()(0).getAs[String]("text")
    assert(text ==
      "<|user|>weather\n" +
        "<|assistant|>checking<|call:get|>{\"q\":\"oslo\"}\n" +
        "<|tool|>[c1] 4C\n" +
        "<|assistant|>cold\n")
    val rows = spans.orderBy(col("turn_idx")).collect()
    rows.foreach { r =>
      val seg = text.substring(r.getAs[Long]("start").toInt,
        r.getAs[Long]("end").toInt)
      assert(seg.endsWith("\n"))
    }
    // mask: assistant turns (including the call) are loss; tool is not
    assert(rows.map(_.getAs[Boolean]("mask")).toSeq ==
      Seq(false, true, false, true))
    // token spans flow through unchanged: with zero merges BPE
    // segments vocabulary words ([a-z0-9]+) into characters and
    // counts every other whitespace token as 1, so the conversation's
    // token_end must equal that sum over the packed text — the
    // no-token-crosses-a-turn-boundary invariant end to end
    val toks = Chats.tokenSpans(rendered, "id", merges = Seq.empty)
    val n = toks.agg(max(col("token_end"))).collect()(0).getLong(0)
    val want = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .map(w => if (w.matches("^[a-z0-9]+$")) w.length.toLong else 1L)
      .sum
    assert(n == want)
    // and the spans partition [0, n): each turn starts where the
    // previous ended
    val ts = toks.orderBy(col("turn_idx")).collect()
      .map(r => (r.getAs[Long]("token_start"), r.getAs[Long]("token_end")))
    assert(ts.head._1 == 0L && ts.last._2 == n)
    ts.sliding(2).foreach { case Array(a, b) => assert(a._2 == b._1) }
  }

  test("toolArgsAudit: required keys present / missing on a valid " +
      "object / unparseable args / unknown tool — each verdict class") {
    val chat = toolChat(Seq(
      m("user", "u"),
      m("assistant", "a", s""","tool_calls":[
        |${call("c1", "search", """{\"q\":\"x\",\"extra\":\"y\"}""")},
        |${call("c2", "search", """{\"lang\":\"en\"}""")},
        |${call("c3", "search", "{oops")},
        |${call("c4", "rogue", """{\"a\":\"b\"}""")}]"""
        .stripMargin.replace("\n", "")),
      m("tool", "r1", ""","tool_call_id":"c1""""),
      m("tool", "r2", ""","tool_call_id":"c2""""),
      m("tool", "r3", ""","tool_call_id":"c3""""),
      m("tool", "r4", ""","tool_call_id":"c4""""),
      m("assistant", "done")).mkString(","))
    val got = Chats.toolArgsAudit(
        Chats.toolTurns(chats(Seq(1L -> chat)), "chat", "id"), "id",
        Map("search" -> Seq("q")))
      .orderBy(col("call_id")).collect()
      .map(r => (r.getAs[String]("call_id"),
        r.getSeq[String](r.fieldIndex("missing")).toSeq,
        r.getAs[Boolean]("args_ok")))
    assert(got.toSeq == Seq(
      ("c1", Seq(), true), // extra keys allowed
      ("c2", Seq("q"), false), // valid object, required key absent
      ("c3", Seq("q"), false), // unparseable arguments
      ("c4", Seq("__unknown_tool"), false))) // undeclared tool
  }

  test("fitBudgetTools: blocks trim atomically — a budget that would " +
      "cut mid-block drops the whole block; system always keeps; " +
      "offsets re-base over survivors") {
    val argsOk = """{\"q\":\"x\"}"""
    // rendered lengths: sys 13, user 11, asst+call 36, tool 14,
    // asst final 18 (verified below via spans)
    val chat = toolChat(Seq(
      m("system", "be"), m("user", "hi"),
      m("assistant", "a",
        s""","tool_calls":[${call("c1", "f", argsOk)}]"""),
      m("tool", "r", ""","tool_call_id":"c1""""),
      m("assistant", "done!")).mkString(","))
    val t = Chats.toolTurns(chats(Seq(1L -> chat)), "chat", "id")
    val lens = Chats.turnSpans(Chats.renderToolCalls(t, "id"), "id")
      .orderBy(col("turn_idx")).collect()
      .map(r => r.getAs[Long]("end") - r.getAs[Long]("start"))
    def kept(budget: Long): Seq[Boolean] =
      Chats.fitBudgetTools(t, "id", budget)
        .orderBy(col("turn_idx")).collect()
        .map(_.getAs[Boolean]("kept")).toSeq
    val Seq(ls, lu, la, lt, lf) = lens.toSeq
    // the budget covers system + tail, as in fitBudget
    assert(kept(ls + lu + la + lt + lf) ==
      Seq(true, true, true, true, true))
    // budget fits final + TOOL RESULT but not its calling assistant:
    // the whole block must drop — keeping the result alone would
    // break the protocol (this is where plain fitBudget would cut)
    assert(kept(ls + lt + lf) == Seq(true, false, false, false, true))
    assert(kept(ls + la + lt + lf) ==
      Seq(true, false, true, true, true))
    // tiny budget: system only, nothing else fits
    assert(kept(ls + lf - 1) == Seq(true, false, false, false, false))
    // offsets re-base contiguously over survivors
    val got = Chats.fitBudgetTools(t, "id", ls + la + lt + lf)
      .filter(col("kept")).orderBy(col("turn_idx")).collect()
      .map(r => (r.getAs[Long]("new_start"), r.getAs[Long]("new_end")))
    assert(got.head._1 == 0L)
    got.sliding(2).foreach { case Array(a, b) => assert(a._2 == b._1)
      case _ => () }
  }

  test("toolTurns: the genuine OpenAI nested function struct parses — " +
      "name/arguments coalesce from function.{name,arguments}; a " +
      "nested trace validates exactly like its flat twin (ADVICE r17)") {
    def nestedCall(id: String, name: String, args: String): String =
      s"""{"id":"$id","type":"function","function":""" +
        s"""{"name":"$name","arguments":"$args"}}"""
    val argsOk = """{\"city\":\"oslo\"}"""
    def trace(callJson: String) = toolChat(Seq(
      m("user", "weather"),
      m("assistant", "a", s""","tool_calls":[$callJson]"""),
      m("tool", "4C", ""","tool_call_id":"c1""""),
      m("assistant", "done")).mkString(","))
    val nested = trace(nestedCall("c1", "get_weather", argsOk))
    val flat = trace(call("c1", "get_weather", argsOk))
    val t = Chats.toolTurns(
      chats(Seq(1L -> nested, 2L -> flat)), "chat", "id")
    val asst = t.filter(col("turn_idx") === 1)
      .orderBy(col("id")).collect()
    asst.foreach { r =>
      val calls = r.getSeq[org.apache.spark.sql.Row](
        r.fieldIndex("tool_calls"))
      assert(calls.length == 1 &&
        calls.head.getString(0) == "c1" &&
        calls.head.getString(1) == "get_weather" &&
        calls.head.getString(2) == """{"city":"oslo"}""")
    }
    // both forms are protocol-valid and render identically
    val v = Chats.validateToolTurns(t, "id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(v == Map(1L -> true, 2L -> true))
    val texts = Chats.packWithMask(Chats.renderToolCalls(t, "id"), "id")
      .orderBy(col("id")).collect().map(_.getAs[String]("text"))
    assert(texts(0) == texts(1) &&
      texts(0).contains("<|call:get_weather|>{\"city\":\"oslo\"}"))
  }

  test("toolTriage: every violation class gets its first-failed rule " +
      "by severity order; valid ⇔ validateToolTurns.valid") {
    val argsOk = """{\"q\":\"x\"}"""
    // the validateToolTurns spec's 12 shapes, each with its expected
    // triage class (None = valid)
    val cases: Seq[(Long, String, Option[String])] = Seq(
      (1L, toolChat(Seq(m("system", "s"), m("user", "u"),
        m("assistant", "a")).mkString(",")), None),
      (2L, toolChat(Seq(m("user", "u"),
        m("assistant", "a", s""","tool_calls":[${call("c1", "f", argsOk)},
          |${call("c2", "g", argsOk)}]""".stripMargin.replace("\n", "")),
        m("tool", "r2", ""","tool_call_id":"c2""""),
        m("tool", "r1", ""","tool_call_id":"c1""""),
        m("assistant", "done")).mkString(",")), None),
      // wrong answer id: the stray answer outranks the unanswered call
      (3L, toolChat(Seq(m("user", "u"),
        m("assistant", "a",
          s""","tool_calls":[${call("c1", "f", argsOk)}]"""),
        m("tool", "r", ""","tool_call_id":"cX""""),
        m("assistant", "done")).mkString(",")),
        Some("stray_answer")),
      // unanswered call (also a transition break — order decides)
      (4L, toolChat(Seq(m("user", "u"),
        m("assistant", "a",
          s""","tool_calls":[${call("c1", "f", argsOk)}]"""),
        m("assistant", "done")).mkString(",")), Some("unanswered")),
      (5L, toolChat(Seq(m("user", "u"),
        m("assistant", "a",
          s""","tool_calls":[${call("c1", "f", "{oops")}]"""),
        m("tool", "r", ""","tool_call_id":"c1""""),
        m("assistant", "done")).mkString(",")), Some("args_parse")),
      (6L, toolChat(Seq(m("user", "u"),
        m("assistant", "a", s""","tool_calls":[${call("c1", "f", argsOk)},
          |${call("c1", "g", argsOk)}]""".stripMargin.replace("\n", "")),
        m("tool", "r1", ""","tool_call_id":"c1""""),
        m("tool", "r2", ""","tool_call_id":"c1""""),
        m("assistant", "done")).mkString(",")), Some("dup_call_id")),
      (7L, toolChat(Seq(m("user", "u"),
        m("assistant", "a",
          s""","tool_calls":[${call("c1", "f", argsOk)}]"""),
        m("tool", "r1", ""","tool_call_id":"c1""""),
        m("tool", "r2", ""","tool_call_id":"c1""""),
        m("assistant", "done")).mkString(",")), Some("dup_call_id")),
      (8L, toolChat(Seq(m("user", "u"),
        m("assistant", "a",
          s""","tool_calls":[${call("c1", "f", argsOk)}]"""),
        m("tool", "r"),
        m("assistant", "done")).mkString(",")), Some("role")),
      (9L, toolChat(Seq(
        m("user", "u", s""","tool_calls":[${call("c1", "f", argsOk)}]"""),
        m("assistant", "a")).mkString(",")), Some("role")),
      // a tool answer before any assistant spoke IS a stray answer
      (10L, toolChat(Seq(m("user", "u"),
        m("tool", "r", ""","tool_call_id":"c1""""),
        m("assistant", "a")).mkString(",")), Some("stray_answer")),
      // pending trailing calls report as the unanswered call
      (11L, toolChat(Seq(m("user", "u"),
        m("assistant", "a",
          s""","tool_calls":[${call("c1", "f", argsOk)}]"""))
        .mkString(",")), Some("unanswered")),
      (12L, toolChat(Seq(m("user", "u"),
        m("assistant", "a", ""","tool_call_id":"c1""""))
        .mkString(",")), Some("role")),
      // a NULL role (exporter dropped the field) must fail BOTH the
      // validator and triage as 'role' — the raw predicate is SQL
      // NULL there and an aggregate would silently skip it (r18)
      (13L, toolChat(Seq(m("user", "u"),
        """{"content":"norole"}""",
        m("assistant", "a")).mkString(",")), Some("role")))
    val t = Chats.toolTurns(chats(cases.map(c => c._1 -> c._2)),
      "chat", "id")
    val triage = Chats.toolTriage(t, "id").collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.getString(3))))).toMap
    val valid = Chats.validateToolTurns(t, "id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    cases.foreach { case (id, _, want) =>
      assert(triage(id)._2 == want, s"case $id")
      assert(triage(id)._1 == want.isEmpty, s"case $id valid flag")
      assert(triage(id)._1 == valid(id), s"case $id ⇔ validator")
    }
    // pure transition break (two users in a row) and a trace ending
    // on a tool turn (all calls answered): the classes 3–5 can't
    // explain
    val extra: Seq[(Long, String)] = Seq(
      21L -> toolChat(Seq(m("user", "u"), m("user", "u2"),
        m("assistant", "a")).mkString(",")),
      22L -> toolChat(Seq(m("user", "u"),
        m("assistant", "a",
          s""","tool_calls":[${call("c1", "f", argsOk)}]"""),
        m("tool", "r", ""","tool_call_id":"c1"""")).mkString(",")))
    val t2 = Chats.toolTurns(chats(extra), "chat", "id")
    val g2 = Chats.toolTriage(t2, "id").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(g2 == Map(21L -> "transition", 22L -> "pending_final"))
    // the card rolls the same verdicts up
    val card = Chats.toolTriageCard(t, "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card("valid") == 2L && card("role") == 4L &&
      card("dup_call_id") == 2L && card("stray_answer") == 2L &&
      card("unanswered") == 2L && card("args_parse") == 1L)
  }

  test("toolArgTypes: per-key JSON type verdicts — match, wrong type, " +
      "missing, unparseable, unknown tool; number covers int and " +
      "decimal") {
    val mk: Seq[(String, String, String)] = Seq(
      // (call id, tool, raw arguments JSON)
      ("c1", "fetch", """{\"k\":5,\"url\":\"u\"}"""), // conforming
      ("c2", "fetch", """{\"k\":1.5}"""), // decimal ok, url missing
      ("c3", "fetch", """{\"k\":\"5\",\"url\":7}"""), // both flipped
      ("c4", "fetch", "{oops"), // unparseable
      ("c5", "mail", """{\"to\":\"x\"}""")) // out of contract
    val chat = toolChat(Seq(
      m("user", "u"),
      m("assistant", "a", s""","tool_calls":[${mk.map { case (i, t, a) =>
        call(i, t, a) }.mkString(",")}]"""),
      m("assistant", "done")).mkString(","))
    val got = Chats.toolArgTypes(
        Chats.toolTurns(chats(Seq(1L -> chat)), "chat", "id"), "id",
        Map("fetch" -> Seq("k" -> "number", "url" -> "string")))
      .orderBy(col("call_id")).collect()
      .map(r => (r.getAs[String]("call_id"),
        r.getSeq[String](r.fieldIndex("bad")).toSeq,
        r.getAs[Boolean]("types_ok")))
    assert(got.toSeq == Seq(
      ("c1", Seq(), true),
      ("c2", Seq("url:string:missing"), false),
      ("c3", Seq("k:number:string", "url:string:number"), false),
      ("c4", Seq("k:number:unparseable", "url:string:unparseable"),
        false),
      ("c5", Seq("__unknown_tool"), false)))
    // contract validation fails fast
    intercept[IllegalArgumentException] {
      Chats.toolArgTypes(Chats.toolTurns(chats(Seq(1L -> chat)),
        "chat", "id"), "id", Map("fetch" -> Seq("k" -> "integer")))
    }
    intercept[IllegalArgumentException] {
      Chats.toolArgTypes(Chats.toolTurns(chats(Seq(1L -> chat)),
        "chat", "id"), "id", Map("fetch" -> Seq("a.b" -> "number")))
    }
  }

  test("toolContractInfer: presence over object-parsed calls only, " +
      "majority type with deterministic tie-break, required at the " +
      "threshold; feeds toolArgTypes") {
    def asst(calls: String*) = toolChat(Seq(
      m("user", "u"),
      m("assistant", "a", s""","tool_calls":[${calls.mkString(",")}]"""),
      m("assistant", "done")).mkString(","))
    val rows: Seq[(Long, String)] = Seq(
      1L -> asst(call("c1", "fetch", """{\"k\":5,\"url\":\"u\"}""")),
      2L -> asst(call("c2", "fetch", """{\"k\":7,\"url\":\"v\"}""")),
      3L -> asst(call("c3", "fetch", """{\"k\":\"s\"}""")), // k flips
      4L -> asst(call("c4", "fetch", "{oops")), // not an object
      5L -> asst(call("c5", "mail", """{\"to\":\"x\"}""")))
    val got = Chats.toolContractInfer(
        Chats.toolTurns(chats(rows), "chat", "id"), "id",
        minPresence = 0.95)
      .orderBy(col("tool_name"), col("key")).collect()
      .map(r => (r.getAs[String]("tool_name"), r.getAs[String]("key"),
        r.getAs[Long]("n_calls"), r.getAs[Long]("n_objects"),
        r.getAs[Long]("n_with_key"), r.getAs[Double]("presence"),
        r.getAs[String]("major_type"), r.getAs[Double]("type_frac"),
        r.getAs[Boolean]("required")))
    // fetch: 4 calls, 3 parse as objects; k in all 3 (number 2/3),
    // url in 2 of 3 → presence 0.666667 < 0.95
    assert(got.toSeq == Seq(
      ("fetch", "k", 4L, 3L, 3L, 1.0, "number", 0.666667, true),
      ("fetch", "url", 4L, 3L, 2L, 0.666667, "string", 1.0, false),
      ("mail", "to", 1L, 1L, 1L, 1.0, "string", 1.0, true)))
    // a 50/50 type split breaks ties alphabetically (count desc, type
    // asc): number vs string → 'number'
    val tie = Chats.toolContractInfer(Chats.toolTurns(chats(Seq(
        1L -> asst(call("c1", "fetch", """{\"k\":5}""")),
        2L -> asst(call("c2", "fetch", """{\"k\":\"s\"}""")))),
      "chat", "id"), "id")
      .collect()(0)
    assert(tie.getAs[String]("major_type") == "number" &&
      tie.getAs[Double]("type_frac") == 0.5)
    // duplicate keys within ONE object count their call once:
    // presence stays ≤ 1.0 and never over-triggers `required`
    // (ADVICE r18)
    val dup = Chats.toolContractInfer(Chats.toolTurns(chats(Seq(
        1L -> asst(call("c1", "fetch", """{\"a\":1,\"a\":2}""")))),
      "chat", "id"), "id")
      .collect().map(r => (r.getAs[String]("key"),
        r.getAs[Long]("n_with_key"), r.getAs[Double]("presence")))
    assert(dup.toSeq == Seq(("a", 1L, 1.0)))
    // the inferred required rows audit clean through toolArgTypes on
    // the conforming corpus rows
    val inferred = got.filter(_._9).groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._7).toSeq).toMap
    val audited = Chats.toolArgTypes(
        Chats.toolTurns(chats(rows.take(2)), "chat", "id"), "id",
        inferred)
      .collect().map(_.getAs[Boolean]("types_ok"))
    assert(audited.forall(identity))
  }

  test("toolChains: (turn, declaration-position) order with " +
      "__start/__end sentinels — declaration order, not answer order") {
    val argsOk = """{\"q\":\"x\"}"""
    val two = toolChat(Seq(
      m("user", "u"),
      m("assistant", "a", s""","tool_calls":[${call("c1", "search",
        argsOk)},${call("c2", "fetch", argsOk)}]"""),
      // answers arrive REVERSED — chains must still read declaration
      m("tool", "r2", ""","tool_call_id":"c2""""),
      m("tool", "r1", ""","tool_call_id":"c1""""),
      m("assistant", "", s""","tool_calls":[${call("c3", "search",
        argsOk)}]"""),
      m("tool", "r3", ""","tool_call_id":"c3""""),
      m("assistant", "done")).mkString(","))
    val plain = toolChat(m("user", "u") + "," + m("assistant", "a"))
    val got = Chats.toolChains(
        Chats.toolTurns(chats(Seq(1L -> two, 2L -> plain)), "chat",
          "id"), "id")
      .orderBy(col("src"), col("dst")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      ("__start", "search", 1L, 1L),
      ("fetch", "search", 1L, 1L),
      ("search", "__end", 1L, 1L),
      ("search", "fetch", 1L, 1L)))
  }

  test("contractDrift + contractDriftCard: appeared/disappeared/" +
      "type_flip/required_change statuses, presence deltas, and the " +
      "breaking-when-old-required severity") {
    def asst(calls: String*) = toolChat(Seq(
      m("user", "u"),
      m("assistant", "a", s""","tool_calls":[${calls.mkString(",")}]"""),
      m("assistant", "done")).mkString(","))
    // gen A: fetch{k:int, url:str} ×2, search{q:str}
    val genA = Chats.toolContractInfer(Chats.toolTurns(chats(Seq(
      1L -> asst(call("c1", "fetch", """{\"k\":5,\"url\":\"u\"}""")),
      2L -> asst(call("c2", "fetch", """{\"k\":7,\"url\":\"v\"}""")),
      3L -> asst(call("c3", "search", """{\"q\":\"x\"}""")))),
      "chat", "id"), "id")
    // gen B: fetch{k:str} (k flips, url gone), mail{to:str} appears,
    // search gone entirely
    val genB = Chats.toolContractInfer(Chats.toolTurns(chats(Seq(
      1L -> asst(call("c1", "fetch", """{\"k\":\"s\"}""")),
      2L -> asst(call("c2", "mail", """{\"to\":\"x\"}""")))),
      "chat", "id"), "id")
    val drift = Chats.contractDrift(genA, genB)
    val rows = drift.orderBy(col("tool_name"), col("key")).collect()
      .map(r => (r.getAs[String]("tool_name"), r.getAs[String]("key"),
        r.getAs[String]("status"),
        Option(r.getAs[java.lang.Double]("presence_delta"))))
    assert(rows.toSeq == Seq(
      ("fetch", "k", "type_flip", Some(0.0)),
      ("fetch", "url", "disappeared", None),
      ("mail", "to", "appeared", None),
      ("search", "q", "disappeared", None)))
    val card = Chats.contractDriftCard(drift)
      .orderBy(col("tool_name")).collect()
      .map(r => (r.getAs[String]("tool_name"),
        r.getAs[Long]("n_keys_a"), r.getAs[Long]("n_keys_b"),
        r.getAs[Long]("n_disappeared"), r.getAs[Long]("n_type_flips"),
        r.getAs[String]("severity")))
    // fetch: required k flipped AND required url disappeared →
    // breaking; mail: a key appeared → warn; search: required q
    // disappeared → breaking
    assert(card.toSeq == Seq(
      ("fetch", 2L, 1L, 1L, 1L, "breaking"),
      ("mail", 0L, 1L, 0L, 0L, "warn"),
      ("search", 1L, 0L, 1L, 0L, "breaking")))
    // a stable contract reads all-stable, delta 0, severity ok
    val same = Chats.contractDrift(genA, genA)
    assert(same.collect().forall(r =>
      r.getAs[String]("status") == "stable" &&
        r.getAs[Double]("presence_delta") == 0.0))
    assert(Chats.contractDriftCard(same).collect()
      .forall(_.getAs[String]("severity") == "ok"))
  }

  test("contractDrift/Card fuzz: on seeded random snapshot pairs the " +
      "statuses partition the key union, deltas exist exactly on " +
      "overlap, card counts re-derive from the rows, and breaking ⇔ " +
      "an old-required key disappeared or type-flipped") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val types = Seq("string", "number", "boolean", "object", "array")
    def snap(): Seq[(String, String, Double, String, Boolean)] = {
      val pairs = for {
        t <- Seq("t1", "t2", "t3")
        k <- Seq("a", "b", "c", "d", "e")
        if rnd.nextBoolean()
      } yield {
        val presence =
          math.round(rnd.nextInt(10) * 0.1 * 1e6) / 1e6 + 0.1
        (t, k, math.min(presence, 1.0),
          types(rnd.nextInt(types.size)), presence >= 0.95)
      }
      pairs
    }
    for (trial <- 1 to 8) {
      val ra = snap()
      val rb = snap()
      def df(r: Seq[(String, String, Double, String, Boolean)]) =
        r.toDF("tool_name", "key", "presence", "major_type",
          "required")
      val drift = Chats.contractDrift(df(ra), df(rb))
      val rows = drift.collect().map(r =>
        (r.getString(0), r.getString(1)) -> r).toMap
      val ma = ra.map(t => (t._1, t._2) -> t).toMap
      val mb = rb.map(t => (t._1, t._2) -> t).toMap
      assert(rows.keySet == ma.keySet ++ mb.keySet, s"trial $trial")
      rows.foreach { case (k, r) =>
        val status = r.getAs[String]("status")
        val inA = ma.contains(k); val inB = mb.contains(k)
        val wantStatus =
          if (!inA) "appeared"
          else if (!inB) "disappeared"
          else if (ma(k)._4 != mb(k)._4) "type_flip"
          else if (ma(k)._5 != mb(k)._5) "required_change"
          else "stable"
        assert(status == wantStatus, s"trial $trial $k")
        val delta = Option(
          r.getAs[java.lang.Double]("presence_delta"))
        assert(delta.isDefined == (inA && inB), s"trial $trial $k")
        delta.foreach(d => assert(math.abs(d -
          math.round((mb(k)._3 - ma(k)._3) * 1e6) / 1e6) < 1e-9,
          s"trial $trial $k"))
        assert(r.getAs[Boolean]("type_flip") ==
          (inA && inB && ma(k)._4 != mb(k)._4), s"trial $trial $k")
      }
      val card = Chats.contractDriftCard(drift).collect()
      card.foreach { c =>
        val tool = c.getString(0)
        val trows = rows.filter(_._1._1 == tool).values.toSeq
        def cnt(st: String) =
          trows.count(_.getAs[String]("status") == st).toLong
        assert(c.getAs[Long]("n_keys_a") ==
          trows.count(r =>
            Option(r.getAs[java.lang.Double]("presence_a"))
              .isDefined).toLong)
        assert(c.getAs[Long]("n_appeared") == cnt("appeared") &&
          c.getAs[Long]("n_disappeared") == cnt("disappeared") &&
          c.getAs[Long]("n_type_flips") ==
            trows.count(_.getAs[Boolean]("type_flip")).toLong &&
          c.getAs[Long]("n_required_changes") ==
            cnt("required_change"), s"trial $trial $tool")
        val breaking = trows.exists(r =>
          Option(r.getAs[java.lang.Boolean]("required_a"))
            .exists(_.booleanValue) &&
            (r.getAs[String]("status") == "disappeared" ||
              r.getAs[Boolean]("type_flip")))
        val anyChange = trows.exists(r =>
          r.getAs[String]("status") != "stable")
        val wantSev = if (breaking) "breaking"
          else if (anyChange) "warn" else "ok"
        assert(c.getAs[String]("severity") == wantSev,
          s"trial $trial $tool")
      }
    }
  }

  test("chainDrift: transition-count KL between two toolChains " +
      "snapshots — zero on identical traffic, positive and " +
      "union-vocabulary-sized on shifted traffic") {
    val s = spark
    import s.implicits._
    val a = Seq(("__start", "a", 2L, 2L), ("a", "__end", 2L, 2L))
      .toDF("src", "dst", "n", "n_convs")
    val b = Seq(("__start", "a", 1L, 1L), ("a", "b", 1L, 1L),
      ("b", "__end", 1L, 1L)).toDF("src", "dst", "n", "n_convs")
    val sameR = Chats.chainDrift(a, a).collect()(0)
    assert(sameR.getAs[Long]("kl_u") == 0L &&
      sameR.getAs[Double]("kl") == 0.0)
    val r = Chats.chainDrift(a, b).collect()(0)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 3L &&
      r.getAs[Long]("v_union") == 4L && r.getAs[Double]("kl") > 0.0)
    // tokens are length-prefixed, so a tool name CONTAINING the
    // separator never aliases a different transition: ("a→b" → "c")
    // and ("a" → "b→c") stay distinct vocabulary entries
    val wa = Seq(("a→b", "c", 1L, 1L)).toDF("src", "dst", "n",
      "n_convs")
    val wb = Seq(("a", "b→c", 1L, 1L)).toDF("src", "dst", "n",
      "n_convs")
    assert(Chats.chainDrift(wa, wb).collect()(0)
      .getAs[Long]("v_union") == 2L)
  }

  test("toolChains: a call with a NULL normalized name (no flat name, " +
      "no function.name) is excluded from sequencing — no null dst, " +
      "no phantom mid-conversation __start (ADVICE r18)") {
    val argsOk = """{\"q\":\"x\"}"""
    val trace = toolChat(Seq(
      m("user", "u"),
      m("assistant", "a", s""","tool_calls":[${call("c1", "search",
        argsOk)},{"id":"c2","arguments":"$argsOk"},${call("c3",
        "fetch", argsOk)}]"""),
      m("tool", "r1", ""","tool_call_id":"c1""""),
      m("assistant", "done")).mkString(","))
    val got = Chats.toolChains(
        Chats.toolTurns(chats(Seq(1L -> trace)), "chat", "id"), "id")
      .orderBy(col("src"), col("dst")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // the nameless c2 vanishes: search → fetch directly, no null row
    // and no second __start
    assert(got.toSeq == Seq(
      ("__start", "search", 1L),
      ("fetch", "__end", 1L),
      ("search", "fetch", 1L)))
  }

  test("treePaths: branched trees flatten to one root-first path per " +
      "leaf; a 33-deep chain resolves (pointer doubling); dangling " +
      "parents truncate; cycles fail loudly") {
    val s = spark
    import s.implicits._
    // tree: 1(root) -> 2 -> 4(leaf follow-up), 1 -> 3(leaf regen);
    // plus a second root-only tree 9
    val tree = Seq(
      (1L, None: Option[Long], "user", "q"),
      (2L, Some(1L), "assistant", "a1"),
      (3L, Some(1L), "assistant", "a2"),
      (4L, Some(2L), "user", "follow"),
      (9L, None, "user", "solo"))
      .toDF("node_id", "parent_id", "role", "content")
    val got = Chats.treePaths(tree, "node_id", "parent_id")
      .orderBy(col("conv_id"), col("turn_idx")).collect()
      .map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("turn_idx"),
        r.getAs[Long]("node_id"), r.getAs[String]("content")))
    assert(got.toSeq == Seq(
      (3L, 0L, 1L, "q"), (3L, 1L, 3L, "a2"),
      (4L, 0L, 1L, "q"), (4L, 1L, 2L, "a1"), (4L, 2L, 4L, "follow"),
      (9L, 0L, 9L, "solo")))
    // depth 33 chain: needs ~6 doubling rounds, far under maxIter
    val chain = (1L to 33L).map(i =>
        (i, if (i == 1) None else Some(i - 1), "user", s"m$i"))
      .toDF("node_id", "parent_id", "role", "content")
    val deep = Chats.treePaths(chain, "node_id", "parent_id")
      .orderBy(col("turn_idx")).collect()
    assert(deep.length == 33 &&
      deep.forall(_.getAs[Long]("conv_id") == 33L) &&
      deep.map(_.getAs[Long]("node_id")).toSeq == (1L to 33L))
    // dangling parent: the dangler is DROPPED from the path, so the
    // first real node is depth 0 and turn_idx stays contiguous
    // 0-based (ADVICE r18 — no hole at depth 0)
    val dangling = Seq((5L, Some(77L), "user", "orphan"))
      .toDF("node_id", "parent_id", "role", "content")
    val d = Chats.treePaths(dangling, "node_id", "parent_id")
      .collect().map(r => (r.getAs[Long]("conv_id"),
        r.getAs[Long]("turn_idx"), r.getAs[Long]("node_id")))
    assert(d.toSeq == Seq((5L, 0L, 5L)))
    // a dangler above a real CHAIN: path [77?, 5, 6] → [5, 6]
    val danglingChain = Seq(
      (5L, Some(77L), "user", "orphan"), (6L, Some(5L), "assistant",
        "child")).toDF("node_id", "parent_id", "role", "content")
    val dc = Chats.treePaths(danglingChain, "node_id", "parent_id")
      .orderBy(col("turn_idx"))
      .collect().map(r => (r.getAs[Long]("conv_id"),
        r.getAs[Long]("turn_idx"), r.getAs[Long]("node_id")))
    assert(dc.toSeq == Seq((6L, 0L, 5L), (6L, 1L, 6L)))
    // cycle: 6 -> 7 -> 6 — must fail at the DEFAULT maxIter (the
    // log2(n)+1 round bound fires long before paths can double into
    // OOM territory — r18 review fix)
    val cyc = Seq((6L, Some(7L), "user", "x"), (7L, Some(6L), "user",
      "y")).toDF("node_id", "parent_id", "role", "content")
    val e = intercept[IllegalArgumentException] {
      Chats.treePaths(cyc, "node_id", "parent_id")
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("toolTriage ⇔ validateToolTurns on seeded random traces: " +
      "fail_rule is null exactly when the validator passes, across " +
      "valid structures and every injected corruption class") {
    val rnd = new scala.util.Random(42)
    val argsOk = """{\"q\":\"x\"}"""
    def buildTrace(id: Long): String = {
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      if (rnd.nextBoolean()) parts += m("system", "s")
      parts += m("user", s"u$id")
      val nBlocks = rnd.nextInt(3) + 1
      for (b <- 0 until nBlocks) {
        val nCalls = rnd.nextInt(3) // 0..2 calls
        if (nCalls == 0) {
          parts += m("assistant", s"a$b")
          if (b < nBlocks - 1) parts += m("user", s"u$b")
        } else {
          val ids = (0 until nCalls).map(i => s"c${id}_${b}_$i")
          parts += m("assistant", s"a$b",
            s""","tool_calls":[${ids.map(i =>
              call(i, "t", argsOk)).mkString(",")}]""")
          rnd.shuffle(ids).foreach(i =>
            parts += m("tool", s"r$i", s""","tool_call_id":"$i""""))
          if (b == nBlocks - 1) parts += m("assistant", "done")
        }
      }
      // ~half the traces get one random corruption
      if (rnd.nextBoolean()) {
        val k = rnd.nextInt(6)
        k match {
          case 0 => // stray answer
            parts += m("tool", "stray", ""","tool_call_id":"zz"""")
            parts += m("assistant", "fin")
          case 1 => // trailing pending call
            parts += m("assistant", "p",
              s""","tool_calls":[${call("pz", "t", argsOk)}]""")
          case 2 => // two users in a row
            parts += m("user", "x1")
            parts += m("user", "x2")
            parts += m("assistant", "fin")
          case 3 => // tool_calls on a user turn
            parts += m("user", "x",
              s""","tool_calls":[${call("uz", "t", argsOk)}]""")
            parts += m("assistant", "fin")
          case 4 => // unparseable arguments, properly answered
            parts += m("user", "x")
            parts += m("assistant", "b",
              s""","tool_calls":[${call("bz", "t", "{nope")}]""")
            parts += m("tool", "rb", ""","tool_call_id":"bz"""")
            parts += m("assistant", "fin")
          case _ => // ends on a user turn
            parts += m("user", "dangling")
        }
      }
      toolChat(parts.mkString(","))
    }
    val rows = (1L to 80L).map(i => i -> buildTrace(i))
    val t = Chats.toolTurns(chats(rows), "chat", "id")
    val valid = Chats.validateToolTurns(t, "id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val triage = Chats.toolTriage(t, "id").collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.getString(3))))).toMap
    // both valid and invalid classes must actually occur
    assert(valid.values.exists(identity) &&
      valid.values.exists(!_), "degenerate fuzz corpus")
    rows.foreach { case (id, _) =>
      assert(triage(id)._1 == valid(id), s"trace $id disagreement")
      assert(triage(id)._2.isEmpty == valid(id), s"trace $id rule")
    }
  }

  test("groupAdvantage: a constant group with FRACTIONAL scores is " +
      "detected structurally — exact 0.0, not double-cast noise " +
      "(ADVICE r16)") {
    val s = spark
    import s.implicits._
    // every score 0.1: s2/n − mean² through doubles can be ~1e-18 > 0,
    // which a std===0.0 test would miss
    val df = Seq((1L, 0.1), (1L, 0.1), (1L, 0.1),
      (2L, 0.1), (2L, 0.3)).toDF("pid", "score")
    val got = Chats.groupAdvantage(df, "pid", "score")
      .orderBy(col("pid"), col("score")).collect()
    got.take(3).foreach { r =>
      assert(r.getAs[Double]("group_std") == 0.0)
      assert(r.getAs[Double]("advantage") == 0.0)
    }
    // a genuinely-varying group still normalizes
    assert(got(3).getAs[Double]("group_std") > 0.0)
    assert(math.abs(got(3).getAs[Double]("advantage") + 1.0) < 1e-12)
  }
}
