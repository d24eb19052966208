package graft

import graft.functions.{TextAnalysis => TA, Vectors}
import graft.operators.Upsert
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (the reference has none — SURVEY §5): algebraic
  * invariants of the operators, driven through real Spark plans with
  * ScalaCheck generators at fixed seeds (deterministic, offline-friendly
  * without the scalatestplus bridge). */
class PropertySpec extends SparkSpec {

  private val params = Gen.Parameters.default
  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(params, Seed(seed)).get

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")
  private val text: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("jaccard is reflexive(1), symmetric, and in [0,1]") {
    val s = spark
    import s.implicits._
    val pairs = (1L to 8L).map(i => (sample(text, i), sample(text, i + 100)))
    val rows = pairs.toDF("a", "b").select(
      TA.ngramJaccard(col("a"), col("a"), 2).as("self"),
      TA.ngramJaccard(col("a"), col("b"), 2).as("ab"),
      TA.ngramJaccard(col("b"), col("a"), 2).as("ba")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == r.getDouble(2))
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    }
  }

  test("simhash distance: 0 to self, symmetric, bounded by nBits") {
    val s = spark
    import s.implicits._
    val pairs = (1L to 6L).map(i => (sample(text, i * 7), sample(text, i * 13)))
    val rows = pairs.toDF("a", "b").select(
      TA.simHashDistance(TA.simHash(col("a"), 16), TA.simHash(col("a"), 16))
        .as("self"),
      TA.simHashDistance(TA.simHash(col("a"), 16), TA.simHash(col("b"), 16))
        .as("ab"),
      TA.simHashDistance(TA.simHash(col("b"), 16), TA.simHash(col("a"), 16))
        .as("ba")).collect()
    rows.foreach { r =>
      assert(r.getAs[Number]("self").longValue == 0L)
      assert(r.getAs[Number]("ab").longValue ==
        r.getAs[Number]("ba").longValue)
      assert(r.getAs[Number]("ab").longValue <= 16)
    }
  }

  test("minhash signatures only decrease when content is a superset") {
    val s = spark
    import s.implicits._
    (1L to 5L).foreach { seed =>
      val t = sample(text, seed)
      val df = Seq(t, t + " " + t).toDF("txt")
      val sigs = df.select(TA.minHash(col("txt"), 2, 4).as("sig")).collect()
      val a = sigs(0).getSeq[Long](0)
      val b = sigs(1).getSeq[Long](0)
      a.zip(b).foreach { case (x, y) => assert(y <= x) }
    }
  }

  test("upsert latestView picks the max comparison value per key") {
    val s = spark
    import s.implicits._
    val rowsGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 1000L)))
    (1L to 5L).foreach { seed =>
      val rows = sample(rowsGen, seed)
      val out = Upsert.latestView(rows.toDF("pk", "cmp"), Seq("pk"),
        Seq("cmp")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(out == expect)
    }
  }

  test("simhash pigeonhole blocking finds EXACTLY the brute-force pairs") {
    val s = spark
    import s.implicits._
    // random near-dup-rich corpus: base texts plus 1-token perturbations
    val base = (1L to 12L).map(i => (i, sample(text, i)))
    val corpus = (base ++ base.map { case (i, t) =>
      (i + 100, t.split(" ").drop(1).mkString(" ")) })
      .toDF("doc_id", "text")
    val blocked = graft.operators.Dedup
      .simHashPairsWithin(corpus, "text", "doc_id", 64, 3)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same 64-bit simhashes
    val hs = graft.operators.Dedup.simHashes(corpus, "text", "doc_id", 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(blocked == brute) // perfect recall AND precision
  }

  test("upsert tombstone view is input-order invariant") {
    val s = spark
    import s.implicits._
    val events = Seq(
      (1L, 10L, "a", false), (1L, 30L, "b", true), (1L, 20L, "c", false),
      (2L, 10L, "x", false), (2L, 20L, "y", false),
      (3L, 10L, "gone", true))
    Seq(events, events.reverse, scala.util.Random.javaRandomToRandom(
      new java.util.Random(42)).shuffle(events)).foreach { perm =>
      val out = graft.operators.Upsert.latestViewWithDeletes(
        perm.toDF("pk", "cmp", "v", "del"), Seq("pk"), Seq("cmp"), "del")
        .select(col("pk"), col("v")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out == Set((2L, "y"))) // 1 tombstoned at 30, 3 tombstoned
    }
  }

  test("dot product is symmetric; self-dot non-negative") {
    val s = spark
    import s.implicits._
    val vec = Gen.listOfN(8, Gen.chooseNum(-5.0f, 5.0f))
    val vs = (1L to 6L).map(i =>
      (sample(vec, i).toArray, sample(vec, i + 50).toArray))
    val rows = vs.toDF("a", "b").select(
      Vectors.dot(col("a"), col("b")).as("ab"),
      Vectors.dot(col("b"), col("a")).as("ba"),
      Vectors.dot(col("a"), col("a")).as("self")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("exactSubstrDedup matches a naive sequential reference on random " +
      "dup-rich corpora") {
    val s = spark
    import s.implicits._
    def tk(t: String): Seq[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def naive(docs: Seq[(Long, String)], k: Int): Map[Long, String] = {
      val seen = scala.collection.mutable.Set[String]()
      val covered = scala.collection.mutable
        .Map[Long, scala.collection.mutable.Set[Int]]()
      for ((id, t) <- docs.sortBy(_._1); toks = tk(t);
           i <- 0 to toks.length - k if toks.length >= k) {
        val win = toks.slice(i, i + k).mkString(" ")
        if (seen.contains(win))
          covered.getOrElseUpdate(id,
            scala.collection.mutable.Set[Int]()) ++= (i until i + k)
        else seen += win
      }
      docs.map { case (id, t) =>
        val toks = tk(t)
        val cov = covered.getOrElse(id, scala.collection.mutable.Set[Int]())
        id -> toks.zipWithIndex.collect {
          case (w, i) if !cov(i) => w }.mkString(" ")
      }.toMap
    }
    // tiny vocabulary → dense window collisions
    val smallWord = Gen.oneOf("a", "b", "c", "d")
    val smallText = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, smallWord)).map(_.mkString(" "))
    for (seed <- 1L to 3L) {
      val docs = (1L to 10L).map(i => (i, sample(smallText, seed * 100 + i)))
      val expect = naive(docs, 3)
      val got = graft.operators.Dedup
        .exactSubstrDedup(docs.toDF("doc_id", "text"), "doc_id", "text", 3)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expect, s"seed $seed")
    }
  }

  test("packExamples matches a naive sequential FFD reference on random " +
      "inputs; windows never overflow except oversize own-windows") {
    val s = spark
    import s.implicits._
    def naive(items: Seq[(String, Long, Long)], cap: Long)
    : Map[Long, (String, Long, Long, Long)] = {
      items.groupBy(_._1).flatMap { case (g, its) =>
        val sorted = its.map(t => (t._2, t._3))
          .sortBy { case (id, len) => (len, id.toString) }(
            Ordering.Tuple2(Ordering[Long].reverse, Ordering[String]))
        val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
        val fill = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.map { case (id, len) =>
          var b = 0
          while (b < rem.length && rem(b) < len) b += 1
          if (b == rem.length) { rem += cap; fill += 0L }
          rem(b) -= len
          val off = fill(b); fill(b) += len
          id -> ((g, b.toLong, off, off + len))
        }
      }
    }
    for (seed <- 1L to 3L) {
      val lenGen = Gen.frequency(
        8 -> Gen.chooseNum(1L, 9L), // mostly packable vs cap 10
        1 -> Gen.chooseNum(10L, 25L)) // some exact-fit and oversize
      val n = 40
      val items = (1L to n).map { i =>
        (s"g${i % 3}", i, sample(lenGen, seed * 1000 + i))
      }
      val expect = naive(items, 10L)
      val got = graft.operators.Packing.packExamples(
          items.toDF("grp", "id", "len"), "id", "len", "grp", 10L)
        .collect().map(r => r.getAs[Long]("id") ->
          ((r.getAs[String]("grp"), r.getAs[Long]("bin"),
            r.getAs[Long]("start_off"), r.getAs[Long]("end_off")))).toMap
      assert(got == expect, s"seed $seed")
      // capacity invariant: a window's fill exceeds cap only when it
      // holds a single oversize item
      val lens = items.map(t => t._2 -> t._3).toMap
      got.toSeq.groupBy { case (_, (g, b, _, _)) => (g, b) }.foreach {
        case ((g, b), rows) =>
          val total = rows.map { case (id, _) => lens(id) }.sum
          assert(total <= 10L ||
            (rows.size == 1 && lens(rows.head._1) > 10L),
            s"window ($g,$b) overflows: $total seed=$seed")
      }
    }
  }

  test("bpeMerges matches a naive sequential reference on random corpora") {
    val s = spark
    import s.implicits._
    def naive(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
      val words = scala.collection.mutable.Map[List[String], Long]()
      for (t <- texts; w <- t.toLowerCase.split("\\s+")
             if w.matches("^[a-z0-9]+$"))
        words(w.toList.map(_.toString)) =
          words.getOrElse(w.toList.map(_.toString), 0L) + 1L
      var cur = words.toMap
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, Long)]
      for (r <- 1 to n) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for ((syms, f) <- cur; p <- syms.zip(syms.drop(1)))
          counts(p) = counts.getOrElse(p, 0L) + f
        if (counts.nonEmpty) {
          val ((l, rr), c) = counts.toSeq.minBy { case ((l, rr), c) =>
            (-c, s"|$l| |$rr|") }
          out += ((r, l, rr, c))
          def merge(sy: List[String]): List[String] = {
            val b = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < sy.length) {
              if (i + 1 < sy.length && sy(i) == l && sy(i + 1) == rr) {
                b += (l + rr); i += 2
              } else { b += sy(i); i += 1 }
            }
            b.toList
          }
          cur = cur.groupBy { case (sy, _) => merge(sy) }
            .map { case (sy, m) => sy -> m.values.sum }
        }
      }
      out.toSeq
    }
    for (seed <- 1L to 3L) {
      val texts = (1L to 8L).map(i => sample(text, seed * 1000 + i))
      val expect = naive(texts, 4)
      val got = graft.operators.Vocab.bpeMerges(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "text", n = 4)
        .orderBy("round").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
      assert(got == expect, s"seed $seed")
    }
  }

  test("AVI container: encode→decode round-trips arbitrary frame " +
    "payloads; truncation/corruption never throws") {
    import graft.operators.Multimodal
    val frameGen = Gen.chooseNum(0, 64)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127)))
      .map(_.map(_.toByte).toArray)
    val videoGen = for {
      n <- Gen.chooseNum(0, 12)
      fs <- Gen.listOfN(n, frameGen)
      w <- Gen.chooseNum(1, 512)
      h <- Gen.chooseNum(1, 512)
      us <- Gen.chooseNum(1, 2000000)
    } yield (fs, w, h, us)
    for (seed <- 1L to 40L) {
      val (fs, w, h, us) = sample(videoGen, seed)
      val avi = Multimodal.encodeAviMjpeg(fs, w, h, us)
      val v = Multimodal.decodeAvi(avi)
        .getOrElse(fail(s"seed $seed: undecodable"))
      assert(v.width == w && v.height == h && v.usPerFrame == us,
        s"seed $seed header")
      assert(v.frames.length == fs.length, s"seed $seed frame count")
      assert(v.frames.zip(fs).forall { case (a, b) =>
        java.util.Arrays.equals(a, b) }, s"seed $seed payloads")
      // sampling indices are sorted, unique, in range, of the right size
      val n = 1 + (seed % 5).toInt
      val idx = Multimodal.decodeAvi(avi).get.frames.length match {
        case 0 => Seq.empty
        case f =>
          val s2 = spark
          import s2.implicits._
          Seq(("x", avi)).toDF("id", "content")
            .select(explode(Multimodal
              .frameSampleAvi(col("content"), n)).as("fr"))
            .select(col("fr.frame_idx")).collect().map(_.getInt(0)).toSeq
      }
      assert(idx == idx.sorted && idx.distinct == idx, s"seed $seed order")
      assert(idx.size == math.min(n, fs.length), s"seed $seed size")
      assert(idx.forall(i => i >= 0 && i < fs.length), s"seed $seed range")
      // truncations and bit flips are DATA, never exceptions
      for (cut <- Seq(0, 3, 8, 11, 12, avi.length / 2, avi.length - 1)) {
        Multimodal.decodeAvi(java.util.Arrays.copyOf(avi, cut))
      }
      val flipped = avi.clone()
      val pos = (seed * 7 % math.max(1, avi.length)).toInt
      flipped(pos) = (flipped(pos) ^ 0x5A).toByte
      Multimodal.decodeAvi(flipped) // Option or None — must not throw
    }
  }

  test("PQ / cosine kernels are bit-identical to the unrolled Column " +
    "formulations they replaced, including ties and degenerate vectors") {
    val s = spark
    import s.implicits._
    import graft.operators.Similarity
    import org.apache.spark.sql.graft.PqExpressions
    val m = 3; val sub = 4; val k = 5; val dim = m * sub
    val coord = Gen.chooseNum(-2.0f, 2.0f)
    val vecGen = Gen.listOfN(dim, coord).map(_.toArray)
    val base = (1L to 48L).map(i => (i, sample(vecGen, i * 31)))
    // adversarial rows: a zero vector (NaN cosines), exact centroid
    // copies (force distance-0 / cosine-1 ties), a short vector
    // (slice-prefix semantics)
    val centroids: Array[Array[Array[Float]]] = Array.tabulate(m, k) {
      (j, c) => base((j * k + c) % base.length)._2
        .slice(j * sub, j * sub + sub)
    }
    // duplicate centroid → guaranteed argmin tie inside subspace 0
    centroids(0)(3) = centroids(0)(1).clone()
    val rows = base ++ Seq(
      (100L, Array.fill(dim)(0f)),
      (101L, base.head._2.clone()),
      (102L, base.head._2.take(sub + 1)))
    val df = rows.toDF("id", "vec")
    val model = Similarity.PqModel(m, k, centroids)

    // reference formulations = the pre-kernel unrolled Column trees
    def refCodes = array((0 until m).map { j =>
      val x = slice(col("vec"), j * sub + 1, sub)
      least((0 until k).map(c =>
        struct(Similarity.subDistU(x, centroids(j)(c).toSeq).as("d"),
          lit(c).as("c"))): _*).getField("c").cast("byte")
    }: _*)
    def refTab = array((0 until m).map { j =>
      val x = slice(col("vec"), j * sub + 1, sub)
      array((0 until k).map(c =>
        Similarity.subDistU(x, centroids(j)(c).toSeq)): _*)
    }: _*)
    val got = df.select(col("id"),
      PqExpressions.pqCodes(col("vec"), centroids).as("kc"),
      refCodes.as("rc"),
      PqExpressions.pqAdcTable(col("vec"), centroids).as("kt"),
      refTab.as("rt")).collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Byte](2).map(_.toInt),
        s"codes diverge for id ${r.getLong(0)}")
      assert(r.getSeq[Seq[Long]](3) == r.getSeq[Seq[Long]](4),
        s"ADC table diverges for id ${r.getLong(0)}")
    }
    // ADC sum over kernel codes == manual lookup of the reference table
    val sums = df.select(col("id"),
      PqExpressions.pqAdcSum(refTab,
        PqExpressions.pqCodes(col("vec"), centroids)).as("ks"),
      (0 until m).map(j =>
        element_at(element_at(refTab, j + 1),
          element_at(PqExpressions.pqCodes(col("vec"), centroids),
            j + 1) + 1)).reduce(_ + _).as("rs")).collect()
    sums.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"ADC sum diverges for id ${r.getLong(0)}"))

    // cosArgmax vs greatest(struct(round(cos,6), -i)) — full-dim
    // centroids, duplicated to force a cosine tie
    val cents2: Array[Array[Float]] =
      Array.tabulate(6)(c => base(c * 5 % base.length)._2)
    cents2(4) = cents2(2).clone()
    val nrm = graft.functions.Vectors.norm2(col("vec"))
    val refArg = {
      val scored = cents2.toSeq.zipWithIndex.map { case (cv, i) =>
        struct(round(graft.functions.Vectors.dot(col("vec"),
            typedLit(cv.toSeq)) /
          (nrm * graft.functions.Vectors.norm2(typedLit(cv.toSeq))), 6)
          .as("cos"), lit(-i).as("neg"))
      }
      (-greatest(scored: _*).getField("neg")).cast("int")
    }
    // the zero vector stays out of the Column-parity set: ANSI double
    // division throws on 0/0 in the unrolled form (the kernel's NaN
    // path matches Spark's NaN-greatest ordering instead of throwing)
    val args = df.filter(col("id") =!= 100L).select(col("id"),
      PqExpressions.cosArgmax(col("vec"), cents2).as("ka"),
      refArg.as("ra")).collect()
    args.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"cosArgmax diverges for id ${r.getLong(0)}"))
  }

  test("conditional change ledger: under random 200/304 interleavings, " +
    "changed sets track a reference model and receipts are the last " +
    "witnessed validators") {
    val s = spark
    import s.implicits._
    import graft.operators.Frontier
    Frontier.dropChangeLedger(s, "propcond")
    val urls = (0 until 12).map(i => s"u$i")
    // reference model on the driver: content + validators per url
    var modelHash = Map.empty[String, String] // url -> last 200 content
    var modelVal = Map.empty[String, (String, String)]
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 6) {
      val rows = urls.flatMap { u =>
        rnd.nextInt(4) match {
          case 0 => None // url absent this round
          case 1 if modelHash.contains(u) => // 304 revisit; etag rotates half the time
            val newTag = if (rnd.nextBoolean()) s"e$round-$u" else null
            Some((u, null: String, 304, newTag, null: String))
          case _ => // 200 body; changes content with p=1/2
            val content = if (rnd.nextBoolean() || !modelHash.contains(u))
              s"c$round-$u" else modelHash(u)
            Some((u, content, 200, s"et$round-$u", s"lm$round-$u"))
        }
      }
      val expectChanged = rows.collect {
        case (u, c, 200, _, _) if !modelHash.get(u).contains(c) => u
      }.toSet
      val got = Frontier.changedOnlyConditional(s,
        rows.toDF("url", "content", "status", "etag", "last_modified"),
        "url", "content", "status", "etag", "last_modified",
        "propcond", round.toLong, s"r$round")
        .select("url").collect().map(_.getString(0)).toSet
      assert(got == expectChanged, s"round $round")
      // advance the model exactly as the contract says
      rows.foreach {
        case (u, c, 200, e, lm) if !modelHash.get(u).contains(c) =>
          modelHash += u -> c; modelVal += u -> ((e, lm))
        case (u, _, 304, e, _) if modelHash.contains(u) =>
          val (pe, plm) = modelVal.getOrElse(u, (null, null))
          modelVal += u -> ((Option(e).getOrElse(pe), plm))
        case _ => () // unchanged 200 / never-seen 304: no ledger effect
      }
    }
    val rec = Frontier.latestReceipts(s, "propcond").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(rec.keySet == modelHash.keySet)
    modelVal.foreach { case (u, v) => assert(rec(u) == v, u) }
    Frontier.dropChangeLedger(s, "propcond")
  }

  test("selection tier is partition-invariant: bestOfN, dedupeByPrompt " +
      "and groupAdvantage return identical rows at 1, 3 and 32 " +
      "partitions on random scored pools") {
    val s = spark
    import s.implicits._
    import graft.operators.Chats
    val rnd = new scala.util.Random(42)
    val rows = (1L to 400L).map { i =>
      (i, s"p${rnd.nextInt(17)}", s"c${rnd.nextInt(50)}#$i",
        rnd.nextInt(9).toLong)
    }
    val base = rows.toDF("id", "prompt", "cand", "score")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val refB = canon(Chats.bestOfN(base, "prompt", "cand", "score"))
    val refD = canon(Chats.dedupeByPrompt(base, "id", "prompt", "score"))
    val refA = canon(Chats.groupAdvantage(base, "prompt", "score"))
    for (n <- Seq(1, 3, 32)) {
      val p = base.repartition(n)
      assert(canon(Chats.bestOfN(p, "prompt", "cand", "score")) == refB,
        s"bestOfN at $n partitions")
      assert(canon(Chats.dedupeByPrompt(p, "id", "prompt", "score"))
        == refD, s"dedupeByPrompt at $n partitions")
      assert(canon(Chats.groupAdvantage(p, "prompt", "score")) == refA,
        s"groupAdvantage at $n partitions")
    }
  }

  test("groupAdvantage matches a naive double-precision reference on " +
      "random pools and is shift-covariant on the score") {
    val s = spark
    import s.implicits._
    import graft.operators.Chats
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map(i => (i, s"g${rnd.nextInt(11)}",
      rnd.nextInt(100).toLong))
    val df = rows.toDF("id", "pool", "score")
    val got = Chats.groupAdvantage(df, "pool", "score").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("advantage")).toMap
    val byPool = rows.groupBy(_._2)
    byPool.foreach { case (_, members) =>
      val xs = members.map(_._3.toDouble)
      val m = xs.sum / xs.size
      val v = xs.map(x => (x - m) * (x - m)).sum / xs.size
      members.foreach { case (id, _, sc) =>
        val want = if (v == 0.0) 0.0 else (sc - m) / math.sqrt(v)
        assert(math.abs(got(id) - want) < 1e-9, s"id $id")
      }
    }
    // shifting every score by a constant leaves advantages unchanged
    val shifted = rows.map { case (i, p, sc) => (i, p, sc + 1000L) }
      .toDF("id", "pool", "score")
    val gotS = Chats.groupAdvantage(shifted, "pool", "score").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("advantage")).toMap
    got.foreach { case (id, a) =>
      assert(math.abs(gotS(id) - a) < 1e-9, s"shift id $id") }
  }

  test("shardManifest: fingerprint is order- and partition-free, and " +
      "any single-document change moves it") {
    val s = spark
    import s.implicits._
    import graft.operators.Packing
    val rnd = new scala.util.Random(11)
    val docs = (1L to 60L).map(i =>
      (i, (1 to 5 + rnd.nextInt(20)).map(_ => s"w${rnd.nextInt(99)}")
        .mkString(" ")))
    val base = docs.toDF("doc_id", "text")
    def manifest(df: org.apache.spark.sql.DataFrame): Seq[String] =
      Packing.shardManifest(df, "doc_id", "text", budget = 100L)
        .orderBy(col("shard")).collect().map(_.toString).toSeq
    val ref = manifest(base)
    assert(ref.nonEmpty)
    // partitioning and row order never move the manifest
    assert(manifest(base.repartition(7)) == ref)
    assert(manifest(base.orderBy(col("text"))) == ref)
    // one flipped character in one document changes its shard's
    // fingerprint (and only token-preserving edits leave counts alone)
    val mutated = docs.map { case (i, t) =>
      (i, if (i == 30L) t.replaceFirst("w", "x") else t)
    }.toDF("doc_id", "text")
    assert(manifest(mutated) != ref)
  }

  test("paragraphChunks: greedy fill never splits a paragraph, " +
      "oversize paragraphs own a chunk, whitespace-only paragraphs " +
      "drop, rebuilt chunks cover the document in order") {
    val s = spark
    import s.implicits._
    import graft.operators.Packing
    val text = Seq(
      "one two three", // 3 tokens
      "four five", // 2 → chunk0 = 5 tokens
      "six seven eight", // 3 → 5+3=8 > 6 → chunk1
      "   ", // whitespace: drops
      "w1 w2 w3 w4 w5 w6 w7 w8", // 8 > budget → own chunk2
      "tail" // chunk3
    ).mkString("\n")
    val got = Packing.paragraphChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        budget = 6L)
      .orderBy(col("chunk_idx")).collect()
      .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[String]("chunk"),
        r.getAs[Long]("n_paras"), r.getAs[Long]("n_tokens")))
    assert(got.toSeq == Seq(
      (0L, "one two three\nfour five", 2L, 5L),
      (1L, "six seven eight", 1L, 3L),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8", 1L, 8L),
      (3L, "tail", 1L, 1L)))
  }

  test("softWeights: cluster mass sums to one per component, " +
      "singletons weigh 1.0, ids only ride through") {
    val s = spark
    import s.implicits._
    import graft.operators.Dedup
    val docs = (1L to 10L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    // components: {1,2,3}, {4,5}; 6..10 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val got = Dedup.softWeights(docs, pairs, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == ((3L, 0.333333)) && got(2L)._1 == 3L)
    assert(got(4L) == ((2L, 0.5)) && got(5L) == ((2L, 0.5)))
    (6L to 10L).foreach(i => assert(got(i) == ((1L, 1.0))))
  }

  test("doremiWeights: zero excess everywhere stays uniform; the " +
      "high-excess domain's weight grows with rounds; weights sum ~1; " +
      "negative excess clamps to 0") {
    val s = spark
    import s.implicits._
    import graft.operators.Sampling
    // proxy == ref everywhere → uniform 1/4
    val flat = (1L to 80L).map(i =>
      (s"d${i % 4}", 2.5, 2.5)).toDF("dom", "p", "r")
    Sampling.doremiWeights(flat, "dom", "p", "r").collect().foreach {
      rr => assert(rr.getAs[Double]("weight") == 0.25 &&
        rr.getAs[Double]("excess") == 0.0)
    }
    // d0 has excess 1.0, d1 NEGATIVE excess (clamps to 0), d2/d3 flat
    val hot = (1L to 80L).map { i =>
      val dom = s"d${i % 4}"
      val (p, r) = dom match {
        case "d0" => (3.5, 2.5)
        case "d1" => (1.5, 2.5)
        case _ => (2.5, 2.5)
      }
      (dom, p, r)
    }.toDF("dom", "p", "r")
    def wOf(rounds: Int): Map[String, Double] =
      Sampling.doremiWeights(hot, "dom", "p", "r", rounds = rounds)
        .collect().map(rr => rr.getString(0) ->
          rr.getAs[Double]("weight")).toMap
    val w1 = wOf(1); val w3 = wOf(3)
    assert(w1("d0") > w1("d1") && w3("d0") > w1("d0"))
    assert(w1("d1") == w1("d2") && w1("d2") == w1("d3")) // clamped ≡ flat
    assert(math.abs(w3.values.sum - 1.0) < 1e-5)
    val ex = Sampling.doremiWeights(hot, "dom", "p", "r").collect()
      .map(rr => rr.getString(0) -> rr.getAs[Double]("excess")).toMap
    assert(ex("d1") == 0.0 && ex("d0") == 1.0)
  }

  test("unigramDrift: KL(A||A) is exactly zero, a vocabulary shift " +
      "moves it positive, and the top drift term names the new token") {
    val s = spark
    import s.implicits._
    import graft.operators.Curation
    val a = (1L to 40L).map(i => (i, s"alpha beta gamma w${i % 5}"))
      .toDF("doc_id", "text")
    val same = Curation.unigramDrift(a, a, "text").collect()(0)
    assert(same.getAs[Long]("kl_u") == 0L &&
      same.getAs[Double]("kl") == 0.0)
    val b = (1L to 40L).map(i => (i, s"alpha beta NOVEL w${i % 5}"))
      .toDF("doc_id", "text")
    val drift = Curation.unigramDrift(a, b, "text").collect()(0)
    assert(drift.getAs[Double]("kl") > 0.0)
    val top = Curation.unigramDriftTerms(a, b, "text")
      .orderBy(abs(col("term_u")).desc, col("token")).limit(2)
      .collect().map(_.getString(0)).toSet
    // the tokens that flipped between the snapshots dominate
    assert(top == Set("gamma", "novel"))
  }

  test("unigramDrift counts path: raw-text and precomputed-counts " +
      "entry points are bit-identical — the monitoring loop never " +
      "re-scans the reference text (ADVICE r17)") {
    val s = spark
    import s.implicits._
    import graft.operators.Curation
    val a = (1L to 30L).map(i => (i, s"alpha beta w${i % 7} gamma"))
      .toDF("doc_id", "text")
    val b = (1L to 25L).map(i => (i, s"alpha NOVEL w${i % 4}"))
      .toDF("doc_id", "text")
    val raw = Curation.unigramDrift(a, b, "text").collect()(0)
    val viaCounts = Curation.unigramDriftFromCounts(
      Curation.unigramCounts(a, "text"),
      Curation.unigramCounts(b, "text")).collect()(0)
    Seq("n_a", "n_b", "v_union", "kl_u").foreach(c =>
      assert(raw.getAs[Long](c) == viaCounts.getAs[Long](c), c))
    assert(raw.getAs[Double]("kl") == viaCounts.getAs[Double]("kl"))
    val rawTerms = Curation.unigramDriftTerms(a, b, "text")
      .orderBy(col("token")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val countTerms = Curation.unigramDriftTermsFromCounts(
        Curation.unigramCounts(a, "text"),
        Curation.unigramCounts(b, "text"))
      .orderBy(col("token")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rawTerms.toSeq == countTerms.toSeq)
  }

  test("prCurve: per-threshold cumulative counts match hand " +
      "computation; ties share a point; no positives → null recall") {
    val s = spark
    import s.implicits._
    import graft.operators.Classifier
    // scores: 0.9 (gold), 0.7 (gold), 0.7 (not), 0.3 (not)
    val df = Seq((true, 0.9), (true, 0.7), (false, 0.7),
      (false, 0.3)).toDF("gold", "score")
    val got = Classifier.prCurve(df, "gold", "score")
      .orderBy(col("threshold").desc).collect()
      .map(r => (r.getAs[Double]("threshold"), r.getAs[Long]("n_ge"),
        r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Double]("precision"), r.getAs[Double]("recall")))
    assert(got.toSeq == Seq(
      (0.9, 1L, 1L, 0L, 1.0, 0.5),
      (0.7, 3L, 2L, 1L, 0.666667, 1.0),
      (0.3, 4L, 2L, 2L, 0.5, 1.0)))
    val none = Classifier.prCurve(
      Seq((false, 0.5)).toDF("gold", "score"), "gold", "score")
      .collect()(0)
    assert(none.isNullAt(none.fieldIndex("recall")) &&
      none.getAs[Double]("f1") == 0.0)
    // a null score would mint a phantom whole-corpus threshold point —
    // it fails loudly instead (r18 review fix)
    val eN = intercept[Exception] {
      Classifier.prCurve(Seq((true, Some(0.5)),
          (false, None: Option[Double])).toDF("gold", "score"),
        "gold", "score").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(eN).exists(_.contains("null score")))
  }

  test("thresholdPick: max_f1 / precision_floor / recall_floor each " +
      "choose the documented operating point; no qualifying point → " +
      "ZERO rows; bad objectives and floors fail loudly") {
    val s = spark
    import s.implicits._
    import graft.operators.Classifier
    // curve points: 0.9 (P 1.0, R 0.5, F1 .666667),
    //               0.7 (P .666667, R 1.0, F1 .8),
    //               0.3 (P .5, R 1.0, F1 .666667)
    val curve = Classifier.prCurve(Seq((true, 0.9), (true, 0.7),
      (false, 0.7), (false, 0.3)).toDF("gold", "score"),
      "gold", "score")
    def pick(obj: String, floorAt: Double = Double.NaN): Seq[Double] =
      Classifier.thresholdPick(curve, obj, floorAt).collect()
        .map(_.getAs[Double]("threshold")).toSeq
    assert(pick("max_f1") == Seq(0.7))
    // lowest threshold meeting the precision bar (max recall s.t. P)
    assert(pick("precision_floor", 0.6) == Seq(0.7))
    assert(pick("precision_floor", 0.99) == Seq(0.9))
    // highest-precision point meeting the recall bar
    assert(pick("recall_floor", 1.0) == Seq(0.7))
    assert(pick("recall_floor", 0.4) == Seq(0.9))
    // no point qualifies → empty, never a null-filled row
    val none = Classifier.prCurve(
      Seq((false, 0.9), (true, 0.5)).toDF("gold", "score"),
      "gold", "score")
    assert(Classifier.thresholdPick(none, "precision_floor", 0.9)
      .count() == 0L)
    intercept[IllegalArgumentException] {
      Classifier.thresholdPick(curve, "max_recall")
    }
    intercept[IllegalArgumentException] {
      Classifier.thresholdPick(curve, "precision_floor")
    }
    intercept[IllegalArgumentException] {
      Classifier.thresholdPick(curve, "recall_floor", 1.5)
    }
  }

  test("calibration: equal-width bins with score-1.0 in the last bin, " +
      "exact-decimal means, gap from the rounded columns; ECE from " +
      "integer micro-units; out-of-range scores fail loudly") {
    val s = spark
    import s.implicits._
    import graft.operators.Classifier
    val df = Seq((true, 0.9), (false, 0.8), (true, 0.6), (false, 0.1),
      (true, 1.0)).toDF("gold", "score")
    val card = Classifier.calibration(df, "gold", "score", nBins = 4)
    val got = card.orderBy(col("bin")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (0L, 1L, 0.1, 0.0, 0.1),
      (2L, 1L, 0.6, 1.0, 0.4),
      (3L, 3L, 0.9, 0.666667, 0.233333)))
    val ece = Classifier.calibrationError(card).collect()(0)
    assert(ece.getAs[Long]("n") == 5L &&
      ece.getAs[Double]("ece") == 0.24)
    val e = intercept[Exception] {
      Classifier.calibration(Seq((true, 1.5)).toDF("gold", "score"),
        "gold", "score").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("non-null in [0,1]")))
  }

  test("fleissKappa: the hand-computed 3-item 3-rater panel; perfect " +
      "agreement → 1.0; ragged panels and null labels fail loudly") {
    val s = spark
    import s.implicits._
    import graft.operators.Classifier
    // items: (x,x,x), (x,x,y), (x,y,z) → P̄ = 8/18, p_e = 41/81,
    // κ = (0.444444 − 0.506173) / 0.493827 = −0.125001
    val ratings = Seq(
      (1L, "x"), (1L, "x"), (1L, "x"),
      (2L, "x"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"), (3L, "z")).toDF("item", "label")
    val r = Classifier.fleissKappa(ratings, "item", "label")
      .collect()(0)
    assert((r.getAs[Long]("n_items"), r.getAs[Long]("n_raters"),
      r.getAs[Double]("p_bar"), r.getAs[Double]("p_e"),
      r.getAs[Double]("kappa")) ==
      (3L, 3L, 0.444444, 0.506173, -0.125001))
    val perfect = Classifier.fleissKappa(
      Seq((1L, "x"), (1L, "x"), (1L, "x"),
        (2L, "x"), (2L, "x"), (2L, "x")).toDF("item", "label"),
      "item", "label").collect()(0)
    assert(perfect.getAs[Double]("p_e") == 1.0 &&
      perfect.getAs[Double]("kappa") == 1.0)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val ragged = intercept[Exception] {
      Classifier.fleissKappa(Seq((1L, "x"), (1L, "y"),
        (2L, "x"), (2L, "x"), (2L, "y")).toDF("item", "label"),
        "item", "label").collect()
    }
    assert(msgs(ragged).exists(_.contains("SAME rating count")))
    val nul = intercept[Exception] {
      Classifier.fleissKappa(
        Seq((1L, Some("x")), (1L, None: Option[String]))
          .toDF("item", "label"), "item", "label").collect()
    }
    assert(msgs(nul).exists(_.contains("null label")))
  }

  test("weightedKappa: hand-computed linear 0.4 and quadratic " +
      "0.444444 on the same cells; zero expected disagreement → 1.0; " +
      "out-of-range labels fail loudly") {
    val s = spark
    import s.implicits._
    import graft.operators.Classifier
    // cells: (0,0)×2, (1,2), (2,2), (2,0) — n=5
    val df = Seq((0, 0), (0, 0), (1, 2), (2, 2), (2, 0))
      .toDF("a", "b")
    val lin = Classifier.weightedKappa(df, "a", "b", k = 3,
      scheme = "linear").collect()(0)
    assert(lin.getAs[Long]("n") == 5L &&
      lin.getAs[Double]("kappa") == 0.4)
    val quad = Classifier.weightedKappa(df, "a", "b", k = 3)
      .collect()(0)
    assert(quad.getAs[Double]("kappa") == 0.444444)
    val const = Classifier.weightedKappa(
      Seq((1, 1), (1, 1)).toDF("a", "b"), "a", "b", k = 3)
      .collect()(0)
    assert(const.getAs[Double]("kappa") == 1.0)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val oor = intercept[Exception] {
      Classifier.weightedKappa(Seq((0, 5)).toDF("a", "b"),
        "a", "b", k = 3).collect()
    }
    assert(msgs(oor).exists(_.contains("integer label in")))
    intercept[IllegalArgumentException] {
      Classifier.weightedKappa(df, "a", "b", k = 3, scheme = "cubic")
    }
  }

  test("cohenKappa: the textbook margins give kappa 0.4; perfect " +
      "agreement on one label gives 1.0; null labels fail loudly") {
    val s = spark
    import s.implicits._
    import graft.operators.Classifier
    val rows = Seq.fill(20)(("yes", "yes")) ++
      Seq.fill(5)(("yes", "no")) ++ Seq.fill(10)(("no", "yes")) ++
      Seq.fill(15)(("no", "no"))
    val r = Classifier.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .collect()(0)
    assert((r.getAs[Long]("n"), r.getAs[Long]("n_agree"),
      r.getAs[Double]("po"), r.getAs[Double]("pe"),
      r.getAs[Double]("kappa")) == (50L, 35L, 0.7, 0.5, 0.4))
    val perfect = Classifier.cohenKappa(
      Seq.fill(4)(("x", "x")).toDF("a", "b"), "a", "b").collect()(0)
    assert(perfect.getAs[Double]("pe") == 1.0 &&
      perfect.getAs[Double]("kappa") == 1.0)
    val e = intercept[Exception] {
      Classifier.cohenKappa(Seq(("x", None: Option[String]))
        .toDF("a", "b"), "a", "b").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("null label")))
  }

  test("paddingWaste: smallest-fitting bucket, overflow row counts " +
      "truncation not waste; boundary validation fails fast") {
    val s = spark
    import s.implicits._
    import graft.operators.Packing
    val df = Seq(3L, 8L, 8L, 20L, 100L).toDF("len")
    val got = Packing.paddingWaste(df, "len", Seq(8L, 16L))
      .orderBy(col("bucket")).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_len"), r.getAs[Long]("capacity"),
        r.getAs[Long]("waste"), r.getAs[Long]("truncated"),
        r.getAs[Double]("waste_frac")))
    assert(got.toSeq == Seq(
      (-1L, 2L, 120L, 32L, 0L, 88L, 0.0), // 20 and 100 overflow 16
      (8L, 3L, 19L, 24L, 5L, 0L, 0.208333)))
    intercept[IllegalArgumentException] {
      Packing.paddingWaste(df, "len", Seq(16L, 8L))
    }
    intercept[IllegalArgumentException] {
      Packing.paddingWaste(df, "len", Seq.empty)
    }
    // null / negative lengths fail loudly instead of silently landing
    // in overflow resp. the smallest bucket (r18 review fix)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val withNull = Seq(Some(3L), None).toDF("len")
    val e1 = intercept[Exception] {
      Packing.paddingWaste(withNull, "len", Seq(8L)).collect()
    }
    assert(messages(e1).exists(_.contains("negative or null len")))
    val e2 = intercept[Exception] {
      Packing.bucketBatches(Seq((1L, -5L)).toDF("id", "len"), "id",
        "len", Seq(8L), batchSize = 2).collect()
    }
    assert(messages(e2).exists(_.contains("negative or null len")))
  }

  test("sessionize: gap threshold is exclusive in micros, indexes are " +
      "0-based per key and partition-invariant, summary card matches") {
    val s = spark
    import s.implicits._
    import graft.operators.Funnel
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    // user 1: gaps 10s, 31s, 5s with gapSec=30 → sessions {e1,e2},
    // {e3,e4}; a gap of EXACTLY 30s must NOT split (strictly greater)
    val ev = Seq(
      (1L, ts(0L), 1L), (1L, ts(10000L), 2L), (1L, ts(41000L), 3L),
      (1L, ts(46000L), 4L), (1L, ts(76000L), 5L), // exactly 30s gap
      (2L, ts(0L), 6L))
      .toDF("user_id", "ts", "event_id")
    def run(parts: Int) = Funnel.sessionize(ev.repartition(parts),
        "user_id", "ts", gapSec = 30, tieCols = Seq("event_id"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("session_idx")).toMap
    val a = run(1)
    assert(a == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 0L))
    assert(a == run(7))
    val card = Funnel.sessionSummary(ev, "user_id", "ts", 30,
        Seq("event_id"))
      .orderBy(col("user_id"), col("session_idx")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("n_events"), r.getAs[Long]("duration_us")))
    assert(card.toSeq == Seq((1L, 0L, 2L, 10000000L),
      (1L, 1L, 3L, 35000000L), (2L, 0L, 1L, 0L)))
    intercept[IllegalArgumentException] {
      Funnel.sessionize(ev, "user_id", "ts", 0)
    }
  }

  test("sessionEpisodes: sessions assemble into the chat interchange " +
      "shape — conv_id key:idx, 0-based ranked turns, alternating " +
      "roles — and feed validateTurns/packWithMask unchanged") {
    val s = spark
    import s.implicits._
    import graft.operators.{Chats, Funnel}
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    // user 1 session 0: 2 events (valid episode — ends assistant);
    // user 1 session 1: 3 events (invalid — ends on a user turn);
    // user 2 session 0: singleton (invalid)
    val ev = Seq(
      (1L, ts(0L), 1L, "view"), (1L, ts(10000L), 2L, "click"),
      (1L, ts(60000L), 3L, "view"), (1L, ts(61000L), 4L, "click"),
      (1L, ts(62000L), 5L, "buy"),
      (2L, ts(0L), 6L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val turns = Funnel.sessionEpisodes(ev, "user_id", "ts",
      gapSec = 30, contentCol = concat(col("event_type"), lit("#"),
        col("event_id").cast("string")), tieCols = Seq("event_id"))
    val got = turns.orderBy(col("conv_id"), col("turn_idx")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3)))
    assert(got.toSeq == Seq(
      ("1:0", 0L, "user", "view#1"), ("1:0", 1L, "assistant",
        "click#2"),
      ("1:1", 0L, "user", "view#3"), ("1:1", 1L, "assistant",
        "click#4"), ("1:1", 2L, "user", "buy#5"),
      ("2:0", 0L, "user", "view#6")))
    // the unchanged chat stack applies: even-length episodes validate
    val valid = Chats.validateTurns(turns, "conv_id").collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("valid")).toMap
    assert(valid == Map("1:0" -> true, "1:1" -> false,
      "2:0" -> false))
    val text = Chats.packWithMask(turns, "conv_id")
      .filter(col("conv_id") === "1:0").collect()(0).getAs[String]("text")
    assert(text == "<|user|>view#1\n<|assistant|>click#2\n")
    // a null key would NULL conv_id for every null-key session and
    // silently merge distinct sessions — fail loudly instead
    val eK = intercept[Exception] {
      Funnel.sessionEpisodes(
        Seq((Some(1L), ts(0L), 1L, "view"),
          (None: Option[Long], ts(0L), 2L, "view"))
          .toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", gapSec = 30,
        contentCol = col("event_type"),
        tieCols = Seq("event_id")).collect()
    }
    def kmsgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ kmsgs(x.getCause))
    assert(kmsgs(eK).exists(_.contains("null user_id")))
  }

  test("crossSourceMatrix: pairs label by endpoint sources, unordered " +
      "normalization folds A-B and B-A into one cell") {
    val s = spark
    import s.implicits._
    import graft.operators.Dedup
    val docs = Seq((1L, "web"), (2L, "web"), (3L, "books"),
      (4L, "code")).toDF("doc_id", "source")
    // 1-2 within web; 1-3 and 3-2 cross web/books (opposite id
    // orientation — must land in ONE cell); 3-4 cross books/code
    val pairs = Seq((1L, 2L), (1L, 3L), (3L, 2L), (3L, 4L))
      .toDF("id_a", "id_b")
    val got = Dedup.crossSourceMatrix(docs, pairs, "doc_id", "source")
      .orderBy(col("source_a"), col("source_b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("books", "code", 1L),
      ("books", "web", 2L),
      ("web", "web", 1L)))
  }

  test("bucketBatches: smallest-fitting bucket, batches never exceed " +
      "batchSize, slots tile 0..n-1 per bucket, deterministic at any " +
      "partitioning") {
    val s = spark
    import s.implicits._
    import graft.operators.Packing
    val df = (1L to 100L).map(i => (i, i % 40 + 1)).toDF("id", "len")
    def run(parts: Int, nSub: Int = 256) =
      Packing.bucketBatches(df.repartition(parts), "id", "len",
          Seq(8L, 16L, 32L), batchSize = 5, nSub = nSub)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val a = run(1); val b = run(13)
    assert(a == b && a.size == 100)
    // the two-pass sub-bucket prefix sum is BIT-IDENTICAL to the
    // single-window formulation at any nSub (r18 verdict: the window
    // partitioned by the length bucket itself is the 100 TB scale
    // killer this replaces) — replay the window form inline and pin
    // every (bucket, batch_idx, pos_in_batch) triple
    val h = graft.functions.Scalars.hash60(
      concat(lit("graft:"), col("id").cast("string")))
    val bucketCase = when(col("len") <= 8, 8L)
      .when(col("len") <= 16, 16L).when(col("len") <= 32, 32L)
      .otherwise(-1L)
    val wRef = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"))
      .orderBy(col("__h"), col("id").cast("string"))
    val ref = df.select(col("id"), bucketCase.as("bucket"), h.as("__h"))
      .withColumn("__r", row_number().over(wRef).cast("long") - 1)
      .select(col("id"), col("bucket"),
        (col("__r") / 5).cast("long").as("batch_idx"),
        (col("__r") % 5).as("pos_in_batch"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(run(7, nSub = 1) == ref)   // one sub = the window itself
    assert(run(7, nSub = 2) == ref)   // multi-row subs, real offsets
    assert(run(7, nSub = 256) == ref) // default: ~singleton subs
    // a null id would silently vanish at the offsets equi-join —
    // fail loudly instead (the shardByCost guard class)
    val eNull = intercept[Exception] {
      Packing.bucketBatches(
        Seq((Some(1L), 5L), (None: Option[Long], 7L))
          .toDF("id", "len"),
        "id", "len", Seq(8L), batchSize = 2).collect()
    }
    def nmsgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ nmsgs(x.getCause))
    assert(nmsgs(eNull).exists(_.contains("null id")))
    intercept[IllegalArgumentException] {
      Packing.bucketBatches(df, "id", "len", Seq(8L), batchSize = 2,
        nSub = 3)
    }
    // bucket correctness and batch occupancy
    val byDoc = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { case (id, (bucket, _, pos)) =>
      val l = byDoc(id)
      val want = if (l <= 8) 8L else if (l <= 16) 16L
        else if (l <= 32) 32L else -1L
      assert(bucket == want, s"id $id")
      assert(pos >= 0 && pos < 5)
    }
    a.groupBy { case (_, (bu, ba, _)) => (bu, ba) }.foreach {
      case ((bu, ba), members) =>
        assert(members.size <= 5, s"batch ($bu,$ba) overfull")
        // slots within a batch are distinct and contiguous from 0
        val slots = members.values.map(_._3).toSeq.sorted
        assert(slots == (0L until slots.size.toLong), s"($bu,$ba)")
    }
  }

  test("shardByCost: a negative cost fails loudly instead of " +
      "silently corrupting the prefix-sum shard assignment " +
      "(ADVICE r17)") {
    val s = spark
    import s.implicits._
    import graft.operators.Packing
    val ok = (1L to 40L).map(i => (i, i % 7 + 1)).toDF("id", "cost")
    // clean costs keep working (the guard rides the projection)
    assert(Packing.shardByCost(ok, "id", "cost", budget = 20L)
      .count() == 40L)
    val badRows = ok.union(Seq((99L, -3L)).toDF("id", "cost"))
    val e = intercept[Exception] {
      Packing.shardByCost(badRows, "id", "cost", budget = 20L)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("negative or null cost")))
  }

  test("fimTransform: PSM parts reassemble to the original document, " +
      "selection is the hash gate, rate 0/1 edges, empty/null text") {
    val s = spark
    import s.implicits._
    import graft.operators.{Packing, Sampling}
    val docs = ((1L to 80L).map(i => (i, s"doc $i body ${"x" * (i % 17).toInt}")) ++
      Seq((81L, ""), (82L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    val got = Packing.fimTransform(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[String]("text")),
        r.getAs[Boolean]("fim"), Option(r.getAs[String]("text_fim"))))
    val re = ("""(?s)^<\|fim_pre\|>(.*)<\|fim_suf\|>(.*)""" +
      """<\|fim_mid\|>(.*)$""").r
    got.foreach { case (id, text, fim, out) =>
      if (!fim) assert(out == text, s"passthrough $id")
      else out.get match {
        case re(pre, suf, mid) =>
          assert(pre + mid + suf == text.get, s"reassembly $id")
        case other => fail(s"bad FIM shape for $id: $other")
      }
    }
    // null text never transforms; the gate selects ~half
    assert(!got.find(_._1 == 82L).get._3)
    val nFim = got.count(_._3)
    assert(nFim > 10 && nFim < 70)
    // rate edges
    assert(Packing.fimTransform(docs, "doc_id", "text", 0.0)
      .filter(col("fim")).count() == 0)
    assert(Packing.fimTransform(docs, "doc_id", "text", 1.0)
      .filter(!col("fim")).count() == 1) // only the null-text row
  }

  test("manifestDiff: severity lattice — only_left/right, count, " +
      "tokens, fingerprint, range, match — each fires on exactly its " +
      "own perturbation") {
    val s = spark
    import s.implicits._
    import graft.operators.Packing
    val base = (0L to 69L).map(i => (i, s"alpha beta w$i", i % 7))
      .toDF("doc_id", "text", "shard")
    def mOf(df: org.apache.spark.sql.DataFrame) =
      Packing.manifestOf(df, "shard", "doc_id", "text")
    val b = base.filter(col("doc_id") =!= 8) // shard 1: count
      .select(
        when(col("doc_id") === 9, col("doc_id") + 700) // shard 2: range
          .otherwise(col("doc_id")).as("doc_id"),
        when(col("doc_id") === 10, lit("alpha beta W10")) // 3: bytes
          .when(col("doc_id") === 11, lit("alpha beta w11 x")) // 4: tok
          .otherwise(col("text")).as("text"),
        col("shard"))
      .unionByName(Seq((999L, "zz", 99L)).toDF("doc_id", "text",
        "shard"))
    val a = base.unionByName(Seq((998L, "yy", 98L)).toDF("doc_id",
      "text", "shard"))
    val got = Packing.manifestDiff(mOf(a), mOf(b))
      .orderBy(col("shard")).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(got == Map(0L -> "match", 1L -> "count_mismatch",
      2L -> "range_mismatch", 3L -> "fingerprint_mismatch",
      4L -> "tokens_mismatch", 5L -> "match", 6L -> "match",
      98L -> "only_left", 99L -> "only_right"))
  }

  test("curriculumOrder equals the global (score, id) rank at every " +
      "bucket count and partitioning") {
    val s = spark
    import s.implicits._
    import graft.operators.Layout
    val rnd = new scala.util.Random(5)
    val rows = (1L to 300L).map(i => (i, rnd.nextInt(20) / 20.0))
    val df = rows.toDF("id", "score")
    val want = rows.sortBy { case (i, sc) => (sc, i.toString) }
      .zipWithIndex.map { case ((i, _), p) => i -> p.toLong }.toMap
    for (b <- Seq(1, 4, 64); p <- Seq(1, 13)) {
      val got = Layout.curriculumOrder(df.repartition(p), "id",
          "score", lo = 0.0, hi = 1.0, buckets = b)
        .collect().map(r => r.getLong(0) ->
          r.getLong(r.fieldIndex("curriculum_pos"))).toMap
      assert(got == want, s"buckets=$b partitions=$p")
    }
    // null scores are a fail-fast precondition, not an opaque NPE in
    // the offsets collect (ADVICE r16)
    val withNull = df.union(Seq((999L, null.asInstanceOf[java.lang.Double]))
      .toDF("id", "score"))
    val e = intercept[IllegalArgumentException] {
      Layout.curriculumOrder(withNull, "id", "score", 0.0, 1.0, 4)
    }
    assert(e.getMessage.contains("null"))
  }

  test("decodeAvi: pathological LIST nesting is data (None), not a " +
    "StackOverflowError") {
    import graft.operators.Multimodal
    // a LIST every 12 bytes nests one level per chunk; thousands of
    // levels would blow the stack without the parser's depth cap
    val depth = 20000
    val bb = java.nio.ByteBuffer.allocate(12 + depth * 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + depth * 12)
      .put("AVI ".getBytes("US-ASCII"))
    for (i <- depth to 1 by -1)
      bb.put("LIST".getBytes("US-ASCII")).putInt((i - 1) * 12 + 4)
        .put("recx".getBytes("US-ASCII"))
    assert(Multimodal.decodeAvi(bb.array()).isEmpty)
  }

  test("BPE fast walk == literal pipe replay on random words and merges") {
    import org.apache.spark.sql.graft.BpeCore
    // tiny alphabet maximizes pair collisions/re-formations; merge sides
    // are short unit concatenations so applied merges actually chain
    val unit = Gen.oneOf("a", "b", "c")
    val side = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, unit)).map(_.mkString)
    val mergeG = for { l <- side; r <- side } yield (l, r)
    val wordG = Gen.chooseNum(1, 14).flatMap(n =>
      Gen.listOfN(n, unit)).map(_.mkString)
    (0 until 300).foreach { i =>
      val merges = sample(Gen.chooseNum(0, 12).flatMap(n =>
        Gen.listOfN(n, mergeG)), 7000 + i)
      val w = sample(wordG, 9000 + i)
      val plan = new BpeCore.Plan(merges, "^[a-z0-9]+$",
        charMode = false, markSuffix = "")
      val fast = BpeCore.applyMergesFast(w, plan)
      assert(fast != null) // safe domain by construction
      assert(fast.toList == BpeCore.pipeReplayExpr(w, plan).toList,
        s"word=$w merges=$merges")
    }
  }
}
