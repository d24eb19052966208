package graft

import graft.functions.{Aggregates => Ag, Scalars => F, TextAnalysis => TA, Vectors}
import graft.operators.Dedup
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def one(c: org.apache.spark.sql.Column): Any = {
    val s = spark
    import s.implicits._
    Seq(1).toDF("x").select(c.as("v")).head().get(0)
  }

  test("string scalars: strcmp / hamming / splitPart / strpos") {
    assert(one(F.strcmp(lit("a"), lit("b"))) == -1)
    assert(one(F.strcmp(lit("b"), lit("b"))) == 0)
    assert(one(F.hammingDistance(lit("karolin"), lit("kathrin"))) == 3)
    assert(one(F.hammingDistance(lit("ab"), lit("abc"))) == -1)
    assert(one(F.hammingDistanceStatic(lit("karolin"), lit("kathrin"), 10)) == 3)
    assert(one(F.hammingDistanceStatic(lit("ab"), lit("abc"), 10)) == -1)
    assert(one(F.splitPart(lit("a-b-c"), "-", 2)) == "b")
    assert(one(F.strpos(lit("hello"), "ll")) == 3)
  }

  test("array set ops / utf8 round-trip / ascii strip / ts arithmetic") {
    val arr = array(lit(1), lit(2), lit(2), lit(3))
    assert(one(F.arrayRemoveValue(arr, lit(2)))
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(1, 3))
    assert(one(F.arrayUnionOf(array(lit(1), lit(2)), array(lit(2), lit(3))))
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(1, 2, 3))
    assert(one(F.arrayConcatOf(array(lit(1)), array(lit(1))))
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(1, 1))
    assert(one(F.fromUtf8(F.toUtf8(lit("héllo")))) == "héllo")
    assert(one(F.toAsciiOnly(lit("héllo→x"))) == "hllox")
    assert(one(F.timestampDiffSec(
      F.timestampAddSec(lit("2024-01-01 00:00:00").cast("timestamp"),
        lit(90)),
      lit("2024-01-01 00:00:00").cast("timestamp"))) == 90L)
    assert(one(F.jsonExtractKey(lit("""{"a":{"x":1,"y":2}}"""), "$.a"))
      .asInstanceOf[scala.collection.Seq[String]].toSeq.sorted == Seq("x", "y"))
  }

  test("truncate is toward-zero at scale") {
    assert(one(F.truncate(lit(2.679), 1)) == 2.6)
    assert(one(F.truncate(lit(-2.679), 1)) == -2.6)
  }

  test("timeBucket floors to the bucket start") {
    val v = one(F.timeBucket(
      to_timestamp(lit("2024-01-01 00:14:59")), 900)).toString
    assert(v.startsWith("2024-01-01 00:00:00"))
    val v2 = one(F.timeBucket(
      to_timestamp(lit("2024-01-01 00:15:00")), 900)).toString
    assert(v2.startsWith("2024-01-01 00:15:00"))
  }

  test("hash60 is stable and 60-bit") {
    val v = one(F.hash60(lit("abc"))).asInstanceOf[Long]
    assert(v == 648541476951500027L) // ('0x'||substr(md5('abc'),1,15)) in DuckDB
    assert(v > 0)
  }

  test("isSubnetOf udf: IPv4 and IPv6, non-octet prefixes, mixed family") {
    F.registerAll(spark)
    val r = spark.sql(
      "SELECT is_subnet_of('192.168.0.0/24','192.168.0.42') a," +
        " is_subnet_of('192.168.0.0/24','192.168.1.42') b," +
        " is_subnet_of('10.0.0.0/9','10.127.3.4') c," + // non-octet prefix
        " is_subnet_of('10.0.0.0/9','10.128.0.1') d").head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getBoolean(2) && !r.getBoolean(3))
    val v6 = spark.sql(
      "SELECT is_subnet_of('2001:db8::/32','2001:db8:1234::1') a," +
        " is_subnet_of('2001:db8::/32','2001:db9::1') b," +
        " is_subnet_of('2001:db8::/127','2001:db8::1') c," +
        " is_subnet_of('2001:db8::/127','2001:db8::2') d," +
        " is_subnet_of('2001:db8::/32','192.168.0.1') e").head() // family
    assert(v6.getBoolean(0) && !v6.getBoolean(1))
    assert(v6.getBoolean(2) && !v6.getBoolean(3))
    assert(!v6.getBoolean(4))
  }

  test("smart aggregates: exact below threshold, bounded estimate above") {
    import graft.functions.{Aggregates => Ag}
    val li = Tables.lineitem(spark, sfDir)
    // distinctCountSmart: sized above the true cardinality → exact
    val exact = li.agg(count_distinct(col("l_partkey"))).head.getLong(0)
    val smart = li.agg(Ag.distinctCountSmart(col("l_partkey"), 8192)
      .as("nd")).head.getLong(0)
    assert(smart == exact)
    // undersized → still within HLL-class error
    // a 64-entry budget over ~200 distincts: estimate mode engages;
    // error at such a tiny sketch is large but bounded
    val tight = li.agg(Ag.distinctCountSmart(col("l_partkey"), 64)
      .as("nd")).head.getLong(0)
    assert(tight != exact || exact <= 64, "estimate mode should engage")
    assert(math.abs(tight - exact).toDouble / exact < 0.5,
      s"$tight vs $exact")

    // percentileSmart below threshold: bit-identical to exact percentile
    val both = li.groupBy(col("l_returnflag")).agg(
      Ag.percentileSmart(col("l_extendedprice"), 0.5, 1000000).as("sm"),
      percentile(col("l_extendedprice"), lit(0.5)).as("ex"))
      .collect()
    both.foreach(r => assert(
      r.getAs[Double]("sm") == r.getAs[Double]("ex"), r.toString))
    // above threshold (forced sketch): rank within KLL bound
    val est = li.agg(Ag.percentileSmart(col("l_extendedprice"), 0.5, 10)
      .as("sm")).head.getDouble(0)
    val n = li.count().toDouble
    val rank = li.filter(col("l_extendedprice") <= est).count() / n
    assert(math.abs(rank - 0.5) < 0.03, s"rank $rank")
  }

  test("tokens / shingles / jaccard") {
    assert(one(TA.tokenCount(lit("a  b\tc "))) == 3)
    val sh = one(TA.shingles(TA.tokens(lit("a b c d")), 2))
    assert(sh.asInstanceOf[scala.collection.Seq[String]].toSeq ==
      Seq("a b", "b c", "c d"))
    // identical → 1.0; disjoint → 0.0
    assert(one(TA.ngramJaccard(lit("a b c"), lit("a b c"), 2)) == 1.0)
    assert(one(TA.ngramJaccard(lit("a b c"), lit("x y z"), 2)) == 0.0)
  }

  test("simHash: near-identical texts are close, different texts far") {
    val d1 = one(TA.simHashDistance(
      TA.simHash(lit("the quick brown fox jumps over the lazy dog"), 16),
      TA.simHash(lit("the quick brown fox jumps over the lazy cat"), 16)))
      .asInstanceOf[Number].longValue
    val d2 = one(TA.simHashDistance(
      TA.simHash(lit("the quick brown fox jumps over the lazy dog"), 16),
      TA.simHash(lit("completely unrelated words appear here instead now"), 16)))
      .asInstanceOf[Number].longValue
    assert(d1 < d2)
  }

  test("langId picks the dominant stopword language") {
    assert(one(TA.langId(lit("the cat sat on the mat and it is fine"))) == "en")
    assert(one(TA.langId(lit("el perro y la casa en un dia es bueno"))) == "es")
    assert(one(TA.langId(lit("zzz qqq www"))) == "und")
  }

  test("native text-hash kernels match the HOF formulations on the corpus") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("text"))
      // edge inputs the corpus may not contain: empty, single token,
      // fewer tokens than the shingle width, repeated tokens
      .union(Seq("", "one", "two words", "a a a a a a")
        .map(t => s"SELECT '$t' AS text").map(spark.sql).reduce(_ union _))
    val tokMism = docs.select(TA.tokens(col("text")).eqNullSafe(
      TA.tokensHof(col("text"))).as("ok")).filter(!col("ok")).count()
    assert(tokMism == 0)
    val enDict = TA.stopwords("en")
    val hitsMism = docs.select(
      TA.dictHits(TA.tokens(col("text")), enDict).eqNullSafe(
        TA.dictHitsHof(TA.tokensHof(col("text")), enDict)).as("dh"),
      TA.subwordCount(col("text")).eqNullSafe(
        TA.subwordCountHof(col("text"))).as("sw"))
      .filter(!col("dh") || !col("sw")).count()
    assert(hitsMism == 0)
    val base = docs.select(col("text"),
      TA.shingleBase(col("text"), 3).as("nat"),
      TA.shingleBaseHof(col("text"), 3).as("hof")).cache()
    assert(base.filter(col("nat") =!= col("hof")).count() == 0)
    val mism = docs.select(
      TA.fingerprint(col("text"), 5).eqNullSafe(
        TA.fingerprintHof(col("text"), 5)).as("fp"),
      TA.tokenHashes(col("text")).eqNullSafe(
        TA.tokenHashesHof(col("text"))).as("th"),
      TA.simHashFromHashes(TA.tokenHashes(col("text")), 16).eqNullSafe(
        TA.simHashFromHashesHof(TA.tokenHashesHof(col("text")), 16))
        .as("sh"),
      org.apache.spark.sql.graft.TextHashExprs.shingleHash60(
        TA.tokens(col("text")), 3, sortedDistinct = true).eqNullSafe(
        array_sort(array_distinct(transform(
          TA.shingles(TA.tokens(col("text")), 3),
          s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))))
        .as("sd"))
      .filter(!col("fp") || !col("th") || !col("sh") || !col("sd")).count()
    assert(mism == 0)
    val sig = base.select(
      TA.minHashFromBase(col("nat"), 8).eqNullSafe(
        TA.minHashFromBaseHof(col("hof"), 8)).as("ok"))
      .filter(!col("ok")).count()
    assert(sig == 0)
    base.unpersist()
  }

  test("canonTail kernel byte-matches the regexp canonicalization chain") {
    def regexpCanon(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(regexp_replace(lower(c),
        "[^a-z0-9\\s]", " "), "\\s+", " "))
    // corpus + adversarial shapes: unicode (multi-byte, exotic case
    // mappings), punctuation/whitespace runs, ends, empties, controls
    val adversarial = Seq("", " ", "   ", "a", "A.B,C", "--x--", "é É ü",
      "tab\tnl\ncr\r mix", "a b", "ABC123xyz", "!!!", "¡™£¢∞§¶",
      "ĶKK k", "a  b   c", "ctl", "日本語 text",
      "trailing space ", " leading", "under_score-dash.dot")
    val rng = new scala.util.Random(42)
    val palette = ("abcXYZ019 \t\n.,;:!?_-#éÜß€日ࠀ𝒜" + "  ").toArray
    val fuzz = (1 to 300).map(_ =>
      String.valueOf(Array.fill(rng.nextInt(40))(
        palette(rng.nextInt(palette.length)))))
    val extra = spark.createDataset(adversarial ++ fuzz)(
      org.apache.spark.sql.Encoders.STRING).toDF("text")
    val docs = Tables.documents(spark, sfDir).select(col("text"))
      .union(extra)
    val mism = docs.select(
      Dedup.canonicalize(col("text")).as("nat"),
      regexpCanon(col("text")).as("re"))
      .filter(!col("nat").eqNullSafe(col("re")))
    assert(mism.count() == 0, mism.take(3).mkString("; "))
  }

  test("nfcNormalize: composes decomposed marks, idempotent, ASCII id") {
    // codepoints assembled numerically so source-file normalization can
    // never silently change what's being tested
    val acute = new String(Character.toChars(0x301)) // combining acute
    val ring = new String(Character.toChars(0x30A))  // combining ring
    val eAcute = new String(Character.toChars(0xE9)) // precomposed e-acute
    val aRing = new String(Character.toChars(0xC5))  // precomposed A-ring
    val rows = spark.createDataset(Seq(
      "caf" + "e" + acute, // decomposed -> composes
      "caf" + eAcute,      // already composed -> fixpoint
      "A" + ring + " x",   // A + combining ring -> A-ring
      "plain ascii 123", ""))(
      org.apache.spark.sql.Encoders.STRING).toDF("t")
      .select(col("t"), TA.nfcNormalize(col("t")).as("n"),
        TA.nfcNormalize(TA.nfcNormalize(col("t"))).as("nn"))
      .collect()
    assert(rows(0).getString(1) == "caf" + eAcute)
    assert(rows(1).getString(1) == "caf" + eAcute)
    assert(rows(2).getString(1) == aRing + " x")
    assert(rows(3).getString(1) == "plain ascii 123")
    assert(rows(4).getString(1) == "")
    rows.foreach(r => assert(r.getString(1) == r.getString(2),
      "NFC idempotent"))
    // null passthrough + SQL registry name
    val n = spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING)) AS x")
      .head()
    assert(n.isNullAt(0))
  }

  test("hash60 kernel matches the conv(md5) formulation") {
    val docs = Tables.documents(spark, sfDir)
    val mism = docs.select(
      org.apache.spark.sql.graft.TextHashExprs.hash60(col("text")).as("nat"),
      F.hash60(col("text")).as("hof"))
      .filter(col("nat") =!= col("hof")).count()
    assert(mism == 0)
    assert(one(org.apache.spark.sql.graft.TextHashExprs.hash60(lit(""))) ==
      one(F.hash60(lit(""))))
  }

  test("theta sketch: exact under nominal, merge == global, algebra") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.agg(count_distinct(col("l_partkey"))).head.getLong(0)
    val est = li.agg(Ag.distinctCountThetaSketch(col("l_partkey"), 14)
      .cast("long")).head.getLong(0)
    assert(est == exact)
    // union of per-group sketches must equal the one-shot global sketch
    val viaGroups = li.groupBy(col("l_returnflag"))
      .agg(Ag.thetaSketch(col("l_partkey"), 14).as("sk"))
      .agg(Ag.thetaEstimate(Ag.thetaUnionAgg(col("sk"), 14)).cast("long"))
      .head.getLong(0)
    assert(viaGroups == exact)
    // a-not-b + intersection partition the union exactly (exact mode)
    val sk = li.groupBy(col("l_linestatus"))
      .agg(Ag.thetaSketch(col("l_partkey"), 14).as("sk"))
      .orderBy(col("l_linestatus")).collect().map(_.getAs[Array[Byte]]("sk"))
    assert(sk.length == 2)
    val s2 = spark
    import s2.implicits._
    val pair = Seq((sk(0), sk(1))).toDF("a", "b")
    val Array(u, i, d1, d2) = pair.select(
      theta_sketch_estimate(theta_union(col("a"), col("b"))).cast("long"),
      theta_sketch_estimate(theta_intersection(col("a"), col("b")))
        .cast("long"),
      theta_sketch_estimate(theta_difference(col("a"), col("b"))).cast("long"),
      theta_sketch_estimate(theta_difference(col("b"), col("a"))).cast("long"))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(u == i + d1 + d2)
  }

  test("KLL raw percentile sketch: rank-error bound and merge == one-shot") {
    import graft.functions.KllSketch
    val li = Tables.lineitem(spark, sfDir)
    val sk = li.agg(KllSketch.percentileRawAgg(col("l_extendedprice"))
      .as("sk"))
    val Array(est, n) = sk.select(
      KllSketch.kllQuantile(col("sk"), lit(0.5)),
      KllSketch.kllN(col("sk"))).head.toSeq.map(_.toString.toDouble).toArray
    assert(n == li.count())
    // the estimate's RANK must be within the k=200 bound (~1.65%) of 0.5
    val rank = li.filter(col("l_extendedprice") <= est).count().toDouble /
      li.count()
    assert(math.abs(rank - 0.5) < 0.03, s"rank $rank too far from 0.5")
    // merging per-group sketches must see every item the one-shot saw
    val merged = li.groupBy(col("l_returnflag"))
      .agg(KllSketch.percentileRawAgg(col("l_extendedprice")).as("sk"))
      .agg(sum(KllSketch.kllN(col("sk")))).head.getLong(0)
    assert(merged == li.count())
    // native TypedImperativeAggregate and portable Aggregator agree on N
    val nPortable = li.agg(KllSketch.kllN(
      KllSketch.percentileRawAggPortable(col("l_extendedprice"))))
      .head.getLong(0)
    assert(nPortable == li.count())
  }

  test("KLL quantile of an all-null group (serialized EMPTY sketch) is NaN") {
    import graft.functions.KllSketch
    val s = spark
    import s.implicits._
    val df = Seq(("g", null: java.lang.Double), ("g", null: java.lang.Double))
      .toDF("k", "v")
    val row = df.groupBy(col("k"))
      .agg(KllSketch.percentileRawAgg(col("v")).as("sk"))
      .select(KllSketch.kllQuantile(col("sk"), lit(0.5)).as("q"),
        KllSketch.kllN(col("sk")).as("n")).head
    assert(row.getAs[Double]("q").isNaN)
    assert(row.getAs[Long]("n") == 0L)
  }

  test("powerSumsScaled raises instead of silently wrapping past |x|=551") {
    import graft.functions.{Aggregates => Ag}
    val s = spark
    import s.implicits._
    val ok = Seq(550.0, -550.0, 1.25).toDF("x")
      .agg(Ag.powerSumsScaled(col("x")).head.as("s1")).head.getDouble(0)
    assert(math.abs(ok - 1.25) < 1e-9)
    val bad = Seq(10000.0).toDF("x")
    val ex = intercept[Exception] {
      bad.agg(Ag.powerSumsScaled(col("x")).last).collect()
    }
    assert(ex.getMessage.contains("powerSumsScaled") ||
      Option(ex.getCause).exists(_.getMessage.contains("powerSumsScaled")))
  }

  test("dateTimeConvert spec strings: EPOCH/TIMESTAMP/SDF × granularity") {
    import graft.functions.{Scalars => Sc}
    val s = spark
    import s.implicits._
    // 2024-03-15 10:47:23 UTC = 1710499643
    val df = Seq(1710499643L).toDF("es")
      .withColumn("ts", timestamp_seconds(col("es")))
      .withColumn("str", lit("2024-03-15 10:47:23"))
    val r = df.select(
      Sc.dateTimeConvert(col("es"), "1:SECONDS:EPOCH",
        "1:MINUTES:EPOCH", "15:MINUTES").as("a"),
      Sc.dateTimeConvert(col("ts"), "TIMESTAMP",
        "1:MILLISECONDS:EPOCH", "1:HOURS").as("b"),
      Sc.dateTimeConvert(col("str"),
        "1:SECONDS:SIMPLE_DATE_FORMAT:yyyy-MM-dd HH:mm:ss",
        "1:DAYS:SIMPLE_DATE_FORMAT:yyyy/MM/dd", "1:DAYS").as("c"),
      Sc.dateTimeConvert(col("es"), "1:SECONDS:EPOCH",
        "TIMESTAMP", "1:MINUTES").as("d")).head()
    assert(r.getAs[Long]("a") == 1710499643L / 60 / 15 * 15) // 15-min bucket
    assert(r.getAs[Long]("b") == 1710499643L / 3600 * 3600 * 1000L)
    assert(r.getAs[String]("c") == "2024/03/15")
    assert(r.getAs[java.sql.Timestamp]("d").getTime ==
      1710499643L / 60 * 60 * 1000L)
    intercept[IllegalArgumentException](
      Sc.dateTimeConvert(col("es"), "1:FORTNIGHTS:EPOCH", "TIMESTAMP",
        "1:DAYS"))
  }

  test("jsonMatch: nested paths, [*] array predicates, null checks") {
    import graft.functions.Scalars
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, """{"a":{"b":"x"},"arr":[{"k":"u","n":1},{"k":"v","n":7}]}"""),
      (2L, """{"a":{"b":"y"},"arr":[{"k":"v","n":2}]}"""), // single element
      (3L, """{"a":{"b":"x"},"arr":[]}"""),
      (4L, """{"a":{}}""")).toDF("id", "j")
    def ids(pred: String): Set[Long] =
      docs.filter(Scalars.jsonMatch(col("j"), pred))
        .collect().map(_.getLong(0)).toSet
    assert(ids(""""$.a.b" = 'x'""") == Set(1L, 3L))       // nested scalar
    assert(ids(""""$.arr[*].k" = 'v'""") == Set(1L, 2L))  // any-element =
    assert(ids(""""$.arr[*].k" = 'u'""") == Set(1L))      // multi-elem only
    assert(ids(""""$.arr[*].n" > 3""") == Set(1L))        // numeric range
    assert(ids(""""$.arr[*].n" >= 2""") == Set(1L, 2L))   // single-elem num
    assert(ids(""""$.arr[*].n" != 1""") == Set(1L, 2L))   // any-element !=
    assert(ids(""""$.a.b" IS NULL""") == Set(4L))
    assert(ids(""""$.arr[*].k" IS NOT NULL""") == Set(1L, 2L))
    intercept[IllegalArgumentException](
      Scalars.jsonMatch(col("j"), "not a predicate"))
  }

  test("membership + frequency sketches: bloom filter and count-min") {
    // BloomFilterIdSet role (reference query/utils/idset/BloomFilterIdSet):
    // a compact membership sketch shippable as a broadcast filter literal
    val orders = Tables.orders(spark, sfDir)
    val bloom = orders.stat.bloomFilter("o_custkey", 2000, 0.01)
    val keys = orders.select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0))
    assert(keys.forall(bloom.mightContain)) // no false negatives, ever
    val fp = (1L to 100000L).count(k =>
      !keys.contains(k) && bloom.mightContain(k))
    assert(fp < 5000, s"false-positive rate out of spec: $fp / 100000")

    // FrequentLongsSketch role: count-min overestimates but never
    // underestimates item frequency
    val cms = Tables.lineitem(spark, sfDir)
      .agg(count_min_sketch(col("l_suppkey"), lit(0.01), lit(0.99), lit(42))
        .as("s")).head.getAs[Array[Byte]]("s")
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(cms))
    val truth = Tables.lineitem(spark, sfDir).groupBy(col("l_suppkey"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      assert(sketch.estimateCount(k) >= n)
    }
  }

  test("native VecDotProduct matches HOF dot bit-for-bit on real embeddings") {
    val e = Tables.embeddings(spark, sfDir)
    val diffs = e.select(
      (Vectors.dot(col("embedding"), col("embedding")) -
        Vectors.dotHof(col("embedding"), col("embedding"))).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diffs == 0)
  }

  test("vector cosine / dot / l2") {
    val a = array(lit(1f), lit(0f))
    val b = array(lit(0f), lit(1f))
    assert(one(Vectors.dot(a, a)) == 1.0)
    assert(one(Vectors.cosine(a, b)) == 0.0)
    assert(one(Vectors.l2Distance(a, b)) == math.sqrt(2))
    assert(one(Vectors.signBucket(array(lit(1f), lit(-1f), lit(1f)), 3)) == 5)
  }

  test("momentStats matches Spark native var/skew/kurt within 1e-9") {
    val l = Tables.lineitem(spark, sfDir)
    val sums = l.agg(
      count(lit(1)).cast("double").as("n"),
      Ag.powerSums(col("l_quantity")).zipWithIndex
        .map { case (c, i) => c.cast("double").as(s"s${i + 1}") }: _*)
    val stats = sums.select(Ag.momentStats(col("n"), col("s1"), col("s2"),
      col("s3"), col("s4")): _*).head()
    val native = l.agg(var_pop(col("l_quantity")), var_samp(col("l_quantity")),
      stddev_pop(col("l_quantity")), stddev_samp(col("l_quantity")),
      skewness(col("l_quantity")), kurtosis(col("l_quantity"))).head()
    (0 until 6).foreach { i =>
      assert(math.abs(stats.getDouble(i) - native.getDouble(i)) < 1e-9,
        s"stat $i: ${stats.getDouble(i)} vs ${native.getDouble(i)}")
    }
  }

  test("histogram buckets partition all rows") {
    val l = Tables.lineitem(spark, sfDir)
    val total = l.count()
    val hist = l.agg(Ag.histogram(col("l_quantity"), 0, 50, 10).as("h"))
      .head().getSeq[Long](0)
    assert(hist.length == 10)
    assert(hist.sum == total)
  }

  test("SortedLongIntersectSize matches size(array_intersect) on sorted input") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { _ =>
      val a = (1 to rnd.nextInt(30)).map(_ => rnd.nextInt(40).toLong)
        .distinct.sorted.toArray
      val b = (1 to rnd.nextInt(30)).map(_ => rnd.nextInt(40).toLong)
        .distinct.sorted.toArray
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val diffs = df.select(
      (org.apache.spark.sql.graft.SortedLongIntersectSize
        .column(col("a"), col("b")) -
        size(array_intersect(col("a"), col("b")))).as("d"))
      .filter(col("d") =!= 0).count()
    assert(diffs == 0)
  }

  test("IdSetSketch: serialization round-trip, set algebra, membership") {
    import graft.functions.IdSetSketch
    val ids = Array(-5L, 0L, 3L, 1000000007L)
    assert(IdSetSketch.deserialize(IdSetSketch.serialize(ids)).toSeq ==
      ids.toSeq)
    val s = spark
    import s.implicits._
    val df = Seq(1L, 2L, 3L, 2L).toDF("id")
    val sk = df.agg(IdSetSketch.idSetAgg(col("id")).as("s"))
    val r = sk.select(IdSetSketch.cardinality(col("s")).as("n"),
      IdSetSketch.inIdSet(lit(2L), col("s")).as("has2"),
      IdSetSketch.inIdSet(lit(9L), col("s")).as("has9")).head()
    assert(r.getInt(0) == 3 && r.getBoolean(1) && !r.getBoolean(2))
  }

  test("fourthMoment Aggregator matches exact decimal moments") {
    val l = Tables.lineitem(spark, sfDir)
    val streamed = l.agg(graft.functions.Moments
      .fourthMomentAgg(col("l_quantity"))).head().getDouble(0)
    val sums = l.agg(
      count(lit(1)).cast("double").as("n"),
      Ag.powerSums(col("l_quantity")).zipWithIndex
        .map { case (c, i) => c.cast("double").as(s"s${i + 1}") }: _*).head()
    val (n, s1, s2, s3, s4) = (sums.getDouble(0), sums.getDouble(1),
      sums.getDouble(2), sums.getDouble(3), sums.getDouble(4))
    val mean = s1 / n
    val m4 = s4 / n - 4 * mean * (s3 / n) + 6 * mean * mean * (s2 / n) -
      3 * math.pow(mean, 4)
    assert(math.abs(streamed - m4) / m4 < 1e-9)
  }

  test("hll sketch: estimate near exact, partition-merge associative") {
    val l = Tables.lineitem(spark, sfDir)
    val exact = l.select(count_distinct(col("l_partkey"))).head().getLong(0)
    val est = l.agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))))
      .head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.1)
    // mergeability: union of per-group sketches ≈ global sketch
    val merged = l.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.1)
  }

  test("approx_count_distinct within 5% rsd bound of exact") {
    val l = Tables.lineitem(spark, sfDir)
    val r = l.agg(count_distinct(col("l_partkey")).as("exact"),
      Ag.distinctCountHLL(col("l_partkey"), 0.05).as("est")).head()
    val exact = r.getLong(0).toDouble
    assert(math.abs(r.getLong(1) - exact) / exact < 0.15)
  }

  test("regexpExtract: group capture with Pinot no-match default; mapValue") {
    val s = spark
    import s.implicits._
    val df = Seq(("order-123-x", Map("a" -> 1, "b" -> 2)),
      ("no digits here", Map.empty[String, Int])).toDF("s", "m")
    val out = df.select(
      graft.functions.Scalars.regexpExtract(
        col("s"), "order-(\\d+)", 1, "none").as("g1"),
      graft.functions.Scalars.mapValue(col("m"), lit("a")).as("va"),
      graft.functions.Scalars.mapValue(col("m"), lit("z")).as("vz"))
      .collect()
    assert(out(0).getString(0) == "123" && out(1).getString(0) == "none")
    assert(out(0).getInt(1) == 1 && out(0).isNullAt(2))
    // SQL names through the session registry (dialect surface)
    df.createOrReplaceTempView("rx_t")
    val sql = s.sql("""SELECT REGEXPEXTRACT(s, 'order-(\\d+)', 1, 'none')
        AS g1, MAPVALUE(m, 'a') AS va FROM rx_t""").collect()
    assert(sql(0).getString(0) == "123" && sql(1).getString(0) == "none")
    assert(sql(0).getInt(1) == 1)
  }

  test("segmentPartitionedDistinctCount equals global distinct on " +
      "column-partitioned input") {
    val o = Tables.orders(spark, sfDir)
    val exact = o.select(count_distinct(col("o_custkey"))).head().getLong(0)
    val part = Ag.segmentPartitionedDistinctCount(
      o.repartition(8, col("o_custkey")), "o_custkey").head().getLong(0)
    assert(part == exact)
  }

  test("gopherSignals: hand-computed rules and the conjunct pass bit") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the cat... and # dog\n- bullet\n* b2\nend…"),
      (2L, "the quick brown fox jumps over the lazy dog and that " +
        "is fine to be with have of")).toDF("doc_id", "text")
    val r = df.select(col("doc_id"), TA.gopherSignals(col("text")).as("g"))
      .orderBy("doc_id").collect()
    val g1 = r(0).getStruct(1)
    // 10 tokens; symbols # + ... + … = 3 → 0.3; 4 lines, 2 bullets,
    // 1 ellipsis end; 7/10 alpha words (the cat... and dog bullet b2
    // end…); stopwords {the, and}
    assert(g1.getAs[Double]("symbol_ratio") == 0.3)
    assert(g1.getAs[Double]("bullet_frac") == 0.5)
    assert(g1.getAs[Double]("ellipsis_frac") == 0.25)
    assert(g1.getAs[Double]("alpha_frac") == 0.7)
    assert(g1.getAs[Int]("stop_hits") == 2)
    assert(!g1.getAs[Boolean]("gopher_pass"), "symbol ratio 0.3 > 0.1")
    val g2 = r(1).getStruct(1)
    assert(g2.getAs[Double]("symbol_ratio") == 0.0)
    assert(g2.getAs[Double]("alpha_frac") == 1.0)
    assert(g2.getAs[Int]("stop_hits") == 8)
    assert(g2.getAs[Boolean]("gopher_pass"))
  }

  test("codeSignals: hand-computed file — line metrics, comment/blank " +
      "fractions, threshold conjunct; minified one-liner fails") {
    val file = "x = 1\n# a comment\n\n  // indented comment\nyy zz ww"
    val r = one(TA.codeSignals(lit(file)))
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(r.getAs[Int]("max_line_len") == 21) // "  // indented comment"
    // lens: 5, 11, 0, 21, 8 → 45/5 = 9.0
    assert(r.getAs[Double]("mean_line_len") == 9.0)
    assert(r.getAs[Double]("comment_frac") == 0.4) // 2 of 5
    assert(r.getAs[Double]("blank_frac") == 0.2)   // 1 of 5
    assert(r.getAs[Boolean]("code_pass"))
    val minified = "a" * 1200 // one 1200-char line
    val m = one(TA.codeSignals(lit(minified)))
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(m.getAs[Int]("max_line_len") == 1200 &&
      !m.getAs[Boolean]("code_pass"))
    val blob = ("@@ " * 40).trim // low alnum fraction
    val b = one(TA.codeSignals(lit(blob)))
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(b.getAs[Double]("alnum_frac") < 0.25 &&
      !b.getAs[Boolean]("code_pass"))
  }

  test("codeSignals kernel ≡ Column chain on adversarial texts and the " +
      "corpus (one-scan native vs the regex/HOF oracle reference)") {
    val s = spark
    import s.implicits._
    val crafted = Seq(
      "", "\n", "\n\n", "x", "x\n", "#c", " \t #c", "//x", "/x", "-",
      "--", " --x\n-\n", "a\r\nb", "\r", "  \t ", "é multi ⽕ 字\n#é",
      "code // not a comment start\n  //but this is",
      "a" * 1200, ("@@ " * 40).trim,
      "x = 1\n# a comment\n\n  // indented comment\nyy zz ww",
      "ln1\n\tln2 with\ttabs\n   \n--sql comment\n#py\nend")
    val docs = Tables.documents(s, sfDir).select(col("text"))
      .collect().map(_.getString(0)).toSeq
    (crafted ++ docs).zipWithIndex.toDF("t", "i").select(
        TA.codeSignals(col("t")).as("k"),
        TA.codeSignalsChain(col("t")).as("c"), col("i"))
      .collect().foreach { r =>
        assert(r.get(0) == r.get(1),
          s"kernel/chain drift on input ${r.getInt(2)}: " +
            s"${r.get(0)} vs ${r.get(1)}")
      }
  }

  test("scriptProfile: per-script char fractions and dominant label " +
      "with fixed tie-break; whitespace excluded from the base") {
    def prof(s: String): org.apache.spark.sql.Row =
      one(TA.scriptProfile(lit(s))).asInstanceOf[org.apache.spark.sql.Row]
    val latin = prof("hello world")
    assert(latin.getAs[Double]("latin_frac") == 1.0 &&
      latin.getAs[String]("script") == "latin")
    val cyr = prof("привет мир")
    assert(cyr.getAs[Double]("cyrillic_frac") == 1.0 &&
      cyr.getAs[String]("script") == "cyrillic")
    val cjk = prof("日本語 です")
    assert(cjk.getAs[Double]("cjk_frac") == 1.0 &&
      cjk.getAs[String]("script") == "cjk")
    // mixed: "ab 12" → 2 latin, 2 digit of 4 non-ws; tie → latin wins
    val mixed = prof("ab 12")
    assert(mixed.getAs[Double]("latin_frac") == 0.5 &&
      mixed.getAs[Double]("digit_frac") == 0.5 &&
      mixed.getAs[String]("script") == "latin")
    val punct = prof("!!! ???")
    assert(punct.getAs[Double]("other_frac") == 1.0 &&
      punct.getAs[String]("script") == "other")
  }

  test("fixEncoding: repairs latin-1 and cp1252 mojibake, heals double " +
      "mojibake, never touches clean text (fixpoint cannot overshoot)") {
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    def fix(s: String): String =
      one(TA.fixEncoding(lit(s))).asInstanceOf[String]
    def latin1Moji(s: String): String =
      new String(s.getBytes(UTF_8), ISO_8859_1)
    def cp1252Moji(s: String): String = {
      // sloppy-windows-1252 decode (what broken pipelines actually do):
      // the five bytes cp1252 leaves undefined fall back to C1 controls
      // instead of Java's information-destroying U+FFFD
      val sb = new StringBuilder
      s.getBytes(UTF_8).foreach { b =>
        val c = new String(Array(b), "windows-1252").charAt(0)
        sb.append(if (c == '�') (b & 0xff).toChar else c)
      }
      sb.toString
    }
    val cleans = Seq("plain ascii only", "café — naïve ½",
      "“smart” quotes™ €9", "русский текст", "日本語と中文",
      "emoji 🙂 stays", "lone ¢ sign", "Paweł Ângela")
    cleans.foreach { s =>
      // clean text is a fixpoint: never altered
      assert(fix(s) == s, s"clean altered: $s")
      if (s.exists(_ >= 0x80) && !s.exists(_ >= 0x2E80) &&
          !s.exists(Character.isSurrogate)) {
        // both mis-decode flavors repair back to the true text
        assert(fix(latin1Moji(s)) == s, s"latin1 repair failed: $s")
        assert(fix(cp1252Moji(s)) == s, s"cp1252 repair failed: $s")
        // double mojibake heals through the fixpoint loop
        assert(fix(latin1Moji(latin1Moji(s))) == s,
          s"double repair failed: $s")
      }
    }
    // the classic single-word case, spelled out
    assert(fix("cafÃ©") == "café")
    // CJK/emoji mojibake repairs too (bytes are high, all cp1252-mapped)
    assert(fix(latin1Moji("日本語")) == "日本語")
    // a string with chars outside the cp1252 image is never touched
    assert(fix("valid № here") == "valid № here")
    // null-safety through the expression
    val s2 = spark
    import s2.implicits._
    val r = Seq((1L, "cafÃ©"), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(TA.fixEncoding(col("t")).as("f")).orderBy(col("f"))
      .collect()
    assert(r.map(x => Option(x.getString(0))).toSeq ==
      Seq(None, Some("café")))
  }
  test("fleschEase: hand-computed score, sentence and syllable floors") {
    val s2 = spark
    import s2.implicits._
    def f(t: String): Double =
      Seq(t).toDF("t").select(TA.fleschEase(col("t")).as("f"))
        .collect()(0).getDouble(0)
    // "The cat sat." -> 3 words, 1 sentence, 3 vowel groups:
    // 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(f("The cat sat.") == 119.19)
    // no terminal punctuation -> sentence floor of 1, same score
    assert(f("The cat sat") == 119.19)
    // "see saw!! see?" -> 3 words; [.!?]+ runs = 2 ("!!", "?");
    // vowel groups: ee, aw? a(w) -> see=1, saw=1, see=1 = 3
    // 206.835 - 1.015*1.5 - 84.6*1 = 120.7125 -> 120.7125
    assert(f("see saw!! see?") == 120.7125)
    // vowel-less text -> syllable floor 1:
    // 1 word, 1 sentence: 206.835 - 1.015 - 84.6 = 121.22
    assert(f("pfft") == 121.22)
  }
}
