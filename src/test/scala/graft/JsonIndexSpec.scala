package graft

import graft.functions.Scalars
import graft.operators.JsonIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class JsonIndexSpec extends SparkSpec {

  private val schema = StructType.fromDDL(
    "meta struct<pri:string>, tags array<struct<p:string,n:double>>, " +
      "note string")

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, """{"meta":{"pri":"HIGH"},"tags":[{"p":"F","n":4},{"p":"X","n":2}],"note":"a"}"""),
      (2L, """{"meta":{"pri":"LOW"},"tags":[{"p":"O","n":1}]}"""),
      (3L, """{"tags":[]}"""),
      (4L, """{"meta":{"pri":"HIGH"},"tags":[{"p":"F","n":9}],"note":"b"}"""),
      (5L, """not json at all""")).toDF("id", "doc")
  }

  test("postings: full-document flatten, [*] paths, num twin") {
    val idx = JsonIndex.postings(docs, "doc", "id", schema)
    val rows = idx.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // doc 1 flattens to one posting per present leaf
    assert(rows.contains((1L, "$.meta.pri", "HIGH")))
    assert(rows.contains((1L, "$.tags[*].p", "F")))
    assert(rows.contains((1L, "$.tags[*].p", "X")))
    assert(rows.contains((1L, "$.tags[*].n", "4.0")))
    assert(rows.contains((1L, "$.note", "a")))
    // empty array / absent fields post nothing; malformed docs post nothing
    assert(!rows.exists(_._1 == 3L))
    assert(!rows.exists(_._1 == 5L))
    // num twin is the double view, null for non-numeric values
    val nums = idx.filter(col("path") === "$.tags[*].n" && col("id") === 1L)
      .select("num").collect().map(_.getDouble(0)).toSet
    assert(nums == Set(4.0, 2.0))
    assert(idx.filter(col("path") === "$.note" && col("num").isNotNull)
      .count() == 0)
  }

  test("matchIds: parity with per-row jsonMatch across every operator") {
    val idx = JsonIndex.postings(docs, "doc", "id", schema)
    val universe = docs.select(col("id")).distinct()
    val preds = Seq(
      """"$.tags[*].p" = 'F'""",
      """"$.tags[*].p" != 'F'""",
      """"$.tags[*].n" > 3""",
      """"$.tags[*].n" >= 4""",
      """"$.tags[*].n" < 2""",
      """"$.tags[*].n" <= 1""",
      """"$.meta.pri" = 'HIGH'""",
      """"$.meta.pri" != 'LOW'""",
      """"$.note" IS NOT NULL""",
      """"$.note" IS NULL""")
    for (p <- preds) {
      val viaIndex = JsonIndex.matchIds(idx, universe, "id", p)
        .collect().map(_.getLong(0)).toSet
      val viaRow = docs.filter(Scalars.jsonMatch(col("doc"), p))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(viaIndex == viaRow, s"index vs per-row disagree on: $p")
    }
  }

  test("flags: one-pass compound predicate equals composed matchIds") {
    val idx = JsonIndex.postings(docs, "doc", "id", schema)
    val f = JsonIndex.flags(idx, "id", Seq(
      """"$.tags[*].p" = 'F'""", """"$.tags[*].n" > 3"""))
    val both = f.filter(col("p0") && col("p1"))
      .collect().map(_.getLong(0)).toSet
    assert(both == Set(1L, 4L))
    // exactly one shuffle: a single partial+final aggregate pair
    val plan = f.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("CartesianProduct"))
    intercept[IllegalArgumentException](
      JsonIndex.flags(idx, "id", Seq(""""$.note" IS NULL""")))
  }

  test("cachedPostings: build-once reuse, LRU eviction unpersists") {
    val prev = JsonIndex.cacheCapacity
    try {
      JsonIndex.cacheCapacity = 1
      JsonIndex.cacheClear()
      val a = JsonIndex.cachedPostings(docs, "doc", "id", schema, Some("k1"))
      val again = JsonIndex.cachedPostings(docs, "doc", "id", schema, Some("k1"))
      assert(a eq again, "same snapshot key must reuse the built index")
      assert(a.storageLevel.useMemory, "built index is persisted")
      JsonIndex.cachedPostings(docs, "doc", "id", schema, Some("k2"))
      assert(JsonIndex.cacheKeys.map(_._2) == Set("k2"), "LRU evicts k1")
      // eviction defers the release to the next between-queries sweep so
      // a query still holding the evicted frame finishes safely
      assert(a.storageLevel.useMemory, "evicted index valid until sweep")
      graft.operators.Checkpoints.sweep()
      assert(!a.storageLevel.useMemory, "swept index is unpersisted")
    } finally {
      JsonIndex.cacheCapacity = prev
      JsonIndex.cacheClear()
    }
  }

  test("materialize: path-partitioned layout prunes to one directory") {
    val dir = java.nio.file.Files.createTempDirectory("jsonidx").toString
    val idx = JsonIndex.postings(docs, "doc", "id", schema)
    JsonIndex.materialize(idx, dir)
    val disk = spark.read.parquet(dir)
    val pruned = disk.filter(col("path") === "$.meta.pri")
    // partition filter prunes: only the one path directory is read
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"))
    val got = pruned.select("id", "value").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "HIGH"), (2L, "LOW"), (4L, "HIGH")))
  }
}
