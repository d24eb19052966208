package graft

import graft.operators.{Checkpoints, GraftCache}
import org.apache.spark.sql.functions._

/** Unified cache governance (round-6 fix): one budget across ALL operator
  * caches, deterministic checkpoint-block reclamation between queries. */
class GraftCacheSpec extends SparkSpec {

  test("global budget bounds the SUM across owners, LRU across operators") {
    val prevGlobal = GraftCache.globalCapacity
    try {
      GraftCache.clearAll()
      GraftCache.globalCapacity = 3
      var released = List.empty[String]
      def put(owner: String, key: String): Unit =
        GraftCache.getOrBuild(owner, key)(key) { v =>
          released ::= s"$owner:$v"
        }
      put("a", "k1"); put("a", "k2"); put("b", "k3")
      assert(GraftCache.keys("a").size == 2 && GraftCache.keys("b").size == 1)
      // a fourth entry from a THIRD owner evicts the globally-eldest (a:k1)
      // — per-owner caps alone would have let the sum grow unboundedly
      put("c", "k4")
      assert(released == List("a:k1"))
      assert(GraftCache.keys("a") == Set[AnyRef]("k2"))
      // re-access makes b:k3 recent; next insert evicts a:k2
      GraftCache.getOrBuild("b", "k3")(fail("must hit cache")) { _ => () }
      put("c", "k5")
      assert(released.head == "a:k2")
    } finally {
      GraftCache.globalCapacity = prevGlobal
      GraftCache.clearAll()
    }
  }

  test("per-owner capacity hook still evicts within one owner") {
    val prev = GraftCache.ownerCapacity("towner")
    try {
      GraftCache.clearAll()
      GraftCache.setOwnerCapacity("towner", 1)
      var released = List.empty[String]
      def put(key: String): Unit =
        GraftCache.getOrBuild("towner", key)(key)(v => released ::= v)
      put("k1"); put("k2")
      assert(GraftCache.keys("towner") == Set[AnyRef]("k2"))
      assert(released == List("k1"))
    } finally {
      GraftCache.setOwnerCapacity("towner", prev)
      GraftCache.clearAll()
    }
  }

  test("Checkpoints: eager tracks blocks, sweep frees unpinned only, " +
      "release is immediate") {
    val s = spark
    import s.implicits._
    Checkpoints.sweep() // start from a clean ledger
    val pinnedDf = Checkpoints.eager(
      Seq(1, 2, 3).toDF("x").filter(col("x") > 0))
    Checkpoints.pin(pinnedDf)
    val orphanDf = Checkpoints.eager(Seq(4, 5).toDF("x"))
    val orphanRdd = Checkpoints.rddsOf(orphanDf).head
    val pinnedRdd = Checkpoints.rddsOf(pinnedDf).head
    assert(orphanRdd.getStorageLevel.useMemory ||
      orphanRdd.getStorageLevel.useDisk)
    Checkpoints.sweep()
    // the orphan's blocks are gone, the pinned frame still works
    assert(orphanRdd.getStorageLevel ==
      org.apache.spark.storage.StorageLevel.NONE)
    assert(pinnedRdd.getStorageLevel !=
      org.apache.spark.storage.StorageLevel.NONE)
    assert(pinnedDf.count() == 3)
    Checkpoints.releaseFrame(pinnedDf)
    assert(pinnedRdd.getStorageLevel ==
      org.apache.spark.storage.StorageLevel.NONE)
  }

  test("clusters releases each round's checkpoint blocks as it converges " +
      "(no block accumulation across a long chain)") {
    val s = spark
    import s.implicits._
    operators.Dedup.cacheClear()
    Checkpoints.sweep()
    val before = s.sparkContext.getPersistentRDDs.size
    // a 64-long duplicate chain forces several label-propagation rounds
    val pairs = (0L until 63L).map(i => (i, i + 1))
      .toDF("id_a", "id_b")
    val labels = operators.Dedup.clusters(pairs)
    assert(labels.filter(col("label") === 0L).count() == 64)
    // only the FINAL round's blocks may remain (pinned by the cache
    // entry); a leak would show one checkpoint RDD per round
    val delta = s.sparkContext.getPersistentRDDs.size - before
    assert(delta <= 2,
      s"expected <=2 new persisted RDDs after clusters(), got $delta")
    operators.Dedup.cacheClear()
  }
}
