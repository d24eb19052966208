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
      Checkpoints.sweep() // drain deferred evictions from earlier suites
      GraftCache.globalCapacity = 3
      var released = List.empty[String]
      def put(owner: String, key: String): Unit =
        GraftCache.getOrBuild(owner, key)(key) { v =>
          released ::= s"$owner:$v"
        }
      put("a", "k1"); put("a", "k2"); put("b", "k3")
      assert(GraftCache.keys("a").size == 2 && GraftCache.keys("b").size == 1)
      // a fourth entry from a THIRD owner evicts the globally-eldest (a:k1)
      // — per-owner caps alone would have let the sum grow unboundedly.
      // The release is DEFERRED until the between-queries sweep so a query
      // still holding the evicted frame finishes against valid blocks.
      put("c", "k4")
      assert(released.isEmpty && GraftCache.pendingEvictedCount == 1)
      Checkpoints.sweep()
      assert(released == List("a:k1"))
      assert(GraftCache.keys("a") == Set[AnyRef]("k2"))
      // re-access makes b:k3 recent; next insert evicts a:k2
      GraftCache.getOrBuild("b", "k3")(fail("must hit cache")) { _ => () }
      put("c", "k5")
      Checkpoints.sweep()
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
      Checkpoints.sweep()
      assert(released == List("k1"))
    } finally {
      GraftCache.setOwnerCapacity("towner", prev)
      GraftCache.clearAll()
    }
  }

  test("racing duplicate builds keep the published winner; the loser's " +
      "fresh copy is released, never the winner's") {
    GraftCache.clearAll()
    try {
      val released =
        java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      // both threads miss, both build; whichever publishes second must keep
      // the first thread's entry (its caller may already hold the value)
      // and free only its own unpublished copy
      val got = new java.util.concurrent.ConcurrentHashMap[String, String]()
      val threads = (1 to 2).map { i =>
        new Thread(null, () => {
          val v = GraftCache.getOrBuild("race", "shared") {
            barrier.await(); s"v$i" // both builds in flight simultaneously
          } { v => released.add(v) }
          got.put(s"t$i", v)
        }, s"race-$i")
      }
      threads.foreach(_.start()); threads.foreach(_.join(30000))
      // both callers observe the SAME value (the winner's), and exactly the
      // losing build was released — immediately, since nobody can hold it
      assert(got.get("t1") == got.get("t2"))
      assert(released.size == 1 && !released.contains(got.get("t1")))
      assert(GraftCache.pendingEvictedCount == 0)
    } finally GraftCache.clearAll()
  }

  test("evicted checkpoint-backed frame stays usable until the next sweep") {
    val s = spark
    import s.implicits._
    val prevGlobal = GraftCache.globalCapacity
    try {
      GraftCache.clearAll(); Checkpoints.sweep()
      GraftCache.globalCapacity = 1
      def cachedFrame(key: String) =
        GraftCache.getOrBuild("ckpt", key) {
          val df = Checkpoints.eager(Seq(1, 2, 3).toDF("x"))
          Checkpoints.pin(df)
          df
        }(Checkpoints.releaseFrame)
      val first = cachedFrame("k1")
      val firstRdd = Checkpoints.rddsOf(first).head
      cachedFrame("k2") // evicts k1 under capacity pressure
      // mid-query, the evicted frame's blocks MUST still be there: a
      // checkpointed RDD cannot recompute, so an immediate release would
      // permanently break a caller still holding `first`
      assert(firstRdd.getStorageLevel !=
        org.apache.spark.storage.StorageLevel.NONE)
      assert(first.count() == 3)
      Checkpoints.sweep() // between queries: now reclamation happens
      assert(firstRdd.getStorageLevel ==
        org.apache.spark.storage.StorageLevel.NONE)
    } finally {
      GraftCache.globalCapacity = prevGlobal
      GraftCache.clearAll(); Checkpoints.sweep()
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
