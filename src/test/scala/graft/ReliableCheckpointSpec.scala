package graft

import graft.operators.{Checkpoints, Dedup, LinkGraph}
import org.apache.spark.sql.Row

/** `spark.graft.checkpoint.reliable` (round 15, verdict task 4): every
  * iterative operator truncates lineage through [[Checkpoints.eager]]/
  * [[Checkpoints.lazily]], which default to localCheckpoint (single-app
  * trade: executor loss kills the blocks). The conf flips every call
  * site to reliable `checkpoint()` against
  * `spark.graft.checkpoint.dir` — a config, not a code edit. This spec
  * pins (a) both modes produce IDENTICAL results on iterative operators
  * (PageRank, connected components), (b) reliable mode actually writes
  * checkpoint files to the configured dir. */
class ReliableCheckpointSpec extends SparkSpec {

  private def withReliable[T](dir: String)(body: => T): T = {
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    try body
    finally {
      spark.conf.set("spark.graft.checkpoint.reliable", "false")
      Checkpoints.sweep()
    }
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.toString)

  test("eager/lazily produce identical frames under either mode") {
    val s = spark; import s.implicits._
    val src = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    // collect the local-mode rows BEFORE entering reliable mode: the
    // mode helper sweeps on exit, and a swept localCheckpoint frame is
    // unusable by design (lineage truncated, blocks freed)
    val local = sortedRows(Checkpoints.eager(src.filter($"id" % 3 === 0)))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt_spec").toString
    val reliable = withReliable(dir) {
      val out = Checkpoints.eager(src.filter($"id" % 3 === 0))
      // the frame must be backed by a REAL checkpoint: files land in dir
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty,
        s"reliable mode wrote no checkpoint files under $dir")
      sortedRows(out)
    }
    assert(local == reliable)
    // lazily: checkpoint materializes on first action, same contract
    val lazyFrame = Checkpoints.lazily(src.filter($"id" <= 10))
    assert(lazyFrame.count() == 10)
    val lazyLocal = sortedRows(lazyFrame)
    val lazyReliable = withReliable(dir) {
      val out = Checkpoints.lazily(src.filter($"id" <= 10))
      assert(out.count() == 10)
      sortedRows(out)
    }
    assert(lazyLocal == lazyReliable)
  }

  test("iterative PageRank is bit-identical under either mode") {
    val s = spark; import s.implicits._
    val edges = Seq(
      ("a.io", "b.io", 2L), ("b.io", "c.io", 1L), ("c.io", "a.io", 1L),
      ("a.io", "c.io", 1L), ("d.io", "a.io", 3L), ("c.io", "d.io", 1L)
    ).toDF("src", "dst", "n")
    val localRanks = sortedRows(LinkGraph.pageRank(edges, iters = 3))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt_pr").toString
    val reliableRanks = withReliable(dir) {
      sortedRows(LinkGraph.pageRank(edges, iters = 3))
    }
    assert(localRanks == reliableRanks)
  }

  test("connected components are identical under either mode") {
    val s = spark; import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (12L, 12L), (3L, 4L))
      .toDF("id_a", "id_b")
    val local = sortedRows(Dedup.clusters(pairs))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt_cc").toString
    val reliable = withReliable(dir) { sortedRows(Dedup.clusters(pairs)) }
    assert(local == reliable)
  }
}
