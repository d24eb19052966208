package graft

import graft.operators.StarTree
import graft.rules.{JsonIndexCatalog, StarTreeCatalog, TextIndexCatalog}
import graft.sources.IndexedTable
import graft.sources.IndexedTable.{Config, JsonIdx, StarIdx, TextIdx}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

class IndexedTableSpec extends SparkSpec with BeforeAndAfterEach {

  override def afterEach(): Unit = {
    TextIndexCatalog.clear(); JsonIndexCatalog.clear()
    StarTreeCatalog.clear(); IndexedTable.reset()
  }

  private def freshTable(): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ixtbl").toString
    Seq(
      (1L, "hash join scan", """{"pri":"HIGH"}""", "a", 10.0),
      (2L, "merge join stream", """{"pri":"LOW"}""", "a", 20.0),
      (3L, "hash stream fast", """{"pri":"HIGH"}""", "b", 30.0),
      (4L, "slow scan only", """{"pri":"LOW"}""", "b", 40.0),
      (5L, "join hash order", """{"pri":"HIGH"}""", "a", 50.0))
      .toDF("doc_id", "text", "doc", "k", "v")
      .write.mode("overwrite").parquet(s"$dir/t")
    IndexedTable.writeConfig(spark, s"$dir/t/_graft", Config(
      text = Seq(TextIdx("text", "doc_id")),
      json = Seq(JsonIdx("doc", "doc_id", "pri string")),
      star = Seq(StarIdx(Seq("k"), Seq(StarTree.Metric("v", Seq("sum")))))))
    s"$dir/t"
  }

  test("config round-trips through the sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ixcfg").toString
    val cfg = Config(
      text = Seq(TextIdx("text", "doc_id")),
      json = Seq(JsonIdx("doc", "id", "pri string, n double")),
      star = Seq(StarIdx(Seq("a", "b"),
        Seq(StarTree.Metric("x", Seq("sum", "min"))))))
    IndexedTable.writeConfig(spark, dir, cfg)
    assert(IndexedTable.readConfig(spark, dir).contains(cfg))
    assert(IndexedTable.readConfig(spark, dir + "/nope").isEmpty)
  }

  test("open builds declared indexes once, registers all catalogs") {
    val dataDir = freshTable()
    val df = IndexedTable.open(spark, dataDir)
    // all three catalogs populated from the config
    assert(TextIndexCatalog.all.size == 1)
    assert(JsonIndexCatalog.all.size == 1)
    assert(StarTreeCatalog.all.size == 1)
    // index artifacts persisted under the underscore root (invisible to
    // the parquet listing: the table still reads its 5 rows)
    assert(new java.io.File(s"$dataDir/_graft/text_text").exists())
    assert(new java.io.File(s"$dataDir/_graft/json_doc").exists())
    assert(new java.io.File(s"$dataDir/_graft/startree_0").exists())
    assert(df.count() == 5)

    // SQL queries route with no per-query wiring
    df.createOrReplaceTempView("ix_t")
    val tm = spark.sql(
      "SELECT doc_id FROM ix_t WHERE text_match(text, 'hash AND stream')")
    assert(tm.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(tm.collect().map(_.getLong(0)).toSet == Set(3L))
    val jm = spark.sql(
      """SELECT doc_id FROM ix_t WHERE json_match(doc, '"$.pri" = ''HIGH''')""")
    assert(jm.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(jm.collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L))
    // fitting aggregate routes to the star-tree summary, not the facts
    val agg = df.groupBy(col("k")).agg(sum(col("v")).as("s"))
    val scans = agg.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.exists(_.contains("startree_0")),
      s"aggregate must scan the summary, scanned: $scans")
    assert(agg.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap ==
      Map("a" -> 80.0, "b" -> 70.0))
  }

  test("reopen loads from disk and does not stack catalog entries") {
    val dataDir = freshTable()
    IndexedTable.open(spark, dataDir)
    val textIdxFile = new java.io.File(s"$dataDir/_graft/text_text")
    val stamp = textIdxFile.lastModified()
    val df2 = IndexedTable.open(spark, dataDir)
    assert(TextIndexCatalog.all.size == 1, "no duplicate registrations")
    assert(JsonIndexCatalog.all.size == 1)
    assert(StarTreeCatalog.all.size == 1)
    assert(textIdxFile.lastModified() == stamp, "index not rebuilt")
    assert(df2.count() == 5)
  }

  test("a rebuilt postings dir rebuilds the vocab alongside — a stale " +
    "dictionary cannot survive a reindex") {
    val s = spark
    import s.implicits._
    val dataDir = freshTable()
    IndexedTable.open(s, dataDir)
    val pDir = s"$dataDir/_graft/text_text"
    val vDir = s"$dataDir/_graft/text_text_vocab"
    // simulate a forced reindex (postings dropped, e.g. after the table
    // data changed) where a stale dictionary survives on disk
    graft.sources.IncrementalIndex.rmTree(pDir)
    Seq("stale").toDF("token").coalesce(1)
      .write.mode("overwrite").parquet(vDir)
    IndexedTable.reset()
    TextIndexCatalog.clear(); JsonIndexCatalog.clear(); StarTreeCatalog.clear()
    IndexedTable.open(s, dataDir)
    val vocab = s.read.parquet(vDir).collect().map(_.getString(0)).toSet
    // without the rebuild coupling the vocab would still read {stale} and
    // dictionary-shaped probes for real tokens would silently return empty
    assert(vocab.contains("hash") && !vocab.contains("stale"), vocab)
  }

  test("open without a config is a plain parquet read") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-noix").toString
    Seq((1L, "x")).toDF("id", "t").write.parquet(s"$dir/t")
    val df = IndexedTable.open(spark, s"$dir/t")
    assert(df.count() == 1)
    assert(TextIndexCatalog.all.isEmpty && JsonIndexCatalog.all.isEmpty &&
      StarTreeCatalog.all.isEmpty)
  }
}
