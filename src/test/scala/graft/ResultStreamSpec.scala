package graft

import graft.operators.ResultStream
import graft.operators.ResultStream.{Block, DataBlock, MetadataBlock}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

class ResultStreamSpec extends SparkSpec {

  test("block stream round-trips a selection and the trailer is honest") {
    val sel = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") >= 40)
      .select(col("l_orderkey"), col("l_quantity"))
    val expected = sel.count()
    val blocks = ResultStream.blocks(sel, blockRows = 100).toVector
    val data = blocks.collect { case d: DataBlock => d }
    val meta = blocks.collect { case m: MetadataBlock => m }
    assert(meta.size == 1 && blocks.last.isInstanceOf[MetadataBlock])
    assert(data.forall(_.rows.size <= 100))
    assert(data.map(_.id) == data.indices.map(_.toLong))
    assert(meta.head.numRows == expected)
    assert(meta.head.numBlocks == data.size)
    val back = ResultStream.reassemble(spark, sel.schema, blocks.iterator)
    assert(back.count() == expected)
    assert(back.except(sel).isEmpty && sel.except(back).isEmpty)
  }

  test("first page is lazy: only leading partitions evaluate") {
    // Partition 3 throws on evaluation; fetching ONE page must succeed
    // (only partition 0 runs), while exhausting the stream must fail —
    // a deterministic proof that blocks() streams partition-at-a-time
    // rather than collecting the query up front.
    val rdd = spark.sparkContext
      .parallelize(0L until 400L, 4)
      .mapPartitionsWithIndex { (i, it) =>
        if (i == 3) sys.error("partition 3 must not evaluate for page 1")
        it.map(Row(_))
      }
    val schema = StructType(Seq(StructField("v", LongType)))
    val df = spark.createDataFrame(rdd, schema)

    val one = ResultStream.blocks(df, blockRows = 50).next()
    assert(one.asInstanceOf[DataBlock].rows.map(_.getLong(0)) ==
      (0L until 50L).toVector)

    intercept[Exception] {
      ResultStream.blocks(df, blockRows = 50).foreach(_ => ())
    }
  }

  test("empty result yields a bare trailer and reassembles empty") {
    val none = Tables.lineitem(spark, sfDir).filter(col("l_quantity") < 0)
    val blocks = ResultStream.blocks(none, blockRows = 10).toVector
    assert(blocks == Vector(MetadataBlock(0, 0)))
    assert(ResultStream.reassemble(spark, none.schema, blocks.iterator)
      .isEmpty)
  }

  test("reassemble rejects a corrupted stream") {
    val sel = Tables.region(spark, sfDir).select(col("r_regionkey"))
    val blocks = ResultStream.blocks(sel, blockRows = 2).toVector
    val noTrailer = blocks.collect { case d: DataBlock => (d: Block) }
    intercept[RuntimeException] {
      ResultStream.reassemble(spark, sel.schema, noTrailer.iterator)
    }
    val gapped = blocks.map {
      case DataBlock(id, rows) => DataBlock(id + 1, rows): Block
      case m => m
    }
    intercept[IllegalArgumentException] {
      ResultStream.reassemble(spark, sel.schema, gapped.iterator)
    }
  }
}
