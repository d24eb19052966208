package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpus expansion for scale-stress benchmarks.
  *
  * The per-round bench corpus saturates once every query is sub-second:
  * wall time stops discriminating scale behavior, and the next class of
  * defect (a key that explodes, a join that goes quadratic, a driver
  * collect that grows with the corpus) stays invisible until real data.
  * This expands `documents`/`embeddings` by an integer factor with NO
  * randomness, preserving each replica's INTERNAL structure exactly while
  * keeping replicas mutually distinct — so true duplicate/pair/cluster
  * mass scales linearly with the factor (operator output growth measures
  * the operator, not an artifact of near-identical replicas):
  *
  *  - documents: replica r prefixes every token with `r<r>_` — a
  *    per-replica token NAMESPACE. Within a replica, duplicate spans,
  *    n-gram stats, and shingle sets mirror the original corpus 1:1;
  *    across replicas nothing collides (no shared shingles at any k).
  *    The prefix inflates replica text ~1.4× in CHARS (token counts are
  *    unchanged), so char-dominated queries legitimately ride
  *    ≈1.4·factor in the scale curve — expansion artifact, not defect.
  *  - embeddings: replica r flips the sign of coordinates selected by
  *    bit (i mod 4) of r — an ISOMETRY, so every replica has the exact
  *    distance geometry of the original, while distinct replicas differ
  *    on ≥1/4 of coordinates (cross-replica cosines ≈ 0–0.5, below
  *    near-dup thresholds).
  *
  * Ids shift by `r · IdStride`, keeping the original ids as replica 0 so
  * query predicates like `vec_id < 10` select the same query set at any
  * factor (corpus grows, probe count stays fixed — the scan-scaling
  * measurement a 100 TB serving path cares about). */
object ScaleCorpus {

  /** Replica id offset — far above any testdata id range. */
  val IdStride = 10000000L

  def expandDocuments(docs: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor $factor must be >= 1")
    (0 until factor).map { r =>
      if (r == 0) docs
      else {
        val text = regexp_replace(col("text"), "(\\S+)", s"r${r}_$$1")
        docs.select((col("doc_id") + lit(r * IdStride)).as("doc_id"),
          text.as("text"), col("lang"), col("source"),
          length(text).cast("long").as("n_chars"))
      }
    }.reduce(_ unionAll _)
  }

  def expandEmbeddings(emb: DataFrame, factor: Int,
                       maxDim: Int = 256): DataFrame = {
    require(factor >= 1, s"factor $factor must be >= 1")
    (0 until factor).map { r =>
      if (r == 0) emb
      else {
        // sign pattern from r's bits: distinct replicas (r < 16) differ
        // on at least one (i mod 4) class — computed driver-side, applied
        // as one codegen projection
        val signs = Array.tabulate(maxDim)(i =>
          if (((r >> (i % 4)) & 1) == 0) 1.0f else -1.0f)
        val signsLit = typedLit(signs.toSeq)
        emb.select((col("vec_id") + lit(r * IdStride)).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x * element_at(signsLit, i + 1)).as("embedding"),
          col("label"))
      }
    }.reduce(_ unionAll _)
  }

  /** Materialize an expanded corpus directory (documents + embeddings
    * only — the tables the heavy tier reads) compatible with
    * [[graft.Tables]] loading. Skipped when a marker shows the same
    * (source, factor) is already on disk; returns the prep seconds. */
  def materialize(spark: SparkSession, sfDir: String, outDir: String,
                  factor: Int): Double = {
    val marker = new java.io.File(s"$outDir/_GRAFT_SCALE")
    val stamp = s"$sfDir:$factor:v1"
    if (marker.isFile) {
      val prev = new String(java.nio.file.Files.readAllBytes(
        marker.toPath), "UTF-8")
      if (prev == stamp) return 0.0
    }
    val t0 = System.nanoTime()
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    expandDocuments(Tables.documents(spark, sfDir), factor)
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    expandEmbeddings(Tables.embeddings(spark, sfDir), factor)
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    java.nio.file.Files.write(marker.toPath, stamp.getBytes("UTF-8"))
    (System.nanoTime() - t0) / 1e9
  }
}
