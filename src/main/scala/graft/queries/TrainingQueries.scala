package graft.queries

import graft.{Par, ParSql, Q, Tables}
import graft.functions.{Geo, TextAnalysis => TA, Vectors}
import graft.operators.{Dedup, HybridTable, Multimodal, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over `documents` / `embeddings`:
  * text analysis, fingerprinting, near-dup families, ANN, multimodal
  * plumbing, geo. The DuckDB oracles re-implement the identical algorithms
  * (same md5-derived hash), so these are full hash-checked gates, not
  * rows-only. */
object TrainingQueries {

  /** Corpus with synthesized near-duplicates: each doc plus a copy with the
    * first token dropped (id + 100000) — gives the near-dup operators real
    * positives to find. */
  /** Deterministic per-corpus dir for the incremental-IVF gate. */
  private def ivfAppendDir(sfDir: String): String =
    s"target/graft_ivf_append_${CorpusKey.of(sfDir)}"

  /** Full build+append protocol for the incremental-IVF gate: fresh
    * index, one appended batch, one deliberately REPLAYED append (the
    * no-op the gate proves). Setup always rebuilds (deterministic
    * timing); `run` calls [[ensureIvfAppendIndex]] so it is
    * self-contained when exercised without its setup phase (smoke/plan
    * specs). */
  private def buildIvfAppendIndex(s: org.apache.spark.sql.SparkSession,
                                  d: String): Unit = {
    val emb = Tables.embeddings(s, d)
    val batch = emb.select((col("vec_id") + 500000L).as("vec_id"),
      col("embedding"), col("label"))
    val dir = ivfAppendDir(d)
    Similarity.deleteIndexDir(dir)
    Similarity.persistIvfIndex(
      Similarity.ivfIndex(emb, "vec_id", "embedding", 8,
        cacheKey = None), dir)
    Similarity.appendIvfIndex(s, dir, batch, "vec_id", "embedding", "b1")
    Similarity.appendIvfIndex(s, dir, batch, "vec_id", "embedding", "b1")
  }

  private def ensureIvfAppendIndex(s: org.apache.spark.sql.SparkSession,
                                   d: String): Unit = {
    val dir = ivfAppendDir(d)
    if (!new java.io.File(s"$dir/tags/b1").isFile ||
        !new java.io.File(s"$dir/assigned").isDirectory)
      buildIvfAppendIndex(s, d)
  }

  private def ivfLifecycleDir(sfDir: String): String =
    s"target/graft_ivf_lifecycle_${CorpusKey.of(sfDir)}"

  /** Full index-lifecycle protocol for the ANN maintenance gate: fresh
    * index → append twins of the whole corpus (b1) → tombstone the five
    * query twins → compact → REPLAY the compaction (idempotence under
    * at-least-once orchestration) → append fresh twins of the queries
    * (b2). The run phase then proves: deleted ids never surface, each
    * query's b2 twin answers at rank 1 with cosine 1.0, and the index
    * row count is exactly base + b1 − deleted + b2. */
  private def buildIvfLifecycle(s: org.apache.spark.sql.SparkSession,
                                d: String): Unit = {
    val emb = Tables.embeddings(s, d)
    val dir = ivfLifecycleDir(d)
    Similarity.deleteIndexDir(dir)
    Similarity.persistIvfIndex(
      Similarity.ivfIndex(emb, "vec_id", "embedding", 8,
        cacheKey = None), dir)
    val b1 = emb.select((col("vec_id") + 500000L).as("vec_id"),
      col("embedding"), col("label"))
    Similarity.appendIvfIndex(s, dir, b1, "vec_id", "embedding", "b1")
    Similarity.deleteFromIvfIndex(s, dir,
      emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 500000L).as("vec_id")),
      "vec_id", "d1")
    Similarity.compactIvfIndex(s, dir)
    Similarity.compactIvfIndex(s, dir) // replayed compaction: no-op
    val b2 = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 600000L).as("vec_id"),
        col("embedding"), col("label"))
    Similarity.appendIvfIndex(s, dir, b2, "vec_id", "embedding", "b2")
  }

  private def ensureIvfLifecycle(s: org.apache.spark.sql.SparkSession,
                                 d: String): Unit = {
    val dir = ivfLifecycleDir(d)
    if (!new java.io.File(s"$dir/tags/b2").isFile ||
        !new java.io.File(s"$dir/assigned").isDirectory)
      buildIvfLifecycle(s, d)
  }

  /** Lifecycle protocol of q_dedup_index_lifecycle's setup phase: fresh
    * index → append docs &lt; 300 (t1) → retire docs &lt; 50 → double
    * compact → append dup-content batch t2 → REPLAY t2 (marker no-op). */
  /** Lifecycle index name keyed by the corpus dir (sf0.001 smoke and
    * sf0.01 verify runs in one session must not share state). */
  private def qlcName(d: String): String =
    "qlc_" + CorpusKey.of(d)

  private def buildDedupLifecycle(s: org.apache.spark.sql.SparkSession,
                                  d: String): Unit = {
    import graft.operators.Dedup
    Dedup.dropIndex(s, qlcName(d))
    val docs = Tables.documents(s, d)
    val b1 = docs.filter(col("doc_id") < 300)
      .select(col("doc_id"), col("text"))
    Dedup.incrementalExact(s, b1, "text", "doc_id", qlcName(d),
      batchTag = Some("t1"))
    // retire docs < 50: their content is re-admitted from here on
    Dedup.retireFromIndex(s, qlcName(d),
      docs.filter(col("doc_id") < 50).select(col("doc_id")),
      "doc_id", "d1")
    Dedup.compactIndex(s, qlcName(d))
    Dedup.compactIndex(s, qlcName(d)) // double compact is a no-op rewrite
    val b2 = docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
    Dedup.incrementalExact(s, b2, "text", "doc_id", qlcName(d),
      batchTag = Some("t2"))
    // replay of t2: marker makes the append a no-op
    Dedup.incrementalExact(s, b2, "text", "doc_id", qlcName(d),
      batchTag = Some("t2"))
  }

  private def ensureDedupLifecycle(s: org.apache.spark.sql.SparkSession,
                                   d: String): Unit =
    if (!graft.operators.Dedup.indexExists(s, qlcName(d)) ||
        !graft.operators.Dedup.indexHasTag(s, qlcName(d), "t2"))
      buildDedupLifecycle(s, d)

  /** Persisted text + IVF indexes for q_hybrid_rrf_indexed, keyed by
    * corpus dir: the text side through TextIndexLifecycle (tag b1), the
    * dense side a seeded-cell assignment persisted cell-partitioned. */
  private def hybIdxRoot(d: String): String =
    s"target/graft_hyb_idx_${CorpusKey.of(d)}"

  private def buildHybridIndexes(s: org.apache.spark.sql.SparkSession,
                                 d: String): Unit = {
    val root = hybIdxRoot(d)
    graft.sources.TextIndexLifecycle.deleteRoot(root)
    graft.sources.TextIndexLifecycle.append(s, root, "text", "doc_id",
      Tables.documents(s, d).select(col("doc_id"), col("text")), "b1")
    val emb = Tables.embeddings(s, d)
    val cells = Similarity.ivfCellsSeeded(emb, "vec_id", "embedding", 8)
    val assigned = graft.operators.Retrieval
      .assignCells(emb, "vec_id", "embedding", cells)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
        col("cell"),
        graft.functions.Vectors.norm2(col("embedding")).as("cn"))
    val centroids = s.createDataFrame(
      cells.zipWithIndex.toSeq.map { case (c, i) => (i, c) })
      .toDF("cell", "centroid")
    Similarity.deleteIndexDir(s"$root/ivf")
    Similarity.persistIvfIndex(Similarity.IvfIndex(assigned, centroids),
      s"$root/ivf")
  }

  private def ensureHybridIndexes(s: org.apache.spark.sql.SparkSession,
                                  d: String): Unit = {
    val root = hybIdxRoot(d)
    if (!new java.io.File(s"$root/text_text_tags/b1").isFile ||
        !new java.io.File(s"$root/ivf/assigned").isDirectory)
      buildHybridIndexes(s, d)
  }

  /** IVF-PQ coarse cells + codebook for q_ann_ivfpq, memoized per corpus
    * dir: training runs once in setup= (timed separately); the measured
    * run encodes and probes with the held constants (driver cost:
    * 8 cells + 8×16 sub-centroids of floats). */
  private val ivfPqMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Array[Float]], Similarity.PqModel)]()
  private def ivfPqModel(s: org.apache.spark.sql.SparkSession, d: String)
  : (Array[Array[Float]], Similarity.PqModel) =
    ivfPqMemo.computeIfAbsent(d, _ => {
      val emb = Tables.embeddings(s, d)
      (Similarity.ivfCellsSeeded(emb, "vec_id", "embedding", 8),
        Similarity.pqTrain(emb, "vec_id", "embedding", 8, 16))
    })

  /** Learned merge list for q_bpe_roundtrip, memoized per corpus dir:
    * the LEARNING phase runs once in setup= (timed separately), the
    * measured run encodes+decodes with the held merges (driver cost:
    * n = 3 string pairs). */
  private val bpeMergesMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(String, String)]]()
  private def roundtripMerges(s: org.apache.spark.sql.SparkSession,
                              d: String): Seq[(String, String)] =
    bpeMergesMemo.computeIfAbsent(d, _ =>
      graft.operators.Vocab.bpeMerges(Tables.documents(s, d), "text", n = 3)
        .orderBy("round").collect().toSeq
        .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))))

  /** Synthesized tool-call trace (r17): `did % 5` selects the shape —
    * 0 plain valid chat; 1 valid two-call trace answered in REVERSE
    * order (order-free matching must pass it); 2 wrong answer id;
    * 3 unanswered call (assistant speaks again directly); 4 non-JSON
    * arguments. Contents are clean a-z/space slices so the JSON needs
    * no escaping beyond the arguments-string quotes. */
  private def toolTraceJson(did: org.apache.spark.sql.Column,
                            ct: org.apache.spark.sql.Column,
                            forceK: Option[Int] = None)
  : org.apache.spark.sql.Column = {
    type C = org.apache.spark.sql.Column
    val k = forceK.map(v => lit(v.toLong): C).getOrElse(did % 5)
    val u = substring(ct, 1, 10)
    val a = substring(ct, 8, 8)
    val fin = substring(ct, 20, 10)
    val r1 = substring(ct, 12, 8)
    val r2 = substring(ct, 16, 8)
    val ida = concat(lit("a"), did.cast("string"))
    val idb = concat(lit("b"), did.cast("string"))
    val idx = concat(lit("x"), did.cast("string"))
    // arguments are JSON-string VALUES inside the outer JSON, so their
    // quotes arrive backslash-escaped; from_json unescapes them
    val j1 = concat(lit("{\\\"q\\\":\\\""), substring(ct, 3, 5),
      lit("\\\"}"))
    val j2 = concat(lit("{\\\"k\\\":\\\""), substring(ct, 6, 5),
      lit("\\\"}"))
    def msg(role: String, content: C): C =
      concat(lit("{\"role\":\"" + role + "\",\"content\":\""), content,
        lit("\"}"))
    def callObj(id: C, name: String, args: C): C =
      concat(lit("{\"id\":\""), id,
        lit("\",\"name\":\"" + name + "\",\"arguments\":\""), args,
        lit("\"}"))
    def toolMsg(content: C, tcid: C): C =
      concat(lit("{\"role\":\"tool\",\"content\":\""), content,
        lit("\",\"tool_call_id\":\""), tcid, lit("\"}"))
    val calls = when(k === 1, concat(callObj(ida, "search", j1),
        lit(","), callObj(idb, "fetch", j2)))
      .when(k === 4, callObj(ida, "search", lit("{oops")))
      .otherwise(callObj(ida, "search", j1))
    val asst1 = when(k === 0, msg("assistant", fin))
      .otherwise(concat(lit("{\"role\":\"assistant\",\"content\":\""),
        a, lit("\",\"tool_calls\":["), calls, lit("]}")))
    val tools = when(k === 1, concat(lit(","), toolMsg(r2, idb),
        lit(","), toolMsg(r1, ida)))
      .when(k === 2, concat(lit(","), toolMsg(r1, idx)))
      .when(k === 4, concat(lit(","), toolMsg(r1, ida)))
      .otherwise(lit(""))
    val finish = when(k === 0, lit(""))
      .otherwise(concat(lit(","), msg("assistant", fin)))
    concat(lit("{\"messages\":["), msg("user", u), lit(","), asst1,
      tools, finish, lit("]}"))
  }

  /** DuckDB twin of [[toolTraceJson]]: re-synthesizes the same turn
    * rows directly (doc_id, k, turn_idx, role, content, calls list of
    * (id, nm, args) structs, tcid) — CTEs `b`, `p`, `tt`. */
  private val toolTraceSql: String =
    """b AS (SELECT doc_id, doc_id % 5 AS k,
        regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
      FROM documents),
      p AS (SELECT doc_id, k,
        substr(ct, 1, 10) AS u, substr(ct, 8, 8) AS a,
        substr(ct, 20, 10) AS fin,
        substr(ct, 12, 8) AS r1, substr(ct, 16, 8) AS r2,
        '{"q":"' || substr(ct, 3, 5) || '"}' AS j1,
        '{"k":"' || substr(ct, 6, 5) || '"}' AS j2,
        'a' || CAST(doc_id AS VARCHAR) AS ida,
        'b' || CAST(doc_id AS VARCHAR) AS idb,
        'x' || CAST(doc_id AS VARCHAR) AS idx
      FROM b),
      tt AS (
        SELECT doc_id, k, CAST(0 AS BIGINT) AS turn_idx,
          'user' AS role, u AS content,
          CAST(NULL AS STRUCT(id VARCHAR, nm VARCHAR, args VARCHAR)[])
            AS calls,
          CAST(NULL AS VARCHAR) AS tcid
        FROM p
        UNION ALL
        SELECT doc_id, k, 1, 'assistant',
          CASE WHEN k = 0 THEN fin ELSE a END,
          CASE WHEN k = 0 THEN NULL
            WHEN k = 1 THEN [{'id': ida, 'nm': 'search', 'args': j1},
                             {'id': idb, 'nm': 'fetch', 'args': j2}]
            WHEN k = 4 THEN [{'id': ida, 'nm': 'search',
                              'args': '{oops'}]
            ELSE [{'id': ida, 'nm': 'search', 'args': j1}] END,
          NULL
        FROM p
        UNION ALL
        SELECT doc_id, k, 2,
          CASE WHEN k = 3 THEN 'assistant' ELSE 'tool' END,
          CASE WHEN k = 1 THEN r2 WHEN k = 3 THEN fin ELSE r1 END,
          NULL,
          CASE WHEN k = 1 THEN idb WHEN k = 2 THEN idx
               WHEN k = 4 THEN ida END
        FROM p WHERE k != 0
        UNION ALL
        SELECT doc_id, k, 3,
          CASE WHEN k = 1 THEN 'tool' ELSE 'assistant' END,
          CASE WHEN k = 1 THEN r1 ELSE fin END,
          NULL,
          CASE WHEN k = 1 THEN ida END
        FROM p WHERE k IN (1, 2, 4)
        UNION ALL
        SELECT doc_id, k, 4, 'assistant', fin, NULL, NULL
        FROM p WHERE k = 1)"""

  /** DuckDB twin of Chats.renderToolCalls over the VALID synthesized
    * traces (k ∈ {0,1} — the shapes [[toolTraceSql]] constructs valid;
    * q_chat_tools replays the validation RULES over all five classes,
    * so the composed gates may take the verdict as given): per-turn
    * (doc_id, turn_idx, role, rt) rendered rows — CTE `vtr` (requires
    * `p` from [[toolTraceSql]]). */
  private val toolRenderSql: String =
    """vtr AS (
        SELECT doc_id, CAST(0 AS BIGINT) AS turn_idx, 'user' AS role,
          '<|user|>' || u || chr(10) AS rt
        FROM p WHERE k IN (0, 1)
        UNION ALL
        SELECT doc_id, 1, 'assistant',
          CASE WHEN k = 0 THEN '<|assistant|>' || fin || chr(10)
            ELSE '<|assistant|>' || a || '<|call:search|>' || j1 ||
              '<|call:fetch|>' || j2 || chr(10) END
        FROM p WHERE k IN (0, 1)
        UNION ALL
        SELECT doc_id, 2, 'tool',
          '<|tool|>[' || idb || '] ' || r2 || chr(10)
        FROM p WHERE k = 1
        UNION ALL
        SELECT doc_id, 3, 'tool',
          '<|tool|>[' || ida || '] ' || r1 || chr(10)
        FROM p WHERE k = 1
        UNION ALL
        SELECT doc_id, 4, 'assistant',
          '<|assistant|>' || fin || chr(10)
        FROM p WHERE k = 1)"""

  /** Six synthesized CALL shapes (r18, did % 6) — the argument-audit
    * fixture SHARED by q_tool_arg_types and q_tool_contract: one
    * assistant turn with one call each — 0 conforming search
    * ({"q": str}), 1 conforming fetch ({"k": int, "url": str}),
    * 2 fetch with both value types flipped, 3 fetch with a DECIMAL k
    * and url missing, 4 unparseable arguments, 5 an out-of-contract
    * tool. Returns a [[graft.operators.Chats.toolTurns]]-shaped
    * frame. */
  private def sixShapeToolTurns(s: org.apache.spark.sql.SparkSession, d: String)
  : DataFrame = {
    val did = col("doc_id")
    val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
    val s5 = substring(ct, 3, 5)
    val num = (did % 100).cast("string")
    val args = when(did % 6 === 0,
        concat(lit("{\"q\":\""), s5, lit("\"}")))
      .when(did % 6 === 1, concat(lit("{\"k\":"), num,
        lit(",\"url\":\""), s5, lit("\"}")))
      .when(did % 6 === 2, concat(lit("{\"k\":\""), s5,
        lit("\",\"url\":"), num, lit("}")))
      .when(did % 6 === 3, lit("{\"k\":1.5}"))
      .when(did % 6 === 4, lit("{oops"))
      .otherwise(concat(lit("{\"to\":\""), s5, lit("\"}")))
    val tool = when(did % 6 === 5, lit("mail"))
      .when(did % 6 === 4 || did % 6 === 0, lit("search"))
      .otherwise(lit("fetch"))
    Tables.documents(s, d).select(did,
      lit(1L).as("turn_idx"), lit("assistant").as("role"),
      lit(null).cast("string").as("content"),
      array(struct(concat(lit("c"), did.cast("string")).as("id"),
        tool.as("name"), args.as("arguments"))).as("tool_calls"),
      lit(null).cast("string").as("tool_call_id"))
  }

  /** DuckDB twin of [[sixShapeToolTurns]] — CTEs `b`, `p`, `c` with
    * `c` = (doc_id, call_id, tool_name, args). */
  private val sixShapeSql: String =
    """b AS (SELECT doc_id, doc_id % 6 AS k,
        regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
      FROM documents),
    p AS (SELECT doc_id, k, substr(ct, 3, 5) AS s5,
        CAST(doc_id % 100 AS VARCHAR) AS num FROM b),
    c AS (SELECT doc_id,
        'c' || CAST(doc_id AS VARCHAR) AS call_id,
        CASE WHEN k = 5 THEN 'mail'
          WHEN k IN (0, 4) THEN 'search'
          ELSE 'fetch' END AS tool_name,
        CASE WHEN k = 0 THEN '{"q":"' || s5 || '"}'
          WHEN k = 1 THEN '{"k":' || num || ',"url":"' || s5
            || '"}'
          WHEN k = 2 THEN '{"k":"' || s5 || '","url":' || num
            || '}'
          WHEN k = 3 THEN '{"k":1.5}'
          WHEN k = 4 THEN '{oops'
          ELSE '{"to":"' || s5 || '"}' END AS args
      FROM p)"""

  /** DuckDB json_type → the six canonical JSON type names (the
    * cross-engine twin of Chats' variant canonicalization). */
  private def canonTypeSql(t: String): String =
    s"""CASE WHEN $t IS NULL THEN 'missing'
      WHEN $t = 'VARCHAR' THEN 'string'
      WHEN $t IN ('UBIGINT', 'BIGINT', 'DOUBLE') THEN 'number'
      WHEN $t = 'BOOLEAN' THEN 'boolean'
      WHEN $t = 'OBJECT' THEN 'object'
      WHEN $t = 'ARRAY' THEN 'array'
      WHEN $t = 'NULL' THEN 'null' ELSE 'other' END"""

  /** The per-group severity-card aggregate tail over a `drift`-shaped
    * CTE (Chats.contractDrift columns) — single source for
    * q_contract_drift_card and its streaming twin (r19 review: the
    * breaking/warn rule must change in ONE place). */
  private val contractCardAggSql: String =
    """CAST(SUM(CASE WHEN presence_a IS NOT NULL THEN 1 ELSE 0
            END) AS BIGINT) AS n_keys_a,
          CAST(SUM(CASE WHEN presence_b IS NOT NULL THEN 1 ELSE 0
            END) AS BIGINT) AS n_keys_b,
          CAST(SUM(CASE WHEN status = 'appeared' THEN 1 ELSE 0
            END) AS BIGINT) AS n_appeared,
          CAST(SUM(CASE WHEN status = 'disappeared' THEN 1 ELSE 0
            END) AS BIGINT) AS n_disappeared,
          CAST(SUM(CASE WHEN type_flip THEN 1 ELSE 0 END)
            AS BIGINT) AS n_type_flips,
          CAST(SUM(CASE WHEN status = 'required_change' THEN 1
            ELSE 0 END) AS BIGINT) AS n_required_changes,
          ROUND(MAX(ABS(presence_delta)), 6)
            AS max_abs_presence_delta,
          CASE WHEN MAX(CASE WHEN COALESCE(required_a, FALSE)
              AND (status = 'disappeared' OR type_flip)
              THEN 1 ELSE 0 END) = 1 THEN 'breaking'
            WHEN SUM(CASE WHEN status IN ('appeared', 'disappeared',
                'required_change') OR type_flip THEN 1 ELSE 0
              END) > 0 THEN 'warn'
            ELSE 'ok' END AS severity"""

  /** [[sixShapeSql]]'s contract-INFERENCE chain over a doc_id SLICE,
    * every CTE name suffixed `$sfx` so two snapshot generations fit
    * in one statement (q_contract_drift / q_contract_drift_card).
    * Mirrors q_tool_contract's oracle; final CTE `inf$sfx` =
    * (tool_name, key, presence, major_type, required). */
  private def contractInferSql(sfx: String, where: String): String =
    s"""b$sfx AS (SELECT doc_id, doc_id % 6 AS k,
        regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
      FROM documents WHERE $where),
    p$sfx AS (SELECT doc_id, k, substr(ct, 3, 5) AS s5,
        CAST(doc_id % 100 AS VARCHAR) AS num FROM b$sfx),
    c$sfx AS (SELECT doc_id,
        CASE WHEN k = 5 THEN 'mail'
          WHEN k IN (0, 4) THEN 'search'
          ELSE 'fetch' END AS tool_name,
        CASE WHEN k = 0 THEN '{"q":"' || s5 || '"}'
          WHEN k = 1 THEN '{"k":' || num || ',"url":"' || s5
            || '"}'
          WHEN k = 2 THEN '{"k":"' || s5 || '","url":' || num
            || '}'
          WHEN k = 3 THEN '{"k":1.5}'
          WHEN k = 4 THEN '{oops'
          ELSE '{"to":"' || s5 || '"}' END AS args
      FROM p$sfx),
    ob$sfx AS (SELECT tool_name, vargs,
        CASE WHEN json_type(vargs) = 'OBJECT'
          THEN list_distinct(CAST(json_keys(vargs) AS VARCHAR[]))
          END AS keys
      FROM (SELECT tool_name,
          CASE WHEN json_valid(args) THEN args END AS vargs
        FROM c$sfx)),
    tot$sfx AS (SELECT tool_name,
        CAST(SUM(CASE WHEN keys IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_objects
      FROM ob$sfx GROUP BY 1),
    pt$sfx AS (SELECT tool_name, key,
        ${canonTypeSql("json_type(vargs, '$.' || key)")} AS t
      FROM (SELECT tool_name, unnest(keys) AS key, vargs
        FROM ob$sfx WHERE keys IS NOT NULL)),
    mj$sfx AS (SELECT tool_name, key, t AS major_type FROM (
        SELECT tool_name, key, t,
          row_number() OVER (PARTITION BY tool_name, key
            ORDER BY COUNT(*) DESC, t) AS r
        FROM pt$sfx GROUP BY 1, 2, 3) WHERE r = 1),
    kc$sfx AS (SELECT tool_name, key,
        CAST(COUNT(*) AS BIGINT) AS n_with_key
      FROM pt$sfx GROUP BY 1, 2),
    inf$sfx AS (SELECT kc.tool_name, kc.key,
        ROUND(CAST(kc.n_with_key AS DOUBLE) / tot.n_objects, 6)
          AS presence,
        mj.major_type,
        (ROUND(CAST(kc.n_with_key AS DOUBLE) / tot.n_objects, 6)
          >= 0.95) AS required
      FROM kc$sfx kc
      JOIN mj$sfx mj ON mj.tool_name = kc.tool_name
        AND mj.key = kc.key
      JOIN tot$sfx tot ON tot.tool_name = kc.tool_name)"""

  /** Both snapshot inferences (even/odd doc ids) + the full-outer
    * drift compare — final CTE `drift` = Chats.contractDrift's
    * columns; shared by q_contract_drift and q_contract_drift_card. */
  private def contractDriftSql: String =
    s"""${contractInferSql("a", "doc_id % 2 = 0")},
    ${contractInferSql("bb", "doc_id % 2 = 1")},
    drift AS (SELECT
        COALESCE(a.tool_name, b.tool_name) AS tool_name,
        COALESCE(a.key, b.key) AS key,
        a.presence AS presence_a, a.major_type AS major_type_a,
        a.required AS required_a,
        b.presence AS presence_b, b.major_type AS major_type_b,
        b.required AS required_b,
        ROUND(b.presence - a.presence, 6) AS presence_delta,
        COALESCE(a.major_type != b.major_type, FALSE) AS type_flip,
        CASE WHEN a.presence IS NULL THEN 'appeared'
          WHEN b.presence IS NULL THEN 'disappeared'
          WHEN COALESCE(a.major_type != b.major_type, FALSE)
            THEN 'type_flip'
          WHEN a.required != b.required THEN 'required_change'
          ELSE 'stable' END AS status
      FROM infa a FULL OUTER JOIN infbb b
        ON a.tool_name = b.tool_name AND a.key = b.key)"""

  /** DuckDB twin of Chats.toolTriage over the synthesized traces:
    * per-turn protocol flags, block grouping, the set-difference
    * decomposition, and the severity CASE — CTEs `a1`..`av`
    * (requires `tt` from [[toolTraceSql]]); `av` =
    * (doc_id, n_turns, fail_rule). Shared by q_tool_attrition and
    * q_stream_tool_triage. */
  private val toolTriageSql: String =
    """a1 AS (SELECT doc_id, turn_idx, role, tcid,
        COALESCE(len(calls) > 0, FALSE) AS hc,
        -- json_valid(NULL) is NULL and list_filter DROPS null-predicate
        -- rows — coalesce so a call with MISSING arguments flags, as
        -- Spark's try_parse_json(null).isNotNull=false does
        (calls IS NOT NULL AND len(list_filter(calls, c ->
          c.id IS NULL OR c.nm IS NULL
            OR NOT COALESCE(json_valid(c.args), FALSE))) > 0) AS rargs,
        (calls IS NOT NULL AND
          len(list_distinct([c.id FOR c IN calls]))
            != len(calls)) AS rdup,
        CASE WHEN role = 'assistant' THEN
          COALESCE(list_sort([c.id FOR c IN calls]),
            CAST([] AS VARCHAR[])) END AS declt
      FROM tt),
    a2 AS (SELECT *,
        lag(role) OVER (PARTITION BY doc_id ORDER BY turn_idx)
          AS pr,
        lag(hc) OVER (PARTITION BY doc_id ORDER BY turn_idx)
          AS ph,
        max(CASE WHEN role = 'assistant' THEN turn_idx END)
          OVER (PARTITION BY doc_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS blk
      FROM a1),
    a3 AS (SELECT *,
        -- COALESCE true: a NULL role is a role violation (Spark's
        -- coalesce(..., lit(true)) twin)
        COALESCE((role NOT IN ('system','user','assistant','tool')
         OR (role = 'system' AND turn_idx != 0)
         OR (hc AND role != 'assistant')
         OR ((role = 'tool') != (tcid IS NOT NULL))), TRUE) AS rrole,
        COALESCE((NOT CASE
          WHEN pr IS NULL THEN role IN ('system','user')
          WHEN pr = 'system' THEN role = 'user'
          WHEN pr = 'user' THEN role = 'assistant'
          WHEN pr = 'assistant' AND ph THEN role = 'tool'
          WHEN pr = 'assistant' THEN role = 'user'
          ELSE role IN ('tool','assistant') END), TRUE) AS rtrans
      FROM a2),
    ag AS (SELECT doc_id, blk, COUNT(*) AS n,
        bool_or(rrole) AS brole, bool_or(rargs) AS bargs,
        bool_or(rdup) AS bdup, bool_or(rtrans) AS btrans,
        COALESCE(any_value(declt), CAST([] AS VARCHAR[]))
          AS decl,
        COALESCE(list_sort(list(tcid) FILTER (WHERE role =
          'tool')), CAST([] AS VARCHAR[])) AS ans,
        arg_max(role, turn_idx) AS lrole,
        arg_max(hc, turn_idx) AS lhc,
        max(turn_idx) AS mx
      FROM a3 GROUP BY doc_id, blk),
    ag2 AS (SELECT *,
        (len(ans) != len(list_distinct(ans))) AS bansdup,
        len(list_filter(list_distinct(ans), x ->
          NOT list_contains(decl, x))) > 0 AS bstray,
        len(list_filter(decl, x ->
          NOT list_contains(ans, x))) > 0 AS bunans
      FROM ag),
    ac AS (SELECT doc_id, SUM(n) AS n_turns,
        bool_or(brole) AS r1, bool_or(bargs) AS r2,
        bool_or(bdup OR bansdup) AS r3, bool_or(bstray) AS r4,
        bool_or(bunans) AS r5, bool_or(btrans) AS r6,
        NOT (arg_max(lrole, mx) = 'assistant'
          AND NOT arg_max(lhc, mx)) AS r7
      FROM ag2 GROUP BY doc_id),
    av AS (SELECT doc_id, n_turns,
        CASE WHEN r1 THEN 'role' WHEN r2 THEN 'args_parse'
          WHEN r3 THEN 'dup_call_id' WHEN r4 THEN 'stray_answer'
          WHEN r5 THEN 'unanswered' WHEN r6 THEN 'transition'
          WHEN r7 THEN 'pending_final' END AS fail_rule
      FROM ac)"""

  private def dupCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), col("source"))
      .unionAll(docs.select((col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text"),
        col("source")))

  private val corpusSql: String =
    """corpus AS (
       SELECT doc_id, text, source FROM documents
       UNION ALL
       SELECT doc_id + 100000, regexp_replace(text, '^\S+\s+', ''), source
       FROM documents)"""

  /** DuckDB twin of TextAnalysis.tokens. */
  private def toksSql(t: String): String =
    s"list_filter(string_split_regex(lower($t), '\\s+'), t -> length(t) > 0)"

  /** One BPE merge-learning round as DuckDB CTEs — p$$i counts the
    * adjacent-pair frequencies, b$$i picks the (cnt DESC, pat) winner,
    * e$$i applies it — the SINGLE SOURCE for every oracle replay of
    * Vocab.bpeMerges (r19 review: this text existed 9 times; a fix to
    * the recursion must land once). `bCols` lets the merges gates
    * carry the count; `eCols` lets the per-word encode gates carry
    * the word key. */
  private def bpeRoundSql(i: Int, bCols: String = "pat",
                          eCols: String = ""): String = {
    val prev = s"e${i - 1}"
    s"""p$i AS (SELECT pat, SUM(freq) AS cnt FROM (
        SELECT unnest([toks[i] || ' ' || toks[i+1]
          for i in generate_series(1, len(toks)-1)]) AS pat, freq
        FROM (SELECT string_split(e, ' ') AS toks, freq FROM $prev))
      GROUP BY pat),
    b$i AS (SELECT $bCols FROM p$i ORDER BY cnt DESC, pat LIMIT 1),
    e$i AS (SELECT ${eCols}replace(e, b.pat, replace(b.pat, '| |', ''))
      AS e, freq FROM $prev, b$i b)"""
  }

  /** The FFD first-fitting-bin probe over the recursion state's
    * remaining capacities — DuckDB list_position returns 0 (not NULL)
    * when absent, hence the NULLIF (the single source for every
    * packExamples oracle replay). */
  private val ffdPosSql: String =
    "NULLIF(list_position(list_transform(st.caps, " +
      "c -> c >= it.len), true), 0)"

  /** DuckDB twins of [[graft.functions.Html]] — each renders the SAME
    * RE2-subset pattern chain the Spark side runs ('g' is DuckDB's global
    * flag; Spark's regexp_replace is always global), so extraction replays
    * bit-for-bit. Patterns arrive with literal backslashes (e.g. `\s`);
    * RE2 and Java interpret them identically in this subset. */
  private def rrSql(e: String, pat: String, repl: String): String =
    s"regexp_replace($e, '$pat', $repl, 'g')"

  private def htmlStripSql(e: String): String = {
    val noScript = rrSql(e, "(?is)<script[^>]*>.*?</script[ \\t\\n\\r\\f]*>", "' '")
    val noStyle = rrSql(noScript, "(?is)<style[^>]*>.*?</style[ \\t\\n\\r\\f]*>", "' '")
    val noComment = rrSql(noStyle, "(?s)<!--.*?-->", "' '")
    val broke = rrSql(noComment, "(?i)<br[ \\t\\n\\r\\f]*/?>", "chr(10)")
    val blocked = rrSql(broke,
      "(?i)</(p|div|h[1-6]|li|tr|table|ul|ol|blockquote|pre)[ \\t\\n\\r\\f]*>",
      "chr(10)")
    val noTag = rrSql(blocked, "(?s)<[^>]*>", "' '")
    rrSql(noTag, "<[^>]*$", "' '")
  }

  private def htmlEntitySql(e: String): String =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "''",
      "&apos;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(e) { case (c, (f, t)) => s"replace($c, '$f', '$t')" }

  private def htmlWsSql(e: String): String = {
    val sp = rrSql(e, "[ \\t\\f\\r]+", "' '")
    val nl = rrSql(sp, " *\\n *", "chr(10)")
    val capped = rrSql(nl, "\\n{3,}", "chr(10)||chr(10)")
    rrSql(capped, "^[ \\n]+|[ \\n]+$", "''")
  }

  private def htmlTextSql(e: String): String =
    htmlWsSql(htmlEntitySql(htmlStripSql(e)))

  private def htmlTitleSql(e: String): String = {
    val raw =
      s"regexp_extract($e, '(?is)<title[^>]*>(.*?)</title[ \\t\\n\\r\\f]*>', 1)"
    val flat = rrSql(htmlEntitySql(raw), "[ \\t\\f\\r\\n]+", "' '")
    rrSql(flat, "^ +| +$", "''")
  }

  /** Anchor-chars numerator of Html.linkDensity: per-anchor inner HTML,
    * tag-stripped, entity-decoded, whitespace-normalized, lengths summed
    * (empty list → 0, the Spark aggregate's init). */
  private def htmlAnchorCharsSql(e: String): String = {
    val inner = htmlWsSql(htmlEntitySql(rrSql("a", "(?s)<[^>]*>", "' '")))
    "COALESCE(list_sum(list_transform(regexp_extract_all(" +
      s"$e, '(?is)<a\\b[^>]*>(.*?)</a[ \\t\\n\\r\\f]*>', 1), a -> length($inner))), 0)"
  }

  /** DuckDB twin of TextAnalysis.gopherSignals over table/CTE `src`
    * (columns doc_id, text): rows of (doc_id, symbol_ratio, bullet_frac,
    * ellipsis_frac, alpha_frac, stop_hits, gopher_pass). */
  /** Corpus-language stopword set for the Gopher gates (the synthetic
    * corpus has no English function words; the rule is "≥2 distinct
    * hits of a set", so the gates pass a set from ITS vocabulary). */
  private val corpusStops = Seq("the", "a", "key", "value")
  private def corpusStopsSql: String =
    corpusStops.map(w => s"'$w'").mkString("[", ",", "]")

  private def gopherSigSql(src: String): String =
    s"""SELECT doc_id, symbol_ratio, bullet_frac, ellipsis_frac,
          alpha_frac, stop_hits,
          (symbol_ratio <= 0.1 AND bullet_frac <= 0.9 AND
           ellipsis_frac <= 0.3 AND alpha_frac >= 0.8 AND stop_hits >= 2)
            AS gopher_pass
        FROM (SELECT doc_id,
            ROUND((
              (length(text) - length(replace(text, '#', ''))) / 1.0 +
              (length(text) - length(replace(text, '...', ''))) / 3.0 +
              (length(text) - length(replace(text, '…', ''))) / 1.0
            ) / ntok, 6) AS symbol_ratio,
            ROUND(len(list_filter(segs, x -> substr(x, 1, 1) = '-'
              OR substr(x, 1, 1) = '*' OR substr(x, 1, 1) = '•'))
              / nseg, 6) AS bullet_frac,
            ROUND(len(list_filter(segs, x -> right(x, 3) = '...'
              OR right(x, 1) = '…')) / nseg, 6) AS ellipsis_frac,
            ROUND(len(list_filter(toks,
              t -> regexp_matches(t, '[a-zA-Z]'))) / ntok, 6) AS alpha_frac,
            CAST(len(list_intersect(list_distinct(toks),
              $corpusStopsSql)) AS INT)
              AS stop_hits
          FROM (SELECT doc_id, text, toks,
              CAST(greatest(len(toks), 1) AS DOUBLE) AS ntok,
              CAST(greatest(len(segs), 1) AS DOUBLE) AS nseg, segs
            FROM (SELECT doc_id, text, ${toksSql("text")} AS toks,
              list_filter([trim(x) for x in string_split(text, chr(10))],
                x -> x != '') AS segs
              FROM $src)))"""

  /** DuckDB twin of LmQuality.lmScore over table/CTE `src` (columns
    * doc_id, text): CTE chain ending in `lmagg` (doc_id, n_bigrams,
    * sum_u) — self-trained add-1 bigram model over `src` itself. */
  private def lmSql(src: String): String =
    s"""lmtk AS (SELECT doc_id, ${toksSql("text")} AS tk FROM $src),
        lmbg AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
          FROM (SELECT doc_id, tk,
              unnest(generate_series(1, greatest(len(tk), 1))) AS i
            FROM lmtk)
          WHERE i <= len(tk) - 1),
        lmc12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM lmbg GROUP BY 1, 2),
        lmc1 AS (SELECT w1, COUNT(*) AS c1 FROM lmbg GROUP BY 1),
        lmvv AS (SELECT COUNT(DISTINCT t) AS v FROM (
          SELECT unnest(tk) AS t FROM lmtk)),
        lmu AS (SELECT b.doc_id,
            CAST(ROUND(ROUND(LN(
              (CAST(x.c12 AS DOUBLE) + 1.0) /
              (CAST(y.c1 AS DOUBLE) + 1.0 * lmvv.v)), 6) * 1e6) AS BIGINT)
              AS u
          FROM lmbg b
          JOIN lmc12 x ON b.w1 = x.w1 AND b.w2 = x.w2
          JOIN lmc1 y ON b.w1 = y.w1
          CROSS JOIN lmvv),
        lmagg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
            CAST(SUM(u) AS BIGINT) AS sum_u
          FROM lmu GROUP BY doc_id)"""

  /** DuckDB twin of Dsir.dsirScore over table/CTE `src` (columns doc_id,
    * text, source): CTE chain ending in `dsirsc` (doc_id, n_feats,
    * sum_llr_u). `targetPred` selects the target subset; `b` is the
    * bucket count. Replays feature hashing, both count tables, add-one
    * smoothing, ln rounding, and the per-doc integer sums. */
  private def dsirSql(src: String, targetPred: String, b: Int): String =
    s"""dstk AS (SELECT doc_id, source, ${toksSql("text")} AS tk
          FROM $src),
        dsfb AS (SELECT doc_id, source, ${hash60Sql("f")} % $b AS bk
          FROM (SELECT doc_id, source, unnest(list_concat(tk,
              [tk[i] || ' ' || tk[i+1]
               for i in generate_series(1, len(tk) - 1)])) AS f
            FROM dstk)),
        dsrawc AS (SELECT bk, COUNT(*) AS rc FROM dsfb GROUP BY 1),
        dstgtc AS (SELECT bk, COUNT(*) AS tc FROM dsfb
          WHERE $targetPred GROUP BY 1),
        dstot AS (SELECT (SELECT COUNT(*) FROM dsfb) AS rt,
          (SELECT COUNT(*) FROM dsfb WHERE $targetPred) AS tt),
        dsmodel AS (SELECT bk,
            CAST(ROUND(ROUND(LN(
              ((CAST(COALESCE(tc, 0) AS DOUBLE) + 1.0) /
                (CAST(tt AS DOUBLE) + $b)) /
              ((CAST(rc AS DOUBLE) + 1.0) /
                (CAST(rt AS DOUBLE) + $b))), 6) * 1e6) AS BIGINT) AS u
          FROM dsrawc LEFT JOIN dstgtc USING (bk) CROSS JOIN dstot),
        dsirsc AS (SELECT f.doc_id, COUNT(*) AS n_feats,
            CAST(SUM(m.u) AS BIGINT) AS sum_llr_u
          FROM dsfb f JOIN dsmodel m ON f.bk = m.bk GROUP BY 1)"""

  /** DuckDB twin of TextAnalysis.shingles (k-word windows, k>=1). */
  private def shinglesSql(tk: String, k: Int): String =
    s"""CASE WHEN len($tk) < $k THEN [array_to_string($tk, ' ')]
        ELSE [array_to_string($tk[i:i+${k - 1}], ' ')
              for i in generate_series(1, len($tk) - ${k - 1})] END"""

  private def hash60Sql(e: String): String = ParSql.hash60(e)

  /** Shared front half of q_warc_pipeline / q_warc_shards: synthesize
    * the four response archives once per corpus (404s at doc_id%7,
    * PDFs at %11, blocklist-tier hosts at %4, two archives gzip), then
    * run the curation chain — parse → HTTP-200 text/html gate → host
    * blocklist → HTML text/title extraction → link-density gate →
    * cross-doc paragraph dedup. Returns (doc_id, title, text). */
  /** Synthesize (once per corpus) the four response archives shared by
    * the WARC gates: part p holds doc_id%4==p, 404s at %7, PDFs at %11,
    * blocklist-tier hosts at %4, parts 1/3 gzip. Returns the archive
    * directory; file p is `part$p.warc` (`.gz` when p is odd). */
  private def warcArchiveDir(s: org.apache.spark.sql.SparkSession,
                             d: String): java.io.File = {
    import graft.sources.Warc
    val dir = new java.io.File(
      s"/tmp/graft_warcpipe_${math.abs(d.hashCode)}")
    if (!dir.exists()) {
      dir.mkdirs()
      val host = concat(col("source"), lit("."),
        when(col("doc_id") % 4 === 0, lit("blocked.example.com"))
          .when(col("doc_id") % 4 === 1, lit("ok.example.org"))
          .when(col("doc_id") % 4 === 2, lit("ads.tracker.net"))
          .otherwise(lit("clean.io")))
      val did = col("doc_id").cast("string")
      val html = concat(
        lit("<html><head><title>Doc "), did, lit(" &amp; Co</title>"),
        lit("</head><body><h1>"), col("source"),
        lit(" &lt;news&gt;</h1><p>"), col("text"), lit("</p>"),
        when(col("doc_id") % 3 === 0,
          lit("<p>See <a href=\"u\">the &quot;docs&quot;</a> here</p>"))
          .otherwise(lit("")),
        lit("</body></html>"))
      val rows = Tables.documents(s, d)
        .select(col("doc_id"), host.as("host"), html.as("html"))
        .collect()
      val date = "2026-01-01T00:00:00Z"
      (0 until 4).foreach { part =>
        val recs = Iterator(Warc.warcinfoRecord(
            s"urn:uuid:info-$part", date,
            Seq("isPartOf" -> s"p$part"))) ++
          rows.iterator.filter(_.getLong(0) % 4 == part).map { r =>
            val id = r.getLong(0)
            Warc.responseRecord(
              s"https://${r.getString(1)}/doc/$id",
              s"urn:uuid:resp-$id", date,
              r.getString(2).getBytes(
                java.nio.charset.StandardCharsets.UTF_8),
              httpContentType = if (id % 11 == 0) "application/pdf"
                else "text/html; charset=utf-8",
              status = if (id % 7 == 0) 404 else 200)
          }
        Warc.writeFile(recs,
          s"${dir.getPath}/part$part.warc${
            if (part % 2 == 1) ".gz" else ""}",
          gzip = part % 2 == 1)
      }
    }
    dir
  }

  /** Synthesized crawl pages for the link-graph gates: 29 hosts
    * (h0..h28.example.org), page doc_id lives on host doc_id%29 and —
    * unless doc_id%5==0 (a link-less page: its host can be dangling) —
    * links to hosts (doc_id·3+k²)%29 for k=1..3 (self-links occur and
    * must drop), plus one relative and one mailto anchor the
    * absolute-host extractor must ignore. */
  private[queries] def linkPages(s: org.apache.spark.sql.SparkSession,
                                 d: String): DataFrame = {
    def hostOf(e: org.apache.spark.sql.Column) =
      concat(lit("h"), (e % 29).cast("string"), lit(".example.org"))
    val did = col("doc_id")
    val anchors = when(did % 5 === 0, lit(""))
      .otherwise(concat((1 to 3).map(k => concat(
        lit("<a href=\"https://"), hostOf(did * 3 + k * k),
        lit(s"/p$k\">read <b>about</b> "), col("source"),
        lit(s" $k</a>"))): _*))
    Tables.documents(s, d).select(
      concat(lit("https://"), hostOf(did), lit("/doc/"),
        did.cast("string")).as("uri"),
      concat(lit("<html><body>"), anchors,
        lit("<a href=\"/local\">l</a>" +
          "<a href=\"mailto:x@y.z\">m</a></body></html>")).as("html"))
  }

  /** DuckDB twin of [[linkPages]] alone, a CTE ending in
    * `pg(uri, html)` (shared with the crawl-discovery gates). */
  private[queries] val linkPgSql: String = {
    def hostOf(e: String) =
      s"'h' || CAST(($e) % 29 AS VARCHAR) || '.example.org'"
    val anchors = (1 to 3).map(k =>
      s"'<a href=\"https://' || ${hostOf(s"doc_id*3+${k * k}")} || " +
        s"'/p$k\">read <b>about</b> ' || source || ' $k</a>'")
      .mkString(" || ")
    s"""pg AS (SELECT
          'https://' || ${hostOf("doc_id")} || '/doc/' ||
            CAST(doc_id AS VARCHAR) AS uri,
          '<html><body>' ||
            CASE WHEN doc_id % 5 = 0 THEN '' ELSE $anchors END ||
            '<a href="/local">l</a><a href="mailto:x@y.z">m</a>' ||
            '</body></html>' AS html
        FROM documents)"""
  }

  /** DuckDB twin of [[linkPages]] + `LinkGraph.edges` as a WITH-clause
    * body ending in `edges(src, dst, n)`. */
  private val linkEdgesSql: String = {
    def hostOf(e: String) =
      s"'h' || CAST(($e) % 29 AS VARCHAR) || '.example.org'"
    val anchors = (1 to 3).map(k =>
      s"'<a href=\"https://' || ${hostOf(s"doc_id*3+${k * k}")} || " +
        s"'/p$k\">read <b>about</b> ' || source || ' $k</a>'")
      .mkString(" || ")
    s"""$linkPgSql,
      lhr AS (SELECT
          CAST(regexp_extract(uri, '/doc/([0-9]+)$$', 1) AS BIGINT)
            AS did,
          lower(regexp_extract(uri, '(?i)^https?://([^/:?#]+)', 1))
            AS src,
          unnest(regexp_extract_all(html,
            '(?i)<a[ \t\n\r][^>]*href[ \t\n\r]*=[ \t\n\r]*"([^"]*)"', 1))
            AS href
        FROM pg),
      le0 AS (SELECT did, src,
          lower(regexp_extract(href, '(?i)^https?://([^/:?#]+)', 1))
            AS dst
        FROM lhr),
      edges AS (SELECT src, dst, COUNT(*) AS n FROM le0
        WHERE dst != '' AND src != dst GROUP BY 1, 2)"""
  }

  private def warcCurated(s: org.apache.spark.sql.SparkSession,
                          d: String): DataFrame = {
    import s.implicits._
    import graft.functions.Html
    import graft.operators.UrlCuration
    import graft.sources.Warc
    val dir = warcArchiveDir(s, d)
    val fetched = Warc.read(s, dir.getPath)
      .filter(col("warc_type") === "response" &&
        col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html"))
      .select(
        regexp_extract(col("target_uri"),
          "^https://([^/]+)/", 1).as("host"),
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        // charset-aware decode (all utf-8 here; q_warc_charset is the
        // gate that exercises the routing)
        Warc.payloadText(col("payload"), col("http_content_type"))
          .as("html"))
    val surv = UrlCuration.filterBlocklist(fetched, "host", "doc_id",
      Seq("blocked.example.com", "tracker.net").toDF("domain"))
    val extracted = surv.select(col("doc_id"),
        Html.htmlTitle(col("html")).as("title"),
        Html.htmlText(col("html")).as("text"),
        Par.r6(Html.linkDensity(col("html"))).as("ld"))
      .filter(col("ld") <= 0.02)
    val deduped = graft.operators.Dedup.paragraphDedup(
      extracted.select(col("doc_id"), col("text")), "doc_id", "text")
    deduped.join(extracted.select(col("doc_id"), col("title")),
        Seq("doc_id"))
      .select(col("doc_id"), col("title"), col("text"))
  }

  /** DuckDB twin of [[warcCurated]] as a WITH-clause body ending in
    * `wp(doc_id, title, text)` — shared by the q_warc_pipeline and
    * q_warc_shards oracles. */
  /** DuckDB twin of [[warcArchiveDir]]'s synthesized page html. */
  private val htmlSynSql: String =
    """'<html><head><title>Doc ' ||
        CAST(doc_id AS VARCHAR) ||
        ' &amp; Co</title></head><body><h1>' || source ||
        ' &lt;news&gt;</h1><p>' || text || '</p>' ||
        CASE WHEN doc_id % 3 = 0
          THEN '<p>See <a href="u">the &quot;docs&quot;</a> here</p>'
          ELSE '' END || '</body></html>'"""

  private lazy val warcPipeSql: String = {
    val htmlSyn = htmlSynSql
    s"""u AS (SELECT doc_id, source, text, source || '.' ||
          CASE WHEN doc_id % 4 = 0 THEN 'blocked.example.com'
               WHEN doc_id % 4 = 1 THEN 'ok.example.org'
               WHEN doc_id % 4 = 2 THEN 'ads.tracker.net'
               ELSE 'clean.io' END AS host
        FROM documents
        WHERE doc_id % 7 != 0 AND doc_id % 11 != 0),
      h AS (SELECT doc_id, $htmlSyn AS html FROM u
        WHERE NOT EXISTS (SELECT 1 FROM (VALUES
            ('blocked.example.com'), ('tracker.net')) b(domain)
          WHERE u.host = b.domain OR u.host LIKE '%.' || b.domain)),
      x AS (SELECT doc_id, ${htmlTitleSql("html")} AS title,
          ${htmlTextSql("html")} AS text_out, html FROM h),
      kept AS (SELECT doc_id, title, text_out FROM x
        WHERE ROUND(CAST(${htmlAnchorCharsSql("html")} AS DOUBLE) /
          NULLIF(length(text_out), 0), 6) <= 0.02),
      wpsp AS (SELECT doc_id, i - 1 AS para_idx, parts[i] AS para
        FROM (SELECT doc_id,
            string_split(text_out, chr(10)) AS parts,
            unnest(generate_series(1,
              len(string_split(text_out, chr(10))))) AS i
          FROM kept)
        WHERE trim(parts[i]) != ''),
      wpfirst AS (SELECT doc_id, para_idx, para, ROW_NUMBER() OVER (
          PARTITION BY para ORDER BY doc_id, para_idx) AS rn FROM wpsp),
      wp AS (SELECT k.doc_id, k.title,
          COALESCE(string_agg(f.para, chr(10) ORDER BY f.para_idx), '')
            AS text
        FROM kept k LEFT JOIN (SELECT * FROM wpfirst WHERE rn = 1) f
          ON k.doc_id = f.doc_id
        GROUP BY k.doc_id, k.title)"""
  }

  /** DuckDB twins of TextAnalysis.minHash: base-hash list from a shingle
    * list, and the per-seed affine-rehash signature over a `base` column
    * (same constants as minHashCoeffs). */
  private def minHashBaseSql(sh: String): String =
    s"[${hash60Sql("s")} % ${TA.MinHashP} for s in $sh]"
  private def minHashSigFromBase(seeds: Int): String =
    TA.minHashCoeffs(seeds).map { case (a, b) =>
      s"list_min([(x * $a + $b) % ${TA.MinHashP} for x in base])"
    }.mkString("[", ", ", "]")

  val all: Seq[Q] = Seq(

    // token counting (whitespace + BPE-ish subword estimate)
    Q("q_text_tokens",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        TA.tokenCount(col("text")).as("n_tok"),
        TA.subwordCount(col("text")).as("n_subword"),
        length(col("text")).as("n_char")),
      Some(s"""SELECT doc_id, len(${toksSql("text")}) AS n_tok,
        list_sum([CAST(CEIL(length(t) / 4.0) AS BIGINT)
                  for t in ${toksSql("text")}])::BIGINT AS n_subword,
        length(text) AS n_char FROM documents""")),

    // quality scoring (length/word-shape/alpha-ratio composite)
    Q("q_text_quality",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"), TA.qualityScore(col("text")).as("quality")),
      Some(s"""SELECT doc_id, ROUND(
        (CASE WHEN n_tok < 5 THEN 0.2 WHEN n_tok > 1000 THEN 0.5
              ELSE 1.0 END) * 0.4 +
        (CASE WHEN mean_word >= 3.0 AND mean_word <= 10.0 THEN 1.0
              ELSE 0.4 END) * 0.3 +
        alpha_ratio * 0.3, 4) AS quality
        FROM (SELECT doc_id,
          CAST(len(${toksSql("text")}) AS DOUBLE) AS n_tok,
          CAST(length(text) AS DOUBLE) /
            GREATEST(CAST(len(${toksSql("text")}) AS DOUBLE), 1.0) AS mean_word,
          CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) /
            GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS alpha_ratio
          FROM documents)""")),

    // Flesch reading-ease (r16): structural readability next to the
    // composite quality score — sentence/syllable shape, not length.
    // Docs decorate with 0/1/3-sentence tails by residue so the
    // sentence count actually varies; counts and the 4dp score are
    // bit-checked per document.
    Q("q_text_flesch",
      (s, d) => {
        val t = concat(col("text"),
          when(col("doc_id") % 3 === 1, lit(". extra tail here."))
            .when(col("doc_id") % 3 === 2,
              lit("! two more! and a third?"))
            .otherwise(lit("")))
        Tables.documents(s, d).select(col("doc_id"),
          TA.tokenCount(t).cast("long").as("n_words"),
          greatest(regexp_count(t, lit("[.!?]+")), lit(1)).cast("long")
            .as("n_sentences"),
          greatest(regexp_count(lower(t), lit("[aeiouy]+")), lit(1))
            .cast("long").as("n_syllables"),
          TA.fleschEase(t).as("flesch"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t0 AS (SELECT doc_id, text ||
          CASE WHEN doc_id % 3 = 1 THEN '. extra tail here.'
               WHEN doc_id % 3 = 2 THEN '! two more! and a third?'
               ELSE '' END AS t FROM documents),
        c AS (SELECT doc_id,
          CAST(len(${toksSql("t")}) AS BIGINT) AS n_words,
          GREATEST(CAST(len(regexp_extract_all(t, '[.!?]+'))
            AS BIGINT), 1) AS n_sentences,
          GREATEST(CAST(len(regexp_extract_all(lower(t), '[aeiouy]+'))
            AS BIGINT), 1) AS n_syllables
        FROM t0)
        SELECT doc_id, n_words, n_sentences, n_syllables,
          ROUND(206.835
            - 1.015 * (CAST(GREATEST(n_words, 1) AS DOUBLE) /
                n_sentences)
            - 84.6 * (CAST(n_syllables AS DOUBLE) /
                GREATEST(n_words, 1)), 4) AS flesch
        FROM c ORDER BY doc_id""")),

    // Mojibake repair (ftfy's fix_encoding — the step CC pipelines run
    // right after HTML extraction): documents decorated with non-ASCII
    // tails, then mis-decoded as Latin-1 in-gate (doc_id%5==0 left
    // clean, %4==0 double-corrupted — the two-bad-decodes-upstream
    // case), and the repaired text must equal the decorated ORIGINAL
    // byte-for-byte — which is what the oracle states directly from the
    // parquet. Clean rows prove the fixpoint never overshoots (a
    // repaired string re-encodes to invalid UTF-8); an edit gate over
    // full text, not a metric gate.
    Q("q_text_fix_encoding",
      (s, d) => {
        val deco = concat(col("text"),
          when(col("doc_id") % 3 === 0, lit(" café — naïve ½"))
            .when(col("doc_id") % 3 === 1, lit(" “smart” quotes™ €9"))
            .otherwise(lit(" русский 中文")))
        def moji(c: org.apache.spark.sql.Column) =
          decode(encode(c, "UTF-8"), "ISO-8859-1")
        val corrupted = when(col("doc_id") % 5 === 0, deco)
          .when(col("doc_id") % 4 === 0, moji(moji(deco)))
          .otherwise(moji(deco))
        Tables.documents(s, d).select(col("doc_id"),
            TA.fixEncoding(corrupted).as("text"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, text ||
          CASE WHEN doc_id % 3 = 0 THEN ' café — naïve ½'
               WHEN doc_id % 3 = 1 THEN ' “smart” quotes™ €9'
               ELSE ' русский 中文' END AS text
        FROM documents ORDER BY doc_id""")),

    // Unicode-script profile (the script-bucketing step multilingual
    // pipelines run before language ID — stopword langid is blind to
    // non-spaced scripts): documents decorated with Cyrillic / CJK /
    // digit tails by doc_id residue, then per-char script fractions
    // over explicit codepoint ranges (spelled as literals — Java and
    // RE2 disagree on \s and named script classes) and the dominant
    // label with a fixed tie-break. Every fraction and label replayed.
    Q("q_text_scripts",
      (s, d) => {
        val deco = concat(col("text"),
          when(col("doc_id") % 4 === 1, lit(" русский текст здесь"))
            .when(col("doc_id") % 4 === 2, lit(" 日本語のテキスト漢字"))
            .when(col("doc_id") % 4 === 3, lit(" 12345 67890"))
            .otherwise(lit("")))
        val p = TA.scriptProfile(deco)
        Tables.documents(s, d).select(col("doc_id"),
            p.getField("latin_frac").as("latin_frac"),
            p.getField("cyrillic_frac").as("cyrillic_frac"),
            p.getField("cjk_frac").as("cjk_frac"),
            p.getField("digit_frac").as("digit_frac"),
            p.getField("other_frac").as("other_frac"),
            p.getField("script").as("script"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH deco AS (SELECT doc_id, text ||
            CASE WHEN doc_id % 4 = 1 THEN ' русский текст здесь'
                 WHEN doc_id % 4 = 2 THEN ' 日本語のテキスト漢字'
                 WHEN doc_id % 4 = 3 THEN ' 12345 67890'
                 ELSE '' END AS t
          FROM documents),
        c AS (SELECT doc_id,
            length(t) - length(regexp_replace(t, '[A-Za-zÀ-ɏ]', '', 'g'))
              AS latin,
            length(t) - length(regexp_replace(t, '[Ѐ-ӿ]', '', 'g'))
              AS cyr,
            length(t) - length(regexp_replace(t, '[぀-ヿ一-鿿]', '', 'g'))
              AS cjk,
            length(t) - length(regexp_replace(t, '[0-9]', '', 'g'))
              AS digit,
            length(t) - length(regexp_replace(t, '[^ \t\n\r\f]', '', 'g'))
              AS nonws
          FROM deco),
        f AS (SELECT doc_id, latin, cyr, cjk, digit,
            nonws - latin - cyr - cjk - digit AS other,
            CAST(GREATEST(nonws, 1) AS DOUBLE) AS base
          FROM c)
        SELECT doc_id,
          ROUND(latin / base, 6) AS latin_frac,
          ROUND(cyr / base, 6) AS cyrillic_frac,
          ROUND(cjk / base, 6) AS cjk_frac,
          ROUND(digit / base, 6) AS digit_frac,
          ROUND(other / base, 6) AS other_frac,
          CASE WHEN latin >= cyr AND latin >= cjk AND latin >= digit
                 AND latin >= other THEN 'latin'
               WHEN cyr >= cjk AND cyr >= digit AND cyr >= other
                 THEN 'cyrillic'
               WHEN cjk >= digit AND cjk >= other THEN 'cjk'
               WHEN digit >= other THEN 'digit'
               ELSE 'other' END AS script
        FROM f ORDER BY doc_id""")),

    // language ID (stopword-ratio argmax; deterministic tiebreak)
    Q("q_text_langid",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"), TA.langId(col("text")).as("lang_pred"),
        Par.r6(TA.langScore(TA.tokens(col("text")), "en")).as("score_en")),
      Some {
        val langs = TA.stopwords.keys.toSeq.sorted
        def scoreSql(l: String) = {
          val list = TA.stopwords(l).map(w => s"'$w'").mkString("[", ",", "]")
          s"""(CAST(len(list_filter(tk, t -> list_contains($list, t)))
              AS DOUBLE) / CAST(GREATEST(len(tk), 1) AS DOUBLE))"""
        }
        val best = s"GREATEST(${langs.map(scoreSql).mkString(", ")})"
        val caseExpr = langs.reverse.foldLeft("'und'") { (acc, l) =>
          s"CASE WHEN ${scoreSql(l)} = best AND best > 0.0 THEN '$l' ELSE $acc END"
        }
        s"""SELECT doc_id, $caseExpr AS lang_pred,
          ROUND(${scoreSql("en")}, 6) AS score_en
          FROM (SELECT doc_id, ${toksSql("text")} AS tk,
            $best AS best FROM documents)"""
      }),

    // Classifier evaluation report (r17): the language-ID heuristic
    // evaluated against the corpus's gold lang labels — per class:
    // supports, tp/fp/fn, precision/recall/F1 (F1 via 2tp/(np+ng), no
    // null-chaining). 'und' predictions give a predicted-only class
    // (recall null); the oracle replays the langid predictor AND the
    // full-outer confusion math.
    Q("q_classifier_eval",
      (s, d) => graft.operators.Classifier.evalReport(
          Tables.documents(s, d).select(
            TA.langId(col("text")).as("pred"), col("lang")),
          "pred", "lang")
        .orderBy(col("label")),
      Some {
        val langs = TA.stopwords.keys.toSeq.sorted
        def scoreSql(l: String) = {
          val list = TA.stopwords(l).map(w => s"'$w'")
            .mkString("[", ",", "]")
          s"""(CAST(len(list_filter(tk, t -> list_contains($list, t)))
              AS DOUBLE) / CAST(GREATEST(len(tk), 1) AS DOUBLE))"""
        }
        val best = s"GREATEST(${langs.map(scoreSql).mkString(", ")})"
        val caseExpr = langs.reverse.foldLeft("'und'") { (acc, l) =>
          s"CASE WHEN ${scoreSql(l)} = best AND best > 0.0 " +
            s"THEN '$l' ELSE $acc END"
        }
        s"""WITH pr AS (SELECT $caseExpr AS p, lang AS g
          FROM (SELECT lang, ${toksSql("text")} AS tk,
            $best AS best FROM documents)),
        bg AS (SELECT g AS label, COUNT(*) AS n_gold,
            SUM(CASE WHEN p = g THEN 1 ELSE 0 END) AS tp
          FROM pr GROUP BY 1),
        bp AS (SELECT p AS label, COUNT(*) AS n_pred
          FROM pr GROUP BY 1),
        j AS (SELECT COALESCE(bg.label, bp.label) AS label,
            CAST(COALESCE(n_gold, 0) AS BIGINT) AS n_gold,
            CAST(COALESCE(n_pred, 0) AS BIGINT) AS n_pred,
            CAST(COALESCE(tp, 0) AS BIGINT) AS tp
          FROM bg FULL OUTER JOIN bp ON bg.label = bp.label)
        SELECT label, n_gold, n_pred, tp,
          CAST(n_pred - tp AS BIGINT) AS fp,
          CAST(n_gold - tp AS BIGINT) AS fn,
          CASE WHEN n_pred = 0 THEN NULL
            ELSE ROUND(CAST(tp AS DOUBLE) / n_pred, 6) END
            AS precision,
          CASE WHEN n_gold = 0 THEN NULL
            ELSE ROUND(CAST(tp AS DOUBLE) / n_gold, 6) END AS recall,
          CASE WHEN n_pred + n_gold = 0 THEN NULL
            ELSE ROUND(2.0 * tp / (n_pred + n_gold), 6) END AS f1
        FROM j ORDER BY label"""
      }),

    // document fingerprint (min-hash of 5-shingles — rolling-hash sketch)
    Q("q_text_fingerprint",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"), TA.fingerprint(col("text"), 5).as("fp")),
      Some(s"""SELECT doc_id,
        list_min([${hash60Sql("s")} for s in
          ${shinglesSql(s"(${toksSql("text")})", 5)}]) AS fp
        FROM documents""")),

    // MinHash signatures (8 seeded hashes over 3-shingles)
    // signature serialized to CSV — the driver's pandas compare cannot
    // sort array-typed columns; long→string renders identically in both
    // engines
    Q("q_dedup_minhash_sig",
      (s, d) => Dedup.minHashSignatures(
          Tables.documents(s, d), "text", "doc_id", 3, 4, 2)
        .select(col("doc_id"),
          array_join(transform(col("sig"), _.cast("string")), ",").as("sig")),
      Some(s"""SELECT doc_id,
        array_to_string(${minHashSigFromBase(8)}, ',') AS sig
        FROM (SELECT doc_id, ${minHashBaseSql("sh")} AS base
          FROM (SELECT doc_id, ${shinglesSql(s"(${toksSql("text")})", 3)} AS sh
            FROM documents))""")),

    // MinHash LSH near-dup pairs on the duplicated corpus
    Q("q_dedup_minhash_pairs",
      (s, d) => Dedup.minHashPairs(dupCorpus(Tables.documents(s, d)),
        "text", "doc_id", 3, 4, 2),
      Some {
        s"""WITH $corpusSql,
          sigs AS (SELECT doc_id, ${minHashSigFromBase(8)} AS sig
            FROM (SELECT doc_id, ${minHashBaseSql("sh")} AS base
              FROM (SELECT doc_id,
                ${shinglesSql(s"(${toksSql("text")})", 3)} AS sh
                FROM corpus))),
          ex AS (SELECT doc_id, sig,
            b.b AS band,
            md5(array_to_string(sig[b.b*2+1:b.b*2+2], ',')) AS key
            FROM sigs, (SELECT unnest(range(4)) AS b) b)
          SELECT DISTINCT a.doc_id AS id_a, e.doc_id AS id_b,
            CAST(len(list_filter([a.sig[i] = e.sig[i]
              for i in generate_series(1, 8)], x -> x)) AS DOUBLE) / 8
              AS est_jaccard
          FROM ex a JOIN ex e
            ON a.band = e.band AND a.key = e.key AND a.doc_id < e.doc_id"""
      }),

    // Deterministic train/val/test split: salted md5 bucket of the doc id —
    // reproducible on any cluster at any parallelism (no RNG state), the
    // standard split recipe for a 100 TB corpus. Oracle replays the same
    // md5 bucketing in DuckDB, so assignment is bit-checked, not just
    // proportionate.
    Q("q_sample_split",
      (s, d) => graft.operators.Sampling.hashSplit(
          Tables.documents(s, d), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          sum(graft.functions.Scalars.hash60(col("doc_id").cast("string"))
            % 1000003L).as("id_checksum"))
        .orderBy(col("split")),
      Some(s"""SELECT split, COUNT(*) AS n,
          CAST(SUM(${hash60Sql("CAST(doc_id AS VARCHAR)")} % 1000003)
            AS BIGINT) AS id_checksum
        FROM (SELECT doc_id,
            CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val'
                 WHEN b < 10000 THEN 'test' END AS split
          FROM (SELECT doc_id,
            ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")} % 10000 AS b
            FROM documents))
        GROUP BY split ORDER BY split""")),

    // StarCoder/The-Stack code-quality signals (Li 2023 §3): the corpus
    // reshaped into code-ish files — 4-token lines with deterministic
    // comment (#, //), and blank lines salted in by (doc_id+i) residues
    // — then per-file max/mean line length, alnum fraction, comment and
    // blank line fractions, and the published-threshold conjunct. The
    // oracle replays the line synthesis AND every metric, so each
    // division and each threshold compare is bit-checked.
    Q("q_code_signals",
      (s, d) => {
        val toks = TA.tokens(col("text"))
        val last = greatest(((size(toks) - 1) / 4).cast("int"), lit(0))
        val lines = transform(sequence(lit(0), last), i => {
          val body = array_join(slice(toks, i * 4 + 1, lit(4)), " ")
          when((col("doc_id") + i) % 7 === 0, lit(""))
            .when((col("doc_id") + i) % 5 === 0, concat(lit("# "), body))
            .when((col("doc_id") + i) % 11 === 0,
              concat(lit("// "), body))
            .otherwise(body)
        })
        // materialize the synthesized files ONCE: getField-on-struct
        // simplification would otherwise inline the line synthesis into
        // every signal field (~6 interpreted-HOF evaluations per row)
        val files = Tables.documents(s, d)
          .select(col("doc_id"), array_join(lines, "\n").as("t"))
          .localCheckpoint()
        val sig = TA.codeSignals(col("t"))
        files.select(col("doc_id"),
            sig.getField("max_line_len").cast("long").as("max_line_len"),
            sig.getField("mean_line_len").as("mean_line_len"),
            sig.getField("alnum_frac").as("alnum_frac"),
            sig.getField("comment_frac").as("comment_frac"),
            sig.getField("blank_frac").as("blank_frac"),
            sig.getField("code_pass").as("code_pass"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        lined AS (SELECT doc_id, list_transform(
            generate_series(0, greatest((len(tk) - 1) // 4, 0)),
            i -> CASE WHEN (doc_id + i) % 7 = 0 THEN ''
              WHEN (doc_id + i) % 5 = 0
                THEN '# ' || array_to_string(tk[i*4+1:i*4+4], ' ')
              WHEN (doc_id + i) % 11 = 0
                THEN '// ' || array_to_string(tk[i*4+1:i*4+4], ' ')
              ELSE array_to_string(tk[i*4+1:i*4+4], ' ') END) AS lines
          FROM tk),
        m AS (SELECT doc_id,
            CAST(list_aggregate(list_transform(lines, x -> length(x)),
              'max') AS BIGINT) AS max_line_len,
            ROUND(CAST(list_aggregate(list_transform(lines,
                x -> length(x)), 'sum') AS DOUBLE) /
              GREATEST(len(lines), 1), 6) AS mean_line_len,
            ROUND(CAST(length(regexp_replace(
                array_to_string(lines, chr(10)), '[^a-zA-Z0-9]', '', 'g'))
                AS DOUBLE) /
              GREATEST(length(array_to_string(lines, chr(10))), 1), 6)
              AS alnum_frac,
            ROUND(CAST(len(list_filter(lines, x ->
                regexp_matches(x, '^[ \t]*(#|//|--)'))) AS DOUBLE) /
              GREATEST(len(lines), 1), 6) AS comment_frac,
            ROUND(CAST(len(lines) - len(list_filter(lines, x ->
                regexp_matches(x, '^[ \t]*[^ \t\n]'))) AS DOUBLE) /
              GREATEST(len(lines), 1), 6) AS blank_frac
          FROM lined)
        SELECT doc_id, max_line_len, mean_line_len, alnum_frac,
          comment_frac, blank_frac,
          (max_line_len <= 1000 AND mean_line_len <= 100.0 AND
           alnum_frac >= 0.25) AS code_pass
        FROM m ORDER BY doc_id""")),

    // Gopher-style duplicate-"line" fraction (segments = space-separated
    // words on this corpus; real corpora pass "\n"). Pure projection.
    // Remaining Gopher quality rules (Rae 2021 Table A1): symbol/word
    // ratio, bullet + ellipsis line fractions, alphabetic-word fraction,
    // stopword hits, and the conjunct pass bit. All integer-count
    // divisions rounded 6dp — the oracle replays every rule bit-exactly.
    Q("q_text_gopher",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), TA.gopherSignals(col("text"), corpusStops).as("g"))
        .select(col("doc_id"),
          col("g.symbol_ratio").as("symbol_ratio"),
          col("g.bullet_frac").as("bullet_frac"),
          col("g.ellipsis_frac").as("ellipsis_frac"),
          col("g.alpha_frac").as("alpha_frac"),
          col("g.stop_hits").as("stop_hits"),
          col("g.gopher_pass").as("gopher_pass"))
        .orderBy(col("doc_id")),
      Some(s"""WITH sig AS (${gopherSigSql("documents")})
        SELECT doc_id, symbol_ratio, bullet_frac, ellipsis_frac,
          alpha_frac, stop_hits, gopher_pass
        FROM sig ORDER BY doc_id""")),

    Q("q_text_dupline",
      (s, d) => Tables.documents(s, d).select(col("doc_id"),
          graft.functions.Repetition
            .duplicateLineFraction(col("text"), " ").as("dup_line_frac"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
          round(CASE WHEN len(segs) > 0 THEN
            1.0 - CAST(len(list_distinct(segs)) AS DOUBLE) / len(segs)
            ELSE 0.0 END, 6) AS dup_line_frac
        FROM (SELECT doc_id,
            list_filter([trim(x) for x in string_split(text, ' ')],
              x -> x != '') AS segs
          FROM documents)
        ORDER BY doc_id""")),

    // Bloom-filter cross-batch dedup (Dolma BFF): a 65536-bit bloom
    // built over the even-id half of the corpus, every doc probed
    // against it. Probes are salted hash60 arithmetic, so the oracle
    // replays the exact bit positions — the per-doc verdict INCLUDING
    // any false positives is bit-checked, which is the point: the FP
    // behavior is deterministic, not sampled.
    Q("q_dedup_bloom",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val model = graft.operators.Dedup.bloomBuild(
          docs.filter(col("doc_id") % 2 === 0), col("text"), 65536, 3)
        docs.select(col("doc_id"),
            graft.operators.Dedup.bloomMightContain(model, col("text"))
              .as("bloom_hit"))
          .orderBy(col("doc_id"))
      },
      Some {
        val probes = (0 until 3).map(i =>
          s"${hash60Sql(s"'$i:' || text")} % 65536").mkString(", ")
        s"""WITH bpos AS (SELECT DISTINCT p FROM (
              SELECT unnest([$probes]) AS p FROM documents
              WHERE doc_id % 2 = 0)),
          bprobe AS (SELECT DISTINCT doc_id, p FROM (
            SELECT doc_id, unnest([$probes]) AS p FROM documents)),
          bhit AS (SELECT b.doc_id,
              COUNT(*) AS nprobes,
              COUNT(bpos.p) AS nset
            FROM bprobe b LEFT JOIN bpos ON b.p = bpos.p
            GROUP BY 1)
          SELECT doc_id, nset = nprobes AS bloom_hit
          FROM bhit ORDER BY doc_id"""
      }),

    // RefinedWeb-style within-doc repetition removal: every segment's
    // first occurrence survives in order, the rest are excised, and the
    // REBUILT TEXT is hash-checked against the oracle's min-index
    // first-occurrence replay — an edit gate, not a metric gate.
    Q("q_text_inner_dedup",
      (s, d) => Tables.documents(s, d).select(col("doc_id"),
          graft.functions.Repetition
            .dedupSegments(col("text"), " ").as("text_deduped"))
        .orderBy(col("doc_id")),
      Some(s"""WITH idsg AS (SELECT doc_id,
            list_filter([trim(x) for x in string_split(text, ' ')],
              x -> x != '') AS segs
          FROM documents),
        idex AS (SELECT doc_id, segs[i] AS seg, i
          FROM (SELECT doc_id, segs,
              unnest(generate_series(1, greatest(len(segs), 1))) AS i
            FROM idsg)
          WHERE i <= len(segs)),
        idfo AS (SELECT doc_id, seg, MIN(i) AS mi
          FROM idex GROUP BY 1, 2)
        SELECT s.doc_id,
          COALESCE(string_agg(f.seg, ' ' ORDER BY f.mi), '')
            AS text_deduped
        FROM idsg s LEFT JOIN idfo f ON s.doc_id = f.doc_id
        GROUP BY s.doc_id ORDER BY s.doc_id""")),

    // Gopher-style n-gram repetition (top-gram share + duplicated-gram
    // share of all 2-gram windows, count-based so tie-free): two keyed
    // aggregations, hash-partitioned — no per-row quadratic pass.
    Q("q_text_ngram_rep",
      (s, d) => graft.functions.Repetition.ngramRepetition(
          Tables.documents(s, d), "doc_id", "text", 2)
        .orderBy(col("doc_id")),
      Some(s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        g AS (SELECT doc_id,
          unnest([${hash60Sql("s")} for s in ${shinglesSql("tk", 2)}])
            AS g FROM tk),
        pg AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_windows,
          round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
            AS top_frac,
          round(CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS DOUBLE)
            / CAST(SUM(c) AS DOUBLE), 6) AS dup_frac
        FROM pg GROUP BY doc_id ORDER BY doc_id""")),

    // PII scrubbing: seed each doc with deterministic synthetic PII
    // (email, IP, SSN), scrub, and emit per-doc counts + a signature of
    // the scrubbed text. The oracle replays identical RE2/Java-compatible
    // patterns in DuckDB (with the 'g' flag — Spark replaces globally by
    // default), so placement AND replacement are bit-checked.
    Q("q_scrub_pii",
      (s, d) => {
        val pii = Tables.documents(s, d).select(col("doc_id"),
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"),
            lit("@example.com from 10.0."),
            (col("doc_id") % 256).cast("string"),
            lit(".7 ssn 123-45-6789")).as("t"))
        graft.operators.Scrub.scrub(pii, "t")
          .select(col("doc_id"),
            col("n_email").cast("long").as("n_email"),
            col("n_ipv4").cast("long").as("n_ipv4"),
            col("n_ssn").cast("long").as("n_ssn"),
            graft.functions.Scalars.hash60(col("t_scrubbed"))
              .as("scrub_sig"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH p AS (
          SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@example.com from 10.0.'
            || CAST(doc_id % 256 AS VARCHAR) || '.7 ssn 123-45-6789' AS t
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
            AS BIGINT) AS n_email,
          CAST(len(regexp_extract_all(t,
            '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
          CAST(len(regexp_extract_all(t,
            '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS BIGINT) AS n_ssn,
          ${hash60Sql("""regexp_replace(regexp_replace(regexp_replace(
              regexp_replace(t,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
              '<EMAIL>', 'g'),
              '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
              '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g'),
              '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g')""")}
            AS scrub_sig
        FROM p ORDER BY doc_id""")),

    // Luhn-validated card scrubbing — the PII tier a regex alone cannot
    // express (Dolma/FineWeb pair a digit-run candidate regex WITH the
    // mod-10 check so order ids survive while card numbers redact).
    // Docs decorate with: a fixed valid/invalid test card by residue
    // (separator formats vary), a DOC-VARYING 15-digit number whose
    // Luhn verdict the oracle must compute per document, an 8-digit
    // ref (too short — not a candidate) and a 20-digit blob (too long).
    // The oracle replays the candidate regex, digit extraction, the
    // full Luhn arithmetic, and the appearance-ordered valid list.
    Q("q_scrub_cards",
      (s, d) => {
        val deco = concat(col("text"), lit(" pay "),
          when(col("doc_id") % 3 === 0, lit("4111 1111 1111 1111"))
            .when(col("doc_id") % 3 === 1, lit("4111-1111-1111-1112"))
            .otherwise(lit("30569309025904")),
          lit(" card 35"),
          lpad(((col("doc_id") * 7919) % 10000000000000L).cast("string"),
            13, "0"),
          lit(" ref "),
          lpad((col("doc_id") % 100000000L).cast("string"), 8, "0"),
          lit(" num 12345678901234567890"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            graft.operators.Scrub.cardScrub(deco).as("cc"))
          .select(col("doc_id"),
            col("cc.n_candidates").cast("long").as("n_candidates"),
            col("cc.n_valid").cast("long").as("n_valid"),
            col("cc.valid_cards").as("valid_cards"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, text || ' pay ' ||
            CASE WHEN doc_id % 3 = 0 THEN '4111 1111 1111 1111'
                 WHEN doc_id % 3 = 1 THEN '4111-1111-1111-1112'
                 ELSE '30569309025904' END
            || ' card 35' ||
            lpad(CAST((doc_id * 7919) % 10000000000000 AS VARCHAR),
              13, '0')
            || ' ref ' ||
            lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0')
            || ' num 12345678901234567890' AS x
          FROM documents),
        ca AS (SELECT doc_id,
            regexp_extract_all(x, '[0-9](?:[ -]?[0-9])+', 0) AS cs
          FROM t),
        cx AS (SELECT doc_id, i, cs[i] AS cand FROM (
            SELECT doc_id, cs,
              unnest(generate_series(1, len(cs))) AS i FROM ca)),
        dd AS (SELECT doc_id, i, cand,
            regexp_replace(cand, '[^0-9]', '', 'g') AS ds FROM cx),
        cc AS (SELECT * FROM dd
          WHERE length(ds) BETWEEN 13 AND 19),
        lu AS (SELECT doc_id, i, cand,
            (list_sum(list_transform(generate_series(1, length(ds)),
              k -> CASE WHEN (length(ds) - k) % 2 = 0
                   THEN CAST(ds[k] AS INT)
                   ELSE CASE WHEN 2 * CAST(ds[k] AS INT) > 9
                        THEN 2 * CAST(ds[k] AS INT) - 9
                        ELSE 2 * CAST(ds[k] AS INT) END END)) % 10 = 0)
              AS ok
          FROM cc),
        agg AS (SELECT doc_id, COUNT(*) AS n_candidates,
            SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS n_valid,
            COALESCE(string_agg(CASE WHEN ok THEN cand END, '|'
              ORDER BY i), '') AS valid_cards
          FROM lu GROUP BY 1)
        SELECT d.doc_id,
          CAST(COALESCE(a.n_candidates, 0) AS BIGINT) AS n_candidates,
          CAST(COALESCE(a.n_valid, 0) AS BIGINT) AS n_valid,
          COALESCE(a.valid_cards, '') AS valid_cards
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        ORDER BY d.doc_id""")),

    // Weighted source mixing: per-source deterministic downsampling
    // (wiki 100%, web 40%, logs 5% style). Oracle replays the salted
    // per-source md5 bucket, so WHICH rows survive is bit-checked.
    Q("q_sample_mix",
      (s, d) => graft.operators.Sampling.mixSources(
          Tables.documents(s, d), "doc_id", "source",
          Map("src0" -> 0.4, "src1" -> 0.05))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(graft.functions.Scalars.hash60(col("doc_id").cast("string"))
            % 1000003L).as("id_checksum"))
        .orderBy(col("source")),
      Some(s"""SELECT source, COUNT(*) AS n,
          CAST(SUM(${hash60Sql("CAST(doc_id AS VARCHAR)")} % 1000003)
            AS BIGINT) AS id_checksum
        FROM (SELECT doc_id, source,
            ${hash60Sql(
              "'graft:' || source || ':' || CAST(doc_id AS VARCHAR)")}
              % 10000 AS b
          FROM documents)
        WHERE b < (CASE source WHEN 'src0' THEN 4000
                   WHEN 'src1' THEN 500 ELSE 10000 END)
        GROUP BY source ORDER BY source""")),

    // Stratified quality gate (r15 — CCNet keeps the best perplexity
    // bucket PER LANGUAGE, FineWeb filters per dump: a global score
    // threshold would let one high-resource stratum crowd the tail
    // strata out): top ceil(0.3·n_s) per source by (score desc, id),
    // exact DECIMAL threshold arithmetic (10·0.3 in doubles is
    // 3.0000000000000004 and would ceil to 4). Survivors bit-checked.
    Q("q_quality_stratified",
      (s, d) => {
        val scored = Tables.documents(s, d).select(col("doc_id"),
          col("source"),
          (((col("doc_id") * 37) % 1000).cast("double") / 10)
            .as("score"))
        graft.operators.Sampling.keepTopFraction(scored, "source",
            "score", "doc_id", frac = 0.3)
          .orderBy(col("doc_id"))
      },
      Some("""WITH s AS (SELECT doc_id, source,
          CAST((doc_id * 37) % 1000 AS DOUBLE) / 10 AS score
        FROM documents),
        c AS (SELECT source, COUNT(*) AS n FROM s GROUP BY source),
        r AS (SELECT s.doc_id, s.source, s.score,
          ROW_NUMBER() OVER (PARTITION BY s.source
            ORDER BY s.score DESC, s.doc_id) AS rk,
          CAST(CEIL(c.n * CAST(0.3 AS DECIMAL(10,4))) AS BIGINT) AS cut
        FROM s JOIN c USING (source))
        SELECT doc_id, source, score FROM r WHERE rk <= cut
        ORDER BY doc_id""")),

    // Temperature-flattened source mixing (p_s ∝ n_s^τ at τ=0.5): the
    // oracle re-learns the per-source counts, re-derives each keep rate
    // (n_min/n_s)^(1-τ), re-rounds the 1/10000 threshold, and replays the
    // salted-hash filter — survivor set bit-checked per source.
    Q("q_sample_temperature",
      (s, d) => graft.operators.Sampling.mixByTemperature(
          Tables.documents(s, d), "doc_id", "source", tau = 0.5)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(graft.functions.Scalars.hash60(col("doc_id").cast("string"))
            % 1000003L).as("id_checksum"))
        .orderBy(col("source")),
      Some(s"""WITH srcn AS (
          SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
        thr AS (
          SELECT source,
            CAST(FLOOR(POW((SELECT MIN(cnt) FROM srcn) * 1.0 / cnt, 0.5)
              * 10000 + 0.5) AS BIGINT) AS t
          FROM srcn)
        SELECT d.source, COUNT(*) AS n,
          CAST(SUM(${hash60Sql("CAST(d.doc_id AS VARCHAR)")} % 1000003)
            AS BIGINT) AS id_checksum
        FROM documents d JOIN thr ON d.source = thr.source
        WHERE ${hash60Sql(
          "'graft:' || d.source || ':' || CAST(d.doc_id AS VARCHAR)")}
          % 10000 < thr.t
        GROUP BY d.source ORDER BY d.source""")),

    // Importance (weighted) sampling: each doc keeps with probability =
    // its per-row weight (here a deterministic stand-in score). Oracle
    // replays the salted md5 bucket AND the half-up weight threshold, so
    // WHICH rows survive is bit-checked.
    Q("q_sample_weight",
      (s, d) => graft.operators.Sampling.sampleByWeight(
          Tables.documents(s, d)
            .withColumn("w", (col("doc_id") % 100).cast("double") / 100.0),
          "doc_id", "w")
        .select(col("doc_id"), col("w")),
      Some(s"""SELECT doc_id, CAST(doc_id % 100 AS DOUBLE) / 100.0 AS w
        FROM documents
        WHERE ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")} % 10000
          < FLOOR((CAST(doc_id % 100 AS DOUBLE) / 100.0) * 10000 + 0.5)""")),

    // Deterministic per-key reservoir: exactly 5 docs per source chosen
    // by salted hash order — the stratified eval-carving / few-shot-pool
    // sampler. Oracle replays the hash ranking per source.
    Q("q_sample_reservoir",
      (s, d) => graft.operators.Sampling.reservoirPerKey(
          Tables.documents(s, d), Seq("source"), "doc_id", k = 5)
        .select(col("doc_id"), col("source"), col("sample_rank"))
        .orderBy(col("source"), col("sample_rank")),
      Some(s"""SELECT doc_id, source, sample_rank FROM (
          SELECT doc_id, source, CAST(ROW_NUMBER() OVER (
            PARTITION BY source
            ORDER BY ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")},
              doc_id) AS INT) AS sample_rank
          FROM documents)
        WHERE sample_rank <= 5 ORDER BY source, sample_rank""")),

    // Dedup canonicalization: case/punct/whitespace-insensitive canonical
    // forms + the dup groups exact dedup finds ONLY after canonicalizing
    // (raw-distinct texts that collide post-canon). Both the canon string
    // and the group assignment are bit-checked.
    Q("q_text_canon",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val canon = docs.select(col("doc_id"),
          Dedup.canonicalize(col("text")).as("canon"))
        canon.withColumn("canon_rep",
            min(col("doc_id")).over(Window.partitionBy(col("canon"))))
          .select(col("doc_id"), col("canon"), col("canon_rep"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, canon,
          MIN(doc_id) OVER (PARTITION BY canon) AS canon_rep
        FROM (SELECT doc_id,
          trim(regexp_replace(regexp_replace(lower(text),
            '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS canon
          FROM documents)
        ORDER BY doc_id""")),

    // Unicode NFC normalization (UAX #15 — engine-independent by spec, so
    // DuckDB's nfc_normalize replays the JDK Normalizer byte-for-byte).
    // The ASCII corpus is decorated with DECOMPOSED sequences (combining
    // acute U+0301, combining ring U+030A) so composition is exercised on
    // every row; the codepoint length drop (2 combining marks fold into
    // their bases) is asserted alongside the bytes.
    Q("q_text_nfc",
      (s, d) => {
        val decorated = concat(col("text"),
          lit(" café Åb"))
        Tables.documents(s, d).select(col("doc_id"),
            graft.functions.TextAnalysis.nfcNormalize(decorated)
              .as("nfc_text"),
            (length(decorated) - length(graft.functions.TextAnalysis
              .nfcNormalize(decorated))).cast("long").as("folded"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
          nfc_normalize(text || ' cafe' || chr(769) || ' A' || chr(778)
            || 'b') AS nfc_text,
          CAST(length(text || ' cafe' || chr(769) || ' A' || chr(778)
            || 'b') - length(nfc_normalize(text || ' cafe' || chr(769)
            || ' A' || chr(778) || 'b')) AS BIGINT) AS folded
        FROM documents ORDER BY doc_id""")),

    // Reproducible epoch shuffle: dense global positions in salted-hash
    // order. Oracle replays the hash and the (hash, id) dense rank — the
    // full permutation is bit-checked.
    Q("q_sample_shuffle",
      (s, d) => graft.operators.Sampling.epochShuffle(
          Tables.documents(s, d).select(col("doc_id")), "doc_id",
          epoch = 3)
        .select(col("doc_id"), col("shuffle_pos"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
          ROW_NUMBER() OVER (ORDER BY
            ${hash60Sql("'graft:3:' || CAST(doc_id AS VARCHAR)")},
            doc_id) - 1 AS shuffle_pos
        FROM documents ORDER BY doc_id""")),

    // Benchmark decontamination: corpus docs sharing any 5-token shingle
    // with the benchmark subset (doc_id % 97 = 0 plays the eval set) are
    // flagged — the n-gram-overlap decontamination step of every training
    // pipeline. Bench shingle hashes broadcast; the corpus never shuffles.
    // Oracle replays tokenize→shingle→hash60 in DuckDB.
    // the eval-set shingle build is the SETUP phase (one-time per
    // eval-set version in a real pipeline — and the former cold-scale
    // flag's whole margin); the measured run is the recurring work:
    // corpus scan + broadcast probe
    // SEMANTIC decontamination — the embedding twin of the n-gram gate
    // (a paraphrased benchmark item shares no 5-shingle but DOES share
    // an embedding neighborhood): corpus vectors whose cosine to ANY
    // benchmark vector (every 17th, so the planted contamination is the
    // identical vector at cos 1.0) reaches 0.95 drop; the bench
    // broadcasts onto one corpus scan.
    Q("q_decontaminate_semantic",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"))
        val bench = emb.filter(col("vec_id") % 17 === 0)
          .select(col("embedding").as("bvec"))
        graft.operators.Decontaminate.cleanSemantic(emb, "vec_id",
            "embedding", bench, "bvec", cut = 0.95)
          .select(col("vec_id")).orderBy(col("vec_id"))
      },
      Some(s"""WITH b AS (SELECT embedding AS bv FROM embeddings
          WHERE vec_id % 17 = 0),
        fl AS (SELECT DISTINCT e.vec_id FROM embeddings e, b
          WHERE ROUND(${cosSql("e.embedding", "b.bv")}, 6) >= 0.95)
        SELECT vec_id FROM embeddings
        WHERE vec_id NOT IN (SELECT vec_id FROM fl)
        ORDER BY vec_id""")),

    Q("q_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Decontaminate.flaggedWith(docs, "text", "doc_id",
          graft.operators.Decontaminate.benchShingles(
            docs.filter(col("doc_id") % 97 === 0), "text", 5), 5)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        sh AS (SELECT doc_id,
          list_distinct([${hash60Sql("s")} for s in ${shinglesSql("tk", 5)}])
            AS shs FROM tk),
        csh AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
        bsh AS (SELECT DISTINCT unnest(shs) AS sh FROM sh
          WHERE doc_id % 97 = 0)
        SELECT DISTINCT c.doc_id FROM csh c JOIN bsh b USING (sh)
        ORDER BY doc_id"""),
      setup = Some((s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Decontaminate.benchShingles(
          docs.filter(col("doc_id") % 97 === 0), "text", 5)
        ()
      })),

    // Contamination REPORT (r16): the graded twin of q_decontaminate's
    // binary flag — per document, distinct-shingle count, benchmark
    // hits, and the overlap fraction pipelines threshold on ("drop
    // above 20% dirty") instead of flag-any. Bench docs themselves
    // read 1.0; sharing docs grade in between; clean docs 0.0 — all
    // three bands bit-checked.
    Q("q_decontam_frac",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Decontaminate.overlapFraction(docs, "text",
            "doc_id",
            graft.operators.Decontaminate.benchShingles(
              docs.filter(col("doc_id") % 97 === 0), "text", 5), 5)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        sh AS (SELECT doc_id,
          list_distinct([${hash60Sql("s")} for s in ${shinglesSql("tk", 5)}])
            AS shs FROM tk),
        csh AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
        bsh AS (SELECT DISTINCT unnest(shs) AS sh FROM sh
          WHERE doc_id % 97 = 0)
        SELECT c.doc_id, COUNT(*) AS n_shingles,
          CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
          ROUND(CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*), 6) AS overlap_frac
        FROM csh c LEFT JOIN bsh b USING (sh)
        GROUP BY c.doc_id ORDER BY c.doc_id"""),
      setup = Some((s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Decontaminate.benchShingles(
          docs.filter(col("doc_id") % 97 === 0), "text", 5)
        ()
      })),

    // Corpus duplication profile (r16): the pre-dedup data-card
    // histogram — groups of each size and the documents they hold.
    // Synthesis: every doc gets an exact twin, every 5th a triple —
    // so the profile must read exactly {2: the non-%5 docs,
    // 3: the %5 docs} with zero singletons.
    Q("q_dedup_profile",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
        val corpus = base
          .unionAll(base.select((col("doc_id") + 100000).as("doc_id"),
            col("text")))
          .unionAll(base.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 200000).as("doc_id"), col("text")))
        Dedup.duplicationProfile(corpus, "text")
      },
      Some("""WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 100000, text FROM documents
          UNION ALL SELECT doc_id + 200000, text FROM documents
            WHERE doc_id % 5 = 0),
        g AS (SELECT text, COUNT(*) AS group_size FROM corpus
          GROUP BY text)
        SELECT group_size, COUNT(*) AS n_groups,
          CAST(SUM(group_size) AS BIGINT) AS n_docs
        FROM g GROUP BY group_size ORDER BY group_size""")),

    // STREAMING manifest maintenance (r16): continuous attestation —
    // 4 micro-batches each append their partial shard manifest;
    // partials fold exactly (sums add, ranges min/max, fingerprints
    // add mod 2^61−1), so the folded result must equal the batch
    // manifest over everything ingested — which the oracle states
    // closed-form. In-gate: replaying a COMMITTED batch tag must not
    // change the manifest.
    Q("q_stream_manifest",
      (s, d) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        val name = s"mani_${CorpusKey.of(d)}"
        graft.operators.Packing.dropManifest(s, name)
        val rows = Tables.documents(s, d)
          .select(col("doc_id"), col("text"),
            (col("doc_id") % 7).as("shard"))
          .orderBy(col("doc_id")).as[(Long, String, Long)].collect()
        val chunk = math.max(1, math.ceil(rows.length / 4.0).toInt)
        val mem = MemoryStream[(Long, String, Long)]
        val q = graft.streaming.Streams.manifestSink(
          mem.toDF().toDF("doc_id", "text", "shard"), "shard",
          "doc_id", "text", name, streamTag = Some("mq")) { _ => () }
          .start()
        rows.grouped(chunk).foreach { c =>
          mem.addData(c.toSeq: _*)
          q.processAllAvailable()
        }
        q.stop()
        val before = graft.operators.Packing.loadManifest(s, name)
          .agg(sum(col("n_docs"))).head.getLong(0)
        graft.operators.Packing.ingestManifest(s,
          rows.take(chunk).toSeq.toDF("doc_id", "text", "shard"),
          "shard", "doc_id", "text", name, "mq_0")
        require(graft.operators.Packing.loadManifest(s, name)
          .agg(sum(col("n_docs"))).head.getLong(0) == before,
          "replayed committed manifest tag must no-op")
        graft.operators.Packing.loadManifest(s, name)
          .orderBy(col("shard"))
      },
      Some(s"""SELECT doc_id % 7 AS shard, COUNT(*) AS n_docs,
          CAST(SUM(len(${toksSql("text")})) AS BIGINT) AS n_tokens,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          CAST(SUM(CAST(${hash60Sql("text")} AS HUGEINT))
            % 2305843009213693951 AS BIGINT) AS fingerprint
        FROM documents GROUP BY 1 ORDER BY shard""")),

    // Curriculum ordering (r16): a GLOBAL easy→hard position by
    // quality score, computed as the range-bucketed two-pass prefix
    // sum (never a single-partition global window). The oracle IS the
    // single global rank — ROW_NUMBER over (score, id-string) — so
    // the distributed bucket+offset math must equal it exactly, which
    // the monotone bucketing guarantees; quality ties are common at
    // 4dp, forcing the id-string tie-break on both engines.
    Q("q_curriculum_order",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"),
          TA.qualityScore(col("text")).as("score"))
        graft.operators.Layout.curriculumOrder(docs, "doc_id",
            "score", lo = 0.0, hi = 1.0, buckets = 8)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH q AS (SELECT doc_id, ROUND(
          (CASE WHEN n_tok < 5 THEN 0.2 WHEN n_tok > 1000 THEN 0.5
                ELSE 1.0 END) * 0.4 +
          (CASE WHEN mean_word >= 3.0 AND mean_word <= 10.0 THEN 1.0
                ELSE 0.4 END) * 0.3 +
          alpha_ratio * 0.3, 4) AS score
        FROM (SELECT doc_id,
          CAST(len(${toksSql("text")}) AS DOUBLE) AS n_tok,
          CAST(length(text) AS DOUBLE) /
            GREATEST(CAST(len(${toksSql("text")}) AS DOUBLE), 1.0)
            AS mean_word,
          CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
            AS DOUBLE) /
            GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS alpha_ratio
          FROM documents))
        SELECT doc_id, score,
          CAST(ROW_NUMBER() OVER (
            ORDER BY score, CAST(doc_id AS VARCHAR)) - 1 AS BIGINT)
            AS curriculum_pos
        FROM q ORDER BY doc_id""")),

    // Split-leakage report (r16): the audit that MEASURES what
    // splitByCluster prevents — a corpus with exact-duplicate twins
    // split by id hash (the naive split) leaks twins across the
    // train/eval boundary, and every leaked val/test document is
    // reported. The companion q_split_leakproof shows the prevention;
    // this gate quantifies the failure mode it closes.
    Q("q_split_leak_report",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
        val corpus = base.unionAll(base.select(
          (col("doc_id") + 100000).as("doc_id"), col("text")))
        val labeled = graft.operators.Sampling.hashSplit(corpus,
          "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        graft.operators.Sampling.splitLeakage(labeled, "doc_id",
            "text")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000, text FROM documents),
        lab AS (SELECT doc_id, text,
          CASE WHEN ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")}
              % 10000 < 8000 THEN 'train'
            WHEN ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")}
              % 10000 < 9000 THEN 'val'
            ELSE 'test' END AS split
          FROM corpus),
        tr AS (SELECT DISTINCT ${hash60Sql("text")} AS h FROM lab
          WHERE split = 'train')
        SELECT doc_id, split FROM lab
        WHERE split <> 'train' AND ${hash60Sql("text")} IN
          (SELECT h FROM tr)
        ORDER BY doc_id""")),

    // Near-dup split leakage (r16): the tier exact hashing cannot see
    // — the dupCorpus twins differ by their first word, so
    // q_split_leak_report's exact-hash audit finds NOTHING here, while
    // the minhash-pair tier reports every eval doc whose lightly-
    // edited twin landed in train under the naive id-hash split.
    Q("q_split_leak_near",
      (s, d) => {
        val docs = dupCorpus(Tables.documents(s, d))
        val labeled = graft.operators.Sampling.hashSplit(
          docs.select(col("doc_id"), col("text")), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        graft.operators.Sampling.splitLeakageNear(labeled,
            Dedup.minHashPairs(docs, "text", "doc_id", 3, 4, 2),
            "doc_id")
          .orderBy(col("doc_id"))
      },
      Some {
        s"""WITH $corpusSql,
          sigs AS (SELECT doc_id, ${minHashSigFromBase(8)} AS sig
            FROM (SELECT doc_id, ${minHashBaseSql("sh")} AS base
              FROM (SELECT doc_id,
                ${shinglesSql(s"(${toksSql("text")})", 3)} AS sh
                FROM corpus))),
          ex AS (SELECT doc_id, sig,
            b.b AS band,
            md5(array_to_string(sig[b.b*2+1:b.b*2+2], ',')) AS key
            FROM sigs, (SELECT unnest(range(4)) AS b) b),
          pairs AS (SELECT DISTINCT a.doc_id AS id_a, e.doc_id AS id_b
            FROM ex a JOIN ex e
            ON a.band = e.band AND a.key = e.key AND a.doc_id < e.doc_id),
          edges AS (SELECT id_a AS s, id_b AS t FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
          lab AS (SELECT doc_id,
            CASE WHEN ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")}
                % 10000 < 8000 THEN 'train'
              WHEN ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")}
                % 10000 < 9000 THEN 'val'
              ELSE 'test' END AS split
            FROM corpus),
          tr AS (SELECT doc_id FROM lab WHERE split = 'train'),
          lk AS (SELECT DISTINCT e.s AS doc_id FROM edges e
            JOIN tr ON e.t = tr.doc_id)
        SELECT l.doc_id, l.split FROM lab l JOIN lk USING (doc_id)
        WHERE l.split <> 'train' ORDER BY doc_id"""
      }),

    // Paragraph-level decontamination (r16): the surgical tier — drop
    // only the leaked LINES and rebuild the document, instead of
    // discarding whole documents for one contaminated paragraph. Docs
    // line as 4-token rows (the q_dedup_paragraphs synthesis); bench =
    // all 4-gram shingles of every 13th doc, so each aligned line of a
    // %13 doc (and its duplicates anywhere) vanishes from the rebuilt
    // text while sub-4-token tail lines provably survive (a shorter
    // whole-line shingle can't equal any 4-gram). Rebuilt texts
    // bit-checked per document.
    Q("q_para_decontam",
      (s, d) => {
        val toks = TA.tokens(col("text"))
        val last = greatest(((size(toks) - 1) / 4).cast("int"), lit(0))
        val lines = transform(sequence(lit(0), last),
          i => array_join(slice(toks, i * 4 + 1, lit(4)), " "))
        val docs = Tables.documents(s, d).select(col("doc_id"),
          array_join(lines, "\n").as("text"))
        val bench = graft.operators.Decontaminate.benchShingles(
          Tables.documents(s, d).filter(col("doc_id") % 13 === 0),
          "text", 4)
        graft.operators.Decontaminate.cleanParagraphs(docs, "text",
            "doc_id", bench, 4)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        lined AS (SELECT doc_id, array_to_string(list_transform(
            generate_series(0, greatest((len(tk) - 1) // 4, 0)),
            i -> array_to_string(tk[i*4+1:i*4+4], ' ')), chr(10)) AS text
          FROM tk),
        sp AS (SELECT doc_id, i - 1 AS para_idx, parts[i] AS para
          FROM (SELECT doc_id, string_split(text, chr(10)) AS parts,
              unnest(generate_series(1,
                len(string_split(text, chr(10))))) AS i
            FROM lined)
          WHERE trim(parts[i]) != ''),
        bsh AS (SELECT DISTINCT unnest(list_distinct(
            [${hash60Sql("s")} for s in ${shinglesSql("tk", 4)}])) AS sh
          FROM tk WHERE doc_id % 13 = 0),
        kept AS (SELECT * FROM sp
          WHERE ${hash60Sql("para")} NOT IN (SELECT sh FROM bsh))
        SELECT d.doc_id,
          COALESCE(string_agg(k.para, chr(10) ORDER BY k.para_idx), '')
            AS text
        FROM lined d LEFT JOIN kept k ON d.doc_id = k.doc_id
        GROUP BY d.doc_id ORDER BY d.doc_id"""),
      setup = Some((s, d) => {
        graft.operators.Decontaminate.benchShingles(
          Tables.documents(s, d).filter(col("doc_id") % 13 === 0),
          "text", 4)
        ()
      })),

    // Eval-side contamination (r16): the REVERSED report direction —
    // per BENCHMARK item, the fraction of its shingles found anywhere
    // in the training corpus (the model-card number). Direction
    // matters at scale: the corpus shingle set can never broadcast,
    // so the bench (id, shingle) pairs are the build side and only
    // matched pairs leave the corpus scan. Bench = the %97 docs,
    // corpus = everything else — duplicate texts in the corpus put
    // some bench items at 1.0, unshared ones at 0.0, paragraph
    // sharers in between.
    Q("q_eval_contam",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Decontaminate.evalContamination(
            docs.filter(col("doc_id") % 97 =!= 0), "text",
            docs.filter(col("doc_id") % 97 === 0)
              .select(col("doc_id").as("bench_id"), col("text")),
            "text", "bench_id", 5)
          .orderBy(col("bench_id"))
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        sh AS (SELECT doc_id,
          list_distinct([${hash60Sql("s")} for s in ${shinglesSql("tk", 5)}])
            AS shs FROM tk),
        bsh AS (SELECT doc_id AS bench_id, unnest(shs) AS sh FROM sh
          WHERE doc_id % 97 = 0),
        csh AS (SELECT DISTINCT unnest(shs) AS sh FROM sh
          WHERE doc_id % 97 <> 0),
        tot AS (SELECT bench_id, COUNT(*) AS n_shingles FROM bsh
          GROUP BY 1),
        hit AS (SELECT bench_id, COUNT(*) AS n_hit
          FROM bsh JOIN csh USING (sh) GROUP BY 1)
        SELECT t.bench_id, t.n_shingles,
          COALESCE(h.n_hit, 0) AS n_hit,
          ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_shingles, 6)
            AS contam_frac
        FROM tot t LEFT JOIN hit h USING (bench_id)
        ORDER BY bench_id""")),

    // Near-dup eval contamination (r16): the paraphrase tier — bench
    // items (the %97 docs with their FIRST WORD STRIPPED — no
    // verbatim duplicate of a bench TEXT exists in the corpus, their
    // originals do) flagged when a corpus doc shares an LSH band AND ≥6 of 8
    // minhash rows. The oracle replays the band join and the
    // agreement refine — LSH pruning is part of the contract at
    // minAgree<1, so it must be replayed, not shortcut.
    Q("q_eval_contam_near",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Decontaminate.flaggedNearDup(
            docs, "text", "doc_id",
            docs.filter(col("doc_id") % 97 === 0)
              .select(col("doc_id").as("bench_id"),
                regexp_replace(col("text"), "^\\S+\\s+", "")
                  .as("btext")),
            "btext", "bench_id", minAgree = 0.75)
          .orderBy(col("bench_id"))
      },
      Some(s"""WITH cs AS (
          SELECT doc_id, ${minHashSigFromBase(8)} AS sig
          FROM (SELECT doc_id, ${minHashBaseSql("sh")} AS base
            FROM (SELECT doc_id,
              ${shinglesSql(s"(${toksSql("text")})", 3)} AS sh
              FROM documents))),
        bs AS (
          SELECT doc_id AS bench_id, ${minHashSigFromBase(8)} AS sig
          FROM (SELECT doc_id, ${minHashBaseSql("sh")} AS base
            FROM (SELECT doc_id,
              ${shinglesSql(s"(${toksSql("bt")})", 3)} AS sh
              FROM (SELECT doc_id,
                regexp_replace(text, '^\\S+\\s+', '') AS bt
                FROM documents WHERE doc_id % 97 = 0)))),
        exc AS (SELECT doc_id, sig, b.b AS band,
            md5(array_to_string(sig[b.b*2+1:b.b*2+2], ',')) AS key
          FROM cs, (SELECT unnest(range(4)) AS b) b),
        exb AS (SELECT bench_id, sig, b.b AS band,
            md5(array_to_string(sig[b.b*2+1:b.b*2+2], ',')) AS key
          FROM bs, (SELECT unnest(range(4)) AS b) b)
        SELECT DISTINCT b.bench_id
        FROM exb b JOIN exc c ON b.band = c.band AND b.key = c.key
        WHERE CAST(len(list_filter([b.sig[i] = c.sig[i]
            for i in generate_series(1, 8)], x -> x)) AS DOUBLE) / 8
          >= 0.75
        ORDER BY bench_id""")),

    // Hot-n-gram audit (r16): the top-50 most frequent 5-shingles with
    // occurrence counts — the boilerplate report a curation team reads
    // before writing strip rules. Duplicate documents in the corpus
    // guarantee real repeats; counting runs on the hash kernel (ties
    // at the cut break on the HASH — the oracle replays the cut,
    // collision-merge, and min-string resolution exactly).
    Q("q_ngram_hot",
      (s, d) => {
        graft.operators.Curation.hotNgrams(
            Tables.documents(s, d), "text", 5, 50)
          .orderBy(col("cnt").desc, col("ngram"))
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        sh AS (SELECT unnest(${shinglesSql("tk", 5)}) AS ngram FROM tk),
        c AS (SELECT ngram, ${hash60Sql("ngram")} AS h, COUNT(*) AS cnt
          FROM sh GROUP BY 1, 2),
        hc AS (SELECT h, CAST(SUM(cnt) AS BIGINT) AS cnt,
          MIN(ngram) AS ngram FROM c GROUP BY 1),
        top AS (SELECT * FROM hc WHERE cnt >= 2
          ORDER BY cnt DESC, h LIMIT 50)
        SELECT ngram, cnt FROM top ORDER BY cnt DESC, ngram""")),

    // RFT factory capstone (r16): rejection-sampling fine-tuning end
    // to end — pools of scored candidate completions → bestOfN picks
    // winners per pool → dedupeByPrompt collapses pools that rendered
    // the SAME prompt (two pools share each prompt text by
    // construction, so the dedup stage provably fires) → the winner
    // becomes the assistant turn of a chat → packWithMask renders the
    // training window and turnSpans yields response_start. Every
    // downstream byte moves with the upstream argmaxes; the oracle
    // replays pool selection, margins, dedup, rendering, and the loss
    // boundary in one statement.
    Q("q_rft_windows",
      (s, d) => {
        import graft.operators.Chats
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val cands = Tables.documents(s, d).select(
          concat(lit("q"), (did % 80).cast("string")).as("pool_id"),
          concat(lit("question "), (did % 40).cast("string"))
            .as("prompt_text"),
          concat(substring(ct, 5, 12), lit("#"), did.cast("string"))
            .as("cand"),
          (floor(did / 3).cast("long") % 7).as("score"))
        val pmap = cands.select(col("pool_id"), col("prompt_text"))
          .distinct()
        val winners = Chats.bestOfN(cands, "pool_id", "cand", "score")
          .join(pmap, "pool_id")
        val best = Chats.dedupeByPrompt(winners, "pool_id",
          "prompt_text", "best_score")
        // snapshot once (optimization round 19): chats feeds the parse
        // AND the final join — each would otherwise replay bestOfN +
        // dedupeByPrompt over the corpus
        val chats = graft.operators.Checkpoints.eager(
          best.withColumn("chat", concat(
            lit("{\"messages\":[{\"role\":\"user\",\"content\":\""),
            col("prompt_text"),
            lit("\"},{\"role\":\"assistant\",\"content\":\""),
            col("best"), lit("\"}]}"))))
        val turns = Chats.turns(chats, "chat", "pool_id")
        val packed = Chats.packWithMask(turns, "pool_id")
        val rs = Chats.turnSpans(turns, "pool_id")
          .filter(col("role") === "assistant")
          .select(col("pool_id"), col("start").as("response_start"))
        chats.join(packed, "pool_id").join(rs, "pool_id")
          .select(col("pool_id"), col("prompt_text"), col("best"),
            col("best_score"), col("n_candidates"), col("margin"),
            col("text"), col("response_start"))
          .orderBy(col("pool_id"))
      },
      Some("""WITH b AS (SELECT doc_id,
          regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
        FROM documents),
        c AS (SELECT doc_id,
          'q' || CAST(doc_id % 80 AS VARCHAR) AS pool_id,
          'question ' || CAST(doc_id % 40 AS VARCHAR) AS prompt_text,
          substr(ct, 5, 12) || '#' || CAST(doc_id AS VARCHAR) AS cand,
          CAST(floor(doc_id / 3) AS BIGINT) % 7 AS score
        FROM b),
        w AS (SELECT *,
          row_number() OVER (PARTITION BY pool_id
            ORDER BY score DESC, cand) AS rk,
          lead(score) OVER (PARTITION BY pool_id
            ORDER BY score DESC, cand) AS nxt,
          count(*) OVER (PARTITION BY pool_id) AS nc
        FROM c),
        win AS (SELECT pool_id, prompt_text, cand AS best,
          score AS best_score, CAST(nc AS BIGINT) AS n_candidates,
          score - nxt AS margin
        FROM w WHERE rk = 1),
        ded AS (SELECT *, row_number() OVER (PARTITION BY prompt_text
            ORDER BY best_score DESC, pool_id) AS rk2 FROM win),
        f AS (SELECT * FROM ded WHERE rk2 = 1),
        r AS (SELECT *,
          '<|user|>' || prompt_text || chr(10) AS useg,
          '<|assistant|>' || best || chr(10) AS aseg
        FROM f)
        SELECT pool_id, prompt_text, best, best_score, n_candidates,
          margin, useg || aseg AS text,
          CAST(length(useg) AS BIGINT) AS response_start
        FROM r ORDER BY pool_id""")),

    // Per-conversation quality flags (r17 — alignment-data cleaning):
    // refusal detection via token-sequence phrase matching on
    // assistant turns ('i cannot …' planted on %9 docs), the short-
    // degenerate-reply fraction (%6 docs get a 4-char assistant
    // reply), and length stats; n=2 conversations have NO assistant
    // turn so the null-fraction branch runs on real rows. Oracle
    // replays the shingle membership and every aggregate.
    Q("q_chat_quality",
      (s, d) => {
        import graft.operators.Chats
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        def contentOf(i: Int) = substring(ct, 1 + 7 * i, 12 + i)
        val asstC = when(did % 9 === 0,
            concat(lit("i cannot "), contentOf(2)))
          .when(did % 6 === 0, substring(ct, 15, 4))
          .otherwise(contentOf(2))
        val n = (did % 3 + 2).cast("int")
        val turns = Tables.documents(s, d).select(col("doc_id"),
            posexplode(slice(array(
              struct(lit("system").as("role"),
                contentOf(0).as("content")),
              struct(lit("user").as("role"),
                contentOf(1).as("content")),
              struct(lit("assistant").as("role"),
                asstC.as("content")),
              struct(lit("user").as("role"),
                contentOf(3).as("content"))), lit(1), n))
              .as(Seq("turn_idx", "t")))
          .select(col("doc_id"), col("turn_idx"),
            col("t")("role").as("role"),
            col("t")("content").as("content"))
        Chats.qualityFlags(turns, "doc_id",
            Seq("i cannot", "as an ai"), shortLen = 10)
          .orderBy(col("doc_id"))
      },
      Some {
        // phraseHit groups phrases BY TOKEN LENGTH and matches each
        // group against that length's shingles — the oracle must do
        // the same (2-shingles for 'i cannot', 3-shingles for 'as an
        // ai'); matching both against 2-shingles alone would let a
        // planted 'as an ai' flag refusal on the Spark side only
        // (ADVICE r17).
        val hit = s"""(len(list_filter(
          ${shinglesSql(s"(${toksSql("ac")})", 2)},
          x -> list_contains(['i cannot'], x))) > 0
          OR len(list_filter(
          ${shinglesSql(s"(${toksSql("ac")})", 3)},
          x -> list_contains(['as an ai'], x))) > 0)"""
        s"""WITH b AS (SELECT doc_id, doc_id % 3 + 2 AS n,
            regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
          FROM documents),
        a AS (SELECT doc_id, n,
            CASE WHEN doc_id % 9 = 0 THEN 'i cannot ' ||
                substr(ct, 15, 14)
              WHEN doc_id % 6 = 0 THEN substr(ct, 15, 4)
              ELSE substr(ct, 15, 14) END AS ac
          FROM b),
        f AS (SELECT doc_id, n, ac,
            CASE WHEN n > 2 THEN 1 ELSE 0 END AS na,
            CASE WHEN n > 2 THEN length(ac) ELSE 0 END AS achars,
            CASE WHEN n > 2 AND length(ac) < 10 THEN 1 ELSE 0 END
              AS nshort,
            (n > 2 AND ($hit)) AS refusal
          FROM a)
        SELECT doc_id, CAST(n AS BIGINT) AS n_turns,
          CAST(na AS BIGINT) AS n_assistant,
          CAST(achars AS BIGINT) AS asst_chars,
          CAST(nshort AS BIGINT) AS n_short,
          refusal,
          CASE WHEN na = 0 THEN NULL
            ELSE ROUND(CAST(nshort AS DOUBLE) / na, 6) END
            AS short_frac,
          CASE WHEN na = 0 THEN NULL
            ELSE ROUND(CAST(achars AS DOUBLE) / na, 6) END
            AS mean_asst_len
        FROM f ORDER BY doc_id"""
      }),

    // SFT chat packing (r15 — the post-training front half): chat-JSON
    // conversations (2-4 turns, system/user/assistant roles) parse to
    // turns (from_json + posexplode), render to ONE training string
    // per conversation, and each turn carries its [start, end)
    // character span + the LOSS MASK (assistant-only) the SFT loader
    // zeroes loss with. The gate re-slices the packed text at each
    // span (`seg`) so the oracle bit-checks offsets against its own
    // rendering — an off-by-one anywhere breaks the hash.
    Q("q_chat_pack",
      (s, d) => {
        import graft.operators.Chats
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        def roleOf(i: Int) =
          if (i == 0) "system" else if (i % 2 == 1) "user" else "assistant"
        def turn(i: Int) = concat(
          lit("{\"role\":\"" + roleOf(i) + "\",\"content\":\""),
          substring(ct, 1 + 7 * i, 12 + i), lit("\"}"))
        val n = did % 3 + 2
        val json = concat(lit("{\"messages\":["), turn(0), lit(","),
          turn(1),
          when(n > 2, concat(lit(","), turn(2))).otherwise(lit("")),
          when(n > 3, concat(lit(","), turn(3))).otherwise(lit("")),
          lit("]}"))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), json.as("chat"))
        val t = Chats.turns(docs, "chat", "doc_id")
        val spans = Chats.turnSpans(t, "doc_id")
        val packed = Chats.packWithMask(t, "doc_id")
        spans.join(packed, "doc_id")
          .select(col("doc_id"), col("turn_idx"), col("role"),
            col("start"), col("end"), col("mask"),
            col("text").substr(
              (col("start") + 1).cast("int"),
              (col("end") - col("start")).cast("int")).as("seg"))
          .orderBy(col("doc_id"), col("turn_idx"))
      },
      Some("""WITH b AS (SELECT doc_id, doc_id % 3 + 2 AS n,
          regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
        FROM documents),
        t0 AS (SELECT doc_id, ct,
          unnest(generate_series(0, n - 1)) AS turn_idx FROM b),
        t AS (SELECT doc_id, turn_idx,
          CASE WHEN turn_idx = 0 THEN 'system'
               WHEN turn_idx % 2 = 1 THEN 'user'
               ELSE 'assistant' END AS role,
          substr(ct, CAST(1 + 7 * turn_idx AS INT),
            CAST(12 + turn_idx AS INT)) AS content
        FROM t0),
        r AS (SELECT *,
          '<|' || role || '|>' || content || chr(10) AS seg,
          CAST(length('<|' || role || '|>' || content || chr(10))
            AS BIGINT) AS rl
        FROM t),
        o AS (SELECT *, CAST(COALESCE(SUM(rl) OVER (PARTITION BY doc_id
            ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start
        FROM r)
        SELECT doc_id, turn_idx, role, start,
          CAST(start + rl AS BIGINT) AS "end",
          (role = 'assistant') AS mask, seg
        FROM o ORDER BY doc_id, turn_idx""")),

    // DPO preference pairs (r15): shared rendered prompt + two
    // candidate assistant completions + the response_start offset a
    // preference trainer computes loss from. Both branch texts are
    // hash-checked in full, so template drift anywhere (role wrappers,
    // newline, offset) breaks the gate.
    Q("q_dpo_pairs",
      (s, d) => {
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val json = concat(
          lit("{\"messages\":[{\"role\":\"system\",\"content\":\""),
          substring(ct, 1, 12),
          lit("\"},{\"role\":\"user\",\"content\":\""),
          substring(ct, 8, 13), lit("\"}]}"))
        val docs = Tables.documents(s, d).select(col("doc_id"),
          json.as("prompt"), substring(ct, 21, 14).as("chosen"),
          substring(ct, 35, 14).as("rejected"))
        Chats.preferencePairs(docs, "doc_id", "prompt", "chosen",
            "rejected")
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (SELECT doc_id,
          regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
        FROM documents),
        p AS (SELECT doc_id,
          '<|system|>' || substr(ct, 1, 12) || chr(10) ||
            '<|user|>' || substr(ct, 8, 13) || chr(10) AS prompt_text,
          substr(ct, 21, 14) AS c, substr(ct, 35, 14) AS r
        FROM b)
        SELECT doc_id, prompt_text,
          prompt_text || '<|assistant|>' || c || chr(10) AS chosen_text,
          prompt_text || '<|assistant|>' || r || chr(10)
            AS rejected_text,
          CAST(length(prompt_text) AS BIGINT) AS response_start
        FROM p ORDER BY doc_id""")),

    // Best-of-n selection (r16 — rejection-sampling / distillation
    // prep): pools of scored candidates per prompt, keep the winner +
    // the decision margin (best − runner-up). Synthesis: pools of ≤3
    // consecutive docs with a %7 filter so 1- and 2-candidate pools
    // exist (margin NULL on singletons); score = floor(doc_id/2)%50
    // ties inside even-rooted pools, forcing the candidate-string
    // tie-break; a '#doc_id' suffix makes candidates unique so the
    // winner is deterministic on both engines.
    Q("q_best_of_n",
      (s, d) => {
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val docs = Tables.documents(s, d)
          .filter((col("doc_id") * 13) % 7 < 5)
          .select(
            floor(col("doc_id") / 3).cast("long").as("prompt_id"),
            concat(substring(ct, 1, 12), lit("#"),
              col("doc_id").cast("string")).as("cand"),
            (floor(col("doc_id") / 2).cast("long") % 50).as("score"))
        Chats.bestOfN(docs, "prompt_id", "cand", "score")
          .orderBy(col("prompt_id"))
      },
      Some("""WITH c AS (SELECT
          CAST(floor(doc_id / 3) AS BIGINT) AS prompt_id,
          substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'),
            1, 12) || '#' || CAST(doc_id AS VARCHAR) AS cand,
          CAST(floor(doc_id / 2) AS BIGINT) % 50 AS score
        FROM documents WHERE (doc_id * 13) % 7 < 5),
        r AS (SELECT *,
          row_number() OVER (PARTITION BY prompt_id
            ORDER BY score DESC, cand) AS rk,
          lead(score) OVER (PARTITION BY prompt_id
            ORDER BY score DESC, cand) AS nxt,
          count(*) OVER (PARTITION BY prompt_id) AS n
        FROM c)
        SELECT prompt_id, cand AS best, score AS best_score,
          CAST(n AS BIGINT) AS n_candidates, score - nxt AS margin
        FROM r WHERE rk = 1 ORDER BY prompt_id""")),

    // DPO/RLHF pair HYGIENE AUDIT (r17): candidate pools → best-vs-
    // runner-up pairs (pairsFromPools) → one summary row of the checks
    // a preference set needs before training — identical-pair count
    // (pools where every candidate is the same text: pool%6=0 here),
    // the length-bias correlation between the chosen−rejected length
    // gap and the margin (all five moments emitted as EXACT integer
    // sums and bit-checked; the corr is one IEEE formula over them,
    // replayed verbatim), and pool/prompt skew (prompt = pool%40, so
    // prompts repeat across pools). Pools of ≤3 docs with the %7
    // filter, so 1-candidate pools exist and DROP from pairing.
    Q("q_dpo_audit",
      (s, d) => {
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val pool = floor(col("doc_id") / 3).cast("long")
        val cands = Tables.documents(s, d)
          .filter((col("doc_id") * 13) % 7 < 5)
          .select(pool.as("pool_id"),
            concat(lit("q"), (pool % 40).cast("string")).as("prompt"),
            when(pool % 6 === 0,
              concat(lit("dup"), pool.cast("string")))
              .otherwise(concat(
                ct.substr(lit(5), (lit(6) + col("doc_id") % 9)
                  .cast("int")),
                lit("#"), col("doc_id").cast("string"))).as("cand"),
            (floor(col("doc_id") / 2).cast("long") % 50).as("score"))
        val pairs = Chats.pairsFromPools(cands, "pool_id", "cand",
          "score")
        val pmap = cands.select(col("pool_id"), col("prompt"))
          .distinct()
        Chats.dpoAudit(pairs.join(pmap, "pool_id"), "prompt",
          "chosen", "rejected", "margin")
      },
      Some("""WITH c AS (SELECT doc_id,
          doc_id // 3 AS pool_id,
          'q' || CAST((doc_id // 3) % 40 AS VARCHAR) AS prompt,
          CASE WHEN (doc_id // 3) % 6 = 0
            THEN 'dup' || CAST(doc_id // 3 AS VARCHAR)
            ELSE substr(regexp_replace(lower(text), '[^a-z ]', '',
              'g'), 5, CAST(6 + doc_id % 9 AS INT))
              || '#' || CAST(doc_id AS VARCHAR) END
            AS cand,
          (doc_id // 2) % 50 AS score
        FROM documents WHERE (doc_id * 13) % 7 < 5),
        w AS (SELECT *,
          ROW_NUMBER() OVER (PARTITION BY pool_id
            ORDER BY score DESC, cand) AS rk,
          lead(cand) OVER (PARTITION BY pool_id
            ORDER BY score DESC, cand) AS nc,
          lead(score) OVER (PARTITION BY pool_id
            ORDER BY score DESC, cand) AS ns,
          COUNT(*) OVER (PARTITION BY pool_id) AS np
        FROM c),
        pr AS (SELECT pool_id, prompt, cand AS chosen, nc AS rejected,
          score - ns AS margin, np
        FROM w WHERE rk = 1 AND nc IS NOT NULL),
        mm AS (SELECT *,
          CAST(length(chosen) - length(rejected) AS BIGINT) AS x,
          CAST(margin * 1000000 AS BIGINT) AS yu FROM pr),
        pp AS (SELECT prompt, COUNT(*) AS ppn FROM mm GROUP BY prompt),
        ppa AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_prompts,
          CAST(MAX(ppn) AS BIGINT) AS max_pairs_per_prompt FROM pp),
        ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(SUM(CASE WHEN chosen = rejected THEN 1 ELSE 0 END)
            AS BIGINT) AS n_identical,
          CAST(MAX(np) AS BIGINT) AS max_pool,
          ROUND(CAST(SUM(np) AS DOUBLE) / COUNT(*), 6) AS avg_pool,
          CAST(SUM(x) AS BIGINT) AS sx,
          CAST(SUM(yu) AS BIGINT) AS sy_u,
          CAST(SUM(x * x) AS BIGINT) AS sxx,
          CAST(SUM(x * yu) AS BIGINT) AS sxy_u,
          CAST(SUM(yu * yu) AS BIGINT) AS syy_u,
          MIN(x) AS xmin, MAX(x) AS xmax,
          MIN(yu) AS ymin, MAX(yu) AS ymax
        FROM mm)
        SELECT n_pairs, n_identical, n_prompts, max_pairs_per_prompt,
          max_pool, avg_pool, sx, sy_u, sxx, sxy_u, syy_u,
          CASE WHEN xmin = xmax OR ymin = ymax THEN NULL
            ELSE ROUND((CAST(n_pairs AS DOUBLE) * CAST(sxy_u AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy_u AS DOUBLE)) /
              (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
               sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy_u AS DOUBLE)
                - CAST(sy_u AS DOUBLE) * CAST(sy_u AS DOUBLE))), 6)
          END AS len_margin_corr
        FROM ag CROSS JOIN ppa""")),

    // Prompt-level dedup (r16 — SFT hygiene between collection and
    // training): one conversation per distinct rendered prompt, the
    // highest-scored one, ties by id-as-string (lexicographic on BOTH
    // engines — the CAST(doc_id AS VARCHAR) in the oracle is load-
    // bearing). prompt = doc_id%50 so every group has ~n/50 members
    // and score = (doc_id*7)%23 cycles, guaranteeing real ties.
    Q("q_prompt_dedup",
      (s, d) => {
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val docs = Tables.documents(s, d).select(col("doc_id"),
          concat(lit("p"), (col("doc_id") % 50).cast("string"))
            .as("prompt_text"),
          ((col("doc_id") * 7) % 23).as("score"),
          substring(ct, 1, 10).as("snippet"))
        Chats.dedupeByPrompt(docs, "doc_id", "prompt_text", "score")
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (SELECT doc_id,
          'p' || CAST(doc_id % 50 AS VARCHAR) AS prompt_text,
          (doc_id * 7) % 23 AS score,
          substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'),
            1, 10) AS snippet
        FROM documents),
        r AS (SELECT *, row_number() OVER (PARTITION BY prompt_text
            ORDER BY score DESC, CAST(doc_id AS VARCHAR)) AS rk
        FROM c)
        SELECT doc_id, prompt_text, score, snippet FROM r
        WHERE rk = 1 ORDER BY doc_id""")),

    // GRPO group-relative advantage (r16): per prompt pool of sampled
    // completions, advantage = (r − mean)/std_pop — the normalization
    // GRPO trainers consume instead of a learned critic. Pools of ≤4
    // consecutive docs; every 10th pool scores constant (5) so the
    // zero-variance → advantage-0.0 branch fires on real rows; the
    // exact-decimal window sums make mean/std order-free so the 6dp
    // round lands identically on both engines.
    Q("q_grpo_advantage",
      (s, d) => {
        import graft.operators.Chats
        val pid = floor(col("doc_id") / 4).cast("long")
        val docs = Tables.documents(s, d).select(col("doc_id"),
          pid.as("prompt_id"),
          when(pid % 10 === 0, lit(5L))
            .otherwise((col("doc_id") * 31) % 17).as("score"))
        Chats.groupAdvantage(docs, "prompt_id", "score")
          .select(col("prompt_id"), col("doc_id"), col("score"),
            col("n_samples"),
            round(col("group_mean"), 6).as("group_mean"),
            round(col("group_std"), 6).as("group_std"),
            round(col("advantage"), 6).as("advantage"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (SELECT doc_id,
          CAST(floor(doc_id / 4) AS BIGINT) AS prompt_id,
          CASE WHEN CAST(floor(doc_id / 4) AS BIGINT) % 10 = 0 THEN 5
               ELSE (doc_id * 31) % 17 END AS score
        FROM documents),
        a AS (SELECT *,
          CAST(SUM(CAST(score AS DECIMAL(18,6)))
            OVER (PARTITION BY prompt_id) AS DOUBLE) AS s1,
          CAST(SUM(CAST(score AS DECIMAL(18,6)) *
              CAST(score AS DECIMAL(18,6)))
            OVER (PARTITION BY prompt_id) AS DOUBLE) AS s2,
          COUNT(*) OVER (PARTITION BY prompt_id) AS n_samples
        FROM c),
        b AS (SELECT *, s1 / n_samples AS m,
          greatest(s2 / n_samples -
            (s1 / n_samples) * (s1 / n_samples), 0.0) AS varp
        FROM a)
        SELECT prompt_id, doc_id, score, n_samples,
          ROUND(m, 6) AS group_mean,
          ROUND(sqrt(varp), 6) AS group_std,
          ROUND(CASE WHEN varp = 0 THEN 0.0
                ELSE (score - m) / sqrt(varp) END, 6) AS advantage
        FROM b ORDER BY doc_id""")),

    // Chat PII hygiene composition (r16): the scrub pass applied
    // INSIDE turns, before packing — the order a real SFT pipeline
    // must use, because redacting the packed text would silently
    // invalidate every stored span. User turns leak an email,
    // assistant turns an IP; redaction changes rendered lengths, so
    // every downstream [start, end) moves — the gate re-slices the
    // packed text at each post-scrub span and the oracle replays
    // parse → per-turn redaction → render → running-sum offsets.
    Q("q_chat_scrub",
      (s, d) => {
        import graft.operators.{Chats, Scrub}
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        def roleOf(i: Int) =
          if (i == 0) "system" else if (i % 2 == 1) "user" else "assistant"
        def leak(i: Int): org.apache.spark.sql.Column =
          if (i % 2 == 1) concat(lit(" u"), did.cast("string"),
            lit("@example.com"))
          else if (i > 0) concat(lit(" at 10.1."),
            (did % 200).cast("string"), lit(".9"))
          else lit("")
        def turn(i: Int) = concat(
          lit("{\"role\":\"" + roleOf(i) + "\",\"content\":\""),
          substring(ct, 1 + 7 * i, 12 + i), leak(i), lit("\"}"))
        val n = did % 3 + 2
        val json = concat(lit("{\"messages\":["), turn(0), lit(","),
          turn(1),
          when(n > 2, concat(lit(","), turn(2))).otherwise(lit("")),
          when(n > 3, concat(lit(","), turn(3))).otherwise(lit("")),
          lit("]}"))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), json.as("chat"))
        val scrubbed = Chats.turns(docs, "chat", "doc_id")
          .withColumn("content", Scrub.redact(col("content")))
        val spans = Chats.turnSpans(scrubbed, "doc_id")
        val packed = Chats.packWithMask(scrubbed, "doc_id")
        spans.join(packed, "doc_id")
          .select(col("doc_id"), col("turn_idx"), col("role"),
            col("start"), col("end"), col("mask"),
            col("text").substr(
              (col("start") + 1).cast("int"),
              (col("end") - col("start")).cast("int")).as("seg"))
          .orderBy(col("doc_id"), col("turn_idx"))
      },
      Some("""WITH b AS (SELECT doc_id, doc_id % 3 + 2 AS n,
          regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
        FROM documents),
        t0 AS (SELECT doc_id, ct,
          unnest(generate_series(0, n - 1)) AS turn_idx FROM b),
        t1 AS (SELECT doc_id, turn_idx,
          CASE WHEN turn_idx = 0 THEN 'system'
               WHEN turn_idx % 2 = 1 THEN 'user'
               ELSE 'assistant' END AS role,
          substr(ct, CAST(1 + 7 * turn_idx AS INT),
            CAST(12 + turn_idx AS INT)) ||
          CASE WHEN turn_idx % 2 = 1
               THEN ' u' || CAST(doc_id AS VARCHAR) || '@example.com'
               WHEN turn_idx > 0
               THEN ' at 10.1.' || CAST(doc_id % 200 AS VARCHAR) || '.9'
               ELSE '' END AS content
        FROM t0),
        t AS (SELECT doc_id, turn_idx, role,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            content,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
            '<EMAIL>', 'g'),
            '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
            '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g'),
            '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS content
        FROM t1),
        r AS (SELECT *,
          '<|' || role || '|>' || content || chr(10) AS seg,
          CAST(length('<|' || role || '|>' || content || chr(10))
            AS BIGINT) AS rl
        FROM t),
        o AS (SELECT *, CAST(COALESCE(SUM(rl) OVER (PARTITION BY doc_id
            ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start
        FROM r)
        SELECT doc_id, turn_idx, role, start,
          CAST(start + rl AS BIGINT) AS "end",
          (role = 'assistant') AS mask, seg
        FROM o ORDER BY doc_id, turn_idx""")),

    // SFT decontamination (r16): eval leakage into post-training data
    // — an SFT example whose USER turn matches a held-out benchmark
    // question trains on the test set. Probes are per-user-turn (finer
    // than whole-conversation: one leaked question flags the
    // conversation even when the rest is clean), checked against the
    // benchmark shingle set exactly like document decontamination —
    // short turns hash as one whole-text shingle (the kernel/oracle
    // shared convention), so the match is normalized-content equality.
    // Bench set = user turns of every 9th conversation.
    Q("q_sft_decontam",
      (s, d) => {
        import graft.operators.{Chats, Decontaminate}
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        def roleOf(i: Int) =
          if (i == 0) "system" else if (i % 2 == 1) "user" else "assistant"
        def turn(i: Int) = concat(
          lit("{\"role\":\"" + roleOf(i) + "\",\"content\":\""),
          substring(ct, 1 + 7 * i, 12 + i), lit("\"}"))
        val n = did % 3 + 2
        val json = concat(lit("{\"messages\":["), turn(0), lit(","),
          turn(1),
          when(n > 2, concat(lit(","), turn(2))).otherwise(lit("")),
          when(n > 3, concat(lit(","), turn(3))).otherwise(lit("")),
          lit("]}"))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), json.as("chat"))
        val users = Chats.turns(docs, "chat", "doc_id")
          .filter(col("role") === "user" &&
            length(trim(col("content"))) > 0)
        val bench = users.filter(col("doc_id") % 9 === 0)
          .select(col("content").as("btext"))
        Decontaminate.flaggedWith(users, "content", "doc_id",
            Decontaminate.benchShingles(bench, "btext", 5), 5)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH b AS (SELECT doc_id, doc_id % 3 + 2 AS n,
          regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
        FROM documents),
        u0 AS (
          SELECT doc_id, substr(ct, 8, 13) AS content FROM b
          UNION ALL
          SELECT doc_id, substr(ct, 22, 15) AS content FROM b
          WHERE n > 3),
        u AS (SELECT * FROM u0 WHERE length(trim(content)) > 0),
        tk AS (SELECT doc_id, ${toksSql("content")} AS tk FROM u),
        sh AS (SELECT doc_id,
          list_distinct([${hash60Sql("s")} for s in ${shinglesSql("tk", 5)}])
            AS shs FROM tk),
        csh AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
        bsh AS (SELECT DISTINCT unnest(shs) AS sh FROM sh
          WHERE doc_id % 9 = 0)
        SELECT DISTINCT c.doc_id FROM csh c JOIN bsh b USING (sh)
        ORDER BY doc_id"""),
      setup = Some((s, d) => {
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        def turn(i: Int, role: String) = concat(
          lit("{\"role\":\"" + role + "\",\"content\":\""),
          substring(ct, 1 + 7 * i, 12 + i), lit("\"}"))
        val n = did % 3 + 2
        val json = concat(lit("{\"messages\":["), turn(0, "system"),
          lit(","), turn(1, "user"),
          when(n > 2, concat(lit(","), turn(2, "assistant")))
            .otherwise(lit("")),
          when(n > 3, concat(lit(","), turn(3, "user")))
            .otherwise(lit("")),
          lit("]}"))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), json.as("chat"))
        val users = graft.operators.Chats.turns(docs, "chat", "doc_id")
          .filter(col("role") === "user" &&
            length(trim(col("content"))) > 0)
        graft.operators.Decontaminate.benchShingles(
          users.filter(col("doc_id") % 9 === 0)
            .select(col("content").as("btext")), "btext", 5)
        ()
      })),

    // SFT structural validation (r15): conversations must carry known
    // roles, at most one LEADING system turn, strict user/assistant
    // alternation starting with user, and end on an assistant turn.
    // Synthesis: the q_chat_pack shape is valid only at n=3
    // (system,user,assistant — n=2 and n=4 end on user), %7s double the
    // assistant (turn 1 becomes assistant), %13s carry an off-vocab
    // 'tool' role — all three violation classes must flag.
    Q("q_chat_validate",
      (s, d) => {
        import graft.operators.Chats
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        def baseRole(i: Int) =
          if (i == 0) "system" else if (i % 2 == 1) "user" else "assistant"
        def roleCol(i: Int): org.apache.spark.sql.Column =
          if (i != 1) lit(baseRole(i))
          else when(did % 7 === 0, "assistant")
            .when(did % 13 === 0, "tool")
            .otherwise(baseRole(i))
        def turn(i: Int) = concat(lit("{\"role\":\""), roleCol(i),
          lit("\",\"content\":\""), substring(ct, 1 + 7 * i, 12 + i),
          lit("\"}"))
        val n = did % 3 + 2
        val json = concat(lit("{\"messages\":["), turn(0), lit(","),
          turn(1),
          when(n > 2, concat(lit(","), turn(2))).otherwise(lit("")),
          when(n > 3, concat(lit(","), turn(3))).otherwise(lit("")),
          lit("]}"))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), json.as("chat"))
        Chats.validateTurns(Chats.turns(docs, "chat", "doc_id"),
            "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
          CAST(doc_id % 3 + 2 AS BIGINT) AS n_turns,
          (doc_id % 3 = 1 AND doc_id % 7 != 0 AND doc_id % 13 != 0)
            AS valid
        FROM documents ORDER BY doc_id""")),

    // SFT context-budget trimming (r15): keep the leading system turn
    // plus the longest TAIL of turns fitting 60 rendered characters
    // with it — oldest exchanges drop first, whole-turn boundaries,
    // re-based offsets on the survivors. The oracle replays rendered
    // lengths, the descending tail sums, the keep rule, and the
    // re-based running offsets.
    Q("q_chat_fit",
      (s, d) => {
        import graft.operators.Chats
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        def roleOf(i: Int) =
          if (i == 0) "system" else if (i % 2 == 1) "user" else "assistant"
        def turn(i: Int) = concat(
          lit("{\"role\":\"" + roleOf(i) + "\",\"content\":\""),
          substring(ct, 1 + 7 * i, 12 + i), lit("\"}"))
        val n = did % 3 + 2
        val json = concat(lit("{\"messages\":["), turn(0), lit(","),
          turn(1),
          when(n > 2, concat(lit(","), turn(2))).otherwise(lit("")),
          when(n > 3, concat(lit(","), turn(3))).otherwise(lit("")),
          lit("]}"))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), json.as("chat"))
        val spans = Chats.turnSpans(
          Chats.turns(docs, "chat", "doc_id"), "doc_id")
        Chats.fitBudget(spans, "doc_id", budget = 60L)
          .select(col("doc_id"), col("turn_idx"), col("kept"),
            col("new_start"), col("new_end"))
          .orderBy(col("doc_id"), col("turn_idx"))
      },
      Some("""WITH b AS (SELECT doc_id, doc_id % 3 + 2 AS n,
          regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
        FROM documents),
        t0 AS (SELECT doc_id, ct,
          unnest(generate_series(0, n - 1)) AS turn_idx FROM b),
        t AS (SELECT doc_id, turn_idx,
          CASE WHEN turn_idx = 0 THEN 'system'
               WHEN turn_idx % 2 = 1 THEN 'user'
               ELSE 'assistant' END AS role,
          substr(ct, CAST(1 + 7 * turn_idx AS INT),
            CAST(12 + turn_idx AS INT)) AS content
        FROM t0),
        r AS (SELECT doc_id, turn_idx, (turn_idx = 0) AS sys,
          CAST(length('<|' || role || '|>' || content || chr(10))
            AS BIGINT) AS rl
        FROM t),
        w AS (SELECT *,
          CAST(MAX(CASE WHEN sys THEN rl ELSE 0 END)
            OVER (PARTITION BY doc_id) AS BIGINT) AS syslen,
          CAST(SUM(CASE WHEN sys THEN 0 ELSE rl END)
            OVER (PARTITION BY doc_id ORDER BY turn_idx DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS tail
        FROM r),
        k AS (SELECT *, (sys OR tail + syslen <= 60) AS kept FROM w),
        o AS (SELECT *,
          CAST(COALESCE(SUM(CASE WHEN kept THEN rl ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY turn_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS ns
        FROM k)
        SELECT doc_id, turn_idx, kept,
          CASE WHEN kept THEN ns END AS new_start,
          CASE WHEN kept THEN CAST(ns + rl AS BIGINT) END AS new_end
        FROM o ORDER BY doc_id, turn_idx""")),

    // TOKEN-aligned loss masks (r16 — the SFT contract's second half):
    // each turn's [token_start, token_end) in the packed text's BPE
    // stream, from per-turn subword counts + the conversation window
    // (turns break on whitespace, BPE is per-word, so per-turn encodes
    // concatenate exactly — spec-pinned). Merges are the 3 learned
    // rounds (memoized setup); the oracle re-learns them in SQL,
    // re-tokenizes every rendered turn, replays the replace-chain
    // segmentation per token, and re-sums — token offsets are derived
    // fully independently, then bit-checked.
    Q("q_chat_token_spans",
      (s, d) => {
        import graft.operators.Chats
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        def roleOf(i: Int) =
          if (i == 0) "system" else if (i % 2 == 1) "user" else "assistant"
        def turn(i: Int) = concat(
          lit("{\"role\":\"" + roleOf(i) + "\",\"content\":\""),
          substring(ct, 1 + 7 * i, 12 + i), lit("\"}"))
        val n = did % 3 + 2
        val json = concat(lit("{\"messages\":["), turn(0), lit(","),
          turn(1),
          when(n > 2, concat(lit(","), turn(2))).otherwise(lit("")),
          when(n > 3, concat(lit(","), turn(3))).otherwise(lit("")),
          lit("]}"))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), json.as("chat"))
        Chats.tokenSpans(Chats.turns(docs, "chat", "doc_id"), "doc_id",
            roundtripMerges(s, d))
          .select(col("doc_id"), col("turn_idx"), col("role"),
            col("mask"), col("n_tok"), col("token_start"),
            col("token_end"))
          .orderBy(col("doc_id"), col("turn_idx"))
      },
      Some {
        s"""WITH w AS (
          SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(${toksSql("text")}) AS word FROM documents)
          WHERE regexp_matches(word, '^[a-z0-9]+$$')
          GROUP BY word),
        e0 AS (SELECT rtrim(regexp_replace(word, '(.)', '|\\1| ', 'g')) AS e,
          freq FROM w),
        ${bpeRoundSql(1)}, ${bpeRoundSql(2)}, ${bpeRoundSql(3)},
        cb AS (SELECT doc_id, doc_id % 3 + 2 AS n,
          regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
        FROM documents),
        ct0 AS (SELECT doc_id, ct,
          unnest(generate_series(0, n - 1)) AS turn_idx FROM cb),
        ctt AS (SELECT doc_id, turn_idx,
          CASE WHEN turn_idx = 0 THEN 'system'
               WHEN turn_idx % 2 = 1 THEN 'user'
               ELSE 'assistant' END AS role,
          substr(ct, CAST(1 + 7 * turn_idx AS INT),
            CAST(12 + turn_idx AS INT)) AS content
        FROM ct0),
        ctr AS (SELECT doc_id, turn_idx, role,
          '<|' || role || '|>' || content || chr(10) AS rt FROM ctt),
        ctk AS (SELECT doc_id, turn_idx, role, unnest(${toksSql("rt")})
          AS wt FROM ctr),
        csg AS (SELECT doc_id, turn_idx, role,
          CASE WHEN regexp_matches(wt, '^[a-z0-9]+$$') THEN
            len(string_split(
              replace(replace(replace(
                rtrim(regexp_replace(wt, '(.)', '|\\1| ', 'g')),
                b1.pat, replace(b1.pat, '| |', '')),
                b2.pat, replace(b2.pat, '| |', '')),
                b3.pat, replace(b3.pat, '| |', '')), ' '))
          ELSE 1 END AS ntk
          FROM ctk, b1, b2, b3),
        cnt AS (SELECT doc_id, turn_idx, role,
          CAST(SUM(ntk) AS BIGINT) AS n_tok
          FROM csg GROUP BY doc_id, turn_idx, role),
        cof AS (SELECT *,
          CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY doc_id
            ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS token_start
        FROM cnt)
        SELECT doc_id, turn_idx, role, (role = 'assistant') AS mask,
          n_tok, token_start,
          CAST(token_start + n_tok AS BIGINT) AS token_end
        FROM cof ORDER BY doc_id, turn_idx"""
      },
      setup = Some((s, d) => roundtripMerges(s, d))),

    // SFT FACTORY capstone (r16): raw chat logs → trainable windows in
    // one composed pipeline — validateTurns gates malformed logs
    // (q_chat_validate's synthesis: only n=3 alternates and ends on
    // assistant; %7s double a speaker, %13s carry an off-vocab role),
    // tokenSpans prices every valid conversation in BPE tokens,
    // packExamples FFDs whole conversations into 32-token windows per
    // shard group, and each turn's loss-mask span lands REBASED into
    // its window (win_start = window offset + turn token offset) — the
    // block-diagonal-attention + token-mask contract a trainer loads
    // directly. The oracle replays ALL of it in one statement: merge
    // learning, validity, per-turn token counts, the FFD recursion,
    // and the rebase join — every window boundary and mask span in the
    // corpus is bit-checked through four composed operators.
    Q("q_sft_windows",
      (s, d) => {
        import graft.operators.{Chats, Packing}
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        def baseRole(i: Int) =
          if (i == 0) "system" else if (i % 2 == 1) "user" else "assistant"
        def roleCol(i: Int): org.apache.spark.sql.Column =
          if (i != 1) lit(baseRole(i))
          else when(did % 7 === 0, "assistant")
            .when(did % 13 === 0, "tool")
            .otherwise(baseRole(i))
        def turn(i: Int) = concat(lit("{\"role\":\""), roleCol(i),
          lit("\",\"content\":\""), substring(ct, 1 + 7 * i, 12 + i),
          lit("\"}"))
        val n = did % 3 + 2
        val json = concat(lit("{\"messages\":["), turn(0), lit(","),
          turn(1),
          when(n > 2, concat(lit(","), turn(2))).otherwise(lit("")),
          when(n > 3, concat(lit(","), turn(3))).otherwise(lit("")),
          lit("]}"))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), json.as("chat"))
        // checkpoint the parse and the encoded spans once (optimization
        // round 19): turns feeds validate AND the span build, and spans
        // feeds the length agg, packExamples' back-join, and the final
        // join — without the snapshots the chat parse ran twice and the
        // BPE encode three times
        val t = graft.operators.Checkpoints.eager(
          Chats.turns(docs, "chat", "doc_id"))
        val valid = Chats.validateTurns(t, "doc_id")
          .filter(col("valid")).select(col("doc_id"))
        val spans = graft.operators.Checkpoints.eager(
          Chats.tokenSpans(t.join(valid, "doc_id"), "doc_id",
            roundtripMerges(s, d)))
        val conv = spans.groupBy(col("doc_id"))
          .agg(max(col("token_end")).as("len"))
          .withColumn("grp", col("doc_id") % 4)
        val packed = Packing.packExamples(conv, "doc_id", "len", "grp",
          capacity = 32L)
        spans.join(packed.select(col("doc_id"), col("grp"), col("bin"),
            col("slot"), col("start_off")), "doc_id")
          .select(col("doc_id"), col("turn_idx"), col("role"),
            col("mask"), col("grp"), col("bin"), col("slot"),
            (col("start_off") + col("token_start")).as("win_start"),
            (col("start_off") + col("token_end")).as("win_end"))
          .orderBy(col("doc_id"), col("turn_idx"))
      },
      Some {
        s"""WITH RECURSIVE w AS (
          SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(${toksSql("text")}) AS word FROM documents)
          WHERE regexp_matches(word, '^[a-z0-9]+$$')
          GROUP BY word),
        e0 AS (SELECT rtrim(regexp_replace(word, '(.)', '|\\1| ', 'g')) AS e,
          freq FROM w),
        ${bpeRoundSql(1)}, ${bpeRoundSql(2)}, ${bpeRoundSql(3)},
        vb AS (SELECT doc_id,
          regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
        FROM documents
        WHERE doc_id % 3 = 1 AND doc_id % 7 != 0 AND doc_id % 13 != 0),
        vt0 AS (SELECT doc_id, ct,
          unnest(generate_series(0, 2)) AS turn_idx FROM vb),
        vtt AS (SELECT doc_id, turn_idx,
          CASE WHEN turn_idx = 0 THEN 'system'
               WHEN turn_idx = 1 THEN 'user'
               ELSE 'assistant' END AS role,
          substr(ct, CAST(1 + 7 * turn_idx AS INT),
            CAST(12 + turn_idx AS INT)) AS content
        FROM vt0),
        vtr AS (SELECT doc_id, turn_idx, role,
          '<|' || role || '|>' || content || chr(10) AS rt FROM vtt),
        vtk AS (SELECT doc_id, turn_idx, role, unnest(${toksSql("rt")})
          AS wt FROM vtr),
        vsg AS (SELECT doc_id, turn_idx, role,
          CASE WHEN regexp_matches(wt, '^[a-z0-9]+$$') THEN
            len(string_split(
              replace(replace(replace(
                rtrim(regexp_replace(wt, '(.)', '|\\1| ', 'g')),
                b1.pat, replace(b1.pat, '| |', '')),
                b2.pat, replace(b2.pat, '| |', '')),
                b3.pat, replace(b3.pat, '| |', '')), ' '))
          ELSE 1 END AS ntk
          FROM vtk, b1, b2, b3),
        vcnt AS (SELECT doc_id, turn_idx, role,
          CAST(SUM(ntk) AS BIGINT) AS n_tok
          FROM vsg GROUP BY doc_id, turn_idx, role),
        vcof AS (SELECT *,
          CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY doc_id
            ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS token_start
        FROM vcnt),
        cv AS (SELECT doc_id, doc_id % 4 AS grp,
          CAST(SUM(n_tok) AS BIGINT) AS len
          FROM vcnt GROUP BY doc_id),
        it AS (SELECT grp, doc_id AS id, len,
          ROW_NUMBER() OVER (PARTITION BY grp
            ORDER BY len DESC, CAST(doc_id AS VARCHAR)) AS i,
          COUNT(*) OVER (PARTITION BY grp) AS nn
          FROM cv),
        st AS (
          SELECT grp, CAST(0 AS BIGINT) AS i, CAST(NULL AS BIGINT) AS id,
            CAST(NULL AS BIGINT) AS len, CAST(NULL AS BIGINT) AS bin,
            CAST([] AS BIGINT[]) AS caps, nn
          FROM (SELECT DISTINCT grp, nn FROM it)
          UNION ALL
          SELECT it.grp, it.i, it.id, it.len,
            CASE WHEN $ffdPosSql IS NULL THEN len(st.caps)
                 ELSE $ffdPosSql - 1 END AS bin,
            CASE WHEN $ffdPosSql IS NULL
                 THEN list_append(st.caps, 32 - it.len)
                 ELSE list_slice(st.caps, 1, $ffdPosSql - 1)
                      || [st.caps[$ffdPosSql] - it.len]
                      || list_slice(st.caps, $ffdPosSql + 1, len(st.caps))
                 END AS caps,
            st.nn
          FROM st JOIN it ON it.grp = st.grp AND it.i = st.i + 1
          WHERE st.i < st.nn),
        asg AS (SELECT grp, id, CAST(bin AS BIGINT) AS bin,
          CAST(ROW_NUMBER() OVER (PARTITION BY grp, bin ORDER BY i) - 1
            AS BIGINT) AS slot,
          CAST(COALESCE(SUM(len) OVER (PARTITION BY grp, bin ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_off
          FROM st WHERE i > 0)
        SELECT c.doc_id, c.turn_idx, c.role,
          (c.role = 'assistant') AS mask,
          CAST(a.grp AS BIGINT) AS grp, a.bin, a.slot,
          CAST(a.start_off + c.token_start AS BIGINT) AS win_start,
          CAST(a.start_off + c.token_start + c.n_tok AS BIGINT)
            AS win_end
        FROM vcof c JOIN asg a ON c.doc_id = a.id
        ORDER BY c.doc_id, c.turn_idx"""
      },
      setup = Some((s, d) => roundtripMerges(s, d))),

    // TOOL-CALL / agentic trace validation (r17 — the SFT tier's
    // missing data class): conversations where assistant turns declare
    // tool_calls (id + name + arguments-JSON) answered by tool-role
    // turns. Five synthesized shapes — plain chat, a two-call trace
    // answered in REVERSE order (order-free matching must accept it),
    // a wrong answer id, an unanswered call, and non-JSON arguments —
    // and the oracle replays the protocol RULES themselves (role
    // lattice, lag transitions, per-calling-block answered-vs-declared
    // set compare via sorted lists, JSON validity via json_valid, the
    // pending-calls final-turn rule), not the construction.
    Q("q_chat_tools",
      (s, d) => {
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val docs = Tables.documents(s, d).select(col("doc_id"),
          toolTraceJson(col("doc_id"), ct).as("chat"))
        Chats.validateToolTurns(
            Chats.toolTurns(docs, "chat", "doc_id"), "doc_id")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $toolTraceSql,
        h AS (SELECT *, COALESCE(len(calls) > 0, false) AS hc,
          (calls IS NULL OR (len(list_filter(calls,
             c -> c.id IS NOT NULL AND c.nm IS NOT NULL
               AND json_valid(c.args))) = len(calls)
           AND len(list_distinct([c.id for c in calls]))
             = len(calls))) AS wf
         FROM tt),
        x AS (SELECT *,
          lag(role) OVER (PARTITION BY doc_id ORDER BY turn_idx) AS pr,
          lag(hc) OVER (PARTITION BY doc_id ORDER BY turn_idx) AS ph,
          max(CASE WHEN role = 'assistant' THEN turn_idx END)
            OVER (PARTITION BY doc_id ORDER BY turn_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS blk
         FROM h),
        o AS (SELECT *,
          -- COALESCE false: a NULL role must not validate (the Spark
          -- side coalesces the same predicate to false)
          COALESCE((role IN ('system','user','assistant','tool')
           AND (role != 'system' OR turn_idx = 0)
           AND (NOT hc OR role = 'assistant')
           AND ((role = 'tool') = (tcid IS NOT NULL))
           AND wf
           AND CASE WHEN pr IS NULL THEN role IN ('system','user')
                WHEN pr = 'system' THEN role = 'user'
                WHEN pr = 'user' THEN role = 'assistant'
                WHEN pr = 'assistant' AND ph THEN role = 'tool'
                WHEN pr = 'assistant' THEN role = 'user'
                ELSE role IN ('tool','assistant') END), FALSE) AS ok
         FROM x),
        g AS (SELECT doc_id, blk, COUNT(*) AS n, bool_and(ok) AS okb,
          COALESCE(any_value(CASE WHEN role = 'assistant'
            THEN COALESCE(list_sort([c.id for c in calls]),
              CAST([] AS VARCHAR[])) END), CAST([] AS VARCHAR[]))
            AS decl,
          COALESCE(list_sort(list(tcid) FILTER (WHERE role = 'tool')),
            CAST([] AS VARCHAR[])) AS ans,
          arg_max(role, turn_idx) AS lrole,
          arg_max(hc, turn_idx) AS lhc,
          max(turn_idx) AS mx
         FROM o GROUP BY doc_id, blk)
        SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_turns,
          (bool_and(okb) AND bool_and(decl = ans)
           AND arg_max(lrole, mx) = 'assistant'
           AND NOT arg_max(lhc, mx)) AS valid
        FROM g GROUP BY doc_id ORDER BY doc_id""")),

    // Tool-trace span treatment (r17): valid traces render through
    // renderToolCalls — calls serialize INTO the assistant turn (the
    // model must learn to EMIT them → loss), tool results become
    // `[call_id] content` context turns (mask false) — then the
    // STANDARD turnSpans/packWithMask pipeline applies unchanged. The
    // gate re-slices the packed text at every span (`seg`) so the
    // oracle bit-checks the whole rendering against its own.
    Q("q_chat_tool_spans",
      (s, d) => {
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val docs = Tables.documents(s, d).select(col("doc_id"),
          toolTraceJson(col("doc_id"), ct).as("chat"))
        val t = Chats.toolTurns(docs, "chat", "doc_id")
        val valid = Chats.validateToolTurns(t, "doc_id")
          .filter(col("valid")).select(col("doc_id"))
        val rendered = Chats.renderToolCalls(t.join(valid, "doc_id"),
          "doc_id")
        val spans = Chats.turnSpans(rendered, "doc_id")
        val packed = Chats.packWithMask(rendered, "doc_id")
        spans.join(packed, "doc_id")
          .select(col("doc_id"), col("turn_idx"), col("role"),
            col("start"), col("end"), col("mask"),
            col("text").substr(
              (col("start") + 1).cast("int"),
              (col("end") - col("start")).cast("int")).as("seg"))
          .orderBy(col("doc_id"), col("turn_idx"))
      },
      Some(s"""WITH $toolTraceSql, $toolRenderSql,
        r AS (SELECT *, CAST(length(rt) AS BIGINT) AS rl FROM vtr),
        o AS (SELECT *, CAST(COALESCE(SUM(rl) OVER (
            PARTITION BY doc_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start
        FROM r)
        SELECT doc_id, turn_idx, role, start,
          CAST(start + rl AS BIGINT) AS "end",
          (role = 'assistant') AS mask, rt AS seg
        FROM o ORDER BY doc_id, turn_idx""")),

    // Per-call argument-contract audit (r17): each declared call's
    // arguments must be a JSON OBJECT carrying its tool's required
    // keys. Contract: search needs {q} (satisfied by the valid
    // shapes, violated by the '{oops' class which reports every key
    // missing), fetch needs {k, url} (the synthesized fetch args
    // carry only k — a real missing-key verdict on a VALID object).
    // The oracle replays key extraction (json_valid + json_type +
    // json_keys ≡ Spark's json_object_keys), the contract join, and
    // the sorted set difference. The gate SERIALIZES the (sorted)
    // missing list with array_join — the driver's frame compare sorts
    // with pandas, which cannot hash raw list cells (r17's one `err`
    // row); the operator API stays array-typed.
    Q("q_tool_args",
      (s, d) => {
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val docs = Tables.documents(s, d).select(col("doc_id"),
          toolTraceJson(col("doc_id"), ct).as("chat"))
        Chats.toolArgsAudit(Chats.toolTurns(docs, "chat", "doc_id"),
            "doc_id",
            Map("search" -> Seq("q"), "fetch" -> Seq("k", "url")))
          .withColumn("missing", array_join(col("missing"), ","))
          .orderBy(col("doc_id"), col("turn_idx"), col("call_id"))
      },
      Some(s"""WITH $toolTraceSql,
        ca AS (SELECT doc_id, turn_idx, c.id AS call_id,
            c.nm AS tool_name, c.args AS args
          FROM (SELECT doc_id, turn_idx, unnest(calls) AS c FROM tt
            WHERE calls IS NOT NULL)),
        -- json_type/json_keys raise on malformed input even inside a
        -- CASE guard (vectorized eval) — null out invalid args FIRST;
        -- json functions pass null through
        va AS (SELECT *, CASE WHEN json_valid(args) THEN args END
          AS vargs FROM ca),
        ky AS (SELECT *, CASE WHEN json_type(vargs) = 'OBJECT'
            THEN CAST(json_keys(vargs) AS VARCHAR[]) END AS keys
          FROM va),
        rq AS (SELECT * FROM (VALUES
          ('search', ['q']), ('fetch', ['k', 'url']))
          AS t(tool_name, req)),
        mm AS (SELECT k.doc_id, k.turn_idx, k.call_id, k.tool_name,
            r.req, k.keys,
            CASE WHEN r.req IS NULL THEN ['__unknown_tool']
              ELSE list_sort(list_filter(r.req, x ->
                NOT list_contains(COALESCE(k.keys,
                  CAST([] AS VARCHAR[])), x))) END AS missing
          FROM ky k LEFT JOIN rq r USING (tool_name))
        -- DuckDB array_to_string([]) is NULL, Spark array_join([]) is
        -- '' — coalesce to match
        SELECT doc_id, turn_idx, call_id, tool_name,
          COALESCE(array_to_string(missing, ','), '') AS missing,
          (req IS NOT NULL AND keys IS NOT NULL
            AND len(missing) = 0) AS args_ok
        FROM mm ORDER BY doc_id, turn_idx, call_id""")),

    // Argument-VALUE TYPE audit (r18 — the tier above q_tool_args'
    // key presence): the contract states each required key's JSON
    // type; actual types probe via Spark variant introspection
    // (try_parse_json → try_variant_get → schema_of_variant) vs
    // DuckDB json_type — both canonicalized to the six JSON type
    // names. Six synthesized call shapes: conforming search, a
    // conforming fetch (k genuinely a NUMBER), a fetch with both
    // values type-flipped, a number-ok/url-missing fetch, non-JSON
    // arguments ('unparseable'), and an out-of-contract tool. The
    // oracle replays probing, canonicalization, and the sorted
    // verdict list; the gate serializes `bad` (array columns crash
    // the driver's pandas sort — r17).
    Q("q_tool_arg_types",
      (s, d) => graft.operators.Chats.toolArgTypes(
          sixShapeToolTurns(s, d), "doc_id",
          Map("search" -> Seq("q" -> "string"),
            "fetch" -> Seq("k" -> "number", "url" -> "string")))
        .withColumn("bad", array_join(col("bad"), ","))
        .orderBy(col("doc_id")),
      Some {
        def act(key: String) =
          s"""CASE WHEN NOT json_valid(args) THEN 'unparseable'
            ELSE ${canonTypeSql(s"json_type(args, '$$.$key')")} END"""
        s"""WITH $sixShapeSql,
        ty AS (SELECT doc_id, call_id, tool_name,
            ${act("q")} AS aq, ${act("k")} AS ak,
            ${act("url")} AS aurl
          FROM c),
        bd AS (SELECT doc_id, call_id, tool_name,
            CASE WHEN tool_name = 'search' THEN
              list_sort(list_filter([CASE WHEN aq != 'string'
                THEN 'q:string:' || aq END], x -> x IS NOT NULL))
            WHEN tool_name = 'fetch' THEN
              list_sort(list_filter([
                CASE WHEN ak != 'number'
                  THEN 'k:number:' || ak END,
                CASE WHEN aurl != 'string'
                  THEN 'url:string:' || aurl END],
                x -> x IS NOT NULL))
            ELSE ['__unknown_tool'] END AS bad
          FROM ty)
        SELECT doc_id, CAST(1 AS BIGINT) AS turn_idx, call_id,
          tool_name, COALESCE(array_to_string(bad, ','), '') AS bad,
          len(bad) = 0 AS types_ok
        FROM bd ORDER BY doc_id"""
      }),

    // Contract INFERENCE (r18 — the discovery twin of
    // q_tool_arg_types, over the SAME six call shapes): per
    // (tool, key) the presence fraction among parseable object
    // arguments, the majority observed JSON type with its share, and
    // the inferred `required` verdict. fetch.k reads number-majority
    // (int + decimal shapes outvote the string shape), fetch.url
    // splits string-vs-number and sits below the 0.95 presence bar
    // (the {"k":1.5} shape omits it), search.q and mail.to infer
    // required string. The oracle replays key extraction, dynamic-
    // path type probing, majority tie-break, and both rounded
    // fractions.
    Q("q_tool_contract",
      (s, d) => graft.operators.Chats.toolContractInfer(
          sixShapeToolTurns(s, d), "doc_id", minPresence = 0.95)
        .orderBy(col("tool_name"), col("key")),
      Some {
        s"""WITH $sixShapeSql,
        va AS (SELECT tool_name,
            CASE WHEN json_valid(args) THEN args END AS vargs
          FROM c),
        ob AS (SELECT tool_name, vargs,
            CASE WHEN json_type(vargs) = 'OBJECT'
              THEN list_distinct(CAST(json_keys(vargs) AS VARCHAR[]))
              END AS keys
          FROM va),
        tot AS (SELECT tool_name,
            CAST(COUNT(*) AS BIGINT) AS n_calls,
            CAST(SUM(CASE WHEN keys IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_objects
          FROM ob GROUP BY 1),
        pk AS (SELECT tool_name, unnest(keys) AS key, vargs
          FROM ob WHERE keys IS NOT NULL),
        pt AS (SELECT tool_name, key,
            ${canonTypeSql("json_type(vargs, '$.' || key)")} AS t
          FROM pk),
        tc AS (SELECT tool_name, key, t, COUNT(*) AS n
          FROM pt GROUP BY 1, 2, 3),
        mj AS (SELECT tool_name, key, t AS major_type, n,
            row_number() OVER (PARTITION BY tool_name, key
              ORDER BY n DESC, t) AS r
          FROM tc),
        kc AS (SELECT tool_name, key,
            CAST(COUNT(*) AS BIGINT) AS n_with_key
          FROM pt GROUP BY 1, 2)
        SELECT kc.tool_name, kc.key, tot.n_calls, tot.n_objects,
          kc.n_with_key,
          ROUND(CAST(kc.n_with_key AS DOUBLE) / tot.n_objects, 6)
            AS presence,
          mj.major_type,
          ROUND(CAST(mj.n AS DOUBLE) / kc.n_with_key, 6)
            AS type_frac,
          (ROUND(CAST(kc.n_with_key AS DOUBLE) / tot.n_objects, 6)
            >= 0.95) AS required
        FROM kc
        JOIN mj ON mj.tool_name = kc.tool_name AND mj.key = kc.key
          AND mj.r = 1
        JOIN tot ON tot.tool_name = kc.tool_name
        ORDER BY kc.tool_name, kc.key"""
      }),

    // Tool-CHAIN transitions (r18 — the Markov card next to
    // q_tool_stats): per conversation the declared tool names in
    // (turn, declaration-position) order, every (src → dst)
    // transition counted with __start/__end sentinels. Over the five
    // synthesized shapes: __start→search (4 classes), search→fetch
    // (the two-call class — declaration order, though its ANSWERS
    // arrive reversed), search→__end, fetch→__end. The oracle
    // replays the zip-unnest, the lag window, and the end markers.
    Q("q_tool_chains",
      (s, d) => {
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val docs = Tables.documents(s, d).select(col("doc_id"),
          toolTraceJson(col("doc_id"), ct).as("chat"))
        Chats.toolChains(Chats.toolTurns(docs, "chat", "doc_id"),
            "doc_id")
          .orderBy(col("src"), col("dst"))
      },
      Some(s"""WITH $toolTraceSql,
        cc AS (SELECT doc_id, turn_idx,
            unnest(range(len(calls))) AS p,
            unnest([c.nm FOR c IN calls]) AS tool_name
          FROM tt WHERE calls IS NOT NULL),
        sq AS (SELECT doc_id, tool_name,
            COALESCE(lag(tool_name) OVER (PARTITION BY doc_id
              ORDER BY turn_idx, p), '__start') AS src,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY turn_idx DESC, p DESC) AS rn
          FROM cc),
        tr AS (SELECT src, tool_name AS dst, doc_id FROM sq
          UNION ALL
          SELECT tool_name, '__end', doc_id FROM sq WHERE rn = 1)
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_convs
        FROM tr GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Contract DRIFT (r19 — the comparison toolContractInfer's
    // scaladoc promises): even doc ids are snapshot A (shapes 0/2/4:
    // search{q:str}, fetch{k:str,url:num}, unparseable search), odd
    // ids snapshot B (shapes 1/3/5: fetch{k:num,url:str},
    // fetch{k:1.5}, mail{to:str}) — so the full-outer compare shows
    // search.q DISAPPEARED, mail.to APPEARED, fetch.k TYPE-FLIPPED
    // string→number, and fetch.url flipped with a ~0.5 presence
    // drop. Vocabulary-sized join, no corpus re-scan; the oracle
    // replays BOTH inferences and the compare.
    Q("q_contract_drift",
      (s, d) => {
        import graft.operators.Chats
        val six = sixShapeToolTurns(s, d)
        Chats.contractDrift(
            Chats.toolContractInfer(
              six.filter(col("doc_id") % 2 === 0), "doc_id"),
            Chats.toolContractInfer(
              six.filter(col("doc_id") % 2 === 1), "doc_id"))
          .orderBy(col("tool_name"), col("key"))
      },
      Some(s"""WITH $contractDriftSql
        SELECT * FROM drift ORDER BY tool_name, key""")),

    // The per-tool severity roll-up over the same drift frame: key
    // counts per side, appeared/disappeared/type-flip/required-change
    // counts, the largest |presence move| among overlapping keys, and
    // `breaking` exactly when an OLD-required key disappeared or
    // type-flipped (fetch and search here; mail only warns).
    Q("q_contract_drift_card",
      (s, d) => {
        import graft.operators.Chats
        val six = sixShapeToolTurns(s, d)
        Chats.contractDriftCard(Chats.contractDrift(
            Chats.toolContractInfer(
              six.filter(col("doc_id") % 2 === 0), "doc_id"),
            Chats.toolContractInfer(
              six.filter(col("doc_id") % 2 === 1), "doc_id")))
          .orderBy(col("tool_name"))
      },
      Some(s"""WITH $contractDriftSql
        SELECT tool_name,
          $contractCardAggSql
        FROM drift GROUP BY 1 ORDER BY 1""")),

    // Chain-transition DRIFT (r19 — toolChains' monitoring twin):
    // each (src→dst) transition is a token, counts feed the same
    // exact-integer smoothed-KL report as q_unigram_drift. Even doc
    // ids (trace shapes 0/2/4: single-search traces) vs odd (shapes
    // 1/3: the two-call search→fetch class joins) — the union
    // vocabulary gains search→fetch and fetch→__end. The oracle
    // replays both chain extractions and the 1e6-scaled ln
    // arithmetic.
    Q("q_chain_drift",
      (s, d) => {
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val docs = Tables.documents(s, d).select(col("doc_id"),
          toolTraceJson(col("doc_id"), ct).as("chat"))
        def chains(par: Int) = Chats.toolChains(
          Chats.toolTurns(docs.filter(col("doc_id") % 2 === par),
            "chat", "doc_id"), "doc_id")
        Chats.chainDrift(chains(0), chains(1))
      },
      Some {
        def u6(x: String) =
          s"CAST(ROUND(ROUND(LN($x), 6) * 1e6) AS BIGINT)"
        def chainSql(sfx: String, par: Int) =
          s"""cc$sfx AS (SELECT doc_id, turn_idx,
              unnest(range(len(calls))) AS p,
              unnest([c.nm FOR c IN calls]) AS tool_name
            FROM tt WHERE calls IS NOT NULL AND doc_id % 2 = $par),
          sq$sfx AS (SELECT doc_id, tool_name,
              COALESCE(lag(tool_name) OVER (PARTITION BY doc_id
                ORDER BY turn_idx, p), '__start') AS src,
              row_number() OVER (PARTITION BY doc_id
                ORDER BY turn_idx DESC, p DESC) AS rn
            FROM cc$sfx),
          ch$sfx AS (SELECT CAST(LENGTH(src) AS VARCHAR) || ':'
                || src || '→' || dst AS token,
              COUNT(*) AS cnt FROM (
                SELECT src, tool_name AS dst FROM sq$sfx
                UNION ALL
                SELECT tool_name, '__end' FROM sq$sfx WHERE rn = 1)
            GROUP BY 1)"""
        s"""WITH $toolTraceSql,
        ${chainSql("a", 0)}, ${chainSql("b", 1)},
        j AS (SELECT COALESCE(a.token, b.token) AS token,
            COALESCE(a.cnt, 0) AS c_a, COALESCE(b.cnt, 0) AS c_b
          FROM cha a FULL OUTER JOIN chb b ON a.token = b.token),
        sc AS (SELECT CAST(SUM(c_a) AS BIGINT) AS na,
            CAST(SUM(c_b) AS BIGINT) AS nb,
            CAST(COUNT(*) AS BIGINT) AS v FROM j),
        tm AS (SELECT c_a, c_b,
            (c_a + 1) * (
              ${u6("CAST(c_a + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)")}
              - ${u6("CAST(c_b + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)")})
            AS term_u
          FROM j CROSS JOIN sc)
        SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
          CAST(SUM(c_b) AS BIGINT) AS n_b,
          CAST(COUNT(*) AS BIGINT) AS v_union,
          CAST(SUM(term_u) AS BIGINT) AS kl_u,
          ROUND(CAST(SUM(term_u) AS DOUBLE) /
            (CAST(SUM(c_a) + COUNT(*) AS DOUBLE) * 1e6), 6) AS kl
        FROM tm"""
      }),

    // Conversation-TREE flattening (r18 — branched exports with
    // regenerated answers): each 4-node synthesized tree (root user →
    // two sibling assistant regens, one carrying a user follow-up)
    // flattens to one linear conversation per LEAF via pointer-
    // doubling on the parent pointers. Leaves are the follow-up
    // (path length 3) and the sibling regen (path length 2); the
    // shared root duplicates across both paths BY DESIGN. The oracle
    // re-walks the forest with a recursive CTE from the roots and
    // zips each leaf path with its ordinality.
    Q("q_tree_paths",
      (s, d) => {
        import graft.operators.Chats
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val parent = when(did % 4 === 0, lit(null).cast("long"))
          .when(did % 4 === 1, did - 1)
          .otherwise(did - 2)
        val role = when(did % 4 === 1 || did % 4 === 2,
          lit("assistant")).otherwise(lit("user"))
        val nodes = Tables.documents(s, d).select(
          did.as("node_id"), parent.as("parent_id"), role.as("role"),
          ct.substr(lit(1) + (did % 4 * 3).cast("int"), lit(10))
            .as("content"))
        Chats.treePaths(nodes, "node_id", "parent_id")
          .select(col("conv_id"), col("turn_idx"), col("node_id"),
            col("role"), col("content"))
          .orderBy(col("conv_id"), col("turn_idx"))
      },
      Some(s"""WITH RECURSIVE nd AS (SELECT doc_id AS id,
            CASE WHEN doc_id % 4 = 0 THEN NULL
              WHEN doc_id % 4 = 1 THEN doc_id - 1
              ELSE doc_id - 2 END AS parent,
            CASE WHEN doc_id % 4 IN (1, 2) THEN 'assistant'
              ELSE 'user' END AS role,
            substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'),
              CAST(1 + (doc_id % 4) * 3 AS BIGINT), 10) AS content
          FROM documents),
        walk AS (
          SELECT id, [id] AS path FROM nd WHERE parent IS NULL
          UNION ALL
          SELECT nd.id, array_append(walk.path, nd.id)
          FROM walk JOIN nd ON nd.parent = walk.id),
        lv AS (SELECT id, path FROM walk
          WHERE id NOT IN (SELECT parent FROM nd
            WHERE parent IS NOT NULL)),
        ex AS (SELECT id AS conv_id,
            unnest(range(len(path))) AS turn_idx,
            unnest(path) AS node_id
          FROM lv)
        SELECT ex.conv_id, CAST(ex.turn_idx AS BIGINT) AS turn_idx,
          ex.node_id, nd.role, nd.content
        FROM ex JOIN nd ON nd.id = ex.node_id
        ORDER BY conv_id, turn_idx""")),

    // TREE → SFT capstone (r19 — the composition treePaths' scaladoc
    // points at): branched exports flatten to one path per leaf,
    // sibling paths share the rendered PROMPT PREFIX (turns before
    // the first assistant turn), dedupeByPrompt keeps ONE path per
    // branch point (longest path wins, ties by conv_id string), the
    // survivors price in learned-BPE tokens and FFD-pack into
    // 32-token windows with per-turn loss-mask spans REBASED into
    // their window — the q_sft_windows contract over tree input. The
    // oracle replays ALL of it: merge learning, the recursive-CTE
    // walk, prefix rendering, the keep-best window, per-turn token
    // counts, the FFD recursion, and the rebase join.
    Q("q_tree_sft_windows",
      (s, d) => {
        import graft.operators.{Chats, Packing}
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val parent = when(did % 4 === 0, lit(null).cast("long"))
          .when(did % 4 === 1, did - 1)
          .otherwise(did - 2)
        val role = when(did % 4 === 1 || did % 4 === 2,
          lit("assistant")).otherwise(lit("user"))
        val nodes = Tables.documents(s, d).select(
          did.as("node_id"), parent.as("parent_id"), role.as("role"),
          ct.substr(lit(1) + (did % 4 * 3).cast("int"), lit(10))
            .as("content"))
        // snapshot once (optimization round 19): paths feeds firstA,
        // the prompt render, the per-path score agg AND the span build —
        // each reference otherwise replays treePaths' payload join
        val paths = graft.operators.Checkpoints.eager(
          Chats.treePaths(nodes, "node_id", "parent_id")
            .select(col("conv_id"), col("turn_idx"), col("role"),
              col("content")))
        val firstA = paths.filter(col("role") === "assistant")
          .groupBy(col("conv_id"))
          .agg(min(col("turn_idx")).as("__fa"))
        val prompts = Chats.packWithMask(
            paths.join(firstA, Seq("conv_id"), "left")
              .filter(col("__fa").isNull ||
                col("turn_idx") < col("__fa")), "conv_id")
          .select(col("conv_id"), col("text").as("prompt_text"))
        val scores = paths.groupBy(col("conv_id"))
          .agg(count(lit(1)).as("n_path_turns"))
        val kept = Chats.dedupeByPrompt(
            prompts.join(scores, Seq("conv_id")),
            "conv_id", "prompt_text", "n_path_turns")
          .select(col("conv_id"))
        val spans = graft.operators.Checkpoints.eager(
          Chats.tokenSpans(paths.join(kept, Seq("conv_id")),
            "conv_id", roundtripMerges(s, d)))
        val conv = spans.groupBy(col("conv_id"))
          .agg(max(col("token_end")).as("len"))
          .withColumn("grp", col("conv_id") % 4)
        val packed = Packing.packExamples(conv, "conv_id", "len",
          "grp", capacity = 32L)
        spans.join(packed.select(col("conv_id"), col("grp"),
            col("bin"), col("slot"), col("start_off")), "conv_id")
          .select(col("conv_id"), col("turn_idx"), col("role"),
            col("mask"), col("grp"), col("bin"), col("slot"),
            (col("start_off") + col("token_start")).as("win_start"),
            (col("start_off") + col("token_end")).as("win_end"))
          .orderBy(col("conv_id"), col("turn_idx"))
      },
      Some {
        s"""WITH RECURSIVE w AS (
          SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(${toksSql("text")}) AS word FROM documents)
          WHERE regexp_matches(word, '^[a-z0-9]+$$')
          GROUP BY word),
        e0 AS (SELECT rtrim(regexp_replace(word, '(.)', '|\\1| ', 'g')) AS e,
          freq FROM w),
        ${bpeRoundSql(1)}, ${bpeRoundSql(2)}, ${bpeRoundSql(3)},
        nd AS (SELECT doc_id AS id,
            CASE WHEN doc_id % 4 = 0 THEN NULL
              WHEN doc_id % 4 = 1 THEN doc_id - 1
              ELSE doc_id - 2 END AS parent,
            CASE WHEN doc_id % 4 IN (1, 2) THEN 'assistant'
              ELSE 'user' END AS role,
            substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'),
              CAST(1 + (doc_id % 4) * 3 AS BIGINT), 10) AS content
          FROM documents),
        walk AS (
          SELECT id, [id] AS path FROM nd WHERE parent IS NULL
          UNION ALL
          SELECT nd.id, array_append(walk.path, nd.id)
          FROM walk JOIN nd ON nd.parent = walk.id),
        tp AS (SELECT ex.conv_id,
            CAST(ex.turn_idx AS BIGINT) AS turn_idx,
            nd.role, nd.content
          FROM (SELECT id AS conv_id,
              unnest(range(len(path))) AS turn_idx,
              unnest(path) AS node_id
            FROM walk
            WHERE id NOT IN (SELECT parent FROM nd
              WHERE parent IS NOT NULL)) ex
          JOIN nd ON nd.id = ex.node_id),
        fa AS (SELECT conv_id, MIN(turn_idx) AS fa FROM tp
          WHERE role = 'assistant' GROUP BY 1),
        pr AS (SELECT tp.conv_id,
            string_agg('<|' || tp.role || '|>' || tp.content
              || chr(10), '' ORDER BY tp.turn_idx) AS ptext
          FROM tp LEFT JOIN fa ON fa.conv_id = tp.conv_id
          WHERE fa.fa IS NULL OR tp.turn_idx < fa.fa
          GROUP BY 1),
        sc AS (SELECT conv_id, COUNT(*) AS n_path FROM tp
          GROUP BY 1),
        keep AS (SELECT conv_id FROM (
            SELECT pr.conv_id,
              row_number() OVER (PARTITION BY pr.ptext
                ORDER BY sc.n_path DESC,
                  CAST(pr.conv_id AS VARCHAR)) AS rk
            FROM pr JOIN sc ON sc.conv_id = pr.conv_id)
          WHERE rk = 1),
        vtt AS (SELECT tp.* FROM tp JOIN keep
          ON keep.conv_id = tp.conv_id),
        vtr AS (SELECT conv_id, turn_idx, role,
          '<|' || role || '|>' || content || chr(10) AS rt FROM vtt),
        vtk AS (SELECT conv_id, turn_idx, role,
            unnest(${toksSql("rt")}) AS wt FROM vtr),
        vsg AS (SELECT conv_id, turn_idx, role,
          CASE WHEN regexp_matches(wt, '^[a-z0-9]+$$') THEN
            len(string_split(
              replace(replace(replace(
                rtrim(regexp_replace(wt, '(.)', '|\\1| ', 'g')),
                b1.pat, replace(b1.pat, '| |', '')),
                b2.pat, replace(b2.pat, '| |', '')),
                b3.pat, replace(b3.pat, '| |', '')), ' '))
          ELSE 1 END AS ntk
          FROM vtk, b1, b2, b3),
        vcnt AS (SELECT conv_id, turn_idx, role,
          CAST(SUM(ntk) AS BIGINT) AS n_tok
          FROM vsg GROUP BY conv_id, turn_idx, role),
        vcof AS (SELECT *,
          CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY conv_id
            ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS token_start
        FROM vcnt),
        cv AS (SELECT conv_id, conv_id % 4 AS grp,
          CAST(SUM(n_tok) AS BIGINT) AS len
          FROM vcnt GROUP BY conv_id),
        it AS (SELECT grp, conv_id AS id, len,
          ROW_NUMBER() OVER (PARTITION BY grp
            ORDER BY len DESC, CAST(conv_id AS VARCHAR)) AS i,
          COUNT(*) OVER (PARTITION BY grp) AS nn
          FROM cv),
        st AS (
          SELECT grp, CAST(0 AS BIGINT) AS i, CAST(NULL AS BIGINT) AS id,
            CAST(NULL AS BIGINT) AS len, CAST(NULL AS BIGINT) AS bin,
            CAST([] AS BIGINT[]) AS caps, nn
          FROM (SELECT DISTINCT grp, nn FROM it)
          UNION ALL
          SELECT it.grp, it.i, it.id, it.len,
            CASE WHEN $ffdPosSql IS NULL THEN len(st.caps)
                 ELSE $ffdPosSql - 1 END AS bin,
            CASE WHEN $ffdPosSql IS NULL
                 THEN list_append(st.caps, 32 - it.len)
                 ELSE list_slice(st.caps, 1, $ffdPosSql - 1)
                      || [st.caps[$ffdPosSql] - it.len]
                      || list_slice(st.caps, $ffdPosSql + 1, len(st.caps))
                 END AS caps,
            st.nn
          FROM st JOIN it ON it.grp = st.grp AND it.i = st.i + 1
          WHERE st.i < st.nn),
        asg AS (SELECT grp, id, CAST(bin AS BIGINT) AS bin,
          CAST(ROW_NUMBER() OVER (PARTITION BY grp, bin ORDER BY i) - 1
            AS BIGINT) AS slot,
          CAST(COALESCE(SUM(len) OVER (PARTITION BY grp, bin ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_off
          FROM st WHERE i > 0)
        SELECT c.conv_id, c.turn_idx, c.role,
          (c.role = 'assistant') AS mask,
          CAST(a.grp AS BIGINT) AS grp, a.bin, a.slot,
          CAST(a.start_off + c.token_start AS BIGINT) AS win_start,
          CAST(a.start_off + c.token_start + c.n_tok AS BIGINT)
            AS win_end
        FROM vcof c JOIN asg a ON c.conv_id = a.id
        ORDER BY c.conv_id, c.turn_idx"""
      },
      setup = Some((s, d) => roundtripMerges(s, d))),

    // SESSION → SFT-WINDOWS capstone (r19 — q_session_episodes
    // carried all the way to the loader shape, the batch twin of the
    // streaming ingest capstones end-to-end): gap-sessions assemble
    // into chat episodes, protocol validation gates them (odd-length
    // sessions drop), survivors price in learned-BPE tokens (the
    // numeric content suffix genuinely segments), and FFD-pack into
    // 16-token windows per user%4 shard with per-turn mask spans
    // rebased into their window. The oracle replays sessionization,
    // assembly, the validation rules, merge learning, token counts,
    // the FFD recursion, and the rebase — one statement over events
    // AND documents.
    Q("q_session_sft_windows",
      (s, d) => {
        import graft.operators.{Chats, Funnel, Packing}
        // snapshots as in q_sft_windows: turns feeds validate + the span
        // build; spans feeds the length agg, packExamples' back-join and
        // the final join (optimization round 19)
        val turns = graft.operators.Checkpoints.eager(
          Funnel.sessionEpisodes(Tables.events(s, d),
            "user_id", "ts", gapSec = 1800,
            contentCol = concat(col("event_type"), lit(" "),
              (col("event_id") % 100).cast("string")),
            tieCols = Seq("event_id")))
        val valid = Chats.validateTurns(turns, "conv_id")
          .filter(col("valid")).select(col("conv_id"))
        val spans = graft.operators.Checkpoints.eager(
          Chats.tokenSpans(turns.join(valid, Seq("conv_id")),
            "conv_id", roundtripMerges(s, d)))
        val conv = spans.groupBy(col("conv_id"))
          .agg(max(col("token_end")).as("len"))
          .withColumn("grp",
            split(col("conv_id"), ":").getItem(0).cast("long") % 4)
        val packed = Packing.packExamples(conv, "conv_id", "len",
          "grp", capacity = 16L)
        spans.join(packed.select(col("conv_id"), col("grp"),
            col("bin"), col("slot"), col("start_off")),
            Seq("conv_id"))
          .select(col("conv_id"), col("turn_idx"), col("role"),
            col("mask"), col("grp"), col("bin"), col("slot"),
            (col("start_off") + col("token_start")).as("win_start"),
            (col("start_off") + col("token_end")).as("win_end"))
          .orderBy(col("conv_id"), col("turn_idx"))
      },
      Some {
        s"""WITH RECURSIVE ${Par.evCte},
        w AS (
          SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(${toksSql("text")}) AS word FROM documents)
          WHERE regexp_matches(word, '^[a-z0-9]+$$')
          GROUP BY word),
        e0 AS (SELECT rtrim(regexp_replace(word, '(.)', '|\\1| ', 'g')) AS e,
          freq FROM w),
        ${bpeRoundSql(1)}, ${bpeRoundSql(2)}, ${bpeRoundSql(3)},
        sess AS (SELECT user_id, event_id, event_type, ts,
          SUM(CASE WHEN prev IS NULL
              OR epoch_us(ts) - epoch_us(prev) > 1800000000
              THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - 1 AS session_idx
          FROM (SELECT user_id, event_id, event_type, ts,
              lag(ts) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS prev
            FROM ev)),
        tr AS (SELECT CAST(user_id AS VARCHAR) || ':'
              || CAST(session_idx AS VARCHAR) AS conv_id,
            row_number() OVER (PARTITION BY user_id, session_idx
              ORDER BY ts, event_id) - 1 AS turn_idx,
            event_type || ' ' || CAST(event_id % 100 AS VARCHAR)
              AS content
          FROM sess),
        tw AS (SELECT conv_id, turn_idx,
            CASE WHEN turn_idx % 2 = 0 THEN 'user'
              ELSE 'assistant' END AS role, content
          FROM tr),
        tl AS (SELECT *, lag(role) OVER (PARTITION BY conv_id
              ORDER BY turn_idx) AS pr
          FROM tw),
        tv AS (SELECT conv_id,
            (MIN(CASE WHEN COALESCE(
                role IN ('system', 'user', 'assistant')
                AND (role != 'system' OR turn_idx = 0)
                AND CASE WHEN pr IS NULL
                  THEN role IN ('system', 'user')
                  WHEN pr = 'system' THEN role = 'user'
                  ELSE role != pr END, FALSE)
              THEN 1 ELSE 0 END) = 1
              AND arg_max(role, turn_idx) = 'assistant') AS valid
          FROM tl GROUP BY 1),
        vtr AS (SELECT tw.conv_id, tw.turn_idx, tw.role,
            '<|' || tw.role || '|>' || COALESCE(tw.content, '')
              || chr(10) AS rt
          FROM tw JOIN tv ON tv.conv_id = tw.conv_id
          WHERE tv.valid),
        vtk AS (SELECT conv_id, turn_idx, role,
            unnest(${toksSql("rt")}) AS wt FROM vtr),
        vsg AS (SELECT conv_id, turn_idx, role,
          CASE WHEN regexp_matches(wt, '^[a-z0-9]+$$') THEN
            len(string_split(
              replace(replace(replace(
                rtrim(regexp_replace(wt, '(.)', '|\\1| ', 'g')),
                b1.pat, replace(b1.pat, '| |', '')),
                b2.pat, replace(b2.pat, '| |', '')),
                b3.pat, replace(b3.pat, '| |', '')), ' '))
          ELSE 1 END AS ntk
          FROM vtk, b1, b2, b3),
        vcnt AS (SELECT conv_id, turn_idx, role,
          CAST(SUM(ntk) AS BIGINT) AS n_tok
          FROM vsg GROUP BY conv_id, turn_idx, role),
        vcof AS (SELECT *,
          CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY conv_id
            ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS token_start
        FROM vcnt),
        cv AS (SELECT conv_id,
          CAST(string_split(conv_id, ':')[1] AS BIGINT) % 4 AS grp,
          CAST(SUM(n_tok) AS BIGINT) AS len
          FROM vcnt GROUP BY conv_id),
        it AS (SELECT grp, conv_id AS id, len,
          ROW_NUMBER() OVER (PARTITION BY grp
            ORDER BY len DESC, conv_id) AS i,
          COUNT(*) OVER (PARTITION BY grp) AS nn
          FROM cv),
        st AS (
          SELECT grp, CAST(0 AS BIGINT) AS i,
            CAST(NULL AS VARCHAR) AS id,
            CAST(NULL AS BIGINT) AS len, CAST(NULL AS BIGINT) AS bin,
            CAST([] AS BIGINT[]) AS caps, nn
          FROM (SELECT DISTINCT grp, nn FROM it)
          UNION ALL
          SELECT it.grp, it.i, it.id, it.len,
            CASE WHEN $ffdPosSql IS NULL THEN len(st.caps)
                 ELSE $ffdPosSql - 1 END AS bin,
            CASE WHEN $ffdPosSql IS NULL
                 THEN list_append(st.caps, 16 - it.len)
                 ELSE list_slice(st.caps, 1, $ffdPosSql - 1)
                      || [st.caps[$ffdPosSql] - it.len]
                      || list_slice(st.caps, $ffdPosSql + 1, len(st.caps))
                 END AS caps,
            st.nn
          FROM st JOIN it ON it.grp = st.grp AND it.i = st.i + 1
          WHERE st.i < st.nn),
        asg AS (SELECT grp, id, CAST(bin AS BIGINT) AS bin,
          CAST(ROW_NUMBER() OVER (PARTITION BY grp, bin ORDER BY i) - 1
            AS BIGINT) AS slot,
          CAST(COALESCE(SUM(len) OVER (PARTITION BY grp, bin ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_off
          FROM st WHERE i > 0)
        SELECT c.conv_id, c.turn_idx, c.role,
          (c.role = 'assistant') AS mask,
          CAST(a.grp AS BIGINT) AS grp, a.bin, a.slot,
          CAST(a.start_off + c.token_start AS BIGINT) AS win_start,
          CAST(a.start_off + c.token_start + c.n_tok AS BIGINT)
            AS win_end
        FROM vcof c JOIN asg a ON c.conv_id = a.id
        ORDER BY c.conv_id, c.turn_idx"""
      },
      setup = Some((s, d) => roundtripMerges(s, d))),

    // Precision-recall CURVE (r18 — the threshold-sweep card behind
    // "route everything the quality classifier scores above t"): the
    // corpus reduces FIRST to per-distinct-score (n, tp) rows, and
    // only that threshold-sized frame enters the cumulative window —
    // never a corpus-sized single partition. Scores take 101 distinct
    // values with ties; gold ≈ every third doc. The oracle replays
    // the per-score agg, the descending cumulative sums, and all
    // three rounded ratios.
    Q("q_pr_curve",
      (s, d) => graft.operators.Classifier.prCurve(
          Tables.documents(s, d).select(
            (col("doc_id") % 3 === 0).as("gold"),
            ((col("doc_id") * 7 % 101).cast("double") / 100.0)
              .as("score")),
          "gold", "score")
        .orderBy(col("threshold").desc),
      Some("""WITH sc AS (SELECT (doc_id % 3 = 0) AS gold,
            CAST((doc_id * 7) % 101 AS DOUBLE) / 100.0 AS threshold
          FROM documents),
        ps AS (SELECT threshold, COUNT(*) AS n,
            SUM(CASE WHEN gold THEN 1 ELSE 0 END) AS tp0
          FROM sc GROUP BY 1),
        cm AS (SELECT threshold,
            CAST(SUM(n) OVER w AS BIGINT) AS n_ge,
            CAST(SUM(tp0) OVER w AS BIGINT) AS tp,
            CAST(SUM(tp0) OVER () AS BIGINT) AS pos
          FROM ps WINDOW w AS (ORDER BY threshold DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT threshold, n_ge, tp, n_ge - tp AS fp,
          ROUND(CAST(tp AS DOUBLE) / n_ge, 6) AS precision,
          CASE WHEN pos = 0 THEN NULL
            ELSE ROUND(CAST(tp AS DOUBLE) / pos, 6) END AS recall,
          CASE WHEN tp = 0 THEN 0.0
            ELSE ROUND(2.0 * tp / (n_ge + pos), 6) END AS f1
        FROM cm ORDER BY threshold DESC""")),

    // Operating-point PICKER over the same sweep (r19 — the last
    // mile of "route everything above t"): max-F1 (ties → highest
    // threshold), max-recall-subject-to-precision≥0.2 (the lowest
    // qualifying threshold), and max-precision-subject-to-recall≥0.5
    // — three top-1 reductions over the threshold-sized curve, never
    // the corpus. The oracle replays the full curve and each
    // ORDER-BY-LIMIT-1 arg-max with the same deterministic
    // tie-breaks.
    Q("q_threshold_pick",
      (s, d) => {
        import graft.operators.Classifier
        val curve = Classifier.prCurve(
          Tables.documents(s, d).select(
            (col("doc_id") % 3 === 0).as("gold"),
            ((col("doc_id") * 7 % 101).cast("double") / 100.0)
              .as("score")),
          "gold", "score")
        Classifier.thresholdPick(curve, "max_f1")
          .unionAll(Classifier.thresholdPick(curve,
            "precision_floor", 0.2))
          .unionAll(Classifier.thresholdPick(curve,
            "recall_floor", 0.5))
          .orderBy(col("objective"))
      },
      Some("""WITH sc AS (SELECT (doc_id % 3 = 0) AS gold,
            CAST((doc_id * 7) % 101 AS DOUBLE) / 100.0 AS threshold
          FROM documents),
        ps AS (SELECT threshold, COUNT(*) AS n,
            SUM(CASE WHEN gold THEN 1 ELSE 0 END) AS tp0
          FROM sc GROUP BY 1),
        cm AS (SELECT threshold,
            CAST(SUM(n) OVER w AS BIGINT) AS n_ge,
            CAST(SUM(tp0) OVER w AS BIGINT) AS tp,
            CAST(SUM(tp0) OVER () AS BIGINT) AS pos
          FROM ps WINDOW w AS (ORDER BY threshold DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        curve AS (SELECT threshold, n_ge, tp, n_ge - tp AS fp,
            ROUND(CAST(tp AS DOUBLE) / n_ge, 6) AS precision,
            CASE WHEN pos = 0 THEN NULL
              ELSE ROUND(CAST(tp AS DOUBLE) / pos, 6) END AS recall,
            CASE WHEN tp = 0 THEN 0.0
              ELSE ROUND(2.0 * tp / (n_ge + pos), 6) END AS f1
          FROM cm)
        SELECT * FROM (
          (SELECT 'max_f1' AS objective, * FROM curve
            ORDER BY f1 DESC, threshold DESC LIMIT 1)
          UNION ALL
          (SELECT 'precision_floor' AS objective, * FROM curve
            WHERE precision >= 0.2 ORDER BY threshold LIMIT 1)
          UNION ALL
          (SELECT 'recall_floor' AS objective, * FROM curve
            WHERE recall >= 0.5
            ORDER BY precision DESC, threshold DESC LIMIT 1))
        ORDER BY objective""")),

    // RELIABILITY card (r19 — "is a score of 0.9 right 90% of the
    // time?"): the same scored frame bins into 10 equal-width bins
    // (1.0 joins the last), per bin the exact-decimal mean score vs
    // the empirical positive fraction and their gap. Scores here are
    // label-independent, so a well-sampled bin's frac_pos ≈ 1/3 at
    // every confidence — a maximally UNcalibrated classifier, which
    // is the point of the card. The oracle replays bins, decimal
    // sums, and the rounded-column gap.
    Q("q_calibration",
      (s, d) => graft.operators.Classifier.calibration(
          Tables.documents(s, d).select(
            (col("doc_id") % 3 === 0).as("gold"),
            ((col("doc_id") * 7 % 101).cast("double") / 100.0)
              .as("score")),
          "gold", "score", nBins = 10)
        .orderBy(col("bin")),
      Some("""WITH sc AS (SELECT (doc_id % 3 = 0) AS gold,
            CAST((doc_id * 7) % 101 AS DOUBLE) / 100.0 AS score
          FROM documents),
        b AS (SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9)
              AS bin,
            CAST(score AS DECIMAL(18,6)) AS s,
            CASE WHEN gold THEN 1 ELSE 0 END AS g
          FROM sc),
        ag AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
            SUM(s) AS ss, SUM(g) AS tp
          FROM b GROUP BY 1)
        SELECT bin, n,
          ROUND(CAST(ss AS DOUBLE) / n, 6) AS mean_score,
          ROUND(CAST(tp AS DOUBLE) / n, 6) AS frac_pos,
          ROUND(ABS(ROUND(CAST(ss AS DOUBLE) / n, 6)
            - ROUND(CAST(tp AS DOUBLE) / n, 6)), 6) AS gap
        FROM ag ORDER BY bin""")),

    // Its one-number roll-up: ECE = Σ (n_b/N)·gap_b over the card's
    // rounded gaps, summed in exact integer micro-units.
    Q("q_calibration_ece",
      (s, d) => graft.operators.Classifier.calibrationError(
        graft.operators.Classifier.calibration(
          Tables.documents(s, d).select(
            (col("doc_id") % 3 === 0).as("gold"),
            ((col("doc_id") * 7 % 101).cast("double") / 100.0)
              .as("score")),
          "gold", "score", nBins = 10)),
      Some("""WITH sc AS (SELECT (doc_id % 3 = 0) AS gold,
            CAST((doc_id * 7) % 101 AS DOUBLE) / 100.0 AS score
          FROM documents),
        b AS (SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9)
              AS bin,
            CAST(score AS DECIMAL(18,6)) AS s,
            CASE WHEN gold THEN 1 ELSE 0 END AS g
          FROM sc),
        ag AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
            SUM(s) AS ss, SUM(g) AS tp
          FROM b GROUP BY 1),
        card AS (SELECT bin, n,
            ROUND(ABS(ROUND(CAST(ss AS DOUBLE) / n, 6)
              - ROUND(CAST(tp AS DOUBLE) / n, 6)), 6) AS gap
          FROM ag)
        SELECT CAST(SUM(n) AS BIGINT) AS n,
          ROUND(CAST(SUM(n * CAST(ROUND(gap * 1e6) AS BIGINT))
            AS DOUBLE) / 1e6 / SUM(n), 6) AS ece
        FROM card""")),

    // Cohen's KAPPA (r19 — inter-annotator agreement for label
    // audits): two deterministic raters over the corpus — rater b
    // re-derives from a doc_id-shifted key, so they agree exactly
    // where doc_id % 5 lands on a multiple of 3 — chance-corrected
    // via the label marginals. The oracle replays the margins, both
    // rounded probabilities, and κ from the rounded values.
    Q("q_kappa",
      (s, d) => {
        def lbl(c: org.apache.spark.sql.Column) =
          when(c % 3 === 0, "x").when(c % 3 === 1, "y")
            .otherwise("z")
        graft.operators.Classifier.cohenKappa(
          Tables.documents(s, d).select(
            lbl(col("doc_id")).as("a"),
            lbl(col("doc_id") + col("doc_id") % 5).as("b")),
          "a", "b")
      },
      Some("""WITH lb AS (SELECT
            CASE WHEN doc_id % 3 = 0 THEN 'x'
              WHEN doc_id % 3 = 1 THEN 'y' ELSE 'z' END AS a,
            CASE WHEN (doc_id + doc_id % 5) % 3 = 0 THEN 'x'
              WHEN (doc_id + doc_id % 5) % 3 = 1 THEN 'y'
              ELSE 'z' END AS b
          FROM documents),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
              AS n_agree
          FROM lb),
        ma AS (SELECT a AS l, COUNT(*) AS ca FROM lb GROUP BY 1),
        mb AS (SELECT b AS l, COUNT(*) AS cb FROM lb GROUP BY 1),
        pe AS (SELECT COALESCE(SUM(ca * cb), 0) AS pen
          FROM ma JOIN mb ON ma.l = mb.l),
        pr AS (SELECT n, n_agree,
            CASE WHEN n > 0
              THEN ROUND(CAST(n_agree AS DOUBLE) / n, 6) END AS po,
            CASE WHEN n > 0
              THEN ROUND(CAST(pen AS DOUBLE) / n / n, 6) END AS pe
          FROM tot CROSS JOIN pe)
        SELECT n, n_agree, po, pe,
          CASE WHEN pe = 1.0 THEN
              CASE WHEN po = 1.0 THEN 1.0 END
            ELSE ROUND((po - pe) / (1.0 - pe), 6) END AS kappa
        FROM pr""")),

    // FLEISS' kappa (r19 — multi-rater consensus for judge
    // ensembles): three deterministic raters per document (rater r's
    // label shifts by r·(doc_id % 5)), every item exactly 3 ratings.
    // All sums exact integers; the oracle replays the per-item and
    // per-label count algebra and both rounded probabilities.
    Q("q_fleiss_kappa",
      (s, d) => {
        val did = col("doc_id")
        val lbl = (r: Int) =>
          ((did + lit(r) * (did % 5)) % 3).cast("string")
        graft.operators.Classifier.fleissKappa(
          Tables.documents(s, d).select(did.as("item"),
            explode(array(lbl(0), lbl(1), lbl(2))).as("label")),
          "item", "label")
      },
      Some("""WITH rt AS (
          SELECT doc_id AS item,
            CAST(doc_id % 3 AS VARCHAR) AS label FROM documents
          UNION ALL
          SELECT doc_id,
            CAST((doc_id + doc_id % 5) % 3 AS VARCHAR)
          FROM documents
          UNION ALL
          SELECT doc_id,
            CAST((doc_id + 2 * (doc_id % 5)) % 3 AS VARCHAR)
          FROM documents),
        cell AS (SELECT item, label, COUNT(*) AS c FROM rt
          GROUP BY 1, 2),
        pi AS (SELECT item, SUM(c) AS n, SUM(c * c) AS s2 FROM cell
          GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
            CAST(MIN(n) AS BIGINT) AS n_raters, SUM(s2) AS s2
          FROM pi),
        pl AS (SELECT label, SUM(c) AS cl FROM cell GROUP BY 1),
        c2 AS (SELECT SUM(cl * cl) AS c2 FROM pl),
        pr AS (SELECT n_items, n_raters,
            ROUND((CAST(s2 AS DOUBLE)
              - n_items * CAST(n_raters AS DOUBLE))
              / (n_items * CAST(n_raters AS DOUBLE)
                * (n_raters - 1)), 6) AS p_bar,
            ROUND(CAST(c2 AS DOUBLE)
              / (n_items * CAST(n_raters AS DOUBLE))
              / (n_items * CAST(n_raters AS DOUBLE)), 6) AS p_e
          FROM tot CROSS JOIN c2)
        SELECT n_items, n_raters, p_bar, p_e,
          CASE WHEN p_e = 1.0 THEN
              CASE WHEN p_bar = 1.0 THEN 1.0 END
            ELSE ROUND((p_bar - p_e) / (1.0 - p_e), 6) END AS kappa
        FROM pr""")),

    // WEIGHTED kappa (r19 — Cohen 1968 for ORDINAL quality ratings,
    // quadratic weights — the model-eval convention): 4-level labels,
    // rater b shifted by doc_id % 3. Both disagreement sums are exact
    // integers over the k×k cells and margins; one double division.
    Q("q_weighted_kappa",
      (s, d) => graft.operators.Classifier.weightedKappa(
        Tables.documents(s, d).select(
          (col("doc_id") % 4).as("a"),
          ((col("doc_id") + col("doc_id") % 3) % 4).as("b")),
        "a", "b", k = 4),
      Some("""WITH lb AS (SELECT doc_id % 4 AS a,
            (doc_id + doc_id % 3) % 4 AS b FROM documents),
        cells AS (SELECT a, b, COUNT(*) AS o FROM lb GROUP BY 1, 2),
        obs AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
            SUM((a - b) * (a - b) * o) AS d_o
          FROM cells),
        ma AS (SELECT a, COUNT(*) AS ra FROM lb GROUP BY 1),
        mb AS (SELECT b, COUNT(*) AS cb FROM lb GROUP BY 1),
        -- d_o / d_e, not dO / dE: DO is a reserved keyword
        ex2 AS (SELECT SUM((a - b) * (a - b) * ra * cb) AS d_e
          FROM ma CROSS JOIN mb)
        SELECT n,
          CASE WHEN d_e = 0 THEN CASE WHEN d_o = 0 THEN 1.0 END
            ELSE ROUND(1.0 - CAST(n AS DOUBLE) * d_o
              / CAST(d_e AS DOUBLE), 6) END AS kappa
        FROM obs CROSS JOIN ex2""")),

    // Length-bucket PADDING report (r18 — "what boundaries should the
    // loader pad to?"): docs land in the smallest bucket that fits,
    // oversized docs land in the -1 overflow row as TRUNCATED tokens.
    // The oracle replays the bucket CASE and every aggregate.
    Q("q_padding_waste",
      (s, d) => graft.operators.Packing.paddingWaste(
          Tables.documents(s, d)
            .select(TA.tokenCount(col("text")).as("len")),
          "len", Seq(16L, 32L, 64L, 128L))
        .orderBy(col("bucket")),
      Some {
        val len = s"len(${toksSql("text")})"
        s"""WITH lw AS (SELECT CAST($len AS BIGINT) AS l
            FROM documents),
        bk AS (SELECT l, CASE WHEN l <= 16 THEN 16
            WHEN l <= 32 THEN 32 WHEN l <= 64 THEN 64
            WHEN l <= 128 THEN 128 ELSE -1 END AS bucket FROM lw),
        ag AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(l) AS BIGINT) AS sum_len
          FROM bk GROUP BY 1),
        cp AS (SELECT *, CAST(CASE WHEN bucket = -1
              THEN n_docs * 128 ELSE bucket * n_docs END AS BIGINT)
            AS capacity
          FROM ag)
        SELECT bucket, n_docs, sum_len, capacity,
          CAST(CASE WHEN bucket = -1 THEN 0
            ELSE capacity - sum_len END AS BIGINT) AS waste,
          CAST(CASE WHEN bucket = -1 THEN sum_len - capacity
            ELSE 0 END AS BIGINT) AS truncated,
          ROUND(CAST(CASE WHEN bucket = -1 THEN 0
              ELSE capacity - sum_len END AS DOUBLE) /
            GREATEST(capacity, 1), 6) AS waste_frac
        FROM cp ORDER BY bucket"""
      }),

    // SORTED-BATCHING assignment (r18 — the loader step the padding
    // card prices): smallest-fitting bucket, salted-hash order within
    // the bucket (reproducible content shuffle, no RNG), consecutive
    // runs of 8 become batches. WHICH batch and slot every document
    // gets is bit-checked — the oracle replays the bucket CASE, the
    // salted hash ranking (VARCHAR id tie-break), and the div/mod.
    Q("q_bucket_batches",
      (s, d) => graft.operators.Packing.bucketBatches(
          Tables.documents(s, d)
            .select(col("doc_id"), TA.tokenCount(col("text"))
              .as("len")),
          "doc_id", "len", Seq(16L, 32L, 64L, 128L), batchSize = 8)
        .orderBy(col("doc_id")),
      Some {
        val len = s"len(${toksSql("text")})"
        s"""WITH bl AS (SELECT doc_id,
            CAST($len AS BIGINT) AS l FROM documents),
        bb AS (SELECT doc_id, CASE WHEN l <= 16 THEN 16
            WHEN l <= 32 THEN 32 WHEN l <= 64 THEN 64
            WHEN l <= 128 THEN 128 ELSE -1 END AS bucket FROM bl),
        rk AS (SELECT doc_id, bucket,
            ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY
              ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")},
              CAST(doc_id AS VARCHAR)) - 1 AS r
          FROM bb)
        SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
          CAST(r // 8 AS BIGINT) AS batch_idx,
          CAST(r % 8 AS BIGINT) AS pos_in_batch
        FROM rk ORDER BY doc_id"""
      }),

    // Tool-usage data card (r17): per tool name — call counts,
    // conversations using it, answered-call counts, mean argument and
    // result payload sizes. Runs over the RAW parsed corpus (all five
    // synthesized shapes) so the triage signal shows: 'search' is
    // called by four classes but answered in only two (the wrong-id
    // and unanswered classes leave n_answered < n_calls); 'fetch'
    // appears only in the valid two-call class and is always
    // answered. The oracle replays the explode, the per-conversation
    // call↔result join, and every aggregate.
    Q("q_tool_stats",
      (s, d) => {
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val docs = Tables.documents(s, d).select(col("doc_id"),
          toolTraceJson(col("doc_id"), ct).as("chat"))
        Chats.toolStats(Chats.toolTurns(docs, "chat", "doc_id"),
            "doc_id")
          .orderBy(col("tool_name"))
      },
      Some(s"""WITH $toolTraceSql,
        ca AS (SELECT doc_id, c.id AS cid, c.nm AS tool_name,
            CAST(length(c.args) AS BIGINT) AS alen
          FROM (SELECT doc_id, unnest(calls) AS c FROM tt
            WHERE calls IS NOT NULL)),
        re AS (SELECT doc_id, tcid AS cid,
            CAST(length(COALESCE(content, '')) AS BIGINT) AS rlen
          FROM tt WHERE role = 'tool'),
        j AS (SELECT ca.*, re.rlen FROM ca LEFT JOIN re
          ON ca.doc_id = re.doc_id AND ca.cid = re.cid)
        SELECT tool_name, CAST(COUNT(*) AS BIGINT) AS n_calls,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_convs,
          CAST(SUM(CASE WHEN rlen IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_answered,
          ROUND(CAST(SUM(alen) AS DOUBLE) / COUNT(*), 6)
            AS avg_args_len,
          CASE WHEN SUM(CASE WHEN rlen IS NOT NULL THEN 1 ELSE 0 END)
              = 0 THEN NULL
            ELSE ROUND(CAST(SUM(rlen) AS DOUBLE) /
              SUM(CASE WHEN rlen IS NOT NULL THEN 1 ELSE 0 END), 6)
          END AS avg_result_len
        FROM j GROUP BY tool_name ORDER BY tool_name""")),

    // Tool-trace context trimming (r17): fitBudget at BLOCK
    // granularity — a calling assistant turn and its tool answers trim
    // as one unit, so the surviving trace stays protocol-valid (a tool
    // result without its call, or a call without its result, would
    // fail validateToolTurns). Valid traces (plain + two-call), budget
    // 130: the two-call traces drop leading units while the plain
    // chats fit whole. The oracle replays the unit key (running-max
    // assistant index), the descending tail sums, the unit-head keep
    // rule, and the re-based offsets.
    Q("q_chat_tool_fit",
      (s, d) => {
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val docs = Tables.documents(s, d).select(col("doc_id"),
          toolTraceJson(col("doc_id"), ct).as("chat"))
        val t = Chats.toolTurns(docs, "chat", "doc_id")
        val valid = Chats.validateToolTurns(t, "doc_id")
          .filter(col("valid")).select(col("doc_id"))
        Chats.fitBudgetTools(t.join(valid, "doc_id"), "doc_id",
            budget = 130L)
          .select(col("doc_id"), col("turn_idx"), col("role"),
            col("kept"), col("new_start"), col("new_end"))
          .orderBy(col("doc_id"), col("turn_idx"))
      },
      Some(s"""WITH $toolTraceSql, $toolRenderSql,
        fr AS (SELECT *, CAST(length(rt) AS BIGINT) AS rl,
          CASE WHEN role = 'tool' THEN
            max(CASE WHEN role = 'assistant' THEN turn_idx END) OVER
              (PARTITION BY doc_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          ELSE turn_idx END AS unit
         FROM vtr),
        f2 AS (SELECT *, (role = 'system' AND turn_idx = 0) AS sys
         FROM fr),
        f3 AS (SELECT *,
          CAST(MAX(CASE WHEN sys THEN rl ELSE 0 END) OVER
            (PARTITION BY doc_id) AS BIGINT) AS syslen,
          CAST(SUM(CASE WHEN sys THEN 0 ELSE rl END) OVER
            (PARTITION BY doc_id ORDER BY turn_idx DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS tail
         FROM f2),
        f4 AS (SELECT *, CAST(MAX(tail) OVER
            (PARTITION BY doc_id, unit) AS BIGINT) AS utail FROM f3),
        f5 AS (SELECT *, (sys OR utail + syslen <= 130) AS kept
         FROM f4),
        f6 AS (SELECT *, CAST(COALESCE(SUM(CASE WHEN kept THEN rl
            ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS ns
         FROM f5)
        SELECT doc_id, turn_idx, role, kept,
          CASE WHEN kept THEN ns END AS new_start,
          CASE WHEN kept THEN CAST(ns + rl AS BIGINT) END AS new_end
        FROM f6 ORDER BY doc_id, turn_idx""")),

    // Protocol-violation TRIAGE card (r18 — the attrition funnel for
    // agentic corpora): per conversation the FIRST FAILED protocol
    // rule by the documented severity order (role / args_parse /
    // dup_call_id / stray_answer / unanswered / transition /
    // pending_final), rolled up per class. The five synthesized
    // shapes land: k∈{0,1} valid, k=2 stray_answer (wrong answer id
    // — it also leaves 'a…' unanswered, so class ORDER is load-
    // bearing), k=3 unanswered (also a transition break — order
    // again), k=4 args_parse ('{oops'). The oracle replays every
    // per-turn flag, the block grouping, the set-difference
    // decomposition, and the severity CASE — not the k→class map.
    Q("q_tool_attrition",
      (s, d) => {
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val docs = Tables.documents(s, d).select(col("doc_id"),
          toolTraceJson(col("doc_id"), ct).as("chat"))
        Chats.toolTriageCard(Chats.toolTurns(docs, "chat", "doc_id"),
            "doc_id")
          .orderBy(col("verdict"))
      },
      Some(s"""WITH $toolTraceSql, $toolTriageSql
        SELECT COALESCE(fail_rule, 'valid') AS verdict,
          CAST(COUNT(*) AS BIGINT) AS n_convs,
          CAST(SUM(n_turns) AS BIGINT) AS n_turns
        FROM av GROUP BY 1 ORDER BY 1""")),

    // SFT TOOL-TRACE capstone (r17 — q_sft_windows' composition for
    // the agentic data class): validateToolTurns gates the protocol,
    // renderToolCalls serializes calls/results, tokenSpans prices
    // every turn in learned-BPE tokens, packExamples FFDs whole
    // traces into 64-token windows per shard group, and each turn's
    // loss-mask span lands REBASED into its window. The oracle
    // replays merge learning, the tool rendering, per-turn token
    // counts, the FFD recursion, and the rebase join in one
    // statement.
    Q("q_sft_tool_windows",
      (s, d) => {
        import graft.operators.{Chats, Packing}
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val docs = Tables.documents(s, d).select(col("doc_id"),
          toolTraceJson(col("doc_id"), ct).as("chat"))
        // snapshots as in q_sft_windows: the tool parse feeds validate +
        // the render, and spans feeds the length agg, packExamples'
        // back-join and the final join (optimization round 19)
        val t = graft.operators.Checkpoints.eager(
          Chats.toolTurns(docs, "chat", "doc_id"))
        val valid = Chats.validateToolTurns(t, "doc_id")
          .filter(col("valid")).select(col("doc_id"))
        val rendered = Chats.renderToolCalls(t.join(valid, "doc_id"),
          "doc_id")
        val spans = graft.operators.Checkpoints.eager(
          Chats.tokenSpans(rendered, "doc_id",
            roundtripMerges(s, d)))
        val conv = spans.groupBy(col("doc_id"))
          .agg(max(col("token_end")).as("len"))
          .withColumn("grp", col("doc_id") % 4)
        val packed = Packing.packExamples(conv, "doc_id", "len", "grp",
          capacity = 64L)
        spans.join(packed.select(col("doc_id"), col("grp"), col("bin"),
            col("slot"), col("start_off")), "doc_id")
          .select(col("doc_id"), col("turn_idx"), col("role"),
            col("mask"), col("grp"), col("bin"), col("slot"),
            (col("start_off") + col("token_start")).as("win_start"),
            (col("start_off") + col("token_end")).as("win_end"))
          .orderBy(col("doc_id"), col("turn_idx"))
      },
      Some {
        s"""WITH RECURSIVE w AS (
          SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(${toksSql("text")}) AS word FROM documents)
          WHERE regexp_matches(word, '^[a-z0-9]+$$')
          GROUP BY word),
        e0 AS (SELECT rtrim(regexp_replace(word, '(.)', '|\\1| ', 'g'))
          AS e, freq FROM w),
        ${bpeRoundSql(1)}, ${bpeRoundSql(2)}, ${bpeRoundSql(3)},
        $toolTraceSql, $toolRenderSql,
        vtk AS (SELECT doc_id, turn_idx, role, unnest(${toksSql("rt")})
          AS wt FROM vtr),
        vsg AS (SELECT doc_id, turn_idx, role,
          CASE WHEN regexp_matches(wt, '^[a-z0-9]+$$') THEN
            len(string_split(
              replace(replace(replace(
                rtrim(regexp_replace(wt, '(.)', '|\\1| ', 'g')),
                b1.pat, replace(b1.pat, '| |', '')),
                b2.pat, replace(b2.pat, '| |', '')),
                b3.pat, replace(b3.pat, '| |', '')), ' '))
          ELSE 1 END AS ntk
          FROM vtk, b1, b2, b3),
        vcnt AS (SELECT doc_id, turn_idx, role,
          CAST(SUM(ntk) AS BIGINT) AS n_tok
          FROM vsg GROUP BY doc_id, turn_idx, role),
        vcof AS (SELECT *,
          CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY doc_id
            ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS token_start
        FROM vcnt),
        cv AS (SELECT doc_id, doc_id % 4 AS grp,
          CAST(SUM(n_tok) AS BIGINT) AS len
          FROM vcnt GROUP BY doc_id),
        it AS (SELECT grp, doc_id AS id, len,
          ROW_NUMBER() OVER (PARTITION BY grp
            ORDER BY len DESC, CAST(doc_id AS VARCHAR)) AS i,
          COUNT(*) OVER (PARTITION BY grp) AS nn
          FROM cv),
        st AS (
          SELECT grp, CAST(0 AS BIGINT) AS i, CAST(NULL AS BIGINT)
            AS id, CAST(NULL AS BIGINT) AS len,
            CAST(NULL AS BIGINT) AS bin,
            CAST([] AS BIGINT[]) AS caps, nn
          FROM (SELECT DISTINCT grp, nn FROM it)
          UNION ALL
          SELECT it.grp, it.i, it.id, it.len,
            CASE WHEN $ffdPosSql IS NULL THEN len(st.caps)
                 ELSE $ffdPosSql - 1 END AS bin,
            CASE WHEN $ffdPosSql IS NULL
                 THEN list_append(st.caps, 64 - it.len)
                 ELSE list_slice(st.caps, 1, $ffdPosSql - 1)
                      || [st.caps[$ffdPosSql] - it.len]
                      || list_slice(st.caps, $ffdPosSql + 1, len(st.caps))
                 END AS caps,
            st.nn
          FROM st JOIN it ON it.grp = st.grp AND it.i = st.i + 1
          WHERE st.i < st.nn),
        asg AS (SELECT grp, id, CAST(bin AS BIGINT) AS bin,
          CAST(ROW_NUMBER() OVER (PARTITION BY grp, bin ORDER BY i) - 1
            AS BIGINT) AS slot,
          CAST(COALESCE(SUM(len) OVER (PARTITION BY grp, bin ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_off
          FROM st WHERE i > 0)
        SELECT c.doc_id, c.turn_idx, c.role,
          (c.role = 'assistant') AS mask,
          CAST(a.grp AS BIGINT) AS grp, a.bin, a.slot,
          CAST(a.start_off + c.token_start AS BIGINT) AS win_start,
          CAST(a.start_off + c.token_start + c.n_tok AS BIGINT)
            AS win_end
        FROM vcof c JOIN asg a ON c.doc_id = a.id
        ORDER BY c.doc_id, c.turn_idx"""
      },
      setup = Some((s, d) => roundtripMerges(s, d))),

    // STREAMING SFT ingest (r16) — the continuous twin of the pack
    // path: a live chat-log feed drives 4 micro-batches through
    // sftIngestSink; malformed conversations (q_chat_validate's %7
    // doubled-speaker / %13 off-vocab / wrong-final shapes) drop at
    // the validator, survivors pack and append tag-idempotently to
    // the accumulated corpus index. In-gate: re-ingesting under a
    // COMMITTED batch tag must not grow the corpus (at-least-once
    // replay no-op). Output = the full accumulated corpus — ids,
    // packed texts, turn counts all replayed closed-form in SQL.
    Q("q_stream_sft_ingest",
      (s, d) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        import graft.operators.Chats
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        def baseRole(i: Int) =
          if (i == 0) "system" else if (i % 2 == 1) "user" else "assistant"
        def roleCol(i: Int): org.apache.spark.sql.Column =
          if (i != 1) lit(baseRole(i))
          else when(did % 7 === 0, "assistant")
            .when(did % 13 === 0, "tool")
            .otherwise(baseRole(i))
        def turn(i: Int) = concat(lit("{\"role\":\""), roleCol(i),
          lit("\",\"content\":\""), substring(ct, 1 + 7 * i, 12 + i),
          lit("\"}"))
        val n = did % 3 + 2
        val json = concat(lit("{\"messages\":["), turn(0), lit(","),
          turn(1),
          when(n > 2, concat(lit(","), turn(2))).otherwise(lit("")),
          when(n > 3, concat(lit(","), turn(3))).otherwise(lit("")),
          lit("]}"))
        val name = s"sftq_${CorpusKey.of(d)}"
        Chats.dropSftCorpus(s, name)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), json.as("chat"))
        val rows = docs.orderBy(col("doc_id"))
          .as[(Long, String)].collect()
        val chunk = math.max(1, math.ceil(rows.length / 4.0).toInt)
        val mem = MemoryStream[(Long, String)]
        val q = graft.streaming.Streams.sftIngestSink(
          mem.toDF().toDF("doc_id", "chat"), "chat", "doc_id", name,
          streamTag = Some("sfq")) { _ => () }.start()
        rows.grouped(chunk).foreach { c =>
          mem.addData(c.toSeq: _*)
          q.processAllAvailable() // one micro-batch per chunk
        }
        q.stop()
        // at-least-once replay of a COMMITTED tag must not grow the
        // corpus (batch 0's tag is sfq_0)
        val n0 = Chats.loadSftCorpus(s, name).count()
        Chats.ingestSft(s, docs, "chat", "doc_id", name, "sfq_0")
        require(Chats.loadSftCorpus(s, name).count() == n0,
          "replayed committed ingest tag must no-op")
        Chats.loadSftCorpus(s, name)
          .select(col("id").cast("long").as("doc_id"), col("text"),
            col("n_turns"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (SELECT doc_id,
          regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
        FROM documents
        WHERE doc_id % 3 = 1 AND doc_id % 7 != 0 AND doc_id % 13 != 0)
        SELECT doc_id,
          '<|system|>' || substr(ct, 1, 12) || chr(10) ||
            '<|user|>' || substr(ct, 8, 13) || chr(10) ||
            '<|assistant|>' || substr(ct, 15, 14) || chr(10) AS text,
          CAST(3 AS BIGINT) AS n_turns
        FROM b ORDER BY doc_id""")),

    // AGENTIC RFT capstone (r17 — selection over complete agent
    // TRAJECTORIES, the q_rft_windows composition for the tool data
    // class): pools of candidate tool traces (valid two-call shape
    // per doc, pools of ≤3 with singletons) score, the protocol gate
    // validates, traces render and pack, bestOfN keeps the top-scored
    // TRACE per pool (ties on the packed text), and the winner's
    // per-turn spans + mask ship as the training rows. The oracle
    // replays rendering, packing, the pool window (rank, runner-up
    // margin, pool size), the winner join, and every span.
    Q("q_rft_tool_windows",
      (s, d) => {
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val cands = Tables.documents(s, d)
          .filter((col("doc_id") * 13) % 7 < 5)
          .select(col("doc_id"),
            floor(col("doc_id") / 3).cast("long").as("pool_id"),
            (floor(col("doc_id") / 2).cast("long") % 50).as("score"),
            toolTraceJson(col("doc_id"), ct, forceK = Some(1))
              .as("chat"))
        // snapshots (optimization round 19): the tool parse feeds
        // validate + render; rendered feeds packWithMask AND turnSpans
        val t = graft.operators.Checkpoints.eager(
          Chats.toolTurns(cands, "chat", "doc_id"))
        val valid = Chats.validateToolTurns(t, "doc_id")
          .filter(col("valid")).select(col("doc_id"))
        val rendered = graft.operators.Checkpoints.eager(
          Chats.renderToolCalls(t.join(valid, "doc_id"),
            "doc_id"))
        val packed = Chats.packWithMask(rendered, "doc_id")
          .join(cands.select(col("doc_id"), col("pool_id"),
            col("score")), "doc_id")
        val winners = Chats.bestOfN(packed, "pool_id", "text", "score")
        val winDoc = winners.join(
          packed.select(col("pool_id"), col("text"),
            col("doc_id")),
          Seq("pool_id")).filter(col("best") === col("text"))
        val spans = Chats.turnSpans(rendered, "doc_id")
        winDoc.join(spans, "doc_id")
          .select(col("pool_id"), col("doc_id"), col("turn_idx"),
            col("role"), col("start"), col("end"), col("mask"),
            col("best_score"), col("n_candidates"), col("margin"))
          .orderBy(col("pool_id"), col("turn_idx"))
      },
      Some(s"""WITH rb AS (SELECT doc_id, doc_id // 3 AS pool_id,
            (doc_id // 2) % 50 AS score,
            regexp_replace(lower(text), '[^a-z ]', '', 'g') AS ct
          FROM documents WHERE (doc_id * 13) % 7 < 5),
        rp AS (SELECT doc_id, pool_id, score,
            substr(ct, 1, 10) AS u, substr(ct, 8, 8) AS a,
            substr(ct, 20, 10) AS fin,
            substr(ct, 12, 8) AS r1, substr(ct, 16, 8) AS r2,
            '{"q":"' || substr(ct, 3, 5) || '"}' AS j1,
            '{"k":"' || substr(ct, 6, 5) || '"}' AS j2,
            'a' || CAST(doc_id AS VARCHAR) AS ida,
            'b' || CAST(doc_id AS VARCHAR) AS idb
          FROM rb),
        rr AS (
          SELECT doc_id, CAST(0 AS BIGINT) AS turn_idx,
            'user' AS role, '<|user|>' || u || chr(10) AS rt FROM rp
          UNION ALL
          SELECT doc_id, 1, 'assistant',
            '<|assistant|>' || a || '<|call:search|>' || j1 ||
              '<|call:fetch|>' || j2 || chr(10) FROM rp
          UNION ALL
          SELECT doc_id, 2, 'tool',
            '<|tool|>[' || idb || '] ' || r2 || chr(10) FROM rp
          UNION ALL
          SELECT doc_id, 3, 'tool',
            '<|tool|>[' || ida || '] ' || r1 || chr(10) FROM rp
          UNION ALL
          SELECT doc_id, 4, 'assistant',
            '<|assistant|>' || fin || chr(10) FROM rp),
        rpk AS (SELECT doc_id,
            string_agg(rt, '' ORDER BY turn_idx) AS text
          FROM rr GROUP BY doc_id),
        rw AS (SELECT p.pool_id, p.doc_id, p.score, k.text,
            ROW_NUMBER() OVER (PARTITION BY p.pool_id
              ORDER BY p.score DESC, k.text) AS rk,
            lead(p.score) OVER (PARTITION BY p.pool_id
              ORDER BY p.score DESC, k.text) AS ns,
            COUNT(*) OVER (PARTITION BY p.pool_id) AS nc
          FROM rp p JOIN rpk k ON k.doc_id = p.doc_id),
        rwin AS (SELECT pool_id, doc_id, score AS best_score,
            CAST(nc AS BIGINT) AS n_candidates,
            score - ns AS margin
          FROM rw WHERE rk = 1),
        rsp AS (SELECT doc_id, turn_idx, role,
            CAST(COALESCE(SUM(length(rt)) OVER (PARTITION BY doc_id
              ORDER BY turn_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start,
            CAST(length(rt) AS BIGINT) AS rl
          FROM rr)
        SELECT w.pool_id, w.doc_id, s.turn_idx, s.role, s.start,
          CAST(s.start + s.rl AS BIGINT) AS "end",
          (s.role = 'assistant') AS mask,
          w.best_score, w.n_candidates, w.margin
        FROM rwin w JOIN rsp s ON s.doc_id = w.doc_id
        ORDER BY w.pool_id, s.turn_idx""")),

    // STREAMING tool-trace ingest (r17) — the continuous twin of the
    // agentic pack path: a live feed of tool-call logs (the five
    // toolTraceJson shapes) drives 4 micro-batches through
    // toolIngestSink; protocol violations (wrong answer id, unanswered
    // call, non-JSON arguments) drop at the validator, survivors
    // render (calls = loss, results = context) and pack into the
    // accumulated corpus tag-idempotently. In-gate: a replay of a
    // COMMITTED batch tag must not grow the corpus. Output = the full
    // accumulated corpus, replayed closed-form over the valid shapes.
    Q("q_stream_tool_ingest",
      (s, d) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        import graft.operators.Chats
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val name = s"toolq_${CorpusKey.of(d)}"
        Chats.dropSftCorpus(s, name)
        val docs = Tables.documents(s, d).select(col("doc_id"),
          toolTraceJson(col("doc_id"), ct).as("chat"))
        val rows = docs.orderBy(col("doc_id"))
          .as[(Long, String)].collect()
        val chunk = math.max(1, math.ceil(rows.length / 4.0).toInt)
        val mem = MemoryStream[(Long, String)]
        val q = graft.streaming.Streams.toolIngestSink(
          mem.toDF().toDF("doc_id", "chat"), "chat", "doc_id", name,
          streamTag = Some("tlq")) { _ => () }.start()
        rows.grouped(chunk).foreach { c =>
          mem.addData(c.toSeq: _*)
          q.processAllAvailable() // one micro-batch per chunk
        }
        q.stop()
        // at-least-once replay of a COMMITTED tag must not grow the
        // corpus (batch 0's tag is tlq_0)
        val n0 = Chats.loadSftCorpus(s, name).count()
        Chats.ingestToolSft(s, docs, "chat", "doc_id", name, "tlq_0")
        require(Chats.loadSftCorpus(s, name).count() == n0,
          "replayed committed tool-ingest tag must no-op")
        Chats.loadSftCorpus(s, name)
          .select(col("id").cast("long").as("doc_id"), col("text"),
            col("n_turns"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $toolTraceSql, $toolRenderSql
        SELECT doc_id,
          string_agg(rt, '' ORDER BY turn_idx) AS text,
          CAST(COUNT(*) AS BIGINT) AS n_turns
        FROM vtr GROUP BY doc_id ORDER BY doc_id""")),

    // STREAMING drift monitoring (r17): a live feed (odd doc ids, 4
    // micro-batches in doc_id order) reports add-one-smoothed unigram
    // KL(batch ‖ reference) per batch against the static even-id
    // reference snapshot. Stateless sink; the oracle re-derives every
    // batch's membership (row-number quartiles), per-batch union
    // vocabulary, exact integer KL numerators, and the report rows.
    Q("q_stream_drift",
      (s, d) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
        val ref = docs.filter(col("doc_id") % 2 === 0)
        val rows = docs.filter(col("doc_id") % 2 === 1)
          .orderBy(col("doc_id")).as[(Long, String)].collect()
        val chunk = math.max(1, math.ceil(rows.length / 4.0).toInt)
        val out = scala.collection.mutable.ArrayBuffer[
          org.apache.spark.sql.Row]()
        val mem = MemoryStream[(Long, String)]
        val q = graft.streaming.Streams.driftSink(
          mem.toDF().toDF("doc_id", "text"), "text", ref, "text") {
            rep => out ++= rep.collect()
          }.start()
        rows.grouped(chunk).foreach { c =>
          mem.addData(c.toSeq: _*)
          q.processAllAvailable()
        }
        q.stop()
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "n_a bigint, n_b bigint, v_union bigint, kl_u bigint, " +
            "kl double, batch_id bigint")
        s.createDataFrame(
            new java.util.ArrayList(
              scala.jdk.CollectionConverters
                .BufferHasAsJava(out).asJava), schema)
          .select(col("batch_id"), col("n_a"), col("n_b"),
            col("v_union"), col("kl_u"), col("kl"))
          .orderBy(col("batch_id"))
      },
      Some {
        def u6(x: String) =
          s"CAST(ROUND(ROUND(LN($x), 6) * 1e6) AS BIGINT)"
        s"""WITH str AS (SELECT doc_id, text,
            ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn,
            COUNT(*) OVER () AS n
          FROM documents WHERE doc_id % 2 = 1),
        bat AS (SELECT doc_id, text,
            rn // CAST(ceil(n / 4.0) AS BIGINT) AS batch_id FROM str),
        sca AS (SELECT batch_id, token, COUNT(*) AS c_a FROM (
            SELECT batch_id, unnest(${toksSql("text")}) AS token
            FROM bat) GROUP BY 1, 2),
        scb AS (SELECT token, COUNT(*) AS c_b FROM (
            SELECT unnest(${toksSql("text")}) AS token FROM documents
            WHERE doc_id % 2 = 0) GROUP BY 1),
        sv AS (SELECT DISTINCT batch_id, token FROM (
            SELECT batch_id, token FROM sca
            UNION ALL
            SELECT b.batch_id, scb.token
            FROM (SELECT DISTINCT batch_id FROM bat) b
            CROSS JOIN scb)),
        sj AS (SELECT sv.batch_id, sv.token,
            COALESCE(sca.c_a, 0) AS c_a, COALESCE(scb.c_b, 0) AS c_b
          FROM sv
          LEFT JOIN sca ON sca.batch_id = sv.batch_id
            AND sca.token = sv.token
          LEFT JOIN scb ON scb.token = sv.token),
        ssc AS (SELECT batch_id, CAST(SUM(c_a) AS BIGINT) AS na,
            CAST(SUM(c_b) AS BIGINT) AS nb,
            CAST(COUNT(*) AS BIGINT) AS v
          FROM sj GROUP BY 1),
        stm AS (SELECT sj.batch_id, sj.c_a, sj.c_b,
            (sj.c_a + 1) * (
              ${u6("CAST(sj.c_a + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)")}
              - ${u6("CAST(sj.c_b + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)")})
            AS term_u
          FROM sj JOIN ssc ON ssc.batch_id = sj.batch_id)
        SELECT batch_id, CAST(SUM(c_a) AS BIGINT) AS n_a,
          CAST(SUM(c_b) AS BIGINT) AS n_b,
          CAST(COUNT(*) AS BIGINT) AS v_union,
          CAST(SUM(term_u) AS BIGINT) AS kl_u,
          ROUND(CAST(SUM(term_u) AS DOUBLE) /
            (CAST(SUM(c_a) + COUNT(*) AS DOUBLE) * 1e6), 6) AS kl
        FROM stm GROUP BY batch_id ORDER BY batch_id"""
      }),

    // STREAMING protocol triage (r18 — the monitoring twin of
    // q_tool_attrition): the five synthesized trace shapes drive 4
    // micro-batches (doc_id order) through toolTriageSink; each batch
    // reports its per-class verdict card, so a broken exporter pages
    // the batch it breaks. The oracle re-derives batch membership
    // (row-number quartiles) and replays the full triage
    // classification per (batch, class).
    Q("q_stream_tool_triage",
      (s, d) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val rows = Tables.documents(s, d)
          .select(col("doc_id"), toolTraceJson(col("doc_id"), ct)
            .as("chat"))
          .orderBy(col("doc_id")).as[(Long, String)].collect()
        val chunk = math.max(1, math.ceil(rows.length / 4.0).toInt)
        val out = scala.collection.mutable.ArrayBuffer[
          org.apache.spark.sql.Row]()
        val mem = MemoryStream[(Long, String)]
        val q = graft.streaming.Streams.toolTriageSink(
          mem.toDF().toDF("doc_id", "chat"), "chat", "doc_id") {
            card => out ++= card.collect()
          }.start()
        rows.grouped(chunk).foreach { c =>
          mem.addData(c.toSeq: _*)
          q.processAllAvailable()
        }
        q.stop()
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "verdict string, n_convs bigint, n_turns bigint, " +
            "batch_id bigint")
        s.createDataFrame(
            new java.util.ArrayList(
              scala.jdk.CollectionConverters
                .BufferHasAsJava(out).asJava), schema)
          .select(col("batch_id"), col("verdict"), col("n_convs"),
            col("n_turns"))
          .orderBy(col("batch_id"), col("verdict"))
      },
      Some(s"""WITH $toolTraceSql, $toolTriageSql,
        sbt AS (SELECT doc_id,
            ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn,
            COUNT(*) OVER () AS nn
          FROM documents),
        sbb AS (SELECT doc_id,
            rn // CAST(ceil(nn / 4.0) AS BIGINT) AS batch_id
          FROM sbt)
        SELECT sbb.batch_id,
          COALESCE(av.fail_rule, 'valid') AS verdict,
          CAST(COUNT(*) AS BIGINT) AS n_convs,
          CAST(SUM(av.n_turns) AS BIGINT) AS n_turns
        FROM av JOIN sbb ON sbb.doc_id = av.doc_id
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // STREAMING contract monitoring (r19 — contractDrift's continuous
    // twin, the release-card sibling of q_stream_drift): a live trace
    // feed drives 4 micro-batches through contractDriftSink against a
    // reference inference computed ONCE at sink construction. Fixture:
    // every doc calls `search`; docs with doc_id % 3 = 2 carry an
    // extra numeric `page` argument, so each quartile batch's `page`
    // presence drifts a little from the corpus-wide reference (q stays
    // presence-1.0 required) — the card reads stable/ok with a
    // bit-checked per-batch max_abs_presence_delta. The oracle replays
    // batch membership, the reference AND all four batch inferences
    // through one grp-threaded chain, the per-batch full-outer drift,
    // and the severity roll-up.
    Q("q_stream_contract_drift",
      (s, d) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        val did = col("doc_id")
        val ct = regexp_replace(lower(col("text")), "[^a-z ]", "")
        val u = substring(ct, 1, 10)
        val a = substring(ct, 8, 8)
        val r1 = substring(ct, 12, 8)
        val fin = substring(ct, 20, 10)
        val s5 = substring(ct, 3, 5)
        val ida = concat(lit("a"), did.cast("string"))
        val args = when(did % 3 === 2,
            concat(lit("{\\\"q\\\":\\\""), s5,
              lit("\\\",\\\"page\\\":"), (did % 7).cast("string"),
              lit("}")))
          .otherwise(concat(lit("{\\\"q\\\":\\\""), s5,
            lit("\\\"}")))
        val chat = concat(
          lit("{\"messages\":[{\"role\":\"user\",\"content\":\""), u,
          lit("\"},{\"role\":\"assistant\",\"content\":\""), a,
          lit("\",\"tool_calls\":[{\"id\":\""), ida,
          lit("\",\"name\":\"search\",\"arguments\":\""), args,
          lit("\"}]},{\"role\":\"tool\",\"content\":\""), r1,
          lit("\",\"tool_call_id\":\""), ida,
          lit("\"},{\"role\":\"assistant\",\"content\":\""), fin,
          lit("\"}]}"))
        val docs = Tables.documents(s, d)
          .select(did.as("doc_id"), chat.as("chat"))
        val rows = docs.orderBy(col("doc_id"))
          .as[(Long, String)].collect()
        val chunk = math.max(1, math.ceil(rows.length / 4.0).toInt)
        val out = scala.collection.mutable.ArrayBuffer[
          org.apache.spark.sql.Row]()
        val mem = MemoryStream[(Long, String)]
        val q = graft.streaming.Streams.contractDriftSink(
          mem.toDF().toDF("doc_id", "chat"), "chat", "doc_id",
          docs, "chat", "doc_id") {
            card => out ++= card.collect()
          }.start()
        rows.grouped(chunk).foreach { c =>
          mem.addData(c.toSeq: _*)
          q.processAllAvailable()
        }
        q.stop()
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "tool_name string, n_keys_a bigint, n_keys_b bigint, " +
            "n_appeared bigint, n_disappeared bigint, " +
            "n_type_flips bigint, n_required_changes bigint, " +
            "max_abs_presence_delta double, severity string, " +
            "batch_id bigint")
        s.createDataFrame(
            new java.util.ArrayList(
              scala.jdk.CollectionConverters
                .BufferHasAsJava(out).asJava), schema)
          .select(col("batch_id"), col("tool_name"),
            col("n_keys_a"), col("n_keys_b"), col("n_appeared"),
            col("n_disappeared"), col("n_type_flips"),
            col("n_required_changes"),
            col("max_abs_presence_delta"), col("severity"))
          .orderBy(col("batch_id"), col("tool_name"))
      },
      Some(s"""WITH c0 AS (SELECT doc_id,
            substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'),
              3, 5) AS s5,
            CAST(doc_id % 7 AS VARCHAR) AS n7
          FROM documents),
        ca AS (SELECT doc_id, CASE WHEN doc_id % 3 = 2
            THEN '{"q":"' || s5 || '","page":' || n7 || '}'
            ELSE '{"q":"' || s5 || '"}' END AS args FROM c0),
        sbt AS (SELECT doc_id,
            ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn,
            COUNT(*) OVER () AS nn
          FROM documents),
        sbb AS (SELECT doc_id,
            rn // CAST(ceil(nn / 4.0) AS BIGINT) AS batch_id
          FROM sbt),
        ga AS (SELECT -1 AS grp, args FROM ca
          UNION ALL
          SELECT sbb.batch_id, ca.args FROM ca
          JOIN sbb ON sbb.doc_id = ca.doc_id),
        ob AS (SELECT grp,
            CASE WHEN json_type(CASE WHEN json_valid(args)
                THEN args END) = 'OBJECT'
              THEN list_distinct(CAST(json_keys(args) AS VARCHAR[]))
              END AS keys, args
          FROM ga),
        tot AS (SELECT grp,
            SUM(CASE WHEN keys IS NOT NULL THEN 1 ELSE 0 END)
              AS n_objects
          FROM ob GROUP BY 1),
        pt AS (SELECT grp, key,
            ${canonTypeSql("json_type(args, '$.' || key)")} AS t
          FROM (SELECT grp, unnest(keys) AS key, args
            FROM ob WHERE keys IS NOT NULL)),
        mj AS (SELECT grp, key, t AS major_type FROM (
            SELECT grp, key, t,
              row_number() OVER (PARTITION BY grp, key
                ORDER BY COUNT(*) DESC, t) AS r
            FROM pt GROUP BY 1, 2, 3) WHERE r = 1),
        kc AS (SELECT grp, key, COUNT(*) AS n_with_key
          FROM pt GROUP BY 1, 2),
        inf AS (SELECT kc.grp, kc.key,
            ROUND(CAST(kc.n_with_key AS DOUBLE) / tot.n_objects, 6)
              AS presence,
            mj.major_type,
            (ROUND(CAST(kc.n_with_key AS DOUBLE) / tot.n_objects, 6)
              >= 0.95) AS required
          FROM kc
          JOIN mj ON mj.grp = kc.grp AND mj.key = kc.key
          JOIN tot ON tot.grp = kc.grp),
        refb AS (SELECT b.batch_id, i.key, i.presence, i.major_type,
            i.required
          FROM (SELECT DISTINCT batch_id FROM sbb) b
          CROSS JOIN (SELECT * FROM inf WHERE grp = -1) i),
        drift AS (SELECT COALESCE(r.batch_id, bb.grp) AS batch_id,
            r.presence AS presence_a, r.required AS required_a,
            bb.presence AS presence_b, bb.required AS required_b,
            ROUND(bb.presence - r.presence, 6) AS presence_delta,
            COALESCE(r.major_type != bb.major_type, FALSE)
              AS type_flip,
            CASE WHEN r.presence IS NULL THEN 'appeared'
              WHEN bb.presence IS NULL THEN 'disappeared'
              WHEN COALESCE(r.major_type != bb.major_type, FALSE)
                THEN 'type_flip'
              WHEN r.required != bb.required THEN 'required_change'
              ELSE 'stable' END AS status
          FROM refb r FULL OUTER JOIN
            (SELECT * FROM inf WHERE grp >= 0) bb
            ON bb.grp = r.batch_id AND bb.key = r.key)
        SELECT batch_id, 'search' AS tool_name,
          $contractCardAggSql
        FROM drift GROUP BY 1 ORDER BY batch_id""")),

    // STREAMING decontamination (r16) — the prevention twin of the
    // measurement tiers: a live document feed drives 4 micro-batches
    // through decontamSink, and anything sharing a 5-shingle with the
    // benchmark set (the %9 docs) is dropped BEFORE the corpus sink —
    // contaminated text never lands in training storage. Stateless
    // (static bench set, broadcast per batch), so the in-gate replay
    // of batch 1 must yield the identical survivor subset. Output =
    // accumulated survivors, replayed closed-form.
    Q("q_stream_decontam",
      (s, d) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
        val bench = graft.operators.Decontaminate.benchShingles(
          docs.filter(col("doc_id") % 9 === 0)
            .select(col("text").as("btext")), "btext", 5)
        val rows = docs.orderBy(col("doc_id")).as[(Long, String)]
          .collect()
        val chunk = math.max(1, math.ceil(rows.length / 4.0).toInt)
        val out = scala.collection.mutable.ArrayBuffer[Long]()
        val mem = MemoryStream[(Long, String)]
        val q = graft.streaming.Streams.decontamSink(
          mem.toDF().toDF("doc_id", "text"), "text", "doc_id",
          bench, 5) { b =>
            out ++= b.select(col("doc_id")).as[Long].collect()
          }.start()
        rows.grouped(chunk).foreach { c =>
          mem.addData(c.toSeq: _*)
          q.processAllAvailable()
        }
        q.stop()
        // stateless replay: re-filtering batch 1's rows must produce
        // exactly the survivors the stream emitted for them
        val b1 = rows.grouped(chunk).next().toSeq
        val b1df = b1.toDF("doc_id", "text")
        val rep = b1df.join(graft.operators.Decontaminate.flaggedWith(
            b1df, "text", "doc_id", bench, 5), Seq("doc_id"),
            "left_anti")
          .select(col("doc_id")).as[Long].collect().toSet
        require(rep == out.filter(i => b1.exists(_._1 == i)).toSet,
          "stateless replay must reproduce batch-1 survivors")
        out.toSeq.toDF("doc_id").orderBy(col("doc_id"))
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        sh AS (SELECT doc_id,
          list_distinct([${hash60Sql("s")} for s in ${shinglesSql("tk", 5)}])
            AS shs FROM tk),
        csh AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
        bsh AS (SELECT DISTINCT unnest(shs) AS sh FROM sh
          WHERE doc_id % 9 = 0),
        fl AS (SELECT DISTINCT c.doc_id FROM csh c JOIN bsh b
          USING (sh))
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM fl)
        ORDER BY doc_id"""),
      setup = Some((s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
        graft.operators.Decontaminate.benchShingles(
          docs.filter(col("doc_id") % 9 === 0)
            .select(col("text").as("btext")), "btext", 5)
        ()
      })),

    // Epoch / repetition plan (r16 — Muennighoff 2023): per source,
    // target tokens from an exact-decimal weight·budget, realized
    // tokens under the 4-epoch repetition cap, the 6dp epoch count,
    // and the deficit the cap refuses. Weights = (suffix+1)·0.0047 —
    // 4 decimal digits, so every decimal op is exact on both engines;
    // small sources hit the cap (positive deficit), large ones don't.
    Q("q_mix_epochs",
      (s, d) => {
        val per = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(sum(TA.tokenCount(col("text"))).cast("long")
            .as("avail_tokens"))
          .withColumn("weight",
            (regexp_extract(col("source"), "(\\d+)", 1).cast("long") + 1)
              .cast(org.apache.spark.sql.types.DecimalType(18, 6)) *
              lit(new java.math.BigDecimal("0.0047")))
        graft.operators.Sampling.epochPlan(per, "source",
            "avail_tokens", "weight", budget = 1000000L,
            maxEpochs = new java.math.BigDecimal("4.0"))
          .select(col("source"), col("avail_tokens"),
            col("weight").cast("double").as("weight"),
            col("target_tokens"), col("tokens_realized"),
            col("epochs"), col("deficit"))
          .orderBy(col("source"))
      },
      Some(s"""WITH per AS (SELECT source,
          CAST(SUM(len(${toksSql("text")})) AS BIGINT) AS avail_tokens,
          CAST((CAST(substr(source, 4) AS BIGINT) + 1)
            AS DECIMAL(18,6)) * CAST(0.0047 AS DECIMAL(18,6)) AS w
        FROM documents GROUP BY source),
        p AS (SELECT source, avail_tokens,
          CAST(floor(CAST(w AS DECIMAL(18,6)) * 1000000) AS BIGINT)
            AS target_tokens,
          CAST(floor(CAST(4.0 AS DECIMAL(18,6)) * avail_tokens)
            AS BIGINT) AS cap_tokens,
          CAST(w AS DOUBLE) AS weight
        FROM per)
        SELECT source, avail_tokens, weight, target_tokens,
          LEAST(target_tokens, cap_tokens) AS tokens_realized,
          ROUND(CAST(LEAST(target_tokens, cap_tokens) AS DOUBLE) /
            avail_tokens, 6) AS epochs,
          target_tokens - LEAST(target_tokens, cap_tokens) AS deficit
        FROM p ORDER BY source""")),

    // Shard manifest (r16): the reproducibility record pinned next to
    // training shards — per shard, doc count, token sum, id range,
    // and the order-free DECIMAL fingerprint (sum of per-doc 60-bit
    // text hashes). Any write order yields the same manifest; one
    // changed byte changes it.
    Q("q_shard_manifest",
      (s, d) => graft.operators.Packing.shardManifest(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", budget = 2000L)
        .orderBy(col("shard")),
      Some(s"""WITH t AS (SELECT doc_id, text,
          CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens,
          ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")} AS ord
        FROM documents),
        w AS (SELECT doc_id, text, n_tokens,
          CAST(COALESCE(SUM(n_tokens) OVER (
            ORDER BY ord % 256, ord, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS prev
        FROM t)
        SELECT CAST(prev // 2000 AS BIGINT) AS shard,
          COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          CAST(SUM(CAST(${hash60Sql("text")} AS HUGEINT))
            % 2305843009213693951 AS BIGINT) AS fingerprint
        FROM w GROUP BY 1 ORDER BY shard""")),

    // MANIFEST DIFF (r17 — the attestation story's consumer side):
    // manifest A is the corpus plus an A-only shard (98); manifest B
    // perturbs it five ways on a STABLE shard key (doc_id % 16, so one
    // edit stays one shard's problem): doc 37 dropped (count), doc 44
    // gains a token (tokens), doc 40's bytes mutate token-preserving
    // via translate (fingerprint — the silent-poison case), doc 48
    // re-keys +160000 ≡ 0 mod 16 (range), plus a B-only shard (99).
    // Every other shard must read `match`. The oracle builds BOTH
    // manifests independently and replays the severity lattice.
    Q("q_manifest_diff",
      (s, d) => {
        import graft.operators.Packing
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("text"),
            (col("doc_id") % 16).as("shard"))
        val extraA = Tables.documents(s, d)
          .filter(col("doc_id") < 3)
          .select(col("doc_id"), col("text"), lit(98L).as("shard"))
        val extraB = Tables.documents(s, d)
          .filter(col("doc_id") < 5)
          .select(col("doc_id"), col("text"), lit(99L).as("shard"))
        val bdocs = base.filter(col("doc_id") =!= 37)
          .select(
            when(col("doc_id") === 48, col("doc_id") + 160000)
              .otherwise(col("doc_id")).as("doc_id"),
            when(col("doc_id") === 40, translate(col("text"), "e", "3"))
              .when(col("doc_id") === 44,
                concat(col("text"), lit(" zz")))
              .otherwise(col("text")).as("text"),
            col("shard"))
        val ma = Packing.manifestOf(base.unionByName(extraA),
          "shard", "doc_id", "text")
        val mb = Packing.manifestOf(bdocs.unionByName(extraB),
          "shard", "doc_id", "text")
        Packing.manifestDiff(ma, mb).orderBy(col("shard"))
      },
      Some(s"""WITH base AS (SELECT doc_id, text, doc_id % 16 AS shard
          FROM documents),
        a0 AS (SELECT * FROM base
          UNION ALL
          SELECT doc_id, text, 98 FROM documents WHERE doc_id < 3),
        b0 AS (SELECT
            CASE WHEN doc_id = 48 THEN doc_id + 160000
                 ELSE doc_id END AS doc_id,
            CASE WHEN doc_id = 40 THEN translate(text, 'e', '3')
                 WHEN doc_id = 44 THEN text || ' zz'
                 ELSE text END AS text,
            shard
          FROM base WHERE doc_id != 37
          UNION ALL
          SELECT doc_id, text, 99 FROM documents WHERE doc_id < 5),
        ma AS (SELECT CAST(shard AS BIGINT) AS shard,
            COUNT(*) AS n_docs,
            CAST(SUM(len(${toksSql("text")})) AS BIGINT) AS n_tokens,
            MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
            CAST(SUM(CAST(${hash60Sql("text")} AS HUGEINT))
              % 2305843009213693951 AS BIGINT) AS fingerprint
          FROM a0 GROUP BY 1),
        mb AS (SELECT CAST(shard AS BIGINT) AS shard,
            COUNT(*) AS n_docs,
            CAST(SUM(len(${toksSql("text")})) AS BIGINT) AS n_tokens,
            MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
            CAST(SUM(CAST(${hash60Sql("text")} AS HUGEINT))
              % 2305843009213693951 AS BIGINT) AS fingerprint
          FROM b0 GROUP BY 1)
        SELECT COALESCE(a.shard, b.shard) AS shard,
          a.n_docs AS n_docs_a, a.n_tokens AS n_tokens_a,
          a.min_id AS min_id_a, a.max_id AS max_id_a,
          a.fingerprint AS fingerprint_a,
          b.n_docs AS n_docs_b, b.n_tokens AS n_tokens_b,
          b.min_id AS min_id_b, b.max_id AS max_id_b,
          b.fingerprint AS fingerprint_b,
          CASE WHEN b.n_docs IS NULL THEN 'only_left'
            WHEN a.n_docs IS NULL THEN 'only_right'
            WHEN a.n_docs != b.n_docs THEN 'count_mismatch'
            WHEN a.n_tokens != b.n_tokens THEN 'tokens_mismatch'
            WHEN a.fingerprint != b.fingerprint
              THEN 'fingerprint_mismatch'
            WHEN a.min_id != b.min_id OR a.max_id != b.max_id
              THEN 'range_mismatch'
            ELSE 'match' END AS status
        FROM ma a FULL OUTER JOIN mb b ON a.shard = b.shard
        ORDER BY shard""")),

    // Sequence packing (concat-and-chunk): every doc's start chunk/offset
    // and end chunk when the corpus is concatenated in salted-hash order
    // and split into 1000-token windows. Spark side is a two-pass
    // distributed prefix sum (per-bucket window + broadcast bucket
    // offsets); the oracle replays it as ONE global window ordered by
    // (bucket, ord, id) — same math, so the gate is bit-exact.
    Q("q_pack_chunks",
      (s, d) => graft.operators.Packing.concatChunks(
          Tables.documents(s, d), "doc_id", "text", budget = 1000L)
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (
          SELECT doc_id,
            CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens,
            ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")} AS ord
          FROM documents),
        w AS (
          SELECT doc_id, n_tokens,
            CAST(COALESCE(SUM(n_tokens) OVER (
              ORDER BY ord % 256, ord, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS prev
          FROM t)
        SELECT doc_id, n_tokens,
          CAST(prev // 1000 AS BIGINT) AS start_chunk,
          CAST(prev % 1000 AS BIGINT) AS start_offset,
          CAST(GREATEST(prev // 1000, (prev + n_tokens - 1) // 1000)
            AS BIGINT) AS end_chunk
        FROM w ORDER BY doc_id""")),

    // Multi-example sample packing (r16): first-fit-decreasing into
    // 128-token windows per group — whole examples, per-window
    // [start_off, end_off) attention boundaries. Synthesis: 8 groups,
    // lens 3..99 plus %101 oversize (150 > capacity — owns a window
    // that never refills). The oracle replays FFD ITSELF — a DuckDB
    // recursive CTE carrying each group's remaining-capacity list,
    // first-fit via list_position over a >=len scan, all groups
    // advancing in lockstep — so bin assignment, slots, and boundary
    // offsets are bit-checked, not just invariants.
    Q("q_pack_examples",
      (s, d) => {
        val did = col("doc_id")
        val items = Tables.documents(s, d).select(did,
          (did % 8).as("grp"),
          when(did % 101 === 0, lit(150L))
            .otherwise((did * 7) % 97 + 3).cast("long").as("len"))
        graft.operators.Packing.packExamples(items, "doc_id", "len",
            "grp", capacity = 128L)
          .orderBy(col("doc_id"))
      },
      Some {
        s"""WITH RECURSIVE items AS (
          SELECT doc_id % 8 AS grp, doc_id AS id,
            CAST(CASE WHEN doc_id % 101 = 0 THEN 150
              ELSE (doc_id * 7) % 97 + 3 END AS BIGINT) AS len
          FROM documents),
        it AS (
          SELECT grp, id, len,
            ROW_NUMBER() OVER (PARTITION BY grp
              ORDER BY len DESC, CAST(id AS VARCHAR)) AS i,
            COUNT(*) OVER (PARTITION BY grp) AS n
          FROM items),
        st AS (
          SELECT grp, CAST(0 AS BIGINT) AS i, CAST(NULL AS BIGINT) AS id,
            CAST(NULL AS BIGINT) AS len, CAST(NULL AS BIGINT) AS bin,
            CAST([] AS BIGINT[]) AS caps, n
          FROM (SELECT DISTINCT grp, n FROM it)
          UNION ALL
          SELECT it.grp, it.i, it.id, it.len,
            CASE WHEN $ffdPosSql IS NULL THEN len(st.caps)
                 ELSE $ffdPosSql - 1 END AS bin,
            CASE WHEN $ffdPosSql IS NULL
                 THEN list_append(st.caps, 128 - it.len)
                 ELSE list_slice(st.caps, 1, $ffdPosSql - 1)
                      || [st.caps[$ffdPosSql] - it.len]
                      || list_slice(st.caps, $ffdPosSql + 1, len(st.caps))
                 END AS caps,
            st.n
          FROM st JOIN it ON it.grp = st.grp AND it.i = st.i + 1
          WHERE st.i < st.n)
        SELECT grp, id AS doc_id, len, CAST(bin AS BIGINT) AS bin,
          CAST(ROW_NUMBER() OVER (PARTITION BY grp, bin ORDER BY i) - 1
            AS BIGINT) AS slot,
          CAST(COALESCE(SUM(len) OVER (PARTITION BY grp, bin ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_off,
          CAST(COALESCE(SUM(len) OVER (PARTITION BY grp, bin ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + len
            AS BIGINT) AS end_off
        FROM st WHERE i > 0 ORDER BY doc_id"""
      }),

    // Packing-efficiency report (r16): the padding-waste numbers a
    // trainer reads before burning compute — per group, windows,
    // items, filled tokens, capacity, oversize count, fill_rate
    // (1 − fill_rate = padding fraction). Same synthesis as
    // q_pack_examples; the oracle re-runs the FFD recursion and
    // aggregates it, so window counts and fill rates are bit-checked
    // through the packing itself.
    Q("q_pack_fill",
      (s, d) => {
        val did = col("doc_id")
        val items = Tables.documents(s, d).select(did,
          (did % 8).as("grp"),
          when(did % 101 === 0, lit(150L))
            .otherwise((did * 7) % 97 + 3).cast("long").as("len"))
        graft.operators.Packing.packingReport(
          graft.operators.Packing.packExamples(items, "doc_id", "len",
            "grp", capacity = 128L), "grp", capacity = 128L)
          .orderBy(col("grp"))
      },
      Some {
        s"""WITH RECURSIVE items AS (
          SELECT doc_id % 8 AS grp, doc_id AS id,
            CAST(CASE WHEN doc_id % 101 = 0 THEN 150
              ELSE (doc_id * 7) % 97 + 3 END AS BIGINT) AS len
          FROM documents),
        it AS (
          SELECT grp, id, len,
            ROW_NUMBER() OVER (PARTITION BY grp
              ORDER BY len DESC, CAST(id AS VARCHAR)) AS i,
            COUNT(*) OVER (PARTITION BY grp) AS n
          FROM items),
        st AS (
          SELECT grp, CAST(0 AS BIGINT) AS i, CAST(NULL AS BIGINT) AS id,
            CAST(NULL AS BIGINT) AS len, CAST(NULL AS BIGINT) AS bin,
            CAST([] AS BIGINT[]) AS caps, n
          FROM (SELECT DISTINCT grp, n FROM it)
          UNION ALL
          SELECT it.grp, it.i, it.id, it.len,
            CASE WHEN $ffdPosSql IS NULL THEN len(st.caps)
                 ELSE $ffdPosSql - 1 END AS bin,
            CASE WHEN $ffdPosSql IS NULL
                 THEN list_append(st.caps, 128 - it.len)
                 ELSE list_slice(st.caps, 1, $ffdPosSql - 1)
                      || [st.caps[$ffdPosSql] - it.len]
                      || list_slice(st.caps, $ffdPosSql + 1, len(st.caps))
                 END AS caps,
            st.n
          FROM st JOIN it ON it.grp = st.grp AND it.i = st.i + 1
          WHERE st.i < st.n)
        SELECT grp, CAST(MAX(bin) + 1 AS BIGINT) AS n_windows,
          COUNT(*) AS n_items,
          CAST(SUM(len) AS BIGINT) AS sum_len,
          CAST(SUM(CASE WHEN len > 128 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_oversize,
          CAST((MAX(bin) + 1) * 128 AS BIGINT) AS capacity_total,
          ROUND(CAST(SUM(len) AS DOUBLE) / ((MAX(bin) + 1) * 128), 6)
            AS fill_rate
        FROM st WHERE i > 0 GROUP BY grp ORDER BY grp"""
      }),

    // Semantic document ordering for in-context pretraining (r16 —
    // Shi et al. 2024): a greedy nearest-neighbor walk over document
    // embeddings per bucket, lifted to a total corpus order (ctx_pos)
    // that concat-and-chunk packing consumes — related documents
    // become ADJACENT in the training context. Deterministic: 6-dp
    // rounded cosines, string-id tie-breaks, min-id start per bucket.
    // The oracle replays the WALK itself — a recursive CTE carrying
    // (current doc, visited list) per bucket, argmax via min over a
    // (-score, id) struct — so every hop of every chain is
    // bit-checked. Deliberately NOT on the 10x scale curve: the walk
    // is O(n²·dim) per bucket BY CONSTRUCTION (documented, like the
    // fixed-granularity semantic-dedup tiers); the scale lever is
    // bucket granularity (IVF cells at corpus scale), not this gate's
    // fixed %8.
    Q("q_incontext_order",
      (s, d) => {
        val emb = Tables.embeddings(s, d).select(col("vec_id"),
          col("embedding"), (col("vec_id") % 8).as("bucket"))
        graft.operators.Layout.semanticOrder(emb, "vec_id",
            "embedding", "bucket")
          .select(col("vec_id"), col("bucket"), col("chain_pos"),
            col("ctx_pos"))
          .orderBy(col("vec_id"))
      },
      Some {
        val cosr = s"COALESCE(ROUND(${cosSql("st.vec", "i2.vec")}, 6), -999)"
        s"""WITH RECURSIVE it AS (
          SELECT vec_id % 8 AS b, vec_id AS id, embedding AS vec
          FROM embeddings),
        base AS (
          SELECT b, CAST(1 AS BIGINT) AS pos, id, vec, [id] AS visited
          FROM it QUALIFY ROW_NUMBER() OVER (PARTITION BY b
            ORDER BY CAST(id AS VARCHAR)) = 1),
        st AS (
          SELECT * FROM base
          UNION ALL
          SELECT u.b, u.pos, u.best['id'] AS id, u.best['vec'] AS vec,
            list_append(u.visited, u.best['id']) AS visited
          FROM (
            SELECT st.b AS b, st.pos + 1 AS pos, st.visited AS visited,
              min(struct_pack(s := -($cosr),
                n := CAST(i2.id AS VARCHAR),
                id := i2.id, vec := i2.vec)) AS best
            FROM st JOIN it i2 ON i2.b = st.b
              AND NOT list_contains(st.visited, i2.id)
            GROUP BY st.b, st.pos, st.visited
          ) u),
        sz AS (SELECT b, COUNT(*) AS n FROM it GROUP BY b),
        o AS (SELECT b, CAST(COALESCE(SUM(n) OVER (
            ORDER BY CAST(b AS VARCHAR)
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS off FROM sz)
        SELECT st.id AS vec_id, st.b AS bucket, st.pos AS chain_pos,
          CAST(o.off + st.pos - 1 AS BIGINT) AS ctx_pos
        FROM st JOIN o ON st.b = o.b
        ORDER BY vec_id"""
      }),

    // IVF-bucketed in-context ordering (r17 — the composition
    // q_incontext_order's scaladoc claims): buckets are the corpus's
    // OWN IVF cell assignment (seeded cells, the same scaled-long
    // argmin kernel as the ANN tier), sized ~62 docs/cell by deriving
    // nCells from the corpus count — so the O(cell²·dim) walk stays
    // CONSTANT per cell as the corpus grows and the composed operator
    // rides the 10× curve (cells grow in NUMBER, not size; they run
    // in parallel). The oracle replays cell assignment (scaled-long
    // distances, tie-to-lowest-cell) AND every hop of every walk.
    Q("q_incontext_ivf",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"))
        val nCells = math.max((emb.count() / 62L).toInt, 8)
        val cells = Similarity.ivfCellsSeeded(emb, "vec_id",
          "embedding", nCells)
        val assigned = emb.withColumn("cell",
          Similarity.cellArgmin(col("embedding"), cells).cast("int"))
        graft.operators.Layout.semanticOrder(assigned, "vec_id",
            "embedding", "cell")
          .select(col("vec_id"), col("cell"), col("chain_pos"),
            col("ctx_pos"))
          .orderBy(col("vec_id"))
      },
      Some {
        def dotS(x: String, y: String) =
          s"""list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)
              for i in generate_series(1, len($x))])"""
        def du(x: String, y: String) =
          s"""CAST(FLOOR(ROUND(${dotS(x, x)} - 2 * ${dotS(x, y)} +
            ${dotS(y, y)}, 6) * 1e6 + 0.5) AS BIGINT)"""
        val cosr = s"COALESCE(ROUND(${cosSql("st.vec", "i2.vec")}, 6), -999)"
        s"""WITH RECURSIVE cs AS (
          SELECT embedding AS cv,
            ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c
          FROM embeddings
          QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id)
            <= GREATEST(COUNT(*) OVER () // 62, 8)),
        cd AS (SELECT vec_id, c, ${du("x", "cv")} AS du
          FROM (SELECT e.vec_id, s.c, e.embedding AS x, s.cv
            FROM embeddings e CROSS JOIN cs s)),
        cellof AS (SELECT vec_id, CAST(c AS INT) AS b FROM (
            SELECT vec_id, c, ROW_NUMBER() OVER (
              PARTITION BY vec_id ORDER BY du, c) AS rk FROM cd)
          WHERE rk = 1),
        it AS (SELECT cl.b AS b, e.vec_id AS id, e.embedding AS vec
          FROM embeddings e JOIN cellof cl ON cl.vec_id = e.vec_id),
        base AS (
          SELECT b, CAST(1 AS BIGINT) AS pos, id, vec, [id] AS visited
          FROM it QUALIFY ROW_NUMBER() OVER (PARTITION BY b
            ORDER BY CAST(id AS VARCHAR)) = 1),
        st AS (
          SELECT * FROM base
          UNION ALL
          SELECT u.b, u.pos, u.best['id'] AS id, u.best['vec'] AS vec,
            list_append(u.visited, u.best['id']) AS visited
          FROM (
            SELECT st.b AS b, st.pos + 1 AS pos, st.visited AS visited,
              min(struct_pack(s := -($cosr),
                n := CAST(i2.id AS VARCHAR),
                id := i2.id, vec := i2.vec)) AS best
            FROM st JOIN it i2 ON i2.b = st.b
              AND NOT list_contains(st.visited, i2.id)
            GROUP BY st.b, st.pos, st.visited
          ) u),
        sz AS (SELECT b, COUNT(*) AS n FROM it GROUP BY b),
        o AS (SELECT b, CAST(COALESCE(SUM(n) OVER (
            ORDER BY CAST(b AS VARCHAR)
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS off FROM sz)
        SELECT st.id AS vec_id, st.b AS cell, st.pos AS chain_pos,
          CAST(o.off + st.pos - 1 AS BIGINT) AS ctx_pos
        FROM st JOIN o ON st.b = o.b
        ORDER BY vec_id"""
      }),

    // Paragraph-boundary chunking (r17 — the RAG semantic splitter):
    // 4-token synthesized lines greedy-fill into ≤10-token chunks
    // without splitting a line; chunk 3 lines would be 12 > 10, so
    // chunks hold 2 full lines with a short tail (and oversize final
    // lines own their chunk). The oracle replays the greedy fold
    // itself in a recursive CTE — every chunk boundary, rebuilt text,
    // and token sum is bit-checked.
    Q("q_para_chunks",
      (s, d) => {
        val toks = TA.tokens(col("text"))
        val last = greatest(((size(toks) - 1) / 4).cast("int"), lit(0))
        val lines = transform(sequence(lit(0), last),
          i => array_join(slice(toks, i * 4 + 1, lit(4)), " "))
        val docs = Tables.documents(s, d).select(col("doc_id"),
          array_join(lines, "\n").as("text"))
        graft.operators.Packing.paragraphChunks(docs, "doc_id",
            "text", budget = 10L)
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some(s"""WITH RECURSIVE ptk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        plined AS (SELECT doc_id, array_to_string(list_transform(
            generate_series(0, greatest((len(tk) - 1) // 4, 0)),
            i -> array_to_string(tk[i*4+1:i*4+4], ' ')), chr(10))
            AS text
          FROM ptk),
        psp AS (SELECT doc_id, i - 1 AS para_idx, parts[i] AS para
          FROM (SELECT doc_id, string_split(text, chr(10)) AS parts,
              unnest(generate_series(1,
                len(string_split(text, chr(10))))) AS i
            FROM plined)
          WHERE trim(parts[i]) != ''),
        pit AS (SELECT doc_id, para,
            CAST(len(${toksSql("para")}) AS BIGINT) AS t,
            ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY para_idx) AS i,
            COUNT(*) OVER (PARTITION BY doc_id) AS n
          FROM psp),
        pst AS (
          SELECT doc_id, CAST(0 AS BIGINT) AS i,
            CAST(NULL AS VARCHAR) AS para, CAST(0 AS BIGINT) AS t,
            CAST(0 AS BIGINT) AS c, CAST(0 AS BIGINT) AS cur, n
          FROM (SELECT DISTINCT doc_id, n FROM pit)
          UNION ALL
          SELECT it.doc_id, it.i, it.para, it.t,
            CASE WHEN pst.cur > 0 AND pst.cur + it.t > 10
              THEN pst.c + 1 ELSE pst.c END AS c,
            CASE WHEN pst.cur > 0 AND pst.cur + it.t > 10
              THEN it.t ELSE pst.cur + it.t END AS cur,
            pst.n
          FROM pst JOIN pit it
            ON it.doc_id = pst.doc_id AND it.i = pst.i + 1
          WHERE pst.i < pst.n)
        SELECT doc_id, c AS chunk_idx,
          string_agg(para, chr(10) ORDER BY i) AS chunk,
          CAST(COUNT(*) AS BIGINT) AS n_paras,
          CAST(SUM(t) AS BIGINT) AS n_tokens
        FROM pst WHERE i > 0
        GROUP BY doc_id, c ORDER BY doc_id, chunk_idx""")),

    // Fill-in-the-middle transform (r17 — Bavarian et al. 2022, the
    // code-model infilling objective): a hash-selected half of the
    // corpus re-serializes as PSM (<|fim_pre|>prefix<|fim_suf|>suffix
    // <|fim_mid|>middle) with the two split points derived from
    // salted id hashes mod (len+1); the rest passes through as plain
    // LM data. The oracle replays selection, both offsets, and the
    // three substrings — every transformed byte is hash-checked.
    Q("q_fim",
      (s, d) => graft.operators.Packing.fimTransform(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", rate = 0.5)
        .select(col("doc_id"), col("fim"), col("text_fim"))
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, text,
          CAST(length(text) AS BIGINT) AS n,
          ${hash60Sql("'graft:fim1:' || CAST(doc_id AS VARCHAR)")}
            % (length(text) + 1) AS p1,
          ${hash60Sql("'graft:fim2:' || CAST(doc_id AS VARCHAR)")}
            % (length(text) + 1) AS p2,
          ${hash60Sql("'graft:fim:' || CAST(doc_id AS VARCHAR)")}
            % 10000 AS b
        FROM documents),
        x AS (SELECT doc_id, text, n, b,
          CAST(LEAST(p1, p2) AS INT) AS lo,
          CAST(GREATEST(p1, p2) AS INT) AS hi
        FROM t)
        SELECT doc_id, (b < 5000) AS fim,
          CASE WHEN b < 5000 THEN
            '<|fim_pre|>' || substr(text, 1, lo) ||
            '<|fim_suf|>' || substr(text, hi + 1) ||
            '<|fim_mid|>' || substr(text, lo + 1, hi - lo)
          ELSE text END AS text_fim
        FROM x ORDER BY doc_id""")),

    // Per-document sliding-window chunking (RAG / long-context prep):
    // 40-token windows advancing by 30 (10-token overlap), final window
    // short, empty docs emit nothing. Pure generator work — zero
    // shuffle; the oracle replays tokenize → generate_series → slice.
    Q("q_chunk_sliding",
      (s, d) => graft.operators.Packing.slidingChunks(
          Tables.documents(s, d), "doc_id", "text",
          chunkSize = 40, stride = 30)
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some(s"""WITH t AS (
          SELECT doc_id, ${toksSql("text")} AS toks,
            len(${toksSql("text")}) AS n
          FROM documents),
        st AS (
          SELECT doc_id, toks, n,
            unnest(generate_series(0, n - 1, 30)) AS start
          FROM t WHERE n > 0)
        SELECT doc_id, CAST(start // 30 AS BIGINT) AS chunk_idx,
          array_to_string(toks[start + 1 : start + 40], ' ') AS chunk,
          CAST(LEAST(40, n - start) AS BIGINT) AS n_tokens
        FROM st ORDER BY doc_id, chunk_idx""")),

    // Token-budget SHARD assignment (documents stay whole, shards hold
    // ≈budget tokens): the training-shard writer's assignment step, same
    // deterministic salted-hash order as packing. Oracle replays the
    // global prefix sum and the integer DIV.
    Q("q_shard_tokens",
      (s, d) => graft.operators.Packing.shardByTokens(
          Tables.documents(s, d), "doc_id", "text", budget = 5000L)
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (
          SELECT doc_id,
            CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens,
            ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")} AS ord
          FROM documents),
        w AS (
          SELECT doc_id, n_tokens,
            CAST(COALESCE(SUM(n_tokens) OVER (
              ORDER BY ord % 256, ord, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS prev
          FROM t)
        SELECT doc_id, n_tokens, CAST(prev // 5000 AS BIGINT) AS shard
        FROM w ORDER BY doc_id""")),

    // Interleaved-multimodal shard assignment (r17): vision-language
    // documents cost text tokens PLUS 576 context tokens per image
    // (the 336² ViT-L/14 patch count — LLaVA's convention), so the
    // shard writer budgets on the SUMMED cost; n_images synthesized
    // did%4 (image-free docs exist). Same deterministic hash-order
    // two-pass prefix sum as q_shard_tokens; the oracle replays the
    // cost formula, the global prefix sum, and the integer DIV.
    Q("q_mm_shards",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"),
            (col("doc_id") % 4).as("n_images"))
          .withColumn("cost",
            graft.functions.TextAnalysis.tokenCount(col("text"))
              .cast("long") + col("n_images") * 576L)
        graft.operators.Packing.shardByCost(docs, "doc_id", "cost",
            budget = 8000L)
          .join(docs.select(col("doc_id"), col("n_images")), "doc_id")
          .select(col("doc_id"), col("n_images"), col("cost"),
            col("shard"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (
          SELECT doc_id, doc_id % 4 AS n_images,
            CAST(len(${toksSql("text")}) + (doc_id % 4) * 576
              AS BIGINT) AS cost,
            ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")} AS ord
          FROM documents),
        w AS (
          SELECT doc_id, n_images, cost,
            CAST(COALESCE(SUM(cost) OVER (
              ORDER BY ord % 256, ord, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS prev
          FROM t)
        SELECT doc_id, n_images, cost,
          CAST(prev // 8000 AS BIGINT) AS shard
        FROM w ORDER BY doc_id""")),

    // TOKEN-budget source mixing — pretraining mixes are specified in
    // per-source token budgets ("30B of web, 5B of code"), not row
    // fractions: each source keeps the deterministic hash-order prefix
    // of documents whose preceding token count is under its budget
    // (document-whole, last doc may overshoot — the shard convention).
    // src1 cuts mid-corpus, src7's budget exceeds the source (keeps
    // all), src12 is zero (keeps none), every other source is absent
    // from the mix (drops). The oracle replays the per-source prefix
    // sum in the two-pass bucket order.
    Q("q_mix_token_budget",
      (s, d) => graft.operators.Sampling.takeTokenBudget(
          Tables.documents(s, d), "doc_id", "source", "text",
          budgets = Map("src1" -> 800L, "src7" -> 1000000L,
            "src12" -> 0L))
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (
          SELECT doc_id, source,
            CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens,
            ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")} AS ord
          FROM documents WHERE source IN ('src1', 'src7', 'src12')),
        w AS (
          SELECT doc_id, source, n_tokens,
            CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
              ORDER BY ord % 256, ord, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_start
          FROM t)
        SELECT doc_id, source, n_tokens, tok_start FROM w
        WHERE tok_start < CASE source WHEN 'src1' THEN 800
          WHEN 'src7' THEN 1000000 ELSE 0 END
        ORDER BY doc_id""")),

    // CAPSTONE composition — the end-to-end training-loader feed:
    // epochShuffle (deterministic epoch-3 permutation) → pack the corpus
    // into 1000-token chunks IN THAT ORDER (concatChunksOrdered's
    // contiguous buckets preserve the shuffle order exactly) → assign
    // 5000-token shards from the same packed positions. The oracle
    // replays the whole chain as one window over the epoch hash order,
    // so every stage boundary (shuffle order → prefix sum → chunk DIV →
    // shard DIV) is bit-checked end to end — the curation twin of
    // q_pipeline_e2e.
    Q("q_epoch_pack_shards",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val shuffled = graft.operators.Sampling.epochShuffle(
          docs, "doc_id", epoch = 3)
        graft.operators.Packing.concatChunksOrdered(shuffled, "doc_id",
            "text", "shuffle_pos", budget = 1000L)
          .select(col("doc_id"), col("n_tokens"), col("start_chunk"),
            col("start_offset"), col("end_chunk"),
            expr("(start_chunk * 1000 + start_offset) DIV 5000")
              .as("shard"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (
          SELECT doc_id,
            CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens,
            ${hash60Sql("'graft:3:' || CAST(doc_id AS VARCHAR)")} AS h
          FROM documents),
        w AS (
          SELECT doc_id, n_tokens,
            CAST(COALESCE(SUM(n_tokens) OVER (
              ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS prev
          FROM t)
        SELECT doc_id, n_tokens,
          CAST(prev // 1000 AS BIGINT) AS start_chunk,
          CAST(prev % 1000 AS BIGINT) AS start_offset,
          CAST(GREATEST(prev // 1000, (prev + n_tokens - 1) // 1000)
            AS BIGINT) AS end_chunk,
          CAST(prev // 5000 AS BIGINT) AS shard
        FROM w ORDER BY doc_id""")),

    // Near-dup CLUSTERS: connected components over the MinHash LSH pairs —
    // the canonical-representative step after pair generation (transitive:
    // A~B, B~C ⇒ one cluster even when A,C never paired). Spark side runs
    // pointer-jumping label propagation; the oracle computes the true
    // transitive closure with a recursive CTE over the SAME replayed pairs,
    // so multi-hop chaining is hash-checked.
    Q("q_dedup_clusters",
      (s, d) => Dedup.clusters(
          Dedup.minHashPairs(dupCorpus(Tables.documents(s, d)),
            "text", "doc_id", 3, 4, 2))
        .select(col("id").as("doc_id"), col("label").as("cluster"))
        .orderBy(col("doc_id")),
      Some {
        s"""WITH RECURSIVE $corpusSql,
          sigs AS (SELECT doc_id, ${minHashSigFromBase(8)} AS sig
            FROM (SELECT doc_id, ${minHashBaseSql("sh")} AS base
              FROM (SELECT doc_id,
                ${shinglesSql(s"(${toksSql("text")})", 3)} AS sh
                FROM corpus))),
          ex AS (SELECT doc_id, sig,
            b.b AS band,
            md5(array_to_string(sig[b.b*2+1:b.b*2+2], ',')) AS key
            FROM sigs, (SELECT unnest(range(4)) AS b) b),
          pairs AS (SELECT DISTINCT a.doc_id AS id_a, e.doc_id AS id_b
            FROM ex a JOIN ex e
            ON a.band = e.band AND a.key = e.key AND a.doc_id < e.doc_id),
          edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach AS (
            SELECT src AS id, src AS r FROM edges
            UNION
            SELECT e.dst AS id, reach.r FROM reach
            JOIN edges e ON e.src = reach.id)
          SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id
          ORDER BY doc_id"""
      }),

    // SOFT dedup (r17): near-dup clusters down-weight to aggregate
    // mass 1 instead of dropping members — per document the cluster
    // size and 1/size sampling weight (singletons 1.0). The oracle
    // replays the full minhash→LSH→components chain plus the size
    // count and the weight division.
    Q("q_dedup_soft",
      (s, d) => {
        val corpus = dupCorpus(Tables.documents(s, d))
        Dedup.softWeights(corpus,
            Dedup.minHashPairs(corpus, "text", "doc_id", 3, 4, 2),
            "doc_id")
          .orderBy(col("doc_id"))
      },
      Some {
        s"""WITH RECURSIVE $corpusSql,
          sigs AS (SELECT doc_id, ${minHashSigFromBase(8)} AS sig
            FROM (SELECT doc_id, ${minHashBaseSql("sh")} AS base
              FROM (SELECT doc_id,
                ${shinglesSql(s"(${toksSql("text")})", 3)} AS sh
                FROM corpus))),
          ex AS (SELECT doc_id, sig,
            b.b AS band,
            md5(array_to_string(sig[b.b*2+1:b.b*2+2], ',')) AS key
            FROM sigs, (SELECT unnest(range(4)) AS b) b),
          pairs AS (SELECT DISTINCT a.doc_id AS id_a, e.doc_id AS id_b
            FROM ex a JOIN ex e
            ON a.band = e.band AND a.key = e.key
              AND a.doc_id < e.doc_id),
          edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach AS (
            SELECT src AS id, src AS r FROM edges
            UNION
            SELECT e.dst AS id, reach.r FROM reach
            JOIN edges e ON e.src = reach.id),
          cl AS (SELECT id, MIN(r) AS label FROM reach GROUP BY id),
          cs AS (SELECT label, COUNT(*) AS csize FROM cl
            GROUP BY label)
          SELECT c.doc_id,
            CAST(COALESCE(cs.csize, 1) AS BIGINT) AS cluster_size,
            ROUND(CAST(1 AS DOUBLE) / COALESCE(cs.csize, 1), 6)
              AS weight
          FROM corpus c
          LEFT JOIN cl ON cl.id = c.doc_id
          LEFT JOIN cs ON cs.label = cl.label
          ORDER BY c.doc_id"""
      }),

    // Soft-dedup → MIXTURE capstone (r18): the duplication-corrected
    // masses actually feed the mixing plan — softWeights (cluster
    // mass 1) → sampleByWeight (deterministic hash keep at the
    // weight) → per-source surviving token counts → epochPlan
    // (target 5% of a 200k budget per source, repetition capped at 4
    // epochs). The oracle replays the ENTIRE chain: minhash→LSH→
    // components→1/size weights, the salted bucket-vs-threshold
    // keep, the token sums, and the exact-decimal budget/cap
    // arithmetic.
    Q("q_dedup_soft_mix",
      (s, d) => {
        val corpus = dupCorpus(Tables.documents(s, d))
        val w = Dedup.softWeights(corpus,
          Dedup.minHashPairs(corpus, "text", "doc_id", 3, 4, 2),
          "doc_id")
        val kept = graft.operators.Sampling.sampleByWeight(
          corpus.join(w, "doc_id"), "doc_id", "weight")
        val per = kept.groupBy(col("source"))
          .agg(sum(TA.tokenCount(col("text"))).cast("long")
            .as("avail_tokens"))
          .withColumn("weight", lit(0.05))
        graft.operators.Sampling.epochPlan(per, "source",
            "avail_tokens", "weight", budget = 200000L,
            maxEpochs = new java.math.BigDecimal("4.0"))
          .select(col("source"), col("avail_tokens"),
            col("weight").cast("double").as("weight"),
            col("target_tokens"), col("tokens_realized"),
            col("epochs"), col("deficit"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH RECURSIVE $corpusSql,
          sigs AS (SELECT doc_id, ${minHashSigFromBase(8)} AS sig
            FROM (SELECT doc_id, ${minHashBaseSql("sh")} AS base
              FROM (SELECT doc_id,
                ${shinglesSql(s"(${toksSql("text")})", 3)} AS sh
                FROM corpus))),
          ex AS (SELECT doc_id, sig,
            b.b AS band,
            md5(array_to_string(sig[b.b*2+1:b.b*2+2], ',')) AS key
            FROM sigs, (SELECT unnest(range(4)) AS b) b),
          pairs AS (SELECT DISTINCT a.doc_id AS id_a, e.doc_id AS id_b
            FROM ex a JOIN ex e
            ON a.band = e.band AND a.key = e.key
              AND a.doc_id < e.doc_id),
          edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach AS (
            SELECT src AS id, src AS r FROM edges
            UNION
            SELECT e.dst AS id, reach.r FROM reach
            JOIN edges e ON e.src = reach.id),
          cl AS (SELECT id, MIN(r) AS label FROM reach GROUP BY id),
          cs AS (SELECT label, COUNT(*) AS csize FROM cl
            GROUP BY label),
          sw AS (SELECT c.doc_id, c.source, c.text,
              ROUND(CAST(1 AS DOUBLE) / COALESCE(cs.csize, 1), 6)
                AS weight
            FROM corpus c
            LEFT JOIN cl ON cl.id = c.doc_id
            LEFT JOIN cs ON cs.label = cl.label),
          kept AS (SELECT * FROM sw
            WHERE ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")}
              % 10000 < FLOOR(weight * 10000 + 0.5)),
          per AS (SELECT source,
              CAST(SUM(len(${toksSql("text")})) AS BIGINT)
                AS avail_tokens
            FROM kept GROUP BY source),
          pl AS (SELECT source, avail_tokens,
              CAST(floor(CAST(0.05 AS DECIMAL(18,6)) * 200000)
                AS BIGINT) AS target_tokens,
              CAST(floor(CAST(4.0 AS DECIMAL(18,6)) * avail_tokens)
                AS BIGINT) AS cap_tokens
            FROM per)
          SELECT source, avail_tokens, CAST(0.05 AS DOUBLE) AS weight,
            target_tokens,
            LEAST(target_tokens, cap_tokens) AS tokens_realized,
            ROUND(CAST(LEAST(target_tokens, cap_tokens) AS DOUBLE) /
              avail_tokens, 6) AS epochs,
            target_tokens - LEAST(target_tokens, cap_tokens)
              AS deficit
          FROM pl ORDER BY source"""
      }),

    // CROSS-SOURCE duplication matrix (r18 — provenance forensics:
    // which sources copy from which?): near-dup pairs labeled by
    // their endpoints' sources, counted per UNORDERED source pair.
    // dupCorpus clones every doc within its own source, so the truth
    // is diagonal-heavy — but LSH also pairs cross-source near-dups,
    // and both engines must agree cell by cell. The oracle replays
    // the pair chain + both source joins + the least/greatest
    // normalization.
    Q("q_dedup_cross_source",
      (s, d) => {
        val corpus = dupCorpus(Tables.documents(s, d))
        Dedup.crossSourceMatrix(corpus,
            Dedup.minHashPairs(corpus, "text", "doc_id", 3, 4, 2),
            "doc_id", "source")
          .orderBy(col("source_a"), col("source_b"))
      },
      Some {
        s"""WITH $corpusSql,
          sigs AS (SELECT doc_id, ${minHashSigFromBase(8)} AS sig
            FROM (SELECT doc_id, ${minHashBaseSql("sh")} AS base
              FROM (SELECT doc_id,
                ${shinglesSql(s"(${toksSql("text")})", 3)} AS sh
                FROM corpus))),
          ex AS (SELECT doc_id, sig,
            b.b AS band,
            md5(array_to_string(sig[b.b*2+1:b.b*2+2], ',')) AS key
            FROM sigs, (SELECT unnest(range(4)) AS b) b),
          pairs AS (SELECT DISTINCT a.doc_id AS id_a, e.doc_id AS id_b
            FROM ex a JOIN ex e
            ON a.band = e.band AND a.key = e.key
              AND a.doc_id < e.doc_id),
          lab AS (SELECT LEAST(ca.source, cb.source) AS source_a,
              GREATEST(ca.source, cb.source) AS source_b
            FROM pairs p
            JOIN corpus ca ON ca.doc_id = p.id_a
            JOIN corpus cb ON cb.doc_id = p.id_b)
          SELECT source_a, source_b,
            CAST(COUNT(*) AS BIGINT) AS n_pairs
          FROM lab GROUP BY 1, 2 ORDER BY 1, 2"""
      }),

    // Same components via the alternating large-star/small-star edge
    // rewrite (Kiveris et al.) — the O(log n)-round plan of record for
    // 100 TB pair graphs; gated against the SAME recursive-CTE oracle so
    // both algorithms are hash-proven equivalent on real LSH pairs.
    Q("q_dedup_clusters_stars",
      (s, d) => Dedup.clustersStars(
          Dedup.minHashPairs(dupCorpus(Tables.documents(s, d)),
            "text", "doc_id", 3, 4, 2))
        .select(col("id").as("doc_id"), col("label").as("cluster"))
        .orderBy(col("doc_id")),
      Some {
        s"""WITH RECURSIVE $corpusSql,
          sigs AS (SELECT doc_id, ${minHashSigFromBase(8)} AS sig
            FROM (SELECT doc_id, ${minHashBaseSql("sh")} AS base
              FROM (SELECT doc_id,
                ${shinglesSql(s"(${toksSql("text")})", 3)} AS sh
                FROM corpus))),
          ex AS (SELECT doc_id, sig,
            b.b AS band,
            md5(array_to_string(sig[b.b*2+1:b.b*2+2], ',')) AS key
            FROM sigs, (SELECT unnest(range(4)) AS b) b),
          pairs AS (SELECT DISTINCT a.doc_id AS id_a, e.doc_id AS id_b
            FROM ex a JOIN ex e
            ON a.band = e.band AND a.key = e.key AND a.doc_id < e.doc_id),
          edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach AS (
            SELECT src AS id, src AS r FROM edges
            UNION
            SELECT e.dst AS id, reach.r FROM reach
            JOIN edges e ON e.src = reach.id)
          SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id
          ORDER BY doc_id"""
      }),

    // Near-dup COLLAPSE: the step that turns clusters into a deduplicated
    // corpus — one keep-longest representative per connected component
    // (ties to the lowest id), singletons pass through. The oracle chains
    // the already-proven recursive-CTE components with a per-cluster
    // ROW_NUMBER argmax; the SURVIVING DOCUMENTS (id, source, text) are
    // bit-checked, not just counted.
    Q("q_dedup_keep_rep",
      (s, d) => {
        val docs = dupCorpus(Tables.documents(s, d))
        Dedup.collapseClusters(docs,
            Dedup.minHashPairs(docs, "text", "doc_id", 3, 4, 2),
            "doc_id", length(col("text")))
          .select(col("doc_id"), col("source"), col("text"))
          .orderBy(col("doc_id"))
      },
      Some {
        s"""WITH RECURSIVE $corpusSql,
          sigs AS (SELECT doc_id, ${minHashSigFromBase(8)} AS sig
            FROM (SELECT doc_id, ${minHashBaseSql("sh")} AS base
              FROM (SELECT doc_id,
                ${shinglesSql(s"(${toksSql("text")})", 3)} AS sh
                FROM corpus))),
          ex AS (SELECT doc_id, sig,
            b.b AS band,
            md5(array_to_string(sig[b.b*2+1:b.b*2+2], ',')) AS key
            FROM sigs, (SELECT unnest(range(4)) AS b) b),
          pairs AS (SELECT DISTINCT a.doc_id AS id_a, e.doc_id AS id_b
            FROM ex a JOIN ex e
            ON a.band = e.band AND a.key = e.key AND a.doc_id < e.doc_id),
          edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach AS (
            SELECT src AS id, src AS r FROM edges
            UNION
            SELECT e.dst AS id, reach.r FROM reach
            JOIN edges e ON e.src = reach.id),
          cl AS (SELECT id AS doc_id, MIN(r) AS cluster
            FROM reach GROUP BY id),
          rk AS (SELECT c.doc_id,
              ROW_NUMBER() OVER (
                PARTITION BY COALESCE(cl.cluster, c.doc_id)
                ORDER BY length(c.text) DESC, c.doc_id ASC) AS rn
            FROM corpus c LEFT JOIN cl ON c.doc_id = cl.doc_id)
          SELECT c.doc_id, c.source, c.text
          FROM rk JOIN corpus c ON rk.doc_id = c.doc_id
          WHERE rk.rn = 1
          ORDER BY c.doc_id"""
      }),

    // Leakage-safe split: near-dup clusters assigned to train/val/test as
    // a UNIT (group key = connected-component label, singletons their own
    // id), so no eval doc has a near-dup of itself in train. Oracle chains
    // the proven recursive-CTE components with the same salted-md5 bucket
    // CASE chain as q_sample_split — every document's assignment is
    // bit-checked.
    Q("q_split_leakproof",
      (s, d) => {
        val docs = dupCorpus(Tables.documents(s, d))
        graft.operators.Sampling.splitByCluster(docs,
            Dedup.minHashPairs(docs, "text", "doc_id", 3, 4, 2),
            "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .select(col("doc_id"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some {
        s"""WITH RECURSIVE $corpusSql,
          sigs AS (SELECT doc_id, ${minHashSigFromBase(8)} AS sig
            FROM (SELECT doc_id, ${minHashBaseSql("sh")} AS base
              FROM (SELECT doc_id,
                ${shinglesSql(s"(${toksSql("text")})", 3)} AS sh
                FROM corpus))),
          ex AS (SELECT doc_id, sig,
            b.b AS band,
            md5(array_to_string(sig[b.b*2+1:b.b*2+2], ',')) AS key
            FROM sigs, (SELECT unnest(range(4)) AS b) b),
          pairs AS (SELECT DISTINCT a.doc_id AS id_a, e.doc_id AS id_b
            FROM ex a JOIN ex e
            ON a.band = e.band AND a.key = e.key AND a.doc_id < e.doc_id),
          edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach AS (
            SELECT src AS id, src AS r FROM edges
            UNION
            SELECT e.dst AS id, reach.r FROM reach
            JOIN edges e ON e.src = reach.id),
          cl AS (SELECT id AS doc_id, MIN(r) AS cluster
            FROM reach GROUP BY id),
          grp AS (SELECT c.doc_id,
              COALESCE(cl.cluster, c.doc_id) AS g
            FROM corpus c LEFT JOIN cl ON c.doc_id = cl.doc_id)
        SELECT doc_id,
          CASE
            WHEN ${hash60Sql("'graft:' || CAST(g AS VARCHAR)")} % 10000
              < 8000 THEN 'train'
            WHEN ${hash60Sql("'graft:' || CAST(g AS VARCHAR)")} % 10000
              < 9000 THEN 'val'
            WHEN ${hash60Sql("'graft:' || CAST(g AS VARCHAR)")} % 10000
              < 10000 THEN 'test'
            ELSE NULL END AS split
        FROM grp ORDER BY doc_id"""
      }),

    // SimHash (16-bit) per document (staged: token hashes materialize once)
    Q("q_dedup_simhash",
      (s, d) => Dedup.simHashes(Tables.documents(s, d), "text", "doc_id", 16),
      Some {
        val bits = (0 until 16).map(b =>
          s"""CASE WHEN list_sum([CASE WHEN (h >> $b) & 1 = 1 THEN 1
              ELSE -1 END for h in hs]) >= 0 THEN ${1L << b} ELSE 0 END""")
          .mkString(" + ")
        s"""SELECT doc_id, CAST($bits AS BIGINT) AS simhash
          FROM (SELECT doc_id,
            [${hash60Sql("t")} for t in ${toksSql("text")}] AS hs
            FROM documents)"""
      }),

    // SimHash near-dups within Hamming distance 3 — pigeonhole chunk
    // blocking (4 chunks of a 64-bit hash; a ≤3-distance pair agrees
    // exactly on ≥1 16-bit chunk → perfect recall, never a cross join;
    // 16-bit chunk keys keep buckets sparse at corpus scale, unlike the
    // 16-bit display hash whose 4-bit chunks would collide constantly).
    // Oracle: brute-force all-pairs Hamming over the same DuckDB-computed
    // simhashes — feasible only AT ORACLE SCALE, which is precisely why
    // the blocked plan is the one that ships.
    Q("q_dedup_simhash_near",
      (s, d) => Dedup.simHashPairsWithin(
        dupCorpus(Tables.documents(s, d)), "text", "doc_id", 64, 3),
      Some {
        val bits = (0 until 64).map(b =>
          s"""CASE WHEN list_sum([CASE WHEN (h >> $b) & 1 = 1 THEN 1
              ELSE -1 END for h in hs]) >= 0 THEN CAST(${1L << b}
              AS BIGINT) ELSE 0 END""")
          .mkString(" + ")
        s"""WITH $corpusSql,
          sh AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash
            FROM (SELECT doc_id,
              [${hash60Sql("t")} for t in ${toksSql("text")}] AS hs
              FROM corpus))
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS dist
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""
      }),

    // n-gram Jaccard near-dup pairs, blocked by (source, length band) —
    // the block key bounds candidate pairs; near-dups rarely cross a
    // 64-char length band
    Q("q_dedup_ngram_pairs",
      (s, d) => Dedup.ngramJaccardPairs(dupCorpus(Tables.documents(s, d)),
        "text", "doc_id",
        concat_ws("|", col("source"),
          (length(col("text")) / 64).cast("long")), 2, 0.5),
      Some(s"""WITH $corpusSql,
        sh AS (SELECT doc_id,
          source || '|' || CAST(strlen(text) // 64 AS VARCHAR) AS block,
          list_distinct([${hash60Sql("s")} for s in
            ${shinglesSql(s"(${toksSql("text")})", 2)}]) AS sh
          FROM corpus)
        SELECT id_a, id_b, jaccard FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
              AS jaccard
          FROM sh a JOIN sh b
            ON a.block = b.block AND a.doc_id < b.doc_id)
        WHERE jaccard >= 0.5""")),

    // embedding-cosine near-dup pairs, sign-bucket blocked
    Q("q_dedup_embed_pairs",
      (s, d) => Dedup.embeddingPairs(Tables.embeddings(s, d),
        "embedding", "vec_id", 4, 0.2),
      Some(s"""WITH e AS (SELECT vec_id, embedding,
          ${(0 until 4).map(i =>
            s"(CASE WHEN embedding[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)")
            .mkString(" + ")} AS bucket FROM embeddings)
        SELECT id_a, id_b, cos FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            ROUND($pairCosSql, 6) AS cos
          FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        WHERE cos >= 0.2""")),

    // embedding near-dup pairs with the sign-bucket width SCALED to the
    // corpus (Dedup.adaptiveSignBits: smallest width giving
    // ceil(n/64) buckets, floor 4, both clamped to the embedding dim —
    // the oracle's prm CTE replays the clamp too) — the 100-TB shape:
    // expected bucket
    // population stays ~64 as n grows, so the pair join is O(n·64)
    // where the fixed-width twin above goes O(n²/2^bits) (measured
    // ratio 613 at the 100× corpus vs ~linear here). The oracle
    // derives the SAME width with integer arithmetic (length of the
    // binary of groups−1), so the adaptive parameter itself is
    // hash-checked: at sf0.01 (n=500 → 4 bits) this equals the fixed
    // gate; at sf0.1 (n=2000 → 5 bits) the two diverge and each
    // matches its own oracle.
    Q("q_dedup_embed_auto",
      (s, d) => Dedup.embeddingPairsAuto(Tables.embeddings(s, d),
        "embedding", "vec_id", 0.2),
      Some(s"""WITH prm AS (SELECT LEAST(mb, GREATEST(LEAST(4, mb),
            CASE WHEN g <= 1 THEN 0 ELSE length(bin(g - 1)) END)) AS b
          FROM (SELECT (COUNT(*) + 63) // 64 AS g,
            GREATEST(1, LEAST(30, ANY_VALUE(len(embedding)))) AS mb
            FROM embeddings)),
        e AS (SELECT vec_id, embedding,
          CAST(list_sum(list_transform(range(1, (SELECT b FROM prm) + 1),
            i -> CASE WHEN embedding[i] >= 0
                 THEN CAST(POW(2, i - 1) AS BIGINT) ELSE 0 END))
            AS BIGINT) AS bucket FROM embeddings)
        SELECT id_a, id_b, cos FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            ROUND($pairCosSql, 6) AS cos
          FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        WHERE cos >= 0.2""")),

    // SemDeDup-style semantic dedup: deterministic seed centroids (8
    // lowest-id vectors), map-only nearest-centroid assignment (unrolled
    // codegen argmax, no shuffle), within-cluster τ-prune keyed on the
    // cluster id. The oracle replays ALL of it — centroid choice,
    // assignment argmax (rounded-cos DESC, cidx ASC), greedy-by-id drops —
    // so the hash covers both the clustering and the prune.
    // Cluster-BALANCED sampling — the data-mixing move that keeps a
    // dominant mode from swamping the mix (DoReMi/cluster-stratified
    // curation): assign embeddings to semantic clusters (the proven
    // seeded-centroid argmax), then take a deterministic per-cluster
    // reservoir — exactly min(k,|cluster|) rows per cluster in salted
    // hash order. The oracle replays centroid assignment AND the
    // reservoir window, so membership, rank, and the cap are all
    // bit-checked.
    Q("q_sample_clustered",
      (s, d) => {
        val asg = Dedup.semanticAssign(
          Tables.embeddings(s, d), "embedding", "vec_id", 8)
        graft.operators.Sampling.reservoirPerKey(
            asg, Seq("cluster"), "vec_id", k = 20)
          .select(col("vec_id"), col("cluster"),
            col("sample_rank").cast("long").as("sample_rank"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH cent AS (
          SELECT embedding AS cvec,
            ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
        asg AS (
          SELECT vec_id, cluster FROM (
            SELECT e.vec_id, c.cidx AS cluster,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY ROUND(${cosSql("e.embedding", "c.cvec")}, 6) DESC,
                  c.cidx) AS rk
            FROM embeddings e CROSS JOIN cent c)
          WHERE rk = 1),
        rsv AS (SELECT vec_id, cluster, ROW_NUMBER() OVER (
            PARTITION BY cluster ORDER BY
              ${hash60Sql("'graft:' || CAST(vec_id AS VARCHAR)")}, vec_id)
            AS sample_rank
          FROM asg)
        SELECT vec_id, CAST(cluster AS INTEGER) AS cluster,
          CAST(sample_rank AS BIGINT) AS sample_rank
        FROM rsv WHERE sample_rank <= 20 ORDER BY vec_id""")),

    Q("q_dedup_semantic",
      (s, d) => Dedup.semanticDedup(Tables.embeddings(s, d),
          "embedding", "vec_id", 8, 0.25)
        .select(col("vec_id"), col("cluster")),
      Some(s"""WITH cent AS (
          SELECT embedding AS cvec,
            ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
        asg AS (
          SELECT vec_id, embedding, cluster FROM (
            SELECT e.vec_id, e.embedding, c.cidx AS cluster,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY ROUND(${cosSql("e.embedding", "c.cvec")}, 6) DESC,
                  c.cidx) AS rk
            FROM embeddings e CROSS JOIN cent c)
          WHERE rk = 1),
        drops AS (
          SELECT DISTINCT b.vec_id AS drop_id
          FROM asg a JOIN asg b
            ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          WHERE ROUND($pairCosSql, 6) >= 0.25)
        SELECT vec_id, CAST(cluster AS INTEGER) AS cluster FROM asg
        WHERE vec_id NOT IN (SELECT drop_id FROM drops)""")),

    // SemDeDup with the cluster count SCALED to the corpus
    // (k = max(8, ceil(n/64))) and the TWO-LEVEL deterministic
    // assignment (coarse argmax over ceil(√k) lowest-id centroids,
    // fine argmax within the cell over its ceil(k/√k) lowest-id
    // members — n·2√k dots instead of n·k, and no k-wide codegen
    // projection). The 100-TB shape: expected cluster population
    // stays ~64, so the τ-prune join is O(n·64) where the fixed-k twin
    // goes O(n²/k) (measured ratio 1341 at the 100× corpus vs ~linear
    // here). The oracle replays EVERYTHING — k/k1/k2 integer
    // arithmetic, both argmax levels, the cluster id composition
    // coarse·k2+fine, and the greedy-by-id drops.
    Q("q_dedup_semantic_auto",
      (s, d) => Dedup.semanticDedupAuto(Tables.embeddings(s, d),
          "embedding", "vec_id", 0.25)
        .select(col("vec_id"), col("cluster")),
      Some(s"""WITH prm AS (
          SELECT k, k1, (k + k1 - 1) // k1 AS k2 FROM (
            SELECT k, CAST(CEIL(SQRT(k)) AS BIGINT) AS k1 FROM (
              SELECT GREATEST(8, (COUNT(*) + 63) // 64) AS k
              FROM embeddings))),
        cent1 AS (
          SELECT cvec, cidx FROM (
            SELECT embedding AS cvec,
              ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx
            FROM embeddings)
          WHERE cidx < (SELECT k1 FROM prm)),
        asg1 AS (
          SELECT vec_id, embedding, coarse FROM (
            SELECT e.vec_id, e.embedding, c.cidx AS coarse,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY ROUND(${cosSql("e.embedding", "c.cvec")}, 6) DESC,
                  c.cidx) AS rk
            FROM embeddings e CROSS JOIN cent1 c)
          WHERE rk = 1),
        cent2 AS (
          SELECT coarse, fidx, cvec FROM (
            SELECT coarse, embedding AS cvec,
              ROW_NUMBER() OVER (PARTITION BY coarse ORDER BY vec_id) - 1
                AS fidx
            FROM asg1)
          WHERE fidx < (SELECT k2 FROM prm)),
        asg AS (
          SELECT vec_id, embedding,
            CAST(coarse * (SELECT k2 FROM prm) + fidx AS INTEGER)
              AS cluster
          FROM (
            SELECT a.vec_id, a.embedding, a.coarse, c.fidx,
              ROW_NUMBER() OVER (PARTITION BY a.vec_id
                ORDER BY ROUND(${cosSql("a.embedding", "c.cvec")}, 6) DESC,
                  c.fidx) AS rk
            FROM asg1 a JOIN cent2 c ON a.coarse = c.coarse)
          WHERE rk = 1),
        drops AS (
          SELECT DISTINCT b.vec_id AS drop_id
          FROM asg a JOIN asg b
            ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          WHERE ROUND($pairCosSql, 6) >= 0.25)
        SELECT vec_id, cluster FROM asg
        WHERE vec_id NOT IN (SELECT drop_id FROM drops)""")),

    // brute-force cosine top-k (exact ANN baseline)
    Q("q_ann_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 5)
      },
      Some(s"""SELECT query_id, cand_id, cos, rk FROM (
        SELECT query_id, cand_id, cos, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
        FROM (SELECT q.vec_id AS query_id, a.vec_id AS cand_id,
          ROUND($qaCosSql, 6) AS cos
          FROM embeddings a, (SELECT * FROM embeddings WHERE vec_id < 5) q
          WHERE a.vec_id != q.vec_id))
        WHERE rk <= 5""")),

    // HARD-NEGATIVE mining (contrastive training prep): per anchor the
    // top-5 most-similar candidates with cos < 0.95 — each anchor's
    // PLANTED exact clone (vec_id+100000, cos 1.0, would be rank 1) is
    // a false negative and must be excluded; the honest negative band
    // (max cos ≈ 0.49 in this corpus) survives. Brute oracle tier.
    Q("q_hard_negatives",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"))
        val planted = emb.unionAll(emb.select(
          (col("vec_id") + 100000).as("vec_id"), col("embedding")))
        Similarity.hardNegatives(planted, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", 5, dupCut = 0.95)
      },
      Some(s"""WITH pl AS (SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000, embedding FROM embeddings)
        SELECT query_id, cand_id, cos, rk FROM (
          SELECT query_id, cand_id, cos, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
          FROM (SELECT q.vec_id AS query_id, a.vec_id AS cand_id,
            ROUND($qaCosSql, 6) AS cos
            FROM pl a, (SELECT * FROM embeddings WHERE vec_id < 8) q
            WHERE a.vec_id != q.vec_id)
          WHERE cos < 0.95)
        WHERE rk <= 5""")),

    // IVF-pruned hard negatives — the scale path: anchors probe their 2
    // nearest seeded cells and mine only those cells' candidates. The
    // planted clone assigns to its anchor's own cell (identical vector,
    // same argmin), so the false-negative cut fires inside the pruned
    // scan too; the full seeded-cell machinery (scaled-long distances,
    // tie-to-lowest-cell, probe order) replays in the oracle.
    Q("q_hard_negatives_ivf",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"))
        val planted = emb.unionAll(emb.select(
          (col("vec_id") + 100000).as("vec_id"), col("embedding")))
        val cells = Similarity.ivfCellsSeeded(emb, "vec_id", "embedding", 8)
        Similarity.hardNegativesCells(planted,
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          cells, nProbe = 2, k = 5, dupCut = 0.95)
      },
      Some {
        def dotS(x: String, y: String) =
          s"""list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)
              for i in generate_series(1, len($x))])"""
        def du(x: String, y: String) =
          s"""CAST(FLOOR(ROUND(${dotS(x, x)} - 2 * ${dotS(x, y)} +
            ${dotS(y, y)}, 6) * 1e6 + 0.5) AS BIGINT)"""
        s"""WITH pl AS (SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 100000, embedding FROM embeddings),
          cs AS (SELECT embedding AS cv, ROW_NUMBER() OVER (ORDER BY vec_id)
              - 1 AS c
            FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
          cd AS (SELECT vec_id, c, ${du("x", "cv")} AS du
            FROM (SELECT e.vec_id, s.c, e.embedding AS x, s.cv
              FROM pl e CROSS JOIN cs s)),
          cellof AS (SELECT vec_id, c AS cell FROM (
              SELECT vec_id, c, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY du, c) AS rk FROM cd)
            WHERE rk = 1),
          probes AS (SELECT vec_id AS query_id, c AS cell FROM (
              SELECT vec_id, c, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY du, c) AS rk
              FROM cd WHERE vec_id < 8)
            WHERE rk <= 2)
          SELECT query_id, cand_id, cos, rk FROM (
            SELECT query_id, cand_id, cos, ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
            FROM (SELECT p.query_id, a.vec_id AS cand_id,
              ROUND(${cosSql("qe.embedding", "a.embedding")}, 6) AS cos
              FROM probes p
              JOIN cellof cl ON cl.cell = p.cell
              JOIN pl a ON a.vec_id = cl.vec_id
              JOIN embeddings qe ON qe.vec_id = p.query_id
              WHERE a.vec_id != p.query_id)
            WHERE cos < 0.95)
          WHERE rk <= 5"""
      }),

    // LSH-bucketed ANN (the scale path: equi-join on sign-bucket)
    Q("q_ann_bucketed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bucketedTopK(emb, emb.filter(col("vec_id") < 20),
          "vec_id", "embedding", 5, 4)
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding,
          ${(0 until 4).map(i =>
            s"(CASE WHEN embedding[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)")
            .mkString(" + ")} AS bucket FROM embeddings)
        SELECT query_id, cand_id, cos, rk FROM (
          SELECT query_id, cand_id, cos, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
          FROM (SELECT q.vec_id AS query_id, a.vec_id AS cand_id,
            ROUND($qaCosSql, 6) AS cos
            FROM e a JOIN (SELECT * FROM e WHERE vec_id < 20) q
              ON a.bucket = q.bucket
            WHERE a.vec_id != q.vec_id))
          WHERE rk <= 5""")),

    // multi-probe LSH ANN: base bucket + all Hamming-1 neighbors probed
    Q("q_ann_multiprobe",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.multiProbeTopK(emb, emb.filter(col("vec_id") < 20),
          "vec_id", "embedding", 5, 4)
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding,
          ${(0 until 4).map(i =>
            s"(CASE WHEN embedding[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)")
            .mkString(" + ")} AS bucket FROM embeddings),
        q AS (SELECT vec_id, embedding, bucket FROM e WHERE vec_id < 20),
        probes AS (SELECT vec_id, embedding,
          unnest([bucket, ${(0 until 4).map(i => s"xor(bucket, ${1 << i})")
            .mkString(", ")}]) AS bucket FROM q)
        SELECT query_id, cand_id, cos, rk FROM (
          SELECT query_id, cand_id, cos, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
          FROM (SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS cand_id,
            ROUND($qaCosSql, 6) AS cos
            FROM e a JOIN probes q ON a.bucket = q.bucket
            WHERE a.vec_id != q.vec_id))
          WHERE rk <= 5"""),
    ),

    // int8-quantized ANN: symmetric per-vector quantization (q = round
    // (x·127/max|x|), clamped), cosine over the int8 arrays (scales
    // cancel). Integer dots are exact in double, so the ENTIRE path —
    // quantization rounding, dot, norm, ranking — replays bit-exactly in
    // DuckDB; the hash gates the quantizer itself, not an approximation.
    Q("q_ann_quantized",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 5)
      },
      Some {
        def idot(a: String, b: String) =
          s"""CAST(list_sum([$a.q[i] * $b.q[i]
              for i in generate_series(1, len($a.q))]) AS DOUBLE)"""
        s"""WITH qe AS (
          SELECT vec_id,
            [CAST(LEAST(GREATEST(ROUND(CAST(x AS DOUBLE) * 127 / mx),
              -127), 127) AS BIGINT) for x in embedding] AS q
          FROM (SELECT vec_id, embedding,
              list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS mx
            FROM embeddings))
        SELECT query_id, cand_id, qcos, rk FROM (
          SELECT query_id, cand_id, qcos, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY qcos DESC, cand_id) AS rk
          FROM (SELECT b.vec_id AS query_id, a.vec_id AS cand_id,
            ROUND(${idot("a", "b")} /
              (SQRT(${idot("a", "a")}) * SQRT(${idot("b", "b")})), 6)
              AS qcos
            FROM qe a, (SELECT * FROM qe WHERE vec_id < 5) b
            WHERE a.vec_id != b.vec_id))
        WHERE rk <= 5"""
      }),

    // Product-quantization ANN (Jégou 2011): 64 float dims → 8 codebook
    // bytes per vector; queries score candidates via ADC table lookups.
    // Distances ride as 1e6-scaled longs so every sum is order-free and
    // the DuckDB oracle replays the WHOLE pipeline — codebook slicing,
    // per-subspace argmin encode, ADC accumulation, ranking — bit-exactly.
    // codebook training is the setup phase (the memoized ivfPq model's
    // PQ half — identical m=8/k=16 seeded train); the measured run is
    // encode + ADC over the held constants, like q_ann_ivfpq
    Q("q_ann_pq",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.pqTopKWith(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", ivfPqModel(s, d)._2, topK = 5)
      },
      Some {
        def dotS(x: String, y: String) =
          s"""list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)
              for i in generate_series(1, len($x))])"""
        s"""WITH seeds AS (
          SELECT embedding AS sv, ROW_NUMBER() OVER (ORDER BY vec_id) - 1
            AS c
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
        cent AS (
          SELECT c, j, sv[j*8+1 : j*8+8] AS cv
          FROM seeds, (SELECT unnest(generate_series(0, 7)) AS j)),
        vd AS (
          SELECT vec_id, j, c,
            CAST(FLOOR(ROUND(
              ${dotS("x", "x")} - 2 * ${dotS("x", "cv")} +
                ${dotS("cv", "cv")}, 6) * 1e6 + 0.5) AS BIGINT) AS du
          FROM (SELECT e.vec_id, ct.j, ct.c,
              e.embedding[ct.j*8+1 : ct.j*8+8] AS x, ct.cv
            FROM embeddings e CROSS JOIN cent ct)),
        codes AS (
          SELECT vec_id, j, c AS code FROM (
            SELECT vec_id, j, c, ROW_NUMBER() OVER (
              PARTITION BY vec_id, j ORDER BY du, c) AS rk FROM vd)
          WHERE rk = 1),
        ad AS (
          SELECT vq.vec_id AS query_id, cd.vec_id AS cand_id,
            CAST(SUM(vq.du) AS BIGINT) AS adist_u
          FROM codes cd JOIN vd vq ON vq.j = cd.j AND vq.c = cd.code
          WHERE vq.vec_id < 5 AND cd.vec_id != vq.vec_id
          GROUP BY 1, 2)
        SELECT query_id, cand_id, adist_u, rk FROM (
          SELECT query_id, cand_id, adist_u, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adist_u, cand_id) AS rk
          FROM ad)
        WHERE rk <= 5"""
      },
      setup = Some((s, d) => ivfPqModel(s, d))),

    // IVF-PQ (the FAISS IVFPQ composition): coarse cells prune the corpus
    // to each query's 2 nearest of 8 cells, PQ codes + ADC score what
    // remains. Probe = equi-join on the cell id. Deterministic seed
    // centroids at BOTH tiers → the oracle replays cell assignment, probe
    // choice, encode, ADC, and ranking bit-exactly.
    // codebook/cell TRAINING is the setup phase (memoized per corpus
    // dir); the measured run is encode + probe + ADC over held constants
    Q("q_ann_ivfpq",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val (cells, model) = ivfPqModel(s, d)
        Similarity.ivfPqTopKWith(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", cells, model, nProbe = 2, topK = 5)
      },
      Some {
        def dotS(x: String, y: String) =
          s"""list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)
              for i in generate_series(1, len($x))])"""
        def du(x: String, y: String) =
          s"""CAST(FLOOR(ROUND(${dotS(x, x)} - 2 * ${dotS(x, y)} +
            ${dotS(y, y)}, 6) * 1e6 + 0.5) AS BIGINT)"""
        s"""WITH cs AS (
          SELECT embedding AS cv, ROW_NUMBER() OVER (ORDER BY vec_id) - 1
            AS c
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
        cd AS (SELECT vec_id, c, ${du("x", "cv")} AS du
          FROM (SELECT e.vec_id, s.c, e.embedding AS x, s.cv
            FROM embeddings e CROSS JOIN cs s)),
        cellof AS (SELECT vec_id, c AS cell FROM (
            SELECT vec_id, c, ROW_NUMBER() OVER (
              PARTITION BY vec_id ORDER BY du, c) AS rk FROM cd)
          WHERE rk = 1),
        probes AS (SELECT vec_id, c AS cell FROM (
            SELECT vec_id, c, ROW_NUMBER() OVER (
              PARTITION BY vec_id ORDER BY du, c) AS rk
            FROM cd WHERE vec_id < 5)
          WHERE rk <= 2),
        seeds AS (
          SELECT embedding AS sv, ROW_NUMBER() OVER (ORDER BY vec_id) - 1
            AS c
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
        cent AS (
          SELECT c, j, sv[j*8+1 : j*8+8] AS cv
          FROM seeds, (SELECT unnest(generate_series(0, 7)) AS j)),
        vd AS (
          SELECT vec_id, j, c, ${du("x", "cv")} AS du
          FROM (SELECT e.vec_id, ct.j, ct.c,
              e.embedding[ct.j*8+1 : ct.j*8+8] AS x, ct.cv
            FROM embeddings e CROSS JOIN cent ct)),
        codes AS (
          SELECT vec_id, j, c AS code FROM (
            SELECT vec_id, j, c, ROW_NUMBER() OVER (
              PARTITION BY vec_id, j ORDER BY du, c) AS rk FROM vd)
          WHERE rk = 1),
        ad AS (
          SELECT p.vec_id AS query_id, cl.vec_id AS cand_id,
            CAST(SUM(vq.du) AS BIGINT) AS adist_u
          FROM probes p
          JOIN cellof cl ON cl.cell = p.cell AND cl.vec_id != p.vec_id
          JOIN codes cc ON cc.vec_id = cl.vec_id
          JOIN vd vq ON vq.vec_id = p.vec_id AND vq.j = cc.j
            AND vq.c = cc.code
          GROUP BY 1, 2)
        SELECT query_id, cand_id, adist_u, rk FROM (
          SELECT query_id, cand_id, adist_u, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adist_u, cand_id) AS rk
          FROM ad)
        WHERE rk <= 5"""
      },
      setup = Some((s, d) => ivfPqModel(s, d))),

    // IVF ANN (trained-centroid scale path). K-means training is
    // float-iterative and not oracle-replicable, so the gate checks
    // MEMBERSHIP INVARIANTS plus a cross-engine anchor instead: per
    // query, exactly k results, every candidate a real corpus vector and
    // never the query itself, cosines sorted with rank, and the IVF
    // top-1 cosine never exceeding the EXACT brute-force top-1 — which
    // DuckDB recomputes independently (the anchor). Recall itself is
    // spec-bounded (OperatorsSpec "ivfTopK achieves reasonable recall").
    Q("q_ann_ivf",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") < 10)
        // cacheKey = the corpus path: the index is built once per corpus
        // snapshot and reused across queries, matching the reference's
        // build-at-segment-load index lifecycle
        val ivf = Similarity.ivfTopK(emb, qs,
          "vec_id", "embedding", 5, 8, 2, cacheKey = Some(d))
        val bf1 = Similarity.bruteForceTopK(emb, qs,
            "vec_id", "embedding", 1)
          .select(col("query_id"), col("cos").as("bf_top1"))
        val wq = Window.partitionBy(col("query_id")).orderBy(col("rk"))
        val flags = ivf
          .join(emb.select(col("vec_id").as("cand_id"), lit(1).as("__m")),
            Seq("cand_id"), "left")
          .withColumn("prev_cos", lag(col("cos"), 1).over(wq))
          .groupBy(col("query_id"))
          .agg(count(lit(1)).cast("int").as("n_cands"),
            bool_and(col("__m").isNotNull).as("all_members"),
            bool_and(col("cand_id") =!= col("query_id")).as("no_self"),
            bool_and(col("prev_cos").isNull ||
              col("prev_cos") >= col("cos")).as("cos_sorted"),
            max(when(col("rk") === 1, col("cos"))).as("ivf_top1"))
        flags.join(broadcast(bf1), Seq("query_id"))
          .select(col("query_id"), col("n_cands"), col("all_members"),
            col("no_self"), col("cos_sorted"),
            (col("ivf_top1") <= col("bf_top1") + 1e-9).as("le_exact"),
            col("bf_top1"))
          .orderBy(col("query_id"))
      },
      Some(s"""SELECT query_id, 5 AS n_cands, true AS all_members,
          true AS no_self, true AS cos_sorted, true AS le_exact, bf_top1
        FROM (SELECT query_id, MAX(cos) AS bf_top1 FROM (
          SELECT q.vec_id AS query_id, ROUND($qaCosSql, 6) AS cos
          FROM embeddings a,
            (SELECT * FROM embeddings WHERE vec_id < 10) q
          WHERE a.vec_id != q.vec_id) GROUP BY query_id)
        ORDER BY query_id""")),

    // Incremental ANN: append a batch to the persisted cell-partitioned
    // IVF index WITHOUT retraining (argmin to the frozen centroids, the
    // realtime-segment lifecycle), batch-tag idempotent — the replayed
    // append in setup is a proven no-op via the n_index_rows column.
    // Probes against the merged index must surface each query's appended
    // exact twin at rank 1 with cosine 1.0 (the twin lands in the
    // query's first probe cell by the shared (cdist, cell) ordering).
    // Invariant+anchor oracle like q_ann_ivf: booleans + the brute-force
    // top-1 cosine over the UNION corpus replayed in SQL.
    Q("q_ann_ivf_append",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val batch = emb.select((col("vec_id") + 500000L).as("vec_id"),
          col("embedding"), col("label"))
        ensureIvfAppendIndex(s, d)
        val merged = Similarity.loadIvfIndex(s, ivfAppendDir(d))
        val qs = emb.filter(col("vec_id") < 5)
        val ivf = Similarity.ivfTopKWith(merged, qs,
          "vec_id", "embedding", 5, 2)
        val union = emb.unionByName(batch)
        val bf1 = Similarity.bruteForceTopK(union, qs,
            "vec_id", "embedding", 1)
          .select(col("query_id"), col("cos").as("bf_top1"))
        val nIdx = merged.assigned.count()
        val wq = Window.partitionBy(col("query_id")).orderBy(col("rk"))
        val flags = ivf
          .join(union.select(col("vec_id").as("cand_id"),
            lit(1).as("__m")), Seq("cand_id"), "left")
          .withColumn("prev_cos", lag(col("cos"), 1).over(wq))
          .groupBy(col("query_id"))
          .agg(count(lit(1)).cast("int").as("n_cands"),
            bool_and(col("__m").isNotNull).as("all_members"),
            bool_and(col("cand_id") =!= col("query_id")).as("no_self"),
            bool_and(col("prev_cos").isNull ||
              col("prev_cos") >= col("cos")).as("cos_sorted"),
            max(when(col("rk") === 1, col("cos"))).as("top1"))
        flags.join(broadcast(bf1), Seq("query_id"))
          .select(col("query_id"), col("n_cands"), col("all_members"),
            col("no_self"), col("cos_sorted"), col("top1"),
            (col("top1") <= col("bf_top1") + 1e-9).as("le_exact"),
            col("bf_top1"), lit(nIdx).as("n_index_rows"))
          .orderBy(col("query_id"))
      },
      Some(s"""SELECT query_id, 5 AS n_cands, true AS all_members,
          true AS no_self, true AS cos_sorted, 1.0 AS top1,
          true AS le_exact, bf_top1,
          CAST(2 * (SELECT COUNT(*) FROM embeddings) AS BIGINT)
            AS n_index_rows
        FROM (SELECT query_id, MAX(cos) AS bf_top1 FROM (
          SELECT q.vec_id AS query_id, ROUND($qaCosSql, 6) AS cos
          FROM (SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 500000, embedding FROM embeddings) a,
            (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
          WHERE a.vec_id != q.vec_id) GROUP BY query_id)
        ORDER BY query_id"""),
      setup = Some((s, d) => buildIvfAppendIndex(s, d))),

    // Index MAINTENANCE lifecycle (delete + compact, the other half of a
    // daily pipeline): tombstoned ids vanish immediately, compaction
    // (run TWICE — replay-idempotent) folds them in physically, and a
    // post-compaction append still lands its twin at rank 1 / cos 1.0.
    // n_index_rows = 2N proves the arithmetic: N base + N appended − 5
    // deleted + 5 re-appended.
    Q("q_ann_ivf_lifecycle",
      (s, d) => {
        ensureIvfLifecycle(s, d)
        val merged = Similarity.loadIvfIndex(s, ivfLifecycleDir(d))
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") < 5)
        val ivf = Similarity.ivfTopKWith(merged, qs,
          "vec_id", "embedding", 5, 2)
        val nIdx = merged.assigned.count()
        ivf.groupBy(col("query_id"))
          .agg(count(lit(1)).cast("int").as("n_cands"),
            bool_and(!col("cand_id").between(500000L, 500004L))
              .as("no_deleted"),
            max(when(col("rk") === 1, col("cos"))).as("top1"),
            max(when(col("rk") === 1, col("cand_id"))).as("top1_cand"))
          .select(col("query_id"), col("n_cands"), col("no_deleted"),
            col("top1"), col("top1_cand"),
            lit(nIdx).as("n_index_rows"))
          .orderBy(col("query_id"))
      },
      Some("""SELECT vec_id AS query_id, 5 AS n_cands, true AS no_deleted,
          1.0 AS top1, vec_id + 600000 AS top1_cand,
          CAST(2 * (SELECT COUNT(*) FROM embeddings) AS BIGINT)
            AS n_index_rows
        FROM embeddings WHERE vec_id < 5 ORDER BY query_id"""),
      setup = Some((s, d) => buildIvfLifecycle(s, d))),

    // multimodal plumbing: binary payload + metadata + stubbed decode
    Q("q_multimodal_meta",
      (s, d) => {
        val withBin = Multimodal.withBinary(Tables.documents(s, d), "text")
        // feature vector unpacked to scalar columns — the driver's pandas
        // compare cannot sort array-typed columns; each element is the
        // same IEEE division in both engines, so doubles match exactly
        val feat = Multimodal.fakeFeatures(col("text"), 4)
        withBin.select(Seq(col("doc_id"),
          Multimodal.metadataOf(col("content")).getField("n_bytes")
            .as("n_bytes"),
          Multimodal.metadataOf(col("content")).getField("mime").as("mime")) ++
          (0 until 4).map(i => element_at(feat, i + 1).as(s"feat_$i")): _*)
      },
      Some(s"""SELECT doc_id, strlen(text) AS n_bytes,
        'application/octet-stream' AS mime,
        ${(0 until 4).map(i =>
          s"CAST((${hash60Sql(s"text || '#$i'")}) % 1000 AS DOUBLE) / 1000.0" +
            s" AS feat_$i").mkString(", ")}
        FROM documents""")),

    // REAL image round-trip, oracle-checked end-to-end: deterministic
    // 16×16 gray PNGs built from a pixel formula, ImageIO-decoded,
    // nearest-resampled to 8×8 (Multimodal.resizeImage — the actual
    // javax.imageio + raster-resample production path), pixels
    // re-extracted; DuckDB replays the arithmetic directly (nearest 16→8
    // samples source pixel (2x+1, 2y+1)), so any codec or resample
    // deviation breaks the hash. PNG is lossless and the resample is
    // integer-exact — cross-engine comparable despite DuckDB having no
    // image functions.
    Q("q_image_resize",
      (s, d) => {
        val makePng = udf { (id: Long) =>
          val img = new java.awt.image.BufferedImage(16, 16,
            java.awt.image.BufferedImage.TYPE_INT_ARGB)
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              val g = ((id * 31 + x * 7 + y * 13) % 256).toInt
              img.setRGB(x, y, 0xFF000000 | (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          out.toByteArray
        }
        val redGrid = udf { (bytes: Array[Byte]) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          for { y <- 0 until img.getHeight; x <- 0 until img.getWidth }
            yield (x.toLong, y.toLong, ((img.getRGB(x, y) >>> 16) & 0xFF).toLong)
        }
        Tables.documents(s, d).select(col("doc_id"))
          .orderBy("doc_id").limit(16)
          .withColumn("png", makePng(col("doc_id")))
          .withColumn("rz",
            Multimodal.resizeImage(col("png"), 8, 8, "nearest"))
          .select(col("doc_id"), explode(redGrid(col("rz.content"))).as("p"))
          .select(col("doc_id"), col("p._1").as("x"), col("p._2").as("y"),
            col("p._3").as("v"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 16),
          xs AS (SELECT unnest(generate_series(0, 7)) AS x),
          ys AS (SELECT unnest(generate_series(0, 7)) AS y)
        SELECT d.doc_id, xs.x, ys.y,
          (d.doc_id * 31 + (2 * xs.x + 1) * 7 + (2 * ys.y + 1) * 13) % 256 AS v
        FROM d CROSS JOIN xs CROSS JOIN ys""")),

    // Bilinear twin of q_image_resize: 16×1 gray strips from a formula,
    // decoded and 2:1-downsampled bilinear. At exactly 2:1 each output
    // center lands midway between two source pixels (fx = 0.5, one row),
    // so the blend is (g0+g1)/2 rounded half-up — integer-exact and
    // replayable in SQL, hash-checking the bilinear kernel end-to-end.
    Q("q_image_bilinear",
      (s, d) => {
        val makePng = udf { (id: Long) =>
          val img = new java.awt.image.BufferedImage(16, 1,
            java.awt.image.BufferedImage.TYPE_INT_ARGB)
          var x = 0
          while (x < 16) {
            val g = ((id * 17 + x * 11) % 256).toInt
            img.setRGB(x, 0, 0xFF000000 | (g << 16) | (g << 8) | g)
            x += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          out.toByteArray
        }
        val redRow = udf { (bytes: Array[Byte]) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          for (x <- 0 until img.getWidth)
            yield (x.toLong, ((img.getRGB(x, 0) >>> 16) & 0xFF).toLong)
        }
        Tables.documents(s, d).select(col("doc_id"))
          .orderBy("doc_id").limit(16)
          .withColumn("png", makePng(col("doc_id")))
          .withColumn("rz",
            Multimodal.resizeImage(col("png"), 8, 1, "bilinear"))
          .select(col("doc_id"), explode(redRow(col("rz.content"))).as("p"))
          .select(col("doc_id"), col("p._1").as("x"), col("p._2").as("v"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 16),
          xs AS (SELECT unnest(generate_series(0, 7)) AS x)
        SELECT d.doc_id, xs.x,
          CAST(floor((((d.doc_id * 17 + (2 * xs.x) * 11) % 256)
                    + ((d.doc_id * 17 + (2 * xs.x + 1) * 11) % 256)) / 2.0
                    + 0.5) AS BIGINT) AS v
        FROM d CROSS JOIN xs""")),

    // Perceptual image hash (aHash): formula PNGs → nearest 8×8 thumbnail
    // → integer BT.601 luma thresholded against the grid mean — EXACT
    // integer arithmetic end-to-end, so the oracle replays decode-resample
    // -luma-threshold bit-for-bit. Hash emitted as two 32-bit halves
    // (keeps the replay's power-of-2 sums inside exact BIGINT range).
    Q("q_image_phash",
      (s, d) => {
        val makePng = udf { (id: Long) =>
          val img = new java.awt.image.BufferedImage(16, 16,
            java.awt.image.BufferedImage.TYPE_INT_ARGB)
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              val g = ((id * 31 + x * 7 + y * 13) % 256).toInt
              img.setRGB(x, y, 0xFF000000 | (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          out.toByteArray
        }
        Tables.documents(s, d).select(col("doc_id"))
          .orderBy("doc_id").limit(16)
          .withColumn("png", makePng(col("doc_id")))
          .withColumn("h", Multimodal.imageHash(col("png"), 8, "nearest"))
          .select(col("doc_id"),
            col("h").bitwiseAND(lit(0xFFFFFFFFL)).as("h_lo"),
            shiftrightunsigned(col("h"), 32).as("h_hi"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 16),
          cell AS (SELECT d.doc_id, ys.y * 8 + xs.x AS i,
              1000 * ((d.doc_id * 31 + (2*xs.x+1) * 7 + (2*ys.y+1) * 13)
                % 256) AS lu
            FROM d,
              (SELECT unnest(generate_series(0, 7)) AS x) xs,
              (SELECT unnest(generate_series(0, 7)) AS y) ys),
          tot AS (SELECT doc_id, SUM(lu) AS s FROM cell GROUP BY doc_id)
        SELECT c.doc_id,
          CAST(SUM(CASE WHEN c.lu * 64 > t.s AND c.i < 32
            THEN CAST(POWER(2, c.i) AS BIGINT) ELSE 0 END) AS BIGINT)
            AS h_lo,
          CAST(SUM(CASE WHEN c.lu * 64 > t.s AND c.i >= 32
            THEN CAST(POWER(2, c.i - 32) AS BIGINT) ELSE 0 END) AS BIGINT)
            AS h_hi
        FROM cell c JOIN tot t USING (doc_id) GROUP BY c.doc_id""")),

    // Image NEAR-DUP pairs (r15 — the cross-modal twin of SimHash text
    // dedup, the path a multimodal corpus dedups screenshots/logos by):
    // aHash signatures blocked by pigeonhole hamming chunks — perfect
    // recall within maxDist, so the oracle can be the BRUTE pair set:
    // replay the exact integer aHash per doc (same arithmetic as
    // q_image_phash, as two 32-bit halves), then every id<id pair with
    // bit_count(xor_lo)+bit_count(xor_hi) ≤ maxDist. Synthesis: 24
    // PNGs in 4 base-pattern groups, one sampled cell perturbed per
    // doc — within-group hashes differ in few bits (pairs exist),
    // cross-group in many (pairs don't).
    Q("q_image_neardup",
      (s, d) => {
        val makePng = udf { (id: Long) =>
          val img = new java.awt.image.BufferedImage(16, 16,
            java.awt.image.BufferedImage.TYPE_INT_ARGB)
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              val g0 = ((id % 4) * 53 + x * 7 + y * 13) % 256
              val g = (if (x == 1 && y == 1) (g0 + id * 17) % 256
                       else g0).toInt
              img.setRGB(x, y, 0xFF000000 | (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          out.toByteArray
        }
        val pngs = Tables.documents(s, d).select(col("doc_id"))
          .orderBy("doc_id").limit(24)
          .withColumn("png", makePng(col("doc_id")))
        graft.operators.Multimodal.imageNearDupPairs(pngs, "png",
            "doc_id", maxDist = 8, side = 8, method = "nearest")
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents
            ORDER BY doc_id LIMIT 24),
          cell AS (SELECT d.doc_id, ys.y * 8 + xs.x AS i,
              1000 * (CASE WHEN xs.x = 0 AND ys.y = 0
                THEN ((d.doc_id % 4) * 53 + 7 + 13 + d.doc_id * 17) % 256
                ELSE ((d.doc_id % 4) * 53 + (2*xs.x+1) * 7
                  + (2*ys.y+1) * 13) % 256 END) AS lu
            FROM d,
              (SELECT unnest(generate_series(0, 7)) AS x) xs,
              (SELECT unnest(generate_series(0, 7)) AS y) ys),
          tot AS (SELECT doc_id, SUM(lu) AS s FROM cell GROUP BY doc_id),
          h AS (SELECT c.doc_id,
              CAST(SUM(CASE WHEN c.lu * 64 > t.s AND c.i < 32
                THEN CAST(POWER(2, c.i) AS BIGINT) ELSE 0 END) AS BIGINT)
                AS lo,
              CAST(SUM(CASE WHEN c.lu * 64 > t.s AND c.i >= 32
                THEN CAST(POWER(2, c.i - 32) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS hi
            FROM cell c JOIN tot t USING (doc_id) GROUP BY c.doc_id)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
            AS INTEGER) AS dist
        FROM h a JOIN h b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 8
        ORDER BY id_a, id_b""")),

    // REAL audio round-trip, oracle-checked end-to-end: deterministic
    // PCM16 WAVs built from a sample formula (s(i) = ((id·37 + i·11) %
    // 2048) − 1024, 8 kHz mono, frame count varying per doc), encoded
    // through the production RIFF writer and parsed back by the
    // chunk-walking decoder (Multimodal.audioMeta) — any header/layout
    // deviation breaks the hash. Oracle replays the arithmetic.
    Q("q_audio_meta",
      (s, d) => {
        val makeWav = udf { (id: Long) =>
          val n = 400 + (id % 4).toInt * 100
          val smp = Array.tabulate(n)(i =>
            (((id * 37 + i * 11) % 2048) - 1024).toShort)
          Multimodal.encodeWavPcm16(smp, 8000, 1)
        }
        Tables.documents(s, d).select(col("doc_id"))
          .orderBy("doc_id").limit(16)
          .withColumn("wav", makeWav(col("doc_id")))
          .withColumn("m", Multimodal.audioMeta(col("wav")))
          .select(col("doc_id"), col("m.sample_rate").as("sample_rate"),
            col("m.channels").as("channels"),
            col("m.num_frames").as("num_frames"),
            col("m.duration_ms").as("duration_ms"))
      },
      Some("""SELECT doc_id, 8000 AS sample_rate, 1 AS channels,
          CAST(400 + (doc_id % 4) * 100 AS BIGINT) AS num_frames,
          (400 + (doc_id % 4) * 100) * 1000 // 8000 AS duration_ms
        FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 16)""")),

    // Integer-exact audio features (Σ|s|, peak |s|, strict zero
    // crossings) through the real decode path; the oracle regenerates
    // the sample stream with generate_series and replays the three
    // aggregates — bit-for-bit, no floats anywhere.
    Q("q_audio_features",
      (s, d) => {
        val makeWav = udf { (id: Long) =>
          val n = 400 + (id % 4).toInt * 100
          val smp = Array.tabulate(n)(i =>
            (((id * 37 + i * 11) % 2048) - 1024).toShort)
          Multimodal.encodeWavPcm16(smp, 8000, 1)
        }
        Tables.documents(s, d).select(col("doc_id"))
          .orderBy("doc_id").limit(16)
          .withColumn("wav", makeWav(col("doc_id")))
          .withColumn("f", Multimodal.audioFeatures(col("wav")))
          .select(col("doc_id"), col("f.sum_abs").as("sum_abs"),
            col("f.peak").as("peak"), col("f.zero_cross").as("zero_cross"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 16),
          s AS (SELECT d.doc_id, gi.i,
              ((d.doc_id * 37 + gi.i * 11) % 2048) - 1024 AS v
            FROM d, (SELECT unnest(generate_series(0, 699)) AS i) gi
            WHERE gi.i < 400 + (d.doc_id % 4) * 100),
          lagged AS (SELECT doc_id, i, v,
              lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM s)
        SELECT doc_id, CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
          CAST(MAX(ABS(v)) AS INT) AS peak,
          CAST(SUM(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS zero_cross
        FROM lagged GROUP BY doc_id""")),

    // Linear-interpolation resample kernel, 1:2 upsample (8→16 kHz):
    // even output frames copy source frames, odd frames land exactly
    // midway (fr = 0.5) so the blend is floor((s_k + s_{k+1})/2 + 0.5) —
    // integer-exact and replayed in SQL, hash-checking decode →
    // interpolate → re-encode → re-decode end-to-end (the audio twin of
    // q_image_bilinear).
    Q("q_audio_resample",
      (s, d) => {
        val makeWav = udf { (id: Long) =>
          val n = 40 + (id % 4).toInt * 10
          val smp = Array.tabulate(n)(i =>
            (((id * 37 + i * 11) % 2048) - 1024).toShort)
          Multimodal.encodeWavPcm16(smp, 8000, 1)
        }
        val readSamples = udf { (bytes: Array[Byte]) =>
          Multimodal.decodeWavPcm16(bytes).map { case (_, _, smp) =>
            smp.zipWithIndex.map { case (v, j) => (j.toLong, v.toLong) }.toSeq
          }.getOrElse(Seq.empty)
        }
        Tables.documents(s, d).select(col("doc_id"))
          .orderBy("doc_id").limit(16)
          .withColumn("wav", makeWav(col("doc_id")))
          .withColumn("rs", Multimodal.resampleAudio(col("wav"), 16000))
          .select(col("doc_id"), explode(readSamples(col("rs"))).as("p"))
          .select(col("doc_id"), col("p._1").as("j"), col("p._2").as("v"))
      },
      Some("""WITH d AS (SELECT doc_id,
              40 + (doc_id % 4) * 10 AS nf
            FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 16)),
          js AS (SELECT unnest(generate_series(0, 139)) AS j)
        SELECT d.doc_id, CAST(js.j AS BIGINT) AS j,
          CAST(CASE
            WHEN js.j % 2 = 0 THEN
              ((d.doc_id * 37 + (js.j // 2) * 11) % 2048) - 1024
            WHEN js.j = 2 * d.nf - 1 THEN
              ((d.doc_id * 37 + (d.nf - 1) * 11) % 2048) - 1024
            ELSE FLOOR(
              ((((d.doc_id * 37 + ((js.j - 1) // 2) * 11) % 2048) - 1024)
             + (((d.doc_id * 37 + ((js.j + 1) // 2) * 11) % 2048) - 1024))
              / 2.0 + 0.5)
          END AS BIGINT) AS v
        FROM d, js WHERE js.j < 2 * d.nf""")),

    // REAL video container tier (RIFF/AVI — the WAV playbook applied to
    // video): deterministic variable-length frame payloads (odd sizes
    // exercise RIFF pad bytes) ride a real AVI encode → container parse
    // → even-index frame sampling; header fields and every sampled
    // frame's length / first byte / byte sum are bit-checked, so a
    // one-byte parse-offset error anywhere in the chunk walk fails the
    // hash. The MJPEG JPEG-decode path is spec-gated (lossy codec —
    // cross-engine pixel replay is a PNG-tier property, see
    // q_image_resize).
    Q("q_video_frames",
      (s, d) => {
        val mk = udf { (id: Long) =>
          val frames = (0 until 6).map { f =>
            Array.tabulate(16 + f)(j =>
              ((id * 7 + f * 13 + j * 3) % 251).toByte)
          }
          Multimodal.encodeAviMjpeg(frames, 8, 8, 40000)
        }
        val stats = udf { (fr: Array[Byte]) =>
          (fr.length, fr(0) & 0xFF, fr.map(_ & 0xFF).map(_.toLong).sum)
        }
        Tables.documents(s, d).select(col("doc_id"))
          .orderBy("doc_id").limit(24)
          .withColumn("avi", mk(col("doc_id")))
          .select(col("doc_id"),
            Multimodal.videoMeta(col("avi")).as("m"),
            explode(Multimodal.frameSampleAvi(col("avi"), 3)).as("fr"))
          .select(col("doc_id"), col("m.width").as("width"),
            col("m.height").as("height"),
            col("m.n_frames").as("n_frames"),
            col("m.us_per_frame").as("us_per_frame"),
            col("fr.frame_idx").as("frame_idx"),
            stats(col("fr.frame")).as("s"))
          .select(col("doc_id"), col("width"), col("height"),
            col("n_frames"), col("us_per_frame"), col("frame_idx"),
            col("s._1").as("frame_len"), col("s._2").as("first_byte"),
            col("s._3").as("byte_sum"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents
            ORDER BY doc_id LIMIT 24),
          fi AS (SELECT unnest([0, 2, 5]) AS frame_idx)
        SELECT d.doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
          CAST(6 AS INT) AS n_frames, CAST(40000 AS INT) AS us_per_frame,
          CAST(fi.frame_idx AS INT) AS frame_idx,
          CAST(16 + fi.frame_idx AS INT) AS frame_len,
          CAST((d.doc_id * 7 + fi.frame_idx * 13) % 251 AS INT)
            AS first_byte,
          CAST(list_sum([(d.doc_id * 7 + fi.frame_idx * 13 + j * 3) % 251
            for j in generate_series(0, 15 + fi.frame_idx)]) AS BIGINT)
            AS byte_sum
        FROM d CROSS JOIN fi ORDER BY doc_id, frame_idx""")),

    // Video → image pipeline: REAL MJPEG frames (per-frame-varying
    // dimensions, JPEG-encoded via ImageIO) ride the AVI container,
    // get frame-sampled, and each sampled frame decodes through the
    // image tier — the decoded width/height are codec-EXACT even for a
    // lossy codec, so the oracle bit-checks that the right JPEG landed
    // in the right sampled slot and actually decodes.
    Q("q_video_pipeline",
      (s, d) => {
        val mk = udf { (id: Long) =>
          val frames = (0 until 4).map { f =>
            val (w, h) = (8 + f, 6)
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            for (y <- 0 until h; x <- 0 until w) {
              val g = ((id * 31 + x * 7 + y * 13 + f * 3) % 256).toInt
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
            }
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpg", out)
            out.toByteArray
          }
          Multimodal.encodeAviMjpeg(frames, 8, 6, 33333)
        }
        Tables.documents(s, d).select(col("doc_id"))
          .orderBy("doc_id").limit(16)
          .withColumn("avi", mk(col("doc_id")))
          .select(col("doc_id"),
            explode(Multimodal.frameSampleAvi(col("avi"), 2)).as("fr"))
          .select(col("doc_id"), col("fr.frame_idx").as("frame_idx"),
            Multimodal.imageMeta(col("fr.frame")).as("m"))
          .select(col("doc_id"), col("frame_idx"),
            col("m.width").as("width"), col("m.height").as("height"),
            col("m.decodable").as("decodable"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents
            ORDER BY doc_id LIMIT 16),
          fi AS (SELECT unnest([0, 3]) AS frame_idx)
        SELECT d.doc_id, CAST(fi.frame_idx AS INT) AS frame_idx,
          CAST(8 + fi.frame_idx AS INT) AS width, CAST(6 AS INT) AS height,
          true AS decodable
        FROM d CROSS JOIN fi ORDER BY doc_id, frame_idx""")),

    // Dictionary-backed fuzzy probe over the persisted text index (the
    // Lucene term-dictionary role, round 12): candidate tokens within
    // edit distance 1 of the (misspelled) query resolve on the persisted
    // VOCAB sidecar — |vocab| rows, not a distinct over all postings —
    // then semi-join the tp-partitioned postings. Oracle replays the
    // levenshtein predicate over raw tokens, so dictionary resolution,
    // the semi-join, and the postings layout are all hash-checked.
    Q("q_text_dict_fuzzy",
      (s, d) => {
        import graft.sources.TextIndexLifecycle
        val root = s"target/graft_textdict_${CorpusKey.of(d)}"
        val docs = Tables.documents(s, d)
        // self-contained without the setup phase (tag replay no-ops)
        TextIndexLifecycle.append(s, root, "text", "doc_id", docs, "b1")
        val idx = TextIndexLifecycle.load(s, root, "text", "doc_id")
        val vocab = TextIndexLifecycle.loadVocab(s, root, "text")
        graft.operators.TextMatch.compile(idx,
          docs.select(col("doc_id")).distinct(), "doc_id",
          graft.operators.TextMatch.parse("vectr~1"), vocab)
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id FROM (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents) t
        WHERE len(list_filter(tk, w -> levenshtein(w, 'vectr') <= 1)) > 0
        ORDER BY doc_id""")
      ,
      setup = Some((s, d) => {
        import graft.sources.TextIndexLifecycle
        val root = s"target/graft_textdict_${CorpusKey.of(d)}"
        TextIndexLifecycle.append(s, root, "text", "doc_id",
          Tables.documents(s, d), "b1")
      })),

    // Text-index lifecycle (the Lucene-index add/remove role at file
    // granularity): build from the even-id half, append the odd half,
    // REPLAY the append (must no-op), tombstone every 10th doc, compact
    // TWICE (replay-idempotent), and answer a token lookup from the
    // surviving postings. Oracle = positional postings of the expected
    // final corpus — any double-index, lost delete, or bad swap breaks
    // the hash.
    Q("q_text_index_lifecycle",
      (s, d) => {
        import graft.sources.TextIndexLifecycle
        val root =
          s"target/graft_textidx_${CorpusKey.of(d)}"
        TextIndexLifecycle.deleteRoot(root)
        val docs = Tables.documents(s, d)
        TextIndexLifecycle.append(s, root, "text", "doc_id",
          docs.filter(col("doc_id") % 2 === 0), "batch_even")
        TextIndexLifecycle.append(s, root, "text", "doc_id",
          docs.filter(col("doc_id") % 2 === 1), "batch_odd")
        TextIndexLifecycle.append(s, root, "text", "doc_id",
          docs.filter(col("doc_id") % 2 === 1), "batch_odd") // replay
        TextIndexLifecycle.delete(s, root, "text",
          docs.filter(col("doc_id") % 10 === 0).select(col("doc_id")),
          "doc_id", "del_1")
        TextIndexLifecycle.compact(s, root, "text", "doc_id")
        TextIndexLifecycle.compact(s, root, "text", "doc_id") // replay
        // the probe prunes to its term's tp partition (the layout's
        // point — a known-term lookup reads 1/16th of the postings);
        // tp is derived from the token, so the filter is a no-op on
        // the result and the oracle is unchanged
        TextIndexLifecycle.load(s, root, "text", "doc_id")
          .filter(col("tp") ===
            graft.operators.TextMatch.tpOf("vector"))
          .filter(col("token") === "vector")
          .select(col("doc_id"), col("pos"))
          .orderBy(col("doc_id"), col("pos"))
      },
      Some(s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks
          FROM documents WHERE doc_id % 10 != 0),
        ix AS (SELECT doc_id, toks,
          unnest(generate_series(1, len(toks))) AS i FROM t)
        SELECT doc_id, CAST(i - 1 AS INT) AS pos FROM ix
        WHERE toks[i] = 'vector' ORDER BY doc_id, pos""")),

    // The STREAMING text-index path, hash-gated: the corpus arrives as 4
    // micro-batches through Streams.textIndexSink (per-batch
    // tag-idempotent appends — the reference's realtime Lucene indexing),
    // one batch REPLAYED to prove at-least-once safety, and the final
    // persisted index answers the same pruned token lookup as the batch
    // lifecycle gate. Oracle = positional postings of the full corpus:
    // any double-index from the replay or lost batch breaks the hash.
    Q("q_stream_text_index",
      (s, d) => {
        import graft.sources.TextIndexLifecycle
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        val root = s"target/graft_streamtextidx_${CorpusKey.of(d)}"
        TextIndexLifecycle.deleteRoot(root)
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
          .as[(Long, String)].collect()
        val chunk = math.max(1, math.ceil(docs.length / 4.0).toInt)
        val mem = MemoryStream[(Long, String)]
        val df = mem.toDF().toDF("doc_id", "text")
        val q = graft.streaming.Streams.textIndexSink(df, "text",
          "doc_id", root, streamTag = Some("gate"))(_ => ()).start()
        docs.grouped(chunk).foreach { c =>
          mem.addData(c.toSeq: _*)
          q.processAllAvailable() // one micro-batch per chunk
        }
        q.stop()
        // at-least-once replay of the LAST micro-batch: the lifecycle
        // marker must no-op it (same streamTag + batchId a restarted
        // query would replay)
        val nBatches = math.ceil(docs.length.toDouble / chunk).toInt
        TextIndexLifecycle.append(s, root, "text", "doc_id",
          docs.grouped(chunk).toSeq.last.toSeq.toDF("doc_id", "text"),
          s"gate_${nBatches - 1}")
        TextIndexLifecycle.load(s, root, "text", "doc_id")
          .filter(col("tp") ===
            graft.operators.TextMatch.tpOf("vector"))
          .filter(col("token") === "vector")
          .select(col("doc_id"), col("pos"))
          .orderBy(col("doc_id"), col("pos"))
      },
      Some(s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks
          FROM documents),
        ix AS (SELECT doc_id, toks,
          unnest(generate_series(1, len(toks))) AS i FROM t)
        SELECT doc_id, CAST(i - 1 AS INT) AS pos FROM ix
        WHERE toks[i] = 'vector' ORDER BY doc_id, pos""")),

    // The STREAMING exact-dedup path, hash-gated: the corpus arrives in
    // doc_id order as 4 micro-batches through Streams.exactDedupSink
    // (each probes the persisted index, appends its survivors tagged),
    // and the LAST batch is replayed through the same protocol — the
    // tag contract must hand back byte-identical survivors, asserted
    // in-gate. With ordered batches and lowest-id-first within-batch
    // survival, the sequential protocol's survivor set equals global
    // first-occurrence per text, which the oracle states directly —
    // any lost batch, double-probe, or replay drift breaks the hash.
    Q("q_stream_exact_dedup",
      (s, d) => {
        import graft.operators.Dedup
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        val ixName = s"qsed_${CorpusKey.of(d)}"
        Dedup.dropIndex(s, ixName)
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
          .orderBy(col("doc_id")).as[(Long, String)].collect()
        val chunk = math.max(1, math.ceil(docs.length / 4.0).toInt)
        val chunks = docs.grouped(chunk).toSeq
        val survivors = scala.collection.mutable.ArrayBuffer.empty[Long]
        var lastBatch = Seq.empty[Long]
        val mem = MemoryStream[(Long, String)]
        val df = mem.toDF().toDF("doc_id", "text")
        val q = graft.streaming.Streams.exactDedupSink(df, "text",
          "doc_id", ixName, streamTag = Some("gate")) { out =>
          lastBatch = out.select(col("doc_id")).collect()
            .map(_.getLong(0)).toSeq
          survivors ++= lastBatch
        }.start()
        chunks.foreach { c =>
          mem.addData(c.toSeq: _*)
          q.processAllAvailable() // one micro-batch per chunk
        }
        q.stop()
        // at-least-once replay of the last micro-batch: the batch-tagged
        // protocol must return byte-identical survivors, not zero (a
        // probe against its own rows) and not doubles (a second append)
        val replayed = Dedup.incrementalExact(s,
          chunks.last.toSeq.toDF("doc_id", "text"), "text", "doc_id",
          ixName, batchTag = Some(s"gate_${chunks.length - 1}"))
          .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
        require(replayed.sorted == lastBatch.sorted,
          s"replay drift: ${replayed.length} vs ${lastBatch.length}")
        survivors.toSeq.toDF("doc_id").orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id FROM (
          SELECT doc_id, ROW_NUMBER() OVER (
            PARTITION BY md5(text) ORDER BY doc_id) AS rn
          FROM documents) WHERE rn = 1 ORDER BY doc_id""")),

    // TF-IDF relevance ranking: top docs for one term by tf·ln(N/df) —
    // the Lucene scoring role over the same postings. r6 on both sides
    // absorbs libm log ulp differences; unique doc_id breaks rank ties.
    Q("q_text_tfidf",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // per-occurrence postings (invertedTextIndex dedups tokens; tf
        // needs every occurrence)
        val full = docs.select(col("doc_id"),
          explode(TA.tokens(col("text"))).as("token"))
        HybridTable.tfIdf(full, "doc_id", docs.count())
          .filter(col("token") === "vector")
          .select(col("doc_id"), Par.r6(col("tfidf")).as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(20)
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, unnest(${toksSql("text")}) AS token
          FROM documents)
        SELECT doc_id, ROUND(tf * ln(
            (SELECT COUNT(*) FROM documents) / df), 6) AS score
        FROM (SELECT doc_id, token, COUNT(*) AS tf FROM toks
              WHERE token = 'vector' GROUP BY doc_id, token) tf_t
        JOIN (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks
              GROUP BY token) df_t USING (token)
        ORDER BY score DESC, doc_id LIMIT 20""")),

    // BM25 relevance (the ranking Lucene runs behind the reference's text
    // index): Lucene-variant IDF + doc-length-normalized tf. Oracle replays
    // the exact arithmetic (same operation order) in DuckDB.
    Q("q_text_bm25",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val full = docs.select(col("doc_id"),
          explode(TA.tokens(col("text"))).as("token"))
        HybridTable.bm25(full, "doc_id", docs.count())
          .filter(col("token") === "vector")
          .select(col("doc_id"), Par.r6(col("bm25")).as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(20)
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, unnest(${toksSql("text")}) AS token
          FROM documents),
        tf_t AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
          WHERE token = 'vector' GROUP BY doc_id, token),
        dl_t AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        df_t AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks
          GROUP BY token),
        st AS (SELECT AVG(dl) AS avgdl FROM dl_t),
        n_t AS (SELECT COUNT(*) AS n FROM documents)
        SELECT doc_id, ROUND(
            ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5)) *
            (tf * (1.2 + 1.0)) /
            (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)), 6) AS score
        FROM tf_t JOIN dl_t USING (doc_id) JOIN df_t USING (token), st, n_t
        ORDER BY score DESC, doc_id LIMIT 20""")),

    // Hybrid retrieval: BM25('vector','hash') fused with cosine against
    // embedding 0 by reciprocal-rank fusion (rrf = Σ 1/(60+rank), only
    // RANKS enter — scale-free across the two rankers). Both ranked
    // lists cut at 50 via distributed top-n; two query terms keep the
    // per-doc BM25 sum a 2-operand add (commutative — bit-stable across
    // engines). Oracle replays BM25, cosine, both rankings, and the
    // full-outer fusion.
    Q("q_hybrid_rrf",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qvec = emb.filter(col("vec_id") === 0)
          .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
        graft.operators.Retrieval.hybridTopK(
          Tables.documents(s, d),
          emb.withColumnRenamed("vec_id", "doc_id"),
          "doc_id", "text", "embedding",
          queryTerms = Seq("vector", "hash"), queryVec = qvec,
          k = 20, k0 = 60, nPerRanker = 50)
          .orderBy(col("rank"))
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, unnest(${toksSql("text")}) AS token
          FROM documents),
        tf_t AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
          WHERE token IN ('vector', 'hash') GROUP BY doc_id, token),
        dl_t AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        df_t AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks
          GROUP BY token),
        st AS (SELECT AVG(dl) AS avgdl FROM dl_t),
        n_t AS (SELECT COUNT(*) AS n FROM documents),
        lex0 AS (SELECT doc_id, ROUND(SUM(
            ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5)) *
            (tf * (1.2 + 1.0)) /
            (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))), 6) AS score
          FROM tf_t JOIN dl_t USING (doc_id) JOIN df_t USING (token), st, n_t
          GROUP BY doc_id),
        lex AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
            ORDER BY score DESC, doc_id) AS INT) AS lex_rank
          FROM (SELECT * FROM lex0 ORDER BY score DESC, doc_id LIMIT 50)),
        dense0 AS (SELECT a.vec_id AS doc_id, ROUND($qaCosSql, 6) AS cos
          FROM embeddings a,
            (SELECT embedding FROM embeddings WHERE vec_id = 0) q),
        dense AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
            ORDER BY cos DESC, doc_id) AS INT) AS dense_rank
          FROM (SELECT * FROM dense0 ORDER BY cos DESC, doc_id LIMIT 50)),
        fused AS (SELECT COALESCE(l.doc_id, de.doc_id) AS doc_id,
            l.lex_rank, de.dense_rank,
            COALESCE(1.0 / (60 + l.lex_rank), 0.0) +
            COALESCE(1.0 / (60 + de.dense_rank), 0.0) AS rrf
          FROM lex l FULL OUTER JOIN dense de ON l.doc_id = de.doc_id)
        SELECT * FROM (SELECT doc_id, lex_rank, dense_rank, rrf,
            CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INT)
              AS "rank"
          FROM fused) WHERE "rank" <= 20 ORDER BY 5""")),

    // BATCH hybrid retrieval (the service shape): three queries — each a
    // term list + the embedding of vec_id = query_id — fused in ONE pass
    // per ranker over shared corpus statistics, per-query window-ranked.
    // The oracle replays BM25, cosine, both per-query rank cuts, and the
    // per-query RRF fusion for every query at once.
    Q("q_hybrid_rrf_batch",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val queries = Seq(
          0L -> Seq("vector", "hash"),
          1L -> Seq("index", "tree"),
          2L -> Seq("data", "query")).toDF("query_id", "terms")
          .join(emb.select(col("vec_id").as("query_id"),
            col("embedding").as("qvec")), "query_id")
        graft.operators.Retrieval.hybridTopKBatch(
          Tables.documents(s, d),
          emb.withColumnRenamed("vec_id", "doc_id"),
          "doc_id", "text", "embedding", queries,
          k = 10, k0 = 60, nPerRanker = 50)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH qs AS (SELECT CAST(query_id AS BIGINT) AS query_id,
            terms FROM (VALUES
            (0, ['vector', 'hash']), (1, ['index', 'tree']),
            (2, ['data', 'query'])) AS t(query_id, terms)),
        qt AS (SELECT query_id, unnest(terms) AS token FROM qs),
        toks AS (
          SELECT doc_id, unnest(${toksSql("text")}) AS token
          FROM documents),
        tf_t AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
          WHERE token IN (SELECT token FROM qt) GROUP BY doc_id, token),
        dl_t AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        df_t AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks
          GROUP BY token),
        st AS (SELECT AVG(dl) AS avgdl FROM dl_t),
        n_t AS (SELECT COUNT(*) AS n FROM documents),
        lex0 AS (SELECT qt.query_id, tf_t.doc_id, ROUND(SUM(
            ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5)) *
            (tf * (1.2 + 1.0)) /
            (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))), 6) AS score
          FROM qt JOIN tf_t USING (token) JOIN dl_t USING (doc_id)
            JOIN df_t USING (token), st, n_t
          GROUP BY 1, 2),
        lex AS (SELECT query_id, doc_id, lex_rank FROM (
            SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT)
              AS lex_rank FROM lex0)
          WHERE lex_rank <= 50),
        dense0 AS (SELECT q.query_id, a.vec_id AS doc_id,
            ROUND(${cosSql("q.qv", "a.embedding")}, 6) AS cos
          FROM embeddings a, (SELECT qs.query_id, e.embedding AS qv
            FROM qs JOIN embeddings e ON e.vec_id = qs.query_id) q),
        dense AS (SELECT query_id, doc_id, dense_rank FROM (
            SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY cos DESC, doc_id) AS INT)
              AS dense_rank FROM dense0)
          WHERE dense_rank <= 50),
        fused AS (SELECT
            COALESCE(l.query_id, de.query_id) AS query_id,
            COALESCE(l.doc_id, de.doc_id) AS doc_id,
            l.lex_rank, de.dense_rank,
            COALESCE(1.0 / (60 + l.lex_rank), 0.0) +
            COALESCE(1.0 / (60 + de.dense_rank), 0.0) AS rrf
          FROM lex l FULL OUTER JOIN dense de
            ON l.query_id = de.query_id AND l.doc_id = de.doc_id)
        SELECT * FROM (SELECT query_id, doc_id, lex_rank, dense_rank, rrf,
            CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY rrf DESC, doc_id) AS INT) AS "rank"
          FROM fused) WHERE "rank" <= 10 ORDER BY query_id, "rank"""")),

    // IVF-pruned batch hybrid (the 100 TB dense tier): same three
    // queries, but each query's dense candidates come only from its 2
    // nearest of 8 seeded coarse cells — the oracle replays cell
    // assignment (scaled-long argmin, ties to lowest cell), probe
    // choice, the pruned cosine ranking, and the per-query fusion.
    Q("q_hybrid_rrf_batch_ivf",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val queries = Seq(
          0L -> Seq("vector", "hash"),
          1L -> Seq("index", "tree"),
          2L -> Seq("data", "query")).toDF("query_id", "terms")
          .join(emb.select(col("vec_id").as("query_id"),
            col("embedding").as("qvec")), "query_id")
        val cells = Similarity.ivfCellsSeeded(emb, "vec_id", "embedding", 8)
        graft.operators.Retrieval.hybridTopKBatchIvf(
          Tables.documents(s, d),
          emb.withColumnRenamed("vec_id", "doc_id"),
          "doc_id", "text", "embedding", queries, cells, nProbe = 2,
          k = 10, k0 = 60, nPerRanker = 50)
          .orderBy(col("query_id"), col("rank"))
      },
      Some {
        def dotS(x: String, y: String) =
          s"""list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)
              for i in generate_series(1, len($x))])"""
        def du(x: String, y: String) =
          s"""CAST(FLOOR(ROUND(${dotS(x, x)} - 2 * ${dotS(x, y)} +
            ${dotS(y, y)}, 6) * 1e6 + 0.5) AS BIGINT)"""
        s"""WITH qs AS (SELECT CAST(query_id AS BIGINT) AS query_id,
            terms FROM (VALUES
            (0, ['vector', 'hash']), (1, ['index', 'tree']),
            (2, ['data', 'query'])) AS t(query_id, terms)),
        qt AS (SELECT query_id, unnest(terms) AS token FROM qs),
        toks AS (
          SELECT doc_id, unnest(${toksSql("text")}) AS token
          FROM documents),
        tf_t AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
          WHERE token IN (SELECT token FROM qt) GROUP BY doc_id, token),
        dl_t AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        df_t AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks
          GROUP BY token),
        st AS (SELECT AVG(dl) AS avgdl FROM dl_t),
        n_t AS (SELECT COUNT(*) AS n FROM documents),
        lex0 AS (SELECT qt.query_id, tf_t.doc_id, ROUND(SUM(
            ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5)) *
            (tf * (1.2 + 1.0)) /
            (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))), 6) AS score
          FROM qt JOIN tf_t USING (token) JOIN dl_t USING (doc_id)
            JOIN df_t USING (token), st, n_t
          GROUP BY 1, 2),
        lex AS (SELECT query_id, doc_id, lex_rank FROM (
            SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT)
              AS lex_rank FROM lex0)
          WHERE lex_rank <= 50),
        cs AS (SELECT embedding AS cv, ROW_NUMBER() OVER (ORDER BY vec_id)
            - 1 AS c
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
        cd AS (SELECT vec_id, c, ${du("x", "cv")} AS du
          FROM (SELECT e.vec_id, s.c, e.embedding AS x, s.cv
            FROM embeddings e CROSS JOIN cs s)),
        cellof AS (SELECT vec_id, c AS cell FROM (
            SELECT vec_id, c, ROW_NUMBER() OVER (
              PARTITION BY vec_id ORDER BY du, c) AS rk FROM cd)
          WHERE rk = 1),
        probes AS (SELECT vec_id AS query_id, c AS cell FROM (
            SELECT vec_id, c, ROW_NUMBER() OVER (
              PARTITION BY vec_id ORDER BY du, c) AS rk
            FROM cd WHERE vec_id < 3)
          WHERE rk <= 2),
        dense0 AS (SELECT p.query_id, a.vec_id AS doc_id,
            ROUND(${cosSql("qe.embedding", "a.embedding")}, 6) AS cos
          FROM probes p
          JOIN cellof cl ON cl.cell = p.cell
          JOIN embeddings a ON a.vec_id = cl.vec_id
          JOIN embeddings qe ON qe.vec_id = p.query_id),
        dense AS (SELECT query_id, doc_id, dense_rank FROM (
            SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY cos DESC, doc_id) AS INT)
              AS dense_rank FROM dense0)
          WHERE dense_rank <= 50),
        fused AS (SELECT
            COALESCE(l.query_id, de.query_id) AS query_id,
            COALESCE(l.doc_id, de.doc_id) AS doc_id,
            l.lex_rank, de.dense_rank,
            COALESCE(1.0 / (60 + l.lex_rank), 0.0) +
            COALESCE(1.0 / (60 + de.dense_rank), 0.0) AS rrf
          FROM lex l FULL OUTER JOIN dense de
            ON l.query_id = de.query_id AND l.doc_id = de.doc_id)
        SELECT * FROM (SELECT query_id, doc_id, lex_rank, dense_rank, rrf,
            CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY rrf DESC, doc_id) AS INT) AS "rank"
          FROM fused) WHERE "rank" <= 10 ORDER BY query_id, "rank""""
      }),

    // Batch hybrid over the PERSISTED indexes — the steady-state service:
    // BM25 runs off the positional text index (occurrence rows, no
    // document text read) and the dense tier off the cell-partitioned
    // persisted IVF assignment; setup builds both indexes once per
    // corpus dir. nDocs comes from the text index itself
    // (COUNT(DISTINCT doc)), so the gate is self-contained on index
    // files; the oracle replays exactly that.
    Q("q_hybrid_rrf_indexed",
      (s, d) => {
        import s.implicits._
        ensureHybridIndexes(s, d)
        val root = hybIdxRoot(d)
        val postings = graft.sources.TextIndexLifecycle
          .load(s, root, "text", "doc_id")
        // the probe centroids come from the loaded index itself — the
        // gate no longer recomputes cells at query time, so probe and
        // assignment cannot drift (round-12 ADVICE fix)
        val ivf = Similarity.loadIvfIndex(s, s"$root/ivf")
        val emb = Tables.embeddings(s, d)
        val queries = Seq(
          0L -> Seq("vector", "hash"),
          1L -> Seq("index", "tree"),
          2L -> Seq("data", "query")).toDF("query_id", "terms")
          .join(emb.select(col("vec_id").as("query_id"),
            col("embedding").as("qvec")), "query_id")
        graft.operators.Retrieval.hybridTopKBatchIndexed(
          postings, ivf, "doc_id", "embedding", queries,
          nProbe = 2, k = 10, k0 = 60, nPerRanker = 50)
          .orderBy(col("query_id"), col("rank"))
      },
      Some {
        def dotS(x: String, y: String) =
          s"""list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)
              for i in generate_series(1, len($x))])"""
        def du(x: String, y: String) =
          s"""CAST(FLOOR(ROUND(${dotS(x, x)} - 2 * ${dotS(x, y)} +
            ${dotS(y, y)}, 6) * 1e6 + 0.5) AS BIGINT)"""
        s"""WITH qs AS (SELECT CAST(query_id AS BIGINT) AS query_id,
            terms FROM (VALUES
            (0, ['vector', 'hash']), (1, ['index', 'tree']),
            (2, ['data', 'query'])) AS t(query_id, terms)),
        qt AS (SELECT query_id, unnest(terms) AS token FROM qs),
        toks AS (
          SELECT doc_id, unnest(${toksSql("text")}) AS token
          FROM documents),
        tf_t AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
          WHERE token IN (SELECT token FROM qt) GROUP BY doc_id, token),
        dl_t AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        df_t AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks
          GROUP BY token),
        st AS (SELECT AVG(dl) AS avgdl FROM dl_t),
        n_t AS (SELECT COUNT(DISTINCT doc_id) AS n FROM toks),
        lex0 AS (SELECT qt.query_id, tf_t.doc_id, ROUND(SUM(
            ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5)) *
            (tf * (1.2 + 1.0)) /
            (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))), 6) AS score
          FROM qt JOIN tf_t USING (token) JOIN dl_t USING (doc_id)
            JOIN df_t USING (token), st, n_t
          GROUP BY 1, 2),
        lex AS (SELECT query_id, doc_id, lex_rank FROM (
            SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT)
              AS lex_rank FROM lex0)
          WHERE lex_rank <= 50),
        cs AS (SELECT embedding AS cv, ROW_NUMBER() OVER (ORDER BY vec_id)
            - 1 AS c
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
        cd AS (SELECT vec_id, c, ${du("x", "cv")} AS du
          FROM (SELECT e.vec_id, s.c, e.embedding AS x, s.cv
            FROM embeddings e CROSS JOIN cs s)),
        cellof AS (SELECT vec_id, c AS cell FROM (
            SELECT vec_id, c, ROW_NUMBER() OVER (
              PARTITION BY vec_id ORDER BY du, c) AS rk FROM cd)
          WHERE rk = 1),
        probes AS (SELECT vec_id AS query_id, c AS cell FROM (
            SELECT vec_id, c, ROW_NUMBER() OVER (
              PARTITION BY vec_id ORDER BY du, c) AS rk
            FROM cd WHERE vec_id < 3)
          WHERE rk <= 2),
        dense0 AS (SELECT p.query_id, a.vec_id AS doc_id,
            ROUND(${cosSql("qe.embedding", "a.embedding")}, 6) AS cos
          FROM probes p
          JOIN cellof cl ON cl.cell = p.cell
          JOIN embeddings a ON a.vec_id = cl.vec_id
          JOIN embeddings qe ON qe.vec_id = p.query_id),
        dense AS (SELECT query_id, doc_id, dense_rank FROM (
            SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY cos DESC, doc_id) AS INT)
              AS dense_rank FROM dense0)
          WHERE dense_rank <= 50),
        fused AS (SELECT
            COALESCE(l.query_id, de.query_id) AS query_id,
            COALESCE(l.doc_id, de.doc_id) AS doc_id,
            l.lex_rank, de.dense_rank,
            COALESCE(1.0 / (60 + l.lex_rank), 0.0) +
            COALESCE(1.0 / (60 + de.dense_rank), 0.0) AS rrf
          FROM lex l FULL OUTER JOIN dense de
            ON l.query_id = de.query_id AND l.doc_id = de.doc_id)
        SELECT * FROM (SELECT query_id, doc_id, lex_rank, dense_rank, rrf,
            CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY rrf DESC, doc_id) AS INT) AS "rank"
          FROM fused) WHERE "rank" <= 10 ORDER BY query_id, "rank""""
      },
      setup = Some((s, d) => buildHybridIndexes(s, d))),

    // Corpus vocabulary: top-K tokens by occurrence count, deterministic
    // ties (count desc, token asc), with doc frequency and 1-based rank —
    // the count-and-rank step before BPE merges / embedding-table sizing.
    Q("q_vocab_topk",
      (s, d) => graft.operators.Vocab.build(
          Tables.documents(s, d), "text", "doc_id", k = 50)
        .orderBy(col("rank")),
      Some(s"""WITH toks AS (
          SELECT doc_id, unnest(${toksSql("text")}) AS token
          FROM documents),
        c AS (SELECT token, COUNT(*) AS n_occurrences,
            COUNT(DISTINCT doc_id) AS n_docs
          FROM toks GROUP BY token)
        SELECT token, n_occurrences, n_docs,
          CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token)
            AS INT) AS rank
        FROM c ORDER BY n_occurrences DESC, token LIMIT 50""")),

    // Vocabulary coverage: per-doc OOV fraction against the top-50 vocab
    // (the post-sizing coverage check). Vocab build replayed (count desc,
    // token asc), coverage counts bit-checked, fraction to 6dp.
    Q("q_vocab_coverage",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val vocab = graft.operators.Vocab.build(docs, "text", "doc_id",
          k = 50)
        graft.operators.Vocab.oovFraction(docs, "text", "doc_id", vocab)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        toks AS (SELECT doc_id, unnest(tk) AS token FROM tk),
        voc AS (SELECT token FROM (
          SELECT token, COUNT(*) AS n FROM toks GROUP BY token
          ORDER BY n DESC, token LIMIT 50)),
        agg AS (SELECT t.doc_id, COUNT(*) AS n_tokens,
            SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
          FROM toks t LEFT JOIN voc v ON t.token = v.token
          GROUP BY t.doc_id)
        SELECT d.doc_id,
          CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
          CAST(COALESCE(a.n_oov, 0) AS BIGINT) AS n_oov,
          ROUND(CAST(a.n_oov AS DOUBLE) / CAST(a.n_tokens AS DOUBLE), 6)
            AS oov_frac
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        ORDER BY d.doc_id""")),

    // BPE merge learning (Sennrich 2016): 3 rounds of frequency-weighted
    // pair counting + greedy merge over the distinct-word frame. The
    // oracle UNROLLS all three rounds in SQL — same pipe-encoded symbol
    // strings, same overlapping pair counts, same argmax tie-break, same
    // leftmost-non-overlapping replace() — so the hash gates the whole
    // iterative procedure, not just one round.
    Q("q_bpe_merges",
      (s, d) => graft.operators.Vocab.bpeMerges(
        Tables.documents(s, d), "text", n = 3),
      Some {
        s"""WITH w AS (
          SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(${toksSql("text")}) AS word FROM documents)
          WHERE regexp_matches(word, '^[a-z0-9]+$$')
          GROUP BY word),
        e0 AS (SELECT rtrim(regexp_replace(word, '(.)', '|\\1| ', 'g')) AS e,
          freq FROM w),
        ${bpeRoundSql(1, bCols = "pat, cnt")}, ${bpeRoundSql(2, bCols = "pat, cnt")}, ${bpeRoundSql(3, bCols = "pat, cnt")}
        SELECT CAST(round AS INT) AS round,
          trim(string_split(pat, ' ')[1], '|') AS lhs,
          trim(string_split(pat, ' ')[2], '|') AS rhs,
          CAST(cnt AS BIGINT) AS cnt
        FROM (
          SELECT 1 AS round, pat, cnt FROM b1
          UNION ALL SELECT 2, pat, cnt FROM b2
          UNION ALL SELECT 3, pat, cnt FROM b3)"""
      }),

    // The driver-local exact training tier (one distributed word-count
    // job + the incremental-pair-count loop — the 10k-merge production
    // path) gated against the SAME 3-round DuckDB replay, pinning both
    // tiers to identical merges/counts/tie-breaks.
    Q("q_bpe_merges_fast",
      (s, d) => graft.operators.Vocab.bpeMergesLocal(
        Tables.documents(s, d), "text", n = 3),
      Some {
        s"""WITH w AS (
          SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(${toksSql("text")}) AS word FROM documents)
          WHERE regexp_matches(word, '^[a-z0-9]+$$')
          GROUP BY word),
        e0 AS (SELECT rtrim(regexp_replace(word, '(.)', '|\\1| ', 'g')) AS e,
          freq FROM w),
        ${bpeRoundSql(1, bCols = "pat, cnt")}, ${bpeRoundSql(2, bCols = "pat, cnt")}, ${bpeRoundSql(3, bCols = "pat, cnt")}
        SELECT CAST(round AS INT) AS round,
          trim(string_split(pat, ' ')[1], '|') AS lhs,
          trim(string_split(pat, ' ')[2], '|') AS rhs,
          CAST(cnt AS BIGINT) AS cnt
        FROM (
          SELECT 1 AS round, pat, cnt FROM b1
          UNION ALL SELECT 2, pat, cnt FROM b2
          UNION ALL SELECT 3, pat, cnt FROM b3)"""
      }),

    // Tokenizer DATA CARD (r17): fertility (tokens/word) and
    // bytes/token per source slice through the learned 3-round merges
    // — the numbers a tokenizer choice is judged by. The oracle
    // re-learns the merges, re-segments every word occurrence with the
    // replace-chain replay (same convention as q_chat_token_spans),
    // and re-sums per source; the ratio divisions are one IEEE divide
    // of bit-checked longs on both engines.
    Q("q_vocab_fertility",
      (s, d) => graft.operators.Vocab.fertility(
          Tables.documents(s, d).select(col("source"), col("text")),
          "text", "source", roundtripMerges(s, d))
        .orderBy(col("source")),
      Some {
        s"""WITH w AS (
          SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(${toksSql("text")}) AS word FROM documents)
          WHERE regexp_matches(word, '^[a-z0-9]+$$')
          GROUP BY word),
        e0 AS (SELECT rtrim(regexp_replace(word, '(.)', '|\\1| ', 'g'))
          AS e, freq FROM w),
        ${bpeRoundSql(1)}, ${bpeRoundSql(2)}, ${bpeRoundSql(3)},
        d0 AS (SELECT source, text,
          CAST(strlen(text) AS BIGINT) AS nb FROM documents),
        vk AS (SELECT source, unnest(${toksSql("text")}) AS wt FROM d0),
        vsg AS (SELECT source,
          CASE WHEN regexp_matches(wt, '^[a-z0-9]+$$') THEN
            len(string_split(
              replace(replace(replace(
                rtrim(regexp_replace(wt, '(.)', '|\\1| ', 'g')),
                b1.pat, replace(b1.pat, '| |', '')),
                b2.pat, replace(b2.pat, '| |', '')),
                b3.pat, replace(b3.pat, '| |', '')), ' '))
          ELSE 1 END AS ntk
          FROM vk, b1, b2, b3),
        va AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
          CAST(SUM(ntk) AS BIGINT) AS n_tokens
          FROM vsg GROUP BY source),
        vd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(nb) AS BIGINT) AS n_bytes
          FROM d0 GROUP BY source)
        SELECT v.source, vd.n_docs, v.n_words, v.n_tokens, vd.n_bytes,
          ROUND(CAST(v.n_tokens AS DOUBLE) / v.n_words, 6)
            AS fertility,
          ROUND(CAST(vd.n_bytes AS DOUBLE) / v.n_tokens, 6)
            AS bytes_per_token
        FROM va v JOIN vd USING (source) ORDER BY source"""
      },
      setup = Some((s, d) => roundtripMerges(s, d))),

    // Skip-gram co-occurrence (word2vec/GloVe prep): ordered pairs within
    // window 2, raw counts + exact scaled 1/distance weights; top 100 by
    // (cnt desc, pair) — deterministic total order. Oracle replays the
    // window alignment and integer weight sums bit-for-bit.
    Q("q_cooc_counts",
      (s, d) => graft.operators.Vocab.coocCounts(
          Tables.documents(s, d), "text", window = 2)
        .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(100),
      Some(s"""WITH tk AS (
          SELECT ${toksSql("text")} AS tk FROM documents),
        pr AS (SELECT tk[i] AS w1, tk[i+d] AS w2, d FROM (
            SELECT tk, i, dd.d FROM (
              SELECT tk, unnest(generate_series(1, greatest(len(tk), 1)))
                AS i FROM tk),
              (SELECT unnest(generate_series(1, 2)) AS d) dd)
          WHERE i + d <= len(tk)),
        pb AS (SELECT w1, w2, d FROM pr
          UNION ALL SELECT w2, w1, d FROM pr)
        SELECT w1, w2, COUNT(*) AS cnt,
          CAST(SUM(CAST(ROUND(1e6 / d) AS BIGINT)) AS BIGINT) AS wcnt_u
        FROM pb GROUP BY w1, w2
        ORDER BY cnt DESC, w1, w2 LIMIT 100""")),

    // DoReMi domain reweighting (r17 — Xie et al. 2023): per-domain
    // excess loss (proxy − reference, clamped at 0, 6dp from exact
    // decimal sums) drives 3 exponentiated-gradient rounds with
    // uniform smoothing; per-doc losses synthesized as exact binary
    // QUARTERS ((id·7)%16/4, (id·3)%16/4) so the decimal sums are
    // lossless on both engines. The oracle unrolls all three update
    // rounds with the SAME ordered running normalization sum the
    // driver loop uses (sorted-domain sequential adds ≡ the window
    // running sum's last row) and the same (1.0 − 0.01) expression —
    // never the 0.99 literal, whose parse could differ by an ulp.
    Q("q_doremi",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("source"),
          (((col("doc_id") * 7) % 16).cast("double") / 4.0).as("p"),
          (((col("doc_id") * 3) % 16).cast("double") / 4.0).as("r"))
        graft.operators.Sampling.doremiWeights(docs, "source",
            "p", "r", eta = 1.0, rounds = 3, smoothing = 0.01)
          .orderBy(col("domain"))
      },
      Some {
        def upd(i: Int): String = {
          val prev = s"dr${i - 1}"
          s"""da$i AS (SELECT *, w * exp(1.0 * excess) AS wp
              FROM $prev),
            db$i AS (SELECT *, SUM(wp) OVER (ORDER BY domain
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM da$i),
            dr$i AS (SELECT domain, n_docs, excess,
              (1.0 - 0.01) * wp / MAX(cum) OVER ()
                + 0.01 / (COUNT(*) OVER ()) AS w
              FROM db$i)"""
        }
        s"""WITH dsc AS (SELECT source AS domain,
            CAST((doc_id * 7) % 16 AS DOUBLE) / 4.0 AS p,
            CAST((doc_id * 3) % 16 AS DOUBLE) / 4.0 AS r
          FROM documents),
        dper AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
            GREATEST(0.0, ROUND(CAST(
              SUM(CAST(p AS DECIMAL(18,6)))
              - SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE)
              / COUNT(*), 6)) AS excess
          FROM dsc GROUP BY 1),
        dr0 AS (SELECT domain, n_docs, excess,
          1.0 / (SELECT COUNT(*) FROM dper) AS w FROM dper),
        ${upd(1)}, ${upd(2)}, ${upd(3)}
        SELECT domain, n_docs, excess, ROUND(w, 6) AS weight
        FROM dr3 ORDER BY domain"""
      }),

    // DoReMi → epoch-plan capstone (r17): the learned domain weights
    // feed the data-constrained epoch planner directly — the full
    // "measure excess loss → reweight → allocate the token budget"
    // mixture pipeline in one gate. The oracle replays BOTH halves:
    // the three exponentiated-gradient rounds and the exact-decimal
    // budget/cap arithmetic over the same weights.
    Q("q_doremi_plan",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val scored = docs.select(col("source"),
          (((col("doc_id") * 7) % 16).cast("double") / 4.0).as("p"),
          (((col("doc_id") * 3) % 16).cast("double") / 4.0).as("r"))
        val w = graft.operators.Sampling.doremiWeights(scored,
          "source", "p", "r", eta = 1.0, rounds = 3, smoothing = 0.01)
        val per = docs.groupBy(col("source"))
          .agg(sum(TA.tokenCount(col("text"))).cast("long")
            .as("avail_tokens"))
          .join(w.select(col("domain").as("source"), col("weight")),
            "source")
        graft.operators.Sampling.epochPlan(per, "source",
            "avail_tokens", "weight", budget = 1000000L,
            maxEpochs = new java.math.BigDecimal("4.0"))
          .select(col("source"), col("avail_tokens"),
            col("weight").cast("double").as("weight"),
            col("target_tokens"), col("tokens_realized"),
            col("epochs"), col("deficit"))
          .orderBy(col("source"))
      },
      Some {
        def upd(i: Int): String = {
          val prev = s"pr${i - 1}"
          s"""pa$i AS (SELECT *, w * exp(1.0 * excess) AS wp
              FROM $prev),
            pb$i AS (SELECT *, SUM(wp) OVER (ORDER BY domain
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM pa$i),
            pr$i AS (SELECT domain, excess,
              (1.0 - 0.01) * wp / MAX(cum) OVER ()
                + 0.01 / (COUNT(*) OVER ()) AS w
              FROM pb$i)"""
        }
        s"""WITH psc AS (SELECT source AS domain,
            CAST((doc_id * 7) % 16 AS DOUBLE) / 4.0 AS p,
            CAST((doc_id * 3) % 16 AS DOUBLE) / 4.0 AS r
          FROM documents),
        pper AS (SELECT domain,
            GREATEST(0.0, ROUND(CAST(
              SUM(CAST(p AS DECIMAL(18,6)))
              - SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE)
              / COUNT(*), 6)) AS excess
          FROM psc GROUP BY 1),
        pr0 AS (SELECT domain, excess,
          1.0 / (SELECT COUNT(*) FROM pper) AS w FROM pper),
        ${upd(1)}, ${upd(2)}, ${upd(3)},
        pw AS (SELECT domain AS source, ROUND(w, 6) AS weight
          FROM pr3),
        pav AS (SELECT source,
            CAST(SUM(len(${toksSql("text")})) AS BIGINT)
              AS avail_tokens
          FROM documents GROUP BY source),
        pp AS (SELECT pav.source, avail_tokens, weight,
            CAST(floor(CAST(weight AS DECIMAL(18,6)) * 1000000)
              AS BIGINT) AS target_tokens,
            CAST(floor(CAST(4.0 AS DECIMAL(18,6)) * avail_tokens)
              AS BIGINT) AS cap_tokens
          FROM pav JOIN pw ON pw.source = pav.source)
        SELECT source, avail_tokens, weight, target_tokens,
          LEAST(target_tokens, cap_tokens) AS tokens_realized,
          ROUND(CAST(LEAST(target_tokens, cap_tokens) AS DOUBLE) /
            avail_tokens, 6) AS epochs,
          target_tokens - LEAST(target_tokens, cap_tokens) AS deficit
        FROM pp ORDER BY source"""
      }),

    // Unigram-distribution DRIFT between two corpus snapshots (r17 —
    // continuous-ingest monitoring: "did this week's crawl change the
    // token distribution?"): add-one-smoothed unigram KL(A‖B) over the
    // union vocabulary, every per-token ln a 1e6-scaled long (the
    // Classifier/LmQuality exact-integer idiom) so the numerator sum
    // is order-free and bit-checked; snapshots = even/odd doc ids.
    Q("q_unigram_drift",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Curation.unigramDrift(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1), "text")
      },
      Some {
        def u6(x: String) =
          s"CAST(ROUND(ROUND(LN($x), 6) * 1e6) AS BIGINT)"
        s"""WITH ca AS (SELECT token, COUNT(*) AS c_a FROM (
            SELECT unnest(${toksSql("text")}) AS token FROM documents
            WHERE doc_id % 2 = 0) GROUP BY 1),
          cb AS (SELECT token, COUNT(*) AS c_b FROM (
            SELECT unnest(${toksSql("text")}) AS token FROM documents
            WHERE doc_id % 2 = 1) GROUP BY 1),
          j AS (SELECT COALESCE(ca.token, cb.token) AS token,
              COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
            FROM ca FULL OUTER JOIN cb ON ca.token = cb.token),
          sc AS (SELECT CAST(SUM(c_a) AS BIGINT) AS na,
              CAST(SUM(c_b) AS BIGINT) AS nb,
              CAST(COUNT(*) AS BIGINT) AS v FROM j),
          tm AS (SELECT c_a, c_b,
              (c_a + 1) * (
                ${u6("CAST(c_a + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)")}
                - ${u6("CAST(c_b + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)")})
              AS term_u
            FROM j CROSS JOIN sc)
          SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
            CAST(SUM(c_b) AS BIGINT) AS n_b,
            CAST(COUNT(*) AS BIGINT) AS v_union,
            CAST(SUM(term_u) AS BIGINT) AS kl_u,
            ROUND(CAST(SUM(term_u) AS DOUBLE) /
              (CAST(SUM(c_a) + COUNT(*) AS DOUBLE) * 1e6), 6) AS kl
          FROM tm"""
      }),

    // The drift report's "what changed" list: top 10 tokens by
    // |exact KL term| — TakeOrderedAndProject over the same terms
    // frame, never a global sort.
    Q("q_drift_tokens",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Curation.unigramDriftTerms(
            docs.filter(col("doc_id") % 2 === 0),
            docs.filter(col("doc_id") % 2 === 1), "text")
          .orderBy(abs(col("term_u")).desc, col("token"))
          .limit(10)
      },
      Some {
        def u6(x: String) =
          s"CAST(ROUND(ROUND(LN($x), 6) * 1e6) AS BIGINT)"
        s"""WITH ca AS (SELECT token, COUNT(*) AS c_a FROM (
            SELECT unnest(${toksSql("text")}) AS token FROM documents
            WHERE doc_id % 2 = 0) GROUP BY 1),
          cb AS (SELECT token, COUNT(*) AS c_b FROM (
            SELECT unnest(${toksSql("text")}) AS token FROM documents
            WHERE doc_id % 2 = 1) GROUP BY 1),
          j AS (SELECT COALESCE(ca.token, cb.token) AS token,
              COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
            FROM ca FULL OUTER JOIN cb ON ca.token = cb.token),
          sc AS (SELECT CAST(SUM(c_a) AS BIGINT) AS na,
              CAST(SUM(c_b) AS BIGINT) AS nb,
              CAST(COUNT(*) AS BIGINT) AS v FROM j)
          SELECT token, c_a, c_b,
            (c_a + 1) * (
              ${u6("CAST(c_a + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)")}
              - ${u6("CAST(c_b + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)")})
            AS term_u
          FROM j CROSS JOIN sc
          ORDER BY abs((c_a + 1) * (
              ${u6("CAST(c_a + 1 AS DOUBLE) / CAST(na + v AS DOUBLE)")}
              - ${u6("CAST(c_b + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)")}))
            DESC, token
          LIMIT 10"""
      }),

    // Bigram LM cross-entropy (CCNet-style quality filter): self-trained
    // add-1 bigram model, per-doc −mean ln p. Each bigram's ln rides as a
    // 1e6-scaled long so the per-doc sum is integer-exact and order-free;
    // the oracle replays counts, smoothing, ln rounding, and the final
    // division — sum_u is bit-checked, xent to 6dp.
    Q("q_lm_score",
      (s, d) => graft.operators.LmQuality.lmScore(
          Tables.documents(s, d), "text", "doc_id")
        .orderBy(col("doc_id")),
      Some(s"""WITH ${lmSql("documents")}
        SELECT d.doc_id,
          COALESCE(a.n_bigrams, 0) AS n_bigrams,
          a.sum_u,
          ROUND(-(CAST(a.sum_u AS DOUBLE) /
            (CAST(a.n_bigrams AS DOUBLE) * 1e6)), 6) AS xent
        FROM documents d LEFT JOIN lmagg a ON d.doc_id = a.doc_id
        ORDER BY d.doc_id""")),

    // CCNet head/middle/tail tiers: the corpus ranked by the (already
    // bit-checked) LM cross-entropy and cut at the 1/3 and 2/3 ranks of
    // the total order (null-xent docs last, ties by id). The oracle
    // re-ranks with ROW_NUMBER over the same order and the same
    // rank·3 div n bucket arithmetic, so every doc's TIER is bit-checked.
    Q("q_lm_buckets",
      (s, d) => graft.operators.LmQuality.perplexityBuckets(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "text", "doc_id")
        .select(col("doc_id"), col("n_bigrams"), col("sum_u"),
          col("ppl_bucket"))
        .orderBy(col("doc_id")),
      Some(s"""WITH ${lmSql("documents")},
        pbsc AS (SELECT d.doc_id,
            COALESCE(a.n_bigrams, 0) AS n_bigrams, a.sum_u,
            ROUND(-(CAST(a.sum_u AS DOUBLE) /
              (CAST(a.n_bigrams AS DOUBLE) * 1e6)), 6) AS xent
          FROM documents d LEFT JOIN lmagg a ON d.doc_id = a.doc_id),
        pbrk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY
              (CASE WHEN xent IS NULL THEN 1 ELSE 0 END),
              COALESCE(xent, 0.0), doc_id) AS r,
            (SELECT COUNT(*) FROM pbsc) AS n
          FROM pbsc)
        SELECT doc_id, n_bigrams, sum_u,
          CASE ((r - 1) * 3) // n WHEN 0 THEN 'head'
            WHEN 1 THEN 'middle' ELSE 'tail' END AS ppl_bucket
        FROM pbrk ORDER BY doc_id""")),

    // DSIR-style target-likeness scoring (Xie et al. 2023): hashed
    // unigram+bigram features, add-one log-likelihood-ratio bucket
    // weights between a target subset (4 of the 20 sources) and the raw
    // corpus, per-doc occurrence-weighted sums as 1e6-scaled longs. The
    // oracle replays hashing, both count tables, smoothing, ln rounding,
    // and every doc's integer sum bit-for-bit.
    Q("q_dsir_score",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Dsir.dsirScore(docs,
          docs.filter(col("source").isin("src1", "src3", "src5", "src7")),
          "text", "doc_id", 512)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${dsirSql("documents",
        "source IN ('src1','src3','src5','src7')", 512)}
        SELECT d.doc_id, COALESCE(s.n_feats, 0) AS n_feats,
          COALESCE(s.sum_llr_u, 0) AS sum_llr_u,
          CASE WHEN s.n_feats IS NULL THEN NULL
            ELSE ROUND(CAST(s.sum_llr_u AS DOUBLE) /
              (CAST(s.n_feats AS DOUBLE) * 1e6), 6) END AS dsir_score
        FROM documents d LEFT JOIN dsirsc s ON d.doc_id = s.doc_id
        ORDER BY d.doc_id""")),

    // DSIR selection: keep the ceil(frac·n) most-target-like docs under
    // the total order (sum_llr_u DESC, doc_id) — the deterministic
    // stand-in for the paper's importance resample, ranked by the
    // distributed dense-rank (never a 1-partition window). The oracle
    // re-ranks with ROW_NUMBER over the same total order, so the
    // SURVIVOR SET is bit-checked, not just its size.
    Q("q_dsir_select",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val scored = graft.operators.Dsir.dsirScore(docs,
          docs.filter(col("source").isin("src1", "src3", "src5", "src7")),
          "text", "doc_id", 512)
        graft.operators.Dsir.dsirTopFrac(scored, "doc_id", "sum_llr_u",
            0.25)
          .select(col("doc_id"), col("n_feats"), col("sum_llr_u"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${dsirSql("documents",
        "source IN ('src1','src3','src5','src7')", 512)},
        dsc AS (SELECT d.doc_id, COALESCE(s.n_feats, 0) AS n_feats,
            COALESCE(s.sum_llr_u, 0) AS sum_llr_u
          FROM documents d LEFT JOIN dsirsc s ON d.doc_id = s.doc_id),
        drk AS (SELECT *,
            ROW_NUMBER() OVER (ORDER BY sum_llr_u DESC, doc_id) AS r,
            (SELECT COUNT(*) FROM dsc) AS n
          FROM dsc)
        SELECT doc_id, n_feats, sum_llr_u FROM drk
        WHERE r <= CEIL(0.25 * n)
        ORDER BY doc_id""")),

    // Capstone end-to-end curation (the C4/Gopher/CCNet stack composed):
    // exact dedup → Gopher rule gate → bigram-LM perplexity filter, the
    // LM trained on the docs that SURVIVE the rule gates (CCNet trains
    // its filter on in-domain survivors). The oracle chains the proven
    // dedup / gopher / LM fragments over the same staged corpora, so the
    // survivor set AND scores are bit-checked through all three stages.
    Q("q_pipeline_e2e",
      (s, d) => graft.operators.Curation.pipelineE2E(
          Tables.documents(s, d), "text", "doc_id", maxXent = 3.41,
          stopwords = corpusStops)
        .select(col("doc_id"), col("n_bigrams"), col("sum_u"), col("xent"))
        .orderBy(col("doc_id")),
      Some(s"""WITH ded AS (SELECT doc_id, text FROM (
            SELECT doc_id, text, ROW_NUMBER() OVER (
              PARTITION BY text ORDER BY doc_id) AS rn
            FROM documents) WHERE rn = 1),
        gated AS (SELECT d.doc_id, d.text FROM ded d
          JOIN (${gopherSigSql("ded")}) g ON d.doc_id = g.doc_id
          WHERE g.gopher_pass),
        ${lmSql("gated")}
        SELECT doc_id, n_bigrams, sum_u, xent FROM (
          SELECT d.doc_id,
            COALESCE(a.n_bigrams, 0) AS n_bigrams,
            a.sum_u,
            ROUND(-(CAST(a.sum_u AS DOUBLE) /
              (CAST(a.n_bigrams AS DOUBLE) * 1e6)), 6) AS xent
          FROM gated d LEFT JOIN lmagg a ON d.doc_id = a.doc_id)
        WHERE n_bigrams = 0 OR xent <= 3.41
        ORDER BY doc_id""")),

    // BPE encode: apply the 3 learned merges back to the corpus —
    // sequential greedy replace per word, non-matching tokens pass
    // through whole, per-doc subword stream reassembled in order. The
    // oracle re-learns the merges (word-carried CTE chain) and re-encodes
    // every document, so the full rebuilt subtext is bit-checked.
    // Tokenizer round-trip: encode with the end-of-word marker
    // (markWordEnd — Sennrich/GPT-2 `</w>` convention), decode by
    // concat + marker→space. The invariant is merge-table-independent
    // (BPE only re-segments, never rewrites bytes), so the oracle is
    // simply the whitespace-normalized lowercase token stream — any
    // encoder/decoder defect breaks the hash.
    // merge LEARNING is the setup phase (memoized per corpus dir) so the
    // measured number is the encode→decode round-trip it names, not the
    // distributed merge loop other gates (q_bpe_merges*) already time.
    // exprChainMax = 0 routes to the broadcast-vocab tier: encode each
    // DISTINCT word once and broadcast the map, instead of running the
    // per-character regexp chain on every token occurrence — measured
    // 5.5 s → 1.1 s on the sf0.1 corpus (the expr tier re-pays the
    // regex per occurrence; the vocab tier is the corpus-scale path,
    // falling to a join above broadcastVocabMax distinct words)
    Q("q_bpe_roundtrip",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Vocab
          .bpeEncode(docs, "text", roundtripMerges(s, d), markWordEnd = true,
            exprChainMax = 0)
          .select(col("doc_id"),
            graft.operators.Vocab.bpeDecode(col("subwords")).as("decoded"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
          array_to_string(${toksSql("text")}, ' ') AS decoded
        FROM documents ORDER BY doc_id"""),
      setup = Some((s, d) => roundtripMerges(s, d))),

    Q("q_bpe_encode",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = graft.operators.Vocab.bpeMerges(docs, "text", n = 3)
          .orderBy("round").collect().toSeq
          .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
        // broadcast-vocab tier — see q_bpe_roundtrip's measurement
        graft.operators.Vocab.bpeEncode(docs, "text", merges,
          exprChainMax = 0)
          .select(col("doc_id"),
            size(col("subwords")).as("n_subwords"),
            array_join(col("subwords"), " ").as("subtext"))
          .orderBy(col("doc_id"))
      },
      Some {
        s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        w AS (SELECT word, COUNT(*) AS freq FROM (
            SELECT unnest(tk) AS word FROM tk)
          WHERE regexp_matches(word, '^[a-z0-9]+$$')
          GROUP BY word),
        e0 AS (SELECT word,
          rtrim(regexp_replace(word, '(.)', '|\\1| ', 'g')) AS e, freq
          FROM w),
        ${bpeRoundSql(1, eCols = "word, ")}, ${bpeRoundSql(2, eCols = "word, ")}, ${bpeRoundSql(3, eCols = "word, ")},
        enc AS (SELECT word,
          [trim(t, '|') for t in string_split(e, ' ')] AS sub FROM e3),
        tok AS (SELECT doc_id, i, tk[i] AS word FROM (
            SELECT doc_id, tk,
              unnest(generate_series(1, greatest(len(tk), 1))) AS i
            FROM tk) WHERE i <= len(tk)),
        seg AS (SELECT t.doc_id, t.i,
            CASE WHEN e.word IS NULL THEN [t.word] ELSE e.sub END AS sub
          FROM tok t LEFT JOIN enc e ON t.word = e.word)
        SELECT d.doc_id,
          CAST(COALESCE(SUM(len(s.sub)), 0) AS INT) AS n_subwords,
          COALESCE(string_agg(array_to_string(s.sub, ' '), ' '
            ORDER BY s.i), '') AS subtext
        FROM documents d LEFT JOIN seg s ON d.doc_id = s.doc_id
        GROUP BY d.doc_id ORDER BY d.doc_id"""
      }),

    // BPE encode at production merge-table size: 10k deterministic
    // synthetic merges force the distinct-word tier (the merge loop runs
    // once per DISTINCT word, occurrences map through a broadcast
    // lookup — replaying 10k replaces per occurrence is the scale
    // constant this tier removes). DuckDB cannot replay 10k sequential
    // merges, so the oracle is the exact reassembly INVARIANT instead:
    // concatenating each document's subwords with no separator must
    // rebuild its token stream byte-for-byte (nothing lost, duplicated,
    // or reordered); segmentation identity across tiers is spec-gated.
    Q("q_bpe_encode_10k",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val units = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
        val m1 = for (l <- units; r <- units) yield (l, r)
        val m2 = for (l <- units; r <- units; x <- units) yield (l + r, x)
        val merges = (m1 ++ m2).take(10000)
        graft.operators.Vocab.bpeEncode(docs, "text", merges)
          .select(col("doc_id"),
            array_join(col("subwords"), "").as("rebuilt"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
          array_to_string(${toksSql("text")}, '') AS rebuilt
        FROM documents ORDER BY doc_id""")),

    // Lucene-style phrase TEXT_MATCH over the positional inverted index:
    // adjacent-position postings intersections (keyed equi-joins), never a
    // corpus scan. Oracle walks the token list for an adjacent bigram.
    Q("q_text_phrase",
      (s, d) => {
        val idx = HybridTable.positionalTextIndex(
          Tables.documents(s, d), "text", "doc_id")
        HybridTable.matchPhrase(idx, "doc_id", Seq("table", "hash"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id FROM (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents)
        WHERE len(list_filter(range(1, len(tk)),
          i -> tk[i] = 'table' AND tk[i+1] = 'hash')) > 0
        ORDER BY doc_id""")),

    // H3InclusionIndexFilterOperator analog: polygon inclusion as a cheap
    // grid/bbox prefilter (the index role — prunes most rows) + exact
    // JTS ST_Contains verification. Oracle: strict sign tests against the
    // triangle's edges (both sides exclude the boundary; the triangle's
    // lattice points are excluded by construction of the x/y mapping).
    Q("q_geo_inclusion",
      (s, d) => {
        import graft.functions.Jts
        val pts = Tables.customer(s, d).select(col("c_custkey"),
          (col("c_custkey") % 100).cast("double").as("x"),
          ((col("c_custkey") * 7) % 100).cast("double").as("y"))
        val tri = "POLYGON ((0 0, 97 13, 41 89, 0 0))"
        // constant polygon parses + prepares ONCE per executor; points go
        // straight into JTS coordinates (no per-row WKT round-trip)
        val inTri = Jts.stContainsPointPrepared(tri)
        pts
          // index-role prefilter: triangle bbox [0,97]×[0,89]
          .filter(col("x") >= 0 && col("x") <= 97 &&
            col("y") >= 0 && col("y") <= 89)
          .filter(inTri(col("x"), col("y")))
          .select(col("c_custkey"), col("x"), col("y"))
      },
      Some("""SELECT c_custkey, x, y FROM (
          SELECT c_custkey,
            CAST(c_custkey % 100 AS DOUBLE) AS x,
            CAST((c_custkey * 7) % 100 AS DOUBLE) AS y
          FROM customer)
        WHERE 97*y - 13*x > 0
          AND -56*(y - 13) - 76*(x - 97) > 0
          AND -41*(y - 89) + 89*(x - 41) > 0""")),

    // JTS-backed ST_* + STUnion: disjoint boxes per supplier; union area
    // per nation = sum of box areas (disjointness makes the oracle exact)
    Q("q_geo_jts",
      (s, d) => {
        import graft.functions.Jts
        val sup = Tables.supplier(s, d).select(
          col("s_suppkey"), col("s_nationkey"),
          // spacing 10 > max width 8 keeps the boxes pairwise disjoint
          // (exact while suppkey % 1000 stays collision-free per nation)
          (col("s_suppkey") % 1000).cast("double") * 10.0 as "x0",
          (col("s_suppkey") % 8).cast("double") as "w")
        val boxes = sup.withColumn("box",
          Jts.stBoxWkt(col("x0"), lit(0.0), col("x0") + col("w") + 1.0,
            lit(1.0)))
        boxes.groupBy(col("s_nationkey"))
          .agg(graft.Par.r6(org.apache.spark.sql.functions.sum(
            Jts.stArea(col("box"))).cast("double")).as("sum_area"),
            graft.Par.r6(Jts.wkbArea(Jts.stUnionAgg(col("box"))))
              .as("union_area"),
            count(lit(1)).as("n_boxes"))
      },
      Some("""SELECT s_nationkey,
        ROUND(SUM((s_suppkey % 8) + 1.0), 6) AS sum_area,
        ROUND(SUM((s_suppkey % 8) + 1.0), 6) AS union_area,
        COUNT(*) AS n_boxes
        FROM supplier GROUP BY s_nationkey""")),

    // WKB serialization round-trip (reference ST_AsBinary / ST_GeomFromWKB /
    // ST_AsText / ST_GeometryType / ST_Polygon): box polygons → WKB bytes →
    // geometry → area + type; text_stable asserts ST_AsText is a fixed
    // point across the codec hop. The oracle replays the area arithmetic,
    // so any WKB/WKT codec deviation breaks area, gtype, or the bit.
    Q("q_geo_wkb",
      (s, d) => {
        import graft.functions.Jts
        val sup = Tables.supplier(s, d).select(
          col("s_suppkey"),
          (col("s_suppkey") % 1000).cast("double") * 10.0 as "x0",
          (col("s_suppkey") % 8).cast("double") as "w")
        val boxes = sup.withColumn("box",
          Jts.stPolygon(Jts.stBoxWkt(col("x0"), lit(0.0),
            col("x0") + col("w") + 1.0, lit(1.0))))
        val back = Jts.stGeomFromWkb(Jts.stAsBinary(col("box")))
        boxes.select(col("s_suppkey"),
          graft.Par.r6(Jts.stArea(back)).as("area"),
          Jts.stGeometryType(col("box")).as("gtype"),
          (Jts.stAsText(back) === Jts.stAsText(col("box")))
            .as("text_stable"))
      },
      Some("""SELECT s_suppkey,
        ROUND((s_suppkey % 8) + 1.0, 6) AS area,
        'Polygon' AS gtype,
        TRUE AS text_stable
        FROM supplier""")),

    // geo: planar ST_* + grid-cell index over synthesized coordinates
    Q("q_geo_distance",
      (s, d) => {
        val sup = Tables.supplier(s, d)
          .withColumn("pt", Geo.stPoint(
            (col("s_suppkey") % 360 - 180).cast("double") + 0.5,
            (col("s_suppkey") % 180 - 90).cast("double") + 0.5))
        sup.select(col("s_suppkey"),
          Par.r6(Geo.stDistance(col("pt"),
            Geo.stPoint(lit(0.0), lit(0.0)))).as("dist"),
          Geo.stWithinBBox(col("pt"), -90, -45, 90, 45).as("in_bbox"),
          Geo.gridCell(col("pt"), 5.0).as("cell"))
      },
      Some("""SELECT s_suppkey,
        ROUND(SQRT((x - 0.0) * (x - 0.0) + (y - 0.0) * (y - 0.0)), 6) AS dist,
        x BETWEEN -90 AND 90 AND y BETWEEN -45 AND 45 AS in_bbox,
        CAST(FLOOR(x / 5.0) AS BIGINT) * 100000 +
          CAST(FLOOR(y / 5.0) AS BIGINT) AS cell
        FROM (SELECT s_suppkey,
          CAST(s_suppkey % 360 - 180 AS DOUBLE) + 0.5 AS x,
          CAST(s_suppkey % 180 - 90 AS DOUBLE) + 0.5 AS y FROM supplier)""")),

    // URL normalization + host/domain extraction: synthesize deterministic
    // messy URLs from the corpus (mixed case, scheme/www/port/trailing-
    // slash/fragment variants, an embedded `http://h:443/x` inside the
    // query string that the HOST-anchored port rule must NOT rewrite, and
    // `.co.uk` hosts that the embedded public-suffix subset must group at
    // three labels) and canonicalize. Every rule is anchored, so DuckDB's
    // first-match replacement equals Spark's global replacement and the
    // oracle replays bit-exactly — and the whole thing is one codegen
    // projection, no shuffle.
    Q("q_url_normalize",
      (s, d) => {
        import graft.operators.UrlCuration
        val raw = concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS://WWW."))
            .otherwise(lit("http://")),
          col("source"),
          when(col("doc_id") % 5 === 0, lit(".Example.CO.UK"))
            .otherwise(lit(".Example.COM")),
          when(col("doc_id") % 2 === 0, lit(":443")).otherwise(lit(":80")),
          lit("/docs/"), col("doc_id").cast("string"),
          when(col("doc_id") % 7 === 0, lit("?u=http://h:443/x"))
            .otherwise(lit("")),
          when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
          lit("#sec"))
        val norm = UrlCuration.normalizeUrl(raw)
        Tables.documents(s, d).select(col("doc_id"), norm.as("url"),
            UrlCuration.hostOf(norm).as("host"),
            UrlCuration.registeredDomainOf(UrlCuration.hostOf(norm))
              .as("domain"))
          .orderBy(col("doc_id"))
      },
      Some {
        val psl = graft.operators.UrlCuration.MultiLabelSuffixes
          .map(sfx => s"'$sfx'").mkString(", ")
        s"""SELECT doc_id, url, host,
          CASE WHEN t2 = '' THEN host
               WHEN t2 IN ($psl) AND t3 != '' THEN t3
               ELSE t2 END AS domain
        FROM (SELECT doc_id, url, host,
            regexp_extract(host, '[^.]+\\.[^.]+$$') AS t2,
            regexp_extract(host, '[^.]+\\.[^.]+\\.[^.]+$$') AS t3
          FROM (SELECT doc_id, url, regexp_extract(url, '^[^/?]+') AS host
          FROM (SELECT doc_id,
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              regexp_replace(lower(
                CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.'
                     ELSE 'http://' END || source ||
                CASE WHEN doc_id % 5 = 0 THEN '.Example.CO.UK'
                     ELSE '.Example.COM' END ||
                CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END ||
                '/docs/' || CAST(doc_id AS VARCHAR) ||
                CASE WHEN doc_id % 7 = 0 THEN '?u=http://h:443/x'
                     ELSE '' END ||
                CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END || '#sec'),
              '#.*$$', ''), '^[a-z][a-z0-9+.-]*://', ''), '^www\\.', ''),
              '^([^/:?#]*):(80|443)([/?]|$$)', '\\1\\3'), '/$$', '') AS url
            FROM documents)))
        ORDER BY doc_id"""
      }),

    // Deterministic per-domain cap (RefinedWeb-style): at most 30 docs per
    // source, chosen by salted hash of the id — reproducible at any
    // parallelism, one window over the domain key. Oracle replays the
    // identical md5 ranking, so the SURVIVOR SET is bit-checked, not just
    // the counts.
    Q("q_url_domain_cap",
      (s, d) => graft.operators.UrlCuration.capPerDomain(
          Tables.documents(s, d), "doc_id", "source", 30)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(graft.functions.Scalars.hash60(col("doc_id").cast("string"))
            % 1000003L).as("id_checksum"))
        .orderBy(col("source")),
      Some(s"""SELECT source, COUNT(*) AS n_kept,
          CAST(SUM(${hash60Sql("CAST(doc_id AS VARCHAR)")} % 1000003)
            AS BIGINT) AS id_checksum
        FROM (SELECT source, doc_id, ROW_NUMBER() OVER (
            PARTITION BY source
            ORDER BY ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")},
              doc_id) AS rn
          FROM documents)
        WHERE rn <= 30 GROUP BY source ORDER BY source""")),

    // HTML → text extraction (the WARC/WET boilerplate step CCNet /
    // RefinedWeb / Dolma / FineWeb all start from): script/style/comments
    // drop WITH content, every other tag drops keeping its content, block
    // closers and <br> become line breaks, the common named entities
    // decode once (&amp; last), whitespace canonicalizes. Each row
    // synthesizes its own HTML (title, style, comment, conditional
    // script/anchor/list blocks, entity-decorated heading) from corpus
    // columns so both engines build identical bytes; title, visible text,
    // and the anchor-chars/visible-chars link-density boilerplate signal
    // are all replayed through the same RE2-subset chain and hash-gated.
    // Scale: one scan, zero shuffle, ~15 codegen regexp/replace passes.
    Q("q_html_extract",
      (s, d) => {
        import graft.functions.Html
        val did = col("doc_id").cast("string")
        val h = concat(
          lit("<html><head><title>Doc "), did, lit(" &amp; Co</title>"),
          lit("<style>body { c: 1 }</style></head><body><!-- hidden "),
          did, lit(" -->"),
          when(col("doc_id") % 3 === 0,
            lit("<script>var x = \"<p>junk</p>\";</script>"))
            .otherwise(lit("")),
          lit("<h1>"), col("source"), lit(" &lt;news&gt;</h1><p>"),
          col("text"), lit("</p>"),
          when(col("doc_id") % 2 === 0,
            lit("<p>See <a href=\"u\">the &quot;docs&quot;</a> here</p>"))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit("<ul><li>a&nbsp;b</li><li>c&#39;d</li></ul>"))
            .otherwise(lit("")),
          lit("</body></html>"))
        Tables.documents(s, d).select(col("doc_id"),
            Html.htmlTitle(h).as("title"),
            Html.htmlText(h).as("text_out"),
            Par.r6(Html.linkDensity(h)).as("link_density"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH h AS (SELECT doc_id,
          '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
          ' &amp; Co</title><style>body { c: 1 }</style></head>' ||
          '<body><!-- hidden ' || CAST(doc_id AS VARCHAR) || ' -->' ||
          CASE WHEN doc_id % 3 = 0
            THEN '<script>var x = "<p>junk</p>";</script>' ELSE '' END ||
          '<h1>' || source || ' &lt;news&gt;</h1><p>' || text || '</p>' ||
          CASE WHEN doc_id % 2 = 0
            THEN '<p>See <a href="u">the &quot;docs&quot;</a> here</p>'
            ELSE '' END ||
          CASE WHEN doc_id % 5 = 0
            THEN '<ul><li>a&nbsp;b</li><li>c&#39;d</li></ul>' ELSE '' END ||
          '</body></html>' AS html FROM documents),
        t AS (SELECT doc_id, html, ${htmlTextSql("html")} AS text_out
          FROM h)
        SELECT doc_id, ${htmlTitleSql("html")} AS title, text_out,
          ROUND(CAST(${htmlAnchorCharsSql("html")} AS DOUBLE) /
            NULLIF(length(text_out), 0), 6) AS link_density
        FROM t ORDER BY doc_id""")),

    // UT1-style host-suffix URL blocklist (the Dolma/FineWeb filter over
    // public blocklists): an entry blocks its own host AND every
    // subdomain; lookalike hosts that merely CONTAIN the entry survive.
    // Hosts synthesize from corpus columns; the list blocks one
    // registered domain and one subtree. The oracle states the suffix
    // semantics directly (= or '.'-suffix LIKE). Scale: the blocklist is
    // the small side and BROADCASTS; the corpus computes its ≤4 label
    // suffixes in one projection and broadcast-semi-joins — it never
    // shuffles; the anti-join ships ids only.
    Q("q_url_blocklist",
      (s, d) => {
        import s.implicits._
        val host = concat(col("source"), lit("."),
          when(col("doc_id") % 4 === 0, lit("blocked.example.com"))
            .when(col("doc_id") % 4 === 1, lit("ok.example.org"))
            .when(col("doc_id") % 4 === 2, lit("ads.tracker.net"))
            .otherwise(lit("clean.io")))
        val docs = Tables.documents(s, d).withColumn("host", host)
        graft.operators.UrlCuration.filterBlocklist(docs, "host",
            "doc_id",
            Seq("blocked.example.com", "tracker.net").toDF("domain"))
          .groupBy(col("host"))
          .agg(count(lit(1)).as("n"),
            sum(col("doc_id") % 1000003L).as("id_checksum"))
          .orderBy(col("host"))
      },
      Some("""WITH u AS (SELECT doc_id, source || '.' ||
            CASE WHEN doc_id % 4 = 0 THEN 'blocked.example.com'
                 WHEN doc_id % 4 = 1 THEN 'ok.example.org'
                 WHEN doc_id % 4 = 2 THEN 'ads.tracker.net'
                 ELSE 'clean.io' END AS host
          FROM documents)
        SELECT host, COUNT(*) AS n,
          CAST(SUM(doc_id % 1000003) AS BIGINT) AS id_checksum
        FROM u
        WHERE NOT EXISTS (SELECT 1 FROM (VALUES ('blocked.example.com'),
            ('tracker.net')) b(domain)
          WHERE u.host = b.domain OR u.host LIKE '%.' || b.domain)
        GROUP BY host ORDER BY host""")),

    // SURT keys (r15 — the Sort-friendly URI Reordering Transform web
    // archives sort URL indexes by: IA CDX files and Common Crawl url
    // indexes are SURT-ordered so a host's captures are contiguous).
    // Synthesis cycles the interesting shapes: mixed-case www host
    // with a fragment to drop (query order preserved — SURT lowercases
    // and reorders only the authority), default ports dropped on both
    // schemes, non-default port kept, query-no-path, userinfo. Oracle states
    // the expected key per shape directly from the synthesis arms —
    // independent ground truth, not a regex mirror.
    Q("q_url_surt",
      (s, d) => {
        val did = col("doc_id")
        val k = (did % 29).cast("string")
        val id = did.cast("string")
        val url = when(did % 5 === 0, concat(lit("https://WWW.H"), k,
            lit(".Example.ORG/Doc/"), id, lit("?b=2&a=1#frag")))
          .when(did % 5 === 1, concat(lit("http://h"), k,
            lit(".example.org:80/doc/"), id))
          .when(did % 5 === 2, concat(lit("https://h"), k,
            lit(".example.org:8443/doc/"), id))
          .when(did % 5 === 3, concat(lit("http://h"), k,
            lit(".example.org?q="), id))
          .otherwise(concat(lit("https://user@h"), k,
            lit(".example.org/")))
        Tables.documents(s, d).select(url.as("url"),
            graft.operators.UrlCuration.surtKey(url).as("surt"))
          .orderBy(col("url"))
      },
      Some("""WITH f AS (SELECT doc_id AS did,
          CAST(doc_id % 29 AS VARCHAR) AS k,
          CAST(doc_id AS VARCHAR) AS id FROM documents),
        u AS (SELECT
          CASE did % 5
            WHEN 0 THEN 'https://WWW.H' || k || '.Example.ORG/Doc/' ||
              id || '?b=2&a=1#frag'
            WHEN 1 THEN 'http://h' || k || '.example.org:80/doc/' || id
            WHEN 2 THEN 'https://h' || k || '.example.org:8443/doc/' || id
            WHEN 3 THEN 'http://h' || k || '.example.org?q=' || id
            ELSE 'https://user@h' || k || '.example.org/' END AS url,
          CASE did % 5
            WHEN 0 THEN 'org,example,h' || k || ')/Doc/' || id ||
              '?b=2&a=1'
            WHEN 1 THEN 'org,example,h' || k || ')/doc/' || id
            WHEN 2 THEN 'org,example,h' || k || ':8443)/doc/' || id
            WHEN 3 THEN 'org,example,h' || k || ')/?q=' || id
            ELSE 'org,example,h' || k || ')/' END AS surt
        FROM f)
        SELECT url, surt FROM u ORDER BY url""")),

    // Host-level link graph from crawl HTML (the cc-webgraph tier:
    // Common Crawl's host-rank releases are exactly this signal, used
    // to weight/gate pages before text filters). Anchor hrefs extract
    // by the explicit-whitespace regex (house \s rule), absolute
    // http(s) links resolve to lowercased hosts, self-loops drop, the
    // pair count aggregates. One projection + one keyed agg — the
    // corpus scans once, nothing joins.
    Q("q_link_graph",
      (s, d) => graft.operators.LinkGraph.edges(
          linkPages(s, d), "uri", "html")
        .orderBy(col("src"), col("dst")),
      Some(s"""WITH $linkEdgesSql
          SELECT src, dst, n FROM edges ORDER BY src, dst""")),

    // Incoming anchor-text harvest (the augmentation signal: what other
    // pages call a target when linking to it — attached to the TARGET
    // document as auxiliary description in search/corpus pipelines).
    // Full anchor elements pair href + inner text; markup strips,
    // whitespace canonicalizes, absolute-host targets only, counted per
    // (dst_host, anchor). Pure projection + explode + one keyed agg.
    Q("q_anchor_text",
      (s, d) => graft.operators.LinkGraph.anchorTexts(
          linkPages(s, d), "html")
        .orderBy(col("dst"), col("anchor")),
      Some(s"""WITH $linkEdgesSql,
          fa AS (SELECT unnest(regexp_extract_all(html,
              '(?is)<a[ \t\n\r][^>]*href[ \t\n\r]*=[ \t\n\r]*"[^"]*"[^>]*>.*?</a>',
              0)) AS a
            FROM pg),
          px AS (SELECT
              lower(regexp_extract(regexp_extract(a,
                '(?i)href[ \t\n\r]*=[ \t\n\r]*"([^"]*)"', 1),
                '(?i)^https?://([^/:?#]+)', 1)) AS dst,
              trim(regexp_replace(regexp_replace(
                regexp_extract(a, '(?is)^<a[^>]*>(.*)</a>$$', 1),
                '<[^>]*>', '', 'g'), '[ \t\n\r]+', ' ', 'g')) AS anchor
            FROM fa)
          SELECT dst, anchor, COUNT(*) AS n FROM px
          WHERE dst != '' AND length(anchor) > 0
          GROUP BY 1, 2 ORDER BY dst, anchor""")),

    // Integer-deterministic PageRank over the host graph (3 iterations,
    // d=0.85): ranks are 1e-12 micro-units on BIGINT with floor
    // division at every step, so per-host inflow sums are order-free
    // and the oracle replays all three iterations bit-for-bit —
    // including the floor dust and the dropped dangling mass (the
    // documented simplified form). Scale shape: the rank frame (one row
    // per host) BROADCASTS onto the persisted edge frame each
    // iteration; the big side never re-shuffles, each round is one
    // broadcast join + one keyed agg, lineage truncated per round.
    Q("q_pagerank",
      (s, d) => graft.operators.LinkGraph.hostRank(
          linkPages(s, d), "uri", "html", iters = 3)
        .orderBy(col("host")),
      Some {
        def iter(prev: String, i: String, r: String) =
          s"""$i AS (SELECT e.dst,
              CAST(SUM((r.ru * e.n) // o.od) AS BIGINT) AS inflow
            FROM edges e JOIN $prev r ON e.src = r.host
            JOIN lod o ON e.src = o.src GROUP BY 1),
          $r AS (SELECT n.host, CAST(
              (150 * (SELECT base FROM prm)) // 1000
              + (COALESCE(i.inflow, 0) * 850) // 1000 AS BIGINT) AS ru
            FROM lnodes n LEFT JOIN $i i ON n.host = i.dst)"""
        s"""WITH $linkEdgesSql,
          lnodes AS (SELECT DISTINCT host FROM (
            SELECT src AS host FROM edges
            UNION ALL SELECT dst AS host FROM edges)),
          prm AS (SELECT CAST(1000000000000 //
            (SELECT COUNT(*) FROM lnodes) AS BIGINT) AS base),
          lod AS (SELECT src, CAST(SUM(n) AS BIGINT) AS od
            FROM edges GROUP BY 1),
          r0 AS (SELECT host, (SELECT base FROM prm) AS ru FROM lnodes),
          ${iter("r0", "i1", "r1")},
          ${iter("r1", "i2", "r2")},
          ${iter("r2", "i3", "r3")}
          SELECT host, ru AS rank_u FROM r3 ORDER BY host"""
      }),

    // STREAMING link-graph maintenance, hash-gated: fetched pages land
    // as 4 ordered micro-batches, each appending its PARTIAL edge
    // counts tag-idempotently to the persisted edge index (O(batch) —
    // the accumulated index is never read on the ingest path); an
    // at-least-once REPLAY of the last batch re-appends under its own
    // tag and must be a no-op (a real re-append would double counts and
    // break the hash). The loaded, re-aggregated edge set must equal
    // the one-shot batch extraction — the oracle is q_link_graph's.
    Q("q_stream_link_graph",
      (s, d) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        import graft.operators.LinkGraph
        val pages = linkPages(s, d).orderBy(col("uri"))
          .as[(String, String)].collect()
        val chunk = math.max(1, math.ceil(pages.length / 4.0).toInt)
        val chunks = pages.grouped(chunk).toSeq
        LinkGraph.dropEdgeIndex(s, "lg_stream")
        val mem = MemoryStream[(String, String)]
        val q = graft.streaming.Streams.linkGraphSink(
          mem.toDF().toDF("uri", "html"), "uri", "html", "lg_stream",
          streamTag = Some("lgs")) { _ => () }.start()
        chunks.foreach { c =>
          mem.addData(c.toSeq: _*)
          q.processAllAvailable() // one micro-batch per chunk
        }
        q.stop()
        // at-least-once replay of the final batch: committed tag → no-op
        LinkGraph.appendEdges(s, chunks.last.toSeq.toDF("uri", "html"),
          "uri", "html", "lg_stream", s"lgs_${chunks.length - 1}")
        LinkGraph.loadEdges(s, "lg_stream")
          .orderBy(col("src"), col("dst"))
      },
      Some(s"""WITH $linkEdgesSql
          SELECT src, dst, n FROM edges ORDER BY src, dst""")),

    // WARM-START incremental PageRank — the continuous-crawl
    // maintenance shape: a day's archives extend the edge set, and
    // re-iterating from the PREVIOUS ranks converges in far fewer
    // rounds than a cold uniform start. The semantics are exact, not
    // "approximately converged": batch-1 pages (doc_id%4 != 3) rank for
    // 3 rounds, the day-2 pages merge in, carried hosts warm-start from
    // their prior rank_u, NEW hosts from the merged graph's uniform
    // base, and ONE more round runs on the merged edges — the oracle
    // replays all four rounds across both graph versions bit-for-bit.
    Q("q_pagerank_incremental",
      (s, d) => {
        import graft.operators.LinkGraph
        val pages = linkPages(s, d)
        val did = regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
          .cast("long")
        val prior = LinkGraph.pageRank(
          LinkGraph.edges(pages.filter(did % 4 =!= 3), "uri", "html"),
          iters = 3)
        LinkGraph.pageRankWarm(
            LinkGraph.edges(pages, "uri", "html"), prior, iters = 1)
          .orderBy(col("host"))
      },
      Some {
        def itr(e: String, o: String, nds: String, prm: String,
                prev: String, i: String, r: String) =
          s"""$i AS (SELECT e.dst,
              CAST(SUM((r.ru * e.n) // o.od) AS BIGINT) AS inflow
            FROM $e e JOIN $prev r ON e.src = r.host
            JOIN $o o ON e.src = o.src GROUP BY 1),
          $r AS (SELECT n.host, CAST(
              (150 * (SELECT base FROM $prm)) // 1000
              + (COALESCE(i.inflow, 0) * 850) // 1000 AS BIGINT) AS ru
            FROM $nds n LEFT JOIN $i i ON n.host = i.dst)"""
        s"""WITH $linkEdgesSql,
          b1 AS (SELECT src, dst, COUNT(*) AS n FROM le0
            WHERE dst != '' AND src != dst AND did % 4 <> 3
            GROUP BY 1, 2),
          n1 AS (SELECT DISTINCT host FROM (
            SELECT src AS host FROM b1 UNION ALL SELECT dst FROM b1)),
          p1 AS (SELECT CAST(1000000000000 //
            (SELECT COUNT(*) FROM n1) AS BIGINT) AS base),
          o1 AS (SELECT src, CAST(SUM(n) AS BIGINT) AS od
            FROM b1 GROUP BY 1),
          a0 AS (SELECT host, (SELECT base FROM p1) AS ru FROM n1),
          ${itr("b1", "o1", "n1", "p1", "a0", "i1", "a1")},
          ${itr("b1", "o1", "n1", "p1", "a1", "i2", "a2")},
          ${itr("b1", "o1", "n1", "p1", "a2", "i3", "a3")},
          n2 AS (SELECT DISTINCT host FROM (
            SELECT src AS host FROM edges
            UNION ALL SELECT dst FROM edges)),
          p2 AS (SELECT CAST(1000000000000 //
            (SELECT COUNT(*) FROM n2) AS BIGINT) AS base),
          o2 AS (SELECT src, CAST(SUM(n) AS BIGINT) AS od
            FROM edges GROUP BY 1),
          w0 AS (SELECT n.host,
              COALESCE(a.ru, (SELECT base FROM p2)) AS ru
            FROM n2 n LEFT JOIN a3 a ON n.host = a.host),
          ${itr("edges", "o2", "n2", "p2", "w0", "i4", "w1")}
          SELECT host, ru AS rank_u FROM w1 ORDER BY host"""
      }),

    // C4-style span-level exact dedup: 3-token non-overlapping spans, the
    // globally first occurrence of each distinct span wins, text
    // reassembled from the survivors. Spark side is two linear shuffles
    // (window on the span, groupBy on the id); oracle replays the same
    // chunking + first-occurrence rule, so the rebuilt TEXT is bit-checked.
    Q("q_dedup_spans",
      (s, d) => Dedup.spanDedup(Tables.documents(s, d), "doc_id", "text", 3)
        .orderBy(col("doc_id")),
      Some(s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        sp AS (SELECT doc_id, CAST((i - 1) // 3 AS BIGINT) AS span_idx,
            array_to_string(tk[i:i+2], ' ') AS span
          FROM (SELECT doc_id, tk,
            unnest(generate_series(1, greatest(len(tk), 1), 3)) AS i
            FROM tk)),
        first AS (SELECT doc_id, span_idx, span, ROW_NUMBER() OVER (
            PARTITION BY span ORDER BY doc_id, span_idx) AS rn
          FROM sp WHERE span != '')
        SELECT d.doc_id,
          COALESCE(string_agg(f.span, ' ' ORDER BY f.span_idx), '') AS text
        FROM documents d LEFT JOIN (SELECT * FROM first WHERE rn = 1) f
          ON d.doc_id = f.doc_id
        GROUP BY d.doc_id ORDER BY d.doc_id""")),

    // Web-curation capstone — the WARC→training-text front half of a web
    // pipeline, every stage the proven fragment chained in pipeline
    // order (cheapest drop first): host-suffix blocklist → HTML text/
    // title extraction → link-density boilerplate gate (≤0.02, 6dp on
    // both sides so the threshold compare is bit-stable; pages with no
    // visible text drop with it) → cross-doc paragraph dedup, titles
    // rejoined by id. The oracle replays all four stages; survivor set,
    // titles, AND rebuilt text are hash-checked.
    Q("q_web_pipeline",
      (s, d) => {
        import s.implicits._
        import graft.functions.Html
        import graft.operators.UrlCuration
        val host = concat(col("source"), lit("."),
          when(col("doc_id") % 4 === 0, lit("blocked.example.com"))
            .when(col("doc_id") % 4 === 1, lit("ok.example.org"))
            .when(col("doc_id") % 4 === 2, lit("ads.tracker.net"))
            .otherwise(lit("clean.io")))
        val did = col("doc_id").cast("string")
        val html = concat(
          lit("<html><head><title>Doc "), did, lit(" &amp; Co</title>"),
          lit("</head><body><h1>"), col("source"),
          lit(" &lt;news&gt;</h1><p>"), col("text"), lit("</p>"),
          when(col("doc_id") % 3 === 0,
            lit("<p>See <a href=\"u\">the &quot;docs&quot;</a> here</p>"))
            .otherwise(lit("")),
          lit("</body></html>"))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), host.as("host"), html.as("html"))
        val surv = UrlCuration.filterBlocklist(docs, "host", "doc_id",
          Seq("blocked.example.com", "tracker.net").toDF("domain"))
        val extracted = surv.select(col("doc_id"),
            Html.htmlTitle(col("html")).as("title"),
            Html.htmlText(col("html")).as("text"),
            Par.r6(Html.linkDensity(col("html"))).as("ld"))
          .filter(col("ld") <= 0.02)
        val deduped = graft.operators.Dedup.paragraphDedup(
          extracted.select(col("doc_id"), col("text")), "doc_id", "text")
        deduped.join(extracted.select(col("doc_id"), col("title")),
            Seq("doc_id"))
          .select(col("doc_id"), col("title"), col("text"))
          .orderBy(col("doc_id"))
      },
      Some {
        val htmlSyn = """'<html><head><title>Doc ' ||
            CAST(doc_id AS VARCHAR) ||
            ' &amp; Co</title></head><body><h1>' || source ||
            ' &lt;news&gt;</h1><p>' || text || '</p>' ||
            CASE WHEN doc_id % 3 = 0
              THEN '<p>See <a href="u">the &quot;docs&quot;</a> here</p>'
              ELSE '' END || '</body></html>'"""
        s"""WITH u AS (SELECT doc_id, source, text, source || '.' ||
              CASE WHEN doc_id % 4 = 0 THEN 'blocked.example.com'
                   WHEN doc_id % 4 = 1 THEN 'ok.example.org'
                   WHEN doc_id % 4 = 2 THEN 'ads.tracker.net'
                   ELSE 'clean.io' END AS host
            FROM documents),
          h AS (SELECT doc_id, $htmlSyn AS html FROM u
            WHERE NOT EXISTS (SELECT 1 FROM (VALUES
                ('blocked.example.com'), ('tracker.net')) b(domain)
              WHERE u.host = b.domain OR u.host LIKE '%.' || b.domain)),
          x AS (SELECT doc_id, ${htmlTitleSql("html")} AS title,
              ${htmlTextSql("html")} AS text_out, html FROM h),
          kept AS (SELECT doc_id, title, text_out FROM x
            WHERE ROUND(CAST(${htmlAnchorCharsSql("html")} AS DOUBLE) /
              NULLIF(length(text_out), 0), 6) <= 0.02),
          sp AS (SELECT doc_id, i - 1 AS para_idx, parts[i] AS para
            FROM (SELECT doc_id,
                string_split(text_out, chr(10)) AS parts,
                unnest(generate_series(1,
                  len(string_split(text_out, chr(10))))) AS i
              FROM kept)
            WHERE trim(parts[i]) != ''),
          first AS (SELECT doc_id, para_idx, para, ROW_NUMBER() OVER (
              PARTITION BY para ORDER BY doc_id, para_idx) AS rn FROM sp)
          SELECT k.doc_id, k.title,
            COALESCE(string_agg(f.para, chr(10) ORDER BY f.para_idx), '')
              AS text
          FROM kept k LEFT JOIN (SELECT * FROM first WHERE rn = 1) f
            ON k.doc_id = f.doc_id
          GROUP BY k.doc_id, k.title ORDER BY k.doc_id"""
      }),

    // Dolma-style PARAGRAPH dedup (spanDedup's separator-based sibling —
    // the form web pipelines run on extracted text, where boilerplate
    // LINES repeat across pages): the corpus reshapes into 4-token lines
    // joined by newlines, each raw line dedups to its global first
    // occurrence (lowest id, then position), survivors rejoin in order,
    // whitespace-only lines drop. The oracle replays the line synthesis,
    // the first-occurrence window, and the rebuild — full text
    // bit-checked. Same two-linear-shuffle shape as q_dedup_spans.
    Q("q_dedup_paragraphs",
      (s, d) => {
        val toks = TA.tokens(col("text"))
        val last = greatest(((size(toks) - 1) / 4).cast("int"), lit(0))
        val lines = transform(sequence(lit(0), last),
          i => array_join(slice(toks, i * 4 + 1, lit(4)), " "))
        val docs = Tables.documents(s, d).select(col("doc_id"),
          array_join(lines, "\n").as("text"))
        Dedup.paragraphDedup(docs, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        lined AS (SELECT doc_id, array_to_string(list_transform(
            generate_series(0, greatest((len(tk) - 1) // 4, 0)),
            i -> array_to_string(tk[i*4+1:i*4+4], ' ')), chr(10)) AS text
          FROM tk),
        sp AS (SELECT doc_id, i - 1 AS para_idx, parts[i] AS para
          FROM (SELECT doc_id, string_split(text, chr(10)) AS parts,
              unnest(generate_series(1,
                len(string_split(text, chr(10))))) AS i
            FROM lined)
          WHERE trim(parts[i]) != ''),
        first AS (SELECT doc_id, para_idx, para, ROW_NUMBER() OVER (
            PARTITION BY para ORDER BY doc_id, para_idx) AS rn FROM sp)
        SELECT d.doc_id,
          COALESCE(string_agg(f.para, chr(10) ORDER BY f.para_idx), '')
            AS text
        FROM lined d LEFT JOIN (SELECT * FROM first WHERE rn = 1) f
          ON d.doc_id = f.doc_id
        GROUP BY d.doc_id ORDER BY d.doc_id""")),

    // WARC-fronted curation capstone — the FULL WARC→training-text front
    // half, from archive bytes: documents wrapped as HTTP response
    // records (doc_id%7==0 served as 404, doc_id%11==0 as application/
    // pdf) across four archives (two gzip), then the pipeline CCNet/
    // RefinedWeb run: parse records → keep HTTP-200 text/html → host
    // blocklist on the fetch URI → HTML text/title extraction →
    // link-density boilerplate gate → cross-doc paragraph dedup. Every
    // stage drops or rewrites real rows, and the status/content-type
    // gates CHANGE which doc owns each paragraph's first occurrence, so
    // the oracle must replay the whole chain from the parquet to match —
    // survivor set, titles, and rebuilt text hash-checked. The chain is
    // shared with q_warc_shards via warcCurated/warcPipeSql below.
    Q("q_warc_pipeline",
      (s, d) => warcCurated(s, d)
        .select(col("doc_id"), col("title"), col("text"))
        .orderBy(col("doc_id")),
      Some(s"""WITH $warcPipeSql
          SELECT doc_id, title, text FROM wp ORDER BY doc_id""")),

    // GRAND capstone — archive bytes to TRAINING SHARDS, the complete
    // factory in one gate: the q_warc_pipeline curation chain (parse →
    // HTTP gate → blocklist → extract → link density → paragraph dedup)
    // feeds token-budget sharding (the distributed two-pass prefix sum
    // of q_shard_tokens). Every upstream drop or text rewrite moves
    // token counts and therefore every downstream shard boundary, so
    // the oracle replays the curation CTEs AND the prefix-sum window in
    // one statement — assignment bit-checked per document.
    Q("q_warc_shards",
      (s, d) => graft.operators.Packing.shardByTokens(
          warcCurated(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", budget = 2000L)
        .orderBy(col("doc_id")),
      Some(s"""WITH $warcPipeSql,
          t AS (SELECT doc_id,
              CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens,
              ${hash60Sql("'graft:' || CAST(doc_id AS VARCHAR)")} AS ord
            FROM wp),
          w AS (SELECT doc_id, n_tokens,
              CAST(COALESCE(SUM(n_tokens) OVER (
                ORDER BY ord % 256, ord, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS prev
            FROM t)
          SELECT doc_id, n_tokens, CAST(prev // 2000 AS BIGINT) AS shard
          FROM w ORDER BY doc_id""")),

    // STREAMING paragraph dedup, hash-gated (Dolma's production shape —
    // a Bloom filter over paragraphs): the same synthesized-line corpus
    // as q_dedup_paragraphs runs through Streams.paragraphDedupSink as 4
    // ordered micro-batches, then the last batch REPLAYS through the
    // same state and must rebuild byte-identically (at-least-once
    // contract), asserted in-gate. The oracle replays the whole
    // protocol from first principles: line synthesis, the ceil(n/4)
    // batch assignment, the 3 hash60-probe bloom positions, bit
    // advancement BETWEEN batches only (a paragraph is suppressed iff
    // every probe position was first set by a strictly earlier batch),
    // the within-batch first-occurrence window, and the per-doc rebuild
    // with empty-text rows — full text bit-checked, so a lost batch, a
    // premature bit set, or replay drift all break the hash.
    Q("q_stream_para_dedup",
      (s, d) => {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sq = s.sqlContext
        import s.implicits._
        val toks = TA.tokens(col("text"))
        val last = greatest(((size(toks) - 1) / 4).cast("int"), lit(0))
        val lines = transform(sequence(lit(0), last),
          i => array_join(slice(toks, i * 4 + 1, lit(4)), " "))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), array_join(lines, "\n").as("text"))
          .orderBy(col("doc_id")).as[(Long, String)].collect()
        val chunk = math.max(1, math.ceil(docs.length / 4.0).toInt)
        val chunks = docs.grouped(chunk).toSeq
        val state =
          new graft.streaming.Streams.BloomDedupState("para", 1 << 20, 3)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
        var lastBatch = Map.empty[Long, String]
        val mem = MemoryStream[(Long, String)]
        val q = graft.streaming.Streams.paragraphDedupSinkWith(state,
            mem.toDF().toDF("doc_id", "text"), "text", "doc_id", "\n") {
          b =>
            lastBatch =
              b.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
            out ++= lastBatch
        }.start()
        chunks.foreach { c =>
          mem.addData(c.toSeq: _*)
          q.processAllAvailable() // one micro-batch per chunk
        }
        q.stop()
        val replayed = graft.streaming.Streams.paragraphDedupBatch(state,
            chunks.last.toSeq.toDF("doc_id", "text"), chunks.length - 1L,
            "text", "doc_id", "\n")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        require(replayed == lastBatch,
          s"replay drift: ${replayed.size} vs ${lastBatch.size}")
        out.toSeq.toDF("doc_id", "text").orderBy(col("doc_id"))
      },
      Some {
        val probes = (0 until 3).map(i =>
          s"${hash60Sql(s"'$i:' || para")} % ${1 << 20}").mkString(", ")
        s"""WITH tk AS (
            SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
          lined AS (SELECT doc_id, array_to_string(list_transform(
              generate_series(0, greatest((len(tk) - 1) // 4, 0)),
              i -> array_to_string(tk[i*4+1:i*4+4], ' ')), chr(10))
              AS text
            FROM tk),
          rk AS (SELECT doc_id, text,
              CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) /
                CEIL((SELECT COUNT(*) FROM lined) / 4.0)) AS BIGINT) AS b
            FROM lined),
          sp AS (SELECT doc_id, b, i - 1 AS para_idx, parts[i] AS para
            FROM (SELECT doc_id, b, string_split(text, chr(10)) AS parts,
                unnest(generate_series(1,
                  len(string_split(text, chr(10))))) AS i
              FROM rk)
            WHERE trim(parts[i]) != ''),
          pr AS (SELECT doc_id, b, para_idx, para, unnest([$probes]) AS p
            FROM sp),
          firstset AS (SELECT p, MIN(b) AS fb FROM pr GROUP BY p),
          hit AS (SELECT pr.doc_id, pr.b, pr.para_idx, pr.para,
              COUNT(*) AS np, COUNT(f.p) AS ns
            FROM pr LEFT JOIN firstset f
              ON f.p = pr.p AND f.fb < pr.b
            GROUP BY 1, 2, 3, 4),
          kept AS (SELECT doc_id, para_idx, para FROM (
              SELECT doc_id, b, para_idx, para, ROW_NUMBER() OVER (
                PARTITION BY b, para ORDER BY doc_id, para_idx) AS rn
              FROM hit WHERE ns < np)
            WHERE rn = 1)
          SELECT d.doc_id,
            COALESCE(string_agg(k.para, chr(10) ORDER BY k.para_idx), '')
              AS text
          FROM lined d LEFT JOIN kept k ON d.doc_id = k.doc_id
          GROUP BY d.doc_id ORDER BY d.doc_id"""
      }),

    // CONTINUOUS-CRAWL streaming capstone, hash-gated: the flagship
    // streaming chain warcSource → HTTP gate → payloadText → htmlText →
    // paragraphDedupSink driven end-to-end from ARCHIVE BYTES — the four
    // synthesized response archives land in a watched directory one per
    // micro-batch (the shape a fetch fleet produces), each new archive
    // is parsed/decoded/extracted in its own batch, and cross-batch
    // paragraph dedup advances the bloom between batches. The last
    // batch then REPLAYS from its own archive through the same state
    // and must rebuild byte-identically (at-least-once contract),
    // asserted in-gate. The oracle replays everything from the parquet:
    // page synthesis, the 404/PDF HTTP gate, html text extraction,
    // batch assignment b = doc_id%4 (archive p holds doc_id%4==p,
    // dropped in order), the 3 hash60-probe positions, bit advancement
    // BETWEEN batches only, the within-batch first-occurrence window,
    // and the per-doc rebuild with empty-text rows — full text
    // bit-checked, so a lost archive, a premature bit set, a charset
    // drift, or replay divergence all break the hash.
    Q("q_stream_warc_pipeline",
      (s, d) => {
        import s.implicits._
        import graft.sources.Warc
        val src = warcArchiveDir(s, d)
        val dir = java.nio.file.Files
          .createTempDirectory("graft_warcstream").toFile
        def extract(df: DataFrame): DataFrame = df
          .filter(col("warc_type") === "response" &&
            col("http_status") === 200 &&
            col("http_content_type").startsWith("text/html"))
          .select(
            regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            graft.functions.Html.htmlText(
              Warc.payloadText(col("payload"), col("http_content_type")))
              .as("text"))
        val parts = (0 until 4).map(p =>
          s"part$p.warc${if (p % 2 == 1) ".gz" else ""}")
        def drop(p: Int): Unit = java.nio.file.Files.copy(
          new java.io.File(src, parts(p)).toPath,
          new java.io.File(dir, parts(p)).toPath)
        val state =
          new graft.streaming.Streams.BloomDedupState("para", 1 << 20, 3)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
        var lastBatch = Map.empty[Long, String]
        val stream = extract(
          graft.streaming.Streams.warcSource(s, dir.getPath))
        drop(0) // present before start → the first micro-batch
        val q = graft.streaming.Streams.paragraphDedupSinkWith(state,
            stream, "text", "doc_id", "\n") { b =>
          lastBatch =
            b.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
          out ++= lastBatch
        }.start()
        q.processAllAvailable()
        (1 until 4).foreach { p => drop(p); q.processAllAvailable() }
        q.stop()
        // at-least-once replay of the LAST batch from its own archive
        val replayed = graft.streaming.Streams.paragraphDedupBatch(state,
            extract(Warc.read(s, s"${dir.getPath}/${parts(3)}")), 3L,
            "text", "doc_id", "\n")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        require(replayed == lastBatch,
          s"replay drift: ${replayed.size} vs ${lastBatch.size}")
        out.toSeq.toDF("doc_id", "text").orderBy(col("doc_id"))
      },
      Some {
        val probes = (0 until 3).map(i =>
          s"${hash60Sql(s"'$i:' || para")} % ${1 << 20}").mkString(", ")
        s"""WITH u AS (SELECT doc_id, source, text FROM documents
            WHERE doc_id % 7 != 0 AND doc_id % 11 != 0),
          h AS (SELECT doc_id, doc_id % 4 AS b, $htmlSynSql AS html
            FROM u),
          x AS (SELECT doc_id, b, ${htmlTextSql("html")} AS text FROM h),
          sp AS (SELECT doc_id, b, i - 1 AS para_idx, parts[i] AS para
            FROM (SELECT doc_id, b, string_split(text, chr(10)) AS parts,
                unnest(generate_series(1,
                  len(string_split(text, chr(10))))) AS i
              FROM x)
            WHERE trim(parts[i]) != ''),
          pr AS (SELECT doc_id, b, para_idx, para, unnest([$probes]) AS p
            FROM sp),
          firstset AS (SELECT p, MIN(b) AS fb FROM pr GROUP BY p),
          hit AS (SELECT pr.doc_id, pr.b, pr.para_idx, pr.para,
              COUNT(*) AS np, COUNT(f.p) AS ns
            FROM pr LEFT JOIN firstset f
              ON f.p = pr.p AND f.fb < pr.b
            GROUP BY 1, 2, 3, 4),
          kept AS (SELECT doc_id, para_idx, para FROM (
              SELECT doc_id, b, para_idx, para, ROW_NUMBER() OVER (
                PARTITION BY b, para ORDER BY doc_id, para_idx) AS rn
              FROM hit WHERE ns < np)
            WHERE rn = 1)
          SELECT d.doc_id,
            COALESCE(string_agg(k.para, chr(10) ORDER BY k.para_idx), '')
              AS text
          FROM x d LEFT JOIN kept k ON d.doc_id = k.doc_id
          GROUP BY d.doc_id ORDER BY d.doc_id"""
      }),

    // ExactSubstr-style duplicated-passage excision (Lee 2021): every
    // 8-token window at every offset; later occurrences of a duplicated
    // window excise their positions (overlaps merge); text rebuilt. The
    // oracle replays window keys, global (doc, offset) first-occurrence,
    // covered-position union, and the rebuild — full text bit-checked.
    Q("q_dedup_substr",
      (s, d) => Dedup.exactSubstrDedup(
          Tables.documents(s, d), "doc_id", "text", 8)
        .orderBy(col("doc_id")),
      Some(s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        wins AS (SELECT doc_id, i,
            array_to_string(tk[i:i+7], ' ') AS win
          FROM (SELECT doc_id, tk,
              unnest(generate_series(1, greatest(len(tk) - 7, 0))) AS i
            FROM tk)),
        dup AS (SELECT doc_id, i FROM (
            SELECT doc_id, i, ROW_NUMBER() OVER (
              PARTITION BY win ORDER BY doc_id, i) AS rn FROM wins)
          WHERE rn > 1),
        cov AS (SELECT DISTINCT doc_id, pos FROM (
          SELECT doc_id, unnest(generate_series(i, i + 7)) AS pos
          FROM dup)),
        pos AS (SELECT doc_id, i AS pos, tk[i] AS tok
          FROM (SELECT doc_id, tk,
              unnest(generate_series(1, greatest(len(tk), 1))) AS i
            FROM tk)
          WHERE i <= len(tk)),
        kept AS (SELECT p.doc_id, p.pos, p.tok FROM pos p
          LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.pos = c.pos
          WHERE c.pos IS NULL)
        SELECT d.doc_id,
          COALESCE(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS text
        FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
        GROUP BY d.doc_id ORDER BY d.doc_id""")),

    // Cross-batch incremental exact dedup: batch 2 (which re-ships 100 of
    // batch 1's texts under new ids) dedups against a persisted bucketed
    // hash index of batch 1 — the corpus is never re-scanned, only the
    // batch shuffles. Oracle replays the same two-batch protocol:
    // within-batch first occurrence + anti-join on the prior batch's
    // hashes, so the survivor set is bit-checked.
    Q("q_dedup_incremental",
      // run = the batch-2 probe only (idempotent: batch-tagged index rows
      // — the probe excludes tag b2, the append skips when b2 is already
      // indexed, so bench re-timing replays byte-identically); the index
      // build over batch 1 is the setup phase, timed separately
      (s, d) => {
        import graft.operators.Dedup
        val docs = Tables.documents(s, d)
        val b2 = docs.filter(col("doc_id") >= 250)
          .select(col("doc_id"), col("text"))
          .unionAll(docs.filter(col("doc_id") < 100)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        Dedup.incrementalExact(s, b2, "text", "doc_id", "qinc",
            batchTag = Some("b2"))
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some("""WITH b1 AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 250),
        b2 AS (SELECT doc_id, text FROM documents WHERE doc_id >= 250
          UNION ALL
          SELECT doc_id + 100000, text FROM documents WHERE doc_id < 100),
        f AS (SELECT doc_id, md5(text) AS h, ROW_NUMBER() OVER (
            PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM b2)
        SELECT doc_id FROM f
        WHERE rn = 1 AND h NOT IN (SELECT md5(text) FROM b1)
        ORDER BY doc_id"""),
      setup = Some((s, d) => {
        import graft.operators.Dedup
        Dedup.dropIndex(s, "qinc")
        val b1 = Tables.documents(s, d).filter(col("doc_id") < 250)
          .select(col("doc_id"), col("text"))
        // incrementalExact is eager (checkpoint + index append run inside)
        Dedup.incrementalExact(s, b1, "text", "doc_id", "qinc",
          batchTag = Some("b1"))
      })),

    // Cross-batch incremental NEAR-dup: batch 2 probes the persisted
    // band-bucketed MinHash index built from batch 1's survivors, plus
    // pairwise-greedy within-batch drops. The oracle replays the whole
    // protocol — signatures, band keys, batch-1 self-dedup, the index
    // probe, and batch-2 self-dedup — so cross-batch recall of perturbed
    // near-dups (doc_id<100 with the first word stripped) is bit-checked.
    Q("q_dedup_incr_near",
      // run = the batch-2 probe only (idempotent via the b2 batch tag);
      // the index build over batch 1 is the setup phase, timed separately
      // — so the headline number measures the probe protocol, not the
      // batch-1 saveAsTable ceremony (round-6 VERDICT #2/#8)
      (s, d) => {
        val docs = Tables.documents(s, d)
        // bounded batch-2 slice: the gate checks the PROTOCOL (index
        // probe, greedy self-dedup, accumulation), which is corpus-size
        // independent — the slice keeps the bench honest about the
        // operator, not about re-hashing the whole table twice
        val b2 = docs.filter(col("doc_id") >= 250 && col("doc_id") < 2250)
          .select(col("doc_id"), col("text"))
          .unionAll(docs.filter(col("doc_id") < 100)
            .select((col("doc_id") + 100000).as("doc_id"),
              regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
        Dedup.incrementalMinHash(s, b2, "text", "doc_id", "qincn",
          minAgree = 0.75, batchTag = Some("b2"))
          .select(col("doc_id")).orderBy(col("doc_id"))
      },
      Some {
        def sigsOf(src: String) =
          s"""(SELECT doc_id, ${minHashSigFromBase(8)} AS sig
            FROM (SELECT doc_id, ${minHashBaseSql("sh")} AS base
              FROM (SELECT doc_id, ${shinglesSql(s"(${toksSql("text")})", 3)}
                AS sh FROM $src)))"""
        s"""WITH b1 AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 250),
        b2 AS (SELECT doc_id, text FROM documents
          WHERE doc_id >= 250 AND doc_id < 2250
          UNION ALL
          SELECT doc_id + 100000, regexp_replace(text, '^\\S+\\s+', '')
          FROM documents WHERE doc_id < 100),
        e1 AS (SELECT doc_id, sig, b.b AS band,
            md5(array_to_string(sig[b.b*2+1:b.b*2+2], ',')) AS key
          FROM ${sigsOf("b1")} s1, (SELECT unnest(range(4)) AS b) b),
        e2 AS (SELECT doc_id, sig, b.b AS band,
            md5(array_to_string(sig[b.b*2+1:b.b*2+2], ',')) AS key
          FROM ${sigsOf("b2")} s2, (SELECT unnest(range(4)) AS b) b),
        d1 AS (SELECT DISTINCT a.doc_id FROM e1 a JOIN e1 o
          ON a.band = o.band AND a.key = o.key AND o.doc_id < a.doc_id
          WHERE len(list_filter([a.sig[n] = o.sig[n]
            for n in generate_series(1, 8)], x -> x)) / 8.0 >= 0.75),
        idx AS (SELECT * FROM e1
          WHERE doc_id NOT IN (SELECT doc_id FROM d1)),
        din AS (SELECT DISTINCT a.doc_id FROM e2 a JOIN e2 o
          ON a.band = o.band AND a.key = o.key AND o.doc_id < a.doc_id
          WHERE len(list_filter([a.sig[n] = o.sig[n]
            for n in generate_series(1, 8)], x -> x)) / 8.0 >= 0.75),
        didx AS (SELECT DISTINCT a.doc_id FROM e2 a JOIN idx ix
          ON a.band = ix.band AND a.key = ix.key
          WHERE len(list_filter([a.sig[n] = ix.sig[n]
            for n in generate_series(1, 8)], x -> x)) / 8.0 >= 0.75)
        SELECT doc_id FROM b2
        WHERE doc_id NOT IN (SELECT doc_id FROM din)
          AND doc_id NOT IN (SELECT doc_id FROM didx)
        ORDER BY doc_id"""
      },
      setup = Some((s, d) => {
        Dedup.dropIndex(s, "qincn")
        val b1 = Tables.documents(s, d).filter(col("doc_id") < 250)
          .select(col("doc_id"), col("text"))
        // eager: checkpoint + index append run inside the call
        Dedup.incrementalMinHash(s, b1, "text", "doc_id", "qincn",
          minAgree = 0.75, batchTag = Some("b1"))
      })),

    // Full lifecycle of the incremental dedup index (the
    // q_ann_ivf_lifecycle shape for the dedup triad): append → retire
    // (tombstoned docs stop suppressing matching new content at the very
    // next probe) → double compact (physical fold, replay-safe) →
    // re-append of the retired content → REPLAYED append (marker no-op,
    // even after compaction anonymized the files) → final probe. The
    // oracle replays every step from first principles — index contents
    // after each phase and the final probe's survivors are bit-checked.
    // run = the final probe; the whole lifecycle is the setup phase.
    Q("q_dedup_index_lifecycle",
      (s, d) => {
        import graft.operators.Dedup
        ensureDedupLifecycle(s, d) // no-op when setup already built it
        val docs = Tables.documents(s, d)
        val b3 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
          .select(col("doc_id"), col("text"))
          .unionAll(docs.filter(col("doc_id") < 50)
            .select((col("doc_id") + 300000).as("doc_id"), col("text")))
        // index size BEFORE this probe's own append — excluding the t3
        // tag keeps re-runs (bench re-timing) byte-identical
        val nIdx = Dedup.loadIndex(s, qlcName(d))
          .filter(!(col("batch_tag") <=> lit("t3"))).count()
        Dedup.incrementalExact(s, b3, "text", "doc_id", qlcName(d),
            batchTag = Some("t3"))
          .select(col("doc_id"), lit(nIdx).as("n_index_rows"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH b1 AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 300),
        s1 AS (SELECT doc_id, md5(text) AS h, ROW_NUMBER() OVER (
            PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM b1),
        idx1 AS (SELECT doc_id, h FROM s1 WHERE rn = 1),
        idx1k AS (SELECT doc_id, h FROM idx1 WHERE doc_id >= 50),
        b2 AS (SELECT doc_id + 100000 AS doc_id, text FROM documents
            WHERE doc_id BETWEEN 50 AND 99
          UNION ALL
          SELECT doc_id + 200000, text FROM documents WHERE doc_id < 50),
        s2 AS (SELECT doc_id, md5(text) AS h, ROW_NUMBER() OVER (
            PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM b2),
        f2 AS (SELECT doc_id, h FROM s2 WHERE rn = 1
          AND h NOT IN (SELECT h FROM idx1k)),
        idx2 AS (SELECT * FROM idx1k UNION ALL SELECT * FROM f2),
        b3 AS (SELECT doc_id, text FROM documents
            WHERE doc_id BETWEEN 300 AND 399
          UNION ALL
          SELECT doc_id + 300000, text FROM documents WHERE doc_id < 50),
        s3 AS (SELECT doc_id, md5(text) AS h, ROW_NUMBER() OVER (
            PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM b3)
        SELECT doc_id, (SELECT COUNT(*) FROM idx2) AS n_index_rows
        FROM s3 WHERE rn = 1 AND h NOT IN (SELECT h FROM idx2)
        ORDER BY doc_id"""),
      setup = Some((s, d) => buildDedupLifecycle(s, d))),

    // Composed curation stack (language ∧ length ∧ repetition ∧ quality)
    // in ONE codegen pass — the audit view with per-filter verdicts. The
    // oracle recomputes every signal from scratch and re-derives the
    // conjunction, so both the signals AND the composition are bit-checked.
    Q("q_curate",
      (s, d) => {
        val cfg = graft.operators.Curation.Config(
          allowedLangs = Set("en"), minTokens = 12, maxTokens = 1000,
          maxDupLineFrac = 0.5, minQuality = 0.6, segmentDelim = " ")
        graft.operators.Curation.annotate(Tables.documents(s, d), "text", cfg)
          .select(col("doc_id"), col("lang_ok"), col("len_ok"),
            col("rep_ok"), col("qual_ok"), col("keep"))
          .orderBy(col("doc_id"))
      },
      Some {
        val langs = TA.stopwords.keys.toSeq.sorted
        def scoreSql(l: String) = {
          val list = TA.stopwords(l).map(w => s"'$w'").mkString("[", ",", "]")
          s"""(CAST(len(list_filter(tk, t -> list_contains($list, t)))
              AS DOUBLE) / CAST(GREATEST(len(tk), 1) AS DOUBLE))"""
        }
        val best = s"GREATEST(${langs.map(scoreSql).mkString(", ")})"
        val langPred = langs.reverse.foldLeft("'und'") { (acc, l) =>
          s"CASE WHEN ${scoreSql(l)} = best AND best > 0.0 THEN '$l' ELSE $acc END"
        }
        s"""SELECT doc_id,
          ($langPred) IN ('en') AS lang_ok,
          len(tk) BETWEEN 12 AND 1000 AS len_ok,
          round(CASE WHEN len(segs) > 0 THEN
              1.0 - CAST(len(list_distinct(segs)) AS DOUBLE) / len(segs)
              ELSE 0.0 END, 6) <= 0.5 AS rep_ok,
          round(
            (CASE WHEN len(tk) < 5 THEN 0.2 WHEN len(tk) > 1000 THEN 0.5
                  ELSE 1.0 END) * 0.4 +
            (CASE WHEN mean_word >= 3.0 AND mean_word <= 10.0 THEN 1.0
                  ELSE 0.4 END) * 0.3 +
            alpha_ratio * 0.3, 4) >= 0.6 AS qual_ok,
          (($langPred) IN ('en') AND len(tk) BETWEEN 12 AND 1000 AND
           round(CASE WHEN len(segs) > 0 THEN
               1.0 - CAST(len(list_distinct(segs)) AS DOUBLE) / len(segs)
               ELSE 0.0 END, 6) <= 0.5 AND
           round(
             (CASE WHEN len(tk) < 5 THEN 0.2 WHEN len(tk) > 1000 THEN 0.5
                   ELSE 1.0 END) * 0.4 +
             (CASE WHEN mean_word >= 3.0 AND mean_word <= 10.0 THEN 1.0
                   ELSE 0.4 END) * 0.3 +
             alpha_ratio * 0.3, 4) >= 0.6) AS keep
        FROM (SELECT doc_id, tk, segs, $best AS best,
            CAST(length(text) AS DOUBLE) /
              GREATEST(CAST(len(tk) AS DOUBLE), 1.0) AS mean_word,
            CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
              AS DOUBLE) /
              GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS alpha_ratio
          FROM (SELECT doc_id, text, ${toksSql("text")} AS tk,
            list_filter([trim(x) for x in string_split(text, ' ')],
              x -> x != '') AS segs
            FROM documents))
        ORDER BY doc_id"""
      }),

    // Curation ATTRITION funnel (r17 — the data-card table a released
    // corpus publishes): sequential survivor counts through the
    // annotate stack in declared order plus each filter's solo drop
    // count. Same config as q_curate; the oracle recomputes every
    // verdict from scratch (the q_curate replay) and re-aggregates.
    Q("q_attrition",
      (s, d) => {
        val cfg = graft.operators.Curation.Config(
          allowedLangs = Set("en"), minTokens = 12, maxTokens = 1000,
          maxDupLineFrac = 0.5, minQuality = 0.6, segmentDelim = " ")
        graft.operators.Curation.attrition(Tables.documents(s, d),
          "text", cfg)
      },
      Some {
        val langs = TA.stopwords.keys.toSeq.sorted
        def scoreSql(l: String) = {
          val list = TA.stopwords(l).map(w => s"'$w'")
            .mkString("[", ",", "]")
          s"""(CAST(len(list_filter(tk, t -> list_contains($list, t)))
              AS DOUBLE) / CAST(GREATEST(len(tk), 1) AS DOUBLE))"""
        }
        val best = s"GREATEST(${langs.map(scoreSql).mkString(", ")})"
        val langPred = langs.reverse.foldLeft("'und'") { (acc, l) =>
          s"CASE WHEN ${scoreSql(l)} = best AND best > 0.0 " +
            s"THEN '$l' ELSE $acc END"
        }
        s"""WITH cfl AS (SELECT doc_id,
          ($langPred) IN ('en') AS lang_ok,
          len(tk) BETWEEN 12 AND 1000 AS len_ok,
          round(CASE WHEN len(segs) > 0 THEN
              1.0 - CAST(len(list_distinct(segs)) AS DOUBLE) / len(segs)
              ELSE 0.0 END, 6) <= 0.5 AS rep_ok,
          round(
            (CASE WHEN len(tk) < 5 THEN 0.2 WHEN len(tk) > 1000 THEN 0.5
                  ELSE 1.0 END) * 0.4 +
            (CASE WHEN mean_word >= 3.0 AND mean_word <= 10.0 THEN 1.0
                  ELSE 0.4 END) * 0.3 +
            alpha_ratio * 0.3, 4) >= 0.6 AS qual_ok
        FROM (SELECT doc_id, tk, segs, $best AS best,
            CAST(length(text) AS DOUBLE) /
              GREATEST(CAST(len(tk) AS DOUBLE), 1.0) AS mean_word,
            CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
              AS DOUBLE) /
              GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS alpha_ratio
          FROM (SELECT doc_id, text, ${toksSql("text")} AS tk,
            list_filter([trim(x) for x in string_split(text, ' ')],
              x -> x != '') AS segs
            FROM documents)))
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
          CAST(SUM(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT)
            AS after_lang,
          CAST(SUM(CASE WHEN lang_ok AND len_ok THEN 1 ELSE 0 END)
            AS BIGINT) AS after_len,
          CAST(SUM(CASE WHEN lang_ok AND len_ok AND rep_ok
            THEN 1 ELSE 0 END) AS BIGINT) AS after_rep,
          CAST(SUM(CASE WHEN lang_ok AND len_ok AND rep_ok AND qual_ok
            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          CAST(SUM(CASE WHEN NOT lang_ok THEN 1 ELSE 0 END) AS BIGINT)
            AS drop_lang,
          CAST(SUM(CASE WHEN NOT len_ok THEN 1 ELSE 0 END) AS BIGINT)
            AS drop_len,
          CAST(SUM(CASE WHEN NOT rep_ok THEN 1 ELSE 0 END) AS BIGINT)
            AS drop_rep,
          CAST(SUM(CASE WHEN NOT qual_ok THEN 1 ELSE 0 END) AS BIGINT)
            AS drop_qual,
          ROUND(CAST(SUM(CASE WHEN lang_ok AND len_ok AND rep_ok
              AND qual_ok THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
            AS keep_rate
        FROM cfl"""
      }),

    // C4-style bad-word/phrase blocklist (Raffel 2020 §2.2 — drop any
    // page containing a listed word or phrase). Token-stream matching,
    // not substring ("ass" never hits "class"); multi-word phrases
    // match as consecutive tokens. The literal tier (one arrays_overlap
    // per phrase length, zero shuffle) produces the verdicts; the
    // broadcast-semi big-list tier is asserted id-identical in
    // OperatorsSpec. The oracle replays shingle membership per length,
    // so every verdict is bit-checked.
    Q("q_curate_badwords",
      (s, d) => Tables.documents(s, d).select(col("doc_id"),
          graft.operators.Curation.phraseHit(col("text"),
            Seq("slow", "big data", "hash join")).as("blocked"))
        .orderBy(col("doc_id")),
      Some(s"""WITH tk AS (
          SELECT doc_id, ${toksSql("text")} AS tk FROM documents),
        sh AS (SELECT doc_id, ${shinglesSql("tk", 1)} AS s1,
            ${shinglesSql("tk", 2)} AS s2
          FROM tk)
        SELECT doc_id,
          len(list_filter(s1, x -> list_contains(['slow'], x))) > 0 OR
          len(list_filter(s2, x -> list_contains(
            ['big data', 'hash join'], x))) > 0 AS blocked
        FROM sh ORDER BY doc_id""")),

    // Supervised quality/routing classifier (the fastText tier of LLM
    // data pipelines): multinomial Naive Bayes trained on the 80% split
    // (doc_id % 5 != 0) with lang as the class, scoring the held-out 20%.
    // Every per-token ln rides as a 1e6-scaled long, so the oracle
    // replays the exact argmax (prediction, winning score, token count,
    // and the correctness flag are all bit-checked).
    Q("q_nb_classify",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tr = docs.filter(col("doc_id") % 5 =!= 0)
        val te = docs.filter(col("doc_id") % 5 === 0)
        graft.operators.Classifier
          .nbClassify(tr, te, "text", "lang", "doc_id")
          .join(te.select(col("doc_id"), col("lang").as("actual")),
            Seq("doc_id"))
          .withColumn("correct", col("pred") === col("actual"))
          .orderBy(col("doc_id"))
      },
      Some {
        def u6(x: String) =
          s"CAST(ROUND(ROUND(LN($x), 6) * 1e6) AS BIGINT)"
        s"""WITH tr AS (SELECT doc_id, lang, ${toksSql("text")} AS tk
              FROM documents WHERE doc_id % 5 <> 0),
          te AS (SELECT doc_id, lang, ${toksSql("text")} AS tk
              FROM documents WHERE doc_id % 5 = 0),
          trtok AS (SELECT lang, unnest(tk) AS t FROM tr),
          ct AS (SELECT lang, t, COUNT(*) AS c FROM trtok GROUP BY 1, 2),
          lt AS (SELECT lang, COUNT(*) AS tot FROM trtok GROUP BY 1),
          nd AS (SELECT lang, COUNT(*) AS ndc FROM tr GROUP BY 1),
          na AS (SELECT COUNT(*) AS n FROM tr),
          vv AS (SELECT COUNT(DISTINCT t) AS v FROM trtok),
          lbl AS (SELECT nd.lang, COALESCE(lt.tot, 0) AS tot,
              ${u6("CAST(nd.ndc AS DOUBLE) / CAST(na.n AS DOUBLE)")} AS pu
            FROM nd LEFT JOIN lt ON lt.lang = nd.lang CROSS JOIN na),
          tt AS (SELECT doc_id, unnest(tk) AS t FROM te),
          sc AS (SELECT tt.doc_id, l.lang, l.pu,
              ${u6("""(CAST(COALESCE(c.c, 0) AS DOUBLE) + 1.0) /
                (CAST(l.tot AS DOUBLE) + 1.0 * vv.v)""")} AS u
            FROM tt CROSS JOIN lbl l
            LEFT JOIN ct c ON c.lang = l.lang AND c.t = tt.t
            CROSS JOIN vv),
          pc AS (SELECT doc_id, lang, pu, CAST(SUM(u) AS BIGINT) AS su,
              COUNT(*) AS ntok
            FROM sc GROUP BY 1, 2, 3),
          anch AS (SELECT te.doc_id, l.lang,
              l.pu + COALESCE(pc.su, 0) AS score_u,
              COALESCE(pc.ntok, 0) AS n_tokens
            FROM te CROSS JOIN lbl l
            LEFT JOIN pc ON pc.doc_id = te.doc_id AND pc.lang = l.lang),
          rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score_u DESC, lang ASC) AS rn FROM anch)
        SELECT r.doc_id, r.lang AS pred, r.score_u, r.n_tokens,
          te.lang AS actual, (r.lang = te.lang) AS correct
        FROM rk r JOIN te ON r.doc_id = te.doc_id
        WHERE r.rn = 1
        ORDER BY r.doc_id"""
      }),

    // Pruned-vocabulary NB (minCount = 3): tokens with total train count
    // < 3 leave the model — V shrinks, label token-mass shrinks to the
    // survivors, pruned/unseen tokens score the smoothed zero. This is
    // the 100 TB path (Zipf tail off the count table before the scoring
    // join); the oracle re-derives the pruned model from scratch so the
    // pruning semantics are bit-checked, not just "runs".
    Q("q_nb_classify_pruned",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tr = docs.filter(col("doc_id") % 5 =!= 0)
        val te = docs.filter(col("doc_id") % 5 === 0)
        graft.operators.Classifier
          .nbClassify(tr, te, "text", "lang", "doc_id", minCount = 3L)
          .orderBy(col("doc_id"))
      },
      Some {
        def u6(x: String) =
          s"CAST(ROUND(ROUND(LN($x), 6) * 1e6) AS BIGINT)"
        s"""WITH tr AS (SELECT doc_id, lang, ${toksSql("text")} AS tk
              FROM documents WHERE doc_id % 5 <> 0),
          te AS (SELECT doc_id, lang, ${toksSql("text")} AS tk
              FROM documents WHERE doc_id % 5 = 0),
          trtok AS (SELECT lang, unnest(tk) AS t FROM tr),
          ctall AS (SELECT lang, t, COUNT(*) AS c FROM trtok GROUP BY 1, 2),
          tokt AS (SELECT t, SUM(c) AS ttot FROM ctall GROUP BY 1),
          ct AS (SELECT ctall.lang, ctall.t, ctall.c FROM ctall
            JOIN tokt ON ctall.t = tokt.t WHERE tokt.ttot >= 3),
          lt AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot
            FROM ct GROUP BY 1),
          nd AS (SELECT lang, COUNT(*) AS ndc FROM tr GROUP BY 1),
          na AS (SELECT COUNT(*) AS n FROM tr),
          vv AS (SELECT COUNT(DISTINCT t) AS v FROM ct),
          lbl AS (SELECT nd.lang, COALESCE(lt.tot, 0) AS tot,
              ${u6("CAST(nd.ndc AS DOUBLE) / CAST(na.n AS DOUBLE)")} AS pu
            FROM nd LEFT JOIN lt ON lt.lang = nd.lang CROSS JOIN na),
          tt AS (SELECT doc_id, unnest(tk) AS t FROM te),
          sc AS (SELECT tt.doc_id, l.lang, l.pu,
              ${u6("""(CAST(COALESCE(c.c, 0) AS DOUBLE) + 1.0) /
                (CAST(l.tot AS DOUBLE) + 1.0 * vv.v)""")} AS u
            FROM tt CROSS JOIN lbl l
            LEFT JOIN ct c ON c.lang = l.lang AND c.t = tt.t
            CROSS JOIN vv),
          pc AS (SELECT doc_id, lang, pu, CAST(SUM(u) AS BIGINT) AS su,
              COUNT(*) AS ntok
            FROM sc GROUP BY 1, 2, 3),
          anch AS (SELECT te.doc_id, l.lang,
              l.pu + COALESCE(pc.su, 0) AS score_u,
              COALESCE(pc.ntok, 0) AS n_tokens
            FROM te CROSS JOIN lbl l
            LEFT JOIN pc ON pc.doc_id = te.doc_id AND pc.lang = l.lang),
          rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score_u DESC, lang ASC) AS rn FROM anch)
        SELECT doc_id, lang AS pred, score_u, n_tokens
        FROM rk WHERE rn = 1
        ORDER BY doc_id"""
      }))

  /** DuckDB cosine between a.embedding and b.embedding (per-pair, double,
    * left-to-right sums — mirrors Vectors.cosine). */
  private def pairCosSql: String = cosSql("a.embedding", "b.embedding")
  private def qaCosSql: String = cosSql("q.embedding", "a.embedding")
  private def cosSql(u: String, v: String): String = {
    def dot(x: String, y: String) =
      s"""list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)
          for i in generate_series(1, len($x))])"""
    s"(${dot(u, v)}) / (SQRT(${dot(u, u)}) * SQRT(${dot(v, v)}))"
  }
}
