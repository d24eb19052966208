package graft.queries

import graft.{Par, ParSql, Q, Tables}
import graft.functions.Scalars
import org.apache.spark.sql.functions._

/** Predicate-surface coverage (SURVEY §2.2; reference `FilterKind.java:21-41`
  * and the `operator/filter/` family). All predicates are plain Catalyst
  * expressions, so pushdown reaches the parquet scan (PushedFilters) —
  * the Spark analog of the reference's inverted/sorted/range index pruning. */
object FilterQueries {

  /** The synthesized per-order JSON doc shared by every json gate: the
    * oracle can state ground truth on the raw orders columns while
    * Spark exercises the real json machinery. */
  private def ordersJsonDoc: org.apache.spark.sql.Column = concat(
    lit("""{"meta":{"pri":""""), col("o_orderpriority"),
    lit(""""},"tags":[{"p":""""), col("o_orderstatus"),
    lit("""","n":"""), (col("o_custkey") % 5).cast("string"),
    lit("""},{"p":"X","n":2}]}"""))

  private val ordersJsonSchema = org.apache.spark.sql.types.StructType
    .fromDDL("meta struct<pri:string>, tags array<struct<p:string,n:double>>")

  /** STORED json docs (parquet round-trip — index registration binds to
    * leaf columns, exactly the reference, where the indexed column
    * lives in the segment) with the posting table registered for
    * routing; shared by the three routed json gates so the doc shape /
    * registration can never diverge between them. Returns the docs
    * frame registered under `view`. */
  private def registeredJsonDocs(s: org.apache.spark.sql.SparkSession,
      d: String, view: String): org.apache.spark.sql.DataFrame = {
    val dir = new java.io.File(s"/tmp/graft_jmdocs_${math.abs(d.hashCode)}")
    if (!dir.exists()) {
      Tables.orders(s, d).withColumn("doc", ordersJsonDoc)
        .write.mode("overwrite").parquet(dir.getPath)
    }
    val docs = s.read.parquet(dir.getPath)
    graft.rules.JsonIndexCatalog.clear()
    graft.rules.JsonIndexCatalog.register(docs, "doc", "o_orderkey",
      graft.operators.JsonIndex.cachedPostings(
        docs, "doc", "o_orderkey", ordersJsonSchema,
        cacheKey = Some(s"$d:orders.doc.routed")),
      docs.select(col("o_orderkey")).distinct())
    docs.createOrReplaceTempView(view)
    docs
  }

  /** Documents with the positional text index registered for routing;
    * shared by the three routed text gates. */
  private def registeredTextDocs(s: org.apache.spark.sql.SparkSession,
      d: String, view: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
    graft.rules.TextIndexCatalog.clear()
    graft.rules.TextIndexCatalog.register(docs, "text", "doc_id",
      graft.operators.HybridTable.positionalTextIndex(
        docs, "text", "doc_id"),
      docs.select(col("doc_id")).distinct())
    docs.createOrReplaceTempView(view)
    docs
  }

  val all: Seq[Q] = Seq(

    // AND / OR / NOT (And/Or/NotFilterOperator)
    Q("q_filter_and_or_not",
      (s, d) => Tables.lineitem(s, d)
        .filter((col("l_returnflag") === "A" || col("l_returnflag") === "N")
          && !(col("l_linestatus") === "F")
          && col("l_quantity").between(10, 20))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), Par.dsum(col("l_quantity")).as("sum_qty")),
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
        ${ParSql.dsum("l_quantity")} AS sum_qty FROM lineitem
        WHERE (l_returnflag = 'A' OR l_returnflag = 'N')
          AND NOT (l_linestatus = 'F')
          AND l_quantity BETWEEN 10 AND 20
        GROUP BY l_returnflag""")),

    // IN / NOT_IN (BitmapBasedFilterOperator / InPredicateEvaluator)
    Q("q_filter_in_notin",
      (s, d) => Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#1", "Brand#7", "Brand#13")
          && !col("p_size").isin(1, 2, 3))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"),
          min(col("p_size")).as("min_size")),
      Some("""SELECT p_brand, COUNT(*) AS n, MIN(p_size) AS min_size
        FROM part WHERE p_brand IN ('Brand#1','Brand#7','Brand#13')
          AND p_size NOT IN (1,2,3) GROUP BY p_brand""")),

    // LIKE (LikePredicateEvaluator)
    Q("q_filter_like",
      (s, d) => Tables.part(s, d)
        .filter(col("p_name").like("%red%") || col("p_type").like("PRO%"))
        .groupBy(col("p_type")).agg(count(lit(1)).as("n")),
      Some("""SELECT p_type, COUNT(*) AS n FROM part
        WHERE p_name LIKE '%red%' OR p_type LIKE 'PRO%' GROUP BY p_type""")),

    // REGEXP_LIKE (RegexpLikePredicateEvaluator)
    Q("q_filter_regexp",
      (s, d) => Tables.documents(s, d)
        .filter(col("text").rlike("spark\\s+(join|merge|filter)"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n")),
      Some("""SELECT lang, COUNT(*) AS n FROM documents
        WHERE regexp_matches(text, 'spark\s+(join|merge|filter)')
        GROUP BY lang""")),

    // IS_NULL / IS_NOT_NULL (null-vector probe; nulls synthesized since
    // the testdata is null-free, matching Pinot's default no-null posture)
    Q("q_filter_null",
      (s, d) => Tables.lineitem(s, d)
        .withColumn("d", nullif(col("l_discount"), lit(0.0)))
        .groupBy(col("l_returnflag")).agg(
          count(when(col("d").isNull, 1)).as("n_null"),
          count(when(col("d").isNotNull, 1)).as("n_notnull"),
          count(col("d")).as("count_skips_null")),
      Some("""SELECT l_returnflag,
        COUNT(CASE WHEN d IS NULL THEN 1 END) AS n_null,
        COUNT(CASE WHEN d IS NOT NULL THEN 1 END) AS n_notnull,
        COUNT(d) AS count_skips_null
        FROM (SELECT l_returnflag, NULLIF(l_discount, 0.0) AS d
          FROM lineitem) GROUP BY l_returnflag""")),

    // computed-expression filter (ExpressionFilterOperator)
    Q("q_filter_expr",
      (s, d) => Tables.lineitem(s, d)
        .filter((Par.money(col("l_extendedprice")) *
          (Par.oneD - Par.pct(col("l_discount")))) > 55000)
        .agg(count(lit(1)).as("n"),
          Par.dsum(col("l_extendedprice")).as("sum_price")),
      Some(s"""SELECT COUNT(*) AS n, ${ParSql.dsum("l_extendedprice")}
        AS sum_price FROM lineitem
        WHERE ${ParSql.money("l_extendedprice")} *
          (${ParSql.oneD} - ${ParSql.pct("l_discount")}) > 55000""")),

    // time-range predicate (TimeSegmentPruner territory — at scale this is
    // the partition-pruning column)
    Q("q_filter_time_range",
      (s, d) => Tables.events(s, d)
        .filter(col("ts").between(lit("2024-01-10 00:00:00"),
          lit("2024-01-20 23:59:59")))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"),
          Par.dsum(col("value")).as("sum_val")),
      Some(Par.evOracle(s"""SELECT event_type, COUNT(*) AS n,
        ${ParSql.dsum("value")} AS sum_val FROM ev
        WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
          AND TIMESTAMP '2024-01-20 23:59:59'
        GROUP BY event_type"""))),

    // TEXT_CONTAINS (TextContainsFilterOperator — native text contains)
    Q("q_filter_text_contains",
      (s, d) => Tables.documents(s, d)
        .filter(col("text").contains("vector") && col("text").contains("hash"))
        .groupBy(col("source")).agg(count(lit(1)).as("n")),
      Some("""SELECT source, COUNT(*) AS n FROM documents
        WHERE contains(text, 'vector') AND contains(text, 'hash')
        GROUP BY source""")),

    // TEXT_MATCH approximation (Lucene phrase → token-sequence regex)
    Q("q_filter_text_match",
      (s, d) => Tables.documents(s, d)
        .filter(col("text").rlike("\\bquery\\b") &&
          col("text").rlike("\\bplan\\b|\\bscan\\b"))
        .agg(count(lit(1)).as("n")),
      Some("""SELECT COUNT(*) AS n FROM documents
        WHERE regexp_matches(text, '\bquery\b')
          AND regexp_matches(text, '\bplan\b|\bscan\b')""")),

    // Lucene-grammar TEXT_MATCH (TextMatchFilterOperator query syntax:
    // boolean + phrase + prefix wildcard + parens) compiled onto the
    // positional inverted index — postings joins, never a corpus scan.
    // Oracle replays the same tokenization in DuckDB list ops.
    Q("q_filter_text_lucene",
      (s, d) => graft.operators.TextMatch.luceneMatch(
          Tables.documents(s, d), "text", "doc_id",
          """"table part" AND str* OR (vector AND NOT slow)""")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id FROM (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
            t -> length(t) > 0) AS tk FROM documents) t
        WHERE (len(list_filter(range(1, len(tk)),
                 i -> tk[i] = 'table' AND tk[i+1] = 'part')) > 0
               AND len(list_filter(tk, w -> starts_with(w, 'str'))) > 0)
           OR (list_contains(tk, 'vector')
               AND NOT list_contains(tk, 'slow'))
        ORDER BY doc_id""")),

    // TEXT_MATCH mid-word wildcards (Lucene WildcardQuery: `*` any run,
    // `?` one char — TextSearchQueriesTest wildcard shapes). Compiled as
    // a LIKE probe over the postings token column; oracle replays the
    // token LIKE in DuckDB.
    Q("q_filter_text_wildcard",
      (s, d) => graft.operators.TextMatch.luceneMatch(
          Tables.documents(s, d), "text", "doc_id",
          "v?ctor AND st*m OR (c*mn AND NOT s?an)")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id FROM (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
            t -> length(t) > 0) AS tk FROM documents) t
        WHERE (len(list_filter(tk, w -> w LIKE 'v_ctor')) > 0
               AND len(list_filter(tk, w -> w LIKE 'st%m')) > 0)
           OR (len(list_filter(tk, w -> w LIKE 'c%mn')) > 0
               AND NOT len(list_filter(tk, w -> w LIKE 's_an')) > 0)
        ORDER BY doc_id""")),

    // TEXT_MATCH fuzzy terms (Lucene FuzzyQuery `term~N`): levenshtein
    // resolved on the distinct-token vocabulary, semi-joined back onto
    // the postings. Oracle replays levenshtein over DuckDB token lists.
    Q("q_filter_text_fuzzy",
      (s, d) => graft.operators.TextMatch.luceneMatch(
          Tables.documents(s, d), "text", "doc_id",
          "quary~1 OR (vektor~1 AND NOT slow)")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id FROM (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
            t -> length(t) > 0) AS tk FROM documents) t
        WHERE len(list_filter(tk, w -> levenshtein(w, 'quary') <= 1)) > 0
           OR (len(list_filter(tk, w -> levenshtein(w, 'vektor') <= 1)) > 0
               AND NOT list_contains(tk, 'slow'))
        ORDER BY doc_id""")),

    // JSON_MATCH with nested paths and [*] array predicates
    // (JsonMatchFilterOperator + json index; '"$.arr[*].k" = ''v''' shapes
    // from JsonIndexTest). The JSON doc is synthesized per row from orders
    // columns, so the oracle can state the ground truth directly on the
    // raw columns while Spark exercises the real json-path machinery.
    Q("q_filter_json_array",
      (s, d) => {
        Tables.orders(s, d).withColumn("doc", ordersJsonDoc)
          .filter(
            (Scalars.jsonMatch(col("doc"), """"$.tags[*].p" = 'F'""") &&
              Scalars.jsonMatch(col("doc"), """"$.tags[*].n" > 3""")) ||
            Scalars.jsonMatch(col("doc"), """"$.meta.pri" = '1-URGENT'"""))
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
        WHERE (o_orderstatus = 'F' AND (o_custkey % 5) > 3)
           OR o_orderpriority = '1-URGENT'
        GROUP BY o_orderpriority""")),

    // TEXT_MATCH through the SQL surface WITH a registered postings index:
    // TextMatchRoute lowers the filter to a semi-join against the compiled
    // doc-id set (the reference's always-on index path). Same oracle
    // discipline as the per-row text gates, so the routed plan is
    // hash-checked against DuckDB replaying the token predicates.
    Q("q_filter_text_routed",
      (s, d) => {
        registeredTextDocs(s, d, "documents_tm")
        s.sql("""SELECT doc_id FROM documents_tm
          WHERE text_match(text, '"merge join" OR qu?ry AND NOT slow')
          ORDER BY doc_id""")
      },
      Some("""SELECT doc_id FROM (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
            t -> length(t) > 0) AS tk FROM documents) t
        WHERE len(list_filter(range(1, len(tk)),
                i -> tk[i] = 'merge' AND tk[i+1] = 'join')) > 0
           OR (len(list_filter(tk, w -> w LIKE 'qu_ry')) > 0
               AND NOT list_contains(tk, 'slow'))
        ORDER BY doc_id""")),

    // An OR of two separate TEXT_MATCH calls through the SQL surface,
    // routed as posting-set algebra (id-set union — the reference's
    // bitmap OR across filter operators): each side compiles against
    // the registered postings, the union probes as ONE semi-join. The
    // oracle replays both token predicates, so the set-union plan is
    // hash-checked; TextMatchRouteSpec asserts the LeftSemi shape.
    Q("q_filter_text_or_routed",
      (s, d) => {
        registeredTextDocs(s, d, "documents_tmo")
        s.sql("""SELECT doc_id FROM documents_tmo
          WHERE text_match(text, 'qu?ry AND NOT slow')
             OR text_match(text, '"merge join"')
          ORDER BY doc_id""")
      },
      Some("""SELECT doc_id FROM (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
            t -> length(t) > 0) AS tk FROM documents) t
        WHERE (len(list_filter(tk, w -> w LIKE 'qu_ry')) > 0
               AND NOT list_contains(tk, 'slow'))
           OR len(list_filter(range(1, len(tk)),
                i -> tk[i] = 'merge' AND tk[i+1] = 'join')) > 0
        ORDER BY doc_id""")),

    // Plan-level NOT over a marker TREE, routed as a universe complement
    // (the reference's ANDNOT over posting bitmaps): NOT(a OR b) pushes
    // De Morgan in set space to (U \ ids(a)) ∩ (U \ ids(b)) and probes
    // ONE semi-join id set — the corpus text is never re-read for the
    // negation (an anti-scan at 100 TB would be a full-corpus Lucene
    // walk; here it is an id-column anti-join). The first marker also
    // carries an IN-GRAMMAR OR + wildcard, so both NOT tiers (grammar
    // universe anti-join inside compile, plan-level complement in the
    // route) compose in one query. Oracle replays the token predicates
    // under classical two-valued NOT — valid because marker leaves
    // collapse NULL text to false, matching "absent from the postings".
    Q("q_filter_text_not_routed",
      (s, d) => {
        registeredTextDocs(s, d, "documents_tmn")
        s.sql("""SELECT doc_id FROM documents_tmn
          WHERE NOT (text_match(text, 'slow OR qu?ry')
                  OR text_match(text, '"merge join"'))
          ORDER BY doc_id""")
      },
      Some("""SELECT doc_id FROM (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
            t -> length(t) > 0) AS tk FROM documents) t
        WHERE NOT (list_contains(tk, 'slow')
               OR len(list_filter(tk, w -> w LIKE 'qu_ry')) > 0
               OR len(list_filter(range(1, len(tk)),
                    i -> tk[i] = 'merge' AND tk[i+1] = 'join')) > 0)
        ORDER BY doc_id""")),

    // Marker OR'd with an ORDINARY predicate, routed (the reference's
    // OrFilterOperator unions a bitmap child with a scan child —
    // pinot-core/…/operator/filter/OrFilterOperator.java, heterogeneous
    // children ordered by FilterOperatorUtils.java:183): the posting set
    // of the marker leg unions with ids(σ residual over the id-projected
    // scan) — the residual stays a pushable scan predicate on its own
    // branch — and ONE LEFT SEMI probes the combined id set. At 100 TB
    // the text is read only by the postings build, never by the OR.
    Q("q_filter_text_or_mixed",
      (s, d) => {
        registeredTextDocs(s, d, "documents_tmm")
        val q = s.sql("""SELECT doc_id FROM documents_tmm
          WHERE text_match(text, '"merge join"') OR n_chars < 120
          ORDER BY doc_id""")
        // plan-asserted: routed semi-join, no per-row token probe
        val plan = q.queryExecution.executedPlan.toString
        require(plan.contains("LeftSemi"),
          s"mixed OR did not route:\n$plan")
        q
      },
      Some("""SELECT doc_id FROM (
          SELECT doc_id, n_chars,
            list_filter(string_split_regex(lower(text), '\s+'),
            t -> length(t) > 0) AS tk FROM documents) t
        WHERE len(list_filter(range(1, len(tk)),
                i -> tk[i] = 'merge' AND tk[i+1] = 'join')) > 0
           OR n_chars < 120
        ORDER BY doc_id""")),

    // Same JSON_MATCH compound predicate as q_filter_json_array, routed
    // through the JSON index analog (json posting table from ONE from_json
    // parse, one-pass predicate flags) instead of per-row jsonpath — the
    // reference always answers JSON_MATCH from the json index. Oracle is
    // identical, so the two formulations are cross-checked.
    Q("q_filter_json_indexed",
      (s, d) => {
        val docs = Tables.orders(s, d).withColumn("doc", ordersJsonDoc)
        val idx = graft.operators.JsonIndex.cachedPostings(
          docs, "doc", "o_orderkey", ordersJsonSchema,
          cacheKey = Some(s"$d:orders.doc")) // ingest-time build, reused
        val f = graft.operators.JsonIndex.flags(idx, "o_orderkey", Seq(
          """"$.tags[*].p" = 'F'""",
          """"$.tags[*].n" > 3""",
          """"$.meta.pri" = '1-URGENT'"""))
        val ids = f.filter((col("p0") && col("p1")) || col("p2"))
          .select(col("o_orderkey"))
        Tables.orders(s, d).join(ids, Seq("o_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
        WHERE (o_orderstatus = 'F' AND (o_custkey % 5) > 3)
           OR o_orderpriority = '1-URGENT'
        GROUP BY o_orderpriority""")),

    // Table-config-driven indexing (IndexingConfig analog): the text index
    // is DECLARED in the sidecar config, built+persisted on first open,
    // loaded on later opens, and registered automatically — zero per-query
    // wiring, the reference's always-on index lifecycle. Oracle replays
    // the token predicates, so the whole config→build→route path is
    // hash-checked.
    Q("q_indexed_table",
      (s, d) => {
        import graft.sources.IndexedTable
        val root = s"/tmp/graft_ixroot_${math.abs(d.hashCode)}"
        if (!new java.io.File(root).exists())
          IndexedTable.writeConfig(s, root, IndexedTable.Config(
            text = Seq(IndexedTable.TextIdx("text", "doc_id"))))
        graft.rules.TextIndexCatalog.clear()
        IndexedTable.reset()
        val df = IndexedTable.open(s, s"$d/documents.parquet", Some(root))
        df.createOrReplaceTempView("documents_ix")
        s.sql("""SELECT doc_id FROM documents_ix
          WHERE text_match(text, 'vector AND NOT slow')
          ORDER BY doc_id""")
      },
      Some("""SELECT doc_id FROM (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
            t -> length(t) > 0) AS tk FROM documents) t
        WHERE list_contains(tk, 'vector') AND NOT list_contains(tk, 'slow')
        ORDER BY doc_id""")),

    // JSON_MATCH through the SQL surface WITH a registered posting table:
    // JsonIndexRoute lowers each filter conjunct to a semi-join against
    // the matching doc-id set (the reference's always-on json-index path).
    // The json column is STORED (parquet round-trip) because index
    // registration binds to leaf columns — exactly the reference, where
    // the indexed column lives in the segment. Same oracle as the other
    // json gates, so the routed plan is hash-checked too.
    Q("q_filter_json_routed",
      (s, d) => {
        registeredJsonDocs(s, d, "orders_jm")
        s.sql("""SELECT o_orderpriority, COUNT(*) AS n FROM orders_jm
          WHERE json_match(doc, '"$.tags[*].p" = ''F''')
            AND json_match(doc, '"$.tags[*].n" > 3')
          GROUP BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
        WHERE o_orderstatus = 'F' AND (o_custkey % 5) > 3
        GROUP BY o_orderpriority""")),

    // The FULL q_filter_json_array predicate — (tags[*].p='F' AND
    // tags[*].n>3) OR meta.pri='1-URGENT' — through the SQL surface with
    // the registered posting table: JsonIndexRoute compiles the whole
    // AND/OR marker tree into posting-set algebra (∩ = keyed semi-join,
    // ∪ = id-set union — the reference's bitmap AND/OR in
    // JsonMatchFilterOperator) and probes ONE combined id set. Same
    // oracle as q_filter_json_array, so the set-algebra plan is
    // hash-checked against the per-row twin; JsonIndexRouteSpec asserts
    // the LEFT SEMI shape for this exact predicate tree.
    Q("q_filter_json_array_routed",
      (s, d) => {
        registeredJsonDocs(s, d, "orders_jm_arr")
        s.sql("""SELECT o_orderpriority, COUNT(*) AS n FROM orders_jm_arr
          WHERE (json_match(doc, '"$.tags[*].p" = ''F''')
             AND json_match(doc, '"$.tags[*].n" > 3'))
             OR json_match(doc, '"$.meta.pri" = ''1-URGENT''')
          GROUP BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
        WHERE (o_orderstatus = 'F' AND (o_custkey % 5) > 3)
           OR o_orderpriority = '1-URGENT'
        GROUP BY o_orderpriority""")),

    // Plan-level NOT over a JSON marker tree, routed as the universe
    // complement (reference: ANDNOT over JsonMatchFilterOperator's
    // posting bitmaps). De Morgan pushes the NOT to the leaves in set
    // space; the probe is still ONE semi-join against the combined id
    // set — the json corpus is never re-parsed for the negation. Docs
    // lacking a path have no posting and so fall in the complement,
    // exactly the per-row two-valued lowering's answer; here every doc
    // carries both paths, so the oracle is plain boolean algebra on the
    // source columns.
    Q("q_filter_json_not_routed",
      (s, d) => {
        registeredJsonDocs(s, d, "orders_jm_not")
        s.sql("""SELECT o_orderpriority, COUNT(*) AS n FROM orders_jm_not
          WHERE NOT (json_match(doc, '"$.tags[*].p" = ''F''')
                  OR json_match(doc, '"$.meta.pri" = ''1-URGENT'''))
          GROUP BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
        WHERE NOT (o_orderstatus = 'F' OR o_orderpriority = '1-URGENT')
        GROUP BY o_orderpriority""")),

    // Marker OR'd with an ORDINARY predicate on the json side — same
    // OrFilterOperator union shape as q_filter_text_or_mixed: posting
    // ids of the marker leg ∪ ids(σ residual over the id-projected
    // scan), one LEFT SEMI, the residual pushed to its own scan branch.
    Q("q_filter_json_or_mixed",
      (s, d) => {
        registeredJsonDocs(s, d, "orders_jmx")
        val q = s.sql("""SELECT o_orderkey FROM orders_jmx
          WHERE json_match(doc, '"$.meta.pri" = ''1-URGENT''')
             OR o_totalprice < 2000
          ORDER BY o_orderkey""")
        require(q.queryExecution.executedPlan.toString.contains("LeftSemi"),
          "mixed json OR did not route")
        q
      },
      Some("""SELECT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT' OR o_totalprice < 2000
        ORDER BY o_orderkey""")),

    // The MATERIALIZED json index: postings written path-partitioned to
    // disk once (the reference's index lives in the segment), predicates
    // answered from the parquet postings via per-predicate id lookups +
    // keyed set algebra — each lookup prunes to one path directory.
    // Same oracle as q_filter_json_array again, so the disk path is
    // hash-checked too.
    Q("q_filter_json_disk",
      (s, d) => {
        val dir = new java.io.File(
          s"/tmp/graft_jsonidx_${math.abs(d.hashCode)}")
        if (!dir.exists()) {
          graft.operators.JsonIndex.materialize(
            graft.operators.JsonIndex.postings(
              Tables.orders(s, d).withColumn("doc", ordersJsonDoc),
              "doc", "o_orderkey", ordersJsonSchema),
            dir.getPath)
        }
        val idx = s.read.parquet(dir.getPath)
        val universe = Tables.orders(s, d).select(col("o_orderkey"))
        def ids(p: String) = graft.operators.JsonIndex.matchIds(
          idx, universe, "o_orderkey", p)
        val matched = ids(""""$.tags[*].p" = 'F'""")
          .join(ids(""""$.tags[*].n" > 3"""), Seq("o_orderkey"), "left_semi")
          .unionByName(ids(""""$.meta.pri" = '1-URGENT'""")).distinct()
        Tables.orders(s, d).join(matched, Seq("o_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
        WHERE (o_orderstatus = 'F' AND (o_custkey % 5) > 3)
           OR o_orderpriority = '1-URGENT'
        GROUP BY o_orderpriority""")),

    // JSON-index lifecycle (same IncrementalIndex protocol as the text
    // and IVF indexes, with staged moves preserving the path= partition
    // dirs): build from the even-key half, append the odd half, REPLAY
    // the append, tombstone every 10th order, compact TWICE, answer a
    // path predicate from the surviving postings. The filter on the
    // partition column prunes to ONE path= dir — the property appends
    // must preserve. Oracle = the expected final corpus queried on the
    // source columns directly.
    Q("q_json_index_lifecycle",
      (s, d) => {
        import graft.sources.JsonIndexLifecycle
        val root =
          s"target/graft_jsonidx_lc_${CorpusKey.of(d)}"
        JsonIndexLifecycle.deleteRoot(root)
        val docs = Tables.orders(s, d).withColumn("doc", ordersJsonDoc)
        JsonIndexLifecycle.append(s, root, "doc", "o_orderkey", ordersJsonSchema,
          docs.filter(col("o_orderkey") % 2 === 0), "b_even")
        JsonIndexLifecycle.append(s, root, "doc", "o_orderkey", ordersJsonSchema,
          docs.filter(col("o_orderkey") % 2 === 1), "b_odd")
        JsonIndexLifecycle.append(s, root, "doc", "o_orderkey", ordersJsonSchema,
          docs.filter(col("o_orderkey") % 2 === 1), "b_odd") // replay
        JsonIndexLifecycle.delete(s, root, "doc",
          docs.filter(col("o_orderkey") % 10 === 0)
            .select(col("o_orderkey")), "o_orderkey", "d1")
        JsonIndexLifecycle.compact(s, root, "doc", "o_orderkey")
        JsonIndexLifecycle.compact(s, root, "doc", "o_orderkey") // replay
        JsonIndexLifecycle.load(s, root, "doc", "o_orderkey")
          .filter(col("path") === "$.meta.pri" &&
            col("value") === "1-URGENT")
          .select(col("o_orderkey")).orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey FROM orders
        WHERE o_orderkey % 10 != 0 AND o_orderpriority = '1-URGENT'
        ORDER BY o_orderkey""")),

    // JSON_MATCH (JsonMatchFilterOperator → json-path predicate rewrite)
    Q("q_filter_json_match",
      (s, d) => Tables.events(s, d)
        .filter(Scalars.jsonExtractLong(col("props"), "$.k").between(50, 60))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n")),
      Some("""SELECT event_type, COUNT(*) AS n FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT)
          BETWEEN 50 AND 60 GROUP BY event_type""")))
}
