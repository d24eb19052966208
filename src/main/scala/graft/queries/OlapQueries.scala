package graft.queries

import graft.{Par, ParSql, Q, Tables}
import graft.operators.{Gapfill, Upsert}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** OLAP-specific operators: gapfill (SURVEY §2.9,
  * `GapfillProcessor.java:49,133-170`), upsert views (`UpsertConfig`,
  * partial-merge strategies), dedup, and ingestion-time rollup
  * (`pinot-segment-local/.../aggregator/`). */
object OlapQueries {

  private val jan1 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val jan30 = Timestamp.valueOf("2024-01-30 23:00:00")

  val all: Seq[Q] = Seq(

    // Streaming-results surface (GrpcQueryServer.java:120-175 DATA* +
    // METADATA protocol): selection-only query fetched incrementally as
    // bounded blocks, then reassembled client-side. The gate proves the
    // paged protocol is lossless and the trailer counts are honest; the
    // spec additionally proves laziness (first page ≠ whole query).
    Q("q_stream_results",
      (s, d) => {
        val sel = Tables.lineitem(s, d)
          .filter(col("l_quantity") >= 48)
          .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
            col("l_returnflag"))
        graft.operators.ResultStream.reassemble(s, sel.schema,
          graft.operators.ResultStream.blocks(sel, blockRows = 500))
      },
      Some("""SELECT l_orderkey, l_partkey, l_quantity, l_returnflag
        FROM lineitem WHERE l_quantity >= 48""")),

    // Blocking plan through the same protocol: the group-by completes its
    // shuffle, then the final stage streams partition-by-partition — the
    // reference's combine-then-stream (StreamingGroupByCombineOperator).
    Q("q_stream_results_agg",
      (s, d) => {
        val agg = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), Par.dsum(col("l_quantity")).as("qty"))
        graft.operators.ResultStream.reassemble(s, agg.schema,
          graft.operators.ResultStream.blocks(agg, blockRows = 2))
      },
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        ${graft.ParSql.dsum("l_quantity")} AS qty
        FROM lineitem GROUP BY 1, 2""")),

    // One-pass column profiling (reference: per-segment ColumnMetadata —
    // cardinality/min/max computed at segment build): n, nulls, exact
    // ndv, typed min/max per column in ONE aggregation over the table.
    // Oracle: per-column UNION ALL of the same stats.
    Q("q_profile_columns",
      (s, d) => graft.operators.Profile.columns(Tables.lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount",
            "l_returnflag", "l_linestatus", "l_partkey"))
        .orderBy(col("column")),
      Some {
        val numCols = Set("l_quantity", "l_extendedprice", "l_discount",
          "l_partkey")
        val parts = Seq("l_quantity", "l_extendedprice", "l_discount",
          "l_returnflag", "l_linestatus", "l_partkey").map { c =>
          val (mn, mx, ms, xs) =
            if (numCols(c))
              (s"CAST(MIN($c) AS DOUBLE)", s"CAST(MAX($c) AS DOUBLE)",
                "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
            else
              ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
                s"CAST(MIN($c) AS VARCHAR)", s"CAST(MAX($c) AS VARCHAR)")
          s"""SELECT '$c' AS "column", COUNT(*) AS n,
            COUNT(*) - COUNT($c) AS nulls,
            COUNT(DISTINCT $c) AS ndv,
            $mn AS min_num, $mx AS max_num,
            $ms AS min_str, $xs AS max_str
          FROM lineitem"""
        }
        parts.mkString("SELECT * FROM (", " UNION ALL ",
          """) ORDER BY "column"""")
      }),

    // GAPFILL with FILL_PREVIOUS_VALUE + FILL_DEFAULT_VALUE:
    // hourly per-type buckets over the events month
    Q("q_gapfill",
      (s, d) => {
        val agged = Tables.events(s, d)
          .groupBy(col("event_type"),
            date_trunc("hour", col("ts")).as("bucket"))
          .agg(sum(Par.money(col("value"))).cast("double").as("sum_val"),
            count(lit(1)).as("n"))
        Gapfill.gapfill(agged, "bucket", Seq("event_type"),
          jan1, jan30, 3600,
          Map("sum_val" -> Gapfill.FillPrevious,
            "n" -> Gapfill.FillDefault(lit(0L))))
      },
      Some(Par.evOracle("""SELECT event_type, bucket,
          last_value(sum_val IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_val,
          COALESCE(n, 0) AS n
        FROM (
          SELECT k.event_type, b.bucket, a.sum_val, a.n
          FROM (SELECT DISTINCT event_type FROM ev) k
          CROSS JOIN (SELECT unnest(generate_series(
            TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-30 23:00:00',
            INTERVAL 1 HOUR)) AS bucket) b
          LEFT JOIN (
            SELECT event_type, date_trunc('hour', ts) AS bucket,
              CAST(SUM(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_val,
              COUNT(*) AS n
            FROM ev GROUP BY 1, 2) a
          ON a.event_type = k.event_type AND a.bucket = b.bucket)"""))),

    // FULL upsert merge-on-read view: latest row per (user_id, event_type)
    Q("q_upsert_latest",
      (s, d) => Upsert.latestView(Tables.events(s, d),
          Seq("user_id", "event_type"), Seq("ts", "event_id"))
        .select(col("user_id"), col("event_type"), col("value").as("last_val"),
          col("ts").as("last_ts")),
      Some(Par.evOracle("""SELECT user_id, event_type,
        "value" AS last_val, ts AS last_ts FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn FROM ev)
        WHERE rn = 1"""))),

    // PARTIAL upsert: the 7 merge strategies collapsed per user_id
    Q("q_upsert_partial",
      (s, d) => {
        val ev = Tables.events(s, d).select(
          col("user_id"), col("ts"),
          col("value").as("v_max"), col("value").as("v_min"),
          Par.money(col("value")).as("v_sum"),
          col("value").as("v_first"), col("value").as("v_last"),
          col("value").as("v_append"), col("event_type").as("types"))
        Upsert.partialUpsert(ev, Seq("user_id"), "ts", Map(
            "v_max" -> Upsert.MaxOf, "v_min" -> Upsert.MinOf,
            "v_sum" -> Upsert.Increment, "v_first" -> Upsert.Ignore,
            "v_last" -> Upsert.Overwrite, "v_append" -> Upsert.Append,
            "types" -> Upsert.UnionOf))
          .withColumn("v_sum", col("v_sum").cast("double"))
          // list-valued merge results serialize to CSV strings: the
          // driver's pandas compare cannot sort array-typed columns.
          // Money doubles render via the verified DECIMAL(12,2) lift.
          .withColumn("v_append", array_join(
            transform(slice(col("v_append"), 1, 5),
              v => Par.money(v).cast("string")), ","))
          .withColumn("types", array_join(col("types"), ","))
      },
      Some(Par.evOracle("""SELECT user_id,
        MAX("value") AS v_max, MIN("value") AS v_min,
        CAST(SUM(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS v_sum,
        arg_min("value", ts) AS v_first, arg_max("value", ts) AS v_last,
        array_to_string([CAST(CAST(v AS DECIMAL(12,2)) AS VARCHAR)
          for v in (list("value" ORDER BY ts))[1:5]], ',') AS v_append,
        array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
        FROM ev GROUP BY user_id"""))),

    // as-of join (backward): each purchase event attaches the user's most
    // recent click at-or-before it (point-in-time feature lookup)
    Q("q_join_asof",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"))
        graft.operators.AsofJoin.asofBackward(
          purchases, clicks, Seq("user_id"), "ts",
          Map("value" -> "click_value"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("ts_right").as("click_ts"), col("click_value"))
      },
      Some(Par.evOracle("""SELECT p.event_id, p.user_id, p.ts,
          c.ts AS click_ts, c."value" AS click_value
        FROM (SELECT event_id, user_id, ts FROM ev
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts, "value" FROM ev
              WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts"""))),

    // hybrid table: OFFLINE(<boundary) ∪ REALTIME(>=boundary) answers the
    // same aggregate as the unsplit table (broker time-boundary rewrite)
    Q("q_hybrid_table",
      (s, d) => {
        val orders = Tables.orders(s, d)
        val hybrid = graft.operators.HybridTable.view(
          orders, orders, "o_orderdate",
          lit("1999-01-01 00:00:00").cast("timestamp"))
        hybrid.groupBy(year(col("o_orderdate")).as("yr"))
          .agg(count(lit(1)).as("n"), Par.dsum(col("o_totalprice"))
            .as("total"))
      },
      Some(s"""SELECT YEAR(o_orderdate) AS yr, COUNT(*) AS n,
        ${ParSql.dsum("o_totalprice")} AS total FROM orders
        GROUP BY YEAR(o_orderdate)""")),

    // TEXT_INDEX analog: conjunctive TEXT_MATCH via inverted-index
    // postings intersection (exact-token semantics on both sides)
    Q("q_text_inverted",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val idx = graft.operators.HybridTable
          .invertedTextIndex(docs, "text", "doc_id")
        graft.operators.HybridTable
          .matchAllTerms(idx, "doc_id", Seq("spark", "vector", "hash"))
      },
      Some("""SELECT doc_id FROM documents
        WHERE list_contains(list_filter(string_split_regex(lower(text),
            '\s+'), t -> length(t) > 0), 'spark')
          AND list_contains(list_filter(string_split_regex(lower(text),
            '\s+'), t -> length(t) > 0), 'vector')
          AND list_contains(list_filter(string_split_regex(lower(text),
            '\s+'), t -> length(t) > 0), 'hash')""")),

    // ingestion transform pipeline (CompositeTransformer order): expression
    // transform → filter → coercion → time validation → sentinel fill,
    // then rollup — the full ingest path under the oracle gate
    Q("q_ingest_pipeline",
      (s, d) => {
        import graft.sources.Ingest
        val ev = Tables.events(s, d)
        val out = Ingest.transform(ev, Ingest.Pipeline(
          expressions = Seq(
            "value_cents" -> round(col("value") * 100).cast("long"),
            "k_long" -> graft.functions.Scalars
              .jsonExtractLong(col("props"), "$.k")),
          filter = Some(col("event_type") =!= "error"),
          coerce = Map("user_id" -> "int"),
          timeCol = Some("ts"),
          timeRange = Some((java.sql.Timestamp.valueOf("2024-01-05 00:00:00"),
            java.sql.Timestamp.valueOf("2024-01-25 00:00:00"))),
          sentinelMetrics = Set("value"),
          sanitizeStrings = false))
        out.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(col("value_cents")).as("sum_cents"),
          Par.dsum(col("k_long")).as("sum_k"),
          max(col("user_id")).as("max_uid"))
      },
      Some(Par.evOracle(s"""SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(ROUND("value" * 100) AS BIGINT)) AS BIGINT)
          AS sum_cents,
        ${ParSql.dsum("CAST(json_extract_string(props, '" + "$" + ".k') AS BIGINT)")}
          AS sum_k,
        MAX(CAST(user_id AS INT)) AS max_uid
        FROM ev WHERE event_type != 'error'
          AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00'
            AND TIMESTAMP '2024-01-25 00:00:00'
        GROUP BY event_type"""))),

    // exact dedup at ingest (DedupConfig): duplicated corpus → one keeper
    // per content hash
    Q("q_dedup_exact",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val dup = docs.unionAll(docs.select((col("doc_id") + 100000)
          .as("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars")))
        graft.operators.Dedup.exact(dup, "text", "doc_id")
      },
      Some("""SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        COUNT(*) AS n_copies FROM (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 100000, text FROM documents)
        GROUP BY md5(text)""")),

    // SumAvgGapfillProcessor: aggregation over the gapfilled series
    Q("q_gapfill_agg",
      (s, d) => {
        val agged = Tables.events(s, d)
          .groupBy(col("event_type"),
            date_trunc("hour", col("ts")).as("bucket"))
          .agg(sum(Par.money(col("value"))).cast("double").as("sum_val"))
        val filled = Gapfill.gapfill(agged, "bucket", Seq("event_type"),
          jan1, jan30, 3600,
          Map("sum_val" -> Gapfill.FillPrevious))
        filled.groupBy(col("event_type"))
          .agg(count(col("sum_val")).as("n_buckets"),
            Par.r6(sum(round(col("sum_val") * 100).cast("long"))
              .cast("double") / 100).as("total_filled"))
      },
      Some(Par.evOracle("""SELECT event_type,
          COUNT(sum_val) AS n_buckets,
          ROUND(CAST(SUM(CAST(ROUND(sum_val * 100) AS BIGINT)) AS DOUBLE)
            / 100, 6) AS total_filled
        FROM (SELECT event_type,
          last_value(sum_val IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_val
        FROM (
          SELECT k.event_type, b.bucket, a.sum_val
          FROM (SELECT DISTINCT event_type FROM ev) k
          CROSS JOIN (SELECT unnest(generate_series(
            TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-30 23:00:00',
            INTERVAL 1 HOUR)) AS bucket) b
          LEFT JOIN (
            SELECT event_type, date_trunc('hour', ts) AS bucket,
              CAST(SUM(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_val
            FROM ev GROUP BY 1, 2) a
          ON a.event_type = k.event_type AND a.bucket = b.bucket))
        GROUP BY event_type"""))),

    // star-tree pre-aggregation: summary built at (flag, status) grain
    // answers the flag-only rollup exactly (mergeable partial metrics)
    Q("q_startree",
      (s, d) => {
        val summary = graft.operators.StarTree.build(
          Tables.lineitem(s, d)
            .withColumn("qty_d", Par.money(col("l_quantity"))),
          Seq("l_returnflag", "l_linestatus"),
          Seq(graft.operators.StarTree.Metric("qty_d", Seq("sum", "min", "max"))))
        graft.operators.StarTree.query(summary, Seq("l_returnflag"))
          .select(col("l_returnflag"),
            col("sum_qty_d").cast("double").as("sum_qty"),
            col("min_qty_d").cast("double").as("min_qty"),
            col("max_qty_d").cast("double").as("max_qty"),
            col("n_rows"))
      },
      Some("""SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(MIN(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS min_qty,
        CAST(MAX(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS max_qty,
        COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag""")),

    // protobuf input format (pinot-protobuf record-reader analog): orders
    // re-encoded through the wire codec, read back, aggregated — the
    // oracle runs the same aggregate on the original parquet, so any
    // decode corruption (varint, UTF-8, fixed64 double) breaks the hash
    Q("q_ingest_protobuf",
      (s, d) => {
        import graft.sources.{Ingest, ProtoWire}
        import graft.sources.ProtoWire._
        val fields = Seq(Field(1, "o_orderkey", PInt64),
          Field(2, "o_orderpriority", PString),
          Field(3, "o_totalprice", PDouble))
        val dir = new java.io.File(
          s"/tmp/graft_proto_${math.abs(d.hashCode)}")
        if (!dir.exists()) {
          dir.mkdirs()
          ProtoWire.writeFile(
            Tables.orders(s, d).select(col("o_orderkey"),
              col("o_orderpriority"), col("o_totalprice")),
            fields, s"${dir.getPath}/part0.pb")
        }
        Ingest.readProtobuf(s, dir.getPath, fields)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            Par.dsum(col("o_totalprice")).as("sum_price"))
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
        ${graft.ParSql.dsum("o_totalprice")} AS sum_price
        FROM orders GROUP BY o_orderpriority""")),

    // thrift input format (pinot-thrift ThriftRecordReader analog):
    // customers re-encoded through the TBinaryProtocol codec, read back,
    // aggregated — oracle on the original parquet, so any codec
    // corruption (field ids, big-endian ints, utf-8, stop bytes) breaks
    // the hash
    Q("q_ingest_thrift",
      (s, d) => {
        import graft.sources.{Ingest, ThriftWire}
        import graft.sources.ThriftWire._
        val fields = Seq(Field(1, "c_custkey", TI64),
          Field(2, "c_mktsegment", TString),
          Field(3, "c_nationkey", TI32))
        val dir = new java.io.File(
          s"/tmp/graft_thrift_${math.abs(d.hashCode)}")
        if (!dir.exists()) {
          dir.mkdirs()
          ThriftWire.writeFile(
            Tables.customer(s, d).select(col("c_custkey"),
              col("c_mktsegment"), col("c_nationkey")),
            fields, s"${dir.getPath}/part0.tbin")
        }
        Ingest.readThrift(s, dir.getPath, fields)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), sum(col("c_nationkey")).as("sum_nat"),
            max(col("c_custkey")).as("max_key"))
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n,
        CAST(SUM(c_nationkey) AS BIGINT) AS sum_nat,
        MAX(c_custkey) AS max_key
        FROM customer GROUP BY c_mktsegment""")),

    // CLP log input (pinot-clp-log analog): documents' text CLP-encoded
    // into logtype/dictionaryVars/encodedVars, round-tripped through
    // parquet, decoded, aggregated — decode(encode(x)) must be byte-exact,
    // so the oracle states the aggregate directly on the original text
    Q("q_ingest_clplog",
      (s, d) => {
        import graft.sources.ClpLog
        val dir = new java.io.File(
          s"/tmp/graft_clplog_${math.abs(d.hashCode)}")
        if (!dir.exists()) {
          ClpLog.encodeField(
            Tables.documents(s, d).select(col("doc_id"), col("source"),
              col("text")), "text")
            .write.mode("overwrite").parquet(dir.getPath)
        }
        ClpLog.decodeField(s.read.parquet(dir.getPath), "text")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(length(col("text"))).as("sum_len"),
            // modular checksum keeps the sum < 2^53: a 60-bit hash sum
            // would diverge in the engines' decimal→double last ULP
            sum(graft.functions.Scalars.hash60(col("text")) % 1000003L)
              .as("sum_hash"))
      },
      Some(s"""SELECT source, COUNT(*) AS n,
        CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_len,
        CAST(SUM(${graft.ParSql.hash60("text")} % 1000003) AS BIGINT)
          AS sum_hash
        FROM documents GROUP BY source""")),

    // confluent-avro input format (pinot-confluent-avro decoder analog):
    // customers re-encoded as confluent frames under TWO writer schema
    // versions (even keys v1 without c_acctbal, odd keys v2 with it), read
    // back through the v2 reader schema — avro schema resolution fills the
    // v1 rows' c_acctbal with the field default (0). The oracle replays
    // that split arithmetically on the original parquet, so a broken
    // frame header, registry dispatch, or resolution default breaks the
    // hash.
    Q("q_ingest_confluent",
      (s, d) => {
        import graft.sources.{ConfluentAvro, Ingest, ProtoWire}
        val v1 = """{"type":"record","name":"Cust","fields":[
          {"name":"c_custkey","type":"long"},
          {"name":"c_mktsegment","type":"string"}]}"""
        val v2 = """{"type":"record","name":"Cust","fields":[
          {"name":"c_custkey","type":"long"},
          {"name":"c_mktsegment","type":"string"},
          {"name":"c_acctbal","type":"double","default":0.0}]}"""
        val dir = new java.io.File(
          s"/tmp/graft_confluent_${math.abs(d.hashCode)}")
        if (!dir.exists()) {
          dir.mkdirs()
          val rows = Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
            .collect()
          val msgs = rows.iterator.map { r =>
            val key = r.getLong(0)
            if (key % 2 == 1)
              ConfluentAvro.encode(
                Seq(key, r.getString(1), r.getDouble(2)), v2, 2)
            else ConfluentAvro.encode(Seq(key, r.getString(1)), v1, 1)
          }
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"${dir.getPath}/part0.cav"),
            ProtoWire.frame(msgs))
        }
        Ingest.readConfluentAvro(s, dir.getPath,
            registry = Map(1 -> v1, 2 -> v2), readerJson = v2)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            Par.dsum(col("c_acctbal")).as("sum_bal"))
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n,
        ${graft.ParSql.dsum(
          "CASE WHEN c_custkey % 2 = 1 THEN c_acctbal ELSE 0 END")} AS sum_bal
        FROM customer GROUP BY c_mktsegment""")),

    // WARC input (ISO 28500 — the container web corpora ship in, and the
    // byte source of the q_web_pipeline curation chain): documents
    // synthesized into HTML, wrapped as HTTP-200 response records across
    // four archives (two plain, two whole-stream gzip — the multi-member
    // read path), each led by a warcinfo record and salted with request
    // records that the response filter must skip. Read back, the payload
    // must decode byte-exactly and the target URI must carry doc id +
    // source through — the oracle aggregates the same synthesis straight
    // from the parquet, so any framing, Content-Length, HTTP-split, gzip,
    // or charset defect breaks the hash.
    Q("q_ingest_warc",
      (s, d) => {
        import graft.sources.Warc
        val did = col("doc_id").cast("string")
        val html = concat(
          lit("<html><head><title>Doc "), did, lit(" &amp; Co</title>"),
          lit("</head><body><h1>"), col("source"),
          lit(" &lt;news&gt;</h1><p>"), col("text"), lit("</p>"),
          when(col("doc_id") % 3 === 0,
            lit("<p>See <a href=\"u\">the &quot;docs&quot;</a> here</p>"))
            .otherwise(lit("")),
          lit("</body></html>"))
        val dir = new java.io.File(
          s"/tmp/graft_warc_${math.abs(d.hashCode)}")
        if (!dir.exists()) {
          dir.mkdirs()
          val rows = Tables.documents(s, d)
            .select(col("doc_id"), col("source"), html.as("html"))
            .collect()
          val date = "2026-01-01T00:00:00Z"
          (0 until 4).foreach { part =>
            val recs = Iterator(Warc.warcinfoRecord(
                s"urn:uuid:info-$part", date,
                Seq("software" -> "graft", "isPartOf" -> s"part$part"))) ++
              rows.iterator.filter(_.getLong(0) % 4 == part).flatMap { r =>
                val (id, src) = (r.getLong(0), r.getString(1))
                val uri = s"https://$src.example.com/doc/$id"
                val resp = Warc.responseRecord(uri, s"urn:uuid:resp-$id",
                  date, r.getString(2).getBytes(
                    java.nio.charset.StandardCharsets.UTF_8))
                if (id % 5 == 0)
                  Iterator(Warc.record("request", s"urn:uuid:req-$id",
                    date, s"GET /doc/$id HTTP/1.1\r\n\r\n".getBytes(
                      java.nio.charset.StandardCharsets.UTF_8),
                    Some("application/http; msgtype=request"),
                    Some(uri)), resp)
                else Iterator(resp)
              }
            Warc.writeFile(recs,
              s"${dir.getPath}/part$part.warc${if (part % 2 == 1) ".gz" else ""}",
              gzip = part % 2 == 1)
          }
        }
        Warc.read(s, dir.getPath)
          .filter(col("warc_type") === "response" &&
            col("http_status") === 200)
          .select(
            regexp_extract(col("target_uri"),
              "^https://([^.]+)\\.", 1).as("source"),
            regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            col("payload").cast("string").as("html"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(col("doc_id") % 1000003L).as("id_checksum"),
            sum(length(col("html"))).as("sum_len"),
            sum(graft.functions.Scalars.hash60(col("html")) % 1000003L)
              .as("sum_hash"))
          .orderBy(col("source"))
      },
      Some {
        val htmlSyn = """'<html><head><title>Doc ' ||
            CAST(doc_id AS VARCHAR) ||
            ' &amp; Co</title></head><body><h1>' || source ||
            ' &lt;news&gt;</h1><p>' || text || '</p>' ||
            CASE WHEN doc_id % 3 = 0
              THEN '<p>See <a href="u">the &quot;docs&quot;</a> here</p>'
              ELSE '' END || '</body></html>'"""
        s"""WITH h AS (SELECT doc_id, source, $htmlSyn AS html
            FROM documents)
          SELECT source, COUNT(*) AS n,
            CAST(SUM(doc_id % 1000003) AS BIGINT) AS id_checksum,
            CAST(SUM(LENGTH(html)) AS BIGINT) AS sum_len,
            CAST(SUM(${graft.ParSql.hash60("html")} % 1000003) AS BIGINT)
              AS sum_hash
          FROM h GROUP BY source ORDER BY source"""
      }),

    // WARC charset handling (the CCNet step a real web corpus forces:
    // payloads are NOT uniformly UTF-8): documents decorated with
    // non-ASCII tails and SERVED in the charset their HTTP header
    // declares — UTF-8, quoted-uppercase ISO-8859-1, windows-1252 (the
    // charset Spark's decode whitelist lacks — native sloppy-cp1252
    // kernel) — then payloadText must route on the charset parameter
    // and restore the original text byte-for-byte, which the oracle
    // states directly from the parquet. A UTF-8 cast in place of the
    // routing would mojibake two of the three classes and break the
    // hash.
    Q("q_warc_charset",
      (s, d) => {
        import graft.sources.Warc
        val dir = new java.io.File(
          s"/tmp/graft_warccs_${math.abs(d.hashCode)}")
        if (!dir.exists()) {
          dir.mkdirs()
          val rows = Tables.documents(s, d)
            .select(col("doc_id"), col("text")).collect()
          val date = "2026-01-01T00:00:00Z"
          val recs = rows.iterator.map { r =>
            val id = r.getLong(0)
            val (deco, cs, label) = (id % 3) match {
              case 0 => (" русский 中文", "UTF-8", "charset=utf-8")
              case 1 => (" café ½ naïve", "ISO-8859-1",
                "charset=\"ISO-8859-1\"")
              case _ => (" “smart” €", "windows-1252",
                "charset=windows-1252")
            }
            Warc.responseRecord(s"https://w.example.com/doc/$id",
              s"urn:uuid:cs-$id", date,
              (r.getString(1) + deco).getBytes(cs),
              httpContentType = s"text/html; $label")
          }
          Warc.writeFile(recs, s"${dir.getPath}/part0.warc.gz",
            gzip = true)
        }
        Warc.read(s, dir.getPath)
          .filter(col("warc_type") === "response")
          .select(
            regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            Warc.payloadText(col("payload"), col("http_content_type"))
              .as("text"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, text ||
          CASE WHEN doc_id % 3 = 0 THEN ' русский 中文'
               WHEN doc_id % 3 = 1 THEN ' café ½ naïve'
               ELSE ' “smart” €' END AS text
        FROM documents ORDER BY doc_id""")),

    // Z-order (Morton) layout key: per-column min/max quantization to
    // 8-bit ranks + bit interleave — the multi-column file-pruning
    // clustering key (Delta ZORDER's curve). Pure codegen bit math;
    // the oracle replays quantize + interleave with integer bit ops.
    Q("q_layout_zorder",
      (s, d) => {
        val (withZ, _) = graft.operators.Layout.withZValue(
          Tables.lineitem(s, d), Seq("l_partkey", "l_suppkey"),
          bits = 8, zCol = "z")
        withZ.select(col("l_orderkey"), col("l_linenumber"), col("z"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some {
        def q(c: String, lo: String, hi: String) =
          s"""CAST(LEAST(255, FLOOR((CAST($c AS DOUBLE) - $lo) /
            ($hi - $lo) * 256)) AS BIGINT)"""
        val inter = (0 until 8).flatMap(i => Seq(
          s"(((q1 >> $i) & 1) << ${i * 2})",
          s"(((q2 >> $i) & 1) << ${i * 2 + 1})")).mkString(" + ")
        s"""WITH r AS (SELECT
            MIN(CAST(l_partkey AS DOUBLE)) AS lo1,
            MAX(CAST(l_partkey AS DOUBLE)) AS hi1,
            MIN(CAST(l_suppkey AS DOUBLE)) AS lo2,
            MAX(CAST(l_suppkey AS DOUBLE)) AS hi2
          FROM lineitem),
        qq AS (SELECT l_orderkey, l_linenumber,
            ${q("l_partkey", "r.lo1", "r.hi1")} AS q1,
            ${q("l_suppkey", "r.lo2", "r.hi2")} AS q2
          FROM lineitem, r)
        SELECT l_orderkey, l_linenumber, CAST($inter AS BIGINT) AS z
        FROM qq ORDER BY l_orderkey, l_linenumber"""
      }),

    // Ordered event funnel (upstream-Pinot FUNNEL_MATCH_STEP semantics,
    // greedy-earliest): view → click → purchase within 24 h of the
    // anchor, one row per user reaching step 1 with per-step timestamps
    // + depth. Oracle replays the same k-round earliest-match chain.
    Q("q_funnel_match",
      (s, d) => graft.operators.Funnel.matchSteps(
          Tables.events(s, d), "user_id", "ts",
          Seq(col("event_type") === "view", col("event_type") === "click",
            col("event_type") === "purchase"), windowSec = 86400)
        .orderBy(col("user_id")),
      Some(Par.evOracle("""SELECT s1.user_id, s1.t_1, s2.t_2, s3.t_3,
          CAST(CASE WHEN s3.t_3 IS NOT NULL THEN 3
               WHEN s2.t_2 IS NOT NULL THEN 2 ELSE 1 END AS INT)
            AS steps_matched
        FROM
          (SELECT user_id, MIN(ts) AS t_1 FROM ev
           WHERE event_type = 'view' GROUP BY user_id) s1
        LEFT JOIN
          (SELECT e.user_id, MIN(e.ts) AS t_2 FROM ev e
           JOIN (SELECT user_id, MIN(ts) AS t_1 FROM ev
                 WHERE event_type = 'view' GROUP BY user_id) a
             ON e.user_id = a.user_id
           WHERE e.event_type = 'click' AND e.ts > a.t_1
             AND e.ts <= a.t_1 + INTERVAL 86400 SECOND
           GROUP BY e.user_id) s2 ON s1.user_id = s2.user_id
        LEFT JOIN
          (SELECT e.user_id, MIN(e.ts) AS t_3 FROM ev e
           JOIN (SELECT e.user_id, MIN(e.ts) AS t_2, MIN(a.t_1) AS t_1
                 FROM ev e
                 JOIN (SELECT user_id, MIN(ts) AS t_1 FROM ev
                       WHERE event_type = 'view' GROUP BY user_id) a
                   ON e.user_id = a.user_id
                 WHERE e.event_type = 'click' AND e.ts > a.t_1
                   AND e.ts <= a.t_1 + INTERVAL 86400 SECOND
                 GROUP BY e.user_id) p
             ON e.user_id = p.user_id
           WHERE e.event_type = 'purchase' AND e.ts > p.t_2
             AND e.ts <= p.t_1 + INTERVAL 86400 SECOND
           GROUP BY e.user_id) s3 ON s1.user_id = s3.user_id
        ORDER BY s1.user_id"""))),

    // Funnel drop-off curve (FUNNEL_COUNT role): users reaching each
    // step of the same 3-step funnel.
    Q("q_funnel_count",
      (s, d) => graft.operators.Funnel.count(
          Tables.events(s, d), "user_id", "ts",
          Seq(col("event_type") === "view", col("event_type") === "click",
            col("event_type") === "purchase"), windowSec = 86400)
        .orderBy(col("step")),
      Some(Par.evOracle("""SELECT step, n_users FROM (
          SELECT 1 AS step, COUNT(*) AS n_users FROM
            (SELECT user_id FROM ev WHERE event_type = 'view'
             GROUP BY user_id)
          UNION ALL
          SELECT 2, COUNT(*) FROM
            (SELECT e.user_id FROM ev e
             JOIN (SELECT user_id, MIN(ts) AS t_1 FROM ev
                   WHERE event_type = 'view' GROUP BY user_id) a
               ON e.user_id = a.user_id
             WHERE e.event_type = 'click' AND e.ts > a.t_1
               AND e.ts <= a.t_1 + INTERVAL 86400 SECOND
             GROUP BY e.user_id)
          UNION ALL
          SELECT 3, COUNT(*) FROM
            (SELECT e.user_id FROM ev e
             JOIN (SELECT e.user_id, MIN(e.ts) AS t_2, MIN(a.t_1) AS t_1
                   FROM ev e
                   JOIN (SELECT user_id, MIN(ts) AS t_1 FROM ev
                         WHERE event_type = 'view' GROUP BY user_id) a
                     ON e.user_id = a.user_id
                   WHERE e.event_type = 'click' AND e.ts > a.t_1
                     AND e.ts <= a.t_1 + INTERVAL 86400 SECOND
                   GROUP BY e.user_id) p
               ON e.user_id = p.user_id
             WHERE e.event_type = 'purchase' AND e.ts > p.t_2
               AND e.ts <= p.t_1 + INTERVAL 86400 SECOND
             GROUP BY e.user_id))
        ORDER BY step"""))),

    // Per-step-window funnel (the maxStepDuration-style mode upstream
    // grew): each consecutive gap at most windowSec — step 3's bound is
    // t_2 + window, not the anchor's t_1 + window. Oracle re-derives the
    // whole chain under the per-step bound; a tighter 6h window keeps
    // the two modes observably different on the synthetic events.
    Q("q_funnel_step_window",
      (s, d) => graft.operators.Funnel.matchSteps(
          Tables.events(s, d), "user_id", "ts",
          Seq(col("event_type") === "view", col("event_type") === "click",
            col("event_type") === "purchase"), windowSec = 21600,
          mode = graft.operators.Funnel.WindowMode.PerStep)
        .orderBy(col("user_id")),
      Some(Par.evOracle("""SELECT s1.user_id, s1.t_1, s2.t_2, s3.t_3,
          CAST(CASE WHEN s3.t_3 IS NOT NULL THEN 3
               WHEN s2.t_2 IS NOT NULL THEN 2 ELSE 1 END AS INT)
            AS steps_matched
        FROM
          (SELECT user_id, MIN(ts) AS t_1 FROM ev
           WHERE event_type = 'view' GROUP BY user_id) s1
        LEFT JOIN
          (SELECT e.user_id, MIN(e.ts) AS t_2 FROM ev e
           JOIN (SELECT user_id, MIN(ts) AS t_1 FROM ev
                 WHERE event_type = 'view' GROUP BY user_id) a
             ON e.user_id = a.user_id
           WHERE e.event_type = 'click' AND e.ts > a.t_1
             AND e.ts <= a.t_1 + INTERVAL 21600 SECOND
           GROUP BY e.user_id) s2 ON s1.user_id = s2.user_id
        LEFT JOIN
          (SELECT e.user_id, MIN(e.ts) AS t_3 FROM ev e
           JOIN (SELECT e.user_id, MIN(e.ts) AS t_2 FROM ev e
                 JOIN (SELECT user_id, MIN(ts) AS t_1 FROM ev
                       WHERE event_type = 'view' GROUP BY user_id) a
                   ON e.user_id = a.user_id
                 WHERE e.event_type = 'click' AND e.ts > a.t_1
                   AND e.ts <= a.t_1 + INTERVAL 21600 SECOND
                 GROUP BY e.user_id) p
             ON e.user_id = p.user_id
           WHERE e.event_type = 'purchase' AND e.ts > p.t_2
             AND e.ts <= p.t_2 + INTERVAL 21600 SECOND
           GROUP BY e.user_id) s3 ON s1.user_id = s3.user_id
        ORDER BY s1.user_id"""))),

    // FUNNEL_COMPLETE_COUNT role: one number — users completing all
    // three steps within the anchor window.
    Q("q_funnel_complete",
      (s, d) => graft.operators.Funnel.completeCount(
          Tables.events(s, d), "user_id", "ts",
          Seq(col("event_type") === "view", col("event_type") === "click",
            col("event_type") === "purchase"), windowSec = 86400),
      Some(Par.evOracle("""SELECT COUNT(*) AS n_complete FROM
          (SELECT e.user_id FROM ev e
           JOIN (SELECT e.user_id, MIN(e.ts) AS t_2, MIN(a.t_1) AS t_1
                 FROM ev e
                 JOIN (SELECT user_id, MIN(ts) AS t_1 FROM ev
                       WHERE event_type = 'view' GROUP BY user_id) a
                   ON e.user_id = a.user_id
                 WHERE e.event_type = 'click' AND e.ts > a.t_1
                   AND e.ts <= a.t_1 + INTERVAL 86400 SECOND
                 GROUP BY e.user_id) p
             ON e.user_id = p.user_id
           WHERE e.event_type = 'purchase' AND e.ts > p.t_2
             AND e.ts <= p.t_1 + INTERVAL 86400 SECOND
           GROUP BY e.user_id)"""))),

    // Gap-based SESSIONIZATION with stable per-key session INDEXES
    // (r18 — the batch gaps-and-islands operator next to
    // q_session_window's Spark-native windows: a session_idx a
    // downstream episode builder can key on, deterministic via the
    // (ts, event_id) tie order): new session wherever the gap to the
    // previous event exceeds 30 min (microsecond arithmetic), then
    // the per-session episode card. Oracle replays lag-gap flag →
    // running sum → per-island aggregates.
    Q("q_sessionize",
      (s, d) => graft.operators.Funnel.sessionSummary(
          Tables.events(s, d), "user_id", "ts", gapSec = 1800,
          tieCols = Seq("event_id"))
        .orderBy(col("user_id"), col("session_idx")),
      Some(Par.evOracle("""SELECT user_id,
          CAST(session_idx AS BIGINT) AS session_idx,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          MIN(ts) AS ts_start, MAX(ts) AS ts_end,
          epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
        FROM (
          SELECT user_id, ts,
            SUM(CASE WHEN prev IS NULL
                OR epoch_us(ts) - epoch_us(prev) > 1800000000
                THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - 1 AS session_idx
          FROM (SELECT user_id, ts, event_id,
              lag(ts) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS prev
            FROM ev))
        GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx"""))),

    // SESSION → EPISODE capstone (r19 — sessionize's stated purpose
    // carried to the training shape): gap-sessionized clickstreams
    // assemble into chat-interchange conversations (conv_id =
    // user:session, alternating user/assistant roles from turn 0,
    // content = event_type:event_id), then the UNCHANGED chat stack
    // applies — validateTurns (real attrition: odd-length sessions
    // fail the ends-on-assistant rule) and packWithMask (the rendered
    // episode text). The oracle replays gap-islands → rank assembly →
    // the protocol RULES (role set, system-at-0, lag alternation,
    // arg_max last-turn) → the ordered string_agg rendering.
    Q("q_session_episodes",
      (s, d) => {
        import graft.operators.{Chats, Funnel}
        val turns = Funnel.sessionEpisodes(Tables.events(s, d),
          "user_id", "ts", gapSec = 1800,
          contentCol = concat(col("event_type"), lit(":"),
            col("event_id").cast("string")),
          tieCols = Seq("event_id"))
        Chats.validateTurns(turns, "conv_id")
          .join(Chats.packWithMask(turns, "conv_id")
            .select(col("conv_id"), col("text")), Seq("conv_id"))
          .select(col("conv_id"), col("n_turns"), col("valid"),
            col("text"))
          .orderBy(col("conv_id"))
      },
      Some(Par.evOracle(""", sess AS (SELECT user_id, event_id,
          event_type, ts,
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
            event_type || ':' || CAST(event_id AS VARCHAR) AS content
          FROM sess),
        tw AS (SELECT conv_id, turn_idx,
            CASE WHEN turn_idx % 2 = 0 THEN 'user'
              ELSE 'assistant' END AS role, content
          FROM tr),
        tl AS (SELECT *, lag(role) OVER (PARTITION BY conv_id
              ORDER BY turn_idx) AS pr
          FROM tw),
        tv AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
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
        tp AS (SELECT conv_id,
            string_agg('<|' || role || '|>'
              || COALESCE(content, '') || chr(10),
              '' ORDER BY turn_idx) AS text
          FROM tw GROUP BY 1)
        SELECT tv.conv_id, tv.n_turns, tv.valid, tp.text
        FROM tv JOIN tp ON tv.conv_id = tp.conv_id
        ORDER BY tv.conv_id"""))),

    // Session-window aggregation (Spark-superset streaming semantic —
    // the same session_window works unchanged under readStream +
    // watermark): per-user sessions closed by a 30-min silence gap,
    // window end = last event + gap (Spark's session_window contract).
    // Oracle replays it as classic gaps-and-islands: lag-gap flag →
    // running sum → per-island min/max.
    Q("q_session_window",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          Par.dsum(col("value")).as("sum_val"))
        .select(col("user_id"), col("sw.start").as("sess_start"),
          col("sw.end").as("sess_end"), col("n_events"), col("sum_val"))
        .orderBy(col("user_id"), col("sess_start")),
      Some(Par.evOracle("""SELECT user_id, MIN(ts) AS sess_start,
          MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
          COUNT(*) AS n_events,
          """ + graft.ParSql.dsum("\"value\"") + """ AS sum_val
        FROM (SELECT user_id, ts, "value",
            SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM (SELECT user_id, ts, "value",
              CASE WHEN ts - COALESCE(lag(ts) OVER (PARTITION BY user_id
                ORDER BY ts), ts - INTERVAL 1 HOUR) >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
            FROM ev))
        GROUP BY user_id, sess_id
        ORDER BY user_id, sess_start"""))),

    // ingestion-time rollup (aggregateMetrics ValueAggregators):
    // 15-min pre-aggregation as the streaming sink would produce
    Q("q_rollup_ingest",
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"),
          graft.functions.Scalars.timeBucket(col("ts"), 900).as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          sum(Par.money(col("value"))).cast("double").as("sum_val"),
          min(col("value")).as("min_val"), max(col("value")).as("max_val"),
          count_distinct(col("user_id")).as("nd_users")),
      Some(Par.evOracle("""SELECT event_type,
        make_timestamp((epoch_us(ts) // 1000000 // 900) * 900 * 1000000)
          AS bucket,
        COUNT(*) AS cnt,
        CAST(SUM(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_val,
        MIN("value") AS min_val, MAX("value") AS max_val,
        COUNT(DISTINCT user_id) AS nd_users
        FROM ev GROUP BY 1, 2"""))))
}
