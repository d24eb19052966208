package graft.queries

import graft.{Par, ParSql, Q, Tables}
import graft.operators.NullHandling
import graft.sql.PinotSql
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, StringType}

/** Multi-value-column aggregate semantics (SURVEY §2.5 `*MV` variants —
  * countMV/sumMV/… aggregate per VALUE, not per row: 15 `*MV*.java` files),
  * the sentinel null-handling mode (§1.1), and the Pinot SQL dialect shim.
  * MV aggregation = `explode` then the scalar aggregate — Catalyst fuses
  * the generate into the same stage, so it's still one shuffle. */
object MvQueries {

  val all: Seq[Q] = Seq(

    // countMV / sumMV / avgMV / minMV / maxMV over the embedding MV column,
    // grouped by label — per-element semantics via explode
    Q("q_mv_agg",
      (s, d) => Tables.embeddings(s, d)
        .select(col("label"), explode(col("embedding")).as("v"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("count_mv"),
          // engines' float/double→decimal casts disagree in the last digit;
          // instead quantize to integer micro-units (same double product +
          // same away-from-zero tie rounding in both) and sum exact longs
          (sum(round(col("v").cast("double") * 1e6).cast("long"))
            .cast("double") / 1e6).as("sum_mv"),
          min(col("v")).as("min_mv"), max(col("v")).as("max_mv"),
          count_distinct(col("v")).as("nd_mv")),
      Some("""SELECT label, COUNT(*) AS count_mv,
        CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT))
          AS DOUBLE) / 1000000.0 AS sum_mv,
        MIN(v) AS min_mv, MAX(v) AS max_mv, COUNT(DISTINCT v) AS nd_mv
        FROM (SELECT label, unnest(embedding) AS v FROM embeddings)
        GROUP BY label""")),

    // MV filter semantics: rows where ANY value matches (valueIn /
    // arrayContains), plus per-row MV transforms
    Q("q_mv_transform",
      (s, d) => Tables.embeddings(s, d)
        // compare in double on both sides: a float-vs-float compare against
        // (float)0.2 disagrees with DuckDB's float-promoted-to-double > 0.2
        .filter(array_max(col("embedding")).cast("double") > 0.2)
        .select(col("vec_id"),
          size(col("embedding")).as("mv_len"),
          Par.r6(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double"))).as("mv_sum"),
          Par.r6(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double")) / size(col("embedding")))
            .as("mv_avg")),
      Some("""SELECT vec_id, len(embedding) AS mv_len,
        ROUND(list_sum([CAST(x AS DOUBLE) for x in embedding]), 6) AS mv_sum,
        ROUND(list_sum([CAST(x AS DOUBLE) for x in embedding]) /
          len(embedding), 6) AS mv_avg
        FROM embeddings WHERE list_max(embedding) > 0.2""")),

    // sentinel null-handling (enableNullHandling=false emulation):
    // nulls become per-type defaults at ingest, changing COUNT/MIN results
    Q("q_null_sentinel",
      (s, d) => {
        val withNulls = Tables.events(s, d)
          .withColumn("value", nullif(col("value"), lit(0.01)))
          .withColumn("event_type",
            nullif(col("event_type"), lit("view")))
        val filled = NullHandling.sentinelFill(withNulls,
          metrics = Set("value"))
        filled.groupBy(col("event_type"))
          .agg(count(col("value")).as("n_value"),
            Par.dsum(col("value")).as("sum_value"),
            min(col("value")).as("min_value"))
      },
      Some(s"""SELECT COALESCE(NULLIF(event_type, 'view'), 'null')
          AS event_type,
        COUNT(*) AS n_value,
        ${ParSql.dsum("COALESCE(NULLIF(\"value\", 0.01), 0.0)")} AS sum_value,
        MIN(COALESCE(NULLIF("value", 0.01), 0.0)) AS min_value
        FROM events GROUP BY 1""")),

    // Pinot-dialect SQL through the shim: DISTINCTCOUNT, REGEXP_LIKE,
    // PERCENTILE(col, pct-in-0-100), default LIMIT handling
    Q("q_pinot_sql",
      (s, d) => {
        Tables.registerAll(s, d)
        PinotSql.sql(s,
          """SELECT o_orderpriority, DISTINCTCOUNT(o_custkey) AS nd_cust,
             PERCENTILE(o_totalprice, 50) AS p50
             FROM orders
             WHERE REGEXP_LIKE(o_orderpriority, '^[123]-')
             GROUP BY o_orderpriority""")
          .withColumn("p50", Par.r6(col("p50")))
      },
      Some("""SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS nd_cust,
        ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50
        FROM orders WHERE regexp_matches(o_orderpriority, '^[123]-')
        GROUP BY o_orderpriority""")),

    // Pinot dialect with NESTED function arguments — the shape the old
    // regex rewriter mis-captured; function-registry resolution + AST
    // rewrites parse it natively (DISTINCTCOUNT(lower(...)),
    // MINMAXRANGE over an expression, TEXT_MATCH Lucene grammar)
    Q("q_pinot_sql_nested",
      (s, d) => {
        Tables.registerAll(s, d)
        PinotSql.sql(s,
          """SELECT o_orderstatus,
             DISTINCTCOUNT(lower(o_orderpriority)) AS nd_pri,
             MINMAXRANGE(o_totalprice * 2.0) AS rng2
             FROM orders GROUP BY o_orderstatus""")
          .withColumn("rng2", Par.r6(col("rng2")))
      },
      Some("""SELECT o_orderstatus,
        COUNT(DISTINCT lower(o_orderpriority)) AS nd_pri,
        ROUND(MAX(o_totalprice * 2.0) - MIN(o_totalprice * 2.0), 6) AS rng2
        FROM orders GROUP BY o_orderstatus""")),

    // dialect TEXT_MATCH with the full Lucene grammar (mid-word wildcard,
    // single-char wildcard, fuzzy) end-to-end through the Pinot SQL path —
    // parses via the function registry, lowers via TextMatchRoute
    // (per-row here: no registered index for the view), oracle replays the
    // token predicates in DuckDB list ops.
    Q("q_pinot_sql_textmatch",
      (s, d) => {
        Tables.registerAll(s, d)
        PinotSql.sql(s,
          """SELECT source, COUNT(*) AS n FROM documents
             WHERE TEXT_MATCH(text, 'st*m AND qu?ry OR merga~1')
             GROUP BY source ORDER BY source LIMIT 20""")
      },
      Some("""SELECT source, COUNT(*) AS n FROM (
          SELECT source, list_filter(string_split_regex(lower(text), '\s+'),
            t -> length(t) > 0) AS tk FROM documents) t
        WHERE (len(list_filter(tk, w -> w LIKE 'st%m')) > 0
               AND len(list_filter(tk, w -> w LIKE 'qu_ry')) > 0)
           OR len(list_filter(tk, w -> levenshtein(w, 'merga') <= 1)) > 0
        GROUP BY source ORDER BY source LIMIT 20""")),

    // Pinot datetime transform surface through the dialect SQL:
    // DATETIMECONVERT spec strings, TIMECONVERT unit conversion, DATETRUNC
    // calendar truncation, TODATETIME formatting — all resolved from the
    // function registry with nested arguments (DateTimeFunctions.java
    // names). Oracle replays the epoch arithmetic in DuckDB.
    Q("q_pinot_sql_datetime",
      (s, d) => {
        Tables.registerAll(s, d)
        PinotSql.sql(s,
          """SELECT
             DATETIMECONVERT(CAST(o_orderdate AS TIMESTAMP), 'TIMESTAMP',
               '1:DAYS:EPOCH', '7:DAYS') AS wk,
             COUNT(*) AS n,
             DISTINCTCOUNT(TODATETIME(TIMECONVERT(
               TOEPOCHSECONDS(CAST(o_orderdate AS TIMESTAMP)),
               'SECONDS', 'MILLISECONDS'), 'yyyy-MM')) AS nd_ym,
             MIN(DATETRUNC('month', TIMECONVERT(
               TOEPOCHSECONDS(CAST(o_orderdate AS TIMESTAMP)),
               'SECONDS', 'MILLISECONDS'), 'MILLISECONDS')) AS min_mon_ms
             FROM orders GROUP BY wk ORDER BY wk LIMIT 30""")
      },
      Some("""SELECT 7 * (CAST(epoch(o_orderdate) AS BIGINT) // 604800)
          AS wk,
        COUNT(*) AS n,
        COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS nd_ym,
        MIN(CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) * 1000)
          AS min_mon_ms
        FROM orders GROUP BY wk ORDER BY wk LIMIT 30""")))
}
