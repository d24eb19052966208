package graft.queries

import graft.{Par, ParSql, Q, Tables}
import graft.functions.{Scalars => F}
import org.apache.spark.sql.functions._

/** Scalar/transform-function coverage (SURVEY §2.3; reference
  * `TransformFunctionType.java:27-161` + `@ScalarFunction` registry).
  * Projection-shaped queries keyed by the table's PK so the hash compare is
  * total; everything stays in whole-stage codegen. */
object ScalarQueries {

  val all: Seq[Q] = Seq(

    // arithmetic: abs/ceil/floor/sqrt/mod/sign/round/truncate/least/greatest
    Q("q_scalar_arith",
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        abs(col("p_size") - 20).as("abs_v"),
        ceil(col("p_retailprice")).as("ceil_v"),
        floor(col("p_retailprice")).as("floor_v"),
        Par.r6(sqrt(col("p_retailprice"))).as("sqrt_v"),
        F.mod(col("p_size"), lit(5)).as("mod_v"),
        F.sign(col("p_size") - 25).cast("int").as("sign_v"),
        round(col("p_retailprice"), 1).as("round_v"),
        F.truncate(col("p_retailprice"), 1).as("trunc_v"),
        least(col("p_size"), lit(10)).as("least_v"),
        greatest(col("p_size"), lit(40)).as("greatest_v")),
      Some("""SELECT p_partkey, ABS(p_size - 20) AS abs_v,
        CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_v,
        CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_v,
        ROUND(SQRT(p_retailprice), 6) AS sqrt_v,
        p_size % 5 AS mod_v,
        CAST(SIGN(p_size - 25) AS INT) AS sign_v,
        ROUND(p_retailprice, 1) AS round_v,
        TRUNC(p_retailprice * 10) / 10 AS trunc_v,
        LEAST(p_size, 10) AS least_v, GREATEST(p_size, 40) AS greatest_v
        FROM part""")),

    // log/exp family (rounded: libm vs JDK may differ in the last ulp)
    Q("q_scalar_logexp",
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        Par.r6(exp(col("p_retailprice") / 500.0)).as("exp_v"),
        Par.r6(log(col("p_retailprice") + 1.0)).as("ln_v"),
        Par.r6(log10(col("p_retailprice") + 1.0)).as("log10_v"),
        Par.r6(log2(col("p_size").cast("double"))).as("log2_v"),
        Par.r6(pow(col("p_retailprice"), 0.5)).as("pow_v")),
      Some("""SELECT p_partkey,
        ROUND(EXP(p_retailprice / 500.0), 6) AS exp_v,
        ROUND(LN(p_retailprice + 1.0), 6) AS ln_v,
        ROUND(LOG10(p_retailprice + 1.0), 6) AS log10_v,
        ROUND(LOG2(CAST(p_size AS DOUBLE)), 6) AS log2_v,
        ROUND(POW(p_retailprice, 0.5), 6) AS pow_v FROM part""")),

    // string functions (StringFunctions.java)
    Q("q_scalar_string",
      (s, d) => Tables.customer(s, d).select(
        col("c_custkey"),
        upper(col("c_name")).as("upper_v"),
        lower(col("c_mktsegment")).as("lower_v"),
        substring(col("c_name"), 1, 8).as("substr_v"),
        length(col("c_name")).as("len_v"),
        reverse(col("c_mktsegment")).as("rev_v"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey")).as("concat_v"),
        F.strpos(col("c_name"), "#").as("strpos_v"),
        F.splitPart(col("c_name"), "#", 2).as("split_v"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("lpad_v"),
        rpad(col("c_mktsegment"), 12, "*").as("rpad_v"),
        regexp_replace(col("c_name"), "0+", "0").as("re_repl_v"),
        regexp_extract(col("c_name"), "([0-9]+)$", 1).as("re_ext_v"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("transl_v"),
        repeat(substring(col("c_mktsegment"), 1, 2), 3).as("repeat_v"),
        col("c_name").startsWith("Customer").as("startswith_v"),
        col("c_name").endsWith("1").as("endswith_v"),
        F.strcmp(col("c_mktsegment"), lit("HOUSEHOLD")).as("strcmp_v"),
        F.hammingDistanceStatic(col("c_mktsegment"), lit("BUILDING "), 10)
          .as("hamming_v"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev_v")),
      Some("""SELECT c_custkey, UPPER(c_name) AS upper_v,
        LOWER(c_mktsegment) AS lower_v, SUBSTRING(c_name, 1, 8) AS substr_v,
        LENGTH(c_name) AS len_v, REVERSE(c_mktsegment) AS rev_v,
        CONCAT_WS('-', c_mktsegment, c_custkey) AS concat_v,
        STRPOS(c_name, '#') AS strpos_v,
        SPLIT_PART(c_name, '#', 2) AS split_v,
        LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS lpad_v,
        RPAD(c_mktsegment, 12, '*') AS rpad_v,
        REGEXP_REPLACE(c_name, '0+', '0', 'g') AS re_repl_v,
        COALESCE(regexp_extract(c_name, '([0-9]+)$', 1), '') AS re_ext_v,
        TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS transl_v,
        REPEAT(SUBSTRING(c_mktsegment, 1, 2), 3) AS repeat_v,
        STARTS_WITH(c_name, 'Customer') AS startswith_v,
        c_name LIKE '%1' AS endswith_v,
        CASE WHEN c_mktsegment < 'HOUSEHOLD' THEN -1
             WHEN c_mktsegment > 'HOUSEHOLD' THEN 1 ELSE 0 END AS strcmp_v,
        CASE WHEN LENGTH(c_mktsegment) != 9 THEN -1
             ELSE hamming(c_mktsegment, 'BUILDING ') END AS hamming_v,
        levenshtein(c_mktsegment, 'BUILDING') AS lev_v
        FROM customer""")),

    // date/time functions (DateTimeFunctions.java, 645 LoC)
    Q("q_scalar_datetime",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("year_v"),
        quarter(col("o_orderdate")).as("quarter_v"),
        month(col("o_orderdate")).as("month_v"),
        dayofmonth(col("o_orderdate")).as("dom_v"),
        dayofyear(col("o_orderdate")).as("doy_v"),
        (dayofweek(col("o_orderdate")) - 1).as("dow_v"),
        weekofyear(col("o_orderdate")).as("woy_v"),
        date_trunc("month", col("o_orderdate")).as("trunc_month_v"),
        date_trunc("week", col("o_orderdate")).as("trunc_week_v"),
        F.toEpochDays(col("o_orderdate")).as("epoch_days_v"),
        F.toEpochSeconds(col("o_orderdate")).as("epoch_sec_v"),
        datediff(col("o_orderdate"), lit("1995-01-01")).as("datediff_v"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt_v")),
      Some("""SELECT o_orderkey, YEAR(o_orderdate) AS year_v,
        QUARTER(o_orderdate) AS quarter_v, MONTH(o_orderdate) AS month_v,
        DAYOFMONTH(o_orderdate) AS dom_v, DAYOFYEAR(o_orderdate) AS doy_v,
        DAYOFWEEK(o_orderdate) AS dow_v, WEEKOFYEAR(o_orderdate) AS woy_v,
        DATE_TRUNC('month', o_orderdate) AS trunc_month_v,
        DATE_TRUNC('week', o_orderdate) AS trunc_week_v,
        epoch_us(o_orderdate) // 1000000 // 86400 AS epoch_days_v,
        epoch_us(o_orderdate) // 1000000 AS epoch_sec_v,
        DATE_DIFF('day', DATE '1995-01-01', o_orderdate) AS datediff_v,
        strftime(o_orderdate, '%Y-%m-%d') AS fmt_v FROM orders""")),

    // epoch bucketing (dateTimeConvert / toEpochXXXRounded)
    Q("q_scalar_timebucket",
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        F.timeBucket(col("ts"), 900).as("bucket_15m"),
        F.epochBucketMillis(col("ts"), 3600000L).as("bucket_ms_1h"),
        F.toEpochHours(col("ts")).as("epoch_hours"),
        F.toEpochMinutes(col("ts")).as("epoch_min")),
      Some(Par.evOracle("""SELECT event_id,
        make_timestamp((epoch_us(ts) // 1000000 // 900) * 900 * 1000000) AS bucket_15m,
        (epoch_us(ts) // 1000 // 3600000) * 3600000 AS bucket_ms_1h,
        epoch_us(ts) // 1000000 // 3600 AS epoch_hours,
        epoch_us(ts) // 1000000 // 60 AS epoch_min FROM ev"""))),

    // toDateTime / fromDateTime (Joda-format conversions) — format +
    // parse round-trip (DateTimeFunctions.java, DateTimeConvert.java)
    Q("q_scalar_dateconvert",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("todt_v"),
        date_format(col("o_orderdate"), "yyyy/MM").as("ym_v"),
        to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd"),
          "yyyy-MM-dd").as("fromdt_v"),
        unix_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
          "yyyy-MM-dd HH:mm:ss").as("parse_epoch_v")),
      Some("""SELECT o_orderkey,
        strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS todt_v,
        strftime(o_orderdate, '%Y/%m') AS ym_v,
        strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS fromdt_v,
        epoch_us(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
          '%Y-%m-%d %H:%M:%S')) // 1000000 AS parse_epoch_v
        FROM orders""")),

    // dateTimeConvert 4-part spec strings ('size:UNIT:FORMAT[:pattern]'
    // input/output + 'size:UNIT' granularity — DateTimeFormatSpec): every
    // format kind (EPOCH / TIMESTAMP / SIMPLE_DATE_FORMAT) on each side
    Q("q_scalar_dtconvert_spec",
      (s, d) => {
        val ts = col("o_orderdate").cast("timestamp")
        Tables.orders(s, d).select(
          col("o_orderkey"),
          F.dateTimeConvert(ts, "TIMESTAMP",
            "1:MILLISECONDS:EPOCH", "15:MINUTES").as("ep15_ms"),
          F.dateTimeConvert(ts, "TIMESTAMP",
            "1:DAYS:SIMPLE_DATE_FORMAT:yyyy-MM-dd", "1:DAYS").as("day_str"),
          F.dateTimeConvert(unix_timestamp(ts), "1:SECONDS:EPOCH",
            "1:HOURS:EPOCH", "1:HOURS").as("ep_hours"),
          F.dateTimeConvert(ts, "TIMESTAMP", "TIMESTAMP", "1:DAYS")
            .as("day_ts"),
          F.dateTimeConvert(date_format(col("o_orderdate"), "yyyy-MM-dd"),
            "1:DAYS:SIMPLE_DATE_FORMAT:yyyy-MM-dd",
            "1:MINUTES:EPOCH", "30:MINUTES").as("ep_min"))
      },
      Some("""SELECT o_orderkey,
        (epoch_us(o_orderdate) // 1000 // 900000) * 900000 AS ep15_ms,
        strftime(o_orderdate, '%Y-%m-%d') AS day_str,
        epoch_us(o_orderdate) // 1000000 // 3600 AS ep_hours,
        make_timestamp((epoch_us(o_orderdate) // 1000000 // 86400)
          * 86400 * 1000000) AS day_ts,
        (epoch_us(o_orderdate) // 1000 // 1800000) * 1800000 // 60000
          AS ep_min
        FROM orders""")),

    // JSON functions (JsonFunctions.java / jsonExtractScalar)
    Q("q_scalar_json",
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        F.jsonExtractScalar(col("props"), "$.k").as("k_str"),
        F.jsonExtractLong(col("props"), "$.k").as("k_long"),
        F.jsonExtractScalar(col("props"), "$.missing").as("k_missing"),
        get_json_object(col("props"), "$").isNotNull.as("is_json")),
      Some("""SELECT event_id,
        json_extract_string(props, '$.k') AS k_str,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
        json_extract_string(props, '$.missing') AS k_missing,
        json_valid(props) AS is_json FROM events""")),

    // array functions over the MV-style embedding column
    Q("q_scalar_array",
      (s, d) => Tables.embeddings(s, d).select(
        col("vec_id"),
        F.arrayLength(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_v"),
        F.arrayMin(col("embedding")).as("min_v"),
        F.arrayMax(col("embedding")).as("max_v"),
        // slice is exercised scalar-wise (element_at over the sliced
        // array): the driver's compare cannot sort array-typed columns
        element_at(slice(col("embedding"), 1, 3), 2).as("head3_2"),
        element_at(slice(col("embedding"), 1, 3), 3).as("head3_3"),
        F.arrayIndexOf(col("embedding"), F.arrayMax(col("embedding")))
          .as("argmax_v"),
        array_contains(col("embedding"), element_at(col("embedding"), 5))
          .as("contains_v")),
      Some("""SELECT vec_id, len(embedding) AS dim,
        embedding[1] AS first_v,
        list_min(embedding) AS min_v, list_max(embedding) AS max_v,
        embedding[1:3][2] AS head3_2, embedding[1:3][3] AS head3_3,
        list_position(embedding, list_max(embedding)) - 1 AS argmax_v,
        list_contains(embedding, embedding[5]) AS contains_v
        FROM embeddings""")),

    // case-when / coalesce / nullif / cast (ObjectFunctions, Cast)
    Q("q_scalar_case_cast",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("price_band"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status_v"),
        col("o_orderkey").cast("string").as("key_str"),
        col("o_orderkey").cast("double").as("key_dbl"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("prio_num"),
        col("o_totalprice").cast("int").as("price_int"),
        (col("o_orderstatus") === "F").cast("int").as("bool_as_int")),
      Some("""SELECT o_orderkey,
        CASE WHEN o_totalprice > 300000 THEN 'high'
             WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS price_band,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_v,
        CAST(o_orderkey AS VARCHAR) AS key_str,
        CAST(o_orderkey AS DOUBLE) AS key_dbl,
        CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS prio_num,
        CAST(TRUNC(o_totalprice) AS INT) AS price_int,
        CAST(o_orderstatus = 'F' AS INT) AS bool_as_int FROM orders""")),

    // trig (TrigonometricFunctions.java) — rounded: JDK vs libm may differ
    // in the last ulp
    Q("q_scalar_trig",
      (s, d) => {
        val x = col("p_retailprice") / 1000.0
        Tables.part(s, d).select(
          col("p_partkey"),
          Par.r6(sin(x)).as("sin_v"), Par.r6(cos(x)).as("cos_v"),
          Par.r6(tan(x)).as("tan_v"), Par.r6(atan(x)).as("atan_v"),
          Par.r6(atan2(x, lit(1.0))).as("atan2_v"),
          Par.r6(degrees(x)).as("degrees_v"),
          Par.r6(radians(col("p_size"))).as("radians_v"),
          Par.r6(sinh(x)).as("sinh_v"), Par.r6(cosh(x)).as("cosh_v"),
          Par.r6(tanh(x)).as("tanh_v"))
      },
      Some("""SELECT p_partkey,
        ROUND(SIN(x), 6) AS sin_v, ROUND(COS(x), 6) AS cos_v,
        ROUND(TAN(x), 6) AS tan_v, ROUND(ATAN(x), 6) AS atan_v,
        ROUND(ATAN2(x, 1.0), 6) AS atan2_v,
        ROUND(DEGREES(x), 6) AS degrees_v,
        ROUND(RADIANS(p_size), 6) AS radians_v,
        ROUND((EXP(x) - EXP(-x)) / 2, 6) AS sinh_v,
        ROUND((EXP(x) + EXP(-x)) / 2, 6) AS cosh_v,
        ROUND((EXP(x) - EXP(-x)) / (EXP(x) + EXP(-x)), 6) AS tanh_v
        FROM (SELECT p_partkey, p_size, p_retailprice / 1000.0 AS x
          FROM part)""")),

    // hash functions (HashFunctions.java) + the shared 60-bit hash
    Q("q_scalar_hash",
      (s, d) => Tables.nation(s, d).select(
        col("n_nationkey"),
        md5(col("n_name")).as("md5_v"),
        sha2(col("n_name"), 256).as("sha256_v"),
        F.hash60(col("n_name")).as("hash60_v"),
        base64(col("n_name").cast("binary")).as("b64_v")),
      Some("""SELECT n_nationkey, md5(n_name) AS md5_v,
        sha256(n_name) AS sha256_v,
        ('0x' || substr(md5(n_name), 1, 15))::BIGINT AS hash60_v,
        to_base64(encode(n_name)) AS b64_v FROM nation""")))
}
