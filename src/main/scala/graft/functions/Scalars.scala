package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Pinot-named scalar-function surface, re-expressed as Spark Columns.
  *
  * Reference: the v1 engine's 59 `TransformFunction`s plus `@ScalarFunction`
  * registry (`pinot-common/.../function/FunctionRegistry.java:44,75`, enum
  * `TransformFunctionType.java:27-161`). ~90% are pure renames of Spark
  * built-ins (SURVEY §2.3); the rest are tiny Column compositions. Everything
  * here stays inside whole-stage codegen — no Scala UDFs on the hot path.
  * Higher-order functions (`transform`/`filter`/`aggregate`) are used for the
  * array/MV surface, mirroring Pinot's MV transform functions.
  */
object Scalars {

  // ---- arithmetic (ArithmeticFunctions.java) ----
  def mod(a: Column, b: Column): Column = a % b
  def roundDecimal(c: Column, scale: Int): Column = round(c, scale)
  /** Pinot truncate(x, s): toward-zero rounding at s decimals. */
  def truncate(c: Column, s: Int): Column = {
    val f = pow(lit(10.0), lit(s))
    (c * f).cast("long") / f
  }
  def sign(c: Column): Column = signum(c)

  // ---- comparison / logic (ComparisonFunctions, ObjectFunctions) ----
  /** Pinot isDistinctFrom — null-safe inequality. */
  def isDistinctFrom(a: Column, b: Column): Column = !(a <=> b)
  def isNotDistinctFrom(a: Column, b: Column): Column = a <=> b

  // ---- string (StringFunctions.java, 765 LoC) ----
  def strpos(c: Column, sub: String): Column = locate(sub, c)
  def leftSubStr(c: Column, n: Int): Column = substring(c, 1, n)
  def rightSubStr(c: Column, n: Int): Column = substring(c, -n, n)
  def splitPart(c: Column, sep: String, idx: Int): Column =
    element_at(split(c, java.util.regex.Pattern.quote(sep)), idx)
  def normalizeWs(c: Column): Column = regexp_replace(trim(c), "\\s+", " ")
  def codepoint(c: Column): Column = ascii(c)
  def chrOf(c: Column): Column = chr(c)
  /** Pinot strcmp(a,b) ∈ {-1,0,1}. */
  def strcmp(a: Column, b: Column): Column =
    when(a < b, -1).when(a > b, 1).otherwise(0)
  /** Pinot hammingDistance over equal-length strings (StringFunctions.java).
    * HOF formulation — general but CodegenFallback: placing it in a
    * projection disables whole-stage codegen for EVERY expression in that
    * stage. Prefer [[hammingDistanceStatic]] when a length bound is known. */
  def hammingDistance(a: Column, b: Column): Column =
    when(length(a) =!= length(b), lit(-1)).otherwise(
      size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y),
        c => c)))

  /** Codegen-friendly hammingDistance for strings of length ≤ maxLen:
    * statically expanded per-position compares (substring is codegen'd),
    * so the surrounding projection keeps whole-stage codegen. */
  def hammingDistanceStatic(a: Column, b: Column, maxLen: Int): Column =
    when(length(a) =!= length(b), lit(-1)).otherwise(
      (1 to maxLen).map(i =>
        (substring(a, i, 1) =!= substring(b, i, 1)).cast("int"))
        .reduce(_ + _))

  // ---- date/time (DateTimeFunctions.java, 645 LoC) ----
  def toEpochSeconds(ts: Column): Column = unix_timestamp(ts)
  def toEpochMillis(ts: Column): Column = unix_millis(ts)
  def toEpochMinutes(ts: Column): Column = (unix_timestamp(ts) / 60).cast("long")
  def toEpochHours(ts: Column): Column = (unix_timestamp(ts) / 3600).cast("long")
  def toEpochDays(ts: Column): Column = (unix_timestamp(ts) / 86400).cast("long")
  def fromEpochDays(d: Column): Column = timestamp_seconds(d * 86400L)
  def fromEpochSeconds(s: Column): Column = timestamp_seconds(s)
  /** Pinot toEpochXXXRounded / dateTimeConvert epoch-bucketing:
    * floor epoch-millis to an N-millisecond bucket. */
  def epochBucketMillis(ts: Column, bucketMs: Long): Column =
    (unix_millis(ts) / bucketMs).cast("long") * bucketMs
  /** dateTimeConvert(col, 'EPOCH_MS', 'TIMESTAMP', 'N:MINUTES')-style:
    * truncate a timestamp to an N-unit bucket, returning a timestamp. */
  def timeBucket(ts: Column, bucketSeconds: Long): Column =
    timestamp_seconds(
      (unix_timestamp(ts) / bucketSeconds).cast("long") * bucketSeconds)
  def timezoneHour(tz: String): Column =
    (lit(java.util.TimeZone.getTimeZone(tz).getRawOffset) / 3600000).cast("int")
  def yearOfWeek(ts: Column): Column = year(date_trunc("week", ts))

  /** timeConvert(col, fromUnit, toUnit) (TimeConvertTransformFunction):
    * integral epoch value conversion between time units. */
  def timeConvert(c: Column, fromUnit: String, toUnit: String): Column =
    (c.cast("long") * unitMillis(fromUnit) / unitMillis(toUnit)).cast("long")

  /** Pinot dateTrunc(unit, value[, inputTimeUnit]) —
    * DateTruncTransformFunction: truncate an epoch value (in
    * `inputTimeUnit`, default milliseconds) to the calendar-unit boundary
    * (UTC), returned in the same unit. */
  def dateTrunc(unit: String, c: Column,
                inputTimeUnit: String = "MILLISECONDS"): Column = {
    val u = unitMillis(inputTimeUnit)
    (unix_millis(date_trunc(unit, timestamp_millis(c.cast("long") * u))) / u)
      .cast("long")
  }

  /** toDateTime(epochMillis, pattern) — epoch millis formatted (UTC). */
  def toDateTime(c: Column, pattern: String): Column =
    date_format(timestamp_millis(c.cast("long")), pattern)

  /** fromDateTime(dateString, pattern) — parsed to epoch millis. */
  def fromDateTime(c: Column, pattern: String): Column =
    unix_millis(to_timestamp(c, pattern))

  // ---- dateTimeConvert 4-part spec strings (DateTimeConvert.java +
  // DateTimeFormatSpec: 'size:UNIT:FORMAT[:pattern]' input/output formats
  // and a 'size:UNIT' granularity) ----

  private def unitMillis(u: String): Long = u.toUpperCase match {
    case "MILLISECONDS" => 1L
    case "SECONDS" => 1000L
    case "MINUTES" => 60000L
    case "HOURS" => 3600000L
    case "DAYS" => 86400000L
    case other =>
      throw new IllegalArgumentException(s"unsupported time unit $other")
  }

  private final case class DtFmt(sizeMs: Long, kind: String, pattern: String)

  private def parseDtFmt(s: String): DtFmt = {
    val parts = s.split(":", 4)
    if (parts.length == 1 && parts(0).equalsIgnoreCase("TIMESTAMP"))
      DtFmt(1L, "TIMESTAMP", null) // Pinot shorthand for 1:MILLISECONDS:TIMESTAMP
    else {
      require(parts.length >= 3, s"bad dateTimeConvert format spec: $s")
      val sizeMs = parts(0).toLong * unitMillis(parts(1))
      parts(2).toUpperCase match {
        case "EPOCH" => DtFmt(sizeMs, "EPOCH", null)
        case "TIMESTAMP" => DtFmt(sizeMs, "TIMESTAMP", null)
        case "SIMPLE_DATE_FORMAT" =>
          require(parts.length == 4, s"SIMPLE_DATE_FORMAT needs a pattern: $s")
          DtFmt(sizeMs, "SDF", parts(3))
        case other =>
          throw new IllegalArgumentException(s"unsupported format $other in $s")
      }
    }
  }

  /** Full dateTimeConvert(col, inputFormat, outputFormat, granularity):
    * input decodes to epoch millis, floors to the granularity bucket, and
    * re-encodes per the output spec. Pattern-based specs use Spark's
    * java.time patterns (the common Joda subset — yyyy/MM/dd/HH/mm/ss —
    * is identical). Epoch arithmetic stays integral; positive epochs only
    * (floor == truncate there, and both engines agree). */
  def dateTimeConvert(c: Column, inputFormat: String, outputFormat: String,
                      granularity: String): Column = {
    val in = parseDtFmt(inputFormat)
    val out = parseDtFmt(outputFormat)
    val g = granularity.split(":", 2)
    require(g.length == 2, s"bad granularity spec: $granularity")
    val bucketMs = g(0).toLong * unitMillis(g(1))
    val epochMs: Column = in.kind match {
      case "EPOCH" => c.cast("long") * in.sizeMs
      case "TIMESTAMP" => unix_millis(c.cast("timestamp"))
      case "SDF" => unix_millis(to_timestamp(c, in.pattern))
    }
    val floored = (epochMs / bucketMs).cast("long") * bucketMs
    out.kind match {
      case "EPOCH" => (floored / out.sizeMs).cast("long")
      case "TIMESTAMP" => timestamp_millis(floored)
      case "SDF" => date_format(timestamp_millis(floored), out.pattern)
    }
  }

  // ---- JSON (JsonFunctions.java; JsonExtractScalarTransformFunction) ----
  def jsonExtractScalar(c: Column, path: String): Column =
    get_json_object(c, path)
  def jsonExtractLong(c: Column, path: String): Column =
    get_json_object(c, path).cast("long")
  def jsonExtractDouble(c: Column, path: String): Column =
    get_json_object(c, path).cast("double")
  /** JSON_MATCH('path = value') filter rewrite (JsonMatchFilterOperator). */
  def jsonMatchEq(c: Column, path: String, v: String): Column =
    get_json_object(c, path) === v

  // ---- JSON_MATCH predicate subset (JsonMatchFilterOperator + json
  // index; test shapes in JsonMatchFilterOperatorTest/JsonIndexTest) ----
  // Supported: '"$.path" <op> literal' with op ∈ =, !=, <>, <, <=, >, >=,
  // IS NULL, IS NOT NULL; the path may hold one [*] array wildcard
  // ('"$.arr[*].k" = ''v'''). Array predicates use ANY-element-matches
  // semantics (the reference's json-index posting semantics).

  private[graft] val JsonPredRe =
    """^\s*"([^"]+)"\s*(=|!=|<>|<=|>=|<|>)\s*(?:'([^']*)'|(-?\d+(?:\.\d+)?))\s*$""".r
  private[graft] val JsonNullRe =
    """^\s*"([^"]+)"\s+IS\s+(NOT\s+)?NULL\s*$""".r

  /** All scalar values matched by a wildcard json path, as array<string>.
    * get_json_object returns a JSON array string for multiple matches but
    * a QUOTED bare scalar for exactly one — normalize both. */
  private def jsonWildValues(c: Column, path: String): Column = {
    val wild = get_json_object(c, path)
    coalesce(
      from_json(wild, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)),
      when(wild.isNotNull,
        array(regexp_replace(wild, "^\"|\"$", ""))))
  }

  /** Numeric twin of [[jsonWildValues]]: JSON numbers don't coerce into
    * an array<string> parse, so numeric predicates parse the wildcard
    * result as array<double> directly. */
  private def jsonWildNums(c: Column, path: String): Column = {
    val wild = get_json_object(c, path)
    coalesce(
      from_json(wild, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)),
      when(wild.isNotNull, array(wild.cast("double"))))
  }

  /** Compile a JSON_MATCH predicate string against a JSON column. */
  def jsonMatch(c: Column, predicate: String): Column = {
    def cmp(op: String, x: Column, v: Column): Column = op match {
      case "=" => x === v
      case "!=" | "<>" => x =!= v
      case "<" => x < v
      case "<=" => x <= v
      case ">" => x > v
      case ">=" => x >= v
    }
    predicate match {
      case JsonNullRe(path, notNull) =>
        val v =
          if (path.contains("[*]")) jsonWildValues(c, path)
          else get_json_object(c, path)
        if (notNull == null) v.isNull else v.isNotNull
      case JsonPredRe(path, op, strV, numV) =>
        val numeric = strV == null
        if (path.contains("[*]")) {
          // ANY-element semantics via codegen-friendly natives — an
          // `exists` HOF here would knock the whole filter stage out of
          // whole-stage codegen: any>t ⟺ max>t, any<t ⟺ min<t,
          // any≠v ⟺ something remains after removing v
          def anyMatch(vals: Column, v: Column): Column = op match {
            case "=" => array_contains(vals, v)
            case "!=" | "<>" => size(array_remove(vals, v)) > 0
            case ">" => array_max(vals) > v
            case ">=" => array_max(vals) >= v
            case "<" => array_min(vals) < v
            case "<=" => array_min(vals) <= v
          }
          if (numeric) anyMatch(jsonWildNums(c, path), lit(numV.toDouble))
          else anyMatch(jsonWildValues(c, path), lit(strV))
        } else {
          val v = get_json_object(c, path)
          if (numeric) cmp(op, v.cast("double"), lit(numV.toDouble))
          else cmp(op, v, lit(strV))
        }
      case other =>
        throw new IllegalArgumentException(s"bad JSON_MATCH predicate: $other")
    }
  }

  // ---- array / MV (Array* transform functions; MV columns = ArrayType) ----
  def arrayLength(c: Column): Column = size(c)
  def cardinality(c: Column): Column = size(c)
  def arraySum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x.cast("double"))
  def arrayAverage(c: Column): Column = arraySum(c) / size(c)
  def arrayMin(c: Column): Column = array_min(c)
  def arrayMax(c: Column): Column = array_max(c)
  def arrayIndexOf(c: Column, v: Column): Column = array_position(c, v) - 1
  def arrayElementAt(c: Column, i: Int): Column = element_at(c, i)
  def arraySlice(c: Column, from: Int, len: Int): Column = slice(c, from, len)
  def arrayDistinct(c: Column): Column = array_distinct(c)
  def arrayReverse(c: Column): Column = reverse(c)
  def arraySort(c: Column): Column = array_sort(c)
  def arrayContainsValue(c: Column, v: Column): Column = array_contains(c, v)
  def arrayRemoveValue(c: Column, v: Column): Column = array_remove(c, v)
  def arrayUnionOf(a: Column, b: Column): Column = array_union(a, b)
  def arrayConcatOf(a: Column, b: Column): Column = concat(a, b)
  /** Pinot valueIn(mvCol, v1, v2, …): the MV values that are in the set. */
  def valueIn(c: Column, vs: Seq[String]): Column =
    filter(c, x => x.isin(vs: _*))
  /** Pinot mapValue(mapCol, key): value under `key` of a map column
    * (MapValueTransformFunction; null when absent). */
  def mapValue(c: Column, key: Column): Column = element_at(c, key)

  /** Pinot regexpExtract(value, regexp[, group[, default]])
    * (RegexpExtractTransformFunction): group `group` of the first match,
    * `default` when the regexp does not match. Spark's regexp_extract
    * yields '' on no-match, so the default needs an explicit gate. */
  def regexpExtract(c: Column, pattern: String, group: Int = 0,
                    default: String = ""): Column =
    when(c.rlike(pattern), regexp_extract(c, pattern, group))
      .otherwise(lit(default))

  // ---- hashing (HashFunctions.java) ----
  def sha256Hex(c: Column): Column = sha2(c, 256)
  def sha512Hex(c: Column): Column = sha2(c, 512)
  def md5Hex(c: Column): Column = md5(c)
  /** Deterministic 60-bit hash shared with the DuckDB oracle:
    * first 15 hex digits of md5, read base-16. Used by fingerprints,
    * MinHash and SimHash so both engines hash identically. */
  /** First 60 bits of md5 as a positive long — computed by the native
    * kernel ([[org.apache.spark.sql.graft.Hash60Expr]]), bit-identical
    * to `conv(substring(md5(c), 1, 15), 16, 10)` (the DuckDB oracle
    * form) without materializing the 32-char hex string, substring, or
    * base-16 parse per row. */
  def hash60(c: Column): Column =
    org.apache.spark.sql.graft.TextHashExprs.hash60(c.cast("string"))

  // ---- URL / encoding ----
  def encodeUrl(c: Column): Column = url_encode(c)
  def decodeUrl(c: Column): Column = url_decode(c)
  def toBase64(c: Column): Column = base64(c)
  def fromBase64(c: Column): Column = unbase64(c)
  /** toUtf8 / fromUtf8 (StringFunctions.java): string ↔ utf-8 bytes. */
  def toUtf8(c: Column): Column = encode(c, "UTF-8")
  def fromUtf8(c: Column): Column = decode(c, "UTF-8")
  /** toAscii: strip non-ASCII code points (StringFunctions semantics). */
  def toAsciiOnly(c: Column): Column =
    regexp_replace(c, "[^\\x00-\\x7F]", "")

  // ---- date/time arithmetic (DateTimeFunctions.java:timestampAdd/Diff,
  // ago/now are broker-evaluated relative times) ----
  def timestampAddSec(ts: Column, n: Column): Column =
    timestamp_seconds(unix_timestamp(ts) + n)
  def timestampDiffSec(a: Column, b: Column): Column =
    unix_timestamp(a) - unix_timestamp(b)

  /** jsonExtractKey(json, path): the keys under a JSON path. */
  def jsonExtractKey(c: Column, path: String): Column =
    json_object_keys(get_json_object(c, path))

  /** IpAddressFunctions.isSubnetOf — IPv4 AND IPv6 CIDR membership, by
    * address-byte prefix compare. Inputs must be literal addresses (the
    * InetAddress parse path does no DNS for literals); mixed families
    * (v4 prefix vs v6 address) are simply non-members, matching the
    * reference's family-strict behavior. */
  def isSubnetOfFn(cidr: String, ip: String): Boolean = {
    val slash = cidr.lastIndexOf('/')
    require(slash > 0, s"bad CIDR: $cidr")
    val bits = cidr.substring(slash + 1).toInt
    val netB = java.net.InetAddress.getByName(cidr.substring(0, slash))
      .getAddress
    val ipB = java.net.InetAddress.getByName(ip).getAddress
    require(bits >= 0 && bits <= netB.length * 8, s"bad prefix length: $cidr")
    if (netB.length != ipB.length) false
    else {
      val fullBytes = bits / 8
      val rem = bits % 8
      var ok = true
      var i = 0
      while (ok && i < fullBytes) { ok = netB(i) == ipB(i); i += 1 }
      if (ok && rem > 0) {
        val mask = (0xff << (8 - rem)) & 0xff
        ok = (netB(fullBytes) & mask) == (ipB(fullBytes) & mask)
      }
      ok
    }
  }

  /** Register the (few) genuinely-custom scalar functions for SQL use.
    * Mirrors `FunctionRegistry.registerFunction` — most Pinot names need no
    * registration because the Spark built-in is the same function. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("strcmp_udf",
      (a: String, b: String) => if (a == b) 0 else if (a < b) -1 else 1)
    spark.udf.register("is_subnet_of",
      (cidr: String, ip: String) => isSubnetOfFn(cidr, ip))
  }
}
