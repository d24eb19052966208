package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import java.time.{LocalDate, ZoneOffset}

/** Custom optimizer rule (SURVEY §4.1 — the reference's
  * `TimePredicateFilterOptimizer` rewrites `timeConvert(col) op literal`
  * into a direct range on the raw time column so segment/partition pruning
  * can fire).
  *
  * Spark analog: predicates like `unix_timestamp(ts) >= 1704067200` or
  * `year(ts) = 2024` wrap the column in a function, so they cannot be
  * pushed to the parquet scan — the whole file set is read. This rule
  * rewrites them into equivalent raw-column ranges, which Catalyst then
  * pushes down (min/max row-group skipping + partition pruning). At 100 TB
  * with time-partitioned data this is the difference between scanning a
  * day and scanning the table.
  *
  * Soundness: unix_timestamp(ts) = floor(epochSeconds(ts)); for integer L
  *   floor(e) >= L  ⇔  e >= L          floor(e) >  L  ⇔  e >= L+1
  *   floor(e) <  L  ⇔  e <  L          floor(e) <= L  ⇔  e <  L+1
  *   floor(e) =  L  ⇔  L <= e < L+1
  * year(ts) = Y     ⇔  Y-01-01 <= ts < (Y+1)-01-01 (session tz = UTC).
  * Handles TIMESTAMP and TIMESTAMP_NTZ columns (parquet without
  * isAdjustedToUTC reads back as NTZ) and the `Cast(ts AS date)` the
  * analyzer inserts under year(). Registered via
  * GraftExtensions.injectOptimizerRule. */
case class TimePredicateRewrite(dummy: Boolean = true)
  extends Rule[LogicalPlan] {

  /** Epoch-based unix_timestamp over TIMESTAMP is tz-independent, but the
    * NTZ interpretation and year(ts)/Cast(ts AS date) all evaluate in the
    * SESSION timezone — the rewrite's literals are computed in UTC, so
    * those forms are only sound when the session zone is UTC. Firing them
    * elsewhere would produce shifted ranges (wrong results, not just a
    * missed pruning), so the extractors below decline instead. */
  private def utcSession: Boolean =
    conf.sessionLocalTimeZone == "UTC" ||
      conf.sessionLocalTimeZone == "Etc/UTC"

  private def isTs(dt: DataType): Boolean =
    dt == TimestampType || (dt == TimestampNTZType && utcSession)

  /** seconds → timestamp literal of the column's own type (session tz is
    * UTC, so the micros value is identical for TZ and NTZ). */
  private def secLit(seconds: Long, dt: DataType): Literal =
    Literal(seconds * 1000000L, dt)
  private def yearSec(y: Int): Long =
    LocalDate.of(y, 1, 1).atStartOfDay(ZoneOffset.UTC).toInstant.getEpochSecond

  private object SecondsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Cast(SecondsLit(v), _, _, _) => Some(v)
      case _ => None
    }
  }

  private object UnixTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case ut: UnixTimestamp if isTs(ut.timeExp.dataType) => Some(ut.timeExp)
      case ut: ToUnixTimestamp if isTs(ut.timeExp.dataType) =>
        Some(ut.timeExp)
      case _ => None
    }
  }

  /** year(x): x is a date col, a ts col, or Cast(ts AS date). Returns the
    * underlying column + its type. */
  private object YearOf {
    def unapply(e: Expression): Option[Expression] = e match {
      // ts→date casts and year-of-timestamp evaluate in session tz: only
      // rewrite under UTC. year(date) is tz-independent — always sound.
      case Year(Cast(c, DateType, _, _))
        if isTs(c.dataType) && utcSession => Some(c)
      case Year(c) if isTs(c.dataType) && utcSession => Some(c)
      case Year(c) if c.dataType == DateType => Some(c)
      case _ => None
    }
  }

  private def yearRange(c: Expression, y: Int): Expression = c.dataType match {
    case DateType =>
      val lo = Literal(LocalDate.of(y, 1, 1).toEpochDay.toInt, DateType)
      val hi = Literal(LocalDate.of(y + 1, 1, 1).toEpochDay.toInt, DateType)
      And(GreaterThanOrEqual(c, lo), LessThan(c, hi))
    case dt =>
      And(GreaterThanOrEqual(c, secLit(yearSec(y), dt)),
        LessThan(c, secLit(yearSec(y + 1), dt)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan transformAllExpressions {
      // unix_timestamp(ts) cmp L  →  ts cmp timestamp literal
      case GreaterThanOrEqual(UnixTs(c), SecondsLit(l)) =>
        GreaterThanOrEqual(c, secLit(l, c.dataType))
      case GreaterThan(UnixTs(c), SecondsLit(l)) =>
        GreaterThanOrEqual(c, secLit(l + 1, c.dataType))
      case LessThan(UnixTs(c), SecondsLit(l)) =>
        LessThan(c, secLit(l, c.dataType))
      case LessThanOrEqual(UnixTs(c), SecondsLit(l)) =>
        LessThan(c, secLit(l + 1, c.dataType))
      case EqualTo(UnixTs(c), SecondsLit(l)) =>
        And(GreaterThanOrEqual(c, secLit(l, c.dataType)),
          LessThan(c, secLit(l + 1, c.dataType)))
      // mirrored literal-first forms
      case GreaterThanOrEqual(SecondsLit(l), UnixTs(c)) =>
        LessThan(c, secLit(l + 1, c.dataType))
      case GreaterThan(SecondsLit(l), UnixTs(c)) =>
        LessThan(c, secLit(l, c.dataType))
      case LessThan(SecondsLit(l), UnixTs(c)) =>
        GreaterThanOrEqual(c, secLit(l + 1, c.dataType))
      case LessThanOrEqual(SecondsLit(l), UnixTs(c)) =>
        GreaterThanOrEqual(c, secLit(l, c.dataType))
      case EqualTo(SecondsLit(l), UnixTs(c)) =>
        And(GreaterThanOrEqual(c, secLit(l, c.dataType)),
          LessThan(c, secLit(l + 1, c.dataType)))
      // year(ts) = Y → half-open year range on the raw column
      case EqualTo(YearOf(c), Literal(v: Int, IntegerType)) => yearRange(c, v)
      case EqualTo(Literal(v: Int, IntegerType), YearOf(c)) => yearRange(c, v)
      // date_trunc(unit, ts) = T → half-open [T, T + unit) when T is
      // unit-aligned (trunc output is always aligned, so an unaligned
      // literal can never match — left untouched, constant-folding's job)
      case EqualTo(TruncOf(c, unit), lit @ Literal(_, _))
        if truncRange(c, unit, lit).isDefined => truncRange(c, unit, lit).get
      case EqualTo(lit @ Literal(_, _), TruncOf(c, unit))
        if truncRange(c, unit, lit).isDefined => truncRange(c, unit, lit).get
    }

  /** date_trunc(unit, col): unit literal + ts column, UTC session only. */
  private object TruncOf {
    def unapply(e: Expression): Option[(Expression, String)] = e match {
      case TruncTimestamp(Literal(fmt, StringType), c, _)
        if isTs(c.dataType) && utcSession =>
        Some((c, fmt.toString.toLowerCase))
      case _ => None
    }
  }

  private def truncRange(c: Expression, unit: String, lit: Literal)
  : Option[Expression] = {
    val micros = lit.value match {
      case l: java.lang.Long => l.longValue
      case _ => return None
    }
    if (!isTs(lit.dataType)) return None
    val instant = java.time.Instant.ofEpochSecond(
      math.floorDiv(micros, 1000000L),
      math.floorMod(micros, 1000000L) * 1000L)
    val zdt = instant.atZone(ZoneOffset.UTC)
    import java.time.temporal.ChronoUnit
    val (truncated, next) = unit match {
      case "hour" => (zdt.truncatedTo(ChronoUnit.HOURS), zdt.plusHours(1))
      case "day" | "dd" => (zdt.truncatedTo(ChronoUnit.DAYS), zdt.plusDays(1))
      case "week" =>
        val t = zdt.truncatedTo(ChronoUnit.DAYS)
          .minusDays((zdt.getDayOfWeek.getValue - 1).toLong)
        (t, zdt.plusWeeks(1))
      case "month" | "mon" | "mm" =>
        (zdt.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1), zdt.plusMonths(1))
      case "year" | "yyyy" | "yy" =>
        (zdt.truncatedTo(ChronoUnit.DAYS).withDayOfYear(1), zdt.plusYears(1))
      case _ => return None
    }
    // only aligned literals rewrite (unaligned never match trunc output)
    if (truncated.toInstant != instant) None
    else {
      val hiMicros = next.toInstant.getEpochSecond * 1000000L +
        next.toInstant.getNano / 1000L
      Some(And(GreaterThanOrEqual(c, Literal(micros, c.dataType)),
        LessThan(c, Literal(hiMicros, c.dataType))))
    }
  }
}
