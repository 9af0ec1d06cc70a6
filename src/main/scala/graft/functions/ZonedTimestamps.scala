package graft.functions

import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.trees.TreePattern
import org.apache.spark.sql.catalyst.trees.TreePattern.TreePattern
import org.apache.spark.sql.types._

/** Opt-in zone-carrying TIMESTAMP WITH TIME ZONE
  * (`SET spark.graft.zonedTimestamps=true` /
  * `SET SESSION graft.zoned_timestamps=true`).
  *
  * The reference packs a zone id INTO every TIMESTAMP WITH TIME ZONE
  * value (presto-spi `TimestampWithTimeZoneType.java`,
  * `DateTimeEncoding.java`: millisUtc << 12 | zoneKey); Spark has no
  * zone-carrying type, and the engine's default contract (COVERAGE.md
  * "Zoned temporal types") deliberately approximates with the UTC
  * instant. Under this conf the zone is CARRIED, Spark-first: a zoned
  * value is a plain `struct<ztz_utc: timestamp, ztz_tz: string>` —
  * transparent to codegen, parquet, and shuffle (the reference's packed
  * long, re-expressed as two columns) — and every zone-observing surface
  * is rewritten at parse time into late-binding dispatch expressions
  * (the [[PrestoOperators]] trick: types are unknown at parse, so the
  * node picks its replacement once children resolve; non-zoned operands
  * keep stock behavior EXACTLY, so the rewrite is a no-op for every
  * query that never constructs a zoned value).
  *
  * Carried-zone surfaces (reference semantics, DateTimeFunctions.java /
  * DateTimeOperators.java / the $operator registry on
  * TIMESTAMP_WITH_TIME_ZONE):
  *  - literals `TIMESTAMP '2001-08-22 03:04:05.321 Asia/Tokyo'` and
  *    `CAST(x AS TIMESTAMP WITH TIME ZONE)` (zone parsed from string
  *    text; session zone UTC otherwise) construct zoned values;
  *  - `at_timezone` keeps the instant and sets the zone;
  *    `with_timezone` interprets a naive wall clock in the zone;
  *  - rendering (`CAST(z AS VARCHAR)`) prints the wall clock in the
  *    value's own zone plus the zone id; `to_iso8601` prints the
  *    numeric offset; `CAST(z AS TIMESTAMP)` yields the wall clock,
  *    `CAST(z AS DATE)` its date (TimestampWithTimeZoneOperators casts);
  *  - field extraction (hour … year_of_week, EXTRACT) reads the wall
  *    clock in the value's zone; `timezone_hour`/`timezone_minute` read
  *    the zone's offset at that instant;
  *  - `date_trunc` truncates the wall clock in the zone and KEEPS the
  *    zone; `+/- INTERVAL DAY TO SECOND` is an exact duration on the
  *    instant while `INTERVAL YEAR TO MONTH` adds on the wall clock in
  *    the zone (DateTimeOperators.java: raw-millis add vs chronology
  *    monthOfYear().add); the date_add/date_diff FIELD functions follow
  *    Joda field precision — hour-and-below on the instant,
  *    day-and-above on the wall clock (DST-aware);
  *  - comparisons (`< = >` …, BETWEEN, IN-lists) compare INSTANTS, the
  *    reference's millisUtc ordering — two values of the same instant in
  *    different zones are equal.
  *
  * GROUP BY / DISTINCT / count(DISTINCT) / window PARTITION BY on a raw
  * zoned value key the INSTANT alone — the reference's millisUtc
  * hashing — via [[graft.plans.ZonedGroupingRule]] (round 12; oracle row
  * `dialect_ztz_groupby`), and set operations (INTERSECT/EXCEPT/UNION
  * DISTINCT, plus the DataFrame dropDuplicates path) key the instant the
  * same way (round 13; oracle row `dialect_ztz_setop`). `now()`/
  * `current_timestamp` return a zone-carrying value in the SESSION zone
  * (DateTimeFunctions.java currentTimestamp; the zoned_now seam).
  * Documented residual (pinned in ZonedTimestampsSpec): ORDER BY sorts
  * instant-first with the zone string as a deterministic tie-break (any
  * reference-valid order).
  */
object ZonedTimestamps {

  val ConfKey = "spark.graft.zonedTimestamps"

  def enabled: Boolean =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString(ConfKey, "false").toBoolean
    catch { case _: Throwable => false }

  val UtcField = "ztz_utc"
  val TzField = "ztz_tz"

  val zonedType: StructType = StructType(Seq(
    StructField(UtcField, TimestampType), StructField(TzField, StringType)))

  def isZoned(dt: DataType): Boolean = dt match {
    case s: StructType => s.fields.length == 2 &&
      s.fields(0).name == UtcField && s.fields(0).dataType == TimestampType &&
      s.fields(1).name == TzField && s.fields(1).dataType == StringType
    case _ => false
  }

  private[functions] def mk(utc: Expression, tz: Expression): Expression =
    CreateNamedStruct(Seq(Literal(UtcField), utc, Literal(TzField), tz))
  private[functions] def utcOf(z: Expression): Expression =
    GetStructField(z, 0, Some(UtcField))
  private[functions] def tzOf(z: Expression): Expression =
    GetStructField(z, 1, Some(TzField))
  private[functions] def wallOf(z: Expression): Expression =
    FromUTCTimestamp(utcOf(z), tzOf(z))
  private[functions] def nullZ: Expression = Literal(null, zonedType)

  // ── TIME WITH TIME ZONE (reference presto-spi TimeWithTimeZoneType /
  // SqlTimeWithTimeZone): wall time-of-day + carried zone, re-expressed
  // as struct<ztz_tod: time(6), ztz_tz: string>. Comparisons order by
  // the UTC-normalized nanos with the zone's offset evaluated at the
  // EPOCH date — the deprecated type's documented 1970-01-01 quirk. ──
  val TodField = "ztz_tod"

  val zonedTimeType: StructType = StructType(Seq(
    StructField(TodField, TimeType(6)), StructField(TzField, StringType)))

  def isZonedTime(dt: DataType): Boolean = dt match {
    case s: StructType => s.fields.length == 2 &&
      s.fields(0).name == TodField && s.fields(0).dataType.isInstanceOf[TimeType] &&
      s.fields(1).name == TzField && s.fields(1).dataType == StringType
    case _ => false
  }

  private[functions] def mkTime(tod: Expression, tz: Expression): Expression =
    CreateNamedStruct(Seq(Literal(TodField), tod, Literal(TzField), tz))
  private[functions] def todOf(z: Expression): Expression =
    GetStructField(z, 0, Some(TodField))
  private[functions] def nullZT: Expression = Literal(null, zonedTimeType)

  /** Joda field precision (reference getTimestampField / chronology
    * duration fields): hour and below are precise (instant arithmetic);
    * day and above are imprecise (wall-clock arithmetic in the zone).
    */
  private[functions] val PreciseUnits =
    Set("HOUR", "MINUTE", "SECOND", "MILLISECOND", "MICROSECOND")

  /** Functions whose first argument observes the WALL CLOCK of a zoned
    * value (DateTimeFunctions field extraction + formatting all unpack
    * with unpackChronology(zone) — i.e. read wall time in the zone).
    */
  private val WallArgFns: Set[String] = Set(
    "hour", "minute", "second", "millisecond", "day", "day_of_month",
    "month", "year", "quarter", "day_of_week", "dow", "day_of_year", "doy",
    "week", "week_of_year", "year_of_week", "yow", "last_day_of_month",
    "date_format", "format_datetime")

  /** Functions whose first argument observes the INSTANT. */
  private val InstantArgFns: Set[String] = Set("to_unixtime")

  private def fnName(u: UnresolvedFunction): String =
    if (u.nameParts.length == 1) u.nameParts.head.toLowerCase else ""

  private def intervalish(e: Expression): Boolean = e match {
    case Literal(_, _: DayTimeIntervalType) => true
    case Literal(_, _: YearMonthIntervalType) => true
    case UnaryMinus(Literal(_, _: DayTimeIntervalType), _) => true
    case UnaryMinus(Literal(_, _: YearMonthIntervalType), _) => true
    case _ => false
  }

  val exprRewrite: PartialFunction[Expression, Expression] = {
    // instant-based comparison (TimestampWithTimeZoneOperators: every
    // comparison unpacks millisUtc) — operands wrap transparently, so
    // coercion still sees the real operand types when nothing is zoned
    case bc: BinaryComparison if !bc.left.isInstanceOf[ZonedInstant] =>
      bc.withNewChildren(Seq(ZonedInstant(bc.left), ZonedInstant(bc.right)))
    case In(v, list) if !v.isInstanceOf[ZonedInstant] =>
      In(ZonedInstant(v), list.map(ZonedInstant(_)))
    case c: Cast
        if c.dataType == StringType || c.dataType == TimestampType ||
          c.dataType == DateType || c.dataType.isInstanceOf[TimeType] =>
      ZonedRenderCast(c.child, c.dataType, c.evalMode)
    case u: UnresolvedFunction
        if WallArgFns.contains(fnName(u)) && u.arguments.nonEmpty &&
          !u.arguments.head.isInstanceOf[ZonedWall] =>
      u.copy(arguments = ZonedWall(u.arguments.head) +: u.arguments.tail)
    case u: UnresolvedFunction
        if InstantArgFns.contains(fnName(u)) && u.arguments.nonEmpty &&
          !u.arguments.head.isInstanceOf[ZonedInstant] =>
      u.copy(arguments = ZonedInstant(u.arguments.head) +: u.arguments.tail)
    case u: UnresolvedFunction
        if fnName(u) == "date_trunc" && u.arguments.size == 2 =>
      ZonedTrunc(u.arguments.head, u.arguments(1))
    // now()/current_timestamp() return TIMESTAMP WITH TIME ZONE carrying
    // the session zone (DateTimeFunctions.java currentTimestamp) —
    // renamed to the graft-only zoned_now registration so the rewrite
    // can't loop and the Spark builtins stay untouched. Bare
    // CURRENT_TIMESTAMP parses as the literal-function attribute.
    case u: UnresolvedFunction
        if Seq("now", "current_timestamp").contains(fnName(u)) &&
          u.arguments.isEmpty =>
      u.copy(nameParts = Seq("zoned_now"))
    case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        if a.nameParts.map(_.toLowerCase) == Seq("current_timestamp") =>
      UnresolvedFunction(Seq("zoned_now"), Nil, isDistinct = false)
    case ta: TimestampAdd =>
      ZonedTimestampAddX(ta.unit, ta.quantity, ta.timestamp)
    case td: TimestampDiff =>
      ZonedTimestampDiffX(td.unit, td.startTimestamp, td.endTimestamp)
    case Add(l, r, _) if intervalish(r) => ZonedIntervalAdd(l, r, negate = false)
    case Add(l, r, _) if intervalish(l) => ZonedIntervalAdd(r, l, negate = false)
    case Subtract(l, r, _) if intervalish(r) => ZonedIntervalAdd(l, r, negate = true)
  }

  /** Rewrite every expression, including subquery plans and CTE bodies
    * (UnresolvedWith keeps cteRelations outside `children` — same
    * traversal as [[PrestoOperators.apply]]).
    */
  def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformDownWithSubqueries {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (n, r, m) =>
          (n, apply(r).asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias], m)
        })
      case p => p.transformExpressionsDown(exprRewrite)
    }
}

/** The instant (UTC timestamp) of a maybe-zoned operand; transparent —
  * identical type and value — on anything that is not zoned.
  */
case class ZonedInstant(child: Expression) extends Expression
    with RuntimeReplaceable with UnaryLike[Expression] {
  import ZonedTimestamps._
  override def prettyName: String = "zoned_instant"
  override lazy val replacement: Expression =
    if (isZoned(child.dataType)) utcOf(child)
    else if (isZonedTime(child.dataType)) StaticInvoke(
      GraftFnUtils.getClass, LongType, "zonedTimeUtcNanos",
      Seq(todOf(child), tzOf(child)),
      inputTypes = Seq(TimeType(6), StringType), propagateNull = true)
    else child
  override protected def withNewChildInternal(c: Expression): ZonedInstant =
    copy(child = c)
}

/** The wall clock of a maybe-zoned operand in its own zone; transparent
  * on anything that is not zoned.
  */
case class ZonedWall(child: Expression) extends Expression
    with RuntimeReplaceable with UnaryLike[Expression] {
  import ZonedTimestamps._
  override def prettyName: String = "zoned_wall"
  override lazy val replacement: Expression =
    if (isZoned(child.dataType)) wallOf(child)
    else if (isZonedTime(child.dataType)) todOf(child)
    else child
  override protected def withNewChildInternal(c: Expression): ZonedWall =
    copy(child = c)
}

/** CAST of a maybe-zoned value to VARCHAR (render in the value's zone),
  * TIMESTAMP (wall clock), or DATE (wall-clock date) — reference
  * TimestampWithTimeZoneOperators cast family; a plain Cast otherwise.
  */
case class ZonedRenderCast(child: Expression, target: DataType,
    evalMode: EvalMode.Value, timeZoneId: Option[String] = None)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression]
    with TimeZoneAwareExpression {
  import ZonedTimestamps._
  override def prettyName: String = "zoned_cast"
  override def withTimeZone(tz: String): ZonedRenderCast = copy(timeZoneId = Some(tz))
  // TimeZoneAwareExpression's final nodePatterns overwrites the
  // RUNTIME_REPLACEABLE bit RuntimeReplaceable's init set, which hides
  // the node from ReplaceExpressions' pruned traversal — re-declare it
  // through the trait's extension point so the optimizer swaps the node
  // AND ResolveTimeZone still assigns the session zone.
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)
  override lazy val replacement: Expression =
    if (isZoned(child.dataType)) target match {
      case StringType => StaticInvoke(
        GraftFnUtils.getClass, StringType, "renderZoned",
        Seq(utcOf(child), tzOf(child)),
        inputTypes = Seq(TimestampType, StringType), propagateNull = true)
      case TimestampType => wallOf(child)
      // CAST(tstz AS TIME): the wall clock's time-of-day (no Spark
      // TIMESTAMP→TIME cast exists — extract the nanos directly)
      case t: TimeType => StaticInvoke(GraftFnUtils.getClass, t,
        "microsToNanosOfDay", Seq(wallOf(child)),
        inputTypes = Seq(TimestampType), propagateNull = true)
      case _ => Cast(wallOf(child), target, timeZoneId, evalMode)
    } else if (isZonedTime(child.dataType)) target match {
      case StringType => StaticInvoke(
        GraftFnUtils.getClass, StringType, "renderZonedTime",
        Seq(todOf(child), tzOf(child)),
        inputTypes = Seq(TimeType(6), StringType), propagateNull = true)
      // CAST(timetz AS TIMESTAMP): the epoch date carries the wall tod
      case TimestampType => StaticInvoke(GraftFnUtils.getClass,
        TimestampType, "todNanosToMicros", Seq(todOf(child)),
        inputTypes = Seq(TimeType(6)), propagateNull = true)
      // CAST(timetz AS TIME) drops the zone, keeping the wall time
      case _ => Cast(todOf(child), target, timeZoneId, evalMode)
    } else (child.dataType, target) match {
      // naive TIME → TIMESTAMP: 1970-01-01 + tod (TimeOperators
      // castToTimestamp; Spark has no such cast — KAT replay r14)
      case (_: TimeType, TimestampType) => StaticInvoke(
        GraftFnUtils.getClass, TimestampType, "todNanosToMicros",
        Seq(child), inputTypes = Seq(TimeType(6)), propagateNull = true)
      // naive TIMESTAMP → TIME: the wall clock's time-of-day
      case (TimestampType, t: TimeType) => StaticInvoke(
        GraftFnUtils.getClass, t, "microsToNanosOfDay", Seq(child),
        inputTypes = Seq(TimestampType), propagateNull = true)
      case _ => Cast(child, target, timeZoneId, evalMode)
    }
  override protected def withNewChildInternal(c: Expression): ZonedRenderCast =
    copy(child = c)
}

/** at_timezone under zone-carrying semantics: same instant, zone set to
  * z (DateTimeFunctions.java atTimeZone). A naive operand is the
  * documented UTC instant.
  */
case class ZonedAtTimezone(t: Expression, z: Expression,
    timeZoneId: Option[String] = None)
    extends Expression with RuntimeReplaceable with BinaryLike[Expression]
    with TimeZoneAwareExpression {
  import ZonedTimestamps._
  override def prettyName: String = "at_timezone"
  override def left: Expression = t
  override def right: Expression = z
  override def withTimeZone(tz: String): ZonedAtTimezone = copy(timeZoneId = Some(tz))
  // TimeZoneAwareExpression's final nodePatterns overwrites the
  // RUNTIME_REPLACEABLE bit RuntimeReplaceable's init set, which hides
  // the node from ReplaceExpressions' pruned traversal — re-declare it
  // through the trait's extension point so the optimizer swaps the node
  // AND ResolveTimeZone still assigns the session zone.
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)
  override lazy val replacement: Expression = {
    // the offset-interval zone form (at_timezone(x, INTERVAL '2' HOUR),
    // DateTimeFunctions.java:319) renders the interval as a fixed-offset
    // zone id; whole minutes only, errors on seconds
    val zs = z.dataType match {
      case _: DayTimeIntervalType => StaticInvoke(
        GraftFnUtils.getClass, StringType, "intervalOffsetZone",
        Seq(Cast(z, DayTimeIntervalType())),
        inputTypes = Seq(DayTimeIntervalType()), propagateNull = true)
      case _ => Cast(z, StringType)
    }
    val inner =
      if (isZoned(t.dataType)) mk(utcOf(t), zs)
      else if (isZonedTime(t.dataType))
        // TIME WTZ: same instant, time-of-day re-rendered in the target
        // zone (GraftFnUtils.zonedTimeShift — epoch-date offsets)
        mkTime(StaticInvoke(
          GraftFnUtils.getClass, TimeType(6), "zonedTimeShift",
          Seq(todOf(t), tzOf(t), zs),
          inputTypes = Seq(TimeType(6), StringType, StringType),
          propagateNull = true), zs)
      else mk(Cast(t, TimestampType, timeZoneId), zs)
    If(Or(IsNull(t), IsNull(z)), if (isZonedTime(t.dataType)) nullZT else nullZ, inner)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZonedAtTimezone = copy(t = l, z = r)
}

/** with_timezone under zone-carrying semantics: interpret the operand's
  * wall clock in z (DateTimeFunctions.java withTimezone).
  */
case class ZonedWithTimezone(t: Expression, z: Expression,
    timeZoneId: Option[String] = None)
    extends Expression with RuntimeReplaceable with BinaryLike[Expression]
    with TimeZoneAwareExpression {
  import ZonedTimestamps._
  override def prettyName: String = "with_timezone"
  override def left: Expression = t
  override def right: Expression = z
  override def withTimeZone(tz: String): ZonedWithTimezone = copy(timeZoneId = Some(tz))
  // TimeZoneAwareExpression's final nodePatterns overwrites the
  // RUNTIME_REPLACEABLE bit RuntimeReplaceable's init set, which hides
  // the node from ReplaceExpressions' pruned traversal — re-declare it
  // through the trait's extension point so the optimizer swaps the node
  // AND ResolveTimeZone still assigns the session zone.
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)
  override lazy val replacement: Expression = {
    val wall = if (isZoned(t.dataType)) wallOf(t) else Cast(t, TimestampType, timeZoneId)
    If(Or(IsNull(t), IsNull(z)), nullZ, mk(ToUTCTimestamp(wall, z), z))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZonedWithTimezone = copy(t = l, z = r)
}

/** timezone_hour / timezone_minute: the carried zone's offset at the
  * value's instant; the documented constant-0 UTC approximation on
  * naive operands.
  */
case class ZonedTzOffset(child: Expression, minuteUnit: Boolean)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {
  import ZonedTimestamps._
  override def prettyName: String =
    if (minuteUnit) "timezone_minute" else "timezone_hour"
  override lazy val replacement: Expression =
    if (isZoned(child.dataType)) StaticInvoke(
      GraftFnUtils.getClass, LongType,
      if (minuteUnit) "tzOffsetMinute" else "tzOffsetHour",
      Seq(utcOf(child), tzOf(child)),
      inputTypes = Seq(TimestampType, StringType), propagateNull = true)
    else if (isZonedTime(child.dataType)) StaticInvoke(
      GraftFnUtils.getClass, LongType,
      if (minuteUnit) "tzTimeOffsetMinute" else "tzTimeOffsetHour",
      Seq(todOf(child), tzOf(child)),
      inputTypes = Seq(TimeType(6), StringType), propagateNull = true)
    else If(IsNull(child), Literal(null, LongType), Literal(0L))
  override protected def withNewChildInternal(c: Expression): ZonedTzOffset =
    copy(child = c)
}

/** date_trunc: truncate the wall clock in the value's zone and KEEP the
  * zone (DateTimeFunctions truncate on unpackChronology); stock
  * TruncTimestamp on naive operands.
  */
case class ZonedTrunc(fmt: Expression, t: Expression,
    timeZoneId: Option[String] = None)
    extends Expression with RuntimeReplaceable with BinaryLike[Expression]
    with TimeZoneAwareExpression {
  import ZonedTimestamps._
  override def prettyName: String = "date_trunc"
  override def left: Expression = fmt
  override def right: Expression = t
  override def withTimeZone(tz: String): ZonedTrunc = copy(timeZoneId = Some(tz))
  // TimeZoneAwareExpression's final nodePatterns overwrites the
  // RUNTIME_REPLACEABLE bit RuntimeReplaceable's init set, which hides
  // the node from ReplaceExpressions' pruned traversal — re-declare it
  // through the trait's extension point so the optimizer swaps the node
  // AND ResolveTimeZone still assigns the session zone.
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)
  override lazy val replacement: Expression =
    if (isZoned(t.dataType))
      If(IsNull(t), nullZ,
        mk(ToUTCTimestamp(TruncTimestamp(fmt, wallOf(t), timeZoneId), tzOf(t)), tzOf(t)))
    else if (isZonedTime(t.dataType))
      // reference truncateTimeWithTimeZone: wall-field roundFloor (the
      // zone chronology floors LOCAL time), zone kept
      If(IsNull(t), nullZT,
        mkTime(org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          GraftFnUtils.getClass, TimeType(6), "timeTruncUnit",
          Seq(fmt, todOf(t)),
          inputTypes = Seq(StringType, TimeType(6)), propagateNull = true),
          tzOf(t)))
    else if (t.dataType.isInstanceOf[TimeType])
      // reference truncateTime on a plain TIME
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        GraftFnUtils.getClass, TimeType(6), "timeTruncUnit",
        Seq(fmt, t), inputTypes = Seq(StringType, TimeType(6)),
        propagateNull = true)
    else TruncTimestamp(fmt, Cast(t, TimestampType, timeZoneId), timeZoneId)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZonedTrunc = copy(fmt = l, t = r)
}

/** to_iso8601: wall clock plus numeric offset for zoned values; the
  * existing UTC 'Z' rendering otherwise.
  */
case class ZonedIso(child: Expression, timeZoneId: Option[String] = None)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression]
    with TimeZoneAwareExpression {
  import ZonedTimestamps._
  override def prettyName: String = "to_iso8601"
  override def withTimeZone(tz: String): ZonedIso = copy(timeZoneId = Some(tz))
  // TimeZoneAwareExpression's final nodePatterns overwrites the
  // RUNTIME_REPLACEABLE bit RuntimeReplaceable's init set, which hides
  // the node from ReplaceExpressions' pruned traversal — re-declare it
  // through the trait's extension point so the optimizer swaps the node
  // AND ResolveTimeZone still assigns the session zone.
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)
  override lazy val replacement: Expression =
    if (isZoned(child.dataType)) StaticInvoke(
      GraftFnUtils.getClass, StringType, "isoZoned",
      Seq(utcOf(child), tzOf(child)),
      inputTypes = Seq(TimestampType, StringType), propagateNull = true)
    else if (child.dataType == DateType)
      // reference toISO8601FromDate: ISODateTimeFormat.date() — the
      // DATE overload prints the date alone, no time part (round-12
      // find; the timestamp format applied to dates diverged)
      DateFormatClass(Cast(child, TimestampType, timeZoneId),
        Literal("yyyy-MM-dd"), timeZoneId)
    else DateFormatClass(Cast(child, TimestampType, timeZoneId),
      Literal("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"), timeZoneId)
  override protected def withNewChildInternal(c: Expression): ZonedIso =
    copy(child = c)
}

/** from_iso8601_timestamp: carries the string's explicit offset (session
  * zone UTC when absent) — reference fromISO8601Timestamp packs the
  * parsed chronology's zone.
  */
case class ZonedFromIso(child: Expression, timeZoneId: Option[String] = None)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression]
    with TimeZoneAwareExpression {
  import ZonedTimestamps._
  override def prettyName: String = "from_iso8601_timestamp"
  override def withTimeZone(tz: String): ZonedFromIso = copy(timeZoneId = Some(tz))
  // TimeZoneAwareExpression's final nodePatterns overwrites the
  // RUNTIME_REPLACEABLE bit RuntimeReplaceable's init set, which hides
  // the node from ReplaceExpressions' pruned traversal — re-declare it
  // through the trait's extension point so the optimizer swaps the node
  // AND ResolveTimeZone still assigns the session zone.
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)
  override lazy val replacement: Expression =
    If(IsNull(child), nullZ,
      mk(Cast(child, TimestampType, timeZoneId),
        StaticInvoke(GraftFnUtils.getClass, StringType, "isoZoneOf",
          Seq(child), inputTypes = Seq(StringType), propagateNull = true)))
  override protected def withNewChildInternal(c: Expression): ZonedFromIso =
    copy(child = c)
}

/** CAST(x AS TIMESTAMP WITH TIME ZONE): a zoned value passes through; a
  * string carries its own trailing zone token (session zone UTC when
  * absent); timestamps/dates attach the session zone.
  */
case class ZonedCastToZoned(child: Expression, timeZoneId: Option[String] = None)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression]
    with TimeZoneAwareExpression {
  import ZonedTimestamps._
  override def prettyName: String = "zoned_tstz"
  override def withTimeZone(tz: String): ZonedCastToZoned = copy(timeZoneId = Some(tz))
  // TimeZoneAwareExpression's final nodePatterns overwrites the
  // RUNTIME_REPLACEABLE bit RuntimeReplaceable's init set, which hides
  // the node from ReplaceExpressions' pruned traversal — re-declare it
  // through the trait's extension point so the optimizer swaps the node
  // AND ResolveTimeZone still assigns the session zone.
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)
  override lazy val replacement: Expression =
    if (isZoned(child.dataType)) child
    else child.dataType match {
      case _: StringType =>
        // normalizeZonedTextU pads seconds-less / date-only wall text in
        // front of a zone token to the shape Spark's cast accepts (the
        // reference's Joda parser is lenient there — KAT wave 9)
        If(IsNull(child), nullZ,
          mk(Cast(StaticInvoke(GraftFnUtils.getClass, StringType,
              "normalizeZonedTextU", Seq(child),
              inputTypes = Seq(StringType), propagateNull = true),
            TimestampType, timeZoneId),
            StaticInvoke(GraftFnUtils.getClass, StringType, "zoneTokenOf",
              Seq(child), inputTypes = Seq(StringType), propagateNull = true)))
      // TIME WTZ → TIMESTAMP WTZ: epoch-date wall tod, zone kept
      // (the stored instant is the tod UTC-normalized in that zone)
      case st if isZonedTime(st) =>
        If(IsNull(child), nullZ,
          mk(StaticInvoke(GraftFnUtils.getClass, TimestampType,
            "zonedTimeUtcMicros", Seq(todOf(child), tzOf(child)),
            inputTypes = Seq(TimeType(6), StringType), propagateNull = true),
            tzOf(child)))
      // naive TIME → TIMESTAMP WTZ: epoch date + tod, session zone UTC
      case _: TimeType =>
        If(IsNull(child), nullZ,
          mk(StaticInvoke(GraftFnUtils.getClass, TimestampType,
            "todNanosToMicros", Seq(child),
            inputTypes = Seq(TimeType(6)), propagateNull = true),
            Literal("UTC")))
      case _ =>
        If(IsNull(child), nullZ,
          mk(Cast(child, TimestampType, timeZoneId), Literal("UTC")))
    }
  override protected def withNewChildInternal(c: Expression): ZonedCastToZoned =
    copy(child = c)
}

/** `ts +/- INTERVAL` with zone-carrying semantics (DateTimeOperators):
  * day-time intervals add to the INSTANT; year-month intervals add on
  * the wall clock in the value's zone; non-zoned operands replay the
  * stock analyzer arithmetic exactly.
  */
case class ZonedIntervalAdd(ts: Expression, iv: Expression, negate: Boolean,
    timeZoneId: Option[String] = None)
    extends Expression with RuntimeReplaceable with BinaryLike[Expression]
    with TimeZoneAwareExpression {
  import ZonedTimestamps._
  override def prettyName: String = if (negate) "zoned_minus" else "zoned_plus"
  override def left: Expression = ts
  override def right: Expression = iv
  override def withTimeZone(tz: String): ZonedIntervalAdd = copy(timeZoneId = Some(tz))
  // TimeZoneAwareExpression's final nodePatterns overwrites the
  // RUNTIME_REPLACEABLE bit RuntimeReplaceable's init set, which hides
  // the node from ReplaceExpressions' pruned traversal — re-declare it
  // through the trait's extension point so the optimizer swaps the node
  // AND ResolveTimeZone still assigns the session zone.
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)
  private def ivx: Expression = if (negate) UnaryMinus(iv) else iv
  override lazy val replacement: Expression = (ts.dataType, iv.dataType) match {
    case (z, _: DayTimeIntervalType) if isZoned(z) =>
      If(IsNull(ts), nullZ,
        mk(TimestampAddInterval(utcOf(ts), ivx, timeZoneId), tzOf(ts)))
    // zoned TIME ± interval: the wall time-of-day wraps modulo 24h and
    // the zone rides along (reference DateTimeOperators.java:79-88
    // timeWithTimeZonePlusIntervalDayToSecond — modulo24Hour in the
    // value's chronology); YEAR TO MONTH is a no-op on any TIME (:137)
    case (z, _: DayTimeIntervalType) if isZonedTime(z) =>
      If(IsNull(ts), nullZT,
        mkTime(org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          GraftFnUtils.getClass, TimeType(6), "wrapTimeAdd",
          Seq(todOf(ts), ivx),
          inputTypes = Seq(TimeType(6), ivx.dataType),
          propagateNull = true), tzOf(ts)))
    case (z, _: YearMonthIntervalType) if isZonedTime(z) => ts
    case (z, _: YearMonthIntervalType) if isZoned(z) =>
      If(IsNull(ts), nullZ,
        mk(ToUTCTimestamp(TimestampAddYMInterval(wallOf(ts), ivx, timeZoneId), tzOf(ts)),
          tzOf(ts)))
    case (TimestampType, _: DayTimeIntervalType) =>
      TimestampAddInterval(ts, ivx, timeZoneId)
    case (TimestampType, _: YearMonthIntervalType) =>
      TimestampAddYMInterval(ts, ivx, timeZoneId)
    // DAY-only interval keeps the DATE type (stock ResolveBinaryArithmetic
    // special case — fixed in round 11 alongside PrestoTimeIntervalAdd:
    // routing through a timestamp silently widened DATE + INTERVAL '1'
    // DAY to TIMESTAMP under the conf)
    case (DateType, DayTimeIntervalType(DayTimeIntervalType.DAY, DayTimeIntervalType.DAY)) =>
      DateAdd(ts, ExtractANSIIntervalDays(ivx))
    case (DateType, _: DayTimeIntervalType) =>
      TimestampAddInterval(Cast(ts, TimestampType, timeZoneId), ivx, timeZoneId)
    case (DateType, _: YearMonthIntervalType) => DateAddYMInterval(ts, ivx)
    case (_: StringType, _: DayTimeIntervalType) =>
      TimestampAddInterval(Cast(ts, TimestampType, timeZoneId), ivx, timeZoneId)
    case (_: StringType, _: YearMonthIntervalType) =>
      TimestampAddYMInterval(Cast(ts, TimestampType, timeZoneId), ivx, timeZoneId)
    case _ => if (negate) Subtract(ts, iv) else Add(ts, iv)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZonedIntervalAdd = copy(ts = l, iv = r)
}

/** date_add / timestampadd with zone-carrying semantics: precise units
  * (hour and below) add to the instant, imprecise units on the wall
  * clock in the zone — Joda field precision, reference
  * DateTimeFunctions.addFieldValueTimestampWithTimeZone.
  */
case class ZonedTimestampAddX(unit: String, quantity: Expression, ts: Expression,
    timeZoneId: Option[String] = None)
    extends Expression with RuntimeReplaceable with BinaryLike[Expression]
    with TimeZoneAwareExpression {
  import ZonedTimestamps._
  override def prettyName: String = "date_add"
  override def left: Expression = quantity
  override def right: Expression = ts
  override def withTimeZone(tz: String): ZonedTimestampAddX = copy(timeZoneId = Some(tz))
  // TimeZoneAwareExpression's final nodePatterns overwrites the
  // RUNTIME_REPLACEABLE bit RuntimeReplaceable's init set, which hides
  // the node from ReplaceExpressions' pruned traversal — re-declare it
  // through the trait's extension point so the optimizer swaps the node
  // AND ResolveTimeZone still assigns the session zone.
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)
  override lazy val replacement: Expression = {
    val q = Cast(quantity, LongType)
    if (isZoned(ts.dataType)) {
      if (PreciseUnits.contains(unit.toUpperCase))
        If(IsNull(ts), nullZ,
          mk(TimestampAdd(unit, q, utcOf(ts), timeZoneId), tzOf(ts)))
      else
        If(IsNull(ts), nullZ,
          mk(ToUTCTimestamp(TimestampAdd(unit, q, wallOf(ts), timeZoneId), tzOf(ts)),
            tzOf(ts)))
    } else if (isZonedTime(ts.dataType))
      // reference addFieldValueTimeWithTimeZone: wall-field add wrapped
      // modulo 24h, zone kept
      If(IsNull(ts), nullZT,
        mkTime(org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          GraftFnUtils.getClass, TimeType(6), "timeAddUnit",
          Seq(Literal(unit), q, todOf(ts)),
          inputTypes = Seq(StringType, LongType, TimeType(6)),
          propagateNull = true), tzOf(ts)))
    else if (ts.dataType.isInstanceOf[TimeType])
      // reference addFieldValueTime: same wrap on a plain TIME
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        GraftFnUtils.getClass, TimeType(6), "timeAddUnit",
        Seq(Literal(unit), q, ts),
        inputTypes = Seq(StringType, LongType, TimeType(6)),
        propagateNull = true)
    else TimestampAdd(unit, q, Cast(ts, TimestampType, timeZoneId), timeZoneId)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZonedTimestampAddX = copy(quantity = l, ts = r)
}

/** date_diff / timestampdiff with zone-carrying semantics: precise units
  * diff instants; imprecise units diff wall clocks in each value's zone
  * (Joda field getDifference on the packed chronology).
  */
case class ZonedTimestampDiffX(unit: String, startTs: Expression, endTs: Expression,
    timeZoneId: Option[String] = None)
    extends Expression with RuntimeReplaceable with BinaryLike[Expression]
    with TimeZoneAwareExpression {
  import ZonedTimestamps._
  override def prettyName: String = "date_diff"
  override def left: Expression = startTs
  override def right: Expression = endTs
  override def withTimeZone(tz: String): ZonedTimestampDiffX = copy(timeZoneId = Some(tz))
  // TimeZoneAwareExpression's final nodePatterns overwrites the
  // RUNTIME_REPLACEABLE bit RuntimeReplaceable's init set, which hides
  // the node from ReplaceExpressions' pruned traversal — re-declare it
  // through the trait's extension point so the optimizer swaps the node
  // AND ResolveTimeZone still assigns the session zone.
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)
  override lazy val replacement: Expression = {
    def inst(e: Expression) =
      if (isZoned(e.dataType)) utcOf(e) else Cast(e, TimestampType, timeZoneId)
    def wall(e: Expression) =
      if (isZoned(e.dataType)) wallOf(e) else Cast(e, TimestampType, timeZoneId)
    def isTimeish(e: Expression) =
      isZonedTime(e.dataType) || e.dataType.isInstanceOf[TimeType]
    // UTC-normalized nanos of a (maybe zoned) TIME operand — reference
    // diffTimeWithTimeZone diffs unpacked millisUtc; a plain TIME is
    // the session (UTC) wall, i.e. already normalized
    def todUtc(e: Expression): Expression =
      if (isZonedTime(e.dataType))
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          GraftFnUtils.getClass, LongType, "zonedTimeUtcNanos",
          Seq(todOf(e), tzOf(e)),
          inputTypes = Seq(TimeType(6), StringType), propagateNull = true)
      else org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        GraftFnUtils.getClass, LongType, "timeNanosOf",
        Seq(e), inputTypes = Seq(TimeType(6)), propagateNull = true)
    if (isTimeish(startTs) && isTimeish(endTs))
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        GraftFnUtils.getClass, LongType, "timeDiffUnit",
        Seq(Literal(unit), todUtc(startTs), todUtc(endTs)),
        inputTypes = Seq(StringType, LongType, LongType),
        propagateNull = true)
    else if (isZoned(startTs.dataType) || isZoned(endTs.dataType)) {
      if (PreciseUnits.contains(unit.toUpperCase))
        TimestampDiff(unit, inst(startTs), inst(endTs), timeZoneId)
      else TimestampDiff(unit, wall(startTs), wall(endTs), timeZoneId)
    } else TimestampDiff(unit, inst(startTs), inst(endTs), timeZoneId)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZonedTimestampDiffX = copy(startTs = l, endTs = r)
}

/** `TIME '<wall> <zone>'` literal: attach the zone to a wall time-of-day
  * (reference parseTimeWithTimeZone — the zoned TIME literal grammar).
  */
case class ZonedTimeAttach(t: Expression, z: Expression,
    timeZoneId: Option[String] = None)
    extends Expression with RuntimeReplaceable with BinaryLike[Expression]
    with TimeZoneAwareExpression {
  import ZonedTimestamps._
  override def prettyName: String = "zoned_ttz"
  override def left: Expression = t
  override def right: Expression = z
  override def withTimeZone(tz: String): ZonedTimeAttach = copy(timeZoneId = Some(tz))
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)
  override lazy val replacement: Expression = {
    val tod =
      if (isZonedTime(t.dataType)) todOf(t)
      else Cast(t, TimeType(6), timeZoneId)
    If(Or(IsNull(t), IsNull(z)), nullZT, mkTime(tod, z))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZonedTimeAttach = copy(t = l, z = r)
}

/** CAST(x AS TIME WITH TIME ZONE): a zoned time passes through; a string
  * carries its own trailing zone token (time part parsed separately); a
  * zoned TIMESTAMP keeps its wall time-of-day AND its zone; plain
  * times/timestamps attach the session zone (UTC).
  */
case class ZonedCastToZonedTime(child: Expression, timeZoneId: Option[String] = None)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression]
    with TimeZoneAwareExpression {
  import ZonedTimestamps._
  override def prettyName: String = "zoned_ttz_cast"
  override def withTimeZone(tz: String): ZonedCastToZonedTime = copy(timeZoneId = Some(tz))
  override def nodePatternsInternal(): Seq[TreePattern] =
    Seq(TreePattern.RUNTIME_REPLACEABLE)
  override lazy val replacement: Expression =
    if (isZonedTime(child.dataType)) child
    else if (isZoned(child.dataType))
      If(IsNull(child), nullZT,
        mkTime(StaticInvoke(GraftFnUtils.getClass, TimeType(6),
            "microsToNanosOfDay", Seq(wallOf(child)),
            inputTypes = Seq(TimestampType), propagateNull = true),
          tzOf(child)))
    else child.dataType match {
      case _: StringType =>
        If(IsNull(child), nullZT,
          mkTime(Cast(StaticInvoke(GraftFnUtils.getClass, StringType,
              "stripZoneToken", Seq(child), inputTypes = Seq(StringType),
              propagateNull = true), TimeType(6), timeZoneId),
            StaticInvoke(GraftFnUtils.getClass, StringType, "zoneTokenOf",
              Seq(child), inputTypes = Seq(StringType), propagateNull = true)))
      // naive TIMESTAMP → TIME WTZ: the wall clock's time-of-day in the
      // session zone (Spark has no TIMESTAMP→TIME cast — KAT replay r14)
      case TimestampType =>
        If(IsNull(child), nullZT,
          mkTime(StaticInvoke(GraftFnUtils.getClass, TimeType(6),
            "microsToNanosOfDay", Seq(child),
            inputTypes = Seq(TimestampType), propagateNull = true),
            Literal("UTC")))
      case _ =>
        If(IsNull(child), nullZT,
          mkTime(Cast(child, TimeType(6), timeZoneId), Literal("UTC")))
    }
  override protected def withNewChildInternal(c: Expression): ZonedCastToZonedTime =
    copy(child = c)
}
