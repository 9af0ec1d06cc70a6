package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Presto's date_add / date_diff / date_trunc accept TIME operands
  * (reference DateTimeFunctions.java addFieldValueTime:414,
  * diffTime:482, truncateTime:356): field add wraps modulo 24h, diff
  * truncates toward zero, trunc is a precise-field roundFloor — all on
  * the four TIME-valid units (millisecond/second/minute/hour; day and
  * up error, same as the reference's getTimeField). GraftSqlParser
  * rewrites the date_add/date_diff spellings to timestampadd /
  * timestampdiff, and date_trunc resolves to Spark's TruncTimestamp —
  * none of which admit TIME, so without this rule every one of these
  * shapes failed analysis (round-12 find, caught probing the reference's
  * TIME signature surface after millisecond(TIME)).
  *
  * Same design as [[ResolveIntervalFields]]: a resolution rule matching
  * the RESOLVED Spark nodes whose operand turned out TIME-typed (they
  * would otherwise fail CheckAnalysis — never silently change meaning);
  * the zoned mode's parse-time rewrite intercepts these nodes first and
  * carries its own TIME branches (ZonedTimestamps).
  */
object ResolveTimeArithmetic extends Rule[LogicalPlan] {

  private def isTime(e: Expression): Boolean =
    e.resolved && e.dataType.isInstanceOf[TimeType]

  /** A TIME operand, possibly already wrapped in the UNRESOLVABLE
    * Cast-to-TIMESTAMP that implicit coercion inserts for these nodes'
    * expected input types (coercion shares the Resolution fixed point
    * and can fire first — the cast never resolves, so unwrapping it
    * cannot change a working plan).
    */
  private object TimeOperand {
    def unapply(e: Expression): Option[Expression] = e match {
      case t if isTime(t) => Some(t)
      case Cast(t, TimestampType, _, _) if isTime(t) => Some(t)
      case _ => None
    }
  }

  private def invoke(ret: DataType, method: String,
      args: Seq[Expression]): Expression =
    StaticInvoke(graft.functions.GraftFnUtils.getClass, ret, method, args,
      inputTypes = args.map(_.dataType), propagateNull = true)

  /** A DATE operand, possibly behind coercion's Cast-to-TIMESTAMP. */
  private object DateOperand {
    def unapply(e: Expression): Option[Expression] = e match {
      case d if d.resolved && d.dataType == DateType => Some(d)
      case Cast(d, TimestampType, _, _) if d.resolved && d.dataType == DateType =>
        Some(d)
      case _ => None
    }
  }

  /** The DATE-valid fields (reference getDateField: day/week/month/
    * quarter/year). Other units on a DATE keep stock Spark's lenient
    * timestamp result (the reference errors; a superset, documented).
    */
  private val DateUnits = Set("day", "week", "month", "quarter", "year")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveExpressions {
      case TimestampAdd(unit, q, TimeOperand(t), _) if q.resolved =>
        invoke(TimeType(6), "timeAddUnit",
          Seq(Literal(unit), Cast(q, LongType), t))
      case TimestampDiff(unit, TimeOperand(s), TimeOperand(e), _) =>
        invoke(LongType, "timeDiffUnit", Seq(Literal(unit), s, e))
      case TruncTimestamp(fmt, TimeOperand(t), _) if fmt.resolved =>
        invoke(TimeType(6), "timeTruncUnit", Seq(fmt, t))
      // date_add on DATE returns DATE in the reference
      // (addFieldValueDate:405) where timestampadd returns TIMESTAMP —
      // rewrite to Spark's native DATE-typed arithmetic
      case TimestampAdd(unit, q, DateOperand(d), _)
          if q.resolved && DateUnits(unit.toLowerCase) =>
        val n = Cast(q, IntegerType)
        unit.toLowerCase match {
          case "day" => DateAdd(d, n)
          case "week" => DateAdd(d, Multiply(n, Literal(7)))
          case "month" => AddMonths(d, n)
          case "quarter" => AddMonths(d, Multiply(n, Literal(3)))
          case "year" => AddMonths(d, Multiply(n, Literal(12)))
        }
      // date_trunc on DATE returns DATE in the reference
      // (truncateDate:347); 'day' is the identity there, the rest map to
      // Spark's native TruncDate
      case TruncTimestamp(StringLiteral(unit), DateOperand(d), _)
          if DateUnits(unit.toLowerCase) =>
        if (unit.toLowerCase == "day") d else TruncDate(d, Literal(unit))
    }
}
