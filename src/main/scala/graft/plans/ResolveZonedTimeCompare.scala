package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.{GraftFnUtils, ZonedTimestamps, ZonedInstant}

/** Mixed TIME vs TIME WITH TIME ZONE comparison under the zoned mode.
  *
  * The parse-time comparison rewrite wraps each operand in
  * [[ZonedInstant]] independently; a zone-carrying time resolves to its
  * UTC-normalized BIGINT nanos while a plain TIME stays TIME — the
  * per-side node cannot see its sibling, so the mixed pair failed
  * analysis (round-12 find). The reference coerces TIME to TIME WITH
  * TIME ZONE in the session zone and compares UTC-normalized values
  * (`TimeWithTimeZoneType`); with the session pinned to UTC a plain
  * TIME's nanos ARE its normalized value, so the fix lifts the TIME
  * side into the BIGINT nanos domain.
  */
object ResolveZonedTimeCompare extends Rule[LogicalPlan] {

  /** A ZonedInstant wrapper whose operand resolved zone-carrying-TIME —
    * the side that became BIGINT.
    */
  private object ZTimeSide {
    def unapply(e: Expression): Option[Expression] = e match {
      case z @ ZonedInstant(c)
          if c.resolved && ZonedTimestamps.isZonedTime(c.dataType) => Some(z)
      case _ => None
    }
  }

  /** A plain-TIME operand (possibly still in its transparent wrapper). */
  private object PTimeSide {
    def unapply(e: Expression): Option[Expression] = e match {
      case ZonedInstant(c) if c.resolved && c.dataType.isInstanceOf[TimeType] =>
        Some(c)
      case t if t.resolved && t.dataType.isInstanceOf[TimeType] => Some(t)
      case _ => None
    }
  }

  private def nanos(t: Expression): Expression =
    StaticInvoke(GraftFnUtils.getClass, LongType, "timeNanosOf",
      Seq(t), inputTypes = Seq(t.dataType), propagateNull = true)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!ZonedTimestamps.enabled) return plan
    plan.resolveExpressions {
      case bc: BinaryComparison => (bc.left, bc.right) match {
        case (ZTimeSide(l), PTimeSide(r)) =>
          bc.withNewChildren(Seq(l, nanos(r)))
        case (PTimeSide(l), ZTimeSide(r)) =>
          bc.withNewChildren(Seq(nanos(l), r))
        case _ => bc
      }
      case in @ In(ZTimeSide(v), list) if list.exists {
            case PTimeSide(_) => true; case _ => false
          } =>
        In(v, list.map { case PTimeSide(t) => nanos(t); case other => other })
      case In(PTimeSide(v), list) if list.exists {
            case ZTimeSide(_) => true; case _ => false
          } =>
        In(nanos(v), list.map { case PTimeSide(t) => nanos(t); case other => other })

      // RAW mixed operands — shapes the parse-time ZonedInstant wrap
      // cannot reach (KAT replay r14). Same semantics: both sides
      // lifted to UTC-normalized nanos (TIME) or the UTC instant
      // (TIMESTAMP; a naive timestamp is the documented session-UTC
      // instant).
      case bc: BinaryComparison
          if bc.left.resolved && bc.right.resolved && rawMixed(bc.left, bc.right) =>
        bc.withNewChildren(Seq(lift(bc.left), lift(bc.right)))

      // `x BETWEEN l AND u` is a RuntimeReplaceable Between whose LAZY
      // With-desugar no analysis rule can reach — the comparisons
      // materialize at optimizer time and a zoned-vs-naive mix fails to
      // resolve there. Lift the three operands on the Between itself.
      case bt: Between
          if bt.input.resolved && bt.lower.resolved && bt.upper.resolved && {
            val ops = Seq(bt.input, bt.lower, bt.upper)
            def zoned(e: Expression) =
              ZonedTimestamps.isZonedTime(e.dataType) ||
                ZonedTimestamps.isZoned(e.dataType)
            // ANY zoned operand lifts the whole triple — the all-zoned
            // shape compared struct-wise (WALL-first for zoned TIME)
            // before round 15; instants are the contract
            ops.exists(zoned) &&
              ops.forall(e => zoned(e) || e.dataType.isInstanceOf[TimeType] ||
                e.dataType == TimestampType)
          } =>
        Between(lift(bt.input), lift(bt.lower), lift(bt.upper))
    }
  }

  private def rawMixed(l: Expression, r: Expression): Boolean = {
    def zt(e: Expression) = ZonedTimestamps.isZonedTime(e.dataType)
    def zs(e: Expression) = ZonedTimestamps.isZoned(e.dataType)
    (zt(l) && r.dataType.isInstanceOf[TimeType]) ||
      (zt(r) && l.dataType.isInstanceOf[TimeType]) ||
      (zs(l) && r.dataType == TimestampType) ||
      (zs(r) && l.dataType == TimestampType)
  }

  private def lift(e: Expression): Expression =
    if (ZonedTimestamps.isZonedTime(e.dataType)) ZonedInstant(e)
    else if (e.dataType.isInstanceOf[TimeType]) nanos(e)
    else if (ZonedTimestamps.isZoned(e.dataType)) ZonedInstant(e)
    else e // naive TIMESTAMP: already the UTC instant
}
