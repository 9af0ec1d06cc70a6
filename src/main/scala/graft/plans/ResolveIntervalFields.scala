package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Presto's datetime field functions accept INTERVALS — `day(iv)`,
  * `hour(iv)`, `minute(iv)`, `second(iv)`, `millisecond(iv)` decompose
  * an INTERVAL DAY TO SECOND and `year(iv)` / `month(iv)` an INTERVAL
  * YEAR TO MONTH (reference DateTimeFunctions.java:787-1191
  * `*FromInterval`: total-duration decomposition — day = millis/86400k,
  * hour = (millis%day)/3600k, …, month = months%12, year = months/12;
  * Java `/` and `%`, so negative intervals truncate toward zero and
  * sub-day fields carry the interval's sign). EXTRACT reaches the same
  * functions (Presto AstBuilder.visitExtract delegates every field to
  * the scalar, and GraftSqlParser replays that mapping textually), so
  * without this rule `EXTRACT(HOUR FROM iv)` — which STOCK Spark
  * supports via ExtractIntervalPart — failed to resolve against the
  * date-typed builtins (round-11 find, caught probing the interval
  * surface).
  *
  * Resolution rule, not a registry override: the field names resolve to
  * Spark-native functions for every non-interval type, and shadowing
  * them wholesale would have to reproduce each builtin's own type
  * dispatch. This rewrites ONLY the unresolved-function-over-interval
  * shape into a StaticInvoke on [[graft.functions.GraftFnUtils]] whose
  * Java arithmetic restates the reference's verbatim (the interval's
  * physical value is its total micros / total months — the same single
  * duration the reference packs as millis / months).
  */
object ResolveIntervalFields extends Rule[LogicalPlan] {

  private def isDt(e: Expression): Boolean =
    e.resolved && e.dataType.isInstanceOf[DayTimeIntervalType]
  private def isYm(e: Expression): Boolean =
    e.resolved && e.dataType.isInstanceOf[YearMonthIntervalType]

  private def invoke(method: String, iv: Expression): Expression =
    StaticInvoke(graft.functions.GraftFnUtils.getClass, LongType, method,
      Seq(iv), inputTypes = Seq(iv.dataType), propagateNull = true)

  // Injected resolution rules share the fixed-point Resolution batch, so
  // by the time this runs ResolveFunctions has already turned day(iv)
  // into DayOfMonth(iv) etc. — match the RESOLVED date-field expressions
  // whose child turned out interval-typed (they would otherwise fail
  // CheckAnalysis with a type mismatch, never silently change meaning).
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveExpressions {
      case DayOfMonth(iv) if isDt(iv) => invoke("intervalDay", iv)
      case Hour(iv, _) if isDt(iv) => invoke("intervalHour", iv)
      case Minute(iv, _) if isDt(iv) => invoke("intervalMinute", iv)
      case Second(iv, _) if isDt(iv) => invoke("intervalSecond", iv)
      // millisecond(iv): the graft builder is the late-binding
      // MillisecondOf (TIME/timestamp dispatch) — intervals take the
      // reference's total-millis decomposition instead
      case graft.functions.MillisecondOf(iv, _) if isDt(iv) =>
        invoke("intervalMillisecond", iv)
      case Year(iv) if isYm(iv) => invoke("intervalYmYear", iv)
      case Month(iv) if isYm(iv) => invoke("intervalYmMonth", iv)
    }
}
