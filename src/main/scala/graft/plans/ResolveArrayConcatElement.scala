package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, CreateArray, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** `array || element` appends and `element || array` prepends in the
  * reference (ArrayConcatUtils.java appendElement/prependElement —
  * reached from the `||` operator), shapes Spark's Concat rejects with
  * DATA_DIFF_TYPES. Resolution rule rather than a parser rewrite
  * because `||` needs RESOLVED types to distinguish these from string
  * and array-array concatenation (both of which stay stock Spark).
  * Spark's ConcatCoercion may have already cast the scalar side to
  * STRING by the time this rule sees the pair — that compensating cast
  * is stripped when the operand's own type is the array's element type.
  */
object ResolveArrayConcatElement extends Rule[LogicalPlan] {

  private def strip(e: Expression, want: DataType): Expression = e match {
    case Cast(inner, StringType, _, _) if inner.dataType == want => inner
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveExpressions {
      case c @ Concat(Seq(l, r)) if l.resolved && r.resolved &&
          (l.dataType.isInstanceOf[ArrayType] ^ r.dataType.isInstanceOf[ArrayType]) =>
        (l.dataType, r.dataType) match {
          case (ArrayType(et, _), _) =>
            val elem = strip(r, et)
            if (elem.dataType == et) Concat(Seq(l, CreateArray(Seq(elem))))
            else c
          case (_, ArrayType(et, _)) =>
            val elem = strip(l, et)
            if (elem.dataType == et) Concat(Seq(CreateArray(Seq(elem)), r))
            else c
          case _ => c
        }
    }
}
