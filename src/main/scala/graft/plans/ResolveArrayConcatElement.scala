package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, CreateArray, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, NullType, NumericType, StringType}

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

  /** ConcatCoercion may have cast the scalar side to STRING before this
    * rule sees the pair — strip that compensating cast when the operand's
    * own type is the array's element type OR both are numeric (the
    * widening path below finishes the coercion). A Cast(numeric→string)
    * next to a numeric-array `||` can only be the coercion's artifact or
    * an explicit user cast — both read as element-append here.
    */
  private def strip(e: Expression, want: DataType): Expression = e match {
    case Cast(inner, StringType, _, _)
        if inner.dataType == want ||
          (inner.dataType.isInstanceOf[NumericType] &&
            want.isInstanceOf[NumericType]) => inner
    case other => other
  }

  /** Exact element-type match wraps directly; NUMERIC mixed-width shapes
    * the reference coerces (ArrayConcatUtils reached through the operator
    * registry's implicit numeric coercions — e.g. array(BIGINT) || INT
    * literal) widen BOTH sides to the common type (round-13 ADVICE fix).
    * Non-numeric type mismatches keep Spark's DATA_DIFF_TYPES error, the
    * reference's behavior too (no varchar-array || integer coercion).
    */
  private def widened(arr: Expression, elem: Expression,
      prepend: Boolean): Option[Expression] = {
    val at = arr.dataType.asInstanceOf[ArrayType]
    val et = at.elementType
    def mk(a: Expression, e: Expression) =
      if (prepend) Concat(Seq(CreateArray(Seq(e)), a))
      else Concat(Seq(a, CreateArray(Seq(e))))
    if (elem.dataType == et) Some(mk(arr, elem))
    else if ((et.isInstanceOf[NumericType] || et == NullType) &&
        (elem.dataType.isInstanceOf[NumericType] || elem.dataType == NullType))
      org.apache.spark.sql.graft.ColumnBridge
        .widerCommonType(Seq(et, elem.dataType)).map { w =>
          val a2 = if (et == w) arr else Cast(arr, ArrayType(w, at.containsNull))
          val e2 = if (elem.dataType == w) elem else Cast(elem, w)
          mk(a2, e2)
        }
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveExpressions {
      case c @ Concat(Seq(l, r)) if l.resolved && r.resolved &&
          (l.dataType.isInstanceOf[ArrayType] ^ r.dataType.isInstanceOf[ArrayType]) =>
        (l.dataType, r.dataType) match {
          case (ArrayType(et, _), _) =>
            widened(l, strip(r, et), prepend = false).getOrElse(c)
          case (_, ArrayType(et, _)) =>
            widened(r, strip(l, et), prepend = true).getOrElse(c)
          case _ => c
        }
    }
}
