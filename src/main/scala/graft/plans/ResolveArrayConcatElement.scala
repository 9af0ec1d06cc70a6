package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, CreateArray, Expression, Literal}
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

  private def sameType(a: DataType, b: DataType): Boolean =
    org.apache.spark.sql.graft.ColumnBridge.sameType(a, b)

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
      // BOTH sides arrays but one nests the other: the reference resolves
      // `array(array(T)) || array(T)` as element APPEND (and mirrored as
      // prepend) through the same ArrayConcatUtils signature — Spark's
      // Concat sees DATA_DIFF_TYPES. Same-type pairs never reach here
      // (Concat accepts them) so the match cannot shadow plain concat.
      case c @ Concat(Seq(l, r)) if l.resolved && r.resolved &&
          l.dataType.isInstanceOf[ArrayType] && r.dataType.isInstanceOf[ArrayType] &&
          !sameType(l.dataType, r.dataType) =>
        if (sameType(l.dataType.asInstanceOf[ArrayType].elementType, r.dataType))
          widened(l, r, prepend = false).getOrElse(c)
        else if (sameType(r.dataType.asInstanceOf[ArrayType].elementType, l.dataType))
          widened(r, l, prepend = true).getOrElse(c)
        else c
      // a bare NULL among array-concat arguments: the reference's concat
      // is RETURN_NULL_ON_NULL (the whole result is NULL); Spark's Concat
      // null-propagates the same way but its type check rejects the
      // argument — by the time this rule sees the pair, ConcatCoercion
      // has usually cast the untyped NULL to STRING, so both the raw
      // NullType and that compensating-cast artifact re-type to match
      // the array siblings
      case c @ Concat(children)
          if children.length >= 2 && children.forall(_.resolved) &&
            children.exists(isNullish) &&
            children.exists(_.dataType.isInstanceOf[ArrayType]) &&
            children.filterNot(isNullish)
              .forall(e => sameType(e.dataType,
                children.find(_.dataType.isInstanceOf[ArrayType]).get.dataType)) =>
        val at = children.find(_.dataType.isInstanceOf[ArrayType]).get.dataType
        Concat(children.map(e =>
          if (isNullish(e)) Literal.create(null, at) else e))
    }

  /** An untyped NULL argument, possibly wearing ConcatCoercion's
    * compensating string cast.
    */
  private def isNullish(e: Expression): Boolean = e match {
    case Literal(null, NullType) => true
    case Cast(inner, StringType, _, _) => isNullish(inner)
    case _ => false
  }
}
