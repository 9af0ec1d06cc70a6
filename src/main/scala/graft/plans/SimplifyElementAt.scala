package graft.plans

import org.apache.spark.sql.catalyst.expressions.{CreateArray, ElementAt, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Simplify `element_at(array(e1..en), <integral literal k>)` with a
  * statically in-bounds k to the selected element expression, exactly as
  * Spark's own `SimplifyExtractValueOps` does for the 0-based
  * `GetArrayItem(CreateArray(...), lit)` subscript — upstream has no
  * ElementAt case, so the array is materialized per row just to pick one
  * known child.
  *
  * Besides the wasted allocation, the un-simplified shape trips a Spark
  * 4.1.2 whole-stage-codegen bug: with a foldable ordinal that lands on a
  * statically NON-nullable CreateArray child, `ElementAt.nullable`
  * resolves false (GetArrayItemUtil.computeNullabilityFromArray) so
  * `ev.isNull` is never declared, but ElementAt.doGenCode still emits the
  * `isNullAt` branch assigning it — janino fails with
  * `Expression "isNull_N" is not an rvalue` and the WHOLE stage falls
  * back to interpreted execution (measured on dialect_subscript: two
  * 1-based subscripts over the same inline array killed codegen for the
  * scan+project stage). The Presto dialect's subscript rewrite
  * ([[graft.functions.PrestoOperators]], `arr[k]` → `element_at`) makes
  * this shape common in ported Presto SQL, so the simplification is
  * load-bearing, not cosmetic.
  *
  * Semantics: k is 1-based from the front, negative k counts from the
  * back (both Presto's and Spark's element_at contract). Out-of-bounds or
  * zero k is left alone — the runtime error (ANSI) / null (non-ANSI) path
  * stays stock. Like SimplifyExtractValueOps, the rewrite drops the
  * evaluation of the unselected sibling expressions.
  *
  * The dataType guard keeps the rule a strict no-op whenever the selected
  * child's type differs from the array element type (cannot happen after
  * ImplicitTypeCasts, but a free invariant).
  */
object SimplifyElementAt extends Rule[LogicalPlan] {

  private def intOf(l: Literal): Option[Long] = l.value match {
    case null => None
    case i: java.lang.Integer => Some(i.longValue)
    case i: java.lang.Long => Some(i.longValue)
    case i: java.lang.Short => Some(i.longValue)
    case i: java.lang.Byte => Some(i.longValue)
    case _ => None
  }

  private val simplify: PartialFunction[Expression, Expression] = {
    case e @ ElementAt(ca: CreateArray, l: Literal, _, _)
        if intOf(l).exists(k =>
          k != 0 && math.abs(k) <= ca.children.size &&
            ca.children(
              (if (k > 0) k - 1 else ca.children.size + k).toInt
            ).dataType == e.dataType) =>
      val k = intOf(l).get
      ca.children((if (k > 0) k - 1 else ca.children.size + k).toInt)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions(simplify)
}
