package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.IntegerType

/** SQL-standard semantics for ROLLUP / CUBE / GROUPING SETS over EMPTY
  * input: when the grouping-set list contains the empty set `()`, the
  * standard (and the reference engine, and DuckDB) emit one global-
  * aggregate row even when the input is empty — the reference's
  * GroupIdOperator emits a group-id per set and its hash aggregation
  * produces default single-group output over no input (reference:
  * presto-main/.../operator/GroupIdOperator.java:32,
  * presto-main/.../operator/HashAggregationOperator.java:47). Spark's
  * Expand-based rewrite emits zero rows instead (surfaced by TPC-DS q27
  * whose 'd_year = 2002' predicate selects nothing at fixture scale).
  *
  * Rewrite (resolution rule, fires only on the grouping-sets shape whose
  * Expand projections include the empty grouping set):
  *
  * {{{
  *   Aggregate(groupByAttrs :+ gid, aggs, Expand(...))          -- main
  * ==>
  *   Union(
  *     main,
  *     Filter(ScalarSubquery(Aggregate(count(1), main)) = 0,    -- probe
  *       Aggregate(Nil, defaults, LocalRelation(empty))))       -- defaults
  * }}}
  *
  * - `defaults` is the SAME result expressions with grouping-attribute
  *   references replaced by typed NULLs and the grouping-id reference by
  *   the empty-set mask, evaluated as a REAL global aggregate over a
  *   guaranteed-empty LocalRelation — so every aggregate function
  *   (count→0, sum→NULL, collect_list→[], custom sketches→their own
  *   empty-input value) gets its genuine empty-input semantics with no
  *   per-function default table.
  * - The probe is an uncorrelated scalar subquery counting the main
  *   aggregate's rows; at execution its inner aggregate canonicalizes
  *   identically to `main`, so the shuffle exchange is reused — the
  *   100 TB input is NOT rescanned; the marginal cost is one re-reduce
  *   of the grouped partials feeding a 1-row count.
  * - Over non-empty input the filter removes the defaults row, so every
  *   existing grouping-sets query is unchanged; grouping-set lists
  *   WITHOUT the empty set (plain GROUPING SETS ((a),(b))) never match.
  */
object EmptyGroupingSetsRule extends Rule[LogicalPlan] {
  private val Done = TreeNodeTag[Boolean]("graft.emptyGroupingSetsDone")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Fire only once the WHOLE plan is resolved: GROUPING()/grouping_id
    // references in ORDER BY / HAVING / window specs above the aggregate
    // are resolved by analyzer rules that pattern-match the
    // Aggregate-over-Expand child (ResolveGroupingAnalytics); rewriting
    // the aggregate into a Union before those fire leaves them
    // unresolvable (seen on TPC-DS q70's GROUPING()-partitioned rank).
    // The Union keeps the aggregate's output attribute ids, so firing
    // after full resolution is always safe.
    if (!plan.resolved) return plan
    plan.transformUp {
      case agg @ Aggregate(gexprs, _, expand: Expand, _)
          if gexprs.nonEmpty && agg.getTagValue(Done).isEmpty &&
            isGroupingId(gexprs.last) && hasEmptySet(gexprs, expand) =>
        agg.setTagValue(Done, true)
        rewrite(agg, expand)
    }
  }

  private def isGroupingId(e: Expression): Boolean = e match {
    case a: Attribute => a.name == VirtualColumn.groupingIdName
    case _ => false
  }

  /** The empty grouping set excludes every grouping column, so its
    * grouping-id has all `n` low bits set.
    */
  private def emptyMask(agg: Aggregate): Literal = {
    val n = agg.groupingExpressions.length - 1
    val gidType = agg.groupingExpressions.last.dataType
    val mask = (1L << n) - 1
    if (gidType == IntegerType) Literal(mask.toInt) else Literal(mask)
  }

  private def hasEmptySet(gexprs: Seq[Expression], expand: Expand): Boolean = {
    val n = gexprs.length - 1
    if (n <= 0 || n >= 63) return false
    val mask = (1L << n) - 1
    // each Expand projection carries its set's gid literal in the last slot
    expand.projections.exists(_.lastOption.exists {
      case Literal(v: Int, _) => v.toLong == mask
      case Literal(v: Long, _) => v == mask
      case _ => false
    })
  }

  private def rewrite(agg: Aggregate, expand: Expand): LogicalPlan = {
    val gid = agg.groupingExpressions.last.asInstanceOf[Attribute]
    val maskLit = emptyMask(agg)
    val groupIds = agg.groupingExpressions.dropRight(1)
      .collect { case a: Attribute => a.exprId }.toSet
    // the result expressions with grouping refs → NULL and gid → mask;
    // aggregate functions are kept intact (they reference the pre-Expand
    // child attributes, re-bound below to an empty LocalRelation twin).
    // Fresh output exprIds: the Union match is positional, and fresh ids
    // keep the two branches' outputs disjoint.
    val defaults: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
      val swapped = ne.transform {
        case a: AttributeReference if a.exprId == gid.exprId => maskLit
        case a: AttributeReference if groupIds.contains(a.exprId) =>
          Literal(null, a.dataType)
      }
      swapped match {
        case Alias(c, name) => Alias(c, name)()
        case a: Attribute => Alias(a, a.name)()
        case other => Alias(other, ne.name)()
      }
    }
    val defaultsAgg =
      Aggregate(Nil, defaults, LocalRelation(expand.child.output), None)
    val probe = ScalarSubquery(Aggregate(
      Nil,
      Seq(Alias(Count(Literal(1)).toAggregateExpression(), "__graft_group_count")()),
      agg,
      None))
    Union(Seq(agg, Filter(EqualTo(probe, Literal(0L)), defaultsAgg)))
  }
}
