package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, LogicalPlan, OneRowRelation, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{BooleanType, IntegerType}

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
  * Sentinel-row rewrite — strictly single-pass:
  *
  * {{{
  *   Aggregate(keys :+ gid, aggs, Expand(projs, out, child))
  * ==>
  *   Project(original output,
  *     Filter(__real > 0 OR __gid = emptyMask,
  *       Aggregate(keys :+ gid,
  *                 aggs[FILTER (WHERE NOT __sentinel)]
  *                   :+ count(1) FILTER (NOT __sentinel) AS __real
  *                   :+ gid AS __gid,
  *         Expand(projs ++ [__sentinel], out :+ __sentinel,
  *           Union(child + __sentinel=false,
  *                 one all-NULL row + __sentinel=true)))))
  * }}}
  *
  * Why it is correct:
  * - The sentinel row flows through Expand like any input row, so the
  *   EMPTY grouping set's projection (all key columns NULLed, gid =
  *   mask) manufactures the global group even over empty input. Every
  *   aggregate function carries FILTER (WHERE NOT __sentinel), so the
  *   sentinel contributes to NO aggregate value — over empty input the
  *   global group aggregates zero qualifying rows, which is exactly the
  *   standard's empty-input semantics (count→0, sum→NULL,
  *   collect_list→[], custom sketches correct by construction).
  * - For every NON-empty grouping set the sentinel lands in the
  *   phantom group keyed by all-NULLs; `__real = count(1) FILTER (NOT
  *   __sentinel)` is 0 only there (a genuine all-NULL-key group has
  *   real rows), and the post-filter keeps a row iff __real > 0 OR its
  *   gid is the empty-set mask. Over non-empty input the mask group
  *   contains real rows too, so output is unchanged row-for-row.
  *
  * Why this shape and not a gated union: a first-cut scalar-subquery
  * probe re-planned and re-executed the whole aggregate (+62% on
  * TPC-DS q14, +58% on q67 at sf0.1); a second cut deduped via a
  * window over the group keys, which forced a full sort of the grouped
  * output (+40% on q67). The sentinel row costs ONE extra input row,
  * one codegen'd boolean per aggregate update, and a post-filter — no
  * extra shuffle, no sort, no re-execution, at any scale.
  */
object EmptyGroupingSetsRule extends Rule[LogicalPlan] {
  private val Done = TreeNodeTag[Boolean]("graft.emptyGroupingSetsDone")

  /** Escape hatch: `SET spark.graft.emptyGroupingSets.enabled = false`
    * restores stock Spark's zero-rows-over-empty behavior (the standard
    * operational practice for a semantics-changing rule).
    */
  val EnabledKey = "spark.graft.emptyGroupingSets.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    // Fire only once the WHOLE plan is resolved: GROUPING()/grouping_id
    // references in ORDER BY / HAVING / window specs above the aggregate
    // are resolved by analyzer rules that pattern-match the
    // Aggregate-over-Expand child (ResolveGroupingAnalytics); rewriting
    // the aggregate before those fire leaves them unresolvable (seen on
    // TPC-DS q70's GROUPING()-partitioned rank). The rewrite keeps the
    // aggregate's original output attribute ids, so firing after full
    // resolution is always safe.
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
    val nOut = agg.aggregateExpressions.length

    // child ∪ sentinel: real rows flagged false, one all-NULL row
    // flagged true. The union's first branch keeps the child's attribute
    // ids, so the Expand projections resolve unchanged.
    val realRows = Project(
      expand.child.output :+ Alias(Literal(false), "__graft_sentinel")(),
      expand.child)
    val sentinelRow = Project(
      expand.child.output.map(a =>
        Alias(Literal(null, a.dataType), a.name)()) :+
        Alias(Literal(true), "__graft_sentinel")(),
      OneRowRelation())
    val newChild = Union(Seq(realRows, sentinelRow))
    val flagIn = newChild.output.last

    // thread the flag through Expand
    val flagOut = AttributeReference("__graft_sentinel", BooleanType, nullable = false)()
    val newExpand = Expand(
      expand.projections.map(_ :+ flagIn),
      expand.output :+ flagOut,
      newChild)

    // every aggregate function ignores the sentinel row
    val notSentinel: Expression = Not(flagOut)
    val filteredAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      ne =>
        ne.transform {
          case ae: AggregateExpression =>
            ae.copy(filter =
              Some(ae.filter.map(And(_, notSentinel)).getOrElse(notSentinel)))
        }.asInstanceOf[NamedExpression]
    }
    val realCount = Alias(
      Count(Literal(1)).toAggregateExpression().copy(filter = Some(notSentinel)),
      "__graft_real")()
    val gidOut = Alias(gid, "__graft_gid")()
    val mainPlus = agg.copy(
      aggregateExpressions = filteredAggs :+ realCount :+ gidOut,
      child = newExpand)
    // case-class copy does NOT carry TreeNode tags — without this the
    // widened aggregate re-matches on the next fixpoint iteration
    mainPlus.setTagValue(Done, true)

    val outs = mainPlus.output
    val keep = Or(
      GreaterThan(outs(nOut), Literal(0L)),
      EqualTo(outs(nOut + 1), maskLit))
    Project(outs.take(nOut), Filter(keep, mainPlus))
  }
}
