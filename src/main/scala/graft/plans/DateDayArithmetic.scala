package graft.plans

import org.apache.spark.sql.catalyst.expressions.{DateDiff, SubtractDates}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** `date - date` → integer day count (Spark's default is an
  * INTERVAL DAY, which won't compare against a number).
  *
  * Why: the reference's benchto TPC-DS texts bucket shipping lag as
  * `("ws_ship_date_sk" - "ws_sold_date_sk") <= 30` (q50/q62/q99,
  * presto-benchto-benchmarks/src/main/resources/sql/presto/tpcds/q62.sql:5);
  * against the real TPC-DS schema the `*_date_sk` columns are BIGINT
  * surrogate keys assigned one per calendar day, so the difference IS a
  * day count. Our synthesized `tpcds` views type those columns as DATE
  * (TpcdsSynth), so the faithful reading of `sk_a - sk_b` is
  * `datediff(sk_a, sk_b)` — the same integer the BIGINT schema yields.
  * DuckDB (the oracle) already evaluates DATE - DATE as integer days,
  * so both sides agree without touching the query text.
  *
  * Dialect note: this widens, not diverges — Presto 0.235 rejects
  * `(date - date) <= 30` (interval vs integer), and no prior graft
  * query relied on the interval result.
  */
object ResolveDateSubToDays extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveExpressions {
      case SubtractDates(left, right, _) => DateDiff(left, right)
    }
}
