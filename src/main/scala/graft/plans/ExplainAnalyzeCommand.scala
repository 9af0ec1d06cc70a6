package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StringType

/** Presto's `EXPLAIN ANALYZE` (ExplainAnalyzeOperator.java:34): EXECUTE
  * the statement, then return the plan annotated with runtime operator
  * statistics. Spark keeps those statistics in each [[SparkPlan]] node's
  * SQL metrics, which are populated only after the plan has run — so the
  * command triggers a full (driver-side-collection-free) execution via
  * `toRdd.foreach`, then renders the FINAL adaptive plan tree with each
  * operator's `numOutputRows` (and spill/time metrics where present).
  *
  * Scale note: like the reference, EXPLAIN ANALYZE pays for the full
  * query once; results stream to a no-op sink on the executors, nothing
  * is collected to the driver except the metric values the AM already
  * aggregates.
  */
case class ExplainAnalyzeCommand(sqlText: String) extends LeafRunnableCommand {

  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("Query Plan", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val qe = spark.sql(sqlText).queryExecution
    qe.toRdd.foreach(_ => ()) // execute fully; metrics populate as a side effect
    val sb = new StringBuilder
    render(qe.executedPlan, 0, sb)
    Seq(Row(sb.toString))
  }

  /** Indented tree with the runtime metrics the reference prints per
    * operator (output rows / wall time / memory where the node has them).
    * Adaptive wrapper nodes are traversed into their FINAL plans, so the
    * tree shows what actually ran, not the initial estimate.
    */
  private def render(p: SparkPlan, depth: Int, sb: StringBuilder): Unit = {
    val interesting = Seq(
      "numOutputRows" -> "rows",
      "elapsedTime" -> "elapsed",
      "spillSize" -> "spilled bytes",
      "peakMemory" -> "peak memory bytes",
      "dataSize" -> "bytes")
    val stats = interesting.flatMap { case (key, label) =>
      p.metrics.get(key).map(m => s"$label: ${m.value}")
    }
    sb.append("  " * depth).append(p.nodeName)
    if (stats.nonEmpty) sb.append(" [").append(stats.mkString(", ")).append("]")
    sb.append("\n")
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    children.foreach(render(_, depth + 1, sb))
  }
}
