package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.catalyst.rules.RuleExecutor

/** Where does a query's PLANNING time go? (args: name [name …]) —
  * resets the catalyst RuleExecutor metrics, forces analysis +
  * optimization, and prints the top rules by wall time. For queries
  * whose bench cost is driver-side planning rather than execution
  * (tpcds_q14: ~4.9 s plan vs ~1.0 s exec at sf0.1).
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("graft-plantime")
    args.foreach { name =>
      // warm views/catalog so the measurement is the steady-state cost
      SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
      RuleExecutor.resetMetrics()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[plantime] $name total ${sec}%.3f s")
      println(RuleExecutor.dumpTimeSpent().split('\n').take(40).mkString("\n"))
    }
    spark.stop()
  }
}
