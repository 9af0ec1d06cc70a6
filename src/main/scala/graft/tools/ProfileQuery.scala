package graft.tools

import graft.{GraftSession, SparkEntry}

/** Time one or more named queries (args: name [name …]) at
  * SPARK_GRAFT_SF_DIR, 1 prewarm + SPARK_GRAFT_PROFILE_RUNS (default 3)
  * measured each, printing per-run plan time (analysis + optimization,
  * forced via executedPlan) and execution time separately — the
  * inner-loop twin of Bench for chasing a single query's regression
  * without running the whole headline set.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "3").toInt
    val spark = GraftSession("graft-profile")
    args.foreach { name =>
      def run(): (Double, Double) = {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.executedPlan // force analysis + optimization
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      run()
      val times = (1 to runs).map(_ => run())
      val fmt = times.map { case (p, e) => f"plan=$p%.3f exec=$e%.3f" }
      println(s"[profile] $name\n  ${fmt.mkString("\n  ")}")
    }
    spark.stop()
  }
}
