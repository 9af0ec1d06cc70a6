package graft.tools

import graft.{GraftSession, SparkEntry}

/** Time one or more named queries (args: name [name …]) at
  * SPARK_GRAFT_SF_DIR, 1 prewarm + 3 measured each, printing per-run
  * times — the inner-loop twin of Bench for chasing a single query's
  * regression without running the whole headline set.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("graft-profile")
    args.foreach { name =>
      def run(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run()
      val times = (1 to 3).map(_ => run())
      println(f"[profile] $name%-28s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
