package graft.tools

import graft.{GraftSession, SparkEntry}

/** Print the executed plan of any CORRECTNESS query — the manual
  * companion to PlanSpec's pinned assertions:
  *
  *   sbt "runMain graft.tools.PlanCheck <queryName> [sfDir]"
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: PlanCheck <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession("graft-plancheck")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // let AQE finalize
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
