package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{BenchtoTpcdsTexts, TpcdsQueries}

/** Break tpcds_q14's time into its three pieces (cross_items CTE,
  * avg_sales CTE, main rollup body) to see which dominates.
  */
object ProfileQ14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("graft-profile-q14")
    Tables.register(spark, sfDir)
    TpcdsQueries.defs // force view registration lazily via a run below
    val text = BenchtoTpcdsTexts.q14_1
      .replace("'${database}.${schema}.store'", "'store'")
      .replace("${database}.${schema}.", "tpcds.")
    val iCross = text.indexOf("cross_items AS (") + "cross_items AS (".length
    val iAvgClause = text.indexOf(", avg_sales AS (")
    val iAvg = iAvgClause + ", avg_sales AS (".length
    val iMain = text.indexOf("SELECT\n  \"channel\"", iAvg)
    val crossBody = text.substring(iCross, iAvgClause).trim.dropRight(1)
    val avgBody = text.substring(iAvg, iMain).trim.dropRight(1)
    val mainBody = text.substring(iMain)

    // register views by running any tpcds query once
    graft.SparkEntry.queries("tpcds_q03")(spark, sfDir).collect()

    def time(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[q14] $label run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("cross_items") {
      spark.sql(crossBody).localCheckpoint().createOrReplaceTempView("cross_items")
    }
    time("avg_sales") {
      spark.sql(avgBody).localCheckpoint().createOrReplaceTempView("avg_sales")
    }
    time("main") {
      spark.sql(mainBody).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
