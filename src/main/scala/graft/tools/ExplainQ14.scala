package graft.tools

import graft.{GraftSession, Tables}

/** Dump the physical plan of q14's avg_sales single-channel piece. */
object ExplainQ14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("graft-explain-q14")
    Tables.register(spark, sfDir)
    graft.SparkEntry.queries("tpcds_q03")(spark, sfDir).collect()
    val avgBody = """
       SELECT avg(quantity * list_price) average_sales
       FROM (
          SELECT ss_quantity quantity, ss_list_price list_price
          FROM tpcds.store_sales, tpcds.date_dim
          WHERE ss_sold_date_sk = d_date_sk
            AND d_year BETWEEN 1999 AND 2001
       ) x"""
    spark.sql(avgBody).explain("formatted")
    val t0 = System.nanoTime()
    spark.sql(avgBody).write.format("noop").mode("overwrite").save()
    println(f"[explain-q14] single-channel avg: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
