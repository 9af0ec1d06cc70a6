package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.functions._

/** Scale-stress for the TPC-DS corpus (round-8 verdict #5: the dd_/sim_
  * family had measured 10x/30x evidence, but q14/q64/q67's
  * localCheckpoint-materialized CTE strategy was still argued-from-design
  * at scale). Synthesizes a mult-x fixture by replicating sf0.1's
  * lineitem with disjoint orderkey ranges (`l_orderkey + i*2^40` — every
  * TpcdsSynth fact derivation is modulo-reduced, so shifted keys still
  * land in valid dim ranges and join selectivities are preserved), the
  * other base tables symlinked unscaled — facts scale mult-x, dims stay
  * fixed, exactly the TPC-DS spec's own scaling shape. Then times the
  * bench's heaviest TPC-DS queries (1 prewarm + N measured, min-of-N) and
  * prints ONE JSON line. Compare mult=1 vs mult=10: sub-~4x wall for 10x
  * facts means no super-linear query.
  *
  * Usage: runMain graft.tools.TpcStress [mult] [runs]
  */
object TpcStress {

  private val queries = Seq(
    "tpcds_q14", "tpcds_q64", "tpcds_q67", "tpcds_q51", "tpcds_q75",
    "tpcds_q10", "tpcds_q74")

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val base = "/root/testdata/sf0.1"
    val dir = s"/tmp/graft-tpc-stress-m$mult"
    new java.io.File(dir).mkdirs()
    val spark = GraftSession("tpc-stress")

    // symlink every unscaled table (dims + the non-TPC fixtures Tables
    // .register expects to exist)
    for (t <- graft.Tables.all if t != "lineitem") {
      val link = java.nio.file.Paths.get(s"$dir/$t.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(
          link, java.nio.file.Paths.get(s"$base/$t.parquet"))
    }
    val fact = new java.io.File(s"$dir/lineitem.parquet/_SUCCESS")
    if (!fact.exists) {
      // one map-side pass: explode mult replicas with disjoint key ranges
      spark.read.parquet(s"$base/lineitem.parquet")
        .withColumn("rep", explode(sequence(lit(0L), lit(mult - 1L))))
        .withColumn("l_orderkey", col("l_orderkey") + col("rep") * (1L << 40))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    }

    def execute(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val results = queries.map { q =>
      val times =
        try { execute(q); (1 to runs).map(_ => execute(q)).sorted }
        catch { case e: Throwable =>
          System.err.println(s"[tpc-stress] $q failed: ${e.getMessage}")
          Seq(-1.0)
        }
      q -> times
    }
    val rows = spark.read.parquet(s"$dir/lineitem.parquet").count()
    spark.stop()
    val qs = results.map { case (k, t) => f""""$k":${t.head}%.3f""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"tpc_stress","mult":$mult,"fact_rows":$rows,"estimator":"min-of-$runs","queries":$qs}""")
  }
}
