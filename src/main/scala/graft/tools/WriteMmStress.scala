package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress for the two historically un-stressed families (round-9
  * verdict ask #6): the WRITE path and the multimodal binary ops.
  *
  *  - documents-based ops (wr_partitioned_prune's partitioned write +
  *    pruned read-back, wr_ctas_insert's full-corpus CTAS, the mm_*
  *    binary family) run on the [[ScaleStress]] synthetic corpus at
  *    mult=1 vs mult=N — every run re-executes the write, so the ratio
  *    measures the write path itself;
  *  - wr_bucketed_join runs against a TpcStress-style replicated
  *    lineitem (facts ×N, dims fixed). COLD = drop + rebuild the
  *    bucketed tables then join (the write being stressed); WARM =
  *    join-only against the existing bucketed layout (the recurring
  *    read cost a bucketed table exists to amortize).
  *
  * Prints one JSON line: per-query times at m1/mN plus the ratio, so
  * BENCHLOG gets a machine-made table. Expected shape: ≤ ~N ratios for
  * full-write ops (write volume is linear by construction) and ~flat
  * for the pruned read-back; a super-linear row means a shuffle or
  * driver loop crept into a write path.
  */
object WriteMmStress {

  private val docQueries = Seq(
    "wr_partitioned_prune", "wr_ctas_insert",
    "mm_binary_stats", "mm_decode_meta", "mm_frame_sample", "mm_features")

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession("write-mm-stress")

    def once(q: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def minOf(q: String, dir: String): Double =
      (1 to runs).map(_ => once(q, dir)).min

    // ── documents family on the ScaleStress corpora ──
    def docTimes(m: Int): Map[String, Double] = {
      val dir = s"/tmp/graft-stress-m$m"
      new java.io.File(dir).mkdirs()
      ScaleStress.synth(spark, dir, m)
      Tables.register(spark, dir)
      docQueries.map { q =>
        once(q, dir) // prewarm (plan/code compile; the write still re-runs below)
        val t = minOf(q, dir)
        System.err.println(f"[wm-stress] m$m%-3d $q%-22s $t%8.2f s")
        q -> t
      }.toMap
    }
    val d1 = docTimes(1)
    val dN = docTimes(mult)

    // ── bucketed write + co-located join on facts ×mult ──
    def dropBucketed(): Unit = Seq("graft_orders_bkt", "graft_lineitem_bkt")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    def factDir(m: Int): String =
      if (m == 1) "/root/testdata/sf0.1"
      else {
        val dir = s"/tmp/graft-tpc-stress-m$m"
        new java.io.File(dir).mkdirs()
        for (t <- Tables.all if t != "lineitem") {
          val link = java.nio.file.Paths.get(s"$dir/$t.parquet")
          if (!java.nio.file.Files.exists(link))
            java.nio.file.Files.createSymbolicLink(
              link, java.nio.file.Paths.get(s"/root/testdata/sf0.1/$t.parquet"))
        }
        if (!new java.io.File(s"$dir/lineitem.parquet/_SUCCESS").exists) {
          spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
            .withColumn("rep", explode(sequence(lit(0L), lit(m - 1L))))
            .withColumn("l_orderkey", col("l_orderkey") + col("rep") * (1L << 40))
            .drop("rep")
            .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        }
        dir
      }
    def bucketedTimes(m: Int): (Double, Double) = {
      val dir = factDir(m)
      Tables.register(spark, dir)
      dropBucketed()
      val cold = once("wr_bucketed_join", dir) // build both bucketed tables + join
      val warm = minOf("wr_bucketed_join", dir) // join-only on the layout
      System.err.println(f"[wm-stress] m$m%-3d wr_bucketed_join cold=$cold%.2f s warm=$warm%.2f s")
      (cold, warm)
    }
    val (c1, w1) = bucketedTimes(1)
    val (cN, wN) = bucketedTimes(mult)

    def fmt(v: Double) = f"$v%.2f"
    def ratio(a: Double, b: Double) = f"${b / math.max(a, 1e-9)}%.2f"
    val rows = docQueries.map { q =>
      s""""$q":{"m1":${fmt(d1(q))},"m$mult":${fmt(dN(q))},"ratio":${ratio(d1(q), dN(q))}}"""
    } ++ Seq(
      s""""wr_bucketed_join_cold":{"m1":${fmt(c1)},"m$mult":${fmt(cN)},"ratio":${ratio(c1, cN)}}""",
      s""""wr_bucketed_join_warm":{"m1":${fmt(w1)},"m$mult":${fmt(wN)},"ratio":${ratio(w1, wN)}}""")
    println(s"""{"metric":"write_mm_stress","mult":$mult,"queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
