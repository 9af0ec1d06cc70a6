package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Stage-split profiler for spatial_polygon_join (round 15: the r13 A/B
  * showed a real ~2x per-pair kernel regression). Replicates the
  * pipeline with the exact predicate toggled and counts candidates, so
  * the per-pair cost attributes to parse vs predicate.
  */
object ProfilePolygon {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("graft-profile-polygon")
    Tables.register(spark, sfDir)
    def rects(src: String, id: String, a: Int, b: Int,
        wmod: Int, hmod: Int, wbase: Int, hbase: Int, limit: Int): String =
      s"""SELECT $id, concat('POLYGON ((', x, ' ', y, ', ', x + w, ' ', y, ', ',
         |    x + w, ' ', y + h, ', ', x, ' ', y + h, ', ', x, ' ', y, '))') AS wkt
         |FROM (SELECT $id, x, y,
         |        CAST($wbase + $id % $wmod AS DOUBLE) AS w,
         |        CAST($hbase + $id % $hmod AS DOUBLE) AS h
         |      FROM (SELECT $id, CAST($id * $a % 997 AS DOUBLE) / 10.0 AS x,
         |              CAST($id * $b % 983 AS DOUBLE) / 10.0 AS y FROM $src) p
         |      WHERE $id < $limit) r""".stripMargin
    val a = spark.sql(rects("customer", "c_custkey", 37, 91, 5, 7, 3, 2, 2000))
    val b = spark.sql(rects("supplier", "s_suppkey", 53, 67, 6, 4, 4, 3, 2000))
    val cellSize = 16.0
    def cells(df: org.apache.spark.sql.DataFrame, id: String) = df
      .withColumn("x0", callUDF("st_xmin", col("wkt")))
      .withColumn("x1", callUDF("st_xmax", col("wkt")))
      .withColumn("y0", callUDF("st_ymin", col("wkt")))
      .withColumn("y1", callUDF("st_ymax", col("wkt")))
      .withColumn("cx", explode(sequence(
        floor(col("x0") / cellSize).cast("long"),
        floor(col("x1") / cellSize).cast("long"))))
      .withColumn("cy", explode(sequence(
        floor(col("y0") / cellSize).cast("long"),
        floor(col("y1") / cellSize).cast("long"))))
      .select(col(id), col("wkt").as(s"${id}_wkt"), col("cx"), col("cy"),
        col("x0").as(s"${id}_x0"), col("x1").as(s"${id}_x1"),
        col("y0").as(s"${id}_y0"), col("y1").as(s"${id}_y1"))
    def candidates() = cells(a, "c_custkey").alias("l")
      .join(cells(b, "s_suppkey").alias("r"), Seq("cx", "cy"))
      .filter(col("c_custkey_x0") <= col("s_suppkey_x1") &&
        col("s_suppkey_x0") <= col("c_custkey_x1") &&
        col("c_custkey_y0") <= col("s_suppkey_y1") &&
        col("s_suppkey_y0") <= col("c_custkey_y1"))
    def time(tag: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[poly] $tag: " + ts.map { case (t, n) => f"$t%.3f s (n=$n)" }
        .mkString("  "))
    }
    time("cells-only (envelope UDFs + explode)") {
      cells(a, "c_custkey").count() + cells(b, "s_suppkey").count()
    }
    time("bbox candidates (no exact predicate)") { candidates().count() }
    time("with st_intersects") {
      candidates()
        .filter(callUDF("st_intersects", col("c_custkey_wkt"), col("s_suppkey_wkt")))
        .count()
    }
    time("full operator (distinct+sort)") {
      graft.operators.SpatialOps.polygonIntersectionJoin(
        a, b, cellSize, "c_custkey", "s_suppkey").count()
    }
    spark.stop()
  }
}
