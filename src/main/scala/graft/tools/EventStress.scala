package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Scale-stress for the event-time family (as-of join, sessionize,
  * sliding windows). Replicates sf0.1's events mult-x by time-shifting
  * whole copies (`ts + rep * 31 days`, `event_id + rep * 2^40`) with
  * user_id UNCHANGED — so the key count stays fixed and every user's
  * timeline grows mult-x. That is the adversarial direction for these
  * operators: the union+window as-of and the O(1)-state sessionizer walk
  * per-key ordered runs, so this grows exactly the runs they walk (a
  * user-id-shifted variant would only widen the shuffle, which the TPC
  * stress already exercises). 31-day shift > the fixture's 30-day span,
  * so replicas never interleave and per-replica session structure is
  * preserved. Times each query 1 prewarm + N measured (min-of-N), prints
  * ONE JSON line. Linear-or-better: <= ~mult wall at 10x rows.
  *
  * Usage: runMain graft.tools.EventStress [mult] [runs]
  */
object EventStress {

  private val queries = Seq(
    "join_asof", "ev_custom_sessionize", "ev_sliding_window",
    "ev_session_window", "ev_stream_dedup")

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val base = "/root/testdata/sf0.1"
    val dir = s"/tmp/graft-event-stress-m$mult"
    new java.io.File(dir).mkdirs()
    val spark = GraftSession("event-stress")

    for (t <- Tables.all if t != "events") {
      val link = java.nio.file.Paths.get(s"$dir/$t.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(
          link, java.nio.file.Paths.get(s"$base/$t.parquet"))
    }
    val fixture = new java.io.File(s"$dir/events.parquet/_SUCCESS")
    if (!fixture.exists) {
      Tables.load(spark, base, "events")
        .withColumn("rep", explode(sequence(lit(0L), lit(mult - 1L))))
        .withColumn("ts", col("ts") + col("rep") * expr("INTERVAL 31 DAY"))
        .withColumn("event_id", col("event_id") + col("rep") * (1L << 40))
        .drop("rep")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
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
          System.err.println(s"[event-stress] $q failed: ${e.getMessage}")
          Seq(-1.0)
        }
      q -> times
    }
    val rows = spark.read.parquet(s"$dir/events.parquet").count()
    spark.stop()
    val qs = results.map { case (k, t) => f""""$k":${t.head}%.3f""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"event_stress","mult":$mult,"event_rows":$rows,"estimator":"min-of-$runs","queries":$qs}""")
  }
}
