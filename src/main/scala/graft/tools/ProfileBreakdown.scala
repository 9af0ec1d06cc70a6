package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable

/** Per-JOB wall-clock timeline of one query execution (args:
  * name [runs]) — where ProfileQuery splits plan vs exec, this splits
  * exec into Spark jobs plus the DRIVER GAPS between them (collects,
  * ML driver steps, commit work). The gap line is the tell for
  * driver-bound queries: big gaps with short jobs means the time is not
  * in distributed execution at all.
  */
object ProfileBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // args: query [query …] [runs] — trailing integer = measured runs
    val (names, runs) = args.lastOption.flatMap(a => a.toIntOption) match {
      case Some(n) if args.length > 1 => (args.dropRight(1).toSeq, n)
      case _ => (args.toSeq, 2)
    }
    val spark = GraftSession("graft-breakdown")
    case class Job(id: Int, desc: String, start: Long, var end: Long)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        jobs(js.jobId) = Job(js.jobId, desc.take(90), js.time, -1L)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(_.end = je.time)
      }
    })
    def run(name: String, label: String): Unit = {
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.executedPlan
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      // listener bus is async — give it a beat to drain
      Thread.sleep(150)
      val js = jobs.synchronized(jobs.values.toVector.sortBy(_.start))
      val execMs = (t2 - t1) / 1e6
      val jobMs = js.map(j => math.max(0L, j.end - j.start)).sum
      println(f"[$label] $name plan=${(t1 - t0) / 1e9}%.3f exec=${execMs / 1000}%.3f " +
        f"jobs=${js.size} jobWall=${jobMs / 1000.0}%.3f driverGaps=${(execMs - jobMs) / 1000.0}%.3f")
      js.foreach { j =>
        val d = math.max(0L, j.end - j.start)
        if (d >= 20) println(f"    job ${j.id}%4d ${d}%6d ms  ${j.desc}")
      }
    }
    names.foreach { name =>
      run(name, "prewarm")
      (1 to runs).foreach(i => run(name, s"run$i"))
    }
    spark.stop()
  }
}
