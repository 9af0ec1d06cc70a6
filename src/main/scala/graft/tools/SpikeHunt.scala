package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Chase intermittent per-run latency spikes in one query (args:
  * name [runs]): execute it `runs` times, recording per-stage wall times
  * via a listener, and for any run slower than 2× the fastest print the
  * stage breakdown — separates "a stage really ran long" from
  * driver-side (planning/commit) time.
  */
object SpikeHunt {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args(0)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(15)
    val spark = GraftSession("graft-spikehunt")
    val stages = mutable.ArrayBuffer.empty[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(60), wall, i.numTasks))
        }
      }
    })
    val times = (1 to runs).map { r =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // snapshot this run's stages (listener is async; give it a beat)
      Thread.sleep(200)
      (sec, stages.synchronized(stages.toVector))
    }
    val fastest = times.map(_._1).min
    times.zipWithIndex.foreach { case ((sec, st), i) =>
      val slow = sec > fastest * 2 && sec > 1.0
      println(f"[spike] run ${i + 1}%2d  $sec%7.3f s  stages=${st.size}" +
        (if (slow) "  <-- SLOW" else ""))
      if (slow) {
        val stageSum = st.map(_._3).sum / 1e3
        println(f"        stage wall sum: $stageSum%.3f s (rest is driver side)")
        st.sortBy(-_._3).take(8).foreach { case (id, nm, wall, nt) =>
          println(f"        stage $id%4d  ${wall / 1e3}%7.3f s  tasks=$nt%3d  $nm")
        }
      }
    }
    spark.stop()
  }
}
