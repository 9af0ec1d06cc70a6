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
    // per-stage task-metric rollup: separates "tasks really ran long"
    // (executorRunTime) from queueing/launch gaps (wall - run) and GC
    val taskAgg = mutable.Map.empty[Int, (Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(60), wall, i.numTasks))
        }
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) taskAgg.synchronized {
          val (run, gc, des, maxDur) =
            taskAgg.getOrElse(te.stageId, (0L, 0L, 0L, 0L))
          taskAgg(te.stageId) = (run + m.executorRunTime, gc + m.jvmGCTime,
            des + m.executorDeserializeTime,
            math.max(maxDur, te.taskInfo.duration))
        }
      }
    })
    // per-run JVM-level attribution: GC wall time (all collectors) and
    // whole-stage-codegen compile time — the two usual suspects for a
    // multi-x straggler run that stage walls alone can't separate
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // compilation COUNT, not the histogram reservoir (getValues is a
    // sample and under-reports deltas)
    def codegenCount: Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
    def codeCacheMb: Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(_.getUsage.getUsed / 1048576.0).sum
    }
    // HotSpot JIT activity (C1+C2 compiler-thread time) — janino codegen
    // above is bytecode GENERATION; this is the JVM compiling it (and
    // everything else) to machine code
    def jitMillis: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    val times = (1 to runs).map { r =>
      stages.synchronized(stages.clear())
      val (gc0, cg0, jit0) = (gcMillis, codegenCount, jitMillis)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[spike-ts] run ${r}%2d end=${System.currentTimeMillis} sec=$sec%.3f codecache=${codeCacheMb}%.0f MB")
      // snapshot this run's stages (listener is async; give it a beat)
      Thread.sleep(200)
      (sec, gcMillis - gc0, codegenCount - cg0, jitMillis - jit0,
        stages.synchronized(stages.toVector))
    }
    val fastest = times.map(_._1).min
    times.zipWithIndex.foreach { case ((sec, gc, cg, jit, st), i) =>
      val slow = sec > fastest * 2 && sec > 1.0
      println(f"[spike] run ${i + 1}%2d  $sec%7.3f s  gc=${gc / 1e3}%6.3f s  " +
        f"codegenN=$cg%3d  jit=${jit / 1e3}%6.3f s  stages=${st.size}" +
        (if (slow) "  <-- SLOW" else ""))
      if (slow) {
        val stageSum = st.map(_._3).sum / 1e3
        println(f"        stage wall sum: $stageSum%.3f s (rest is driver side)")
        st.sortBy(-_._3).take(8).foreach { case (id, nm, wall, nt) =>
          val (run, tgc, des, maxDur) =
            taskAgg.synchronized(taskAgg.getOrElse(id, (0L, 0L, 0L, 0L)))
          println(f"        stage $id%4d  ${wall / 1e3}%7.3f s  tasks=$nt%3d  " +
            f"taskRun=${run / 1e3}%6.3f s  maxTask=${maxDur / 1e3}%6.3f s  " +
            f"gc=${tgc / 1e3}%5.3f  deser=${des / 1e3}%5.3f  $nm")
        }
      }
    }
    spark.stop()
  }
}
