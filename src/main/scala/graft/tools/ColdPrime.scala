package graft.tools

import graft.{GraftSession, SparkEntry}

/** Fresh-JVM A/B for the one cold-start lever the round-12 conf sweep
  * could not test: a PRIMING PASS. BENCHLOG's cold-start table showed
  * every conf/JVM-flag lever negative — the ~14.6 s true-cold cost of
  * the giant TPC-DS plans (q64: 157 janino compiles + ~10 s of
  * not-yet-JITed execution smeared over 69 stages) is intrinsic JVM
  * warm-up. The operational mitigation on a real cluster is to execute
  * the heavy plans once per executor JVM against a TINY slice before
  * SLA-bound traffic. This tool measures exactly how much of the
  * warm-up a tiny-data prime actually transfers to the first big-data
  * run — it is NOT obvious that it transfers: AQE at sf0.001 picks
  * different join strategies (broadcast everywhere), so the generated
  * whole-stage code differs and janino's cache (keyed on source text)
  * may miss.
  *
  * Usage:  runMain graft.tools.ColdPrime <cold|primed> [query] [primeDir] [primeQuery]
  *   cold   — time the first execution at SPARK_GRAFT_SF_DIR (default
  *            sf0.1) in this fresh JVM; the baseline.
  *   primed — first run the same query at primeDir (default sf0.001),
  *            then time the first execution at the target dir.
  * Each invocation must be its own sbt run (fresh JVM) or the numbers
  * mean nothing. Prints one JSON line per phase with wall, janino
  * compile-count delta, and HotSpot compiler-thread time delta.
  */
object ColdPrime {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("cold")
    val name = args.drop(1).headOption.getOrElse("tpcds_q64")
    val primeDir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.001")
    val primeQuery = args.drop(3).headOption.getOrElse(name)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("graft-coldprime")

    def codegenCount: Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
    def jitMillis: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime

    def phase(label: String, q: String, dir: String): Double = {
      val (cg0, jit0) = (codegenCount, jitMillis)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"phase":"$label%s","query":"$q%s","dir":"$dir%s","sec":$sec%.3f,"codegenN":${codegenCount - cg0}%d,"jitSec":${(jitMillis - jit0) / 1e3}%.3f}""")
      sec
    }

    mode match {
      case "cold" =>
        phase("target-first-run", name, sfDir)
      case "primed" =>
        val p = phase("prime", primeQuery, primeDir)
        val t = phase("target-first-run", name, sfDir)
        println(f"""{"phase":"total","query":"$name%s","sec":${p + t}%.3f}""")
      case other =>
        sys.error(s"unknown mode '$other' (cold|primed)")
    }
    // a warm reference in the same JVM, for the record
    phase("target-second-run", name, sfDir)
    spark.stop()
  }
}
