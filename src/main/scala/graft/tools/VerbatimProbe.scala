package graft.tools

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

/** Probe which reference benchto TPC-DS texts
  * (presto-benchto-benchmarks/src/main/resources/sql/presto/tpcds/qNN.sql)
  * run VERBATIM against the synthesized tpcds views, to find promotion
  * candidates for BenchtoTpcdsTexts. Dev-only; not part of the gate.
  *
  * Usage: runMain graft.tools.VerbatimProbe /root/testdata/sf0.001 [qNN ...]
  */
object VerbatimProbe {
  def main(argv: Array[String]): Unit = {
    val dir = argv.headOption.getOrElse("/root/testdata/sf0.001")
    val only = argv.drop(1).toSet
    val refDir = Paths.get(
      "/root/reference/presto-benchto-benchmarks/src/main/resources/sql/presto/tpcds")
    val have = Set("q01", "q03", "q04", "q07", "q14_1", "q23_1", "q24_1",
      "q26", "q28", "q32", "q33", "q37", "q38", "q42", "q43", "q44", "q47",
      "q52", "q55", "q56", "q57", "q59", "q60", "q61", "q69", "q70", "q79",
      "q87", "q88", "q89", "q90", "q93", "q96", "q97", "q98")
    val spark = graft.GraftSession("verbatim-probe")
    graft.Tables.register(spark, dir)
    graft.operators.TpcdsQueries.ensureTpcdsViews(spark, dir)
    val files = Files.list(refDir).iterator().asScala.toSeq
      .map(_.getFileName.toString).filter(_.endsWith(".sql")).sorted
    for (f <- files) {
      val id = f.stripSuffix(".sql")
      if (!have(id) && (only.isEmpty || only(id))) {
        val text = new String(Files.readAllBytes(refDir.resolve(f)), "UTF-8")
          .replace("${database}.${schema}.", "spark_catalog.tpcds.")
        val t0 = System.nanoTime()
        Try {
          val df = spark.sql(text)
          val n = df.limit(5).collect().length
          (n, df.schema)
        } match {
          case Success((n, schema)) =>
            val secs = (System.nanoTime() - t0) / 1e9
            println(f"PROBE $id%-7s OK   rows=$n ${secs}%.1fs")
            val cols = schema.fields
              .map(f => s"${f.name}\t${f.dataType.sql}").mkString("|")
            println(s"SCHEMA $id\t$cols")
          case Failure(e) =>
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(2).mkString(" | ").take(300)
            println(f"PROBE $id%-7s ERR  $msg")
        }
      }
    }
    spark.stop()
  }
}
