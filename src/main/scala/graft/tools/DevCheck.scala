package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Filtered Verify for the inner dev loop: run only the queries whose
  * name matches the given regex, dump results + oracle SQL the same way
  * Verify does, exit nonzero if any query throws. Paired with
  * dev/compare.py (DuckDB side).
  */
object DevCheck {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, pattern) = args
    val re = pattern.r
    val spark = GraftSession("graft-devcheck")
    new java.io.File(outDir).mkdirs()
    var failed = 0
    val picked = SparkEntry.all.filter(d => re.findFirstIn(d.name).isDefined)
    picked.sortBy(_.name).foreach { d =>
      try {
        d.run(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/${d.name}")
        println(s"[devcheck] OK ${d.name}")
      } catch { case e: Throwable =>
        failed += 1
        println(s"[devcheck] FAIL ${d.name} — ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    def esc(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = picked.flatMap(d => d.oracle.map(o => s"${esc(d.name)}: ${esc(o)}"))
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
