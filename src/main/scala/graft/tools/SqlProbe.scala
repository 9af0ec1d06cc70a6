package graft.tools

import graft.{GraftSession, Tables}

/** One-off SQL probe for the inner dev loop: run each semicolon-separated
  * statement from args (or stdin with "-") against a GraftSession with
  * the sf0.001 tables registered, printing schema + rows. Exists because
  * spark-shell hangs in this container (see the verify skill notes).
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("graft-sql-probe")
    Tables.register(spark, args.headOption.filter(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.001"))
    val sqlArgs = if (args.headOption.exists(_.startsWith("/"))) args.tail else args
    // "@/path/file.sql" reads ";;"-separated statements from the file —
    // sbt's forked run neither forwards stdin nor survives embedded
    // double quotes in args, so file-based is the reliable quoting path
    // explicit UTF-8: the forked JVM's default charset is POSIX/ASCII in
    // this container, and KAT files carry emoji/multibyte subjects
    val stmts =
      (if (sqlArgs.sameElements(Array("-")))
        scala.io.Source.stdin.mkString.split(";;")
      else sqlArgs.flatMap { a =>
        if (a.startsWith("@"))
          scala.io.Source.fromFile(a.drop(1), "UTF-8").mkString.split(";;")
        else Array(a)
      }).map(_.trim).filter(_.nonEmpty)
    stmts.foreach { s =>
      println(s"--- $s")
      try {
        val df = spark.sql(s)
        println(df.schema.map(f => s"${f.name}: ${f.dataType.sql}").mkString(" | "))
        df.show(20, truncate = false)
      } catch { case e: Throwable =>
        println(s"ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
