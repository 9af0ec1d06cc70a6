package graft.tools

import scala.io.Source

import graft.GraftSession

/** Round-12 audit: reference function names that ALSO exist as Spark
  * builtins and are NOT overridden by a graft registration — exactly
  * the shape that hid the md5/sha1/xxhash64 divergence (same name,
  * different semantics, name-check green). Prints each such name with
  * the class of the expression it resolves to, for manual semantic
  * review against the reference.
  *
  * Usage: runMain graft.tools.AuditNames /tmp/ref_all_names.txt
  */
object AuditNames {
  def main(args: Array[String]): Unit = {
    val refNames = Source.fromFile(args.headOption
      .getOrElse("/tmp/ref_all_names.txt")).getLines().map(_.trim)
      .filter(_.nonEmpty).toSeq

    val spark = GraftSession("graft-audit-names")
    val reg = spark.sessionState.functionRegistry
    val graftOwned = reg.listFunction().map(_.funcName.toLowerCase).toSet

    // builtin registry BEFORE graft registrations
    val builtin = org.apache.spark.sql.catalyst.analysis.FunctionRegistry
      .builtin.listFunction().map(_.funcName.toLowerCase).toSet

    val overlap = refNames.filter(builtin.contains).sorted
    println(s"[audit] ${refNames.size} reference names, " +
      s"${overlap.size} collide with Spark builtin names:")
    overlap.foreach { n =>
      val info = reg.lookupFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n))
      val cls = info.map(_.getClassName).getOrElse("?")
      val owner =
        if (cls.contains("graft")) "GRAFT-OVERRIDDEN"
        else "SPARK-BUILTIN    "
      println(f"[audit] $owner $n%-28s -> $cls")
    }
    spark.stop()
  }
}
