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

    // names whose SQL spelling is rewritten at the parser seam
    // (PrestoCallConventions / GraftSqlParser) — the registry still
    // shows the Spark builtin, by design: the Scala functions API keeps
    // Spark semantics there
    val parserSeam = Set(
      "log", "ln", "log2", "log10", "trim", "ltrim", "rtrim",
      "element_at", "regexp_extract", "regexp_extract_all",
      "regexp_replace", "split_part", "rand", "random", "typeof",
      "skewness", "kurtosis", "get_json_object", "map_concat",
      "normalize", "split", "date_add", "date_diff")

    val overlap = refNames.filter(builtin.contains).sorted
    println(s"[audit] ${refNames.size} reference names, " +
      s"${overlap.size} collide with Spark builtin names:")
    overlap.foreach { n =>
      val info = reg.lookupFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n))
      val cls = info.map(_.getClassName).getOrElse("?")
      val owner =
        if (cls.contains("graft")) "GRAFT-OVERRIDDEN"
        else if (parserSeam(n)) "PARSER-SEAM     "
        else "SPARK-BUILTIN    "
      println(f"[audit] $owner $n%-28s -> $cls")
    }
    val remaining = overlap.filterNot(parserSeam).filterNot { n =>
      reg.lookupFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(n))
        .exists(_.getClassName.contains("graft"))
    }
    println(s"[audit] ${remaining.size} resolve to untouched Spark builtins " +
      "(reviewed round 12: value-identical or sweep-pinned — COVERAGE.md audit clearance)")
    spark.stop()
  }
}
