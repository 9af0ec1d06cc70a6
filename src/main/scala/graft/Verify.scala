package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional dev-only 3rd arg: only run queries with this name prefix
    // (the driver always passes exactly 2 args — full run)
    val only = args.drop(2).headOption
    CodegenFallbackGate.install()
    val spark = GraftSession("graft-verify")
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val decimalOut = scala.collection.mutable.ArrayBuffer.empty[String]
    val negZeroOut = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(q._1.startsWith))
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Representation gate (round-10 lesson): a DecimalType column in a
        // COMPARED result parquet is hash-doomed in the driver — it reads
        // the Spark side via pyarrow (decimal.Decimal objects) but fetches
        // the DuckDB oracle as float64, so even numerically-identical
        // values stringify differently. Project unscaled BIGINTs (exact)
        // or DOUBLE instead; flag loudly here so it never ships again.
        if (SparkEntry.oracleSql.contains(name) &&
            df.schema.exists(_.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])) {
          decimalOut += name
          System.err.println(s"[verify] DECIMAL OUTPUT GATE: $name ships a " +
            "DecimalType column in a compared result — the driver hash " +
            "WILL mismatch on representation; unscale to BIGINT or cast DOUBLE")
        }
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // Signed-zero gate (round-13 lesson, sibling of the DECIMAL gate):
        // the driver's value hash is representation-level and distinguishes
        // -0.0 from +0.0, while float == (and r13's local gate) does not —
        // fuzz_cmp_parity shipped locally-"green" and driver-red on exactly
        // this. Any -0.0 cell in a compared result is a hash hazard whenever
        // DuckDB's sign behavior differs (e.g. round: reference strips the
        // sign, DuckDB preserves it). Warn loudly; the copysign-aware
        // check_oracle.py compare is the hard gate. Top-level double/float
        // columns only — the one extra scan reads back the tiny coalesced
        // output, not the source tables.
        if (SparkEntry.oracleSql.contains(name)) {
          import org.apache.spark.sql.functions.{col, when, sum}
          import org.apache.spark.sql.types.{DoubleType, FloatType}
          val written = spark.read.parquet(s"$outDir/$name")
          val dbl = written.schema.fields
            .filter(f => f.dataType == DoubleType || f.dataType == FloatType)
            .map(_.name)
          if (dbl.nonEmpty) {
            val aggs = dbl.map { c =>
              // -0.0 detector via string form (sign-preserving; no 1/x
              // reciprocal trick — that throws DIVIDE_BY_ZERO under ANSI)
              sum(when(col(c).cast("double").cast("string") === "-0.0", 1L)
                .otherwise(0L)).as(c)
            }
            val row = written.agg(aggs.head, aggs.drop(1).toSeq: _*).collect()(0)
            dbl.zipWithIndex.foreach { case (c, i) =>
              if (!row.isNullAt(i) && row.getLong(i) > 0) {
                negZeroOut += s"$name.$c"
                System.err.println(s"[verify] SIGNED-ZERO GATE: $name column " +
                  s"$c ships ${row.getLong(i)} -0.0 cell(s) in a compared " +
                  "result — driver hash distinguishes -0.0 from +0.0; ensure " +
                  "the oracle longhand produces the SAME sign (normalize " +
                  "with `+ 0.0` if the engines' sign behavior differs)")
              }
            }
          }
        }
      }
      catch { case e: Throwable =>
        errors += name -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
        System.err.println(s"[verify] QUERY FAILED: $name — ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Explicit failure record: a throwing query must surface as an error,
    // never silently shrink the gate (round-1 lesson: agg_rollup vanished).
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_verify_errors.json"), errJson)
    if (errors.nonEmpty) {
      System.err.println(s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    }
    // Machine-emitted gate counts (round-9 lesson: hand-maintained
    // README/BENCHLOG counts kept lagging the machine truth) plus the
    // codegen-fallback standing gate. Full runs (no prefix filter) also
    // refresh GATE_COUNTS.md at the repo root — the file README cites
    // instead of inline numbers.
    val fallbacks = CodegenFallbackGate.fallbacks
    val oracle = SparkEntry.oracleSql.size
    val summary =
      s"""{"queries": ${SparkEntry.queries.size}, "oracle_compared": $oracle, """ +
      s""""rows_only": ${SparkEntry.queries.size - oracle}, """ +
      s""""verify_errors": ${errors.size}, "codegen_fallbacks": $fallbacks, """ +
      s""""decimal_outputs": ${decimalOut.size}, """ +
      s""""neg_zero_outputs": ${negZeroOut.size}}"""
    Files.writeString(Paths.get(s"$outDir/verify_summary.json"), summary)
    println(s"[verify] summary: $summary")
    if (fallbacks > 0) {
      System.err.println(s"[verify] CODEGEN FALLBACK GATE: $fallbacks ERROR " +
        "CodeGenerator events — a stage silently lost codegen; bisect the " +
        "expression change (see plans/SimplifyElementAt.scala for the recipe)")
    }
    if (only.isEmpty) {
      // Machine-derived round stamp (round-12 VERDICT ask 6: COVERAGE's
      // hand-written "(round 9)" header drifted for two rounds): the
      // driver drops CORRECTNESS_r{N}.json per completed round, so the
      // in-progress round is max(N)+1. Prose cites this file.
      val round = Option(new java.io.File(".").listFiles()).toSeq.flatten
        .flatMap(f => "^CORRECTNESS_r(\\d+)\\.json$".r
          .findFirstMatchIn(f.getName).map(_.group(1).toInt))
        .maxOption.map(_ + 1).getOrElse(1)
      Files.writeString(Paths.get("GATE_COUNTS.md"),
        s"""# Gate counts (machine-emitted — do not hand-edit)
           |
           |Written by `graft.Verify` on each full run; README cites this
           |file so prose counts can never drift from the gate.
           |
           |- build round (max driver CORRECTNESS_r\\*.json + 1): **$round**
           |- declared queries: **${SparkEntry.queries.size}**
           |- oracle-compared (DuckDB): **$oracle**
           |- rows-only (no SQL oracle; ScalaTest-spec-verified): **${SparkEntry.queries.size - oracle}**
           |- verify errors this run: **${errors.size}**
           |- codegen fallbacks this run: **$fallbacks**
           |- compared results shipping DecimalType (must be 0): **${decimalOut.size}**
           |- compared double/float columns with -0.0 cells (hash hazard; each needs an oracle-sign audit): **${negZeroOut.size}**${if (negZeroOut.nonEmpty) negZeroOut.mkString(" (", ", ", ")") else ""}
           |""".stripMargin)
    }
    spark.stop()
  }
}
