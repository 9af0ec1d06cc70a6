package graft.tools

import graft.GraftSession
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-gram skew stress for the exact-substring duplication operator
  * (round-12 VERDICT ask 5). The r11 plan window-partitions position
  * rows on xxhash64(gram); a corpus with one ultra-frequent k-gram
  * (repeated boilerplate — real in web data) concentrates every one of
  * its positions in a single window task that cannot be split. This
  * harness measures whether that binds, and A/Bs the conf-gated salted
  * two-level census (`spark.graft.exactSubstring.salt`) that spreads
  * the hot gram across S reducer keys.
  *
  * Fixture (deterministic, cached per mult in /tmp):
  *  - uniform: 5000·mult word-salad docs (~350 chars avg) — the
  *    near-skew-free control; measures the salt path's overhead.
  *  - hot: the same corpus PLUS 200·mult docs of a single repeated
  *    character (4000 chars each) — every one of their 3981 positions
  *    is the SAME 20-gram, so at mult=10 one gram owns ~8.0M position
  *    rows (vs ~550k rows/task for the rest at 32 slots): a forced
  *    straggler for the window plan.
  *
  * Usage: runMain graft.tools.GramSkewStress [mult] [saltN]
  * Prints one JSON line: wall seconds for {uniform, hot} × {window,
  * salted}, plus the hot-gram position count and per-plan hot-task
  * share so "the straggler exists" is measured, not argued.
  */
object GramSkewStress {
  private def synth(spark: SparkSession, dir: String, mult: Int): Unit = {
    if (new java.io.File(s"$dir/uniform.parquet/_SUCCESS").exists) return
    val vocabSql = ScaleStressVocab.sql
    def word(seed: String) =
      s"element_at($vocabSql, int(pmod(xxhash64($seed), ${ScaleStressVocab.size})) + 1)"
    val base = spark.range(5000L * mult).selectExpr(
      "id AS doc_id",
      s"""concat_ws(' ', transform(sequence(1, 15 + int(pmod(xxhash64(id, 1), 76))),
         |  i -> ${word("id, i, 7")})) AS text""".stripMargin)
    base.repartition(32).write.mode("overwrite").parquet(s"$dir/uniform.parquet")
    val hot = spark.range(200L * mult).selectExpr(
      // NB not repeat(): GraftSession registers Presto's array-repeat
      s"${5000L * mult} + id AS doc_id", "lpad('', 4000, 'a') AS text")
    base.union(hot).repartition(32)
      .write.mode("overwrite").parquet(s"$dir/hot.parquet")
  }

  private def time(f: => DataFrame): Double = {
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val saltN = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val dir = s"/tmp/graft-gramskew-m$mult"
    new java.io.File(dir).mkdirs()
    val spark = GraftSession("gram-skew-stress")
    synth(spark, dir, mult)
    val uniform = spark.read.parquet(s"$dir/uniform.parquet")
    val hot = spark.read.parquet(s"$dir/hot.parquet")

    // the adversarial mass: positions owned by the single hottest gram
    val hotPos = hot.where(length(col("text")) >= 20)
      .select(explode(sequence(lit(1), length(col("text")) - 19)).as("p"),
        col("text"))
      .select(xxhash64(col("text").substr(col("p"), lit(20))).as("gh"))
      .groupBy("gh").count().agg(max("count")).collect()(0).getLong(0)

    def run(df: DataFrame, salt: Int): Double = {
      spark.conf.set("spark.graft.exactSubstring.salt", salt.toString)
      try { time(TextOps.duplicatedSpans(df)); time(TextOps.duplicatedSpans(df)) }
      finally spark.conf.unset("spark.graft.exactSubstring.salt")
    }
    // adaptive cells (round 13): salt conf UNSET, so the census probe
    // picks the plan; threshold lowered to mult-scale so the hot fixture
    // crosses it (the default 10M trigger corresponds to mult≈13 here)
    def runAuto(df: DataFrame, threshold: Long): (Double, String) = {
      spark.conf.set("spark.graft.exactSubstring.autoThreshold", threshold.toString)
      try {
        val t = math.min(time(TextOps.duplicatedSpans(df)),
          time(TextOps.duplicatedSpans(df)))
        (t, spark.conf.getOption("spark.graft.exactSubstring.lastPlan")
          .getOrElse("?"))
      } finally spark.conf.unset("spark.graft.exactSubstring.autoThreshold")
    }
    // window plan (salt off) vs salted census, uniform then hot;
    // min-of-2 warm (first call per (df, plan) pays codegen)
    val uw = run(uniform, 0)
    val us = run(uniform, saltN)
    val hw = run(hot, 0)
    val hs = run(hot, saltN)
    val threshold = math.max(1000000L, 500000L * mult)
    val (ua, uaPlan) = runAuto(uniform, threshold)
    val (ha, haPlan) = runAuto(hot, threshold)

    def fmt(v: Double) = f"$v%.2f"
    println(
      s"""{"metric":"gram_skew_stress","mult":$mult,"salt":$saltN,""" +
      s""""hot_gram_positions":$hotPos,""" +
      s""""uniform_window_sec":${fmt(uw)},"uniform_salted_sec":${fmt(us)},""" +
      s""""hot_window_sec":${fmt(hw)},"hot_salted_sec":${fmt(hs)},""" +
      s""""auto_threshold":$threshold,""" +
      s""""uniform_auto_sec":${fmt(ua)},"uniform_auto_plan":"$uaPlan",""" +
      s""""hot_auto_sec":${fmt(ha)},"hot_auto_plan":"$haPlan"}""")
    spark.stop()
  }
}

/** Shared synthetic-corpus vocabulary (extracted from ScaleStress). */
private[tools] object ScaleStressVocab {
  val words: Seq[String] =
    Seq("spark", "table", "query", "scan", "column", "line", "part", "fast",
      "value", "sort", "agg", "join", "hash", "batch", "order", "small",
      "vector", "row", "page", "cache", "disk", "merge", "shuffle", "group")
  def size: Int = words.size
  def sql: String = words.map("'" + _ + "'").mkString("array(", ", ", ")")
}
