package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism guard for CPU-heavy per-row derivations (round 16,
  * optimization guide §2.5 "Input skew: one huge unsplittable file …
  * repartition immediately after the read").
  *
  * The gate fixtures are ONE parquet file with ONE row group per table
  * (documents.parquet: 5 000 rows / 584 KB at sf0.1), so every scan is a
  * single task no matter how many cores the session has — and the text
  * operators do their expensive work (regex tokenize, shingle explode,
  * per-gram hashing) MAP-SIDE, before the first exchange. Measured with
  * ProfileBreakdown at sf0.1×32 cores: the tokenize/explode stage of
  * dd_minhash_lsh's verify-join broadcasts ran 0.86 s + 1.16 s on one
  * core each; tx_perplexity's trigram census 1.35 s; dd_decontaminate's
  * probe pass 0.89 s — all single-task.
  *
  * `bySize` inserts one small hash repartition right after the read so
  * that the derivation runs on every core. It is SIZE-GATED, not a local
  * tuning constant: it engages only while the source files are smaller
  * than (defaultParallelism × filesOpenCostInBytes) — exactly the regime
  * where Spark's own split math (maxSplitBytes ≥ openCostInBytes) cannot
  * produce one split per core. On a production-scale input the scan
  * already has ≥ cores splits, the gate is false, and the plan is
  * untouched — so this is a no-op at 100 TB by construction, not by
  * configuration.
  *
  * Correctness: repartitioning is a pure physical transform — every
  * downstream consumer here is an aggregation, join, or key-partitioned
  * window, none of which depend on partitioning or row order. The hash
  * keys make task assignment deterministic (no round-robin, so no
  * sort-before-repartition pass and no retry-sensitivity).
  */
object Spread {

  /** Total bytes of the file sources under `df`, or None when the plan
    * has no file source (in-memory spec frames) — which disables the
    * repartition and leaves those plans untouched.
    */
  private def sourceBytes(df: DataFrame): Option[Long] = {
    val files = df.inputFiles
    if (files.isEmpty) None
    else try {
      val conf = df.sparkSession.sessionState.newHadoopConf()
      Some(files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(conf).getFileStatus(p).getLen
      }.sum)
    } catch { case _: Throwable => None }
  }

  def bySize(df: DataFrame, key: Column*): DataFrame = {
    // streaming frames: repartition is illegal mid-stream and inputFiles
    // would force a batch analysis — pass through untouched
    if (df.isStreaming) return df
    val sess = df.sparkSession
    val p = sess.sparkContext.defaultParallelism
    val openCost = sess.sessionState.conf.filesOpenCostInBytes
    sourceBytes(df) match {
      case Some(bytes) if bytes < p.toLong * openCost =>
        df.repartition(p, key: _*)
      case _ => df
    }
  }
}
