package graft

/** Benchmark main, mirroring the reference's protocol (BASELINE.md:
  * prewarm runs then measured runs, median per query — reference
  * presto-benchto-benchmarks tpch.yaml:3-4 uses 2 prewarm + 6 measured;
  * we default to 1+3 to keep a full sweep inside the driver's budget,
  * overridable via SPARK_GRAFT_BENCH_RUNS / SPARK_GRAFT_PREWARM).
  * Prints ONE JSON line the driver collects into BENCH_r{N}.json.
  */
object Bench {

  /** Headline queries: the TPC-H-style core plus one representative of
    * each extension family (dedup, similarity, text, event windows).
    */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q03_shipping_priority", "q05_local_supplier",
    "q06_revenue_forecast", "q09_product_profit", "q13_customer_distribution",
    "q18_large_orders", "q21_suppliers_waiting",
    "win_topn_per_group", "agg_grouping_sets",
    "dd_exact", "dd_minhash_lsh", "dd_simhash", "sim_cosine_topk",
    "sim_lsh_ann", "tx_stats", "ev_sliding_window", "ev_custom_sessionize",
    // fn_histogram_map (not fn_approx_set_hll): the HLL query's cost is
    // its exact-count verification subqueries, not the sketch itself —
    // the histogram aggregate is the representative sketch-path op
    "fn_checksum", "fn_histogram_map",
    // round-3 op: grid-bucketed spatial join. (fn_tdigest is NOT here
    // for the same reason as fn_approx_set_hll: its runtime is the
    // exact-percentile verification subqueries, not the sketch.)
    "spatial_distance_join",
    // round-4 ops: the real q02/q11 shapes over the synthesized partsupp,
    // and incremental LSH ingestion against the persisted band index
    // (its first execution builds the index; the measured warm runs are
    // the recurring day-N cost)
    "q02_min_cost_supplier", "q11_important_stock", "dd_incremental_minhash")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val prewarm = sys.env.getOrElse("SPARK_GRAFT_PREWARM", "1").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession("graft-bench")

    def execute(name: String): Double = {
      val t0 = System.nanoTime()
      // noop sink: full execution, no driver-side collection
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      val timing =
        try {
          (1 to prewarm).foreach(_ => execute(name))
          val times = (1 to runs).map(_ => execute(name)).sorted
          times(times.size / 2) // median
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
        }
      name -> timing
    }

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
