package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write path (CTAS/INSERT/partitioned layout) + multimodal binary ops. */
class WriteMultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSession.sf)

  test("ctas + insert + readback round-trips through the catalog") {
    val r = run("wr_ctas_insert").collect()(0)
    val docs = spark.table("documents").count()
    // survivors + 1 sentinel row; total_copies = all docs
    assert(r.getAs[Long]("total_copies") == docs)
    assert(r.getAs[Long]("n_rows") > 0)
  }

  test("partitioned write prunes partitions on read-back") {
    val out = s"${sys.props("java.io.tmpdir")}/graft-write/docs_by_source"
    run("wr_partitioned_prune").collect() // executes the write + read
    val plan = spark.read.parquet(out)
      .filter(col("source") === "web")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("source"),
      s"expected partition pruning in plan:\n$plan")
  }

  test("delete-as-rewrite removes exactly the targeted rows") {
    val r = run("wr_delete_rewrite").collect()(0)
    val expected = spark.table("orders").filter(col("o_orderstatus") =!= "F").count()
    assert(r.getAs[Long]("n_kept") == expected)
  }

  test("multimodal payload stats are exact byte counts") {
    val rows = run("mm_binary_stats").collect()
    assert(rows.map(_.getAs[String]("modality")).toSet == Set("image", "audio", "video"))
    val total = rows.map(_.getAs[Long]("total_bytes")).sum
    val exact = spark.table("documents")
      .agg(sum(length(encode(col("text"), "UTF-8")))).collect()(0).getLong(0)
    assert(total == exact)
  }

  test("stub decode emits full metadata schema, frame sampling covers payload") {
    val meta = run("mm_decode_meta")
    assert(meta.columns.toSeq == Seq("media_id", "width", "height", "format"))
    assert(meta.collect().forall { r =>
      r.getAs[Int]("width") >= 16 && r.getAs[Int]("height") >= 16 &&
        Set("png", "wav", "mp4").contains(r.getAs[String]("format"))
    })
    val frames = run("mm_frame_sample").collect()
    assert(frames.forall { r =>
      val n = r.getAs[Int]("n_frames")
      n > 0 && r.getAs[Int]("n_sampled") == (n + 3) / 4
    })
  }

  test("fake feature extraction is deterministic across runs") {
    val a = run("mm_features").collect().map(r => (r.getLong(0), r.getDouble(3)))
    val b = run("mm_features").collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(a.sameElements(b))
    assert(a.nonEmpty && a.forall(_._2 >= 0.0))
  }
}
