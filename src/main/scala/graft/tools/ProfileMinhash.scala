package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Dev profiler: times each stage of the minhash pipeline at a given SF. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession("profile-minhash")
    Tables.register(spark, dir)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }

    val docs = spark.table("documents")
    val sh = TextOps.withShingles(docs).select(col("doc_id"), col("shingles"))
    time("sh rows")(sh.count())
    time("sh forced (sum sizes)")(sh.select(sum(size(col("shingles")))).collect()(0).getLong(0))
    val exploded = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    time("exploded+hash")(exploded.count())
    val permed = exploded.select(
      col("doc_id") +: (0 until 64).map(i => xxhash64(lit(i), col("h")).as(s"p$i")): _*)
    time("permed")(permed.count())
    val sig = permed.groupBy("doc_id")
      .agg((0 until 64).map(i => min(s"p$i").as(s"s$i")).head,
           (1 until 64).map(i => min(s"p$i").as(s"s$i")): _*)
    time("sig")(sig.count())
    val bandKeys = (0 until 16).map { b =>
      xxhash64(lit(b) +: (0 until 4).map(r => col(s"s${b * 4 + r}")): _*)
    }
    val banded = sig.select(col("doc_id"), explode(array(bandKeys: _*)).as("band_key"))
    val buckets = banded.groupBy("band_key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    time("buckets")(buckets.count())
    val pairs = buckets
      .select(posexplode(col("ids")).as(Seq("i", "doc_a")), col("ids"))
      .select(col("doc_a"), explode(slice(col("ids"), col("i") + 2, size(col("ids")))).as("doc_b"))
      .distinct()
    time("pairs")(pairs.count())
    time("full minhashPairs")(TextOps.minhashPairs(docs).count())
    spark.stop()
  }
}
