package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins semantics that can't be oracle-checked by hash equality:
  * approximate sketches (error-bound assertions, per SURVEY.md §7.3) and
  * sampling.
  */
class AggSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("approx_count_distinct within 3 sigma of its configured rsd") {
    Tables.register(spark, TestSession.sf)
    // rsd set explicitly (default is 5%, so a 5% assertion is a coin flip
    // — round-1 lesson); 3σ at rsd=0.01 → 3% bound
    val rows = spark.table("lineitem")
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()(0)
    val (a, e) = (rows.getLong(0).toDouble, rows.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.03, s"approx=$a exact=$e")
  }

  test("percentile_approx close to exact percentile") {
    Tables.register(spark, TestSession.sf)
    val r = spark.table("lineitem")
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"),
        percentile(col("l_extendedprice"), lit(0.5)).as("exact"))
      .collect()(0)
    val (a, e) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(a - e) / e < 0.02, s"approx=$a exact=$e")
  }

  test("bernoulli sample fraction is plausible") {
    Tables.register(spark, TestSession.sf)
    val total = spark.table("lineitem").count().toDouble
    val sampled = spark.table("lineitem").sample(false, 0.1, 42L).count().toDouble
    assert(sampled > total * 0.05 && sampled < total * 0.15,
      s"sampled=$sampled of $total")
  }
}
