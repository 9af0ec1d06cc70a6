package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** One-order-of-magnitude corpus synthesizer (round-15 verdict ask #8):
  * replicates the sf0.1 fixture MULT times with DISJOINT key ranges so
  * the full 46-query headline set runs at ~sf1 (6M lineitem). Key
  * shifts keep every join relationship intact (foreign keys shift by
  * the same stride as their parents); region/nation stay fixed (dims).
  * Documents/embeddings replicate with shifted ids — near-dup queries
  * see a 10x duplicate-saturated corpus, which is exactly the
  * bucket-cap stress the operators are designed for.
  *
  * Usage: runMain graft.tools.SfScale [mult] [outDir]
  */
object SfScale {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val out = args.lift(1).getOrElse(s"/tmp/graft-sf1")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("graft-sfscale")
    if (new java.io.File(s"$out/_DONE").exists) {
      println(s"[sfscale] cached corpus at $out"); spark.stop(); return
    }

    def load(n: String): DataFrame = Tables.load(spark, src, n)

    def strideOf(df: DataFrame, key: String): Long =
      df.agg(max(col(key).cast("long"))).collect()(0).getLong(0) + 1

    // replicate df MULT times shifting the named LONG key columns by
    // rep*stride (stride = parent table's key stride)
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val reps = spark.range(0, mult).withColumnRenamed("id", "graft_rep")
      val crossed = df.crossJoin(broadcast(reps))
      shifts.foldLeft(crossed) { case (d, (c, stride)) =>
        // preserve the column's dtype (an int key stays int — the x10
        // ranges fit; a silent int->long widening would drift the schema)
        d.withColumn(c, (col(c).cast("long") + col("graft_rep") * lit(stride))
          .cast(df.schema(c).dataType))
      }.drop("graft_rep")
    }

    def write(n: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[sfscale] $n written")
    }

    val customer = load("customer"); val orders = load("orders")
    val lineitem = load("lineitem"); val part = load("part")
    val supplier = load("supplier")
    val custStride = strideOf(customer, "c_custkey")
    val ordStride = strideOf(orders, "o_orderkey")
    val partStride = strideOf(part, "p_partkey")
    val suppStride = strideOf(supplier, "s_suppkey")

    write("region", load("region"))
    write("nation", load("nation"))
    write("customer", replicate(customer, Map("c_custkey" -> custStride)))
    write("supplier", replicate(supplier, Map("s_suppkey" -> suppStride)))
    write("part", replicate(part, Map("p_partkey" -> partStride)))
    write("orders", replicate(orders,
      Map("o_orderkey" -> ordStride, "o_custkey" -> custStride)))
    write("lineitem", replicate(lineitem,
      Map("l_orderkey" -> ordStride, "l_partkey" -> partStride,
        "l_suppkey" -> suppStride)))
    val docs = load("documents")
    write("documents", replicate(docs,
      Map("doc_id" -> strideOf(docs, "doc_id"))))
    val emb = load("embeddings")
    write("embeddings", replicate(emb,
      Map("vec_id" -> strideOf(emb, "vec_id"))))
    val ev = load("events")
    write("events", replicate(ev,
      Map("event_id" -> strideOf(ev, "event_id"),
        "user_id" -> (ev.agg(max(col("user_id").cast("long"))).collect()(0).getLong(0) + 1))))
    java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$out/_DONE"))
    println(s"[sfscale] corpus x$mult at $out")
    spark.stop()
  }
}
