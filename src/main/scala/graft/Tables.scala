package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loads the driver-generated parquet tables (TESTDATA.md) and registers
  * them as temp views so both the DataFrame API and `spark.sql` paths see
  * the same catalog — mirroring how the reference registers connector
  * tables via ConnectorMetadata
  * (reference: presto-spi/.../spi/connector/ConnectorMetadata.java:61).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table. `events.ts` is parquet TIMESTAMP(NANOS), which Spark
    * reads as a long (see GraftSession nanosAsLong); normalize it to a
    * microsecond timestamp here so every consumer sees a proper column.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view on this session, plus the
    * engine's Presto-named function layer. Idempotent.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
    graft.functions.GraftFunctions.registerAll(spark)
  }
}
