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
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
      // events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
      // type — read as long and convert (Tables.scala).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
  }

  def apply(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
