package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming parity: the same tumbling-window aggregation run
  * through readStream → writeStream(memory) must equal the batch result
  * (SURVEY.md §2.11 — the streaming surface is a strict extension, so the
  * batch query is its own oracle).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("streaming tumbling window equals batch window") {
    // readStream requires a DIRECTORY of files; stage the single events
    // parquet file into a temp dir (round 1 pointed at the file itself and
    // the test never ran)
    val stageDir = java.nio.file.Files.createTempDirectory("graft-stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSession.sf}/events.parquet"),
      stageDir.resolve("events.parquet"))
    val batchRaw = spark.read.parquet(stageDir.toString)
    val stream = spark.readStream.schema(batchRaw.schema).parquet(stageDir.toString)

    def normalize(df: org.apache.spark.sql.DataFrame) = {
      val withTs =
        if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else df
      withTs
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("total_value"))
    }

    val q = normalize(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_out")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streaming = spark.table("stream_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = normalize(batchRaw).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streaming == batch)
    assert(streaming.nonEmpty)
  }

  test("mapGroupsWithState running count equals batch groupBy count") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import spark.implicits._
    val stageDir = java.nio.file.Files.createTempDirectory("graft-stream-state")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSession.sf}/events.parquet"),
      stageDir.resolve("events.parquet"))
    val batchRaw = spark.read.parquet(stageDir.toString)
    val toTyped = (df: org.apache.spark.sql.DataFrame) => {
      val withTs =
        if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else df
      withTs.select(col("user_id"), col("ts"), col("value"))
        .as[graft.streaming.Ev]
    }
    // custom per-key state: running event count via mapGroupsWithState —
    // the KeyValueGroupedDataset custom-state surface the brief names
    val counts = toTyped(
      spark.readStream.schema(batchRaw.schema).parquet(stageDir.toString))
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[graft.streaming.Ev],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + evs.size
          state.update(next)
          (uid, next)
      }
    val q = counts.writeStream
      .outputMode("update").format("memory").queryName("state_out").start()
    try q.processAllAvailable()
    finally q.stop()
    // last update per user must equal the batch count
    val streaming = spark.table("state_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    val batch = toTyped(batchRaw).groupByKey(_.user_id).count().collect().toMap
    assert(streaming == batch)
    assert(streaming.nonEmpty)
  }
}
