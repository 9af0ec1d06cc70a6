package graft.streaming

import graft.QueryGroup
import org.apache.spark.sql.functions._

/** Typed rows for the custom-state operators (Dataset[T] + Encoder
  * surface; SURVEY.md §1.2 "Dataset[T] where type safety helps").
  */
case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
case class SessionOut(
    user_id: Long, session_start: java.sql.Timestamp,
    n_events: Long, total_value: Double)

/** One open session per user — the O(1) state of the streaming
  * sessionizer (same bound as the batch walk's accumulator).
  */
case class OpenSession(
    start: java.sql.Timestamp, lastMs: Long, n: Long, total: Double)

/** Event-time windowing over the `events` table. The reference engine has
  * no streaming semantics at all (SURVEY.md §2.11 — Kafka topics are just
  * scanned as tables), so this surface is pure Spark Structured-Streaming
  * vocabulary: tumbling/sliding/session windows. Here they run in batch
  * mode (the same `window()`/`session_window()` operators Structured
  * Streaming uses); StreamingSpec drives the identical aggregation through
  * readStream→writeStream and asserts batch ≡ streaming results.
  */
object EventOps extends QueryGroup {

  /** Streaming twin of the custom batch sessionizer
    * (`ev_custom_sessionize`): flatMapGroupsWithState with an EVENT-TIME
    * timeout — the KeyValueGroupedDataset surface for session semantics
    * `session_window()` can't express (per-event accumulation, custom
    * close conditions). Per-user state is ONE [[OpenSession]] accumulator;
    * a session emits when a batch shows a > gap jump, or when the
    * watermark passes lastTs + gap with no successor (timeout). Events
    * within a micro-batch are sorted (bounded by batch size, not by user
    * history); late events beyond the watermark are dropped by the
    * runtime before reaching state — the standard event-time contract.
    */
  def streamingSessionize(events: org.apache.spark.sql.Dataset[Ev],
      gapMinutes: Int, lateness: String): org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val gapMs = gapMinutes.toLong * 60000
    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.start, s.n, s.total))
          } else {
            val sorted = evs.toArray.sortBy(_.ts.getTime)
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption.orNull
            sorted.foreach { e =>
              if (cur != null && e.ts.getTime - cur.lastMs > gapMs) {
                out += SessionOut(uid, cur.start, cur.n, cur.total)
                cur = null
              }
              if (cur == null) cur = OpenSession(e.ts, e.ts.getTime, 0L, 0.0)
              cur = cur.copy(lastMs = e.ts.getTime, n = cur.n + 1,
                total = cur.total + e.value)
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.lastMs + gapMs + 1)
            }
            out.iterator
          }
      }
  }

  def defs = Seq(
    // tumbling 1-hour windows (≙ readStream + withWatermark + window())
    q("ev_tumbling_window",
      """SELECT CAST(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin) { (s, _) =>
      s.table("events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total_value"))
        .orderBy("window_start", "event_type")
    },

    // sliding windows: 1 hour length, 15-minute slide (each event lands in
    // 4 windows — oracle reproduces that via an offset cross join)
    q("ev_sliding_window",
      """SELECT CAST(time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
        |         - k * INTERVAL '15 minutes' AS TIMESTAMP) AS window_start,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) offsets(k)
        |GROUP BY 1
        |ORDER BY window_start""".stripMargin) { (s, _) =>
      s.table("events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .select(col("window.start").as("window_start"), col("n"), col("total_value"))
        .orderBy("window_start")
    },

    // session windows with a 30-minute gap per user
    // (≙ session_window() in streaming; oracle is the classic
    // gaps-and-islands rewrite)
    q("ev_session_window",
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM sessions
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, _) =>
      s.table("events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"), col("total_value"))
        .orderBy("user_id", "session_start")
    },

    // event-time join: each event enriched with its user's previous event
    // (streaming analog: stream-stream join with watermark; batch twin here)
    q("ev_lag_enrich",
      """SELECT event_id, user_id, event_type,
        |  CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP) AS prev_ts,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, _) =>
      s.sql("""SELECT event_id, user_id, event_type,
              |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
              |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
              |FROM events
              |ORDER BY event_id""".stripMargin)
    },

    // custom per-key stateful operator: imperative sessionization — the
    // escape hatch for session semantics SQL can't express (here: a
    // 20-minute gap, different from ev_session_window's 30, to prove it's
    // a separate code path). The streaming twin (mapGroupsWithState) is
    // exercised in StreamingSpec.
    // Scale: secondary sort — repartition on user_id + sortWithinPartitions
    // (user_id, ts), then ONE streaming pass per partition holding a
    // single open-session accumulator. No per-user materialization at all
    // (a groupByKey+flatMapGroups toArray would buffer a whole user's
    // history — the skew hazard when one key has 100 M events); the sort
    // spills to disk under memory pressure, the walk is O(1) memory.
    q("ev_custom_sessionize",
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '20 minutes' THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM sessions
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, _) =>
      import s.implicits._
      val gapMs = 20L * 60 * 1000
      s.table("events").select(col("user_id"), col("ts"), col("value")).as[Ev]
        .repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts"))
        .mapPartitions { rows =>
          new Iterator[SessionOut] {
            private var uid = 0L
            private var start: java.sql.Timestamp = null
            private var lastMs = Long.MinValue
            private var n = 0L
            private var total = 0.0
            private var pending: SessionOut = null

            private def close(): SessionOut = {
              val out = SessionOut(uid, start, n, total)
              start = null
              out
            }

            // advance until a session closes (new user / gap) or input ends
            private def fill(): Unit = {
              while (pending == null && rows.hasNext) {
                val e = rows.next()
                if (start != null && (e.user_id != uid || e.ts.getTime - lastMs > gapMs))
                  pending = close() // close() clears start, so e opens fresh below
                if (start == null) { uid = e.user_id; start = e.ts; n = 0L; total = 0.0 }
                lastMs = e.ts.getTime; n += 1; total += e.value
              }
              if (pending == null && start != null && !rows.hasNext) pending = close()
            }

            override def hasNext: Boolean = { fill(); pending != null }
            override def next(): SessionOut = {
              fill()
              val out = pending
              pending = null
              out
            }
          }
        }
        .withColumn("total_value", round(col("total_value"), 2))
        .orderBy("user_id", "session_start")
    },

    // ── streaming exact dedup, batch twin: an at-least-once feed
    // (every 7th event redelivered as an identical copy) collapses back
    // to exactly-once via dropDuplicates on the event id — the batch
    // face of readStream.withWatermark(...).dropDuplicates("event_id"),
    // which StreamingSpec drives through a real stream and pins equal.
    // At scale this is one hash-shuffle on event_id with watermark-
    // bounded state; the copies are byte-identical, so DISTINCT * and
    // id-keyed dedup agree and the DuckDB oracle is exact. ──
    q("ev_stream_dedup",
      """WITH feed AS (
        |  SELECT * FROM events
        |  UNION ALL
        |  SELECT * FROM events WHERE event_id % 7 = 0
        |),
        |deduped AS (SELECT DISTINCT * FROM feed)
        |SELECT event_type, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM deduped
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, _) =>
      val events = s.table("events")
      val feed = events.unionAll(events.filter(col("event_id") % 7 === 0))
      feed.dropDuplicates("event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"))
        .orderBy("event_type")
    },

    // ── stream-stream interval join, batch twin: every view joined to
    // the same user's clicks within the next 30 minutes — the
    // attribution shape. In streaming this is the watermarked
    // stream-stream inner join (state bounded by the interval + both
    // watermarks); StreamingSpec drives it through two readStreams and
    // pins the pair set equal. At scale: one shuffle per side on
    // user_id, state size O(events inside the watermark horizon). ──
    q("ev_interval_join",
      """SELECT a.user_id, a.event_id AS view_id, b.event_id AS click_id,
        |  date_diff('second', a.ts, b.ts) AS gap_s
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        |  AND a.event_type = 'view' AND b.event_type = 'click'
        |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        |ORDER BY a.user_id, view_id, click_id""".stripMargin) { (s, _) =>
      val ev = s.table("events")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("ts_a"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("ts_b"))
      views.join(clicks, Seq("user_id"))
        .filter(col("ts_b") >= col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 30 MINUTE"))
        .select(col("user_id"), col("view_id"), col("click_id"),
          (unix_timestamp(col("ts_b")) - unix_timestamp(col("ts_a"))).as("gap_s"))
        .orderBy("user_id", "view_id", "click_id")
    },

    // JSON props extraction + grouped agg (events carry a JSON payload)
    q("ev_props_agg",
      """SELECT event_type,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
        |  count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, _) =>
      s.table("events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(round(avg("k"), 4).as("avg_k"), max("k").as("max_k"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ── Kafka topic-as-table contract, bounded (no broker in env) ──
    // The reference scans a topic as a table whose rows carry the
    // consumer-visible metadata columns — _partition_id,
    // _partition_offset, _message, _key, _timestamp (reference:
    // presto-kafka/.../KafkaRecordSet.java:52, column set in
    // KafkaInternalFieldDescription.java) — and parallelizes scans by
    // OFFSET RANGE per partition (KafkaSplitManager.java). This query
    // reproduces that contract over the events fixture: the keyed
    // producer partitioner is pmod(key, 4), per-partition offsets are a
    // dense monotone sequence in arrival (event-time, id-tiebroken)
    // order, the payload is the JSON message, and the consumer reads one
    // bounded offset split per partition — exactly the split-by-offset
    // shape — validating offset bookkeeping and payload decode against
    // the DuckDB twin. On a real deployment the same query text runs on
    // Spark's Kafka source (readStream.format("kafka") exposes the
    // identical partition/offset/key/value/timestamp columns).
    q("ev_topic_table",
      """WITH topic AS (
        |  SELECT user_id % 4 AS _partition_id,
        |    row_number() OVER (PARTITION BY user_id % 4
        |                       ORDER BY ts, event_id) - 1 AS _partition_offset,
        |    CAST(user_id AS VARCHAR) AS _key, props AS _message, ts AS _timestamp
        |  FROM events)
        |SELECT _partition_id, count(*) AS n,
        |  min(_partition_offset) AS first_offset,
        |  max(_partition_offset) AS last_offset,
        |  round(avg(CAST(json_extract_string(_message, '$.k') AS INTEGER)), 4) AS avg_k,
        |  min(CAST(_timestamp AS TIMESTAMP)) AS first_ts
        |FROM topic
        |WHERE _partition_offset BETWEEN 100 AND 349
        |GROUP BY _partition_id
        |ORDER BY _partition_id""".stripMargin) { (s, _) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_partition_id")).orderBy(col("_timestamp"), col("event_id"))
      val topic = s.table("events").select(
        pmod(col("user_id"), lit(4)).as("_partition_id"),
        col("event_id"),
        col("user_id").cast("string").as("_key"),
        col("props").as("_message"),
        col("ts").as("_timestamp"))
        .withColumn("_partition_offset", row_number().over(w) - 1)
      topic
        .filter(col("_partition_offset").between(100, 349))
        .groupBy("_partition_id")
        .agg(count(lit(1)).as("n"),
          min("_partition_offset").as("first_offset"),
          max("_partition_offset").as("last_offset"),
          round(avg(get_json_object(col("_message"), "$.k").cast("int")), 4).as("avg_k"),
          min("_timestamp").as("first_ts"))
        .orderBy("_partition_id")
    },
  )
}
