package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming sessionization — the ingest-time twin of the batch
  * `Temporal.sessionize`, built on `flatMapGroupsWithState` with an
  * event-time timeout: per-key custom state (the open session) lives
  * exactly until the watermark passes its close deadline, so state size
  * is bounded by ACTIVE keys, independent of stream length — the
  * `KeyValueGroupedDataset` custom-state pattern for semantics no
  * built-in streaming operator expresses.
  *
  * A session closes two ways: a later event of the same key arrives more
  * than `gapSeconds` after the session end (closed inline, new session
  * opens), or the watermark passes end + gap with no successor
  * (event-time timeout fires and flushes it). Within a micro-batch,
  * events sort by (ts, event_id) — same deterministic order as batch.
  * In-horizon late events merge into the open session by extending its
  * bounds (a session already flushed by timeout is final — the streaming
  * trade the watermark defines; the batch operator is the exact
  * replay).
  */
object StreamingSessionize {

  // event_time carries the watermark through to flatMapGroupsWithState
  // (the column must stay in the frame for event-time timeout support)
  case class Ev(user_id: Long, event_id: Long, se: Long, event_time: java.sql.Timestamp)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class Session(
      user_id: Long, session_start_s: Long, session_end_s: Long,
      n_events: Long, duration_s: Long)

  /** `events` needs `ts` (epoch seconds), `event_id`, `user_id`. Emits one
    * row per CLOSED session (append mode).
    */
  def sessionize(
      events: DataFrame,
      gapSeconds: Long = 1800,
      watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_time", expr("timestamp_seconds(ts)"))
      .withWatermark("event_time", watermark)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("ts").cast("long").as("se"), col("event_time"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap with no successor: flush and drop
            val s = state.get
            state.remove()
            Iterator.single(Session(uid, s.start, s.end, s.n, s.end - s.start))
          } else {
            val batch = it.toSeq.sortBy(e => (e.se, e.event_id))
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            for (e <- batch) cur match {
              case Some(s) if e.se - s.end > gapSeconds =>
                closed += Session(uid, s.start, s.end, s.n, s.end - s.start)
                cur = Some(OpenSession(e.se, e.se, 1))
              case Some(s) =>
                cur = Some(OpenSession(
                  math.min(s.start, e.se), math.max(s.end, e.se), s.n + 1))
              case None =>
                cur = Some(OpenSession(e.se, e.se, 1))
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.end + gapSeconds) * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** The BUILT-IN form of the same sessionization — Spark's
    * `session_window` gap aggregation: when the per-session result is
    * expressible as an aggregate (count/sum/min/max — no custom emit
    * logic), prefer this over the custom-state operator above: the
    * engine owns the state store, merges overlapping windows itself, and
    * the same expression runs batch or streaming unchanged. The custom
    * flatMapGroupsWithState form above remains for semantics aggregation
    * can't express (inline close-then-reopen emission, per-event chain
    * rules). Session bounds differ from [[sessionize]] only in form:
    * `session_window` closes at last-event + gap, so the emitted end is
    * `end + gap` — callers get the same sessions, offset convention
    * documented here.
    */
  def sessionAgg(
      events: DataFrame,
      gapSeconds: Long = 1800,
      watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("event_time", expr("timestamp_seconds(ts)"))
      .withWatermark("event_time", watermark)
      .groupBy(col("user_id"),
        session_window(col("event_time"), s"$gapSeconds seconds").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start_s"),
        max(col("ts")).as("session_end_s"))
      .select(col("user_id"), col("session_start_s"), col("session_end_s"),
        col("n_events"),
        (col("session_end_s") - col("session_start_s")).as("duration_s"))
}
