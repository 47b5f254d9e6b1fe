package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the ingest-time twin of the batch
  * `Temporal.eventFunnel`, on the same `flatMapGroupsWithState` +
  * event-time-timeout pattern as [[StreamingSessionize]]: per-key custom
  * state is the partially-completed step chain, and a key's state lives
  * until its funnel completes (emitted, removed) or the watermark passes
  * `t1 + windowSeconds` without completion (timed out, dropped) — state
  * is bounded by keys with an OPEN in-window funnel, independent of
  * stream length.
  *
  * Within a micro-batch, events sort by (ts, event_id) — the batch
  * operator's deterministic order. Step i counts at-or-after step i−1
  * (the `eventFunnel` chain rule) and each step keeps its earliest
  * qualifying time. The streaming trade, as documented on
  * [[StreamingSessionize]]: an in-horizon late event can only improve
  * steps going FORWARD from what the chain has already committed —
  * arriving after a later step was seen, it does not re-open that step's
  * earlier completion the way a full batch replay would. The batch
  * operator is the exact replay.
  */
object StreamingFunnel {

  case class Ev(user_id: Long, event_id: Long, event_type: String, se: Long,
      event_time: java.sql.Timestamp)
  /** times(i) = earliest qualifying epoch-second for step i, −1 = unseen */
  case class Chain(times: Seq[Long])
  case class Completion(
      user_id: Long, step_times: Seq[Long], conversion_s: Long)

  /** `events` needs `ts` (epoch seconds), `event_id`, `user_id`,
    * `event_type`. Emits one row per key when its LAST step first
    * completes (append mode); funnels with no completion inside
    * `windowSeconds` of their first step expire silently with the
    * watermark.
    */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      windowSeconds: Long = 7 * 86400,
      watermark: String = "1 hour"): Dataset[Completion] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    events
      .withColumn("event_time", expr("timestamp_seconds(ts)"))
      .withWatermark("event_time", watermark)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"),
        col("ts").cast("long").as("se"), col("event_time"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Chain, Completion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state) =>
          if (state.hasTimedOut) {
            // watermark passed t1 + window without completion: expire
            state.remove()
            Iterator.empty
          } else {
            val batch = it.toSeq.sortBy(e => (e.se, e.event_id))
            def merge(t0: Array[Long]): (Array[Long], Boolean) = {
              val t = t0
              var done = false
              for (e <- batch if !done; i <- stepIdx.get(e.event_type)) {
                val prevOk = i == 0 || (t(i - 1) >= 0 && e.se >= t(i - 1))
                val inWindow = i == 0 || e.se - t(0) <= windowSeconds
                if (prevOk && inWindow && (t(i) < 0 || e.se < t(i))) {
                  t(i) = e.se
                  if (i == steps.size - 1) done = true
                }
              }
              (t, done)
            }
            def deadline(t: Array[Long]) = (t.head + windowSeconds) * 1000L
            val (t1, done1) = merge(state.getOption.map(_.times.toArray)
              .getOrElse(Array.fill(steps.size)(-1L)))
            // The timeout is pinned to the FIRST step (the funnel window
            // opens at t.head, unlike sessionize whose base advances per
            // event), so an uncompleted chain whose deadline fell at or
            // behind the current watermark is DEAD — setting its timeout
            // would throw IllegalArgumentException and kill the query.
            // The batch's own events must not die with it: replay them
            // on a FRESH chain (a fresh first step restarts the funnel
            // in the same batch, not the next one — same inputs, same
            // output regardless of batching). A fresh chain can itself
            // be dead on arrival only via first-step events between the
            // late-event and eviction watermarks; the same guard drops
            // those — their window closed before anything could follow.
            val (t, done) =
              if (done1 || t1.forall(_ < 0) ||
                  deadline(t1) > state.getCurrentWatermarkMs()) (t1, done1)
              else merge(Array.fill(steps.size)(-1L))
            if (done) {
              state.remove()
              Iterator.single(
                Completion(uid, t.toSeq, t.last - t.head))
            } else {
              if (t.exists(_ >= 0) &&
                  deadline(t) > state.getCurrentWatermarkMs()) {
                state.update(Chain(t.toSeq))
                state.setTimeoutTimestamp(deadline(t))
              } else if (state.exists) {
                state.remove()
              }
              Iterator.empty
            }
          }
      }
  }
}
