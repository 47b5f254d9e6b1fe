package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming active-user counts — the ingest-time twin of the batch
  * `events_dau` DAU half: per event-time day window, the approximate
  * distinct user count. EXACT distinct aggregation is unsupported in a
  * streaming query (it would need unbounded per-window sets); the HLL++
  * sketch behind `approx_count_distinct` is the one distinct that
  * streams — hash-based and merge-associative, so the count is
  * partition- and arrival-order independent and a day's streamed figure
  * equals the batch expression on the same rows (spec-asserted). The
  * batch operator (`Temporal.activeUsers`) remains the exact replay;
  * this is the live dashboard feed, the same exact-batch/approx-stream
  * split as `corpus_profile` vs `profile_approx`.
  *
  * State: one sketch per open day window (~1.5 KB at 5 % rsd), evicted
  * by the watermark — bounded by open windows, independent of stream
  * length or user cardinality.
  */
object StreamingActive {

  /** `events` needs `ts` (epoch seconds) and `user_id`. Emits one row
    * per closed day window in append mode (or updating rows in
    * update/complete mode): window start, approximate distinct actives,
    * event count.
    */
  def dailyActive(
      events: DataFrame,
      watermark: String = "2 hours",
      rsd: Double = 0.05): DataFrame =
    events
      .withColumn("event_time", expr("timestamp_seconds(ts)"))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 day").as("w"))
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("dau_approx"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").cast("long").as("day_start"),
        col("dau_approx"), col("n_events"))
}
