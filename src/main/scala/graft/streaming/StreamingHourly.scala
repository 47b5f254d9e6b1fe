package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming twin of the batch `events_hourly` query
  * (SURVEY.md §2 "streaming ingest"): the same logical aggregation runs
  * over a stream (`spark.readStream` / MemoryStream) or a batch frame —
  * one definition, two execution modes, which is the Spark way to keep
  * batch and streaming results consistent.
  *
  * Scale notes: the watermark bounds state (windows older than the
  * watermark are finalized and evicted), so state size is
  * O(active windows × event types), independent of stream length. The
  * aggregation is partial (map-side combine) before the window shuffle.
  */
object StreamingHourly {

  /** Hourly windowed aggregation. `events` needs columns
    * `ts` (epoch-nanos long — the testdata encoding), `event_type`,
    * `value`. Works on both streaming and batch frames; the watermark is a
    * no-op in batch mode. `slide` < window length turns it into a
    * SLIDING aggregation (each event lands in window/slide overlapping
    * windows — the streaming twin of the batch `events_sliding` query);
    * the default equals the window, i.e. tumbling.
    */
  def hourlyAgg(
      events: DataFrame,
      watermark: String = "2 hours",
      windowLen: String = "1 hour",
      slide: String = "1 hour"): DataFrame =
    events
      .withColumn("event_time", expr("timestamp_seconds(ts DIV 1000000000)"))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen, slide), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))
}
