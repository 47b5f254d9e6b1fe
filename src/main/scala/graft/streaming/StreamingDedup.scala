package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-time twin of
  * `TextAnalysis.dedupExact`: drop any document whose content digest was
  * already seen within the watermark horizon.
  *
  * Scale notes: state is one (digest → timestamp) entry per distinct
  * document inside the watermark window — `dropDuplicatesWithinWatermark`
  * evicts entries older than the watermark, so state size is bounded by
  * the ingest rate × horizon, independent of stream length. Keying on the
  * 16-byte md5 (not the text) keeps the state store and the dedup shuffle
  * payload-free — the same trick the batch operator uses.
  */
object StreamingDedup {

  /** `docs` needs `ts` (epoch seconds), `doc_id`, `text`. Works on a
    * streaming frame (readStream / MemoryStream); first occurrence of
    * each digest within the horizon is emitted, later copies are dropped.
    */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("event_time", expr("timestamp_seconds(ts)"))
      .withWatermark("event_time", watermark)
      .withColumn("text_md5", md5(col("text")))
      .dropDuplicatesWithinWatermark("text_md5")

  /** Stream-static incremental dedup — the streaming twin of
    * [[graft.operators.Dedup.incrementalDedup]]: the in-horizon
    * within-stream dedup above PLUS a left_anti join against the ACCEPTED
    * corpus's fingerprints, so re-crawls of already-ingested content never
    * reach the sink. Pass a persisted fingerprint table (a frame with a
    * `text_md5` column) to keep the static side payload-free; a raw
    * documents frame is fingerprinted in place. Stream-static left_anti
    * executes per micro-batch with the static side broadcast when small;
    * the only streaming state is the within-stream dedup store, still
    * bounded by ingest rate × horizon.
    */
  def ingestStream(
      docs: DataFrame, existing: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val seen =
      if (existing.columns.contains("text_md5"))
        existing.select("text_md5").distinct()
      else existing.select(md5(col("text")).as("text_md5")).distinct()
    dedupStream(docs, watermark).join(seen, Seq("text_md5"), "left_anti")
  }
}
