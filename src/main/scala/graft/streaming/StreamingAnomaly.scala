package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** Streaming anomaly scoring — the ingest-time twin of the batch
  * `events_anomaly` query: incoming events z-score against a REFERENCE
  * distribution computed from the accepted corpus (the stream-static
  * pattern of StreamingDedup's incremental ingest — the static side is
  * [[Temporal.anomalyStats]], ≤ #groups rows, broadcast into every
  * micro-batch; the stream side is a stateless map — no watermark, no
  * state store). Batch and stream share the SAME stats/z expressions,
  * so an event scores identically at ingest and in replay.
  *
  * Reference-vs-self is the semantic difference from the batch query
  * (which scores the corpus against its own distribution): at ingest
  * the distribution must come from history, not the open batch —
  * exactly how production monitoring baselines work.
  */
object StreamingAnomaly {

  /** `stream` needs `event_type` and `value`; `reference` is the static
    * history frame the distribution is fit on. Emits stream rows with
    * `z`, filtered to |z| ≥ `minZ` (pass 0 to score everything).
    */
  def scoreStream(
      stream: DataFrame,
      reference: DataFrame,
      minZ: Double = 2.5): DataFrame =
    stream
      .join(broadcast(Temporal.anomalyStats(reference)),
        col("event_type") === col("t"))
      .withColumn("z", round(Temporal.zScore(col("value")), 4))
      .where(abs(col("z")) >= minZ)
      .drop("t", "n", "sv", "svv")
}
