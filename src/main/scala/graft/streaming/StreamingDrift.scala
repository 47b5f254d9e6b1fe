package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.TextAnalysis

/** Streaming ingest-drift gate — the ingest-time twin of the batch
  * `corpus_drift` query: every micro-batch of incoming documents is
  * PSI-scored against the accepted corpus's persisted top-K vocabulary
  * (`TextAnalysis.vocabTopK`, written once per corpus epoch) BEFORE the
  * batch is admitted, the way a production crawler gates a shifted
  * source.
  *
  * PSI is an aggregation over the batch, so the stream side cannot be a
  * stateless row map (the StreamingAnomaly shape) — the deployment form
  * is `foreachBatch`: the micro-batch is exactly the "new batch" of the
  * batch operator, and the gate body calls the SAME
  * [[TextAnalysis.driftAgainstVocab]] expression the batch query runs
  * (spec-asserted equal on MemoryStream), so a batch scores identically
  * at ingest and in replay. The static vocab is ≤ topK rows — broadcast
  * into each micro-batch plan; no streaming state store, no watermark:
  * each micro-batch is scored independently, which is the gate's
  * semantics (admit/flag THIS chunk).
  */
object StreamingDrift {

  /** One micro-batch's drift frame — [[TextAnalysis.driftAgainstVocab]]
    * verbatim; exposed so callers and the spec name the shared
    * expression.
    */
  def psiPerBatch(batch: DataFrame, vocab: DataFrame): DataFrame =
    TextAnalysis.driftAgainstVocab(vocab, batch)

  /** Headline PSI of one micro-batch: the summed `psi_contrib`
    * (conventionally ≳ 0.2 flags a shifted source). One scalar job over
    * ≤ topK rows.
    */
  def psiOf(drift: DataFrame): Double = {
    import org.apache.spark.sql.functions._
    // sum over zero rows is null (empty vocab artifact / empty batch) —
    // an ingest gate must report 0 drift, not die on getDouble(null)
    drift.agg(coalesce(round(sum(col("psi_contrib")), 6), lit(0.0)))
      .head().getDouble(0)
  }

  /** The gate as a ready-to-`start()` writer: `docs` is a STREAMING
    * frame with a `text` column; `onBatch` receives each micro-batch's
    * per-term drift frame and its batch id (log it, sink it, or abort
    * ingest when [[psiOf]] crosses the threshold).
    */
  def gate(
      docs: DataFrame,
      vocab: DataFrame,
      onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        onBatch(psiPerBatch(b, vocab), id)
      }
}
