package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming corpus cleaning — the ingest-time twin of the batch
  * `corpus_clean` pipeline (SparkEntry): quality gate → content-digest
  * dedup within the watermark horizon → deterministic hash sample, as one
  * streaming query.
  *
  * The stateless stages (quality, sample) are literally the batch column
  * expressions (`TextAnalysis.passesQuality`, `TextAnalysis.hashSample`) —
  * one definition, both execution modes. Only the dedup stage changes
  * shape: batch keeps the min-doc_id copy per digest, a stream keeps the
  * FIRST-ARRIVING copy (`dropDuplicatesWithinWatermark`) — the only
  * causally available choice at ingest time. State is one
  * (16-byte digest → timestamp) entry per distinct in-horizon document,
  * bounded by ingest rate × horizon, independent of stream length.
  */
object StreamingClean {

  /** `docs` needs `ts` (epoch seconds), `doc_id`, `text`. Works on a
    * streaming frame; emits first-arriving, quality-passing, sample-kept
    * rows with their original columns. `scrubPii = true` additionally
    * redacts PII from `text` — the same `TextAnalysis.piiClean` expression
    * as the batch scrub, applied AFTER the digest dedup so the dedup state
    * keys on the original content (a scrub-then-dedup would conflate docs
    * differing only in their redacted spans). `routeByLang = true` gates
    * each doc through its own `lang` tag's battery (the batch
    * `passesQualityFor` expression — requires a `lang` column; packless
    * tags fall back to English), so a multilingual ingest doesn't reject
    * every non-English document at the door.
    */
  def cleanStream(
      docs: DataFrame,
      watermark: String = "1 hour",
      pct: Int = 100,
      salt: String = "clean",
      scrubPii: Boolean = false,
      routeByLang: Boolean = false): DataFrame = {
    val gate =
      if (routeByLang) TextAnalysis.passesQualityFor(col("text"), col("lang"))
      else TextAnalysis.passesQuality(col("text"))
    val deduped = docs
      .where(gate)
      .withColumn("event_time", expr("timestamp_seconds(ts)"))
      .withWatermark("event_time", watermark)
      .withColumn("text_md5", md5(col("text")))
      .dropDuplicatesWithinWatermark("text_md5")
    val sampled = TextAnalysis.hashSample(deduped, pct = pct, salt = salt)
      .drop("event_time", "text_md5")
    if (scrubPii) sampled.withColumn("text", TextAnalysis.piiClean(col("text")))
    else sampled
  }
}
