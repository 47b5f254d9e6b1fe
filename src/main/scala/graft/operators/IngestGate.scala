package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The STACKED ingest gate a production crawl pipeline runs per batch,
  * in cost order: (1) cheap map-side quality heuristics drop junk
  * before anything touches an artifact, (2) exact dedup against the
  * persisted digest corpus (16-byte keys; batch-internal copies
  * canonicalize to min doc_id in the same pass), (3) banded MinHash
  * fuzzy dedup against the persisted signature corpus — the expensive
  * gate sees only what the cheap gates passed. Survivors are what the
  * stores' `append` folds in.
  *
  * ONE body, three callers — the `ingest_gate` oracle query
  * ([[graft.SparkEntry]]), the streaming twin
  * ([[graft.streaming.StreamingIngestGate]]), and the ingest CLI
  * ([[graft.cli.IngestMain]]) — so the batch, streaming, and
  * operational forms can never drift (the reason the reference keeps
  * one dump body under both its CLI and API entry points,
  * xdump base.py:87).
  *
  * Scale shape: the quality gate is map-side over the batch only; the
  * exact gate streams the digest corpus ONCE against the broadcast
  * batch digests; the fuzzy gate explodes the signature corpus to band
  * keys map-side against the broadcast batch keys — nothing
  * corpus-volume ever shuffles, and the corpus is touched only through
  * its two compact artifacts (never re-read, never re-tokenized).
  */
object IngestGate {

  /** Every intermediate the stack produces — the per-stage telemetry
    * surface ([[graft.cli.IngestMain]] reports counts per gate):
    * `quality` = batch rows passing the heuristics (doc_id, text,
    * n_tokens); `exact` = quality survivors not exact-duplicated
    * against the digest corpus or within the batch; `survivors` =
    * exact survivors not fuzzy-flagged against the signature corpus —
    * the frame to fold into both stores.
    */
  final case class Stages(
      quality: DataFrame, exact: DataFrame, survivors: DataFrame)

  /** Run the stack: `batch` is (doc_id, text); `fingerprints` the
    * persisted digest table (`text_md5`,
    * [[FingerprintStore.loadFingerprints]]); `corpusSigs` the persisted
    * signature table (`doc_id`, `sig`, [[MinHashStore.load]]).
    */
  def gateStages(
      batch: DataFrame,
      fingerprints: DataFrame,
      corpusSigs: DataFrame): Stages = {
    // one inner join carries n_tokens through the whole stack (doc_id
    // is unique in the quality frame, so inner ≡ semi + the trailing
    // re-join a naive cut would pay); localCheckpoint because the gated
    // frame feeds three consumers (digest aggregate, fuzzy gate, final
    // anti-join) and the tokenize subtree must run once
    val qd = batch.join(
        TextAnalysis.qualityScore(batch)
          .where(col("passes_quality"))
          .select(col("doc_id"), col("n_tokens")),
        Seq("doc_id"))
      .localCheckpoint()
    val exd = qd.join(
      Dedup.incrementalDedupFp(qd, fingerprints)
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val flagged = Dedup.minhashIngestDedup(exd, corpusSigs)
    val survivors = exd.join(
      flagged.select(col("batch_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    Stages(qd, exd, survivors)
  }

  /** Just the survivor frame (doc_id, text, n_tokens). */
  def gate(
      batch: DataFrame,
      fingerprints: DataFrame,
      corpusSigs: DataFrame): DataFrame =
    gateStages(batch, fingerprints, corpusSigs).survivors
}
