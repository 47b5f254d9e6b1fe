package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.core.EpochStore
import graft.operators.{Dedup, SimHashStore}

/** The fuzzy crawl loop as a streaming query — the ingest-time twin of
  * the `simhash_ingest_dedup` batch loop: every micro-batch of crawled
  * documents is Hamming-gated against the accepted corpus's persisted
  * [[SimHashStore]] signatures, survivors are emitted AND folded back
  * into the store, so the NEXT micro-batch is gated against them too.
  *
  * The gate is a batch-shaped join against an artifact that itself
  * advances per batch, so the deployment form is `foreachBatch` (the
  * StreamingDrift precedent): the micro-batch is exactly the "new
  * batch" of [[Dedup.simhashIngestDedup]], and the gate body calls the
  * SAME operator the batch loop runs — spec-asserted identical output.
  * No streaming state store: the corpus lives in the artifact, not in
  * Spark state, which is what lets it outlive the query, feed batch
  * consumers, and hold 10⁹ docs without a watermark horizon.
  *
  * Replay correctness (foreachBatch is at-least-once): a per-batch
  * marker pins the store EPOCH the batch first gated against. On
  * replay the gate re-reads that epoch — superseded epochs stay on
  * disk until [[SimHashStore.vacuum]] — so the recomputed survivor set
  * is bit-identical to the original, and the fold is skipped when the
  * manifest shows it already committed. The append is therefore
  * idempotent per batch id, PROVIDED this query is the store's only
  * writer while running and vacuum waits for checkpoint progress (both
  * documented deployment contracts; the marker-then-fold ordering
  * closes the crash window between them).
  */
object StreamingFuzzyIngest {

  private val MarkerPrefix = "STREAMBATCH_"

  private def markerPath(store: String, batchId: Long) =
    new Path(s"$store/$MarkerPrefix$batchId")

  /** The pinned corpus epoch for `batchId`, recording it on first
    * sight — the marker read/commit is [[EpochStore]]'s own one-line
    * long-file primitives (shared, so the atomicity discipline cannot
    * drift between the manifest and the markers).
    */
  private def pinEpoch(
      spark: SparkSession, store: String, batchId: Long): Long =
    EpochStore.readLongFile(spark, markerPath(store, batchId)).getOrElse {
      val e = EpochStore.requireEpoch(spark, store, "SimHashStore")
      EpochStore.writeLongAtomic(spark, markerPath(store, batchId), e)
      e
    }

  /** Drop replay markers for batches strictly below `beforeBatchId` —
    * call with the latest batch id the sink's checkpoint has committed
    * (a batch at-or-past the checkpoint can never replay, so its pin is
    * dead weight; without cleanup a long-running query accretes one
    * small marker file per micro-batch forever). Pair with
    * [[graft.operators.SimHashStore.vacuum]], which reclaims the epoch
    * DIRECTORIES the dropped markers pinned. Deletion failures are
    * non-fatal: a leftover marker is garbage, not corruption.
    */
  def vacuumMarkers(
      spark: SparkSession, store: String, beforeBatchId: Long): Unit = {
    val root = new Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root))
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(MarkerPrefix))
          scala.util.Try(n.stripPrefix(MarkerPrefix).toLong).toOption
            .filter(_ < beforeBatchId)
            .foreach(_ => fs.delete(st.getPath, false))
      }
  }

  /** Gate ONE batch against the store and fold the survivors in —
    * idempotent per `batchId` (see object doc). Returns the survivor
    * frame (eagerly materialized: it is both the emitted result and
    * the append input, and must not replan against the post-fold
    * store). Exposed so the spec and batch callers name the exact
    * per-batch body the stream runs.
    */
  def foldBatch(
      batch: DataFrame, store: String, batchId: Long,
      maxHamming: Int = 3): DataFrame = {
    val spark = batch.sparkSession
    val base = pinEpoch(spark, store, batchId)
    val corpus = SimHashStore.loadEpoch(spark, store, base)
    val flagged = Dedup.simhashIngestDedup(batch, corpus, maxHamming)
    val survivors = batch
      .join(flagged.select(col("batch_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .localCheckpoint()
    // fold exactly once: the manifest still at the pinned epoch means
    // this batch's append never committed (only this query writes the
    // store while it runs — the deployment contract)
    if (EpochStore.currentEpoch(spark, store) == base)
      SimHashStore.append(survivors, store)
    survivors
  }

  /** The loop as a ready-to-`start()` writer: `docs` is a STREAMING
    * frame with `doc_id` and `text`; `onBatch` receives each
    * micro-batch's survivor frame and batch id (sink it — the frame is
    * already materialized). The store must be founded
    * ([[SimHashStore.save]]) before the query starts: a gate with no
    * corpus is a configuration error.
    */
  def ingest(
      docs: DataFrame, store: String,
      onBatch: (DataFrame, Long) => Unit,
      maxHamming: Int = 3): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        onBatch(foldBatch(b, store, id, maxHamming), id)
      }
}
