package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.core.EpochStore
import graft.operators.{FingerprintStore, IngestGate, MinHashStore}

/** The full crawl loop as a streaming query — the ingest-time twin of
  * the `ingest_gate` batch stack: every micro-batch runs the stacked
  * quality → exact → fuzzy gate ([[graft.operators.IngestGate]], the
  * SAME body the batch form runs) against the persisted
  * [[FingerprintStore]] and [[MinHashStore]], survivors are emitted AND
  * folded into BOTH stores, so the next micro-batch is gated against
  * them too.
  *
  * Deployment form is `foreachBatch` for the [[StreamingFuzzyIngest]]
  * reason: the gate is a batch-shaped join against artifacts that
  * themselves advance per batch, and the corpus lives in the artifacts,
  * not in Spark state — no watermark horizon, batch consumers share the
  * stores, and 10⁹ accepted docs cost two compact artifacts, not a
  * state store.
  *
  * Replay correctness (foreachBatch is at-least-once) with TWO stores:
  * the per-batch marker pins BOTH stores' epochs in ONE atomically-
  * renamed file ([[graft.core.EpochStore.writeLongsAtomic]] — a single
  * rename, so the pair can never be torn), written BEFORE either fold.
  * On replay the gate re-reads exactly the pinned epochs (superseded
  * epochs stay on disk until each store's `vacuum`), so the recomputed
  * survivor set is bit-identical, and each store's fold is skipped
  * independently when its manifest shows it already committed — a crash
  * BETWEEN the two folds replays into "skip the fingerprint fold,
  * perform the minhash fold". Idempotent per batch id PROVIDED this
  * query is both stores' only writer while running and vacuum waits for
  * checkpoint progress (the [[StreamingFuzzyIngest]] deployment
  * contracts, unchanged).
  */
object StreamingIngestGate {

  private val MarkerPrefix = "GATEBATCH_"
  private val EchoPrefix = "GATEPIN_"

  private def markerPath(fpStore: String, batchId: Long) =
    new Path(s"$fpStore/$MarkerPrefix$batchId")

  private def echoPath(mhStore: String, batchId: Long) =
    new Path(s"$mhStore/$EchoPrefix$batchId")

  /** The pinned (fingerprint, minhash) epochs for `batchId`, recording
    * them on first sight. The AUTHORITATIVE marker lives in the
    * FINGERPRINT store's dir (the stack's first artifact) — one marker
    * per batch, both pins inside, committed by one rename, so the pair
    * can never be torn. A one-long ECHO of the minhash pin also lands
    * in the MINHASH store's dir, because `EpochStore.vacuum` protects
    * pinned epochs by reading markers in ITS OWN store root — without
    * the echo, vacuuming the minhash store couldn't see the gate's pin.
    * The echo is written BEFORE the primary: a crash between the two
    * leaves a garbage pin (vacuum keeps a little extra until marker
    * cleanup), never a replay that reads a reclaimed epoch. On replay
    * the primary is authoritative and the echo is re-asserted if the
    * crash ate it. A crash before the primary lands is safe: nothing
    * has folded yet, so a replay re-reads the same epochs.
    */
  private def pinEpochs(
      spark: SparkSession, fpStore: String, mhStore: String,
      batchId: Long): (Long, Long) =
    EpochStore.readLongsFile(spark, markerPath(fpStore, batchId)) match {
      case Some(Seq(f, m)) =>
        if (EpochStore.readLongsFile(spark, echoPath(mhStore, batchId)).isEmpty)
          EpochStore.writeLongAtomic(spark, echoPath(mhStore, batchId), m)
        (f, m)
      case Some(other) => sys.error(
        s"corrupt gate marker for batch $batchId: expected 2 epochs, " +
          s"found $other")
      case None =>
        val f = EpochStore.requireEpoch(spark, fpStore, "FingerprintStore")
        val m = EpochStore.requireEpoch(spark, mhStore, "MinHashStore")
        EpochStore.writeLongAtomic(spark, echoPath(mhStore, batchId), m)
        EpochStore.writeLongsAtomic(
          spark, markerPath(fpStore, batchId), Seq(f, m))
        (f, m)
    }

  /** Drop replay markers (primary AND echo, each from its store's dir)
    * for batches strictly below `beforeBatchId` — the
    * [[StreamingFuzzyIngest.vacuumMarkers]] contract (call with the
    * sink checkpoint's committed batch id; pair with BOTH stores'
    * `vacuum`, which a still-live marker pin now blocks from reclaiming
    * the pinned epoch — `EpochStore.vacuum`). Deletion failures are
    * non-fatal: a leftover marker is garbage, not corruption.
    */
  def vacuumMarkers(
      spark: SparkSession, fpStore: String, mhStore: String,
      beforeBatchId: Long): Unit =
    Seq(fpStore -> MarkerPrefix, mhStore -> EchoPrefix).foreach {
      case (store, prefix) =>
        val root = new Path(store)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(root))
          fs.listStatus(root).foreach { st =>
            val n = st.getPath.getName
            if (n.startsWith(prefix))
              scala.util.Try(n.stripPrefix(prefix).toLong).toOption
                .filter(_ < beforeBatchId)
                .foreach(_ => fs.delete(st.getPath, false))
          }
    }

  /** Gate ONE batch (`doc_id`, `text`) through the full stack and fold
    * the survivors into both stores — idempotent per `batchId` (see
    * object doc). Returns the survivor frame (doc_id, text, n_tokens),
    * eagerly materialized: it is both the emitted result and the append
    * input, and must not replan against the post-fold stores.
    */
  def foldBatch(
      batch: DataFrame, fpStore: String, mhStore: String,
      batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val (fpE, mhE) = pinEpochs(spark, fpStore, mhStore, batchId)
    val survivors = IngestGate.gate(batch,
        FingerprintStore.loadFingerprintsEpoch(spark, fpStore, fpE),
        MinHashStore.loadEpoch(spark, mhStore, mhE))
      .localCheckpoint()
    // fold exactly once PER STORE: a manifest still at its pinned epoch
    // means that store's append never committed (only this query writes
    // the stores while it runs — the deployment contract). The two
    // appends read the checkpointed survivors and write DISJOINT stores
    // — independent actions, overlapped (guide §2.6) so a trigger pays
    // ~one append's job floor, not two
    EpochStore.inParallel(
      () => if (EpochStore.currentEpoch(spark, fpStore) == fpE)
        FingerprintStore.append(survivors, fpStore),
      () => if (EpochStore.currentEpoch(spark, mhStore) == mhE)
        MinHashStore.append(survivors, mhStore))
    survivors
  }

  /** The loop as a ready-to-`start()` writer: `docs` is a STREAMING
    * frame with `doc_id` and `text`; `onBatch` receives each
    * micro-batch's survivor frame and batch id (sink it — the frame is
    * already materialized). Both stores must be founded
    * ([[FingerprintStore.save]], [[MinHashStore.save]]) before the
    * query starts: a gate with no corpus is a configuration error.
    */
  def ingest(
      docs: DataFrame, fpStore: String, mhStore: String,
      onBatch: (DataFrame, Long) => Unit,
      onRawBatch: (DataFrame, Long) => Unit = (_, _) => ())
      : DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        // raw-batch hook BEFORE the gate: `b` is the file-source-backed
        // frame whose inputFiles are exactly this micro-batch's files —
        // the survivors frame handed to onBatch is localCheckpoint()ed
        // (a LogicalRDD; no file lineage) and post-projection, so
        // source-shape telemetry (e.g. dropped ride-along columns) must
        // hang off THIS frame, not that one
        onRawBatch(b, id)
        onBatch(foldBatch(b, fpStore, mhStore, id), id)
      }
}
