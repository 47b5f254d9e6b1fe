package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{FingerprintStore, IngestGate, MinHashStore}
import graft.streaming.StreamingIngestGate

/** The streaming stacked-gate crawl loop: each micro-batch must gate
  * and fold exactly like the batch `ingest_gate` stack run by hand over
  * BOTH stores, a replayed batch must reproduce bit-identical survivors
  * without double-folding either store, and the loop must catch both
  * exact and fuzzy dups of SURVIVORS admitted earlier in the same
  * stream (the property that distinguishes the loop from a static
  * gate).
  */
class StreamingIngestGateSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").resolve("store").toString

  // texts long enough to clear the quality heuristics; "quality junk"
  // deliberately fails them (too short)
  private val founding = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
    (2L, "streaming pipelines gate crawled documents against persisted artifacts before acceptance"))
  private val batch1 = Seq(
    (10L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"), // exact dup of founding 0
    (11L, "completely fresh words arrive here now bringing novel content for the corpus store"),
    (12L, "no")) // quality-gated: too short
  private val batch2 = Seq(
    (20L, "completely fresh words arrive here now bringing novel content for the corpus store"), // exact dup of SURVIVOR 11
    (21L, "completely fresh words arrive here now bringing novel content for the corpus shop"), // fuzzy near-dup of SURVIVOR 11
    (22L, "entirely unrelated final sentence closing the stream with distinct vocabulary choices"))

  private def found(fp: String, mh: String): Unit = {
    import spark.implicits._
    FingerprintStore.save(founding.toDF("doc_id", "text"), fp)
    MinHashStore.save(founding.toDF("doc_id", "text"), mh)
  }

  test("streamed stacked gate equals the hand-run batch stack, batch over batch") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val (fp, mh) = (tmp("sig-fp"), tmp("sig-mh"))
    found(fp, mh)

    val mem = MemoryStream[(Long, String)]
    val outs = scala.collection.mutable.Map[Long, Seq[Long]]()
    val q = StreamingIngestGate.ingest(
        mem.toDF().toDF("doc_id", "text"), fp, mh,
        (df, id) => outs(id) = df.select("doc_id").as[Long].collect().toSeq.sorted)
      .start()
    try {
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    // hand-run batch stack on a second store pair: identical gate,
    // identical folds into both artifacts
    val (fpB, mhB) = (tmp("sig-fp-hand"), tmp("sig-mh-hand"))
    found(fpB, mhB)
    val hand = Seq(batch1, batch2).zipWithIndex.map { case (b, i) =>
      val survivors = IngestGate.gate(b.toDF("doc_id", "text"),
          FingerprintStore.loadFingerprints(spark, fpB),
          MinHashStore.load(spark, mhB))
        .localCheckpoint()
      FingerprintStore.append(survivors, fpB)
      MinHashStore.append(survivors, mhB)
      i.toLong -> survivors.select("doc_id").as[Long].collect().toSeq.sorted
    }.toMap
    assert(outs.toMap === hand)

    // the loop property across gates: 10 fell to the FOUNDING digests,
    // 12 to quality, 20 fell EXACTLY to survivor 11 folded mid-stream,
    // 21 fell FUZZILY to it — a static gate would have admitted both
    assert(outs(0L) === Seq(11L))
    assert(outs(1L) === Seq(22L))

    // and both store pairs hold founding ∪ survivors, identically
    def fps(p: String) = FingerprintStore.loadFingerprints(spark, p)
      .orderBy("text_md5").collect().map(_.getString(0)).toSeq
    def sigs(p: String) = MinHashStore.load(spark, p)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(fps(fp) === fps(fpB))
    assert(sigs(mh) === sigs(mhB))
    assert(sigs(mh).map(_._1) === Seq(0L, 2L, 11L, 22L))
  }

  test("a replayed batch reproduces identical survivors and never double-folds either store") {
    import spark.implicits._
    val (fp, mh) = (tmp("sig-fp-rp"), tmp("sig-mh-rp"))
    found(fp, mh)
    val batch = batch1.toDF("doc_id", "text")

    val first = StreamingIngestGate.foldBatch(batch, fp, mh, batchId = 7L)
      .select("doc_id").as[Long].collect().toSeq.sorted
    val (fpN, mhN) = (FingerprintStore.loadFingerprints(spark, fp).count(),
      MinHashStore.load(spark, mh).count())

    // replay: the single marker pins BOTH pre-fold epochs, so the gate
    // sees the corpus the batch originally saw — NOT its own folded
    // survivors — and each manifest having moved past its pin skips
    // that store's append
    val replay = StreamingIngestGate.foldBatch(batch, fp, mh, batchId = 7L)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(replay === first)
    assert(FingerprintStore.loadFingerprints(spark, fp).count() === fpN)
    assert(MinHashStore.load(spark, mh).count() === mhN)

    // the AUTHORITATIVE marker is ONE file carrying both pins, in the
    // fp store's dir; the mh store carries a one-long echo so ITS
    // vacuum can see the pin
    val marker = new java.io.File(s"$fp/GATEBATCH_7")
    val echo = new java.io.File(s"$mh/GATEPIN_7")
    assert(marker.exists() && echo.exists())
    assert(scala.io.Source.fromFile(marker).mkString.trim
      .split("\\s+").length === 2)
    assert(scala.io.Source.fromFile(echo).mkString.trim
      .split("\\s+").length === 1)

    // while the pins live, NEITHER store's vacuum may reclaim the
    // pinned pre-fold epoch: the batch must stay replayable
    FingerprintStore.vacuum(spark, fp)
    MinHashStore.vacuum(spark, mh)
    val replayAfterVacuum = StreamingIngestGate
      .foldBatch(batch, fp, mh, batchId = 7L)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(replayAfterVacuum === first)

    // marker cleanup unpins both; the next vacuum finishes the job
    StreamingIngestGate.vacuumMarkers(spark, fp, mh, beforeBatchId = 8)
    assert(!marker.exists() && !echo.exists())
    FingerprintStore.vacuum(spark, fp)
    MinHashStore.vacuum(spark, mh)
    assert(!new java.io.File(s"$mh/minhash_e1.segs").exists(),
      "the unpinned superseded epoch is reclaimed once the marker is gone")
  }

  test("a crash between the two folds replays into skip-fp, perform-mh") {
    import spark.implicits._
    val (fp, mh) = (tmp("sig-fp-cr"), tmp("sig-mh-cr"))
    found(fp, mh)
    val batch = batch1.toDF("doc_id", "text")

    // simulate the crash window: run the gate and fold ONLY the
    // fingerprint store, exactly what a death between the appends leaves
    val pinnedFp = graft.core.EpochStore.currentEpoch(spark, fp)
    val pinnedMh = graft.core.EpochStore.currentEpoch(spark, mh)
    graft.core.EpochStore.writeLongsAtomic(spark,
      new org.apache.hadoop.fs.Path(s"$fp/GATEBATCH_3"),
      Seq(pinnedFp, pinnedMh))
    val survivors = IngestGate.gate(batch,
        FingerprintStore.loadFingerprintsEpoch(spark, fp, pinnedFp),
        MinHashStore.loadEpoch(spark, mh, pinnedMh))
      .localCheckpoint()
    FingerprintStore.append(survivors, fp)
    val fpAfterCrash = FingerprintStore.loadFingerprints(spark, fp).count()

    // the replay completes the batch: fp fold skipped (manifest moved),
    // mh fold performed, survivors bit-identical
    val replay = StreamingIngestGate.foldBatch(batch, fp, mh, batchId = 3L)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(replay === survivors.select("doc_id").as[Long].collect().toSeq.sorted)
    assert(FingerprintStore.loadFingerprints(spark, fp).count() === fpAfterCrash)
    assert(MinHashStore.load(spark, mh).count() ===
      founding.size + replay.size)
  }
}
