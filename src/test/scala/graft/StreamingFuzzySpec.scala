package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SimHashStore}
import graft.streaming.StreamingFuzzyIngest

/** The streaming fuzzy crawl loop: each micro-batch must gate and fold
  * exactly like the batch `simhash_ingest_dedup` loop run by hand, a
  * replayed batch must reproduce bit-identical survivors without
  * double-folding the store, and the loop must catch near-dups of
  * SURVIVORS admitted earlier in the same stream (the property that
  * distinguishes the loop from a static gate).
  */
class StreamingFuzzySpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").resolve("store").toString

  private val founding = Seq(
    (0L, "alpha beta gamma delta epsilon zeta"),
    (2L, "one two three four five six seven"))
  private val batch1 = Seq(
    (10L, "alpha beta gamma delta epsilon zeta"), // dup of founding 0
    (11L, "completely different words arrive here now"))
  private val batch2 = Seq(
    (20L, "completely different words arrive here now"), // dup of SURVIVOR 11
    (21L, "fresh unique streaming content under test"))

  test("streamed fuzzy ingest equals the hand-run batch loop, batch over batch") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val store = tmp("sfz-loop")
    SimHashStore.save(founding.toDF("doc_id", "text"), store)

    val mem = MemoryStream[(Long, String)]
    val outs = scala.collection.mutable.Map[Long, Seq[Long]]()
    val q = StreamingFuzzyIngest.ingest(
        mem.toDF().toDF("doc_id", "text"), store,
        (df, id) => outs(id) = df.select("doc_id").as[Long].collect().toSeq.sorted)
      .start()
    try {
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    // hand-run batch loop on a second store: identical gate, identical folds
    val storeB = tmp("sfz-hand")
    SimHashStore.save(founding.toDF("doc_id", "text"), storeB)
    val hand = Seq(batch1, batch2).zipWithIndex.map { case (b, i) =>
      val batch = b.toDF("doc_id", "text")
      val flagged = Dedup.simhashIngestDedup(batch, SimHashStore.load(spark, storeB))
      val survivors = batch.join(
        flagged.select(col("batch_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti").localCheckpoint()
      SimHashStore.append(survivors, storeB)
      i.toLong -> survivors.select("doc_id").as[Long].collect().toSeq.sorted
    }.toMap
    assert(outs.toMap === hand)

    // the loop property: 10 fell to the FOUNDING corpus, 20 fell to
    // survivor 11 folded mid-stream — a static gate would have admitted it
    assert(outs(0L) === Seq(11L))
    assert(outs(1L) === Seq(21L))

    // and both stores hold founding ∪ survivors, identically
    val sigs = SimHashStore.load(spark, store)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sigsB = SimHashStore.load(spark, storeB)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sigs === sigsB)
    assert(sigs.map(_._1) === Seq(0L, 2L, 11L, 21L))
  }

  test("a replayed batch reproduces identical survivors and never double-folds") {
    import spark.implicits._
    val store = tmp("sfz-replay")
    SimHashStore.save(founding.toDF("doc_id", "text"), store)
    val batch = batch1.toDF("doc_id", "text")

    val first = StreamingFuzzyIngest.foldBatch(batch, store, batchId = 7L)
      .select("doc_id").as[Long].collect().toSeq.sorted
    val afterFold = SimHashStore.load(spark, store).count()

    // replay: the marker pins the pre-fold epoch, so the gate sees the
    // corpus the batch originally saw — NOT its own folded survivors —
    // and the manifest having moved past the pin skips the append
    val replay = StreamingFuzzyIngest.foldBatch(batch, store, batchId = 7L)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(replay === first)
    assert(SimHashStore.load(spark, store).count() === afterFold)

    // marker reclamation: once the sink checkpoint passes a batch it can
    // never replay, so its pin is dead weight — vacuumMarkers drops it
    assert(new java.io.File(s"$store/STREAMBATCH_7").exists())
    StreamingFuzzyIngest.vacuumMarkers(spark, store, beforeBatchId = 8)
    assert(!new java.io.File(s"$store/STREAMBATCH_7").exists())
  }
}
