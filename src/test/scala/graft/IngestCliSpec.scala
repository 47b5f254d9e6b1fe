package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.cli.IngestMain
import graft.operators.{FingerprintStore, IngestGate, MinHashStore}

/** End-to-end drive of the ingest CLI over temp dirs: found → gate →
  * telemetry → append → next batch gates against the grown stores →
  * vacuum. The CLI must produce exactly what the library calls produce
  * (it is a THIN main over IngestGate + the stores — any divergence is
  * a bug in the main, not a new behavior).
  */
class IngestCliSpec extends SparkSpec {

  test("found, gate with telemetry, append, re-gate, vacuum") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_ingest_cli").toString

    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
      (2L, "streaming pipelines gate crawled documents against persisted artifacts before acceptance"))
    val batch1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"), // exact dup of corpus 0
      (11L, "completely fresh words arrive here now bringing novel content for the corpus store"),
      (12L, "no")) // quality-gated
    val batch2 = Seq(
      (20L, "completely fresh words arrive here now bringing novel content for the corpus shop"), // fuzzy dup of SURVIVOR 11
      (21L, "entirely unrelated final sentence closing the stream with distinct vocabulary choices"))

    corpus.toDF("doc_id", "text").write.parquet(s"$tmp/corpus.parquet")
    batch1.toDF("doc_id", "text").write.parquet(s"$tmp/batch1.parquet")
    batch2.toDF("doc_id", "text").write.parquet(s"$tmp/batch2.parquet")

    IngestMain.run(Seq("--stores", s"$tmp/stores",
      "--found", s"$tmp/corpus.parquet"), spark)
    assert(FingerprintStore.loadFingerprints(spark, s"$tmp/stores/fingerprints")
      .count() === 2)

    // gate batch 1 and fold the survivors in
    IngestMain.run(Seq("--stores", s"$tmp/stores",
      "--batch", s"$tmp/batch1.parquet", "-o", s"$tmp/gated1",
      "--append"), spark)
    val s1 = spark.read.parquet(s"$tmp/gated1/survivors")
    assert(s1.select("doc_id").as[Long].collect().toSeq.sorted === Seq(11L))
    val tele = ujsonish(s"$tmp/gated1/telemetry.json")
    assert(tele("batch_total") === 3)
    assert(tele("after_quality") === 2)     // 12 dropped
    assert(tele("after_exact_dedup") === 1) // 10 dropped
    assert(tele("survivors") === 1)
    // the pre-flight LSH skew gauge rides the telemetry: a 3-doc batch
    // has at most 3 pairs per band, and the band/bucket counts are
    // structurally bounded by the defaults (8 bands, widths ≤ batch)
    assert(tele("lsh_bands") === 8)
    assert(tele("lsh_cand_pairs_total") >= 0 &&
      tele("lsh_cand_pairs_total") <= 8 * 3)
    assert(tele("lsh_cand_pairs_max_band") <= 3)
    assert(tele("lsh_max_bucket_width") >= 1 &&
      tele("lsh_max_bucket_width") <= 3)
    assert(tele("fingerprint_epoch") === 2) // founded at 1, appended to 2
    assert(tele("minhash_epoch") === 2)

    // batch 2 gates against the GROWN stores: 20 falls fuzzily to
    // survivor 11 folded by the previous run — the loop property,
    // through the CLI surface
    IngestMain.run(Seq("--stores", s"$tmp/stores",
      "--batch", s"$tmp/batch2.parquet", "-o", s"$tmp/gated2"), spark)
    val s2 = spark.read.parquet(s"$tmp/gated2/survivors")
    assert(s2.select("doc_id").as[Long].collect().toSeq.sorted === Seq(21L))
    // no --append: the stores did not advance
    assert(graft.core.EpochStore.currentEpoch(spark, s"$tmp/stores/fingerprints") === 2)

    // and the CLI's survivor set is exactly the library's
    val lib = IngestGate.gate(batch2.toDF("doc_id", "text"),
        FingerprintStore.loadFingerprints(spark, s"$tmp/stores/fingerprints"),
        MinHashStore.load(spark, s"$tmp/stores/minhash"))
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(s2.select("doc_id").as[Long].collect().toSeq.sorted === lib)

    // vacuum drops the superseded founding epoch dirs but keeps current
    IngestMain.run(Seq("--stores", s"$tmp/stores", "--vacuum"), spark)
    assert(FingerprintStore.loadFingerprints(spark, s"$tmp/stores/fingerprints")
      .count() === 3)
    assert(MinHashStore.load(spark, s"$tmp/stores/minhash").count() === 3)

    // a batch without founded stores fails loudly, as does a frame
    // missing the contract columns
    val bare = Files.createTempDirectory("graft_ingest_bare").toString
    intercept[IllegalArgumentException] {
      IngestMain.run(Seq("--stores", s"$bare/stores",
        "--batch", s"$tmp/batch1.parquet", "-o", s"$bare/out"), spark)
    }
    Seq((1L, "x")).toDF("id", "body").write.parquet(s"$bare/bad.parquet")
    intercept[IllegalArgumentException] {
      IngestMain.run(Seq("--stores", s"$tmp/stores",
        "--batch", s"$bare/bad.parquet", "-o", s"$bare/out2"), spark)
    }
    // and a do-nothing invocation is a usage error, not a silent no-op
    intercept[IllegalArgumentException] {
      IngestMain.run(Seq("--stores", s"$tmp/stores"), spark)
    }
  }

  test("--watch --once drains the drop dir, folds survivors, and resumes past processed batches") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_ingest_watch").toString

    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"),
      (2L, "streaming pipelines gate crawled documents against persisted artifacts before acceptance"))
    corpus.toDF("doc_id", "text").write.parquet(s"$tmp/corpus.parquet")
    IngestMain.run(Seq("--stores", s"$tmp/stores",
      "--found", s"$tmp/corpus.parquet"), spark)

    // the file-stream source consumes FILES appearing in the watch dir
    // (the crawl-drop contract: writers stage elsewhere and atomically
    // move the finished file in) — stage with spark, move the part file
    def drop(rows: Seq[(Long, String)], name: String): Unit = {
      val stage = s"$tmp/stage_$name"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$tmp/drop").mkdirs()
      Files.move(part.toPath, java.nio.file.Paths.get(s"$tmp/drop/$name"))
    }

    // drop batch 1 into the watch dir, drain once
    drop(Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"), // exact dup
      (11L, "completely fresh words arrive here now bringing novel content for the corpus store")),
      "b1.parquet")
    IngestMain.run(Seq("--stores", s"$tmp/stores",
      "--watch", s"$tmp/drop", "-o", s"$tmp/gated", "--once"), spark)
    val out1 = spark.read.parquet(s"$tmp/gated/batch_0")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(out1 === Seq(11L))
    assert(graft.core.EpochStore
      .currentEpoch(spark, s"$tmp/stores/fingerprints") === 2,
      "the gate store folded the drained batch (found = epoch 1, +1 append)")

    // drop batch 2, drain again: the CHECKPOINT resumes past batch 1
    // (no re-gate, no re-fold), and 20 falls fuzzily to survivor 11
    drop(Seq(
      (20L, "completely fresh words arrive here now bringing novel content for the corpus shop"), // fuzzy dup of SURVIVOR 11
      (21L, "entirely unrelated final sentence closing the stream with distinct vocabulary choices")),
      "b2.parquet")
    IngestMain.run(Seq("--stores", s"$tmp/stores",
      "--watch", s"$tmp/drop", "-o", s"$tmp/gated", "--once"), spark)
    val out2 = spark.read.parquet(s"$tmp/gated/batch_1")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(out2 === Seq(21L))
    // corpus(2) + 11 + 21 — batch 1's fold happened exactly once
    assert(MinHashStore.load(spark, s"$tmp/stores/minhash").count() === 4)
  }

  test("--watch warns when a batch file carries columns the pinned schema drops") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_ingest_wide").toString
    Seq((0L, "the quick brown fox jumps over the lazy dog near the quiet river bank today"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/corpus.parquet")
    IngestMain.run(Seq("--stores", s"$tmp/stores",
      "--found", s"$tmp/corpus.parquet"), spark)
    // pin the (doc_id, text) shape, then drop a WIDER batch file — the
    // stream projects `source_url` away; the telemetry must SAY so
    // (it reads the raw batch's file footers: the survivors frame is
    // checkpointed and has no file lineage — the r17 review's dead-code
    // finding, now asserted live)
    val stage = s"$tmp/stage_wide"
    Seq((30L, "totally new sentence with plenty of distinct words for the stream to accept", "http://x"))
      .toDF("doc_id", "text", "source_url").coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(s"$tmp/drop").mkdirs()
    Files.move(part.toPath, java.nio.file.Paths.get(s"$tmp/drop/w1.parquet"))
    // (a) the detection itself, against the real wider footer
    assert(IngestMain.droppedColumns(spark,
      Seq(s"$tmp/drop/w1.parquet"), Set("doc_id", "text"))
      === Seq("source_url"))
    // (b) LIVENESS of the telemetry path (the r17 review's dead-code
    // finding): drive the same ingest writer the CLI uses; the hook
    // resolves this batch's files from the checkpoint's SOURCE LOG
    // (neither the foreachBatch frame nor the checkpointed survivors
    // frame carries file lineage) and detection fires on their footers
    val pinned = spark.read.parquet(s"$tmp/corpus.parquet").schema
    val ckpt = s"$tmp/gated/_ckpt"
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
    val q = graft.streaming.StreamingIngestGate.ingest(
        spark.readStream.schema(pinned).parquet(s"$tmp/drop"),
        s"$tmp/stores/fingerprints", s"$tmp/stores/minhash",
        onBatch = (df, id) => df.write.mode("overwrite")
          .parquet(s"$tmp/gated/batch_$id"),
        onRawBatch = (_, id) => seen.add(
          IngestMain.droppedColumns(spark,
            IngestMain.batchFiles(spark, ckpt, id),
            pinned.fieldNames.toSet)))
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(seen.size === 1)
    assert(seen.peek() === Seq("source_url"))
    // the survivors still landed, minus the dropped column
    assert(spark.read.parquet(s"$tmp/gated/batch_0")
      .columns.toSet === Set("doc_id", "text", "n_tokens"))
  }

  test("--watch: inferred schema keeps ride-along columns; --vacuum-every reclaims mid-stream, pin survives") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_ingest_vac").toString
    Seq((0L, "the quick brown fox jumps over the lazy dog near the quiet river bank today", "en"))
      .toDF("doc_id", "text", "lang").write.parquet(s"$tmp/corpus.parquet")
    IngestMain.run(Seq("--stores", s"$tmp/stores",
      "--found", s"$tmp/corpus.parquet"), spark)

    def drop(rows: Seq[(Long, String, String)], name: String): Unit = {
      val stage = s"$tmp/stage_$name"
      rows.toDF("doc_id", "text", "lang").coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(s"$tmp/drop").mkdirs()
      Files.move(part.toPath, java.nio.file.Paths.get(s"$tmp/drop/$name"))
    }
    def exists(p: String) = new java.io.File(p).exists()

    // an empty watch dir without --schema fails loudly, not silently
    val ex = intercept[RuntimeException] {
      IngestMain.run(Seq("--stores", s"$tmp/stores",
        "--watch", s"$tmp/empty_drop", "-o", s"$tmp/gated", "--once"), spark)
    }
    assert(ex.getMessage.contains("--watch-schema"))

    // batch 0: schema INFERRED from the dropped file — the ride-along
    // `lang` column must survive the gate into the survivor output
    drop(Seq((10L, "completely fresh words arrive here now bringing novel content for the corpus store", "en")),
      "b1.parquet")
    IngestMain.run(Seq("--stores", s"$tmp/stores",
      "--watch", s"$tmp/drop", "-o", s"$tmp/gated", "--once",
      "--vacuum-every", "1"), spark)
    val out0 = spark.read.parquet(s"$tmp/gated/batch_0")
    assert(out0.columns.contains("lang"), s"ride-along dropped: ${out0.columns.toSeq}")
    assert(out0.select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((10L, "en")))

    // batch 1 via --watch-schema (the empty-dir form), vacuum fires after it:
    // batch 0's marker is dropped (its checkpoint committed), epoch 1's
    // sidecar is reclaimed, while batch 1's OWN pin (epoch 2) survives —
    // a replay of batch 1 would still read exactly what it read
    drop(Seq((20L, "entirely unrelated final sentence closing the stream with distinct vocabulary choices", "de")),
      "b2.parquet")
    IngestMain.run(Seq("--stores", s"$tmp/stores",
      "--watch", s"$tmp/drop", "-o", s"$tmp/gated", "--once",
      "--watch-schema", s"$tmp/corpus.parquet", "--vacuum-every", "1"), spark)
    assert(spark.read.parquet(s"$tmp/gated/batch_1")
      .select("doc_id").as[Long].collect().toSeq === Seq(20L))

    val fpd = s"$tmp/stores/fingerprints"
    assert(!exists(s"$fpd/GATEBATCH_0"), "committed batch's marker must be vacuumed")
    assert(exists(s"$fpd/GATEBATCH_1"), "the current batch's pin must survive")
    assert(!exists(s"$fpd/fingerprints_e1.segs"),
      "the unpinned superseded epoch must be reclaimed mid-stream")
    assert(exists(s"$fpd/fingerprints_e2.segs"),
      "batch 1's pinned epoch must survive its own vacuum")
    assert(exists(s"$fpd/fingerprints_e3.segs"), "the current epoch stays")
    // the store still serves: a third founding-free gate run loads fine
    assert(graft.operators.MinHashStore
      .load(spark, s"$tmp/stores/minhash").count() === 3)
  }

  test("batchFiles reads a compaction batch's .compact log, filtered to that batch") {
    import java.nio.file.{Files, Paths}
    val ckpt = Files.createTempDirectory("graft_ingest_ckpt").toString
    Files.createDirectories(Paths.get(s"$ckpt/sources/0"))
    def entry(p: String, b: Long) =
      s"""{"path":"file://$p","timestamp":1000,"batchId":$b}"""
    // plain per-batch file: all entries belong to the batch
    Files.write(Paths.get(s"$ckpt/sources/0/3"),
      s"v1\n${entry("/data/a.parquet", 3)}\n${entry("/data/b.parquet", 3)}"
        .getBytes("UTF-8"))
    assert(IngestMain.batchFiles(spark, ckpt, 3L)
      === Seq("file:///data/a.parquet", "file:///data/b.parquet"))
    // every compactInterval-th batch the source writes <id>.compact INSTEAD,
    // holding every entry since batch 0 — only the tagged batch's files may
    // surface, and the absence of the plain file must not read as "no files"
    Files.write(Paths.get(s"$ckpt/sources/0/9.compact"),
      (Seq("v1") ++ (0L to 9L).map(b => entry(s"/data/b$b.parquet", b)))
        .mkString("\n").getBytes("UTF-8"))
    assert(IngestMain.batchFiles(spark, ckpt, 9L) === Seq("file:///data/b9.parquet"))
    // an older batch whose plain file the log cleanup deleted resolves
    // from the nearest LATER compact file (forward scan), tag-filtered
    assert(IngestMain.batchFiles(spark, ckpt, 4L) === Seq("file:///data/b4.parquet"))
    // only a batch no compact file covers is genuinely unknown
    assert(IngestMain.batchFiles(spark, ckpt, 15L) === Seq.empty)
  }

  /** telemetry.json is flat {"k": long} — parse without a JSON dep. */
  private def ujsonish(path: String): Map[String, Long] =
    scala.io.Source.fromFile(path).mkString
      .split("[{},\n]").map(_.trim).filter(_.contains(":"))
      .map { kv =>
        val Array(k, v) = kv.split(":").map(_.trim)
        k.stripPrefix("\"").stripSuffix("\"") -> v.toLong
      }.toMap
}
