package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, FingerprintStore}

/** The persisted-fingerprint ingest loop: dedup against a loaded artifact
  * must equal dedup computed from the corpus text, the sketch arm must
  * keep the Bloom one-sidedness (never admit a dup), and append must fold
  * survivors in so the next epoch sees them.
  */
class FingerprintStoreSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").resolve("store").toString

  test("load-then-dedup equals compute-then-dedup") {
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val path = tmp("fp-eq")
    FingerprintStore.save(corpus, path)

    val viaStore = Dedup.incrementalDedupFp(
        batch, FingerprintStore.loadFingerprints(spark, path))
      .orderBy("doc_id").collect()
    val viaText = Dedup.incrementalDedup(batch, corpus)
      .orderBy("doc_id").collect()
    assert(viaStore.toSeq === viaText.toSeq)
    assert(viaStore.nonEmpty)
  }

  test("pre-epoch flat layout stays readable and an append migrates it forward") {
    import spark.implicits._
    val path = tmp("fp-legacy")
    // the layout the pre-EpochStore code wrote: a bare fingerprints dir,
    // no MANIFEST — a valid artifact that must not be orphaned
    Seq("a", "b").toDF("text")
      .select(md5(col("text")).as("text_md5")).distinct()
      .write.parquet(s"$path/fingerprints")
    assert(FingerprintStore.loadFingerprints(spark, path).count() === 2)

    FingerprintStore.append(Seq("c").toDF("text"), path)
    // migrated: epoch 1 committed with all three digests + a rebuilt sketch
    assert(new java.io.File(s"$path/fingerprints_e1").exists())
    assert(FingerprintStore.loadFingerprints(spark, path).count() === 3)
    assert(FingerprintStore.loadBloom(spark, path)._2 === 3L)
  }

  test("fingerprint table is exactly the corpus's distinct digests") {
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val path = tmp("fp-digests")
    FingerprintStore.save(corpus, path)
    val stored = FingerprintStore.loadFingerprints(spark, path)
      .orderBy("text_md5").collect().map(_.getString(0)).toSeq
    val expected = corpus.select(md5(col("text")).as("m")).distinct()
      .orderBy("m").collect().map(_.getString(0)).toSeq
    assert(stored === expected)
  }

  test("persisted sketch never admits a dup and only over-drops novel docs") {
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val path = tmp("fp-bloom")
    FingerprintStore.save(corpus, path)

    val (sketch, n) = FingerprintStore.loadBloom(spark, path)
    assert(n === corpus.select(md5(col("text"))).distinct().count())
    val viaSketch = Dedup.bloomSketchDedup(batch, sketch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = Dedup.incrementalDedup(batch, corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // one-sided: the sketch's survivors are a subset of the exact
    // survivors (a Bloom "maybe" can only OVER-drop), and every true dup
    // (batch doc whose text is in the corpus) is gone
    assert(viaSketch.subsetOf(exact))
    val trueDups = batch.join(corpus.select(col("text")), Seq("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaSketch.intersect(trueDups).isEmpty)
    assert(viaSketch.nonEmpty)
  }

  test("append folds survivors in: re-ingesting the same batch yields nothing") {
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val path = tmp("fp-append")
    FingerprintStore.save(corpus, path)

    val s1 = Dedup.incrementalDedupFp(
      batch, FingerprintStore.loadFingerprints(spark, path))
    assert(s1.count() > 0)
    FingerprintStore.appendFingerprints(s1.select(col("text_md5")), path)

    // epoch 2 with the identical batch: everything is now accepted
    val again = Dedup.incrementalDedupFp(
      batch, FingerprintStore.loadFingerprints(spark, path))
    assert(again.count() === 0)

    // and the store is exactly digests(corpus) ∪ digests(batch)
    val stored = FingerprintStore.loadFingerprints(spark, path)
      .orderBy("text_md5").collect().map(_.getString(0)).toSeq
    val expected = corpus.select(col("text"))
      .unionByName(batch.select(col("text")))
      .select(md5(col("text")).as("m")).distinct()
      .orderBy("m").collect().map(_.getString(0)).toSeq
    assert(stored === expected)

    // the rebuilt sketch covers the appended digests too: zero admitted
    val (sketch, _) = FingerprintStore.loadBloom(spark, path)
    assert(Dedup.bloomSketchDedup(batch, sketch).count() === 0)
  }
}
