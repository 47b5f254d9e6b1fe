package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance-resampling specs: feature accounting, importance
  * direction, Gumbel-top-k determinism and target enrichment.
  */
class DsirSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def target = docs.where(col("lang") === "en")

  test("dsirWeights counts unigram + bigram occurrences exactly") {
    val expected = docs.select(col("doc_id"),
      size(filter(split(lower(col("text")), "\\s+"), t => length(t) > 0))
        .cast("long").as("n_tok"))
      .select(col("doc_id"),
        (col("n_tok") + greatest(col("n_tok") - 1, lit(0L))).as("want"))
    val got = Dsir.dsirWeights(docs, target, buckets = 256)
    // every doc with >= 1 token appears, with n_features = T + (T-1)
    val bad = got.join(expected, "doc_id")
      .where(col("n_features") =!= col("want")).count()
    assert(bad === 0)
    assert(got.count() === expected.where(col("want") > 0).count())
  }

  test("bucketLogRatio covers every bucket with a finite smoothed ratio") {
    val lr = Dsir.bucketLogRatio(docs, target, buckets = 256)
    assert(lr.count() === 256)
    assert(lr.where(col("log_ratio").isNull).count() === 0)
    // smoothing bounds: |log_ratio| can never exceed log of the larger
    // corpus mass (add-one keeps both probabilities strictly positive)
    assert(lr.where(abs(col("log_ratio")) > 64).count() === 0)
  }

  test("importance weights rank target-language docs above the rest") {
    val w = Dsir.dsirWeights(docs, target, buckets = 1024)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val Array(enMean, restMean) = w
      .groupBy(col("lang") === "en").agg(avg("dsir_logw"))
      .orderBy(col("(lang = en)").desc).collect().map(_.getDouble(1))
    assert(enMean > restMean,
      s"target mean $enMean should exceed non-target mean $restMean")
  }

  test("dsirSample is deterministic, k-sized and salt-sensitive") {
    val a = Dsir.dsirSample(docs, target, k = 50, buckets = 1024, salt = "s1")
    val b = Dsir.dsirSample(docs, target, k = 50, buckets = 1024, salt = "s1")
    val c = Dsir.dsirSample(docs, target, k = 50, buckets = 1024, salt = "s2")
    assert(a.count() === 50)
    val idsA = a.select("doc_id").collect().map(_.getLong(0)).toSet
    val idsB = b.select("doc_id").collect().map(_.getLong(0)).toSet
    val idsC = c.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idsA === idsB)
    assert(idsA !== idsC)
    // score decomposition holds row-by-row (decimal-space recombination,
    // the operator's own rounding discipline)
    assert(a.where(col("score") =!=
      round(col("dsir_logw").cast("decimal(18,4)")
        + col("gumbel").cast("decimal(18,6)"), 4).cast("double")).count() === 0)
  }

  test("tagged-subset form is bit-identical to the two-frame form") {
    val twoFrame = Dsir.dsirWeights(docs, target, buckets = 1024)
      .orderBy("doc_id").collect()
    val tagged = Dsir.dsirWeights(docs, col("lang") === "en", buckets = 1024)
      .orderBy("doc_id").collect()
    assert(twoFrame.toSeq === tagged.toSeq)
  }

  test("persisted-feature form is bit-identical to the recompute path") {
    // featurize ONCE (tagged), persist, reuse for both fit and scoring —
    // must match the lazy recompute form exactly, weights and sample
    val persisted = Dsir.dsirWeightsPersisted(docs, col("lang") === "en", 1024)
      .orderBy("doc_id").collect()
    val standard = Dsir.dsirWeights(docs, col("lang") === "en", buckets = 1024)
      .orderBy("doc_id").collect()
    assert(persisted.toSeq === standard.toSeq)
    val sP = Dsir.dsirSamplePersisted(docs, col("lang") === "en",
      k = 50, buckets = 1024, salt = "s1").orderBy("doc_id").collect()
    val sR = Dsir.dsirSample(docs, col("lang") === "en",
      k = 50, buckets = 1024, salt = "s1").orderBy("doc_id").collect()
    assert(sP.toSeq === sR.toSeq)
  }

  test("resampling enriches the target domain beyond its corpus share") {
    val sampled = Dsir.dsirSample(docs, target, k = 100, buckets = 1024)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val sampleShare = sampled.where(col("lang") === "en").count().toDouble / 100
    val corpusShare =
      target.count().toDouble / docs.count()
    assert(sampleShare > corpusShare,
      s"sample en-share $sampleShare should exceed corpus share $corpusShare")
  }
}
