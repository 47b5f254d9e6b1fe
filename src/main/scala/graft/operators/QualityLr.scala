package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis.{countIn, tokens, EnStop}

/** Model-based quality filtering — the classifier stage of DCLM /
  * FineWeb-Edu-style pipelines (public method: train a small linear model
  * on per-doc features, score the whole corpus map-side, keep docs above a
  * threshold). The heuristic gates ([[TextAnalysis.passesQuality]],
  * gopher, C4) are fixed rules; this is the LEARNED form: a logistic
  * regression trained by unrolled batch gradient descent. The demo
  * supervision distills the heuristic gate itself (label =
  * `passes_quality`), so the learned scores are directly auditable
  * against a known boundary; production swaps in any label column
  * (LLM-judge verdicts, curated-vs-crawl membership) without touching the
  * plan shape.
  *
  * The whole thing — training included — is ONE declarative Spark plan,
  * no driver-side fetch: the weight vector is a 1-row DataFrame, each GD
  * step is a full-corpus aggregate cross-joined with the previous step's
  * weights (the broadcast scalar-ride pattern of unigram_lm's total
  * count), and the final score is a map-side projection against the
  * trained 1-row broadcast. At scale each iteration is one
  * partial-aggregated pass over the feature frame — `iters` linear passes
  * total, shuffle volume 4 decimals + 1 count per pass.
  *
  * Engine portability (the unigram_lm discipline): per-doc gradient
  * contributions are rounded to 6 decimals and summed as decimal(18,6) —
  * partition-order independent — and each weight update re-rounds to 6
  * decimals, so every weight is an exact short decimal replayable by the
  * DuckDB oracle's unrolled CTE chain.
  */
object QualityLr {

  /** Feature frame: doc_id, y (label: the heuristic quality gate), and
    * three 4-decimal quality features — stopword ratio, clamped length
    * (≤ 400 chars, normalized), mean token length / 10 — all in [0, ~2],
    * so GD needs no further normalization.
    */
  private[graft] def features(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tok", greatest(size(col("toks")), lit(1)).cast("long"))
      .select(
        col("doc_id"),
        (size(col("toks")) >= 5 && length(col("text")) >= 40 &&
          countIn(col("toks"), EnStop) > 0).cast("double").as("y"),
        round(countIn(col("toks"), EnStop).cast("double") / col("n_tok"), 4)
          .as("x1"),
        round(least(length(col("text")), lit(400)).cast("double") / 400, 4)
          .as("x2"),
        round(length(col("text")).cast("double") / col("n_tok") / 10.0, 4)
          .as("x3"))

  private def margin(w: String => Column): Column =
    w("w0") + w("w1") * col("x1") + w("w2") * col("x2") + w("w3") * col("x3")

  private def sigmoid(m: Column): Column = lit(1.0) / (lit(1.0) + exp(-m))

  /** `iters` unrolled batch-GD steps from w = 0: each step aggregates the
    * decimal-rounded per-doc gradient contributions of the logistic loss
    * and produces the next 1-row weight frame. Returns the trained
    * weights as a 1-row (w0, w1, w2, w3) DataFrame — a plan, not values.
    */
  private[graft] def trainWeights(
      feats: DataFrame, iters: Int, lr: Double): DataFrame = {
    val spark = feats.sparkSession
    var w: DataFrame = spark.range(1).select(
      lit(0.0).as("w0"), lit(0.0).as("w1"), lit(0.0).as("w2"), lit(0.0).as("w3"))
    for (_ <- 0 until iters) {
      // r appears in all four gradient sums; codegen's subexpression
      // elimination keeps the sigmoid evaluated once per row
      val r = sigmoid(margin(col)) - col("y")
      val grads = feats.crossJoin(broadcast(w)).agg(
        sum(round(r, 6).cast("decimal(18,6)")).as("g0"),
        sum(round(r * col("x1"), 6).cast("decimal(18,6)")).as("g1"),
        sum(round(r * col("x2"), 6).cast("decimal(18,6)")).as("g2"),
        sum(round(r * col("x3"), 6).cast("decimal(18,6)")).as("g3"),
        count(lit(1)).as("n"),
        min(col("w0")).as("w0"), min(col("w1")).as("w1"),
        min(col("w2")).as("w2"), min(col("w3")).as("w3"))
      def upd(wc: String, gc: String): Column =
        round(col(wc) - lit(lr) * (col(gc).cast("double") / col("n")), 6)
      w = grads.select(
        upd("w0", "g0").as("w0"), upd("w1", "g1").as("w1"),
        upd("w2", "g2").as("w2"), upd("w3", "g3").as("w3"))
    }
    w
  }

  /** Shared apply path: score a feature frame against a 1-row weight
    * frame — the map-side projection both [[qualityLr]] (freshly trained
    * weights) and [[qualityLrApply]] (loaded artifact) end in.
    */
  private def scoreWith(
      feats: DataFrame, weights: DataFrame, threshold: Double): DataFrame =
    feats.crossJoin(broadcast(weights))
      .withColumn("lr_score", round(sigmoid(margin(col)), 4))
      .select(
        col("doc_id"),
        col("y").cast("long").as("label"),
        col("x1"), col("x2"), col("x3"),
        col("lr_score"),
        (col("lr_score") >= threshold).as("keep"))

  /** Trained-classifier quality scores: per-doc sigmoid of the learned
    * linear margin, `keep` = score ≥ `threshold` on the 4-decimal rounded
    * score. Output: (doc_id, label, x1, x2, x3, lr_score, keep).
    */
  def qualityLr(
      docs: DataFrame,
      iters: Int = 3,
      lr: Double = 1.0,
      threshold: Double = 0.5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val f = features(docs)
    scoreWith(f, trainWeights(f, iters, lr), threshold)
  }

  /** Train on `docs` and persist the 1-row weight frame as a tiny parquet
    * artifact — the CodebookStore discipline: a deployment trains ONCE
    * and gates many ingest batches against the saved weights (the DCLM
    * classifier shape), so the training corpus is never re-read at
    * ingest time. Parquet round-trips the 6-decimal weights exactly.
    */
  def trainAndSaveWeights(
      docs: DataFrame, path: String, iters: Int = 3, lr: Double = 1.0): Unit = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // epoch-swap durable like every other store artifact
    // (graft.core.EpochStore): in the train-once/gate-many deployment a
    // RETRAIN that crashes mid-write must leave the previous weights
    // loadable — a plain overwrite would take every downstream ingest
    // gate down with it until a full retrain completed
    val spark = docs.sparkSession
    val next = graft.core.EpochStore.currentEpoch(spark, path) + 1
    trainWeights(features(docs), iters, lr)
      .repartition(1).write.mode("overwrite")
      .parquet(graft.core.EpochStore.epochDir(path, "weights", next))
    graft.core.EpochStore.commitEpoch(spark, path, next)
  }

  /** The persisted weight frame — fails loudly on anything but exactly
    * one (w0, w1, w2, w3) row rather than silently mis-scoring. Reads
    * the committed epoch; a pre-epoch flat artifact (this round's
    * earlier layout) stays readable as a fallback.
    */
  def loadWeights(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val e = graft.core.EpochStore.currentEpoch(spark, path)
    val dir =
      if (e > 0) graft.core.EpochStore.epochDir(path, "weights", e) else path
    val w = spark.read.parquet(dir).select("w0", "w1", "w2", "w3")
    require(w.count() == 1, s"weight artifact at $path must be exactly 1 row")
    w
  }

  /** Drop superseded weight epochs ([[graft.core.EpochStore.vacuum]]). */
  def vacuumWeights(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    graft.core.EpochStore.vacuum(spark, path, Seq("weights"))

  /** Ingest-shape scoring: gate a batch map-side against a trained
    * weight frame (typically [[loadWeights]]) — zero training passes,
    * zero jobs against the training corpus; the whole dedup-side plan is
    * one projection riding a 1-row broadcast. Byte-equal to scoring with
    * the in-memory trained weights (spec-asserted).
    */
  def qualityLrApply(
      docs: DataFrame, weights: DataFrame, threshold: Double = 0.5): DataFrame =
    scoreWith(features(docs), weights, threshold)
}
