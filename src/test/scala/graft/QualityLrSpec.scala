package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityLr

/** Learned quality-classifier specs: plan purity, training signal, and
  * determinism.
  */
class QualityLrSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("scores separate gate-passing docs from failing ones (AUC > 0.75)") {
    val out = QualityLr.qualityLr(docs)
    val pos = out.where(col("label") === 1).select(col("lr_score").as("sp"))
    val neg = out.where(col("label") === 0).select(col("lr_score").as("sn"))
    val Array(wins, total) = pos.crossJoin(neg)
      .agg(sum((col("sp") > col("sn")).cast("long")), count(lit(1)))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val auc = wins.toDouble / total
    assert(auc > 0.75, s"AUC $auc — the learned scores should rank the gate")
    // the two classes' mean scores are visibly apart
    val Array(mPos, mNeg) = Array(
      pos.agg(avg("sp")).head().getDouble(0),
      neg.agg(avg("sn")).head().getDouble(0))
    assert(mPos > mNeg + 0.02, s"mean score gap too small: $mPos vs $mNeg")
  }

  test("training runs inside the plan: no collect, deterministic re-run") {
    val a = QualityLr.qualityLr(docs).orderBy("doc_id").collect()
    val b = QualityLr.qualityLr(docs).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
    // more iterations change the fit (the chain really iterates)
    val c = QualityLr.qualityLr(docs, iters = 6).orderBy("doc_id").collect()
    assert(a.map(_.getAs[Double]("lr_score")).toSeq
      !== c.map(_.getAs[Double]("lr_score")).toSeq)
  }

  test("gradient aggregates are partition-order independent") {
    val once = QualityLr.qualityLr(docs).orderBy("doc_id")
      .select("doc_id", "lr_score").collect()
    val repart = QualityLr.qualityLr(docs.repartition(13)).orderBy("doc_id")
      .select("doc_id", "lr_score").collect()
    assert(once.toSeq === repart.toSeq)
  }

  test("persisted weights: loaded-weight scores byte-equal the in-memory run") {
    val train = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 2 === 1)
    val path = java.nio.file.Files
      .createTempDirectory("graft-qlr-spec").resolve("weights").toString
    QualityLr.trainAndSaveWeights(train, path)

    // the artifact round-trips the exact 6-decimal weights
    val loaded = QualityLr.loadWeights(spark, path)
    val inMem = QualityLr.trainWeights(QualityLr.features(train), 3, 1.0)
    assert(loaded.collect().toSeq === inMem.collect().toSeq)

    // ingest gating with the loaded artifact ≡ scoring with the
    // in-memory trained frame, byte for byte
    val viaStore = QualityLr.qualityLrApply(batch, loaded)
      .orderBy("doc_id").collect()
    val viaMem = QualityLr.qualityLrApply(batch, inMem)
      .orderBy("doc_id").collect()
    assert(viaStore.toSeq === viaMem.toSeq)
    assert(viaStore.nonEmpty)

    // train-on-self apply reproduces qualityLr exactly (same plan tail)
    val selfPath = java.nio.file.Files
      .createTempDirectory("graft-qlr-self").resolve("weights").toString
    QualityLr.trainAndSaveWeights(docs, selfPath)
    val applied = QualityLr
      .qualityLrApply(docs, QualityLr.loadWeights(spark, selfPath))
      .orderBy("doc_id").collect()
    val direct = QualityLr.qualityLr(docs).orderBy("doc_id").collect()
    assert(applied.toSeq === direct.toSeq)

    // a malformed artifact (2 rows) fails loudly
    import spark.implicits._
    val bad = java.nio.file.Files
      .createTempDirectory("graft-qlr-bad").resolve("weights").toString
    Seq((0.0, 0.0, 0.0, 0.0), (1.0, 1.0, 1.0, 1.0))
      .toDF("w0", "w1", "w2", "w3").write.parquet(bad)
    intercept[IllegalArgumentException] { QualityLr.loadWeights(spark, bad) }
  }
}
