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
}
