package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.mediaFromDocuments(
    spark.read.parquet(s"$sfDir/documents.parquet"))

  test("media table carries a binary payload with typed metadata") {
    val schema = media.schema
    assert(schema("content").dataType.typeName === "binary")
    assert(media.where(col("content").isNull).count() === 0)
  }

  test("extractFeatures streams partitions and emits fixed-width vectors") {
    import spark.implicits._
    val ds = media.as[MediaRow]
    val feats = Multimodal.extractFeatures(ds)
    assert(feats.count() === media.count())
    val bad = feats.filter(_.feature.length != 4).count()
    assert(bad === 0)
    // deterministic under repartitioning (stub decoder is content-pure)
    val a = feats.collect().map(f => f.doc_id -> f.feature.toSeq).sortBy(_._1).toSeq
    val b = Multimodal.extractFeatures(media.repartition(7).as[MediaRow])
      .collect().map(f => f.doc_id -> f.feature.toSeq).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("resize caps the longest side and is deterministic") {
    import spark.implicits._
    val ds = media.as[MediaRow]
    val out = Multimodal.resize(ds, maxDim = 100).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => math.max(r.width, r.height) <= 100))
    val again = Multimodal.resize(media.repartition(5).as[MediaRow], maxDim = 100)
      .collect().map(r => r.doc_id -> r.content.toSeq).toMap
    assert(out.map(r => r.doc_id -> r.content.toSeq).toMap === again)
  }

  test("frameSample explodes every Nth frame index") {
    val frames = Multimodal.frameSample(media.limit(5), everyN = 100)
    assert(frames.count() >= 5) // at least frame 0 per doc
    assert(frames.where(col("frame_idx") % 100 =!= 0).count() === 0)
  }

  test("mediaMeta digest matches text md5") {
    val m = Multimodal.mediaMeta(media)
      .join(spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id")
    assert(m.where(col("content_md5") =!= md5(col("text"))).count() === 0)
  }
}
