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

  /** A real encoded PNG (gradient, so scaling has pixels to interpolate). */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | 0x40)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("resize really decodes, scales and re-encodes image payloads") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "image/png", pngBytes(640, 480), 640, 480),
      MediaRow(2L, "image/png", pngBytes(64, 48), 64, 48), // already under maxDim
      MediaRow(3L, "audio/fake", Array.tabulate(1000)(_.toByte), 0, 0)) // no JDK codec
    val out = Multimodal.resize(rows.toDS(), maxDim = 100)
      .collect().map(r => r.doc_id -> r).toMap

    // 640x480 → 100x75, and the OUTPUT payload is a decodable PNG of
    // exactly those pixel dimensions (the metadata can't lie: re-decode)
    val big = out(1L)
    assert((big.width, big.height) === (100, 75))
    assert(big.media_type === "image/png")
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(big.content))
    assert((decoded.getWidth, decoded.getHeight) === (100, 75))

    // under-the-cap image passes through untouched (payload preserved)
    assert(out(2L).content.toSeq === pngBytes(64, 48).toSeq)
    assert((out(2L).width, out(2L).height) === (64, 48))

    // non-image payload takes the labelled fallback and still flows
    assert(out(3L).content.nonEmpty)
  }

  test("corrupt image payloads degrade to the fallback instead of killing the batch") {
    import spark.implicits._
    // a PNG magic header followed by garbage: ImageIO readers accept the
    // signature then throw mid-decode (IIOException, and on some payload
    // shapes RuntimeExceptions) — at corpus scale this must be a fallback
    // row, not a job failure
    val truncated = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      Array.tabulate(64)(i => (i * 7).toByte)
    val rows = Seq(
      MediaRow(1L, "image/png", truncated, 640, 480),
      MediaRow(2L, "image/png", pngBytes(640, 480), 640, 480))
    val out = Multimodal.resize(rows.toDS(), maxDim = 100)
      .collect().map(r => r.doc_id -> r).toMap
    // the corrupt row flows through (byte-moment fallback), the good row
    // still really resizes
    assert(out(1L).content.nonEmpty)
    assert((out(2L).width, out(2L).height) === (100, 75))
    val feats = Multimodal.extractFeatures(rows.toDS()).collect()
    assert(feats.length === 2)
  }

  test("extractFeatures emits real pixel features for decodable images") {
    import spark.implicits._
    val solid = { // uniform mid-gray → luma mean 128±1, variance ~0
      val img = new java.awt.image.BufferedImage(32, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics(); g.setColor(new java.awt.Color(128, 128, 128))
      g.fillRect(0, 0, 32, 16); g.dispose()
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf); buf.toByteArray
    }
    val f = Multimodal.extractFeatures(
      Seq(MediaRow(7L, "image/png", solid, 32, 16)).toDS()).head()
    assert(f.feature(0) === 32.0f && f.feature(1) === 16.0f)
    assert(math.abs(f.feature(2) - 128.0f) <= 1.0f)
    assert(f.feature(3) <= 1.0f)
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
