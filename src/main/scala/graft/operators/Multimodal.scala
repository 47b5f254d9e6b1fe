package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2): media as an opaque `binary`
  * column with a typed metadata struct, plus the decode / feature-extract
  * surface a training pipeline needs.
  *
  * Image decode/scale/re-encode is REAL via `javax.imageio` (JDK-only —
  * PNG/JPEG/GIF/BMP in any JVM, no native deps): payloads that decode are
  * resized through a bilinear `Graphics2D` kernel and re-encoded. Payloads
  * no registered reader accepts (audio/video — no JDK codec exists) fall
  * back to a clearly-labelled deterministic byte-stride stand-in, so the
  * partition-streaming plumbing (`mapPartitions` over a typed Dataset — the
  * Scala analog of `mapInPandas` batches) stays exercised end-to-end for
  * every media type. Swapping the fallback for an ffmpeg JNI kernel
  * changes no plumbing.
  */
object Multimodal {

  /** Decodes `bytes` if some registered ImageIO reader accepts them.
    * `setUseCache(false)` keeps decode in-memory — the default spills
    * through a temp FILE per call, pathological inside an executor loop.
    */
  private def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    javax.imageio.ImageIO.setUseCache(false)
    // NonFatal, not just IOException: ImageIO readers throw
    // IllegalArgumentException / CMMException / IIOException subclasses on
    // some malformed payloads — at corpus scale a single corrupt image must
    // degrade to the documented byte-moment fallback, not kill the job.
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One media row: id + opaque payload + typed metadata. */
  final case class MediaRow(
      doc_id: Long,
      media_type: String,
      content: Array[Byte],
      width: Int,
      height: Int)

  /** Extracted features per media row (fixed-width vector + scalars). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      feature: Array[Float])

  /** Builds a deterministic media table from `documents`: the text's UTF-8
    * bytes stand in for an encoded image payload; metadata derives from the
    * doc. Real pipelines read the binary column straight from parquet — the
    * downstream plumbing is identical.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image/fake").as("media_type"),
      col("text").cast("binary").as("content"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"))

  /** Partition-wise feature extraction over the binary column. Batches
    * stream through each partition once (constant memory). Payloads that
    * decode as images yield REAL pixel features (width, height, mean
    * luma, luma variance — the cheap filter signals an image-curation
    * pipeline keys on); anything else gets the labelled byte-moment
    * FALLBACK so the plumbing runs end-to-end for every media type.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.content
        val feature = decodeImage(bytes) match {
          case Some(img) =>
            // mean/variance of 8-bit luma (ITU-R BT.601 weights)
            var sum = 0.0; var sq = 0.0
            val (w, h) = (img.getWidth, img.getHeight)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val luma = 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                sum += luma; sq += luma * luma
                x += 1
              }
              y += 1
            }
            val n = math.max(w.toLong * h, 1L).toDouble
            val mean = sum / n
            Array(w.toFloat, h.toFloat, mean.toFloat, (sq / n - mean * mean).toFloat)
          case None =>
            // FALLBACK (non-image payloads): byte-sum / length moments
            val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
            Array(
              bytes.length.toFloat,
              (sum.toDouble / math.max(bytes.length, 1)).toFloat,
              (bytes.headOption.getOrElse(0: Byte) & 0xff).toFloat,
              (bytes.lastOption.getOrElse(0: Byte) & 0xff).toFloat)
        }
        MediaFeatures(r.doc_id, r.media_type, bytes.length.toLong, feature)
      }
    }
  }

  /** Partition-wise media resize: decode → bilinear scale so the longest
    * side is `maxDim` → re-encode as PNG, all with JDK `javax.imageio` /
    * `Graphics2D` (real pixels, no native deps). Constant memory per
    * partition: rows stream one at a time, each image living only for its
    * own decode-scale-encode. Metadata (width/height) is corrected from
    * the DECODED image — the declared struct can lie, the pixels can't.
    *
    * Payloads no ImageIO reader accepts (audio/video) take the labelled
    * FALLBACK: metadata rescaled for real, payload deterministically
    * byte-strided — the stand-in for an ffmpeg kernel this JVM lacks.
    */
  def resize(media: Dataset[MediaRow], maxDim: Int = 256): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(maxDim > 0, s"maxDim must be positive: $maxDim")
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.content) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            val scale = math.min(1.0, maxDim.toDouble / math.max(math.max(w, h), 1))
            if (scale >= 1.0) r.copy(width = w, height = h) // already small enough
            else {
              val nw = math.max(1, math.round(w * scale).toInt)
              val nh = math.max(1, math.round(h * scale).toInt)
              val kind =
                if (img.getColorModel.hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
                else java.awt.image.BufferedImage.TYPE_INT_RGB
              val out = new java.awt.image.BufferedImage(nw, nh, kind)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null)
              g.dispose()
              val buf = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", buf)
              MediaRow(r.doc_id, "image/png", buf.toByteArray, nw, nh)
            }
          case None =>
            // FALLBACK (non-image payloads — no JDK codec): stride the
            // payload by 1/scale, rescale metadata
            val longest = math.max(math.max(r.width, r.height), 1)
            val scale = math.min(1.0, maxDim.toDouble / longest)
            val stride = math.max(1, math.round(1.0 / math.max(scale, 1e-9)).toInt)
            val content =
              if (stride == 1) r.content
              else r.content.indices.collect { case i if i % stride == 0 => r.content(i) }.toArray
            MediaRow(r.doc_id, r.media_type, content,
              math.max(1, math.round(r.width * scale).toInt),
              math.max(1, math.round(r.height * scale).toInt))
        }
      }
    }
  }

  /** Frame sampling for video-like media: emits every `everyN`-th synthetic
    * frame index up to `meta.width` frames (stand-in for frame count) —
    * the explode-to-frames shape a video pipeline uses before per-frame
    * decode. Pure column algebra; one row per sampled frame.
    */
  def frameSample(media: DataFrame, everyN: Int = 10): DataFrame =
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("width").cast("int"), lit(0)), lit(everyN))))
      .select(col("doc_id"), col("media_type"), col("frame_idx"), col("content"))

  /** Column-algebra metadata pass over the binary payload (no decode):
    * byte length and content digest — the cheap integrity/dedup scan a
    * pipeline runs before any expensive decoding.
    */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("media_type"),
      length(col("content")).cast("long").as("n_bytes"),
      md5(col("content")).as("content_md5"))
}
