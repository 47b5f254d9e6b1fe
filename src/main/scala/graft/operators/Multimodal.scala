package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2): media as an opaque `binary`
  * column with a typed metadata struct, plus the decode / feature-extract
  * surface a training pipeline needs.
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB — this container
  * has no image/audio codecs — but everything Spark-side is real: the
  * schema, the binary payload, the partition-wise batch iteration
  * (`mapPartitions` over a typed Dataset — the Scala analog of
  * `mapInPandas` batches), and the feature-vector shape. Swapping the stub
  * body for a real JNI/ffmpeg decoder changes no plumbing.
  */
object Multimodal {

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
    * stream through each partition once (constant memory); the decoder is
    * a STUB: a real implementation would decode `content` with an image
    * library here — the fake derives a 4-float feature deterministically
    * from the payload bytes so plumbing and tests are end-to-end real.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // STUB DECODER — replace with a real codec (e.g. javax.imageio /
        // ffmpeg JNI). Deterministic fake: byte-sum / length moments.
        val bytes = r.content
        val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
        val feature = Array(
          bytes.length.toFloat,
          (sum.toDouble / math.max(bytes.length, 1)).toFloat,
          (bytes.headOption.getOrElse(0: Byte) & 0xff).toFloat,
          (bytes.lastOption.getOrElse(0: Byte) & 0xff).toFloat)
        MediaFeatures(r.doc_id, r.media_type, bytes.length.toLong, feature)
      }
    }
  }

  /** Partition-wise media resize. The pixel work is a STUB (no codecs in
    * this container): metadata is rescaled for real, and the payload is
    * deterministically downsampled by byte-striding — the stand-in for a
    * decode→scale→re-encode kernel. Swapping the stub body for a real
    * scaler changes no plumbing: same typed Dataset in/out, same
    * partition-streaming batch shape, constant memory per partition.
    */
  def resize(media: Dataset[MediaRow], maxDim: Int = 256): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val longest = math.max(math.max(r.width, r.height), 1)
        val scale = math.min(1.0, maxDim.toDouble / longest)
        // STUB SCALER — a real implementation decodes r.content, scales,
        // re-encodes. Deterministic fake: stride the payload by 1/scale.
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
