package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.EpochStore

/** Persistence for the exact-dedup fingerprint corpus.
  *
  * [[Dedup.incrementalDedup]] and [[Dedup.bloomIngestDedup]] describe a
  * production ingest loop — every new crawl batch deduped against
  * everything already accepted — but on their own they re-reduce the
  * accepted corpus's text to fingerprints on EVERY ingest. At 100 TB that
  * re-read is the whole cost: the accepted side must be a maintained
  * artifact, the way [[CodebookStore]] persists trained codebooks and
  * `Dedup.ngramIndex` persists the inverted index. This store keeps two
  * sibling artifacts under one path:
  *
  *  - `<path>/fingerprints` — the accepted corpus's DISTINCT 16-byte md5
  *    text digests (hex strings), written with the corpus's natural
  *    parallelism (at 10⁹ accepted docs this is a ~33 GB table — a normal
  *    parquet dataset, never a driver object);
  *  - `<path>/bloom` — ONE serialized Bloom sketch over the 60-bit
  *    hex-hash key that [[Dedup.bloomIngestDedup]] filters on (derived
  *    from the md5 digest, so the sketch is rebuildable from the
  *    fingerprint table alone), plus its sizing metadata. ~9.6 bits per
  *    accepted doc at fpp = 1 %.
  *
  * The per-ingest loop then reads fingerprints (an anti-join against
  * 16-byte keys — AQE broadcasts it while the accepted set is small) or
  * the sketch (pure map-side, zero shuffle), and [[append]] folds the
  * batch's surviving digests back in — the accepted corpus's TEXT is
  * never touched again after its one founding reduction.
  *
  * Durability: writes go through [[graft.core.EpochStore]] — each
  * save/append lands in a NEW `fingerprints_eN`/`bloom_eN` directory and
  * becomes current only on the atomic MANIFEST swap, so the prior epoch
  * survives any mid-append crash (the artifact this module exists to
  * preserve is never the thing being overwritten), and an append reads
  * the old epoch while writing the new one with no checkpoint needed to
  * break a read-your-own-overwrite cycle.
  */
object FingerprintStore {

  private val Names = Seq("fingerprints", "bloom")

  /** Reduce `corpus` (a `text` column) to its fingerprint artifact at
    * `path`: distinct md5 digests + the Bloom sketch sized for them.
    */
  def save(corpus: DataFrame, path: String, fpp: Double = 0.01): Unit = {
    val spark = corpus.sparkSession
    val next = EpochStore.currentEpoch(spark, path) + 1
    corpus.select(md5(col("text")).as("text_md5")).distinct()
      .write.mode("overwrite")
      .parquet(EpochStore.epochDir(path, "fingerprints", next))
    writeBloom(spark, path, next, fpp)
    EpochStore.commitEpoch(spark, path, next)
  }

  /** Artifact directory for `name`: the committed epoch, or — when no
    * MANIFEST was ever committed — the pre-epoch flat layout this store
    * wrote before the EpochStore hardening (`<path>/fingerprints`), so
    * artifacts persisted by the old code stay readable instead of
    * failing "no committed epoch" with a valid table sitting right
    * there. The next [[appendFingerprints]] reads through this fallback
    * and writes epoch 1 — migrating the store forward; the flat dirs
    * become garbage (not corruption) to delete at leisure.
    */
  private def artifactDir(
      spark: SparkSession, path: String, name: String): String = {
    val e = EpochStore.currentEpoch(spark, path)
    if (e > 0) EpochStore.epochDir(path, name, e)
    else {
      val lp = new org.apache.hadoop.fs.Path(s"$path/$name")
      val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.exists(lp),
        s"no committed FingerprintStore epoch (and no pre-epoch $name " +
          s"layout) at $path")
      lp.toString
    }
  }

  /** The persisted distinct-digest table (`text_md5`) — the existing side
    * for [[Dedup.incrementalDedupFp]].
    */
  def loadFingerprints(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(artifactDir(spark, path, "fingerprints"))

  /** The persisted Bloom sketch bytes (the filter side for
    * [[Dedup.bloomSketchDedup]]) plus the item count it was sized for.
    */
  def loadBloom(spark: SparkSession, path: String): (Array[Byte], Long) = {
    val r = spark.read.parquet(artifactDir(spark, path, "bloom"))
      .select(col("sketch"), col("n_items")).head()
    (r.getAs[Array[Byte]](0), r.getLong(1))
  }

  /** Fold a batch's ACCEPTED digests into the store: union-distinct with
    * the persisted table into a NEW epoch directory, then swap the
    * manifest. The union is digests-only (16-byte keys, never text).
    */
  def appendFingerprints(
      acceptedDigests: DataFrame, path: String, fpp: Double = 0.01): Unit = {
    val spark = acceptedDigests.sparkSession
    val next = EpochStore.currentEpoch(spark, path) + 1
    loadFingerprints(spark, path)
      .unionByName(acceptedDigests.select(col("text_md5")))
      .distinct()
      .write.mode("overwrite")
      .parquet(EpochStore.epochDir(path, "fingerprints", next))
    writeBloom(spark, path, next, fpp)
    EpochStore.commitEpoch(spark, path, next)
  }

  /** [[appendFingerprints]] from accepted documents (a `text` column). */
  def append(accepted: DataFrame, path: String, fpp: Double = 0.01): Unit =
    appendFingerprints(
      accepted.select(md5(col("text")).as("text_md5")), path, fpp)

  /** Drop superseded epochs — call once no in-flight reader can still
    * hold plans against them (commits themselves never delete; the Delta
    * VACUUM contract, [[graft.core.EpochStore.vacuum]]).
    */
  def vacuum(spark: SparkSession, path: String): Unit =
    EpochStore.vacuum(spark, path, Names)

  /** (Re)build the sketch artifact from the CURRENT fingerprint table —
    * one bounded count + one distributed sketch aggregation over 16-byte
    * keys. Bloom union would need equal bit sizes across epochs;
    * rebuilding from the digest table keeps the sketch optimally sized
    * as the corpus grows.
    *
    * Built with `df.stat.bloomFilter` (treeAggregate of
    * `util.sketch.BloomFilter` — the SAME serialization
    * `BloomFilterMightContain` deserializes), NOT the runtime-filter
    * `BloomFilterAggregate` expression: that expression silently clamps
    * n and numBits to `spark.sql.optimizer.runtime.bloomFilter
    * .maxNumItems/maxNumBits` (4 M items / 67 M bits by default), which
    * at this store's documented 10⁸–10⁹-document scale would push the
    * real fpp toward 1 and make the sketch arm over-drop nearly every
    * novel document — with the metadata row still claiming the requested
    * capacity. The stat form has no caps; the persisted `num_bits` is
    * read back from the filter actually built.
    */
  private def writeBloom(
      spark: SparkSession, path: String, epoch: Long, fpp: Double): Unit = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val fp = spark.read.parquet(EpochStore.epochDir(path, "fingerprints", epoch))
    val n = math.max(1L, fp.count())
    val filter = fp
      .select(conv(substring(col("text_md5"), 1, 15), 16, 10)
        .cast("long").as("k"))
      .stat.bloomFilter("k", n, fpp)
    val bytes = new java.io.ByteArrayOutputStream()
    filter.writeTo(bytes)
    import spark.implicits._
    Seq((bytes.toByteArray, n, filter.bitSize(), fpp))
      .toDF("sketch", "n_items", "num_bits", "fpp")
      .repartition(1)
      .write.mode("overwrite")
      .parquet(EpochStore.epochDir(path, "bloom", epoch))
  }
}
