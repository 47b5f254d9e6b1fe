package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Epoch-swap persistence shared by the store artifacts
  * ([[graft.operators.FingerprintStore]], [[graft.operators.MinHashStore]]).
  *
  * Every write lands in a NEW `<name>_eN` directory and becomes current
  * only when the one-line `MANIFEST` file is atomically replaced
  * (tmp-write + `FileContext.rename(OVERWRITE)` — atomic on HDFS and
  * local). The prior epoch is deleted only after the manifest points at
  * the new one, so a driver crash, executor loss, or disk-full mid-write
  * leaves the previous epoch fully readable, and an append can read the
  * old epoch while writing the new one with no
  * overwrite-what-you-read hazard.
  */
private[graft] object EpochStore {

  private def manifestPath(path: String) = new Path(s"$path/MANIFEST")

  /** One-line long file read — `None` if absent. Shared by the manifest
    * and the streaming replay markers
    * ([[graft.streaming.StreamingFuzzyIngest]]) so the two cannot drift.
    */
  def readLongFile(spark: SparkSession, p: Path): Option[Long] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        Some(new String(buf.toByteArray, StandardCharsets.UTF_8).trim.toLong)
      } finally in.close()
    }
  }

  /** Atomic one-line long file replace: tmp-write + `FileContext.rename
    * (OVERWRITE)` — atomic on HDFS and local. The commit primitive under
    * the manifest and the replay markers.
    */
  def writeLongAtomic(spark: SparkSession, p: Path, v: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    FileContext.getFileContext(p.toUri, conf)
      .rename(tmp, p, Options.Rename.OVERWRITE)
  }

  /** The current committed epoch number, or 0 if none ever committed. */
  def currentEpoch(spark: SparkSession, path: String): Long =
    readLongFile(spark, manifestPath(path)).getOrElse(0L)

  /** Path of artifact `name` in epoch `e` under the store root. */
  def epochDir(path: String, name: String, e: Long): String =
    s"$path/${name}_e$e"

  /** Point the manifest at epoch `n` (atomic replace). Commit NEVER
    * deletes superseded epochs: a lazy frame (or, on a cluster, an
    * in-flight query) planned against the old epoch keeps reading files
    * a commit-time delete would rip out from under it — the Delta-style
    * discipline is that writers only add, and retention is the explicit,
    * operator-invoked [[vacuum]].
    *
    * CONCURRENCY CONTRACT: one writer per store at a time. Every caller
    * derives `n = currentEpoch + 1`, so two concurrent appends would
    * both write `<name>_e(N+1)` and the second manifest swap would
    * silently absorb the first writer's rows into oblivion. The
    * re-read guard here turns most of that silent lost-update into a
    * loud failure (a writer whose read is stale at commit time throws
    * instead of clobbering); it is best-effort, not a CAS — a plain
    * filesystem rename cannot compare-and-swap, and serious multi-writer
    * coordination (Delta-style optimistic log commits) is out of scope
    * for these artifacts. Serialize writers externally.
    */
  def commitEpoch(spark: SparkSession, path: String, n: Long): Unit = {
    val cur = currentEpoch(spark, path)
    if (cur != n - 1)
      throw new IllegalStateException(
        s"concurrent EpochStore writer detected at $path: committing " +
          s"epoch $n but the manifest already moved to $cur (expected " +
          s"${n - 1}) — another writer raced this one; its epoch would " +
          "have been silently lost. Serialize store writers.")
    writeLongAtomic(spark, manifestPath(path), n)
  }

  /** Drop every epoch older than the current one for each artifact name —
    * call when no reader can still hold plans against old epochs (the
    * Delta VACUUM contract). Deletion failures are non-fatal: a leftover
    * old epoch is garbage, not corruption.
    */
  def vacuum(
      spark: SparkSession, path: String, names: Seq[String]): Unit = {
    val cur = currentEpoch(spark, path)
    val mp = manifestPath(path)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var e = cur - 1
    while (e > 0 && names.exists(n =>
        fs.exists(new Path(epochDir(path, n, e))))) {
      names.foreach(n => fs.delete(new Path(epochDir(path, n, e)), true))
      e -= 1
    }
  }

  /** The committed epoch, failing loudly on an empty store. */
  def requireEpoch(spark: SparkSession, path: String, what: String): Long = {
    val e = currentEpoch(spark, path)
    require(e > 0, s"no committed $what epoch at $path")
    e
  }
}
