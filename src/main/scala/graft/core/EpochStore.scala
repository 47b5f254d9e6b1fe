package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Epoch-swap persistence shared by the store artifacts
  * ([[graft.operators.FingerprintStore]], [[graft.operators.MinHashStore]]).
  *
  * Every write lands in NEW files and becomes current only when the
  * one-line `MANIFEST` file is atomically replaced (tmp-write +
  * `FileContext.rename(OVERWRITE)` — atomic on HDFS and local). Prior
  * epochs are deleted only by the explicit [[vacuum]], so a driver
  * crash, executor loss, or disk-full mid-write leaves the previous
  * epoch fully readable, and an append can read the old epoch while
  * writing the new one with no overwrite-what-you-read hazard.
  *
  * SEGMENTED EPOCHS: a corpus-scale artifact must not be rewritten per
  * ingest batch — at 10⁹ documents a MinHash signature table is ~130 GB,
  * and an append that unions it with a batch and rewrites the union pays
  * O(corpus) I/O for an O(batch) delta, growing with corpus age (the
  * exact failure mode the stores exist to avoid). So an epoch of an
  * artifact is the LIST of its live segment directories, recorded in a
  * `<name>_eN.segs` sidecar file: founding writes segment
  * `<name>_s1` and the list `[<name>_s1]`; an append writes ONLY the
  * batch's rows as `<name>_s(N+1)` and commits a list referencing the
  * old segments plus the new one — old segment files are never touched
  * (spec-asserted byte-identical across appends). [[artifactPaths]]
  * resolves an epoch to its parquet paths; a missing `.segs` file means
  * a pre-segmentation monolithic epoch dir `<name>_eN`, which stays
  * readable and is referenced AS a segment by the first segmented
  * append over it (zero-cost migration — the Iceberg/Delta manifest-of-
  * data-files discipline, scoped down to one pointer file per epoch).
  */
private[graft] object EpochStore {

  private def manifestPath(path: String) = new Path(s"$path/MANIFEST")

  /** One-line long file read — `None` if absent. Shared by the manifest
    * and the streaming replay markers
    * ([[graft.streaming.StreamingFuzzyIngest]]) so the two cannot drift.
    */
  def readLongFile(spark: SparkSession, p: Path): Option[Long] =
    readLongsFile(spark, p).map { ls =>
      require(ls.length == 1, s"$p: expected one value, found ${ls.length}")
      ls.head
    }

  /** One-line whitespace-separated longs read — `None` if absent. The
    * multi-value form of [[readLongFile]]: a marker that must pin
    * SEVERAL artifacts' epochs together (the stacked-gate stream pins
    * the fingerprint AND minhash stores per batch,
    * [[graft.streaming.StreamingIngestGate]]) records them in ONE
    * atomically-replaced file, so the pins can never be torn.
    */
  def readLongsFile(spark: SparkSession, p: Path): Option[Seq[Long]] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        val txt = new String(buf.toByteArray, StandardCharsets.UTF_8).trim
        try Some(txt.split("\\s+").toSeq.map(_.toLong))
        catch {
          case e: NumberFormatException => throw new IllegalStateException(
            s"corrupt or truncated epoch marker at $p " +
              s"(content: '${txt.take(64)}') — manifest/pin files are " +
              "single-line longs; restore the file or re-found the store", e)
        }
      } finally in.close()
    }
  }

  /** Atomic one-line long file replace: tmp-write + `FileContext.rename
    * (OVERWRITE)` — atomic on HDFS and local. The commit primitive under
    * the manifest and the replay markers.
    */
  def writeLongAtomic(spark: SparkSession, p: Path, v: Long): Unit =
    writeLongsAtomic(spark, p, Seq(v))

  /** [[writeLongAtomic]] for several values on one line (single rename,
    * so a multi-store pin commits all-or-nothing). */
  def writeLongsAtomic(spark: SparkSession, p: Path, vs: Seq[Long]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(vs.mkString(" ").getBytes(StandardCharsets.UTF_8))
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

  // ── Segmented epochs ────────────────────────────────────────────────

  /** Directory NAME (path-relative) of segment `seg` of artifact
    * `name` — segment ids are the epoch number that wrote them, unique
    * under the one-writer-at-a-time contract.
    */
  def segName(name: String, seg: Long): String = s"${name}_s$seg"

  private def segListPath(path: String, name: String, e: Long) =
    new Path(s"$path/${name}_e$e.segs")

  /** The live segment list (path-relative dir names, write order) of
    * artifact `name` at epoch `e` — `None` for a pre-segmentation
    * monolithic epoch (no `.segs` sidecar).
    */
  def readSegments(
      spark: SparkSession, path: String, name: String,
      e: Long): Option[Seq[String]] = {
    val p = segListPath(path, name, e)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        Some(new String(buf.toByteArray, StandardCharsets.UTF_8)
          .split('\n').iterator.map(_.trim).filter(_.nonEmpty).toSeq)
      } finally in.close()
    }
  }

  /** Record epoch `e`'s live segment list. A plain overwrite-create, not
    * an atomic rename: the sidecar is invisible until the MANIFEST swap
    * commits the epoch, and a crashed writer's leftover is overwritten
    * by the next attempt at the same epoch number.
    */
  def writeSegments(
      spark: SparkSession, path: String, name: String, e: Long,
      segs: Seq[String]): Unit = {
    require(segs.nonEmpty && segs.distinct == segs,
      s"segment list for $name epoch $e must be non-empty and " +
        s"duplicate-free: $segs")
    val p = segListPath(path, name, e)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(segs.mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Parquet paths of artifact `name` at epoch `e`: the epoch's segment
    * dirs when the `.segs` sidecar exists, else the monolithic epoch
    * dir (pre-segmentation artifacts stay readable unchanged).
    */
  def artifactPaths(
      spark: SparkSession, path: String, name: String,
      e: Long): Seq[String] =
    readSegments(spark, path, name, e)
      .map(_.map(n => s"$path/$n"))
      .getOrElse(Seq(epochDir(path, name, e)))

  /** The segment list an APPEND at epoch `cur + 1` extends: epoch
    * `cur`'s recorded list, or — for a pre-segmentation monolithic
    * epoch — its epoch dir referenced AS the founding segment, so
    * migration to the segmented layout costs zero I/O.
    */
  def segmentsForAppend(
      spark: SparkSession, path: String, name: String,
      cur: Long): Seq[String] =
    readSegments(spark, path, name, cur)
      .getOrElse(Seq(s"${name}_e$cur"))

  /** Run independent epoch-artifact ACTIONS concurrently (guide §2.6:
    * actions are only sequential because the driver calls them
    * sequentially). A store epoch write is a handful of tiny,
    * independent jobs — driver-local codebook/meta frames, a bounded
    * stats aggregate, a sidecar read — each paying the per-job floor;
    * run from a small pool they overlap, so an epoch pays ~one floor
    * instead of one per artifact. Every task completes (or fails)
    * BEFORE this returns and the first failure is rethrown after all
    * have settled — the write-everything-then-commit discipline is
    * unchanged, and a failed sibling can never race a commit.
    */
  def inParallel(tasks: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = tasks.map(t => Future(t()))
    val settled = fs.map(f => Await.ready(f, Duration.Inf).value.get)
    settled.collectFirst { case scala.util.Failure(e) => throw e }: Unit
  }

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

  /** SEGMENT COMPACTION — the bound the segmented-append design needs
    * to hold over deployment AGE, not just corpus size: every append is
    * O(batch), but after K appends a reader lists K segment dirs per
    * family and its scans fragment across K small files' row groups
    * (for Bm25IndexStore, K single-row stats reads per query batch and
    * term-pruning that re-runs per small file). `compact` merges the
    * CURRENT epoch's segments into ONE new segment per family and
    * epoch-swaps it in — readers planned against the old epoch keep
    * working (commit never deletes), and the superseded fragments go at
    * the next [[vacuum]]. The Delta/Iceberg OPTIMIZE discipline, scoped
    * to one pointer file.
    *
    * `segmented`: family name → merge rewrite applied to the union of
    * its current segments (identity for plain row tables; a re-sort to
    * restore row-group pruning; a re-aggregate for additive stats
    * families). `carried`: per-epoch MONOLITHIC families (codebooks,
    * drift history) copied forward so the new epoch stays
    * self-contained; a family dir absent at the current epoch is
    * skipped (pre-telemetry stores).
    *
    * No-op (returns the current epoch, zero churn) when every segmented
    * family already holds ≤ 1 segment. Same one-writer contract as
    * append — a racing writer trips [[commitEpoch]]'s stale-read guard.
    *
    * @return the epoch now current (new on compaction, unchanged on no-op)
    */
  def compact(
      spark: SparkSession, path: String,
      segmented: Seq[(String, org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame)],
      carried: Seq[String] = Seq.empty): Long = {
    val cur = requireEpoch(spark, path, "store (compact)")
    val already = segmented.forall { case (n, _) =>
      readSegments(spark, path, n, cur).forall(_.size <= 1) }
    if (already) return cur
    val next = cur + 1
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a carried family must be monolithic: silently skipping a
    // segmented one would commit an epoch missing the family and leave
    // the store unreadable at the compacted epoch (r20 ADVICE) — check
    // every family BEFORE any rewrite starts
    carried.foreach { n =>
      require(readSegments(spark, path, n, cur).isEmpty,
        s"carried family '$n' at epoch $cur is SEGMENTED (.segs sidecar " +
          "present) — compact only carries monolithic per-epoch families; " +
          "list it under `segmented` instead")
    }
    // each family's rewrite/copy reads only the superseded epoch and
    // writes only its own new dirs — independent actions, overlapped
    // (guide §2.6) so a multi-family store pays ~one job floor per
    // compaction, not one per family; commit stays last
    EpochStore.inParallel(
      (segmented.map { case (n, rewrite) => () => {
        val df = spark.read.parquet(artifactPaths(spark, path, n, cur): _*)
        val seg = segName(n, next)
        rewrite(df).write.mode("overwrite").parquet(s"$path/$seg")
        writeSegments(spark, path, n, next, Seq(seg))
      }}: Seq[() => Unit]) ++
      carried.map { n => () => {
        val src = new Path(epochDir(path, n, cur))
        if (fs.exists(src))
          spark.read.parquet(src.toString).coalesce(1)
            .write.mode("overwrite").parquet(epochDir(path, n, next))
      }}: _*)
    commitEpoch(spark, path, next)
    next
  }

  /** Replay-pin marker files: `<KIND>BATCH_<id>` / `<KIND>PIN_<id>` in
    * the store root ([[graft.streaming.StreamingFuzzyIngest]] /
    * [[graft.streaming.StreamingIngestGate]]). CONTRACT: the FIRST long
    * in a marker pins an epoch of THE STORE THE FILE SITS IN (later
    * longs may pin other stores — the stacked gate's primary marker
    * carries both its stores' pins). [[vacuum]] reads these so it can
    * never reclaim an epoch a live replay still needs.
    */
  private val MarkerName = "^[A-Z]+(?:BATCH|PIN)_\\d+$".r

  /** Epochs pinned by replay markers in this store's root. */
  def pinnedEpochs(spark: SparkSession, path: String): Set[Long] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).iterator
      .filter(s => MarkerName.matches(s.getPath.getName))
      .flatMap(s => readLongsFile(spark, s.getPath).flatMap(_.headOption))
      .toSet
  }

  /** Drop everything that neither the CURRENT epoch nor a live replay
    * PIN ([[pinnedEpochs]] — a streaming marker not yet vacuumed)
    * references, for each artifact name. Reclaims: superseded
    * monolithic epoch dirs, superseded `.segs` sidecars, segment dirs
    * absent from every kept epoch's list, and an unreferenced legacy
    * flat `<path>/<name>` dir. Segment ids ABOVE the current epoch are
    * left alone — they may belong to an in-flight writer. Pinned
    * epochs keep their sidecar and every segment their list names, so
    * vacuum-before-marker-cleanup degrades to reclaiming less instead
    * of breaking a replay (the marker vacuum then unpins and the next
    * vacuum finishes the job). Deletion failures are non-fatal: a
    * leftover old epoch is garbage, not corruption.
    */
  def vacuum(
      spark: SparkSession, path: String, names: Seq[String]): Unit = {
    val cur = currentEpoch(spark, path)
    if (cur <= 0) return
    val mp = manifestPath(path)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pins = pinnedEpochs(spark, path).filter(_ < cur)
    names.foreach { n =>
      // names kept: every dir any kept epoch's list references (a
      // pinned epoch with no sidecar is a pre-segmentation monolithic
      // dir — keep that dir itself)
      val keep: Set[String] = (Seq(cur) ++ pins).flatMap { e =>
        readSegments(spark, path, n, e).getOrElse(Seq(s"${n}_e$e"))
      }.toSet
      val epochRe = (java.util.regex.Pattern.quote(n) + "_e(\\d+)").r
      val segsRe = (java.util.regex.Pattern.quote(n) + "_e(\\d+)\\.segs").r
      val segRe = (java.util.regex.Pattern.quote(n) + "_s(\\d+)").r
      val st = fs.globStatus(new Path(path, n + "_*"))
      if (st != null) st.foreach { s =>
        val nm = s.getPath.getName
        nm match {
          case segsRe(e) if e.toLong < cur && !pins.contains(e.toLong) =>
            fs.delete(s.getPath, false)
          case epochRe(e) if e.toLong < cur && !keep.contains(nm) =>
            fs.delete(s.getPath, true)
          case segRe(k) if k.toLong <= cur && !keep.contains(nm) =>
            fs.delete(s.getPath, true)
          case _ => ()
        }
      }
      val flat = new Path(s"$path/$n")
      if (!keep.contains(n) && fs.exists(flat)) fs.delete(flat, true)
    }
  }

  /** The committed epoch, failing loudly on an empty store. */
  def requireEpoch(spark: SparkSession, path: String, what: String): Long = {
    val e = currentEpoch(spark, path)
    require(e > 0, s"no committed $what epoch at $path")
    e
  }
}
