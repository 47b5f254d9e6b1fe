package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line with per-query medians.
  *
  * Honesty rules (round-2 verdict #4 / #9):
  *   - full materialization: each query is written to the `noop` sink, which
  *     pays every column and keeps final sorts (a `count()` lets Catalyst
  *     prune columns and elide the ORDER BY; a hash-agg elides the sort too);
  *   - warmup run (JIT + codegen + parquet footer cache) then `reps` timed
  *     runs, median reported — single-shot numbers moved 1.35× between
  *     rounds with zero code change;
  *   - failures are reported in an `errors` field, never folded into a
  *     plausible-looking timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 5 reps: the host VM stalls sporadically (a query oscillates 2.5 s ↔
    // 60 s with no code change) — with 5, the median survives two stalled
    // reps; with 3, one stall owned 54% of round 3's headline number.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Stall handling: the host VM stalls sporadically (the same query
    // oscillates 2.5 s ↔ 60 s with no code change — confirmed by isolated
    // reruns in rounds 3/4). A rep exceeding `stallX` × the best observed
    // time is treated as a stalled run, not a measurement: it is discarded
    // and re-run, up to `maxExtra` extra reps. If the budget runs out the
    // discards stay discarded (the kept set is whatever lies within
    // stallX × min) and the query is FLAGGED when the kept median still
    // exceeds 2 × min — a stall-poisoned artifact must say so itself.
    val stallX = 3.0
    val maxExtra = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "3").toInt

    // Iteration aid: SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the run.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    var errors = Map.empty[String, String]
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .flatMap { case (name, fn) =>
      try {
        once(fn) // warmup, untimed
        var all = Vector.empty[Double]
        def kept = { val mn = all.min; all.filter(_ <= stallX * mn) }
        while (all.isEmpty || (kept.size < reps && all.size < reps + maxExtra))
          all :+= once(fn)
        val ks = kept.sorted
        // true median: even kept counts (possible after stall discards)
        // average the two middle elements instead of biasing upper-middle
        val median =
          if (ks.size % 2 == 1) ks(ks.size / 2)
          else (ks(ks.size / 2 - 1) + ks(ks.size / 2)) / 2.0
        val mn = ks.head
        Some(name -> (median, mn, all.size - ks.size, median / mn > 2.0))
      } catch {
        case e: Throwable =>
          errors += name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
          None
      }
    }

    // Build/serve SPLIT for the two entries that carry an index BUILD
    // inside their combined query (r18 watch item 3): the combined
    // number keeps reading "slow" while the serving claim is about the
    // serve half alone — so measure each half directly. Same honesty
    // rules: noop-sink materialization, one warmup, `reps` medians.
    val splitDefs: Map[String, (
        (SparkSession, String) => String,
        (SparkSession, String, String) => org.apache.spark.sql.DataFrame)] =
      Map(
        "chunk_index_search" ->
          ((SparkEntry.chunkIndexBuild _, SparkEntry.chunkIndexServe _)),
        "hybrid_chunk_search" ->
          ((SparkEntry.hybridChunkBuild _, SparkEntry.hybridChunkServe _)))
    // Each build() founds a fresh temp index store; without eager cleanup
    // a full bench accretes 2 × (reps + 1) chunk-embedding stores on the
    // temp volume for the session's whole life (the JVM-exit hook only
    // reclaims them at the very end) — so each store is deleted as soon
    // as its serve half has been timed.
    def rmStore(d: String): Unit = scala.util.Try {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(d))
    }: Unit
    val splits = splitDefs
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .filter { case (name, _) => !errors.contains(name) }
      .flatMap { case (name, (build, serve)) =>
        try {
          val store = build(spark, sfDir) // warmup build (footer cache, JIT)
          serve(spark, sfDir, store)
            .write.format("noop").mode("overwrite").save()
          rmStore(store)
          val timed = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            val st = build(spark, sfDir)
            val t1 = System.nanoTime()
            serve(spark, sfDir, st)
              .write.format("noop").mode("overwrite").save()
            val t2 = System.nanoTime()
            rmStore(st)
            ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
          }
          def med(xs: Seq[Double]) = {
            val s = xs.sorted
            if (s.size % 2 == 1) s(s.size / 2)
            else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
          }
          Some(name -> (med(timed.map(_._1)), med(timed.map(_._2))))
        } catch {
          case e: Throwable =>
            errors += s"split:$name" ->
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            None
        }
      }

    // CONTRAST entries (r19 verdict task 7): standalone one-shot forms
    // that re-derive a shared artifact inside their own plan — here the
    // shingle inverted index that ngram_scores/ngram_index_dedup persist
    // in deployment (Dedup.ngramIndex). Their medians price the
    // from-scratch query, NOT the deployment loop (which builds the
    // index once and serves batches from it — ngram_index_dedup is that
    // row); they stay in the bench as labelled contrast shapes, like the
    // quadratic ScaleCheck baselines.
    val contrast = Seq("ngram_jaccard", "ngram_containment")
      .filter(results.contains)

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:${v._1}" }.mkString("{", ",", "}")
    val qmin = results.map { case (k, v) => s"${jstr(k)}:${v._2}" }.mkString("{", ",", "}")
    // discarded: stalled reps dropped per query; stalled: queries whose kept
    // median STILL exceeds 2× min after discards (retry budget exhausted) —
    // numbers to distrust, by the artifact's own admission.
    val disc = results.collect { case (k, v) if v._3 > 0 => s"${jstr(k)}:${v._3}" }
      .mkString("{", ",", "}")
    val stalled = results.collect { case (k, v) if v._4 => jstr(k) }
      .mkString("[", ",", "]")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val sp = splits.map { case (k, (b, v)) =>
      s"${jstr(k)}:{\"build_s\":$b,\"serve_s\":$v}" }.mkString("{", ",", "}")
    val ce = contrast.map(jstr).mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$qmin,"splits":$sp,"contrast":$ce,"discarded":$disc,"stalled":$stalled,"errors":$es,"reps":$reps,"sf":"${sfDir}"}"""
    println(json)
    // Also write the artifact to a file: round 8's committed BENCH json was a
    // truncated stdout tail that permanently lost 7 queries' medians. The
    // file is the durable record; stdout stays for the driver's capture.
    // A SUBSET run (BENCH_ONLY set) writes a sibling file instead — a
    // focused iteration pass must never clobber the committed full-run
    // artifact (it did once, restored from git). r22: FULL ad-hoc runs
    // default to a non-committed sibling too — the r21 driver's post-close
    // rerun silently clobbered the committed close artifact (VERDICT r21
    // "What's wrong" #2); producing the committed bench_out.json now takes
    // an explicit SPARK_GRAFT_BENCH_OUT=bench_out.json.
    val defaultOut =
      if (only.isDefined) "bench_out_partial.json" else "bench_out_last.json"
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut))
    java.nio.file.Files.write(outPath,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // A SECOND, short, FINAL summary line (r21 verdict "What's wrong" #1):
    // the full per-query line above is ~7 KB and the driver artifact keeps
    // only a ~2 KB stdout tail, so the full line arrives front-truncated
    // and has parsed as null every round since r01. This line always fits
    // the tail; the full line and the bench_out file remain the durable
    // per-query record. Measurement methodology is unchanged — this is
    // pure reporting.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"n_errors":${errors.size},"n_stalled":${results.count(_._2._4)},"reps":$reps,"sf":"$sfDir","file":"$outPath"}""")
    spark.stop()
  }
}
