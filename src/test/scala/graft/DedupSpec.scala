package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("minhashPairs finds planted near-duplicates, none below threshold") {
    val pairs = Dedup.minhashPairs(docs, minJaccard = 0.5)
    assert(pairs.count() > 0) // testdata plants ~25 pairs at J >= 0.9
    assert(pairs.where(col("jaccard") < 0.5).count() === 0)
    assert(pairs.where(col("doc_a") >= col("doc_b")).count() === 0)
    // signature estimate tracks exact jaccard on strong dups
    assert(pairs.where(col("jaccard") >= 0.9 && col("est_jaccard") < 0.5).count() === 0)
  }

  test("pair operators release their internal caches before returning") {
    Dedup.minhashPairs(docs, minJaccard = 0.5).count()
    Dedup.simhashPairs(docs).count()
    Dedup.ngramJaccard(docs).count()
    // intermediate frames are persisted internally for multi-way reuse; the
    // operators must not leak them into a long-lived session's cache
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("contamination reports training docs overlapping the benchmark set") {
    import spark.implicits._
    val df = Seq(
      (0L, "one two three four five"),   // benchmark (id % 2 == 0 below)
      (1L, "zz two three four five yy"), // shares "two three four five"
      (3L, "totally different words here"),
      (5L, "one two three")              // only a 3-gram — no 4-gram overlap
    ).toDF("doc_id", "text")
    val out = Dedup.contamination(df, col("doc_id") % 2 === 0, n = 4)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
    assert(out(0).getAs[Long]("n_shared_ngrams") === 1)
    assert(out(0).getAs[Long]("n_bench_docs") === 1)
  }

  test("incrementalDedup drops corpus texts, keeps novel, collapses batch dups") {
    import spark.implicits._
    val existing = Seq((0L, "alpha beta"), (1L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta"),   // already in corpus → dropped
      (11L, "epsilon zeta"), // novel, duplicated within batch → one row, min id
      (12L, "epsilon zeta"),
      (13L, "eta theta")     // novel, unique
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(batch, existing).orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_copies"))).toSeq
      === Seq((11L, 2L), (13L, 1L)))
    // no plan reads the existing side's payload past the fingerprint map
    val plan = Dedup.incrementalDedup(batch, existing).queryExecution
      .executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"))
  }

  test("bloomIngestDedup: no false negatives, bounded false-positive loss") {
    import spark.implicits._
    val existing = Seq((0L, "alpha beta"), (1L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta"),   // already in corpus → dropped (guaranteed)
      (11L, "epsilon zeta"), // novel, duplicated within batch → one row, min id
      (12L, "epsilon zeta"),
      (13L, "eta theta")     // novel, unique (could be a rare FP drop)
    ).toDF("doc_id", "text")
    val bloomIds = Dedup.bloomIngestDedup(batch, existing)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exactIds = Dedup.incrementalDedup(batch, existing)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // one-sided error: never admits a dup the exact form would drop
    assert(bloomIds.subsetOf(exactIds))
    // at fpp=1% with 2 novel candidates, an FP drop here is ~2% likely per
    // seed — but the construction is fully deterministic, so assert equality
    assert(bloomIds === exactIds)
  }

  test("bloomIngestDedup FP rate stays near fpp on a corpus-scale batch") {
    // batch = documents with shifted ids and perturbed text (all novel);
    // existing = the corpus itself. Every drop is a false positive.
    val existing = docs.select("doc_id", "text")
    val batch = existing.select((col("doc_id") + 500000).as("doc_id"),
      concat(col("text"), lit(" novel-suffix")).as("text"))
    val survivors = Dedup.bloomIngestDedup(batch, existing, fpp = 0.01).count()
    val total = batch.count()
    val fpRate = 1.0 - survivors.toDouble / total
    assert(fpRate <= 0.03, s"false-positive rate $fpRate exceeds 3×fpp")
    // map-side batch filter: the sketch enters as a scalar subquery and the
    // might_contain filter pushes below the canon groupBy onto the scan —
    // batch rows are dropped BEFORE the within-batch dedup shuffle, and the
    // corpus side never joins the batch at all
    val plan = Dedup.bloomIngestDedup(batch, existing, fpp = 0.01)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain(Subquery"),
      s"expected the sketch as a scalar-subquery filter:\n$plan")
    assert(!plan.contains("Join"), s"no join expected in:\n$plan")
  }

  test("exact duplicate text yields jaccard 1 pair") {
    val two = docs.limit(1).select(col("doc_id"), col("text"))
      .union(docs.limit(1).select(col("doc_id") + 1000000, col("text")))
    val pairs = Dedup.minhashPairs(two)
    assert(pairs.count() === 1)
    assert(pairs.head().getAs[Double]("jaccard") === 1.0)
    assert(pairs.head().getAs[Double]("est_jaccard") === 1.0)
  }

  test("simhashPairs is exact for hamming <= 3 (matches all-pairs scan)") {
    val banded = Dedup.simhashPairs(docs, maxHamming = 3)
    val s = Dedup.simhash(docs)
    val all = s.as("a").join(s.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .where(col("hamming") <= 3)
    assert(banded.except(all).count() === 0)
    assert(all.except(banded).count() === 0) // pigeonhole: full recall
  }

  test("ngramJaccard pairs agree with minhash on strong duplicates") {
    val ng = Dedup.ngramJaccard(docs, minJaccard = 0.5).select("doc_a", "doc_b")
    val mh = Dedup.minhashPairs(docs, minJaccard = 0.5).select("doc_a", "doc_b")
    // exact inverted-index scan must cover everything banding found
    assert(mh.except(ng).count() === 0)
  }

  test("ngramContainment catches a doc embedded in a larger one that jaccard misses") {
    import spark.implicits._
    val small = (1 to 12).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val big = small + " " + (1 to 300).map(i => s"filler$i pad$i more$i").mkString(" ")
    val df = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    // containment sees the embedding (small ⊂ big ⇒ containment ≈ 1)...
    val cont = Dedup.ngramContainment(df, minContainment = 0.6, maxDf = 100).collect()
    assert(cont.length === 1)
    assert(cont.head.getAs[Long]("doc_a") === 1L)
    assert(cont.head.getAs[Double]("containment") > 0.9)
    // ...while symmetric jaccard scores the same pair far below threshold
    val j = Dedup.ngramJaccard(df, minJaccard = 0.3, maxDf = 100).count()
    assert(j === 0)
  }

  test("ngramScores single pass reproduces both standalone scorers") {
    val both = Dedup.ngramScores(docs, minJaccard = 0.3, minContainment = 0.5)
    val j = Dedup.ngramJaccard(docs, minJaccard = 0.3)
    val c = Dedup.ngramContainment(docs, minContainment = 0.5)

    // every standalone hit appears in the dual pass with the same score
    val missJ = j.select("doc_a", "doc_b", "jaccard")
      .except(both.select("doc_a", "doc_b", "jaccard")).count()
    val missC = c.select("doc_a", "doc_b", "containment")
      .except(both.select("doc_a", "doc_b", "containment")).count()
    assert(missJ === 0 && missC === 0)
    // and nothing beyond the union of the two survives
    val extra = both.select("doc_a", "doc_b")
      .except(j.select("doc_a", "doc_b").union(c.select("doc_a", "doc_b"))).count()
    assert(extra === 0)
  }

  test("dupSpans finds a shared passage at the right offsets, ignores within-doc repeats") {
    import spark.implicits._
    val passage = (1 to 20).map(i => s"shared$i").mkString(" ")
    val df = Seq(
      (1L, "intro one two three " + passage),                   // passage at token 5
      (2L, passage + " totally different tail here"),           // passage at token 1
      (3L, "unrelated " + passage.replace("shared", "other")),  // no overlap
      // within-doc repetition only — must NOT be reported (distinct docs < 2)
      (4L, ("again " * 40).trim))
      .toDF("doc_id", "text")
    val spans = Dedup.dupSpans(df, w = 15, stride = 1, minDocs = 2)
    val byDoc = spans.collect().groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.contains(1L) && byDoc.contains(2L))
    assert(!byDoc.contains(3L) && !byDoc.contains(4L))
    // doc 2's copy starts w-strides earlier: offsets differ by the prefix
    val starts1 = byDoc(1L).map(_.getAs[Long]("span_start")).sorted
    val starts2 = byDoc(2L).map(_.getAs[Long]("span_start")).sorted
    assert(starts1.head === 5L && starts2.head === 1L)
    assert(starts1.length === starts2.length) // same number of shared windows
    // every reported hash really occurs in both docs
    assert(spans.groupBy("span_hash").count().where(col("count") < 2).count() === 0)
  }

  test("stripDupSpans removes the shared passage and keeps unique content in place") {
    import spark.implicits._
    val passage = (1 to 20).map(i => s"shared$i").mkString(" ")
    val df = Seq(
      (1L, "intro one two three " + passage),
      (2L, passage + " totally different tail here"),
      (3L, "unrelated unique words only nothing repeats here at all"))
      .toDF("doc_id", "text")
    val out = Dedup.stripDupSpans(df, w = 15, stride = 1, minDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    // the shared passage is gone from both carriers; each doc's unique
    // prefix/suffix survives verbatim and in order
    assert(!out(1L).getAs[String]("text_clean").contains("shared"))
    assert(out(1L).getAs[String]("text_clean").startsWith("intro one two three"))
    assert(!out(2L).getAs[String]("text_clean").contains("shared"))
    assert(out(2L).getAs[String]("text_clean").endsWith("totally different tail here"))
    // untouched doc passes through whole
    assert(out(3L).getAs[String]("text_clean") ===
      "unrelated unique words only nothing repeats here at all")
    assert(out(3L).getAs[Long]("n_tokens_removed") === 0L)
    // telemetry consistent: removed = 20 shared tokens for doc 2 (whole
    // passage covered by windows starting at 1..6 with stride 1)
    assert(out(2L).getAs[Long]("n_tokens_removed") === 20L)
    assert(out(2L).getAs[Long]("n_tokens") === 24L)
  }

  test("operators are partitioning-independent") {
    val a = Dedup.minhashPairs(docs).orderBy("doc_a", "doc_b").collect()
    val b = Dedup.minhashPairs(docs.repartition(7)).orderBy("doc_a", "doc_b").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("dedupGroups labels every component member with the component min id") {
    import spark.implicits._
    // two chains and a triangle: {1,2,3,4}, {10,11}, {20,21,22}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
        (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dedupGroups(pairs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("dedupGroups matches union-find on seeded random graphs and a long chain") {
    import spark.implicits._
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct.map(x => x -> find(x)).toMap
    }
    val rnd = new scala.util.Random(7)
    // sparse random graph (many small components) + a 60-node chain
    // (the propagation worst case: convergence takes diameter rounds)
    val random = Seq.fill(150)(
      (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(e => e._1 != e._2)
    val chain = (1000L until 1060L).map(i => (i, i + 1))
    val edges = random ++ chain
    val got = Dedup.dedupGroups(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === unionFind(edges))
  }

  test("dedupGroups stays convergent and correct past the deep-round regime") {
    import spark.implicits._
    // a 30k-node path graph needs ~17 pointer-jumping rounds — inside
    // the regime where the old per-round localCheckpoint barrier's
    // driver cost DOUBLED per round (measured r14: 0.8 s -> 38 s/round
    // by round 22 on a 10^6 chain; the parquet spill barrier runs the
    // same loop flat). This spec pins correctness at that depth; the
    // flat-cost evidence lives in SCALECHECK_r14.
    val n = 30000L
    val chain = spark.range(n)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    // force the DISTRIBUTED iteration: this spec exists to exercise the
    // deep-round parquet barrier, which the r22 small-graph fast path
    // would otherwise shortcut
    spark.conf.set("spark.graft.dedupgroups.localThreshold", "0")
    try {
      val got = Dedup.dedupGroups(chain)
      assert(got.count() === n + 1)
      assert(got.where(col("group_id") =!= 0L).count() === 0,
        "every node of one chain must converge to the minimum id")
    } finally spark.conf.unset("spark.graft.dedupgroups.localThreshold")
  }

  test("dedupGroups small-graph fast path matches the distributed iteration") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val edges = (Seq.fill(300)(
      (rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
      .filter(e => e._1 != e._2) ++
      (5000L until 5080L).map(i => (i, i + 1))).toDF("doc_a", "doc_b")
    val fast = Dedup.dedupGroups(edges).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.conf.set("spark.graft.dedupgroups.localThreshold", "0")
    try {
      val iter = Dedup.dedupGroups(edges).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(fast === iter)
    } finally spark.conf.unset("spark.graft.dedupgroups.localThreshold")
  }

  test("dedupGroups spill-root resolution: param wins, then checkpoint dir, temp only local") {
    assert(Dedup.resolveSpillRoot(Some("/shared/a"), Some("/ckpt"), isLocalMaster = false)
      === "/shared/a")
    assert(Dedup.resolveSpillRoot(None, Some("/ckpt"), isLocalMaster = false) === "/ckpt")
    val tmp = Dedup.resolveSpillRoot(None, None, isLocalMaster = true)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(tmp)))
    val ex = intercept[IllegalArgumentException] {
      Dedup.resolveSpillRoot(None, None, isLocalMaster = false)
    }
    assert(ex.getMessage.contains("shared-filesystem"))
  }

  test("dedupGroups never deletes caller state in a shared spillDir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shared-ckpt")
    val sentinel = dir.resolve("precious-other-job-state.txt")
    java.nio.file.Files.writeString(sentinel, "do not delete")
    // a 5k-node chain needs ~13 rounds — past the 8 in-memory hybrid
    // generations, so the parquet slots are genuinely written and their
    // cleanup is what this spec is watching (force the iterative path —
    // the fast path would shortcut the spill machinery under test)
    val chain = spark.range(5000L)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
    spark.conf.set("spark.graft.dedupgroups.localThreshold", "0")
    val got =
      try Dedup.dedupGroups(chain, spillDir = Some(dir.toString))
      finally spark.conf.unset("spark.graft.dedupgroups.localThreshold")
    assert(got.count() === 5001L)
    assert(got.where(col("group_id") =!= 0L).count() === 0)
    assert(java.nio.file.Files.exists(sentinel),
      "the caller's own checkpoint-dir state must survive the spill cleanup")
    // the invocation's subdir keeps only the fault-tolerant result files
    // the returned frame reads from — intermediate slots are reclaimed
    val sub = java.nio.file.Files.list(dir).filter(p =>
      p.getFileName.toString.startsWith("dedupgroups-")).toArray
    assert(sub.length === 1)
    val inside = java.nio.file.Files.list(
      sub(0).asInstanceOf[java.nio.file.Path]).toArray.map(_.toString)
    assert(inside.exists(_.endsWith("/result")))
    assert(!inside.exists(_.contains("labels_")))
  }

  test("concurrent dedupGroups invocations sharing one spillDir stay isolated") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = java.nio.file.Files.createTempDirectory("graft-shared-ckpt2").toString
    // the subject is the ITERATIVE path's spill isolation — force it
    spark.conf.set("spark.graft.dedupgroups.localThreshold", "0")
    try {
      val a = Future(Dedup.dedupGroups(
        Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b"),
        spillDir = Some(dir)).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq)
      val b = Future(Dedup.dedupGroups(
        Seq((10L, 11L), (12L, 11L)).toDF("doc_a", "doc_b"),
        spillDir = Some(dir)).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq)
      assert(Await.result(a, 300.seconds) ===
        Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
      assert(Await.result(b, 300.seconds) ===
        Seq(10L -> 10L, 11L -> 10L, 12L -> 10L))
    } finally spark.conf.unset("spark.graft.dedupgroups.localThreshold")
  }

  test("dedupGroups result survives lost cached blocks (file-scan lineage)") {
    import spark.implicits._
    val pairs = Seq((5L, 6L), (6L, 7L)).toDF("doc_a", "doc_b")
    val got = Dedup.dedupGroups(pairs)
    // consume twice with a blockManager-free path between: a plain
    // file-scan result recomputes identically; a localCheckpoint-backed
    // one would depend on executor block survival
    assert(got.count() === 3)
    spark.sqlContext.clearCache()
    assert(got.orderBy("doc_id").collect().map(_.getLong(1)).toSeq ===
      Seq(5L, 5L, 5L))
  }

  test("dedupGroups over minhash pairs: canonical id is in every pair's component") {
    val pairs = Dedup.minhashPairs(docs, minJaccard = 0.5)
    val groups = Dedup.dedupGroups(pairs)
    // every paired doc got a label, and labels are component-minimal
    assert(groups.count() ===
      pairs.select(col("doc_a").as("d")).union(pairs.select(col("doc_b"))).distinct().count())
    assert(groups.where(col("group_id") > col("doc_id")).count() === 0)
  }

  private def lineDocs = {
    import spark.implicits._
    Seq(
      (1L, "unique alpha.\nshared boilerplate line.\ntail one."),
      (2L, "another start.\n  shared boilerplate line.  \n\nmore."),
      (3L, "solo text.\nsolo text.\nnothing shared here."))
      .toDF("doc_id", "text")
  }

  test("dupLines reports cross-doc recurring lines; within-doc repeats alone don't trigger") {
    val out = Dedup.dupLines(lineDocs).orderBy("doc_id").collect()
    // the shared boilerplate line is line 2 of both docs (trimmed match);
    // doc 3's self-repeat has only one distinct doc and must not appear
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("line_no"))).toSeq
      === Seq((1L, 2L), (2L, 2L)))
    assert(out.forall(_.getAs[Long]("n_docs") == 2L))
  }

  test("stripDupLines removes recurring lines in place, keeps blanks and unique content") {
    val out = Dedup.stripDupLines(lineDocs).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("text_clean") === "unique alpha.\ntail one.")
    // blank separator survives; only the hot line is gone
    assert(out(2L).getAs[String]("text_clean") === "another start.\n\nmore.")
    assert(out(2L).getAs[Long]("n_lines") === 3L)
    assert(out(2L).getAs[Long]("n_lines_removed") === 1L)
    // untouched doc: nothing removed, text re-joins to its trimmed lines
    assert(out(3L).getAs[Long]("n_lines_removed") === 0L)
    assert(out(3L).getAs[String]("text_clean")
      === "solo text.\nsolo text.\nnothing shared here.")
  }

  test("ngramIndexDedup flags batch docs contained in the indexed corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "completely different corpus content sits here quietly")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta trailing"), // near-copy of 1
      (11L, "wholly novel text with no overlap at all present")
    ).toDF("doc_id", "text")
    val out = Dedup.ngramIndexDedup(batch, Dedup.ngramIndex(corpus),
      minContainment = 0.5).collect()
    assert(out.map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id"))).toSeq
      === Seq((10L, 1L)))
    // 6 of the batch doc's 7 shingles are the corpus doc's 6
    assert(out(0).getAs[Long]("inter") === 6L)
    assert(out(0).getAs[Long]("nb") === 7L)
  }

  test("dupLines/stripDupLines release their internal caches") {
    Dedup.dupLines(lineDocs).count()
    Dedup.stripDupLines(lineDocs).count()
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("lshPairVolume prices the candidate join exactly, and a boilerplate cluster shows up hot") {
    import spark.implicits._
    // constructed corpus where the truth is countable by hand: 4 identical
    // boilerplate docs + 3 docs sharing no 3-shingle with anything. The
    // boilerplate cluster collides in EVERY band (identical signatures) →
    // exactly C(4,2) = 6 pairs per band from a max-width-4 bucket; the
    // distinct docs add singleton buckets and zero pairs.
    val boiler = (1L to 4L).map(i =>
      (i, "terms of service apply to all users of this website always"))
    val uniq = Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (12L, "one two three four five six seven eight nine ten eleven"),
      (13L, "red orange yellow green blue indigo violet crimson teal aqua"))
    val tiny = (boiler ++ uniq).toDF("doc_id", "text")
    val tv = Dedup.lshPairVolume(tiny).orderBy("b").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(tv.map(_._1).toSeq === (0 until 8))
    assert(tv.forall { case (_, _, docs, maxW, pairs) =>
      docs === 7L && maxW === 4L && pairs === 6L },
      s"boilerplate cluster not priced as C(4,2) per band: ${tv.mkString("; ")}")
    // the per-band totals bound minhashPairs' candidates: every verified
    // pair was a candidate in ≥ 1 band, so Σ cand_pairs is a superset count
    assert(Dedup.minhashPairs(tiny, minJaccard = 0.5).count() <= tv.map(_._5).sum)
    // real corpus: 8 bands present and the same superset bound holds
    val vol = Dedup.lshPairVolume(docs).orderBy("b").collect()
      .map(r => (r.getInt(0), r.getLong(4)))
    assert(vol.map(_._1).toSeq === (0 until 8))
    assert(Dedup.minhashPairs(docs).count() <= vol.map(_._2).sum)
  }

  test("dedupGroupsReclaimable: the handle reclaims exactly its own subdir") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val root = Files.createTempDirectory("graft-dgr-root").toString
    // caller state sharing the spill root must survive reclamation
    Files.write(Paths.get(root, "keepme.txt"), "x".getBytes)
    val res = Dedup.dedupGroupsReclaimable(pairs, spillDir = Some(root))
    assert(res.groups.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    // the handle names the real on-disk lineage of the returned frame
    assert(res.resultPath.startsWith(res.spillSubdir))
    assert(res.spillSubdir.startsWith(root))
    assert(Files.exists(Paths.get(res.resultPath)))
    res.reclaim()
    assert(!Files.exists(Paths.get(res.spillSubdir)))
    assert(Files.exists(Paths.get(root, "keepme.txt")))
  }
}
