package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("cosine of a vector with itself is 1") {
    val e = emb.select(col("vec_id"), Similarity.vec(col("embedding")).as("v"))
    val bad = e
      .withColumn("cos",
        Similarity.dot(col("v"), col("v")) /
          (Similarity.l2norm(col("v")) * Similarity.l2norm(col("v"))))
      .where(abs(col("cos") - 1.0) > 1e-9)
      .count()
    assert(bad === 0)
  }

  test("embedCosineDup emits ordered pairs above threshold") {
    val pairs = Similarity.embedCosineDup(emb, threshold = 0.3)
    assert(pairs.where(col("id_a") >= col("id_b")).count() === 0)
    assert(pairs.where(col("cosine") < 0.3).count() === 0)
  }

  test("annTopK returns k ranked neighbors per query, excluding self") {
    val res = Similarity.annTopK(emb, col("vec_id") % 100 === 0, k = 5)
    val perQuery = res.groupBy("query_id").count()
    assert(perQuery.where(col("count") =!= 5).count() === 0)
    assert(res.where(col("neighbor_id") === col("query_id")).count() === 0)
    // ranks are 1..k and cosine is non-increasing in rank
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy("rank")
    val viol = res
      .withColumn("prev", lag(col("cosine"), 1).over(w))
      .where(col("prev").isNotNull && col("prev") < col("cosine"))
      .count()
    assert(viol === 0)
  }

  test("SQ8: valid codes, small reconstruction error, near-exact recall@10") {
    val enc = Similarity.embedSq(emb)
    assert(enc.count() === emb.count())
    // every code in [0, 255]; error is a non-negative squared fold
    assert(enc.where(exists(col("codes"), c => c < 0 || c > 255)).count() === 0)
    assert(enc.where(col("recon_err2") < 0).count() === 0)
    val qf = col("vec_id") % 20 === 0
    val truth = Similarity.annTopK(emb, qf, k = 10)
      .select("query_id", "neighbor_id")
    val nTruth = truth.count().toDouble
    val sqRecall = Similarity.sqSearch(emb, qf, kNN = 10)
      .select("query_id", "neighbor_id").intersect(truth).count() / nTruth
    info(f"recall@10 — sq8 asymmetric: $sqRecall%.3f")
    // an int8 grid perturbs 64-dim distances far less than neighbor gaps:
    // SQ must sit way above the PQ family's quantization-noise recall
    assert(sqRecall > 0.8, s"sq8 recall floor: $sqRecall")
  }

  test("measured recall@10: multi-probe lifts LSH/IVF; PQ ADC ranks usably") {
    // Ground truth: exact top-10 per query from the brute-force baseline.
    val qf = col("vec_id") % 20 === 0
    val truth = Similarity.annTopK(emb, qf, k = 10)
      .select("query_id", "neighbor_id")
    val nTruth = truth.count().toDouble
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      approx.select("query_id", "neighbor_id").intersect(truth).count() / nTruth
    val lsh1 = recall(Similarity.annLsh(emb, qf, k = 10, planes = 4))
    val lsh2 = recall(Similarity.annLsh(emb, qf, k = 10, planes = 4, nprobe = 3))
    val ivf1 = recall(Similarity.annIvf(emb, qf, k = 10, centEvery = 40))
    val ivf2 = recall(Similarity.annIvf(emb, qf, k = 10, centEvery = 40, nprobe = 3))
    val pqDefault = recall(Similarity.pqSearch(emb, qf, kNN = 10))
    val trained = Similarity.trainPqCodebook(emb)
    val pqTrained = recall(Similarity.pqSearch(emb, qf, kNN = 10, codebook = Some(trained)))
    // trained IVF codebook with the same cell count the sampled path
    // yields at this SF (500 vectors, vec_id % 40 == 1 ⇒ 13 centroids),
    // so the comparison is apples to apples
    val nCells = Similarity.trainIvfCodebook(emb, k = 13)
    val ivfTrained = recall(Similarity.annIvf(emb, qf, k = 10, codebook = Some(nCells)))
    val ivfTrained3 = recall(
      Similarity.annIvf(emb, qf, k = 10, nprobe = 3, codebook = Some(nCells)))
    // the IVFADC composition: same probes as ivf1/ivf2, ADC-quantized ranks
    val ivfpq1 = recall(Similarity.ivfPqSearch(emb, qf, kNN = 10, centEvery = 40))
    val ivfpq3 = recall(Similarity.ivfPqSearch(emb, qf, kNN = 10, centEvery = 40, nprobe = 3))
    val ivfpqTrained3 = recall(Similarity.ivfPqSearch(emb, qf, kNN = 10, nprobe = 3,
      ivfCodebook = Some(nCells), pqCodebook = Some(trained)))
    val ivfpqResid3 = recall(Similarity.ivfPqSearch(emb, qf, kNN = 10, centEvery = 40,
      nprobe = 3, residual = true))
    val ivfpqResidTrained3 = recall(Similarity.ivfPqSearch(emb, qf, kNN = 10, nprobe = 3,
      ivfCodebook = Some(nCells), pqCodebook = Some(trained), residual = true))
    info(f"recall@10 — lsh: $lsh1%.3f, lsh probe3: $lsh2%.3f, " +
      f"ivf: $ivf1%.3f, ivf probe3: $ivf2%.3f, " +
      f"ivf trained: $ivfTrained%.3f, trained probe3: $ivfTrained3%.3f, " +
      f"pq-adc default: $pqDefault%.3f, trained: $pqTrained%.3f, " +
      f"ivfpq: $ivfpq1%.3f, probe3: $ivfpq3%.3f, trained probe3: $ivfpqTrained3%.3f, " +
      f"resid probe3: $ivfpqResid3%.3f, resid trained probe3: $ivfpqResidTrained3%.3f")
    // multi-probe must not lose recall, and should find something extra here
    assert(lsh2 >= lsh1 && ivf2 >= ivf1)
    assert(lsh2 > 0.2 && ivf2 > 0.2, s"multi-probe recall floor: lsh2=$lsh2 ivf2=$ivf2")
    // the k-means codebook must beat the md5-random one it replaces — the
    // measured justification for trainPqCodebook existing at all
    assert(pqTrained > pqDefault, s"trained $pqTrained vs default $pqDefault")
    // k-means cells must not LOSE recall vs arbitrary corpus-point cells
    // at matched cell count (and multi-probe composes with them)
    assert(ivfTrained >= ivf1, s"trained IVF $ivfTrained vs sampled $ivf1")
    assert(ivfTrained3 >= ivfTrained)
    // IVFADC: the composed index finds true neighbors at all through the
    // double approximation (probed cells × quantized ranks). NOTE multi-
    // probe is NOT monotone here, unlike exact-cosine IVF: extra cells add
    // candidates whose md5-random-codebook ADC ranks are noisy enough to
    // displace true neighbors from the top-10 (measured 0.100 → 0.068) —
    // rank quality, not candidate coverage, gates composed recall, which
    // is exactly why IVFADC deployments train the PQ codebook.
    assert(ivfpq1 > 0.0, s"ivfpq found nothing: $ivfpq1")
    // the trained PQ codebook must recover what the random one loses —
    // the measured justification for the trained path through the
    // composed plan (0.068 random → ~0.29 trained at probe 3)
    assert(ivfpqTrained3 > ivfpq3, s"trained ivfpq $ivfpqTrained3 vs random $ivfpq3")
    assert(ivfpqTrained3 > 0.2, s"trained ivfpq recall floor: $ivfpqTrained3")
    // residual encoding (full IVFADC) must not lose recall at the same
    // codebook, and with the trained codebook it must WIN — residuals
    // have smaller variance, so the same codebook quantizes them tighter
    // (0.288 → 0.340 measured; the justification for the residual path)
    assert(ivfpqResid3 >= ivfpq3, s"residual $ivfpqResid3 vs raw $ivfpq3")
    assert(ivfpqResidTrained3 > ivfpqTrained3,
      s"residual trained $ivfpqResidTrained3 vs raw trained $ivfpqTrained3")
  }

  test("annLsh results are a subset of brute-force scoring, same bucket only") {
    val exact = Similarity.annTopK(emb, col("vec_id") % 100 === 0, k = 1000)
      .select("query_id", "neighbor_id", "cosine")
    val lsh = Similarity.annLsh(emb, col("vec_id") % 100 === 0, k = 5, planes = 3)
      .select("query_id", "neighbor_id", "cosine")
    // every LSH (query, neighbor, cosine) appears in the exact scoring
    assert(lsh.except(exact).count() === 0)
  }

  test("annIvf results are a subset of brute-force scoring") {
    val exact = Similarity.annTopK(emb, col("vec_id") % 100 === 0, k = 1000)
      .select("query_id", "neighbor_id", "cosine")
    val ivf = Similarity.annIvf(emb, col("vec_id") % 100 === 0, k = 5, centEvery = 20)
      .select("query_id", "neighbor_id", "cosine")
    assert(ivf.count() > 0)
    assert(ivf.except(exact).count() === 0)
  }

  test("bucketed embedCosineDup is a subset of the exact all-pairs result") {
    val exact = Similarity.embedCosineDup(emb, threshold = 0.3, exact = true)
    val bucketed = Similarity.embedCosineDup(emb, threshold = 0.3)
    assert(bucketed.count() > 0)
    // every bucketed pair (ids + cosine) appears in the exact result
    assert(bucketed.except(exact).count() === 0)
  }

  test("annTopK two-phase top-k is exact under any partitioning") {
    val base = Similarity.annTopK(emb, col("vec_id") % 100 === 0, k = 5).collect().toSeq
    val repart = Similarity.annTopK(emb.repartition(13), col("vec_id") % 100 === 0, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(base.sortBy(r => (r.getLong(0), r.getLong(2))) === repart)
  }

  test("multi-probe LSH widens the candidate set, never shrinks it") {
    val p1 = Similarity.annLsh(emb, col("vec_id") % 100 === 0, k = 1000, planes = 4)
      .select("query_id", "neighbor_id", "cosine")
    val p2 = Similarity.annLsh(emb, col("vec_id") % 100 === 0, k = 1000, planes = 4,
      nprobe = 2)
      .select("query_id", "neighbor_id", "cosine")
    // with k beyond any bucket size, nprobe=2 results ⊇ nprobe=1 results
    assert(p1.except(p2).count() === 0)
    assert(p2.count() >= p1.count())
  }

  test("multi-probe IVF widens the candidate set, never shrinks it") {
    val p1 = Similarity.annIvf(emb, col("vec_id") % 100 === 0, k = 1000, centEvery = 20)
      .select("query_id", "neighbor_id", "cosine")
    val p2 = Similarity.annIvf(emb, col("vec_id") % 100 === 0, k = 1000, centEvery = 20,
      nprobe = 2)
      .select("query_id", "neighbor_id", "cosine")
    assert(p1.except(p2).count() === 0)
    assert(p2.count() >= p1.count())
  }

  test("pqEncode emits one bounded code per subspace, partitioning-independent") {
    val enc = Similarity.pqEncode(emb, m = 8, k = 16)
    val rows = enc.orderBy("vec_id").collect()
    assert(rows.length === emb.count())
    rows.foreach { r =>
      val codes = r.getString(1).split(":").map(_.toInt)
      assert(codes.length === 8)
      assert(codes.forall(c => c >= 0 && c < 16))
      assert(r.getDouble(2) >= 0.0)
    }
    val repart = Similarity.pqEncode(emb.repartition(7), m = 8, k = 16)
      .orderBy("vec_id").collect()
    assert(rows.toSeq === repart.toSeq)
  }

  test("trained PQ codebook lowers reconstruction error through the same plan") {
    val trained = Similarity.trainPqCodebook(emb, m = 8, k = 16, sampleN = 1000)
    assert(trained.length === 8 * 16 * 8)
    val base = Similarity.pqEncode(emb, m = 8, k = 16)
      .agg(sum("recon_err")).head().getDouble(0)
    val tuned = Similarity.pqEncode(emb, m = 8, k = 16, codebook = Some(trained))
      .agg(sum("recon_err")).head().getDouble(0)
    // k-means on the corpus sample must beat the hash-random codebook
    assert(tuned < base)
    // codes stay bounded and partitioning-independent under the trained book
    val rows = Similarity.pqEncode(emb, m = 8, k = 16, codebook = Some(trained))
      .orderBy("vec_id").collect()
    rows.foreach { r =>
      val codes = r.getString(1).split(":").map(_.toInt)
      assert(codes.forall(c => c >= 0 && c < 16))
    }
    val repart = Similarity.pqEncode(emb.repartition(7), m = 8, k = 16,
      codebook = Some(trained)).orderBy("vec_id").collect()
    assert(rows.toSeq === repart.toSeq)
  }

  test("pqSearch ranks by ADC distance, exact rank contract as annTopK") {
    val res = Similarity.pqSearch(emb, col("vec_id") % 100 === 0, kNN = 5)
    val perQuery = res.groupBy("query_id").count()
    assert(perQuery.where(col("count") =!= 5).count() === 0)
    assert(res.where(col("neighbor_id") === col("query_id")).count() === 0)
    // distance non-decreasing in rank
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy("rank")
    val viol = res.withColumn("prev", lag(col("approx_dist2"), 1).over(w))
      .where(col("prev").isNotNull && col("prev") > col("approx_dist2"))
      .count()
    assert(viol === 0)
    // deterministic under repartitioning
    val repart = Similarity.pqSearch(emb.repartition(13), col("vec_id") % 100 === 0, kNN = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(res.orderBy("query_id", "rank").collect().toSeq === repart)
  }

  test("ivfPqSearch: IVFADC contract — ranked ADC, candidates confined to probed cells") {
    val qf = col("vec_id") % 100 === 0
    val res = Similarity.ivfPqSearch(emb, qf, kNN = 5, centEvery = 20)
    assert(res.where(col("neighbor_id") === col("query_id")).count() === 0)
    // ADC distance non-decreasing in rank
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy("rank")
    val viol = res.withColumn("prev", lag(col("approx_dist2"), 1).over(w))
      .where(col("prev").isNotNull && col("prev") > col("approx_dist2"))
      .count()
    assert(viol === 0)
    // the composed index = IVF candidate set ∩ PQ scoring: every IVFADC
    // (query, neighbor) comes from the query's probed cell (the annIvf
    // candidate set at the same codebook), and its adist matches what
    // pqSearch computed for the same pair (k beyond any cell size ⇒ both
    // frames enumerate their full candidate sets)
    val ivfCands = Similarity.annIvf(emb, qf, k = 100000, centEvery = 20)
      .select("query_id", "neighbor_id")
    val pqAll = Similarity.pqSearch(emb, qf, kNN = 100000)
      .select("query_id", "neighbor_id", "approx_dist2")
    assert(res.select("query_id", "neighbor_id").except(ivfCands).count() === 0)
    assert(res.select("query_id", "neighbor_id", "approx_dist2").except(pqAll).count() === 0)
    // multi-probe widens, never shrinks
    val p2 = Similarity.ivfPqSearch(emb, qf, kNN = 100000, centEvery = 20, nprobe = 2)
      .select("query_id", "neighbor_id")
    assert(res.select("query_id", "neighbor_id").except(p2).count() === 0)
    // deterministic under repartitioning
    val base = res.orderBy("query_id", "rank").collect().toSeq
    val repart = Similarity.ivfPqSearch(emb.repartition(13), qf, kNN = 5, centEvery = 20)
      .orderBy("query_id", "rank").collect().toSeq
    assert(base === repart)
    // single-window top-k, capped map-side: rank <= kNN must compile to
    // WindowGroupLimit Partial (below the exchange) + Final, so a skewed
    // cell at high nprobe cannot concentrate one query's candidates in a
    // single window sort — and no manual second window phase remains
    val plan = res.queryExecution.executedPlan.toString
    val limits = "WindowGroupLimit".r.findAllIn(plan).length
    assert(limits === 2, s"expected Partial+Final WindowGroupLimit, plan had $limits:\n$plan")
    assert("Window".r.findAllIn(plan).length === 3,
      s"expected one Window + Partial/Final limits:\n$plan")
  }

  test("similarity operators yield empty results on an empty frame (no throw)") {
    val empty = emb.where(lit(false))
    assert(Similarity.annLsh(empty, col("vec_id") % 100 === 0, nprobe = 2).count() === 0)
    assert(Similarity.embedCosineDup(empty).count() === 0)
    assert(Similarity.annTopK(empty, col("vec_id") % 100 === 0).count() === 0)
    assert(Similarity.annIvf(empty, col("vec_id") % 100 === 0).count() === 0)
    assert(Similarity.ivfPqSearch(empty, col("vec_id") % 100 === 0).count() === 0)
  }

  test("lsh plane count scales with the corpus-count hint") {
    // test-SF corpora keep the long-standing default
    assert(Similarity.planesFor(1) === 4)
    assert(Similarity.planesFor(1000) === 4)
    // 64 vectors per bucket ⇒ planes = log2(n/64)
    assert(Similarity.planesFor(64L << 10) === 10)
    assert(Similarity.planesFor(64L << 24) === 24)
    // monotone: more corpus, never fewer buckets
    val grid = Seq(1L, 1000L, 100000L, 10000000L, 1000000000L)
    grid.sliding(2).foreach { case Seq(a, b) =>
      assert(Similarity.planesFor(a) <= Similarity.planesFor(b))
    }
    // the hint wires through annLsh and stays a subset of exact scoring
    val exact = Similarity.annTopK(emb, col("vec_id") % 100 === 0, k = 1000)
      .select("query_id", "neighbor_id", "cosine")
    val hinted = Similarity.annLsh(emb, col("vec_id") % 100 === 0, k = 5,
        corpusHint = Some(emb.count()))
      .select("query_id", "neighbor_id", "cosine")
    assert(hinted.except(exact).count() === 0)
  }

  test("planesFor matches the oracle's double-math derivation at every corpus size") {
    // the hinted-plan oracles derive planes in SQL doubles, while Scala
    // uses an integer bit trick — any size where the two disagree would
    // silently hash-break the gate AT THAT CORPUS SIZE only. The raw
    // ceil(log2(b)) form DID diverge (this sweep caught it: at
    // n = 2^35, double log2(2^29) lands ε above 29 → 30 planes vs
    // Scala's 29), so the oracle applies a power-of-two correction —
    // replayed here — that is robust to ε in either direction. Sweep
    // densely around every power-of-two bucket boundary plus a coarse
    // grid to 10^12.
    def sqlForm(n: Long): Int = {
      val b = math.ceil(n / 64.0)
      val c = math.ceil(math.log(b) / math.log(2.0)).toInt
      math.max(4, if (c >= 1 && math.pow(2.0, c - 1.0) >= b) c - 1 else c)
    }
    val boundary = for {
      e <- 0 to 40
      d <- -2L to 2L
      n = (1L << e) * 64 + d * 64
      if n >= 1
    } yield n
    val coarse = Iterator.iterate(1L)(x => (x * 37) / 10 + 1)
      .takeWhile(_ <= 1000000000000L).toSeq
    (boundary ++ coarse).foreach { n =>
      assert(Similarity.planesFor(n) === sqlForm(n),
        s"planesFor diverges from the oracle derivation at n=$n")
    }
  }

  test("dot product expression matches the higher-order-function fold bitwise") {
    val hof = emb.select(col("vec_id"),
      aggregate(zip_with(Similarity.vec(col("embedding")), Similarity.vec(col("embedding")),
        (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("d"))
    val cg = emb.select(col("vec_id"),
      Similarity.dot(Similarity.vec(col("embedding")), Similarity.vec(col("embedding"))).as("d"))
    // bit-identical, not approximately equal: same sequential fold order
    assert(hof.except(cg).count() === 0)
    assert(cg.except(hof).count() === 0)
  }

  test("lsh bucket assignment is partitioning-independent") {
    val e = emb.select(col("vec_id"), Similarity.vec(col("embedding")).as("v"))
    val a = e.withColumn("b", Similarity.lshBucket(col("v"), 4, 64)).orderBy("vec_id").collect()
    val b = e.repartition(7).withColumn("b", Similarity.lshBucket(col("v"), 4, 64))
      .orderBy("vec_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("knnGraph: exact edges are dense and ranked; banded LSH recalls a usable subset") {
    val n = emb.count()
    val exact = Similarity.knnGraph(emb, k = 3, exact = true)
    // every vector is a query with exactly k edges (corpus >> k), no self
    // edges, ranks 1..k with non-increasing cosine
    assert(exact.count() === n * 3)
    assert(exact.where(col("neighbor_id") === col("query_id")).count() === 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy("rank")
    assert(exact.withColumn("prev", lag(col("cosine"), 1).over(w))
      .where(col("prev").isNotNull && col("prev") < col("cosine")).count() === 0)
    val lsh = Similarity.knnGraph(emb, k = 3, bands = 2, planes = 4)
    // LSH never exceeds k edges per query, and a banded pair is counted
    // once even when it collides in both bands
    assert(lsh.groupBy("query_id").count().where(col("count") > 3).count() === 0)
    assert(lsh.groupBy("query_id", "neighbor_id").count()
      .where(col("count") > 1).count() === 0)
    // measured edge recall vs exact truth — loose bound, 2 bands × 4 planes
    val truth = exact.select("query_id", "neighbor_id")
    val recall = lsh.select("query_id", "neighbor_id").intersect(truth).count()
      .toDouble / truth.count()
    assert(recall > 0.25, s"knnGraph LSH edge recall $recall")
  }

  test("docEmbed: bag-of-words hashing is order-insensitive, deterministic, zero-vectors dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "zeta epsilon delta gamma beta alpha"), // same multiset, shuffled
      (3L, "totally different words over here now")
    ).toDF("doc_id", "text")
    val e = Similarity.docEmbed(df, dim = 8)
    val vecs = e.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getSeq[Double](r.fieldIndex("embedding")).toList).toMap
    assert(vecs(1L).length === 8)
    // bag-of-words: token order cannot matter
    assert(vecs(1L) === vecs(2L))
    assert(vecs(1L) !== vecs(3L))
    // identical-multiset docs are each other's cosine-1 nearest neighbor
    val knn = Similarity.knnGraph(e, k = 1, exact = true).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toMap
    assert(knn(1L) === (2L, 1.0))
    assert(knn(2L) === (1L, 1.0))
    // partitioning-independence
    val a = e.orderBy("vec_id").collect().toSeq
    val b = Similarity.docEmbed(df.repartition(7), dim = 8).orderBy("vec_id").collect().toSeq
    assert(a === b)
  }

  test("recallAtK: identity is 1, disjoint is 0, partial overlap exact; missed queries surface") {
    import spark.implicits._
    val exact = Seq(
      (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
      (2L, 21L), (2L, 22L),
      (3L, 31L)).toDF("query_id", "neighbor_id")
    // query 1: 2 of 4 recovered; query 2: full; query 3: missed entirely
    // (still a row — the exact baseline defines the denominator); the
    // approx-only pair (2, 99) and approx-only query 4 never count
    val approx = Seq(
      (1L, 11L), (1L, 13L), (1L, 99L),
      (2L, 21L), (2L, 22L), (2L, 99L),
      (4L, 41L)).toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(approx, exact).orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, 2L, 4L, 0.5), (2L, 2L, 2L, 1.0), (3L, 0L, 1L, 0.0)))
    // duplicated (query_id, neighbor_id) rows in either input must not
    // fan the join out and inflate hits/exact_k past k
    val dup = Similarity.recallAtK(
        approx.unionByName(approx), exact.unionByName(exact))
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(dup.toSeq === got.toSeq)
    // the live dial: IVF nprobe=2 vs the brute-force baseline on the
    // test embeddings — recall is a valid ratio and macro-averages above
    // the spec'd multi-probe floor
    val qf = col("vec_id") % 50 === 0
    val live = Similarity.recallAtK(
      Similarity.annIvf(emb, qf, k = 5, centEvery = 40, nprobe = 2),
      Similarity.annTopK(emb, qf, k = 5))
    val rows = live.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val rec = r.getAs[Double]("recall")
      rec >= 0.0 && rec <= 1.0 && r.getAs[Long]("exact_k") === 5L })
    val macroAvg = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(macroAvg > 0.3, s"ivf nprobe=2 macro recall $macroAvg")
  }

  test("bucketHistogram flags the dominant-direction skewed corpus and stays silent on a balanced one") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val dim = 8
    // the measured docEmbed failure mode: every vector shares a dominant
    // positive direction, so the sign projections agree and one bucket
    // swallows the corpus
    val skewed = (1L to 200L).map(i =>
      (i, Array.fill(dim)(10.0 + rnd.nextGaussian() * 0.1)))
      .toDF("vec_id", "embedding")
    val hotBands = Similarity.bucketHistogram(skewed, bands = 2, planes = 4)
      .orderBy("band").collect()
    assert(hotBands.length === 2)
    assert(hotBands.forall(_.getAs[Boolean]("hot")),
      s"skewed corpus not flagged: ${hotBands.mkString("; ")}")
    // max is keyed to the UNIFORM expectation (n/2^planes), not the
    // observed-bucket mean — one swallowing bucket leaves few siblings,
    // and a mean over them would read as balanced
    assert(hotBands.forall(r =>
      r.getAs[Long]("max_width") > 8.0 * r.getAs[Double]("expected_width")))
    // centering (the dial the flag points at) re-balances the very same
    // corpus below the hot threshold
    val centered = Similarity.bucketHistogram(
      skewed, bands = 2, planes = 4, center = true).collect()
    assert(centered.forall(!_.getAs[Boolean]("hot")),
      s"centered corpus still hot: ${centered.mkString("; ")}")
    // a balanced corpus (independent signs) stays silent
    val balanced = (1L to 200L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    val quiet = Similarity.bucketHistogram(balanced, bands = 2, planes = 4)
      .orderBy("band").collect()
    assert(quiet.forall(!_.getAs[Boolean]("hot")),
      s"balanced corpus flagged: ${quiet.mkString("; ")}")
    // invariants: widths account for every (vector, band) row; summary is
    // partitioning-independent
    assert(quiet.forall(r => r.getAs[Long]("vectors") === 200L))
    val again = Similarity.bucketHistogram(
      balanced.repartition(7), bands = 2, planes = 4).orderBy("band").collect()
    assert(quiet.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("bucketHistogram flags the REAL docEmbed corpus (the r17 measured skew mode)") {
    // the production incident the operator exists for: bag-of-words
    // docEmbed vectors share a dominant direction (measured at sf0.1:
    // 3000 of 5000 docs in one of 16 buckets) — the telemetry must flag
    // the same corpus family the spec's synthetic mimics
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val de = Similarity.docEmbed(docs, dim = 16)
    val hist = Similarity.bucketHistogram(de, bands = 2, planes = 4).collect()
    assert(hist.exists(_.getAs[Boolean]("hot")),
      s"real docEmbed skew not flagged: ${hist.mkString("; ")}")
  }

  test("knnGraph edges are partitioning-independent") {
    val a = Similarity.knnGraph(emb, k = 3, bands = 2, planes = 4)
      .orderBy("query_id", "rank").collect()
    val b = Similarity.knnGraph(emb.repartition(7), k = 3, bands = 2, planes = 4)
      .orderBy("query_id", "rank").collect()
    assert(a.toSeq === b.toSeq)
    // centered bucketing: same edge contract (≤ k per query, no self
    // edges, cosines from the RAW vectors) and the same determinism —
    // the decimal-summed mean cannot depend on partition order
    val c = Similarity.knnGraph(emb, k = 3, bands = 2, planes = 4, center = true)
      .orderBy("query_id", "rank").collect()
    val d = Similarity.knnGraph(emb.repartition(7), k = 3, bands = 2, planes = 4,
        center = true)
      .orderBy("query_id", "rank").collect()
    assert(c.toSeq === d.toSeq)
    assert(c.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .forall { case (q, n) => q != n })
  }

  test("embedDensity: exact mode scores every vector; density is the decimal mean of its edges") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val dens = Similarity.embedDensity(emb, k = 5, exact = true)
      .orderBy("vec_id").collect()
    // exact mode: every vector has neighbors (n > k), so every vector scores
    assert(dens.length === n)
    assert(dens.forall(_.getAs[Long]("k_edges") === 5L))
    assert(dens.forall(r => math.abs(r.getAs[Double]("density")) <= 1.0001))

    // arithmetic contract: density is exactly the decimal-summed mean of
    // the knnGraph edge cosines — recompute from the edge list and compare
    val manual = Similarity.knnGraph(emb, k = 5, exact = true)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) =>
        val cs = rows.map(r => BigDecimal(r.getAs[Double]("cosine"))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP))
        q -> (cs.sum / cs.length).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      }
    dens.foreach { r =>
      assert(r.getAs[Double]("density") === manual(r.getAs[Long]("vec_id")))
    }

    // the pruning semantics: the score separates the corpus — densities
    // are not all equal (there IS a dense core and a sparse tail to cut)
    assert(dens.map(_.getAs[Double]("density")).distinct.length > 1)
  }

  test("densityPrune: keep flag is exactly the integer-rank middle band") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pruned = Similarity.densityPrune(emb, dropSparsestPermille = 50,
        dropDensestPermille = 100, k = 5, exact = true)
      .collect()
    val ds = pruned.map(_.getAs[Double]("density")).sorted
    val n = ds.length
    // replay the cut rule by hand: p‰ = smallest density whose cumulative
    // count reaches ⌈p·n/1000⌉ (integer cross-multiplication)
    def cut(p: Int) = ds(ds.indices.find(i => (i + 1) * 1000 >= n.toLong * p).get)
    val (lo, hi) = (cut(50), cut(900))
    pruned.foreach { r =>
      val d = r.getAs[Double]("density")
      assert(r.getAs[Boolean]("keep") === (d >= lo && d <= hi))
    }
    // both blades cut something and most of the corpus survives
    val kept = pruned.count(_.getAs[Boolean]("keep"))
    assert(kept < n)
    assert(pruned.exists(r => !r.getAs[Boolean]("keep") &&
      r.getAs[Double]("density") < lo))
    assert(pruned.exists(r => !r.getAs[Boolean]("keep") &&
      r.getAs[Double]("density") > hi))
    assert(kept * 1000 >= n * 800L)
  }

  test("chunkKnn: provenance matches the hand-composed pipeline; overflow raises") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(150)
    val got = Similarity.chunkKnn(docs, k = 3)
      .orderBy("doc_id", "chunk_id", "rank").collect()
    assert(got.nonEmpty)

    // hand-compose the same pipeline with explicit packing and unpack by
    // arithmetic — must be row-identical
    val m = 1000000L
    val chunks = graft.operators.Chunk.docChunk(docs)
      .select((col("doc_id") * m + col("chunk_id")).as("doc_id"),
        col("chunk_text").as("text"))
    val embF = Similarity.docEmbed(chunks, dim = 16)
    val want = Similarity.knnGraph(embF, k = 3, bands = 2, center = true,
        corpusHint = Some(embF.count()))
      .select((col("query_id") - pmod(col("query_id"), lit(m))).cast("long")./(m)
          .cast("long").as("doc_id"),
        pmod(col("query_id"), lit(m)).as("chunk_id"),
        (col("neighbor_id") - pmod(col("neighbor_id"), lit(m))).cast("long")./(m)
          .cast("long").as("n_doc_id"),
        pmod(col("neighbor_id"), lit(m)).as("n_chunk_id"),
        col("rank"), col("cosine"))
      .orderBy("doc_id", "chunk_id", "rank").collect()
    assert(got.toSeq === want.toSeq)

    // every (n_doc_id, n_chunk_id) endpoint is a real chunk of a real doc
    val chunkSet = graft.operators.Chunk.docChunk(docs)
      .select("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { r =>
      assert(chunkSet.contains((r.getLong(0), r.getLong(1))))
      assert(chunkSet.contains((r.getLong(2), r.getLong(3))))
    }

    // chunk ids at or past the packing bound must fail loudly, not alias
    val ex = intercept[Exception] {
      Similarity.chunkKnn(docs, window = 50, overlap = 10,
        maxChunksPerDoc = 2).collect()
    }
    assert(ex.getMessage.contains("chunk_id overflows") ||
      Option(ex.getCause).exists(_.getMessage.contains("chunk_id overflows")))
  }

  test("chunkKnn: the chunk stream adds no shuffle before the embed aggregation") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the chunk explode + id packing is the docEmbed INPUT — it must ride
    // the scan stage (docChunk's no-Exchange contract survives the select)
    val m = 1000000L
    val chunks = graft.operators.Chunk.docChunk(docs)
      .select((col("doc_id") * m + col("chunk_id")).as("doc_id"),
        col("chunk_text").as("text"))
    val plan = chunks.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
  test("rrfFuse: agreement beats any single ranker, exact hand-computed scores") {
    import spark.implicits._
    val lex = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val vec = Seq((3L, 1L), (4L, 2L), (1L, 3L)).toDF("doc_id", "rank")
    val got = Similarity.rrfFuse(Seq(lex, vec), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // doc 1: 1/61 + 1/63; doc 3: 1/63 + 1/61 — tie broken by doc_id;
    // both beat doc 2 (1/62 alone) and doc 4 (1/62 alone)
    assert(got.map(_._1).toSeq === Seq(1L, 3L, 2L, 4L))
    assert(got.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L))
    def c(r: Long) = BigDecimal(1.0 / (60.0 + r)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val exp13 = (c(1) + c(3)).toDouble
    assert(got(0)._3 === BigDecimal(exp13).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(0)._3 === got(1)._3) // the symmetric pair scores identically
    assert(got.map(_._4).toSeq === Seq(2L, 2L, 1L, 1L)) // n_systems
    // k bounds; partitioning-independent
    assert(Similarity.rrfFuse(Seq(lex, vec), k = 2).count() === 2)
    val again = Similarity.rrfFuse(
      Seq(lex.repartition(5), vec.repartition(3)), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq === again.toSeq)
  }

  test("knnGraph banded path: band-level pre-cap below the dedup exchange, both windows map-capped") {
    // The pair-dedup groupBy must never see the full candidate-pair
    // volume: a per-(query, band) top-k runs below it (exact — union of
    // per-band top-k ⊇ global top-k, proof at the operator) as a
    // Partial+Final WindowGroupLimit pair around its exchange. r22: the
    // capped frame is then hash-repartitioned by query_id ONCE, which
    // clusters BOTH the pair-dedup aggregate and the final per-query
    // rank — the final window runs exchange-free on that partitioning,
    // so it carries a single (Final) WindowGroupLimit: 3 limit nodes,
    // 2 Window nodes, 2 post-score exchanges (was 3), and no
    // vector-width column crosses them.
    val g = Similarity.knnGraph(emb, k = 3, bands = 2)
    val plan = g.queryExecution.executedPlan.toString
    val limits = "WindowGroupLimit".r.findAllIn(plan).length
    assert(limits === 3,
      s"expected Partial+Final band limit + Final rank limit, plan had $limits:\n$plan")
    assert("Window".r.findAllIn(plan).length === 5,
      s"expected two Window nodes (+ their limit nodes):\n$plan")
    // the shared query_id exchange really is the LAST one: nothing
    // re-shuffles between the pair-dedup aggregate and the final rank
    // (operators ABOVE it print BEFORE it in the tree dump)
    val above = plan.substring(0, plan.indexOf("REPARTITION_BY_COL"))
    assert(!above.contains("ENSURE_REQUIREMENTS"),
      s"a planner-inserted exchange crept in above the query_id repartition:\n$plan")
    // result is partitioning-independent (the exactness witness rides the
    // oracle; this guards the distributed determinism)
    val base = g.orderBy("query_id", "rank").collect().toSeq
    val again = Similarity.knnGraph(emb.repartition(13), k = 3, bands = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(base === again)
  }

  test("knnGraph bucketCap: deterministic unbiased sample, measured recall trade") {
    // Ground truth: the exact all-pairs edges. The cap is the EXPLICIT
    // recall dial for pair volume past the hinted-planes regime —
    // measured here like the multi-probe knobs, never guessed.
    val truth = Similarity.knnGraph(emb, k = 5, exact = true)
      .select("query_id", "neighbor_id")
    val nTruth = truth.count().toDouble
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "neighbor_id").intersect(truth).count() / nTruth
    val uncapped = Similarity.knnGraph(emb, k = 5, bands = 2)
    val capped = Similarity.knnGraph(emb, k = 5, bands = 2, bucketCap = Some(16))
    val rU = recall(uncapped)
    val rC = recall(capped)
    info(f"knnGraph recall@5 — uncapped: $rU%.3f, bucketCap 16: $rC%.3f")
    // sampling candidates cannot create information...
    assert(rC <= rU + 1e-9)
    // ...but an unbiased 16-of-~31 bucket sample must stay usable
    assert(rC > 0.25 * rU, s"cap destroyed recall: $rC vs $rU")
    // the cap genuinely bites at this width (fewer candidate edges survive)
    assert(capped.count() < uncapped.count())
    // deterministic under any partitioning (the salted-hash order is
    // content-independent and stable)
    val emb13 = emb.repartition(13)
    val again = Similarity.knnGraph(emb13, k = 5, bands = 2, bucketCap = Some(16))
      .orderBy("query_id", "rank").collect().toSeq
    assert(capped.orderBy("query_id", "rank").collect().toSeq === again)
    intercept[IllegalArgumentException] {
      Similarity.knnGraph(emb, k = 5, bucketCap = Some(0))
    }
  }

  test("rrfFuseBatch ≡ per-query rrfFuse; per-query rank map-capped") {
    import spark.implicits._
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 11L, 1L), (2L, 21L, 1L), (2L, 20L, 2L), (3L, 30L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val fused = Similarity.rrfFuseBatch(Seq(lex, vec), k = 5)
    val got = fused.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // every query's slice equals the single-query operator over its slices
    for (q <- Seq(1L, 2L, 3L)) {
      val single = Similarity.rrfFuse(Seq(
          lex.where(col("query_id") === q).select("doc_id", "rank"),
          vec.where(col("query_id") === q).select("doc_id", "rank")), k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      val slice = got.filter(_._1 == q).map(t => (t._2, t._3, t._4, t._5))
      assert(slice.toSeq === single.toSeq, s"query $q diverges")
    }
    // query 3 exists in ONE system only — present, n_systems = 1
    assert(got.filter(_._1 == 3L).map(_._5).toSeq === Seq(1L))
    // the per-query rank is the map-capped single window
    assert(fused.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("rrfFuse: a system contributes once per doc — duplicates collapse to min rank") {
    import spark.implicits._
    // doc 1 appears TWICE in the lexical list (a multi-query frame passed
    // without per-query filtering): it must contribute 1/(60+1) once —
    // its best showing — not 1/(60+1) + 1/(60+5); and n_systems counts
    // SYSTEMS (2), never rows (3)
    val lex = Seq((1L, 1L), (1L, 5L), (2L, 2L)).toDF("doc_id", "rank")
    val vec = Seq((1L, 2L)).toDF("doc_id", "rank")
    val got = Similarity.rrfFuse(Seq(lex, vec), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
    def c(r: Long) = BigDecimal(1.0 / (60.0 + r))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val d1 = got.find(_._1 == 1L).get
    assert(d1._2 === BigDecimal((c(1) + c(2)).toDouble)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(d1._3 === 2L)
    assert(got.find(_._1 == 2L).get._3 === 1L)
  }
}
