package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  // Sennrich et al. '16's worked example: low×5, lower×2, newest×6,
  // widest×3 — the merge sequence is hand-computable.
  private def corpus = {
    import spark.implicits._
    Seq((1L, (("low " * 5) + ("lower " * 2) + ("newest " * 6) +
      ("widest " * 3)).trim)).toDF("doc_id", "text")
  }

  test("bpeTrain learns the hand-computed merge sequence with exact counts") {
    val m = Bpe.bpeTrain(corpus, numMerges = 4).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count")))
    // (e,s) ties (s,t</w>) at 9 → left-asc tie-break picks (e,s);
    // then (es,t</w>) 9, (l,o) 7, and the 6-count tie (e,w)/(n,e)/(w,est</w>)
    // resolves to (e,w)
    assert(m.toSeq === Seq(
      (0L, "e", "s", "es", 9L),
      (1L, "es", "t</w>", "est</w>", 9L),
      (2L, "l", "o", "lo", 7L),
      (3L, "e", "w", "ew", 6L)))
  }

  test("bpeTrain stops early when no pair recurs; result is partitioning-independent") {
    import spark.implicits._
    val flat = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Bpe.bpeTrain(flat, numMerges = 5).count() === 0)
    val a = Bpe.bpeTrain(corpus, numMerges = 4).collect().toSeq
    val b = Bpe.bpeTrain(corpus.repartition(7), numMerges = 4).collect().toSeq
    assert(a === b)
  }

  test("bpeApply replays merges greedily left-to-right in rank order") {
    import spark.implicits._
    // greedy semantics: "aaa" under (a,a) → [aa, a</w>] (no overlap reuse)
    val tricky = Seq((1L, "aaa")).toDF("doc_id", "text")
    val greedy = Bpe.bpeApply(tricky, Seq(("a", "a"))).collect()(0)
    assert(greedy.getAs[Seq[String]]("bpe_tokens") === Seq("aa", "a</w>"))
    // the trained table segments its own corpus as the derivation predicts
    val merges = Bpe.bpeTrain(corpus, numMerges = 4).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    val seg = Bpe.bpeApply(
      Seq((1L, "newest"), (2L, "low"), (3L, "lower")).toDF("doc_id", "text"),
      merges).orderBy("doc_id").collect()
    assert(seg(0).getAs[Seq[String]]("bpe_tokens") === Seq("n", "ew", "est</w>"))
    assert(seg(0).getAs[Long]("n_bpe_tokens") === 3L)
    assert(seg(1).getAs[Seq[String]]("bpe_tokens") === Seq("lo", "w</w>"))
    assert(seg(2).getAs[Seq[String]]("bpe_tokens") === Seq("lo", "w", "e", "r</w>"))
  }

  test("merge table round-trips through the parquet artifact byte-equal") {
    val dir = java.nio.file.Files.createTempDirectory("bpe-store").toString
    val trained = Bpe.bpeTrain(corpus, numMerges = 4)
    Bpe.saveMerges(trained, s"$dir/merges.parquet")
    val loaded = Bpe.loadMerges(spark, s"$dir/merges.parquet")
    assert(loaded === trained.collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq)
    // tokenization with the loaded artifact is identical to in-memory
    val a = Bpe.bpeApply(corpus, loaded).collect().toSeq
    val b = Bpe.bpeApply(corpus, Seq(("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w")))
      .collect().toSeq
    assert(a === b)
  }

  // deterministic word soup rich enough to sustain 100+ trained merges:
  // zipfian-ish draws over a 60-word lexicon of 3–10-letter words
  private def richCorpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val lexicon = Vector.fill(60)(
      (1 to (3 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(9)).toChar).mkString)
    val docs = (1L to 40L).map { id =>
      val words = (1 to 80).map { _ =>
        lexicon(math.min(rnd.nextInt(60), rnd.nextInt(60))) // skewed
      }
      (id, words.mkString(" "))
    }
    docs.toDF("doc_id", "text")
  }

  /** Well-formed-by-construction merge table: prefix chains of the
    * corpus's frequent words ((c1,c2), (c1c2,c3), …, final right carrying
    * the marker) — every left is produced by an earlier merge of the same
    * chain, every right is an initial symbol. Lets the parity spec reach
    * production-scale merge counts without paying one training iteration
    * per merge.
    */
  private def chainMerges(docs: org.apache.spark.sql.DataFrame, topWords: Int): Seq[(String, String)] = {
    val top = docs
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w"))
      .limit(topWords)
      .collect().map(_.getString(0))
    val seen = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    top.foreach { w =>
      val cps = w.toSeq.map(_.toString)
      if (cps.length >= 2) {
        var acc = cps.head
        cps.tail.zipWithIndex.foreach { case (c, i) =>
          val r = if (i == cps.length - 2) c + Bpe.Eow else c
          seen += ((acc, r))
          acc = acc + r
        }
      }
    }
    seen.toSeq
  }

  test("greedy encoder matches the rank-order fold on a trained table") {
    val merges = Bpe.bpeTrain(richCorpus, numMerges = 25).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    assert(merges.size === 25)
    val a = Bpe.bpeApply(richCorpus, merges).orderBy("doc_id").collect().toSeq
    val b = Bpe.bpeApplyFold(richCorpus, merges).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("greedy encoder matches the fold at 150+ well-formed merges") {
    val merges = chainMerges(richCorpus, topWords = 40)
    assert(merges.size >= 150, s"chain table too small: ${merges.size}")
    val a = Bpe.bpeApply(richCorpus, merges).orderBy("doc_id").collect().toSeq
    val b = Bpe.bpeApplyFold(richCorpus, merges).orderBy("doc_id").collect().toSeq
    assert(a === b)
    // the table actually fires: frequent words collapse to single units
    val toks = a.head.getAs[scala.collection.Seq[String]]("bpe_tokens")
    assert(toks.exists(_.length > 3))
  }

  test("greedy encoder matches the fold on the real corpus under the demo table") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val demo = Seq(
      ("t", "h"), ("th", "e</w>"), ("a", "l"), ("u", "e</w>"),
      ("r", "o"), ("ro", "w</w>"), ("k", "e"), ("ke", "y</w>"))
    val a = Bpe.bpeApply(docs, demo).orderBy("doc_id").collect().toSeq
    val b = Bpe.bpeApplyFold(docs, demo).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("BpeEncode rejects space-bearing merge symbols loudly") {
    import spark.implicits._
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val ex = intercept[Throwable] {
      Bpe.bpeApply(docs, Seq(("a b", "c"))).collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .flatMap(e => Option(e.getMessage)).toSeq
    assert(msgs.exists(_.contains("spaces")), msgs.mkString(" | "))
  }

  test("bpeTrainFast is bit-identical to the Spark-iterated trainer") {
    // the Sennrich corpus: exact tuple parity including counts
    val a = Bpe.bpeTrain(corpus, numMerges = 4).collect().toSeq
    val b = Bpe.bpeTrainFast(corpus, numMerges = 4).collect().toSeq
    assert(a === b)
    // a richer corpus at depth: 25 merges, tie-breaks exercised
    val c = Bpe.bpeTrain(richCorpus, numMerges = 25).collect().toSeq
    val d = Bpe.bpeTrainFast(richCorpus, numMerges = 25).collect().toSeq
    assert(c === d)
    // the vocabulary cap takes the same deterministic cut
    val e = Bpe.bpeTrain(corpus, numMerges = 3, maxVocab = 2).collect().toSeq
    val f = Bpe.bpeTrainFast(corpus, numMerges = 3, maxVocab = 2).collect().toSeq
    assert(e === f)
    // early stop: no pair recurs -> empty table in both
    import spark.implicits._
    val flat = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Bpe.bpeTrainFast(flat, numMerges = 5).count() === 0)
    // the uncapped exact form stays with bpeTrain
    val ex = intercept[IllegalArgumentException] {
      Bpe.bpeTrainFast(corpus, numMerges = 1, maxVocab = 0)
    }
    assert(ex.getMessage.contains("maxVocab"))
  }

  test("bpeTrainFast reaches production merge counts in one corpus pass") {
    // 100 merges over the rich corpus: the Spark-iterated form would be
    // 100 jobs; the driver loop is one aggregation + in-memory work.
    // Exactness at depth is covered by the parity test; here assert the
    // table is well-formed (every left produced by an earlier merge or
    // an initial symbol) and strictly rank-ordered
    val m = Bpe.bpeTrainFast(richCorpus, numMerges = 100).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(m.length > 50, s"rich corpus should sustain 50+ merges, got ${m.length}")
    assert(m.map(_._1).toSeq === (0L until m.length).toSeq)
    val produced = scala.collection.mutable.Set.empty[String]
    def initial(s: String): Boolean = {
      val bare = s.stripSuffix(Bpe.Eow)
      bare.nonEmpty && bare.codePointCount(0, bare.length) == 1
    }
    m.foreach { case (_, l, r, lr) =>
      // a left never carries the marker (no right neighbor to merge with)
      assert(!l.endsWith(Bpe.Eow))
      assert(initial(l) || produced.contains(l),
        s"left '$l' neither initial nor produced earlier")
      assert(initial(r) || produced.contains(r),
        s"right '$r' neither initial nor produced earlier")
      produced += lr
    }
  }

  test("maxVocab caps the iteration frame to the most frequent word types") {
    import spark.implicits._
    // cap of 2 keeps newest(6) and low(5); all newest-internal pairs tie
    // at 6 and resolve left-asc ("e" < "es" < "n" < "w"), so the order is
    // es, ew, est</w> — different from the uncapped table, proving the cap
    // engaged
    val m = Bpe.bpeTrain(corpus, numMerges = 3, maxVocab = 2).collect()
      .map(r => (r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
    assert(m.toSeq === Seq(("es", 6L), ("ew", 6L), ("est</w>", 6L)))
  }

  test("BpeEncoder rejects malformed merge tables at construction") {
    // greedy ≡ rank-order replay only holds when every non-initial symbol
    // a merge references is produced by an earlier merge — a table
    // violating it must fail loudly, not silently tokenize differently
    val e = intercept[IllegalArgumentException] {
      new graft.functions.BpeEncoder(Array(("ab", "c"))) // "ab" never produced
    }
    assert(e.getMessage.contains("malformed BPE merge table"))
    intercept[IllegalArgumentException] {
      // produced later, not earlier: rank 0 references rank 1's output
      new graft.functions.BpeEncoder(Array(("ab", "c"), ("a", "b")))
    }
    intercept[IllegalArgumentException] {
      new graft.functions.BpeEncoder(Array(("a", "bc</w>"))) // marker form, still unproduced
    }
    // well-formed shapes construct fine: single-codepoint initials (with
    // or without the marker), the bare marker (empty word), and chained
    // references to earlier outputs
    new graft.functions.BpeEncoder(Array(("a", "b"), ("ab", "c"), ("abc", "d</w>")))
    new graft.functions.BpeEncoder(Array(("a", "b</w>"), ("c", "ab</w>")))
    new graft.functions.BpeEncoder(Array(("a", "</w>")))
  }
}
