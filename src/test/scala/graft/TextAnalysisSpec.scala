package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("tokenCount counts whitespace and lexer tokens") {
    val row = TextAnalysis.tokenCount(docs).orderBy("doc_id").head()
    assert(row.getAs[Long]("ws_tokens") > 0)
    // every whitespace token is at least one lexer token
    val bad = TextAnalysis.tokenCount(docs)
      .where(col("bpe_tokens") < col("ws_tokens")).count()
    assert(bad === 0)
  }

  test("corpusProfile rolls up consistent per-stratum integer stats") {
    val prof = TextAnalysis.corpusProfile(docs)
    // strata partition the corpus exactly
    assert(prof.agg(sum("n_docs")).head().getLong(0) === docs.count())
    // internal consistency of every stratum row
    assert(prof.where(col("min_tokens") > col("max_tokens")).count() === 0)
    assert(prof.where(col("n_distinct_texts") > col("n_docs")).count() === 0)
    assert(prof.where(col("n_short") > col("n_docs")).count() === 0)
    assert(prof.where(
      col("n_tokens") < col("min_tokens") * col("n_docs") ||
      col("n_tokens") > col("max_tokens") * col("n_docs")).count() === 0)
    // deterministic under repartitioning
    val a = prof.orderBy("lang", "source").collect()
    val b = TextAnalysis.corpusProfile(docs.repartition(7))
      .orderBy("lang", "source").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("qualityScore ratios are bounded") {
    val df = TextAnalysis.qualityScore(docs)
    assert(df.where(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() === 0)
    assert(df.where(col("n_tokens") === 0).count() === 0)
  }

  test("langId emits a prediction for every doc with fixed vocabulary") {
    val df = TextAnalysis.langId(docs)
    assert(df.count() === docs.count())
    val langs = df.select("lang_pred").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr", "zh", "und")))
  }

  test("dedupExact groups identical texts under min doc_id") {
    val dup = docs.limit(5).union(docs.limit(5)) // force exact duplicates
    val res = TextAnalysis.dedupExact(dup)
    assert(res.count() === 5)
    assert(res.where(col("n_copies") === 2).count() === 5)
  }

  test("docFingerprint is content-determined") {
    val a = TextAnalysis.docFingerprint(docs).orderBy("doc_id").collect()
    val b = TextAnalysis.docFingerprint(docs.repartition(7)).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq) // partitioning-independent
  }

  test("hashSample keeps a stable ~pct fraction per stratum") {
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextAnalysis.hashSample(docs, pct = 20).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // deterministic: same sample twice
    val again = TextAnalysis.hashSample(docs, pct = 20).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept === again)
    // every stratum sampled at a plausible rate (loose bounds, small data)
    for ((lang, n) <- total if n >= 20) {
      val rate = kept.getOrElse(lang, 0L).toDouble / n
      assert(rate > 0.02 && rate < 0.6, s"$lang sampled at $rate")
    }
  }

  test("repetitionScore separates repeated from varied text") {
    import spark.implicits._
    val df = Seq(
      (1L, "x x x x x"),         // one type, fully repeated 3-grams
      (2L, "a b c d e"),         // all distinct
      (3L, "hi")                 // too short for any 3-gram
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionScore(df).orderBy("doc_id").collect()

    assert(out(0).getAs[Long]("n_tokens") === 5)
    assert(out(0).getAs[Double]("distinct_token_ratio") === 0.2)
    // 3 positions, 1 distinct 3-gram -> 1 - 1/3
    assert(out(0).getAs[Double]("dup_3gram_ratio") === 0.6667)
    assert(out(0).getAs[Double]("top_token_ratio") === 1.0)

    assert(out(1).getAs[Double]("distinct_token_ratio") === 1.0)
    assert(out(1).getAs[Double]("dup_3gram_ratio") === 0.0)
    assert(out(1).getAs[Double]("top_token_ratio") === 0.2)

    // sub-3-token docs still score (no row dropped), with dup ratio 0
    assert(out(2).getAs[Long]("n_tokens") === 1)
    assert(out(2).getAs[Double]("dup_3gram_ratio") === 0.0)
    assert(out(2).getAs[Double]("top_token_ratio") === 1.0)
  }

  test("textNormalize digest is case/whitespace-insensitive") {
    import spark.implicits._
    val two = Seq((1L, "Hello   World"), (2L, "  hello world \n")).toDF("doc_id", "text")
    val res = TextAnalysis.textNormalize(two).collect()
    assert(res.map(_.getAs[String]("norm_text")).toSet === Set("hello world"))
    assert(res.map(_.getAs[String]("norm_md5")).distinct.length === 1)
    assert(res.head.getAs[Long]("n_chars_norm") === 11L)
  }

  test("lengthBand keeps the exact percentile band of token counts") {
    import spark.implicits._
    // lengths exactly 1..100, one doc each
    val df = (1 to 100).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val kept = TextAnalysis.lengthBand(df, pLoPermille = 100, pHiPermille = 900)
      .collect().map(_.getAs[Long]("n_tokens")).sorted
    // rank ceil(100·0.1)=10 → lo=10; rank ceil(100·0.9)=90 → hi=90
    assert(kept.head === 10L && kept.last === 90L && kept.length === 81)
    // degenerate band keeps exactly the median length
    val med = TextAnalysis.lengthBand(df, pLoPermille = 500, pHiPermille = 500)
      .collect().map(_.getAs[Long]("n_tokens")).toSeq
    assert(med === Seq(50L))
    // full band keeps everything; empty corpus yields empty
    assert(TextAnalysis.lengthBand(df, 0, 1000).count() === 100)
    assert(TextAnalysis.lengthBand(df.where(lit(false))).count() === 0)
    assertThrows[IllegalArgumentException] {
      TextAnalysis.lengthBand(df, 900, 100)
    }
  }

  test("LangPack runs the quality battery per language; defaults stay English") {
    import spark.implicits._
    val deText = "der hund und die katze sind nicht auf dem sofa weil der regen " +
      "sie zu den nachbarn mit dem garten treibt"
    val enText = "the quick brown fox and the lazy dog run to the old barn " +
      "in that green field of tall grass"
    val df = Seq((1L, deText), (2L, enText)).toDF("doc_id", "text")
    def kept(gate: org.apache.spark.sql.Column): Set[Long] =
      df.where(gate).select("doc_id").collect().map(_.getLong(0)).toSet
    // the English gate rejects the high-quality German doc — exactly the
    // failure a per-language pipeline exists to avoid — and vice versa
    assert(kept(TextAnalysis.passesQuality(col("text"))) === Set(2L))
    assert(kept(TextAnalysis.passesQuality(col("text"), TextAnalysis.LangPack.de)) === Set(1L))
    // qualityScore's ratio and verdict follow the pack
    val qs = TextAnalysis.qualityScore(df, TextAnalysis.LangPack.de)
      .orderBy("doc_id").collect()
    assert(qs(0).getAs[Boolean]("passes_quality"))
    assert(qs(0).getAs[Double]("stopword_ratio") > 0.2)
    assert(!qs(1).getAs[Boolean]("passes_quality"))
    assert(qs(1).getAs[Double]("stopword_ratio") === 0.0)
    // the default battery is bit-identical to an explicit English pack
    assert(TextAnalysis.qualityScore(df).collect().toSeq ===
      TextAnalysis.qualityScore(df, TextAnalysis.LangPack.en).collect().toSeq)
    // gopher battery under the German pack: a 50+-word German doc clears
    // every rule (incl. >= 2 distinct German stopwords); under the English
    // pack the same doc fails on the stopword rule alone
    val longDe = Seq((1L, (deText + " ") * 4 + deText)).toDF("doc_id", "text")
    val gDe = TextAnalysis.gopherQuality(longDe, TextAnalysis.LangPack.de).head()
    assert(gDe.getAs[Long]("n_words") >= 50L)
    assert(gDe.getAs[Long]("n_stop_distinct") >= 2L)
    assert(gDe.getAs[Boolean]("passes_gopher"))
    val gEn = TextAnalysis.gopherQuality(longDe).head()
    assert(gEn.getAs[Long]("n_stop_distinct") === 0L)
    assert(!gEn.getAs[Boolean]("passes_gopher"))
    // es/fr packs resolve by code; unknown codes don't
    assert(TextAnalysis.LangPack.forLang("es").nonEmpty)
    assert(TextAnalysis.LangPack.forLang("fr").nonEmpty)
    assert(TextAnalysis.LangPack.forLang("xx").isEmpty)
    // the ROUTED gate judges each doc by its own lang tag — both docs
    // pass under their own battery, and a packless tag (zh) falls back
    // to the English battery
    val tagged = Seq((1L, "de", deText), (2L, "en", enText), (3L, "zh", enText))
      .toDF("doc_id", "lang", "text")
    val routed = tagged
      .where(TextAnalysis.passesQualityFor(col("text"), col("lang")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(routed === Set(1L, 2L, 3L))
  }

  test("Cyrillic LangPack: alphaPattern and word-length bounds generalize beyond Latin") {
    import spark.implicits._
    // plain high-quality Russian prose (Chekhov-flavored filler), > 50 words
    val ruSent = "и вот он идет в старый дом на берегу реки что стоит у леса " +
      "но не знает как это место встретит его по дороге к дому у оврага"
    val ruText = ((ruSent + " ") * 2 + ruSent).trim
    val df = Seq((1L, ruText)).toDF("doc_id", "text")
    val ru = TextAnalysis.LangPack.ru
    // the quality gate passes under the Russian battery, fails under the
    // English fallback (zero en stopword hits)
    assert(df.where(TextAnalysis.passesQuality(col("text"), ru)).count() === 1)
    assert(df.where(TextAnalysis.passesQuality(col("text"))).count() === 0)
    // gopher under the ru pack: the Cyrillic alphaPattern scores every
    // word alphabetic; under the en default the SAME doc scores 0.0
    // alphabetic (no [a-z] anywhere) and fails on that rule alone
    val gRu = TextAnalysis.gopherQuality(df, ru).head()
    assert(gRu.getAs[Long]("n_words") >= 50L)
    assert(gRu.getAs[Double]("frac_alpha_words") === 1.0)
    assert(gRu.getAs[Long]("n_stop_distinct") >= 2L)
    assert(gRu.getAs[Boolean]("passes_gopher"))
    val gEn = TextAnalysis.gopherQuality(df).head()
    assert(gEn.getAs[Double]("frac_alpha_words") === 0.0)
    assert(gEn.getAs[Long]("n_stop_distinct") === 0L)
    assert(!gEn.getAs[Boolean]("passes_gopher"))
    // the widened mean-word-length ceiling is the pack's, not a constant:
    // a doc of 4-to-12-char words (mean ~ 11) passes ru's 3..12 band and
    // fails the default 3..10
    val longWords = Seq.fill(60)("университет").mkString(" ") + " на на и и"
    val lw = Seq((1L, longWords)).toDF("doc_id", "text")
    val gLw = TextAnalysis.gopherQuality(lw, ru).head()
    assert(gLw.getAs[Double]("mean_word_len") > 10.0 &&
      gLw.getAs[Double]("mean_word_len") <= 12.0)
    assert(gLw.getAs[Boolean]("passes_gopher"))
    assert(!TextAnalysis.gopherQuality(lw,
      TextAnalysis.LangPack.en.copy(stopwords = ru.stopwords,
        alphaPattern = ru.alphaPattern)).head().getAs[Boolean]("passes_gopher"))
    // langId votes ru for Cyrillic text; the routed gate judges a
    // ru-tagged doc by the ru battery (no en fallback needed)
    val lid = TextAnalysis.langId(df).head()
    assert(lid.getAs[String]("lang_pred") === "ru")
    assert(lid.getAs[Long]("score_ru") > 0L)
    val tagged = Seq((1L, "ru", ruText)).toDF("doc_id", "lang", "text")
    assert(tagged.where(TextAnalysis.passesQualityFor(col("text"), col("lang")))
      .count() === 1)
  }

  test("lengthBand histogram clamp bounds the driver fetch on adversarial corpora") {
    import spark.implicits._
    // adversarial shape: every doc has a UNIQUE length, all above the clamp
    // — unclamped, the histogram would carry one row per doc
    val long = (1 to 40).map(n => (n.toLong, (1 to 20 + n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val tc = long.select(col("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
    // fetch bound holds: 40 distinct lengths (21..60) collapse into
    // ≤ ceiling+1 histogram rows (lengths below 10, plus the 10 bucket)
    val clamped = TextAnalysis.lengthHistogram(tc, histCeiling = 10L)
    assert(clamped.length <= 11)
    assert(clamped.map(_._2).sum === 40L)
    // thresholds strictly below the ceiling are unchanged: lengths 1..100
    // with ceiling 95 — lo=10 and hi=90 sit below the clamp, so the band
    // is bit-identical to the unclamped default
    val df = (1 to 100).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val defaultBand = TextAnalysis.lengthBand(df, 100, 900)
      .collect().map(_.getLong(0)).sorted.toSeq
    val clampedBand = TextAnalysis.lengthBand(df, 100, 900, histCeiling = 95L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(clampedBand === defaultBand)
    // a hi threshold AT the ceiling degrades to a superset (unbounded
    // above), never dropping docs below the clamp: ceiling 50 puts hi at
    // the clamp, so every doc ≥ lo=10 survives
    val sup = TextAnalysis.lengthBand(df, 100, 900, histCeiling = 50L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(sup === (10L to 100L))
  }

  test("compressionRatio separates repetitive from varied text deterministically") {
    import spark.implicits._
    val rep = ("the same words again and again " * 30).trim
    val varied = (1 to 180).map(i => s"w${i}x${i * 7}q${i * i % 97}").mkString(" ")
    val df = Seq((1L, rep), (2L, varied), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    val (r1, r2) = (out(1L).getAs[Double]("compress_ratio"),
      out(2L).getAs[Double]("compress_ratio"))
    // boilerplate compresses far better than high-entropy text
    assert(r1 < 0.2, s"repetitive ratio $r1")
    assert(r2 > r1 * 3, s"varied $r2 vs repetitive $r1")
    assert(out(3L).getAs[Double]("compress_ratio") === 1.0) // empty: defined
    assert(out(1L).getAs[Long]("n_bytes") === rep.getBytes("UTF-8").length.toLong)
    // deterministic under repartitioning (fixed deflate level)
    val again = TextAnalysis.compressionRatio(df.repartition(3))
      .orderBy("doc_id").collect().toSeq
    assert(TextAnalysis.compressionRatio(df).orderBy("doc_id").collect().toSeq === again)
    // full corpus: every ratio in (0, ~1]
    val corpus = TextAnalysis.compressionRatio(docs)
    assert(corpus.where(col("compress_ratio") <= 0 || col("compress_ratio") > 1.2).count() === 0)
  }

  test("per-mille sampling expresses sub-percent rates deterministically") {
    import spark.implicits._
    val ids = (0L until 20000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    // 0.5% — inexpressible at integer-percent resolution
    val kept = TextAnalysis.hashSamplePermille(ids, permille = 5)
    val n = kept.count().toDouble
    assert(n > 20 && n < 200, s"~0.5% of 20k expected, got $n")
    // deterministic under repartitioning
    assert(TextAnalysis.hashSamplePermille(ids.repartition(7), permille = 5)
      .select("doc_id").except(kept.select("doc_id")).count() === 0)
    // stratum-conditional per-mille rates: unweighted strata drop
    val mixed = TextAnalysis.mixSamplePermille(ids, Map("en" -> 5))
    assert(mixed.where(col("lang") === "de").count() === 0)
    assert(mixed.count() > 0)
    assertThrows[IllegalArgumentException] {
      TextAnalysis.hashSamplePermille(ids, permille = 1001)
    }
  }

  test("unigramLm capped variant matches exact scores on in-vocab tokens") {
    val exact = TextAnalysis.unigramLm(docs)

    // k ≥ |vocab| ⇒ nothing is OOV and the broadcast plan degenerates to
    // the exact scores (same counts, same grand total, same rounding)
    val vocabSize = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .where(length(col("t")) > 0).select("t").distinct().count().toInt
    val full = TextAnalysis.unigramLm(docs, vocabTopK = Some(vocabSize + 10))
    assert(full.where(col("oov_ratio") =!= 0.0).count() === 0)
    val joined = exact.as("e").join(full.as("f"), "doc_id")
      .where(col("e.avg_neg_logprob") =!= col("f.avg_neg_logprob") ||
        col("e.n_tokens") =!= col("f.n_tokens"))
    assert(joined.count() === 0)

    // a small cap scores every in-vocab token identically to the exact
    // plan: docs with zero OOV tokens must agree score-for-score
    val capped = TextAnalysis.unigramLm(docs, vocabTopK = Some(10))
    val inVocabDocs = capped.where(col("oov_ratio") === 0.0)
    val diff = exact.as("e").join(inVocabDocs.as("c"), "doc_id")
      .where(col("e.avg_neg_logprob") =!= col("c.avg_neg_logprob"))
    assert(diff.count() === 0)
    // and the cap must actually bite somewhere at this corpus size
    assert(capped.where(col("oov_ratio") > 0.0).count() > 0)
  }

  test("mixPlan solves exact integer keep rates; mixApply hits them") {
    import spark.implicits._
    // 1000 en docs × 10 tokens + 100 de docs × 10 tokens
    val corpus = ((1 to 1000).map(i => (i.toLong, "w w w w w w w w w w", "en")) ++
      (1001 to 1100).map(i => (i.toLong, "w w w w w w w w w w", "de")))
      .toDF("doc_id", "text", "lang")
    val plan = TextAnalysis.mixPlan(corpus,
      sharePermille = Map("en" -> 500, "de" -> 500), tokenBudget = 10000L)
    val rows = plan.collect().map(r =>
      r.getAs[String]("lang") -> r).toMap
    // en: target 5000 of 10000 avail → ceil(5000·1000/10000) = 500‰
    assert(rows("en").getAs[Long]("target_tokens") === 5000L)
    assert(rows("en").getAs[Long]("keep_permille") === 500L)
    assert(rows("en").getAs[Boolean]("feasible"))
    // de: target 5000 of 1000 avail → oversubscribed, clamp + flag
    assert(rows("de").getAs[Long]("keep_permille") === 1000L)
    assert(!rows("de").getAs[Boolean]("feasible"))

    val kept = TextAnalysis.mixApply(corpus, plan)
    // clamped stratum keeps everything; solved stratum lands near its
    // rate (uniform 60-bit hash: 500 ± 5σ ≈ 80 of 1000)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") === 100L)
    assert(byLang("en") > 420L && byLang("en") < 580L)
    // deterministic: the same salt reproduces the exact selection
    val again = TextAnalysis.mixApply(corpus, plan)
    assert(kept.select("doc_id").except(again.select("doc_id")).count() === 0)
    assert(again.select("doc_id").except(kept.select("doc_id")).count() === 0)
    // a stratum absent from the plan fails closed
    val extra = corpus.union(Seq((9999L, "x y z", "zh")).toDF)
    assert(TextAnalysis.mixApply(extra, plan)
      .where(col("lang") === "zh").count() === 0)
  }

  test("perplexityBuckets cuts exact per-language terciles on the score") {
    val bands = TextAnalysis.perplexityBuckets(docs).persist()
    try {
      // every scored doc lands in exactly one band, none invented
      val scored = TextAnalysis.unigramLm(docs).count()
      assert(bands.count() === scored)
      assert(bands.where(!col("ppl_band").isin("head", "middle", "tail"))
        .count() === 0)
      // band assignment depends only on the score, so bands are strictly
      // ordered by score within every language: max(head) < min(middle)
      // < ... — ties can never straddle a band edge
      val edges = bands.groupBy("lang").pivot("ppl_band").agg(
        min("avg_neg_logprob").as("lo"), max("avg_neg_logprob").as("hi"))
      assert(edges.where(col("head_hi") >= col("middle_lo") ||
        col("middle_hi") >= col("tail_lo")).count() === 0)
      // integer-rank tercile: per language, head holds at least
      // ceil(n·333/1000) docs, and removing the tie group at the cut
      // point drops it below the rank (smallest closed prefix >= rank)
      val counts = bands.groupBy("lang").agg(
        count(lit(1)).as("n"),
        sum(when(col("ppl_band") === "head", 1L).otherwise(0L)).as("head_n"))
      val ties = bands.where(col("ppl_band") === "head")
        .groupBy("lang").agg(max("avg_neg_logprob").as("t_head"))
        .join(bands, Seq("lang"))
        .where(col("avg_neg_logprob") === col("t_head"))
        .groupBy("lang").agg(count(lit(1)).as("tie_n"))
      val bad = counts.join(ties, "lang")
        .withColumn("rank", greatest(
          floor((col("n") * 333 + 999) / 1000).cast("long"), lit(1L)))
        .where(col("head_n") < col("rank") ||
          col("head_n") - col("tie_n") >= col("rank"))
      assert(bad.count() === 0)
    } finally bands.unpersist()
  }

  test("perplexityBuckets drops zero-token docs like unigramLm") {
    import spark.implicits._
    val tiny = Seq((1L, "common common rare", "en"), (2L, "   ", "en"),
      (3L, "common common common", "en")).toDF("doc_id", "text", "lang")
    val bands = TextAnalysis.perplexityBuckets(tiny)
    assert(bands.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
  }

  test("c4Filter applies every line and page rule independently") {
    import spark.implicits._
    val good = "the first sentence has enough words here.\n" +
      "a second full sentence keeps the page alive.\n" +
      "and a third one closes out the page cleanly."
    val pages = Seq(
      (1L, good),                                           // clean page
      (2L, good + "\nshort line."),                         // short line dropped
      (3L, good + "\nthis line has no terminal punctuation"),
      (4L, good + "\nplease enable javascript to continue browsing."),
      (5L, good + "\nvar x = { a: 1 };"),                   // brace → page drop
      (6L, good + "\nlorem ipsum dolor sit amet consectetur."),
      (7L, "only two sentences live here after filtering.\n" +
        "the second one is the last full stop.")            // < 3 sentences
    ).toDF("doc_id", "text")
    val res = TextAnalysis.c4Filter(pages).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(res(1L).getAs[Boolean]("passes_c4"))
    assert(res(1L).getAs[Long]("n_kept_lines") === 3L)
    assert(res(1L).getAs[Long]("n_sentences") === 3L)
    assert(res(1L).getAs[String]("clean_text") === good)
    // line rules drop the offending line but keep the page
    assert(res(2L).getAs[Boolean]("passes_c4"))
    assert(res(2L).getAs[Long]("n_kept_lines") === 3L)
    assert(res(3L).getAs[Boolean]("passes_c4"))
    assert(res(4L).getAs[Boolean]("passes_c4"))
    assert(res(4L).getAs[Long]("n_js_lines") === 1L)
    assert(!res(4L).getAs[String]("clean_text").contains("javascript"))
    // page rules drop the whole page with telemetry naming the cause
    assert(!res(5L).getAs[Boolean]("passes_c4"))
    assert(res(5L).getAs[Boolean]("has_brace"))
    assert(!res(6L).getAs[Boolean]("passes_c4"))
    assert(res(6L).getAs[Boolean]("has_lorem"))
    assert(!res(7L).getAs[Boolean]("passes_c4"))
    assert(res(7L).getAs[Long]("n_sentences") === 2L)

    // relaxed thresholds rescue the sentence-starved page, nothing else new
    val relaxed = TextAnalysis.c4Filter(pages, minSentences = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(relaxed(7L).getAs[Boolean]("passes_c4"))
    assert(!relaxed(5L).getAs[Boolean]("passes_c4"))
  }

  test("bigramLm sees transition structure unigram scoring cannot") {
    import spark.implicits._
    // same token multiset, different order: the repeated "a b" transition
    // is corpus-dominant, the shuffled doc's transitions are rare
    val df = Seq(
      (0L, "a b a b a b a b a b a b"),
      (1L, "a a b b a b b a a b b a"),
      (2L, "a b a b a b a b a b a b"),
      (3L, "a b a b a b a b a b a b")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLm(df).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("avg_neg_logprob")).toMap
    assert(out(1L) > out(0L) + 0.1,
      s"shuffled doc should score worse: ${out(1L)} vs ${out(0L)}")
    // identical docs score identically
    assert(out(0L) === out(2L))
  }

  test("bigramLm pruning takes the smoothed unseen path and reports it") {
    import spark.implicits._
    val df = Seq(
      (0L, "x y x y x y x y"),   // "x y" count 4+, "y x" count 3
      (1L, "x z")                // "x z" count 1 → pruned at minCount 2
    ).toDF("doc_id", "text")
    val exact = TextAnalysis.bigramLm(df).orderBy("doc_id").collect()
    assert(exact.forall(_.getAs[Double]("pruned_ratio") === 0.0))
    val pruned = TextAnalysis.bigramLm(df, minCount = 2).orderBy("doc_id").collect()
    val byId = pruned.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Double]("pruned_ratio") > 0.0)
    // pruned transitions score strictly worse than their unpruned form
    val exactById = exact.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Double]("avg_neg_logprob")
      > exactById(1L).getAs[Double]("avg_neg_logprob"))
    // n_tokens preserved; empty docs drop
    assert(byId(1L).getAs[Long]("n_tokens") === 2L)
  }

  test("bigramLm scores are partition-order independent") {
    val a = TextAnalysis.bigramLm(docs).orderBy("doc_id").collect()
    val b = TextAnalysis.bigramLm(docs.repartition(17)).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("finewebFilter gates on punct-line, short-line and dup-line-char fractions") {
    import spark.implicits._
    val longA = "this opening sentence is clearly long enough to pass the bar."
    val longB = "a second distinct sentence that is also comfortably long enough."
    val longC = "and a third one rounding out a healthy looking page of text."
    val noPunct = "this line is long enough but has no terminal punctuation at all"
    val df = Seq(
      (1L, s"$longA\n$longB\n$longC"),                   // clean page
      (2L, s"$noPunct\n$noPunct x\n$noPunct y"),         // 0 punct lines
      (3L, "a b.\nc d.\ne f.\ng h.\ni j.\nk l.\nm n."),  // all short
      (4L, s"$longA\n$longA\n$longA\n$longB")            // dup-char heavy
    ).toDF("doc_id", "text")
    val out = TextAnalysis.finewebFilter(df).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("passes_fineweb"))
    assert(!out(2L).getAs[Boolean]("passes_fineweb"))
    assert(out(2L).getAs[Double]("punct_line_frac") === 0.0)
    assert(!out(3L).getAs[Boolean]("passes_fineweb"))
    assert(out(3L).getAs[Double]("short_line_frac") === 1.0)
    assert(!out(4L).getAs[Boolean]("passes_fineweb"))
    // 2 repeat occurrences of longA (62 chars) over 3·62 + 65 total
    assert(out(4L).getAs[Double]("dup_line_char_frac") > 0.1)
    assert(out(1L).getAs[Long]("n_lines") === 3L)
  }

  test("vocabCoverage reports exact occurrence mass under each budget") {
    import spark.implicits._
    val df = Seq((1L, "a a a b b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(df, ks = Seq(1, 2, 10))
      .orderBy("k").collect()
    // counts: a=4 b=3 c=1 d=1; total 9, 4 types
    assert(out.map(r => (r.getAs[Long]("k"), r.getAs[Long]("vocab_size"),
      r.getAs[Long]("covered_tokens"))).toSeq
      === Seq((1L, 1L, 4L), (2L, 2L, 7L), (10L, 4L, 9L)))
    assert(out.forall(_.getAs[Long]("total_tokens") == 9L))
    assert(out.forall(_.getAs[Long]("n_types") == 4L))
    assert(out.last.getAs[Double]("coverage") === 1.0)
  }

  test("topNgrams counts occurrences and doc frequency with a stable cut") {
    import spark.implicits._
    val df = Seq(
      (1L, "x y z x y z"),     // "x y z" twice in one doc, "y z x" once
      (2L, "x y z other words"),
      (3L, "too short")).toDF("doc_id", "text")
    val out = TextAnalysis.topNgrams(df, n = 3, k = 2).collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("ngram") === "x y z")
    assert(out(0).getAs[Long]("n_occurrences") === 3L)
    assert(out(0).getAs[Long]("n_docs") === 2L)
    // the tie among count-1 ngrams breaks lexicographically
    assert(out(1).getAs[Long]("n_occurrences") === 1L)
    assert(out(1).getAs[String]("ngram") ===
      Seq("y z x", "z x y", "y z other", "z other words").min)
  }

  test("corpusSplit partitions every doc exactly once, deterministically") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = TextAnalysis.corpusSplit(docs)
    assert(out.count() === docs.count())
    val byName = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet.subsetOf(Set("train", "val", "test")))
    // 90/5/5 within hash tolerance on 500 docs
    assert(byName("train") > 400)
    // same salt ⇒ identical assignment under any partitioning
    val again = TextAnalysis.corpusSplit(docs.repartition(7))
      .select("doc_id", "split")
    assert(out.select("doc_id", "split").except(again).count() === 0)
    // bad budget refused
    intercept[IllegalArgumentException] {
      TextAnalysis.corpusSplit(docs, trainPermille = 980, valPermille = 50)
    }
  }

  test("corpusDrift: zero PSI against itself, shifted term dominates a shifted batch") {
    import spark.implicits._
    val corpus = Seq.tabulate(50)(i => (i.toLong, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val self = TextAnalysis.corpusDrift(corpus, corpus, topK = 10)
    val selfPsi = self.agg(sum(col("psi_contrib"))).head().getDouble(0)
    assert(math.abs(selfPsi) < 1e-9)
    // batch where 'alpha' floods the distribution
    val shifted = Seq.tabulate(50)(i =>
      (i.toLong, "alpha alpha alpha alpha alpha beta")).toDF("doc_id", "text")
    val drift = TextAnalysis.corpusDrift(corpus, shifted, topK = 10)
    val total = drift.agg(sum(col("psi_contrib"))).head().getDouble(0)
    assert(total > 0.2) // the conventional "shifted source" PSI flag
    val worst = drift.orderBy(abs(col("psi_contrib")).desc).head()
    assert(Set("alpha", "gamma", "delta").contains(worst.getAs[String]("tok")))
    // terms the batch never emits keep smoothed mass, never NaN/±inf
    assert(drift.where(col("psi_contrib").isNull || isnan(col("psi_contrib"))).count() === 0)
  }

  test("corpusProfileApprox estimates within 3·rsd of exact, partition-independent") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = TextAnalysis.corpusProfile(docs)
      .select(col("lang"), col("source"), col("n_distinct_texts"))
    val approx = TextAnalysis.corpusProfileApprox(docs, rsd = 0.05)
    val joined = approx.join(exact, Seq("lang", "source"))
    // ±1 OR 15 %: at tiny per-group cardinalities a single register
    // collision is an off-by-one, which the relative bound alone would
    // flag (measured: 5 → 4 on a 5-distinct group)
    val bad = joined.where(
      abs(col("n_distinct_approx") - col("n_distinct_texts")) >
        greatest(lit(1.0), col("n_distinct_texts") * 0.15))
    assert(bad.count() === 0)
    // HLL insert+merge are deterministic and commutative: same estimate
    // under any partitioning
    val again = TextAnalysis.corpusProfileApprox(docs.repartition(13), rsd = 0.05)
    assert(approx.except(again).count() === 0)
  }

  test("qualityEnsemble verdicts equal each standalone battery's") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val ens = TextAnalysis.qualityEnsemble(docs)
    val gopher = TextAnalysis.gopherQuality(docs)
      .select(col("doc_id"), col("passes_gopher").as("g"))
    val c4 = TextAnalysis.c4Filter(docs)
      .select(col("doc_id"), col("passes_c4").as("c"))
    val fw = TextAnalysis.finewebFilter(docs)
      .select(col("doc_id"), col("passes_fineweb").as("f"))
    val joined = ens.join(gopher, "doc_id").join(c4, "doc_id").join(fw, "doc_id")
    assert(joined.where(col("passes_gopher") =!= col("g") ||
      col("passes_c4") =!= col("c") || col("passes_fineweb") =!= col("f"))
      .count() === 0)
    // n_pass is exactly the verdict sum; the gates compose from it
    assert(ens.where(col("n_pass") =!=
      Seq("passes_heuristic", "passes_gopher", "passes_c4", "passes_fineweb")
        .map(c => when(col(c), 1L).otherwise(0L)).reduce(_ + _)).count() === 0)
    assert(ens.where(col("passes_all") && col("n_pass") =!= 4).count() === 0)
    assert(ens.where(col("passes_majority") =!= (col("n_pass") >= 3)).count() === 0)
  }

  test("stripRepeatedLines drops only within-doc repeats, keeps blanks") {
    import spark.implicits._
    val text = "header\nbody one\n\nheader\nbody two\n\nheader"
    val df = Seq((1L, text), (2L, "only\nunique\nlines")).toDF("doc_id", "text")
    val out = TextAnalysis.stripRepeatedLines(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean_text") ===
      "header\nbody one\n\nbody two\n") // both blanks survive, repeats gone
    assert(out(1L).getAs[Long]("n_lines") === 7L)
    assert(out(1L).getAs[Long]("n_removed") === 2L)
    assert(out(2L).getAs[String]("clean_text") === "only\nunique\nlines")
    assert(out(2L).getAs[Long]("n_removed") === 0L)
  }

  test("bm25TopK: rare-term idf dominates, tf saturates, zero-match docs drop") {
    import spark.implicits._
    // 10 filler docs make 'common' common; 'zebra' appears in one doc
    val docs = (
      Seq(
        (1L, "zebra common common"),        // the rare term + commons
        (2L, "common common common common"), // commons only, higher tf
        (3L, "common"),                      // commons only, short
        (4L, "nothing matching here at all")) ++
      (10L to 15L).map(i => (i, "common filler words and more filler")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, Seq("zebra", "common"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the zebra doc outranks every commons-only doc: one rare term beats
    // any amount of a ubiquitous one (idf dominance + tf saturation)
    assert(got.head._1 === 1L)
    assert(got.map(_._2).toSeq === (1L to got.length).toSeq)
    // scores strictly ordered desc with doc_id tiebreak, all positive
    assert(got.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._1 < b._1) })
    assert(got.forall(_._3 > 0))
    // doc 4 matches no query term — dropped, not scored 0
    assert(!got.map(_._1).contains(4L))
    // k bounds the output
    assert(got.length === 5)
    // partitioning-independent (the engine-portability contract)
    val again = TextAnalysis.bm25TopK(docs.repartition(7), Seq("zebra", "common"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === again.toSeq)
    // query terms are case-normalized like the tokenizer's output
    val upper = TextAnalysis.bm25TopK(docs, Seq("ZEBRA", "Common"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === upper.toSeq)
  }

  test("bm25TopKBatch ≡ per-query bm25TopK; no-match query vanishes; batch validated") {
    import spark.implicits._
    val docs = (
      Seq(
        (1L, "zebra common common"),
        (2L, "common common common common"),
        (3L, "common"),
        (4L, "nothing matching here at all")) ++
      (10L to 15L).map(i => (i, "common filler words and more filler")))
      .toDF("doc_id", "text")
    val specs = Seq(
      (7L, Seq("zebra", "common")),
      (8L, Seq("filler", "words")),
      (9L, Seq("zzznope")))
    val batch = specs.toDF("query_id", "terms")
    val out = TextAnalysis.bm25TopKBatch(docs, batch, k = 5)
      .orderBy("query_id", "rank")
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // each query's slice is EXACTLY the single-query operator's answer —
    // same scores, same ranks (determinism contract shared term-order sum)
    for ((qid, ts) <- specs.take(2)) {
      val single = TextAnalysis.bm25TopK(docs, ts, k = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val slice = got.filter(_._1 == qid).map(t => (t._2, t._3, t._4))
      assert(slice.toSeq === single.toSeq, s"query $qid diverges")
    }
    // the corpus-missing term scores nothing anywhere: query 9 is ABSENT
    assert(!got.map(_._1).contains(9L))
    // the per-query top-k is the map-capped single window — the partial
    // limit must be planted below the exchange (the scale contract)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    // partitioning-independent
    val again = TextAnalysis.bm25TopKBatch(docs.repartition(7), batch, k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === again.toSeq)
    // duplicate query_id, empty terms, oversized batch: fail loudly
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopKBatch(docs,
        Seq((1L, Seq("a")), (1L, Seq("b"))).toDF("query_id", "terms"), k = 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopKBatch(docs,
        Seq((1L, Seq.empty[String])).toDF("query_id", "terms"), k = 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopKBatch(docs, batch, k = 1, maxQueries = 2)
    }
  }

  test("bm25TopKBatch at a 300-term union matches the per-query form; maxTerms bounds it") {
    import spark.implicits._
    // 300 distinct terms spread over 40 docs and 3 wide queries — the
    // shape whose |T| array-filter projection outgrew Janino before the
    // single-pass TermFreqs rewrite
    val terms = (1 to 300).map(i => f"term$i%03d")
    val rnd = new scala.util.Random(11)
    val docs = (1L to 40L).map { d =>
      val words = Seq.fill(30)(terms(rnd.nextInt(terms.size))) ++
        Seq.fill(5)("unindexed")
      (d, rnd.shuffle(words).mkString(" "))
    }.toDF("doc_id", "text")
    val specs = Seq(
      (1L, terms.slice(0, 120)),
      (2L, terms.slice(80, 220)),
      (3L, terms.slice(180, 300)))
    val out = TextAnalysis.bm25TopKBatch(docs, specs.toDF("query_id", "terms"), k = 7)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    for ((qid, ts) <- specs) {
      val single = TextAnalysis.bm25TopK(docs, ts, k = 7).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val slice = out.filter(_._1 == qid).map(t => (t._2, t._3, t._4))
      assert(slice.toSeq === single.toSeq, s"query $qid diverges at 300-term union")
    }
    // the documented bound fails loudly instead of growing the plan
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopKBatch(
        docs, specs.toDF("query_id", "terms"), k = 7, maxTerms = 200)
    }
  }
}
