package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline tier (SURVEY.md §2):
  * token counting, quality scoring, language-ID heuristics, exact dedup and
  * document fingerprinting over a `documents(doc_id, text, ...)` table.
  *
  * Everything here is pure `org.apache.spark.sql.functions` column algebra —
  * no UDFs, so every operator stays inside Catalyst (higher-order array
  * functions are native expressions) and scales as a single map-side pass
  * plus whatever aggregation the operator declares. Each expression is kept
  * deliberately mirrorable in ANSI-ish SQL so the DuckDB oracle computes the
  * byte-identical result.
  */
object TextAnalysis {

  /** Let-binding for column expressions: evaluates `value` once and binds
    * it as a lambda variable for `body` — `transform` over a one-element
    * array. Interpreted projections only get common-subexpression
    * elimination opportunistically, so an expensive subexpression
    * referenced k times (or referenced inside a `transform` lambda, where
    * it would re-evaluate per element) can cost k× — or |array|× — its
    * single-eval price. A lambda variable is evaluated exactly once by
    * construction, independent of optimizer behavior. Every operator here
    * binds its tokenization/shingling exactly once per row through this.
    */
  def bindOnce(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Deterministic 60-bit hash of a string column: the first 15 hex digits
    * of md5 as a non-negative long. Shared hash primitive for fingerprints,
    * MinHash families and SimHash bits — chosen because both Spark
    * (`conv(substring(md5(x),1,15),16,10)`) and DuckDB
    * (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`) compute it exactly,
    * making results engine-portable and stable across partitionings.
    * r21: evaluated by the codegen'd [[graft.functions.HexHash60]] —
    * the 60-bit value read straight off the digest bytes with a reused
    * per-thread MessageDigest, skipping the builtin chain's per-call
    * digest lookup, 32-char hex string and base-conversion parse.
    * Bit-identical to the column-algebra form (FunctionsSpec parity).
    */
  def hexHash(c: Column): Column = graft.functions.HexHash60(c)

  /** Lowercased whitespace tokens, empties dropped. r21: evaluated by the
    * codegen'd [[graft.functions.Tokens]] — one compiled pass built on the
    * same UTF8String lower/split primitives as the builtin chain, instead
    * of `filter(split(lower(text), "\\s+"), …)` whose higher-order filter
    * runs an interpreted per-token lambda on the library's single most
    * ubiquitous path. Bit-identical on non-null input (FunctionsSpec
    * parity); NULL text PROPAGATES to a NULL array (expression
    * semantics — the old algebra never saw NULL either, every operator
    * reads non-null text columns; pinned in FunctionsSpec).
    */
  def tokens(text: Column): Column = graft.functions.Tokens(text)

  /** Distinct word n-gram shingles ("a b c" strings). Docs with fewer than
    * `n` tokens yield an empty set (they cannot near-dup at this granularity).
    * The token array is let-bound internally: the naive form re-evaluates
    * `toks` for every shingle position (the `slice` inside the position
    * lambda), turning an O(T) tokenization into O(T²) per row whenever the
    * optimizer's interpreted CSE doesn't catch it.
    */
  def shingles(toks: Column, n: Int = 3): Column =
    // r21: the codegen'd [[graft.functions.Shingles]] — one compiled
    // window pass with first-occurrence dedup, replacing the interpreted
    // per-position transform(concat_ws(slice(…))) lambda. Bit-identical
    // values and order on non-null input (FunctionsSpec parity); a NULL
    // token array PROPAGATES to NULL (the old when/otherwise algebra
    // yielded an empty array there — unreachable at every call site,
    // which all filter on shingle/token counts; pinned in FunctionsSpec).
    graft.functions.Shingles(toks, n)

  /** Per-document token counts: whitespace tokens plus a BPE-ish lexer count
    * (runs of letters | runs of digits | single other non-space chars) — the
    * standard cheap proxy for subword token counts in corpus budgeting.
    */
  def tokenCount(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("bpe_tokens"),
        (length(col("text")) / greatest(size(col("toks")), lit(1)))
          .as("chars_per_token"))

  /** Corpus profile — the dataset-card rollup: per (lang, source)
    * stratum, document/token counts, length extremes, the short-doc tally
    * and the distinct-text count (per-stratum duplication rate). All
    * aggregates are integers, so the result is hash-exact across engines,
    * runs and partitionings. The plan is the ideal distributed rollup:
    * map-side tokenize + partial aggregation, exchanges carry only
    * (stratum, partial) rows — plus the standard two-phase distinct
    * aggregation on the 16-byte digest for `n_distinct_texts`, the one
    * stat worth a digest-volume shuffle.
    */
  def corpusProfile(docs: DataFrame, shortTokens: Int = 20): DataFrame =
    docs
      .withColumn("n_toks", size(tokens(col("text"))).cast("long"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        min(col("n_toks")).as("min_tokens"),
        max(col("n_toks")).as("max_tokens"),
        sum(when(col("n_toks") < shortTokens, 1L).otherwise(0L)).as("n_short"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"))

  /** [[corpusProfile]]'s SKETCH form — the 100 TB distinct count: exact
    * `countDistinct` shuffles every distinct digest; HyperLogLog++
    * (`approx_count_distinct`) shuffles one fixed-size sketch per group
    * and partial-merges map-side, so the exchange is #groups × sketch
    * bytes regardless of corpus size. The sketch insert and merge are
    * deterministic and commutative — the estimate is partitioning-
    * independent (spec-asserted within 3·rsd of exact). Rows-only at the
    * gate: DuckDB's HLL is a different sketch, so estimates differ by
    * construction.
    */
  def corpusProfileApprox(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    docs
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(md5(col("text")), rsd).as("n_distinct_approx"))

  /** English stopwords used by quality scoring and language ID. */
  private[operators] val EnStop = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Per-language quality tables: the stopword list the gates count and
    * the character class `gopherQuality` treats as alphabetic. A real
    * corpus pipeline filters per language — an English stopword gate
    * rejects every high-quality German document — so the quality battery
    * ([[passesQuality]], [[qualityScore]], [[gopherQuality]]) takes a pack
    * and defaults to [[LangPack.en]], keeping every default-path result
    * (and oracle) bit-identical. Lists are the standard public
    * function-word sets (the top of each language's frequency table); the
    * plan is language-independent — packs only swap literal arrays.
    */
  final case class LangPack(
      lang: String, stopwords: Seq[String], alphaPattern: String = "[a-z]",
      meanWordLenLo: Double = 3, meanWordLenHi: Double = 10)

  object LangPack {
    val en: LangPack = LangPack("en", EnStop)
    val de: LangPack = LangPack("de", Seq("der", "die", "das", "und", "ist",
      "nicht", "ein", "eine", "zu", "den", "von", "mit", "auf", "sich", "dem"))
    val es: LangPack = LangPack("es", Seq("el", "la", "los", "las", "y", "es",
      "que", "de", "en", "un", "una", "por", "con", "no", "se"))
    val fr: LangPack = LangPack("fr", Seq("le", "la", "les", "et", "est", "une",
      "dans", "de", "un", "du", "des", "que", "pour", "pas", "sur"))
    // The non-Latin proof: a Cyrillic alphabetic class (the `[a-z]`
    // default scores every Russian word 0 % alphabetic, failing gopher's
    // frac_alpha >= 0.8 on perfect prose) and a widened mean-word-length
    // ceiling — Russian running text averages noticeably longer words
    // than English, so Gopher's en-tuned 3..10 band is kept but with
    // headroom at 12.
    val ru: LangPack = LangPack("ru", Seq("и", "в", "не", "на", "я", "что",
      "с", "он", "как", "это", "по", "но", "его", "к", "у"),
      alphaPattern = "[а-яё]", meanWordLenHi = 12)
    val all: Seq[LangPack] = Seq(de, en, es, fr, ru)
    def forLang(code: String): Option[LangPack] = all.find(_.lang == code)
  }

  private[operators] def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*))).cast("long")

  /** The boolean quality gate on its own — shared by the batch
    * `qualityScore` report, the `corpus_clean` pipeline and the streaming
    * ingest filter, so "passes quality" means exactly one thing everywhere.
    */
  def passesQuality(text: Column, pack: LangPack = LangPack.en): Column =
    bindOnce(tokens(text), toks =>
      size(toks) >= 5 && length(text) >= 40 && countIn(toks, pack.stopwords) > 0)

  /** Per-language ROUTED quality gate: each document is judged by its own
    * language's battery (the corpus's `lang` tag selects the pack; tags
    * without a pack fall back to `fallback`) — the form a multilingual
    * corpus pipeline actually needs, since an English stopword gate
    * rejects every high-quality German document. One map-side CASE over
    * literal stopword arrays; only the matched branch evaluates, so the
    * per-row cost equals the single-language gate. No shuffle.
    */
  def passesQualityFor(
      text: Column, lang: Column, fallback: LangPack = LangPack.en): Column =
    LangPack.all.foldRight(passesQuality(text, fallback)) { case (p, alt) =>
      when(lang === p.lang, passesQuality(text, p)).otherwise(alt)
    }

  /** Heuristic document quality: length, token stats, punctuation density,
    * stopword ratio, uppercase ratio — the classic cheap filters a corpus
    * pipeline applies before anything expensive (cf. C4/Gopher rules).
    * `pack` selects the language's stopword table; the default keeps the
    * English battery.
    */
  def qualityScore(docs: DataFrame, pack: LangPack = LangPack.en): DataFrame =
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tok", greatest(size(col("toks")), lit(1)).cast("long"))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        round(length(col("text")).cast("double") / col("n_tok"), 4).as("chars_per_token"),
        size(regexp_extract_all(col("text"), lit("[.,;:!?]"), lit(0)))
          .cast("long").as("punct_count"),
        round(countIn(col("toks"), pack.stopwords).cast("double") / col("n_tok"), 4)
          .as("stopword_ratio"),
        (size(col("toks")) >= 5 && length(col("text")) >= 40 &&
          countIn(col("toks"), pack.stopwords) > 0).as("passes_quality"))

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> EnStop,
    "es" -> Seq("el", "los", "las", "y", "es", "que"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"),
    "ru" -> Seq("и", "в", "не", "на", "что", "с"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Language ID by stopword-marker voting: count marker hits per language,
    * argmax with a fixed alphabetical tie-break ("und" (unknown) when no
    * marker hits at all). The n-gram-profile upgrade shares this shape —
    * counts per profile, argmax — so the plan (one map-side pass) is the one
    * that survives at scale.
    */
  def langId(docs: DataFrame): DataFrame = {
    val withScores = LangMarkers.foldLeft(docs.withColumn("toks", tokens(col("text")))) {
      case (df, (lang, markers)) =>
        df.withColumn(s"score_$lang", countIn(col("toks"), markers))
    }
    val scores = LangMarkers.map { case (l, _) => col(s"score_$l") }
    // argmax with alphabetical tie-break: first language whose score equals
    // the row max wins; all-zero rows are "und".
    val best = LangMarkers.foldRight(lit("und")) { case ((lang, _), alt) =>
      when(col(s"score_$lang") === greatest(scores: _*) && greatest(scores: _*) > 0,
        lit(lang)).otherwise(alt)
    }
    withScores.select(
      (col("doc_id") +: best.as("lang_pred") +:
        LangMarkers.map { case (l, _) => col(s"score_$l") }): _*)
  }

  /** Exact dedup: group identical text by md5, keep the smallest doc_id as
    * canonical. One hash-shuffle on the digest (never the text payload) —
    * the 100 TB plan: shuffle volume is 16 bytes + ids per row.
    */
  def dedupExact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(
        min(col("doc_id")).cast("long").as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** Deterministic hash sampling: keeps rows whose salted id-hash lands
    * under `pct` of 100 — reproducible across engines, runs and
    * partitionings (no RNG state), map-side only, and inherently
    * stratified: within any stratum (language, source, …) the kept
    * fraction concentrates around pct% because the hash is independent of
    * every attribute. The corpus-subsetting primitive of a training-data
    * pipeline. Returns the filtered frame with its original columns —
    * works on any frame with an `idCol`; callers project what they need.
    */
  def hashSample(
      docs: DataFrame, pct: Int = 10, salt: String = "sample",
      idCol: String = "doc_id"): DataFrame =
    docs.where(hexHash(concat(lit(s"$salt|"), col(idCol).cast("string"))) % 100 < pct)

  /** [[hashSample]] at per-mille resolution — for rates the integer
    * percent can't express (a 0.5 % eval holdout of a 100 TB corpus is
    * still 500 GB). Same determinism properties. NOTE: a different
    * modulus means `permille = 10 × pct` keeps a DIFFERENT (same-sized)
    * subset than `hashSample(pct)` — pick one resolution per pipeline.
    */
  def hashSamplePermille(
      docs: DataFrame, permille: Int = 100, salt: String = "sample",
      idCol: String = "doc_id"): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille must be in [0, 1000]: $permille")
    docs.where(hexHash(concat(lit(s"$salt|"), col(idCol).cast("string"))) % 1000 < permille)
  }

  /** Domain-mixture sampling: per-stratum keep rates — the mixing step
    * that turns raw corpus proportions into a target training mix (the
    * Pile/DoReMi-style domain weighting, realized as subsampling). A row
    * is kept iff its salted id-hash lands under its stratum's percentage;
    * strata absent from `weights` get `defaultPct`. Same deterministic
    * map-side filter as [[hashSample]] — reproducible across engines,
    * runs and partitionings, no shuffle — but the rate is
    * stratum-conditional, so relative domain proportions are reshaped
    * instead of preserved.
    */
  def mixSample(
      docs: DataFrame,
      weights: Map[String, Int],
      byCol: String = "lang",
      defaultPct: Int = 0,
      salt: String = "mix",
      idCol: String = "doc_id"): DataFrame =
    mixSampleAt(docs, weights, byCol, defaultPct, salt, idCol, outOf = 100)

  /** [[mixSample]] at per-mille resolution (weights in [0, 1000]) — see
    * the resolution note on [[hashSamplePermille]]. */
  def mixSamplePermille(
      docs: DataFrame,
      weights: Map[String, Int],
      byCol: String = "lang",
      defaultPermille: Int = 0,
      salt: String = "mix",
      idCol: String = "doc_id"): DataFrame =
    mixSampleAt(docs, weights, byCol, defaultPermille, salt, idCol, outOf = 1000)

  private def mixSampleAt(
      docs: DataFrame, weights: Map[String, Int], byCol: String,
      default: Int, salt: String, idCol: String, outOf: Int): DataFrame = {
    require((weights.values ++ Seq(default)).forall(p => p >= 0 && p <= outOf),
      s"stratum rates must be in [0, $outOf]")
    val rate = weights.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (alt, (k, p)) => when(col(byCol) === k, lit(p)).otherwise(alt)
    }
    docs.where(hexHash(concat(lit(s"$salt|"), col(idCol).cast("string"))) % outOf < rate)
  }

  /** Token-budget mixture SOLVER — the step [[mixSample]] leaves to the
    * caller: given target composition shares (permille of the token
    * budget per stratum) and the budget itself, compute each stratum's
    * keep rate from what the corpus actually holds. "Give me ~20B tokens
    * at 60/30/10 en/de/fr" becomes a plan table: per stratum, available
    * tokens, target tokens, the per-mille keep rate that hits the
    * target in expectation, and a `feasible` flag for strata whose
    * target exceeds supply (rate clamps at 1000 — the mixture DEGRADES
    * OBSERVABLY instead of silently rebalancing; unlisted strata get
    * share 0 and drop).
    *
    * One bounded aggregate (≤ #strata rows — the corpus_profile shape);
    * per-stratum targets are Scala-side exact integer arithmetic baked
    * in as literals, and the keep rate is integer ceil-division inside
    * the plan (`div`, never IEEE), so an engine oracle reproduces every
    * boundary. [[mixApply]] then materializes the mixture map-side with
    * the same deterministic id-hash primitive as [[mixSample]].
    */
  def mixPlan(
      docs: DataFrame,
      sharePermille: Map[String, Int],
      tokenBudget: Long,
      byCol: String = "lang"): DataFrame = {
    require(sharePermille.values.forall(p => p >= 0 && p <= 1000),
      "stratum shares must be in [0, 1000] permille")
    require(sharePermille.values.sum <= 1000,
      s"shares sum to ${sharePermille.values.sum} > 1000 permille")
    require(tokenBudget >= 0 && tokenBudget <= Long.MaxValue / 1000,
      s"tokenBudget out of range: $tokenBudget")
    val share = sharePermille.toSeq.sortBy(_._1).foldLeft(lit(0)) {
      case (alt, (k, p)) => when(col(byCol) === k, lit(p)).otherwise(alt)
    }
    // exact integer target per stratum, computed driver-side as literals
    val target = sharePermille.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (alt, (k, p)) =>
        when(col(byCol) === k, lit(tokenBudget * p / 1000)).otherwise(alt)
    }
    docs
      .groupBy(col(byCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("avail_tokens"))
      .select(col(byCol), col("n_docs"), col("avail_tokens"),
        share.as("share_permille"), target.as("target_tokens"))
      // ceil(target·1000 / avail) in INTEGER division; clamp at 1000 when
      // the stratum cannot supply its target
      .withColumn("keep_permille",
        when(col("target_tokens") >= col("avail_tokens"), lit(1000L))
          .otherwise(expr(
            "(target_tokens * 1000 + avail_tokens - 1) div avail_tokens")))
      .withColumn("feasible", col("target_tokens") <= col("avail_tokens"))
  }

  /** Materialize a [[mixPlan]]: keep each doc iff its deterministic
    * id-hash falls under its stratum's solved keep rate — the same
    * `hash(salt|id) % 1000 < rate` primitive as [[mixSamplePermille]],
    * so the selection is reproducible and composes with every other
    * hash-sampled stage. The plan table (≤ #strata rows) broadcasts;
    * the filter is map-side, zero shuffle. Docs in strata absent from
    * the plan drop (left join, rate defaults 0) — a plan solved on an
    * older corpus snapshot fails closed on new strata.
    */
  def mixApply(
      docs: DataFrame,
      plan: DataFrame,
      byCol: String = "lang",
      salt: String = "mixplan",
      idCol: String = "doc_id"): DataFrame =
    docs
      .join(broadcast(plan.select(col(byCol), col("keep_permille"))),
        Seq(byCol), "left")
      .where(hexHash(concat(lit(s"$salt|"), col(idCol).cast("string"))) % 1000
        < coalesce(col("keep_permille"), lit(0L)))
      .drop("keep_permille")

  /** Text normalization: lowercase, collapse whitespace runs to single
    * spaces, trim — plus the md5 of the normalized form, the standard
    * pre-pass that turns exact dedup into whitespace/case-insensitive
    * dedup. One map-side pass; the normalized string is let-bound so the
    * digest and length don't re-run the regex.
    */
  def textNormalize(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        bindOnce(trim(regexp_replace(lower(col("text")), "\\s+", " ")), n =>
          struct(n.as("norm_text"), md5(n).as("norm_md5"),
            length(n).cast("long").as("n_chars_norm"))).as("s"))
      .select(col("doc_id"), col("s.norm_text"), col("s.norm_md5"), col("s.n_chars_norm"))

  /** Within-document repetition metrics — the Gopher-family quality rules
    * (Rae et al. '21 §A1.1) that catch boilerplate, keyword stuffing and
    * templated spam *before* any cross-document dedup:
    * `distinct_token_ratio` (type/token ratio), `dup_3gram_ratio` (fraction
    * of word-3gram positions whose 3-gram already occurred in the doc) and
    * `top_token_ratio` (most-frequent-token share). One map-side pass of
    * pure column algebra: the token array and the NON-distinct 3-gram list
    * are each let-bound (bindOnce) — the per-distinct-token frequency scan
    * is O(types × tokens) per row, on the row's own arrays only, no
    * shuffle anywhere.
    */
  /** Corpus-adaptive length-band filter: keeps documents whose token
    * count lies inside the corpus's own exact [pLo, pHi] percentile band
    * — the adaptive form of Gopher's fixed word-count bounds (a threshold
    * tuned for web text is wrong for code or chat transcripts; the
    * percentile band self-calibrates per corpus/stratum). The percentile
    * is EXACT, not a sketch: threshold for rank r = ceil(p·N) is the
    * smallest length v with #(docs of length ≤ v) ≥ r — deterministic and
    * engine-portable where `percentile_approx` sketches would never
    * hash-match an oracle.
    *
    * Plan: one map-side pass to (doc, n_tokens); the thresholds come from
    * the LENGTH HISTOGRAM (distinct token counts — bounded by max doc
    * length, thousands of rows at any corpus size), fetched driver-side
    * at plan time like the IVF codebooks, then baked in as literal
    * bounds, so the filter itself is a pushdown-friendly map-side
    * BETWEEN. No corpus sort, no corpus-wide window.
    *
    * Percentiles are INTEGER per-mille and the rank is integer
    * arithmetic — `ceil(0.05 · N)` in IEEE doubles lands on 26 where
    * DECIMAL arithmetic lands on 25 (N = 500), so a float-percentile API
    * could never hash-match a SQL oracle at integer boundaries.
    *
    * `histCeiling` bounds the driver fetch against adversarial corpora:
    * token counts clamp to the ceiling BEFORE the groupBy, so the
    * histogram can never exceed `histCeiling + 1` rows even when a corpus
    * of million-token documents has a distinct length per doc. Thresholds
    * strictly below the ceiling are bit-identical to the unclamped
    * computation (the clamp only merges mass ABOVE them); a threshold
    * that lands on the ceiling means "the percentile is at or beyond the
    * clamp", and the band degrades gracefully to a superset — a lo bound
    * at the ceiling keeps every doc ≥ ceiling, a hi bound there becomes
    * unbounded above — never mis-filtering any doc below the clamp.
    */
  def lengthBand(
      docs: DataFrame, pLoPermille: Int = 50, pHiPermille: Int = 950,
      histCeiling: Long = 1L << 16): DataFrame = {
    require(0 <= pLoPermille && pLoPermille <= pHiPermille && pHiPermille <= 1000,
      s"need 0 <= pLo <= pHi <= 1000 permille: $pLoPermille, $pHiPermille")
    require(histCeiling > 0, s"histCeiling must be positive: $histCeiling")
    val tc = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))
    val hist = lengthHistogram(tc, histCeiling)
    if (hist.isEmpty) return tc.where(lit(false))
    val n = hist.map(_._2).sum
    def thresholdAt(permille: Int): Long = {
      // smallest length whose cumulative count reaches rank ceil(n·p/1000)
      val rank = math.max((n * permille + 999) / 1000, 1L)
      var cum = 0L
      hist.find { case (_, c) => cum += c; cum >= rank }.map(_._1).getOrElse(hist.last._1)
    }
    val (lo, hi) = (thresholdAt(pLoPermille), thresholdAt(pHiPermille))
    val hiBound = if (hi >= histCeiling) Long.MaxValue else hi
    // the superset degradation (hi threshold at the ceiling ⇒ unbounded
    // above) must be observable, not silent
    val clampedMass = hist.last match {
      case (len, c) if len == histCeiling => c
      case _                              => 0L
    }
    if (clampedMass > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"lengthBand: $clampedMass of $n docs have >= $histCeiling tokens and " +
          "were clamped into the ceiling bucket; percentile thresholds at or " +
          "above the ceiling degrade to unbounded-above (superset). Raise " +
          "histCeiling if exact upper banding matters for this corpus.")
    tc.where(col("n_tokens").between(lo, hiBound))
  }

  /** The clamped length histogram behind [[lengthBand]]: (clamped length,
    * count) pairs, ascending, at most `histCeiling + 1` rows by
    * construction. Package-visible so specs can assert the fetch bound
    * directly.
    */
  private[graft] def lengthHistogram(
      tc: DataFrame, histCeiling: Long): Array[(Long, Long)] =
    tc.groupBy(least(col("n_tokens"), lit(histCeiling)).as("n_tokens"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** Compression-ratio quality signal: `deflate(text).length /
    * utf8(text).length` — the information-theoretic twin of
    * [[repetitionScore]] (low ratio ⇒ highly compressible ⇒ repetitive /
    * templated / boilerplate; near-1 on short high-entropy text). The
    * classic cheap filter corpus pipelines run alongside the Gopher
    * rules. No SQL engine exposes deflate, so this operator is spec-only
    * (no DuckDB oracle) — but it is exactly reproducible: one
    * `java.util.zip.Deflater` at a fixed level per partition (native
    * zlib, deterministic for a given input and level), streamed row by
    * row, constant memory.
    */
  def compressionRatio(docs: DataFrame, level: Int = 6): DataFrame = {
    require(level >= 1 && level <= 9, s"deflate level must be in [1, 9]: $level")
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(level)
        val buf = new Array[Byte](64 * 1024)
        rows.map { case (id, text) =>
          val raw = Option(text).getOrElse("").getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          val ratio =
            if (raw.length == 0) 1.0
            else math.rint(compressed.toDouble / raw.length * 10000) / 10000
          (id, raw.length.toLong, compressed, ratio)
        }
      }
      .toDF("doc_id", "n_bytes", "n_deflate", "compress_ratio")
  }

  def repetitionScore(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        bindOnce(tokens(col("text")), tk =>
          bindOnce(
            // all 3-gram positions, duplicates KEPT (shingles() dedups —
            // repetition is precisely the signal dedup would erase)
            when(size(tk) >= 3,
              transform(sequence(lit(1), size(tk) - 2),
                i => concat_ws(" ", slice(tk, i, lit(3)))))
              .otherwise(array().cast("array<string>")),
            gs => struct(
              size(tk).cast("long").as("n_tokens"),
              round(size(array_distinct(tk)).cast("double") /
                greatest(size(tk), lit(1)), 4).as("distinct_token_ratio"),
              round(when(size(gs) > 0,
                  lit(1.0) - size(array_distinct(gs)).cast("double") / size(gs))
                .otherwise(lit(0.0)), 4).as("dup_3gram_ratio"),
              round(when(size(tk) > 0,
                  array_max(transform(array_distinct(tk),
                    t => size(filter(tk, x => x === t)))).cast("double") / size(tk))
                .otherwise(lit(0.0)), 4).as("top_token_ratio")))).as("s"))
      .select(col("doc_id"), col("s.n_tokens"), col("s.distinct_token_ratio"),
        col("s.dup_3gram_ratio"), col("s.top_token_ratio"))

  /** Gopher-STYLE quality-filter battery (after Rae et al. '21 §A1.1):
    * word-count bounds, mean-word-length bounds, minimum alphabetic-word
    * fraction, minimum distinct-stopword count, and the line-shape rules
    * (bullet / ellipsis line fractions, which flag listicles and
    * truncated scrapes). Deliberate deviations from the paper: the
    * distinct-stopword rule uses this repo's shared 10-word `EnStop` list
    * rather than Gopher's 8 (the/be/to/of/and/that/have/with), and the
    * symbol-to-word-ratio rule (#/… density) is not implemented — tune
    * thresholds accordingly. Emits every metric plus the composed
    * `passes_gopher` verdict so thresholds stay auditable. One map-side
    * pass; the token and line arrays are each let-bound; the word-length
    * sum is an exact integer fold, so every ratio is bit-reproducible.
    */
  def gopherQuality(docs: DataFrame, pack: LangPack = LangPack.en): DataFrame =
    docs
      .select(col("doc_id"), gopherMetrics(col("text"), pack).as("s"))
      .select(col("doc_id"), col("s.*"),
        gopherVerdict(col("s"), pack).as("passes_gopher"))

  /** The Gopher metric struct on its own — shared by [[gopherQuality]]'s
    * telemetry frame and [[qualityEnsemble]]'s one-pass verdict battery,
    * so "the Gopher rules" mean exactly one expression everywhere (the
    * `piiClean`/`passesQuality` sharing discipline).
    */
  private[operators] def gopherMetrics(text: Column, pack: LangPack): Column =
    bindOnce(tokens(text), tk =>
      // lines are bound already TRIMMED — the per-branch trim(l) would
      // otherwise re-run up to five times per line (bindOnce's rule)
      bindOnce(transform(split(text, "\n"), trim(_)), ln => {
        val nW = greatest(size(tk), lit(1))
        val nL = greatest(size(ln), lit(1))
        val bullet = size(filter(ln, l =>
          l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
        val ellip = size(filter(ln, l =>
          l.endsWith("...") || l.endsWith("…")))
        struct(
          size(tk).cast("long").as("n_words"),
          round(aggregate(transform(tk, length(_).cast("long")),
            lit(0L), (a, x) => a + x).cast("double") / nW, 4).as("mean_word_len"),
          round(size(filter(tk, w => w.rlike(pack.alphaPattern))).cast("double") / nW, 4)
            .as("frac_alpha_words"),
          round(bullet.cast("double") / nL, 4).as("frac_bullet_lines"),
          round(ellip.cast("double") / nL, 4).as("frac_ellipsis_lines"),
          // array_intersect already dedups — no array_distinct pre-pass
          size(array_intersect(tk, array(pack.stopwords.map(lit(_)): _*)))
            .cast("long").as("n_stop_distinct"))
      }))

  /** The composed Gopher verdict over a [[gopherMetrics]] struct. */
  private[operators] def gopherVerdict(s: Column, pack: LangPack): Column =
    s.getField("n_words") >= 50 && s.getField("n_words") <= 100000 &&
      s.getField("mean_word_len") >= pack.meanWordLenLo &&
      s.getField("mean_word_len") <= pack.meanWordLenHi &&
      s.getField("frac_alpha_words") >= 0.8 &&
      s.getField("n_stop_distinct") >= 2 &&
      s.getField("frac_bullet_lines") <= 0.9 &&
      s.getField("frac_ellipsis_lines") <= 0.3

  /** C4-style line-level boilerplate filter (after Raffel et al. '20
    * §2.2 — the cleaning pass every web-scale pretraining corpus runs
    * before quality scoring). Public heuristics, applied per line
    * (trimmed):
    *
    *   - keep only lines ending in a terminal punctuation mark
    *     (`.` `!` `?` or a closing double-quote);
    *   - keep only lines with at least `minWordsPerLine` words;
    *   - drop any line containing the word "javascript";
    *
    * and per page: drop pages containing `{` (leaked code/markup), pages
    * containing "lorem ipsum" (placeholder boilerplate), and pages whose
    * RETAINED text has fewer than `minSentences` sentences (terminal-
    * punctuation marks in the kept lines). The paper's bad-words list is
    * deliberately not implemented (licensing; plug a `filter` on
    * `clean_text` if needed).
    *
    * Emits per-rule telemetry alongside the verdict — `n_lines`,
    * `n_kept_lines`, `n_js_lines`, `n_sentences`, `has_brace`,
    * `has_lorem` — so thresholds stay auditable (the gopherQuality
    * discipline), plus `clean_text` (kept lines re-joined) for the
    * downstream pipeline. One map-side pass, zero shuffle: the trimmed
    * line array and the kept subset are each let-bound via [[bindOnce]];
    * at 100 TB this composes ahead of `corpus_curate` as pure narrow
    * work that Catalyst fuses into the scan stage.
    */
  def c4Filter(
      docs: DataFrame, minWordsPerLine: Int = 5, minSentences: Int = 3): DataFrame =
    docs
      .select(col("doc_id"), c4Metrics(col("text"), minWordsPerLine).as("s"))
      .select(col("doc_id"), col("s.*"),
        c4Verdict(col("s"), minSentences).as("passes_c4"))

  /** The C4 metric struct on its own — shared by [[c4Filter]]'s telemetry
    * frame and [[qualityEnsemble]] (the [[gopherMetrics]] discipline). */
  private[operators] def c4Metrics(text: Column, minWordsPerLine: Int): Column =
    bindOnce(transform(split(text, "\n"), trim(_)), ln =>
      bindOnce(filter(ln, l =>
          l.rlike("[.!?\"]$") &&
            size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= minWordsPerLine &&
            !lower(l).contains("javascript")), kept =>
        bindOnce(array_join(kept, "\n"), ct =>
          struct(
            size(ln).cast("long").as("n_lines"),
            size(kept).cast("long").as("n_kept_lines"),
            size(filter(ln, l => lower(l).contains("javascript")))
              .cast("long").as("n_js_lines"),
            size(regexp_extract_all(ct, lit("[.!?]"), lit(0)))
              .cast("long").as("n_sentences"),
            text.contains("{").as("has_brace"),
            lower(text).contains("lorem ipsum").as("has_lorem"),
            ct.as("clean_text")))))

  /** The composed C4 page verdict over a [[c4Metrics]] struct. */
  private[operators] def c4Verdict(s: Column, minSentences: Int): Column =
    !s.getField("has_brace") && !s.getField("has_lorem") &&
      s.getField("n_sentences") >= minSentences

  /** FineWeb's custom line-shape filter battery (Penedo et al. '24 §3.6 —
    * the three heuristics FineWeb adds beyond its C4/Gopher passes, found
    * by ablating against their quality classifier): a page fails when
    * too FEW lines end in punctuation (≤ 12 % — tag-soup/nav fragments),
    * too MANY lines are short (≥ 67 % under 30 chars — link lists,
    * menus), or too much of its character mass sits in repeated lines
    * (≥ 10 % — templated/boilerplate bodies; the Gopher duplicate-line
    * signal at character weight, counting every occurrence after a
    * line's first).
    *
    * Emits each fraction (rounded telemetry) plus the composed
    * `passes_fineweb`; the VERDICTS compare in exact integer
    * cross-multiplication (permille thresholds), never on the rounded
    * doubles, so pass/fail is bit-portable across engines and
    * partitionings. Lines are trimmed, empties excluded everywhere. One
    * map-side pass, zero shuffle — composes ahead of `corpus_curate` as
    * narrow work fused into the scan; the duplicate-char fold is
    * O(lines²) per document (bounded per row, like repetitionScore's
    * top-token scan), never cross-document. Documents with no non-empty
    * lines fail the punctuation rule by construction.
    */
  def finewebFilter(
      docs: DataFrame,
      shortLineChars: Int = 30,
      minPunctLinePermille: Int = 120,
      maxShortLinePermille: Int = 670,
      maxDupLineCharPermille: Int = 100): DataFrame =
    docs
      .select(col("doc_id"), finewebMetrics(col("text"), shortLineChars,
        minPunctLinePermille, maxShortLinePermille, maxDupLineCharPermille).as("s"))
      .select(col("doc_id"), col("s.*"))

  /** The FineWeb metric-and-verdict struct on its own — shared by
    * [[finewebFilter]]'s telemetry frame and [[qualityEnsemble]] (the
    * [[gopherMetrics]] discipline). */
  private[operators] def finewebMetrics(
      text: Column,
      shortLineChars: Int = 30,
      minPunctLinePermille: Int = 120,
      maxShortLinePermille: Int = 670,
      maxDupLineCharPermille: Int = 100): Column =
    bindOnce(
      filter(transform(split(text, "\n"), trim(_)), l => length(l) > 0),
      ne => bindOnce(length(array_join(ne, "")).cast("long"), totChars => {
        val nLines = size(ne).cast("long")
        val punct = size(filter(ne, l => l.rlike("[.!?\"']$"))).cast("long")
        val short = size(filter(ne, l => length(l) < shortLineChars)).cast("long")
        val dupChars = aggregate(array_distinct(ne), lit(0L), (acc, d) =>
          acc + (size(filter(ne, x => x === d)) - 1).cast("long") * length(d))
        struct(
          nLines.as("n_lines"),
          round(punct.cast("double") / greatest(nLines, lit(1L)), 4)
            .as("punct_line_frac"),
          round(short.cast("double") / greatest(nLines, lit(1L)), 4)
            .as("short_line_frac"),
          round(dupChars.cast("double") / greatest(totChars, lit(1L)), 4)
            .as("dup_line_char_frac"),
          (punct * 1000 > nLines * minPunctLinePermille &&
            short * 1000 < nLines * maxShortLinePermille &&
            dupChars * 1000 < totChars * maxDupLineCharPermille)
            .as("passes_fineweb"))
      }))

  /** Corpus-unigram LM scoring — the cheap statistical stand-in for the
    * KenLM-perplexity quality filter (cf. CCNet): every document is scored
    * by the average negative log-probability of its tokens under the
    * corpus's own unigram distribution, plus its hapax ratio (fraction of
    * tokens occurring exactly once corpus-wide). High avg_neg_logprob ⇒
    * rare-token-heavy (noise, codes, mojibake); near-zero ⇒ degenerate
    * repetition of corpus-dominant tokens.
    *
    * Plan (exact, `vocabTopK = None`): one token explode feeding (a) the
    * vocabulary aggregation and (b) the scoring join — two hash shuffles
    * on the token key, both AQE-skew-eligible (stopword keys are the
    * classic heavy hitters). Correct at any size, but the scoring join
    * moves every token occurrence — not the 100 TB plan.
    *
    * Plan (capped, `vocabTopK = Some(k)`): the 100 TB variant. The
    * vocabulary is aggregated once (map-side combine reduces the shuffle
    * to per-partition DISTINCT tokens), truncated to the k most frequent
    * terms, and BROADCAST; scoring is then a map-side broadcast join with
    * an out-of-vocabulary log-prob floor of `log(1/total)` (an OOV token
    * scores as if it occurred once), and the per-doc aggregation
    * partial-aggregates map-side (explode keeps a document's tokens in one
    * partition), so the only corpus-volume shuffle left is the vocabulary
    * count itself. Because truncation hides true counts of dropped terms,
    * the capped variant reports `oov_ratio` (fraction of tokens outside
    * the top-k vocabulary) in place of `hapax_ratio` — with k ≥ |vocab|
    * it degenerates to the exact scores with `oov_ratio = 0`.
    *
    * Per-token log-probs are rounded to 6 decimals and summed as
    * DECIMAL(18,6), so the per-doc sum is exact and order-independent
    * under any partitioning (a double sum would drift with partition
    * order). Zero-token documents have no rows to score and drop out.
    *
    * `carry` names doc-level columns (functionally dependent on doc_id,
    * e.g. `lang`) to ride the explode and the per-doc groupBy so callers
    * composing on the scores — [[perplexityBuckets]] needs the language —
    * get them WITHOUT a corpus-keyed join back to `docs`. The composite
    * grouping key has doc_id's cardinality, so the shuffle is unchanged.
    */
  def unigramLm(
      docs: DataFrame, vocabTopK: Option[Int] = None,
      carry: Seq[String] = Nil): DataFrame = {
    val carryCols = carry.map(col)
    val docKey = col("doc_id") +: carryCols
    val tok = docs.select(
      (docKey :+ explode(tokens(col("text"))).as("tok")): _*)
    val freqs = tok.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    vocabTopK match {
      case None =>
        val total = freqs.agg(sum(col("tf")).as("total"))
        tok.join(freqs, "tok")
          .crossJoin(broadcast(total))
          .withColumn("lp",
            round(log(col("tf").cast("double") / col("total")), 6).cast("decimal(18,6)"))
          .groupBy(docKey: _*)
          .agg(
            count(lit(1)).as("n_tokens"),
            round(-sum(col("lp")).cast("double") / count(lit(1)), 4).as("avg_neg_logprob"),
            round(sum(when(col("tf") === 1, 1L).otherwise(0L)).cast("double") / count(lit(1)), 4)
              .as("hapax_ratio"))
      case Some(k) =>
        require(k > 0, s"vocabTopK must be positive: $k")
        // the vocabulary frame is read twice (grand total + top-k cut);
        // persist for exactly those two actions, eagerly materialize the
        // small results, release — the Dedup signature-cache discipline
        val f = freqs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val total = f.agg(sum(col("tf")).as("total")).localCheckpoint()
        // ties on the term keep the cut deterministic and engine-portable
        val top = f.orderBy(col("tf").desc, col("tok")).limit(k).localCheckpoint()
        f.unpersist()
        tok.join(broadcast(top), Seq("tok"), "left")
          .crossJoin(broadcast(total))
          .withColumn("lp",
            round(log(coalesce(col("tf").cast("double"), lit(1.0)) / col("total")), 6)
              .cast("decimal(18,6)"))
          .groupBy(docKey: _*)
          .agg(
            count(lit(1)).as("n_tokens"),
            round(-sum(col("lp")).cast("double") / count(lit(1)), 4).as("avg_neg_logprob"),
            round(sum(when(col("tf").isNull, 1L).otherwise(0L)).cast("double") / count(lit(1)), 4)
              .as("oov_ratio"))
    }
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. '19,
    * arXiv:1911.00359 §4.3): every document is tagged `head` / `middle` /
    * `tail` by where its LM score falls in its OWN LANGUAGE's score
    * distribution — CCNet's per-language tercile split, whose `head` cut
    * is the classic web-corpus quality gate (low perplexity under an
    * in-domain LM ⇒ fluent text). The LM here is [[unigramLm]] (or its
    * capped broadcast-vocabulary form via `vocabTopK` — the 100 TB
    * scoring path), so the whole stage stays inside this engine instead
    * of shelling out to KenLM.
    *
    * Cut points are EXACT integer-rank percentiles over a BOUNDED
    * histogram, not a corpus sort: the histogram keys on the score
    * itself, which [[unigramLm]] already rounds to 4 decimals and whose
    * magnitude the OOV floor caps at ln(corpus tokens) ≈ 40 — so the
    * per-language histogram is ≤ ~400k rows by construction AT ANY
    * CORPUS SIZE (score resolution × score range, independent of doc
    * count; no fresh rounding step, so no new cross-engine half-boundary
    * surface). The cumulative window runs over those histogram rows
    * only, and the per-language threshold table (≤ #languages rows)
    * broadcast-joins back map-side. Ranks use the [[lengthBand]]
    * integer-arithmetic discipline — `ceil(n·p/1000)` computed in
    * integers, so an engine oracle lands on the same row at every
    * boundary.
    *
    * The scored frame feeds both the histogram and the final tagging;
    * it is persisted for exactly those two consumers and released before
    * return (the [[graft.operators.Dsir]] persisted-form discipline —
    * measured there at 2.2× over recompute for the same shape). Output
    * is eagerly materialized via localCheckpoint, ~4 narrow columns per
    * doc. Zero-token documents have no score and drop out, as in
    * [[unigramLm]].
    */
  def perplexityBuckets(
      docs: DataFrame, headPermille: Int = 333, midPermille: Int = 667,
      vocabTopK: Option[Int] = None, langCol: String = "lang"): DataFrame = {
    require(0 < headPermille && headPermille <= midPermille && midPermille <= 1000,
      s"need 0 < head <= mid <= 1000 permille: $headPermille, $midPermille")
    val scored = unigramLm(docs, vocabTopK, carry = Seq(langCol)).persist()
    try {
      import org.apache.spark.sql.expressions.Window
      val hist = scored.groupBy(col(langCol), col("avg_neg_logprob"))
        .agg(count(lit(1)).as("c"))
      // both windows run over histogram rows (bounded), never corpus rows
      val cum = hist
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy(langCol).orderBy("avg_neg_logprob")))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(langCol)))
      def rank(permille: Int): Column =
        greatest(floor((col("n") * permille + 999) / 1000).cast("long"), lit(1L))
      val th = cum.groupBy(col(langCol)).agg(
        min(when(col("cum") >= rank(headPermille), col("avg_neg_logprob")))
          .as("t_head"),
        min(when(col("cum") >= rank(midPermille), col("avg_neg_logprob")))
          .as("t_mid"))
      scored.join(broadcast(th), langCol)
        .select(col("doc_id"), col(langCol), col("n_tokens"),
          col("avg_neg_logprob"),
          when(col("avg_neg_logprob") <= col("t_head"), "head")
            .when(col("avg_neg_logprob") <= col("t_mid"), "middle")
            .otherwise("tail").as("ppl_band"))
        .localCheckpoint()
    } finally scored.unpersist()
  }

  /** Corpus-bigram LM scoring — one order up from [[unigramLm]], one step
    * closer to the CCNet KenLM filter: each token is scored by its
    * add-one-smoothed conditional probability given the PREVIOUS token,
    * p(cur|prev) = (c(prev,cur) + 1) / (c(prev) + V); a document's first
    * token backs off to the smoothed unigram (c(w) + 1) / (T + V).
    * Repetitive/templated text scores near zero (its transitions dominate
    * the corpus LM); rare-transition text (shuffled tokens, mojibake,
    * code) scores high even when every individual token is common — the
    * signal unigram scoring cannot see.
    *
    * `minCount` is the standard LM pruning knob: bigram types with
    * c(prev,cur) < minCount are dropped from the model and their
    * occurrences take the smoothed unseen path (count 0) — with the
    * `pruned_ratio` column reporting how much of the doc fell through.
    * At scale the pruned table is what makes the model a broadcastable
    * artifact: zipfian transition counts concentrate mass in few types,
    * so a real-corpus cut at even minCount = 5 shrinks the table by
    * orders of magnitude while the smoothing keeps scores well-defined.
    *
    * Plan: one posexplode feeds the unigram aggregate, the bigram
    * aggregate and the scoring joins — token-key shuffles throughout
    * (AQE-skew-eligible), the (V, T) scalar rides as a 1-row broadcast,
    * and the per-doc aggregation partial-aggregates map-side. Per-token
    * log-probs round to 6 decimals and sum as DECIMAL(18,6) (the
    * unigramLm discipline), so doc scores are partition-order independent
    * and engine-replayable.
    */
  def bigramLm(docs: DataFrame, minCount: Long = 0): DataFrame = {
    val rows = docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"), posexplode(col("tk")).as(Seq("pos", "cur")))
      .select(col("doc_id"), col("pos"), col("cur"),
        when(col("pos") > 0, element_at(col("tk"), col("pos"))).as("prev"))
    val cw = rows.groupBy(col("cur").as("w")).agg(count(lit(1)).as("cw"))
    val vt = cw.agg(count(lit(1)).as("v"), sum(col("cw")).as("t"))
    val cb = {
      val all = rows.where(col("pos") > 0)
        .groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
      if (minCount > 0) all.where(col("cb") >= minCount) else all
    }
    val s0 = rows.where(col("pos") === 0)
      .join(cw, col("cur") === col("w"))
      .crossJoin(broadcast(vt))
      .select(col("doc_id"),
        round(log((col("cw") + 1).cast("double") / (col("t") + col("v"))), 6)
          .cast("decimal(18,6)").as("lp"),
        lit(0L).as("pruned"))
    val s1 = rows.where(col("pos") > 0)
      .join(cw.select(col("w"), col("cw").as("cprev")), col("prev") === col("w"))
      .join(cb, Seq("prev", "cur"), "left")
      .crossJoin(broadcast(vt))
      .select(col("doc_id"),
        round(log((coalesce(col("cb"), lit(0L)) + 1).cast("double")
          / (col("cprev") + col("v"))), 6)
          .cast("decimal(18,6)").as("lp"),
        when(col("cb").isNull, 1L).otherwise(0L).as("pruned"))
    s0.unionByName(s1)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(-sum(col("lp")).cast("double") / count(lit(1)), 4).as("avg_neg_logprob"),
        round(sum(col("pruned")).cast("double") / count(lit(1)), 4).as("pruned_ratio"))
  }

  /** PII patterns scrubbed by [[piiScrub]]: (name, regex, replacement).
    * The regexes stay inside the syntax common to Java regex (Spark) and
    * RE2 (DuckDB/production scanners) — no lookarounds, no backrefs — so
    * the same patterns run identically everywhere.
    */
  private val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "[PHONE]"))

  /** Per-document top-k TF-IDF terms — the classic keyword/topic signal a
    * curation pipeline uses for domain mixing and near-topic filtering.
    * tf is the in-doc term count, idf = ln(N / df) over the corpus, score
    * = tf · idf rounded to 4 (ties break on the term, so the top-k is
    * deterministic and engine-portable).
    *
    * Plan: one token explode → (doc, term) counts; df is a second
    * aggregation OVER THE (doc, term) FRAME (never re-reading the corpus);
    * N rides in as a 1-row broadcast. The top-k window partitions by
    * doc_id — per-doc partitions, so no task ever sorts more than one
    * document's vocabulary, at any corpus size.
    */
  def tfidfTopK(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** Vocabulary coverage curve — for each candidate vocabulary budget
    * `k`, the fraction of all corpus token OCCURRENCES covered by the k
    * most frequent types. The sizing question every tokenizer/vocab
    * decision starts from ("is 32k enough for this corpus, or does OOV
    * mass stay high until 100k?") and the first diagnostic for
    * `unigramLm(vocabTopK = …)`'s cap: coverage at k IS 1 − expected
    * oov_ratio at that cap.
    *
    * Plan: ONE corpus-volume shuffle — the token-frequency aggregation,
    * map-side combined so the exchange carries per-partition distinct
    * types, not occurrences. The ranking never sorts the full
    * vocabulary: `orderBy(…).limit(max k)` is TakeOrderedAndProject
    * (per-partition top-k, bounded merge), and the rank window that
    * follows runs over ≤ max(ks) surviving rows — bounded by the
    * PARAMETER, not the corpus, so its single partition is fine at any
    * scale. Totals ride as a 1-row broadcast. Ties at the budget
    * boundary break on (count desc, token asc) — deterministic and
    * engine-portable. `coverage` divides exact longs, rounded to 6.
    */
  def vocabCoverage(docs: DataFrame, ks: Seq[Int] = Seq(100, 1000, 10000)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be positive: $ks")
    import org.apache.spark.sql.expressions.Window
    val freqs = docs.select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = freqs.agg(sum(col("cnt")).as("total_tokens"),
      count(lit(1)).as("n_types"))
    val top = freqs.orderBy(col("cnt").desc, col("tok")).limit(ks.max)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("tok"))))
    top
      .crossJoin(broadcast(total))
      .select(explode(typedLit(ks.sorted)).as("k"), col("cnt"), col("rank"),
        col("total_tokens"), col("n_types"))
      .where(col("rank") <= col("k"))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("vocab_size"),
        sum(col("cnt")).as("covered_tokens"),
        first(col("total_tokens")).as("total_tokens"),
        first(col("n_types")).as("n_types"))
      .withColumn("k", col("k").cast("long"))
      .withColumn("coverage",
        round(col("covered_tokens").cast("double") / col("total_tokens"), 6))
  }

  /** Quality-filter ENSEMBLE — the DCLM/FineWeb practice of running
    * several independent batteries and gating on their agreement, as ONE
    * map-side pass: the cheap heuristic gate ([[passesQuality]]), the
    * Gopher battery, the C4 page rules and the FineWeb line-shape rules
    * each contribute a verdict column, plus `n_pass` and the composed
    * `passes_all` / `passes_majority` (≥ 3 of 4) gates. Every verdict is
    * the SAME expression its standalone operator emits (the shared
    * metric-struct discipline), so the ensemble can never drift from the
    * batteries it summarizes. Zero shuffle; at 100 TB this fuses into the
    * scan stage like each battery does alone — agreement costs nothing
    * beyond computing the members.
    */
  def qualityEnsemble(
      docs: DataFrame,
      pack: LangPack = LangPack.en,
      minWordsPerLine: Int = 5,
      minSentences: Int = 3): DataFrame = {
    val verdicts = Seq("passes_heuristic", "passes_gopher", "passes_c4",
      "passes_fineweb")
    docs
      .select(col("doc_id"),
        passesQuality(col("text"), pack).as("passes_heuristic"),
        bindOnce(gopherMetrics(col("text"), pack), m =>
          gopherVerdict(m, pack)).as("passes_gopher"),
        bindOnce(c4Metrics(col("text"), minWordsPerLine), m =>
          c4Verdict(m, minSentences)).as("passes_c4"),
        finewebMetrics(col("text")).getField("passes_fineweb")
          .as("passes_fineweb"))
      .withColumn("n_pass",
        verdicts.map(c => when(col(c), 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("passes_all", col("n_pass") === verdicts.size)
      .withColumn("passes_majority", col("n_pass") >= verdicts.size - 1)
  }

  /** The redaction expression on its own — text with every PII pattern
    * replaced by its typed placeholder. Shared by the batch [[piiScrub]]
    * report and the streaming ingest cleaner, so "scrubbed" means exactly
    * one thing everywhere (the passesQuality pattern).
    */
  def piiClean(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, re, repl)) =>
      regexp_replace(c, re, repl)
    }

  /** Per-category PII match counts on the given text column. */
  def piiCounts(text: Column): Seq[Column] =
    PiiPatterns.map { case (nm, re, _) =>
      size(regexp_extract_all(text, lit(re), lit(0))).cast("long").as(s"n_${nm}s")
    }

  /** PII redaction — the compliance pass every training corpus gets before
    * anything ships: emails, IPv4 addresses and phone-shaped numbers are
    * replaced by typed placeholders, with per-category match counts (on
    * the original text) as scrubbing telemetry. One map-side regex pass,
    * no shuffle; patterns apply email → ip → phone so a replacement never
    * fabricates a later pattern's match.
    */
  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select((col("doc_id") +: piiCounts(col(textCol)) :+
      piiClean(col(textCol)).as("clean_text")): _*)

  /** Rolling-hash document fingerprint: min / max / xor-fold over the
    * shingle hash set — an order-independent content signature (winnowing's
    * cheap cousin). Equal fingerprints ⇒ near-certain duplicate content;
    * computed map-side in one pass.
    */
  def docFingerprint(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        // r21: the whole reduction is ONE compiled pass
        // ([[graft.functions.FingerprintAgg]] over the codegen'd shingle
        // hashes) — the algebra walked the hash array four times, with the
        // xor fold an interpreted higher-order aggregate. Empty shingle
        // set → null struct, exactly the old when(size > 0, …) arm.
        graft.functions.FingerprintAgg(
          graft.functions.HexHash60All(
            shingles(tokens(col("text"))))).as("s"))
      .where(col("s").isNotNull)
      .select(col("doc_id"), col("s.fp_min"), col("s.fp_max"),
        col("s.fp_xor"), col("s.n_shingles"))

  /** WIMBD-style corpus n-gram census (Elazar et al. '23): the k most
    * frequent word n-grams with occurrence counts and document frequency —
    * the "what is IN my data" audit every corpus card runs.
    *
    * Scale shape: positional n-grams explode map-side (Σ tokens rows), the
    * census is ONE map-side-combined shuffle on the n-gram string, and the
    * top-k is `orderBy().limit(k)` = TakeOrderedAndProject (per-partition
    * top-k, k-row driver merge — no corpus sort). Ties at the boundary
    * break by the n-gram string, so the cut is deterministic in any engine
    * and partitioning.
    */
  def topNgrams(docs: DataFrame, n: Int = 3, k: Int = 100): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(k)

  /** Distribution drift between an accepted CORPUS and a new BATCH —
    * the Population Stability Index over the corpus's top-K vocabulary
    * (the monitoring gate a production ingest runs before accepting a
    * crawl: PSI ≳ 0.2 conventionally flags a shifted source). Per-term
    * rows carry both add-one-smoothed probabilities and the signed PSI
    * contribution (p−q)·ln(p/q); the caller sums `psi_contrib` for the
    * headline number and reads the top offenders for the diagnosis.
    *
    * Scale shape: two map-side-combined token shuffles (corpus + batch
    * counts), vocabulary cut = TakeOrderedAndProject bounded by the
    * PARAMETER with the deterministic (count desc, token) boundary,
    * batch counts join on the ≤ topK vocab (AQE broadcasts it), totals
    * ride as a 1-row broadcast. Counts are exact longs, so p/q/contrib
    * are bit-portable across engines and partitionings.
    */
  def corpusDrift(corpus: DataFrame, batch: DataFrame, topK: Int = 1000): DataFrame =
    driftAgainstVocab(vocabTopK(corpus, topK), batch)

  /** The accepted corpus's top-K vocabulary `(tok, c_cnt)` — the
    * PERSISTABLE half of [[corpusDrift]] (≤ topK rows; a production gate
    * writes it once per corpus epoch and replays it against every
    * incoming batch, including per-micro-batch in the streaming twin
    * `StreamingDrift`). TakeOrderedAndProject with the deterministic
    * (count desc, token) boundary, as before.
    */
  def vocabTopK(corpus: DataFrame, topK: Int = 1000): DataFrame = {
    require(topK >= 1, s"topK must be positive: $topK")
    corpus.select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_cnt"))
      .orderBy(col("c_cnt").desc, col("tok")).limit(topK)
  }

  /** PSI of a batch against an already-computed (usually loaded)
    * `vocab(tok, c_cnt)` — the per-ingest half of [[corpusDrift]]; one
    * token shuffle over the BATCH only, vocab broadcast by AQE.
    */
  def driftAgainstVocab(vocab: DataFrame, batch: DataFrame): DataFrame = {
    val joined = vocab
      .join(batch.select(explode(tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("b_cnt")),
        Seq("tok"), "left")
      .na.fill(0L, Seq("b_cnt"))
    val tot = joined.agg(
      sum(col("c_cnt")).as("ct"), sum(col("b_cnt")).as("bt"),
      count(lit(1)).as("n_terms"))
    joined.crossJoin(broadcast(tot))
      .withColumn("p", (col("c_cnt") + 1).cast("double") / (col("ct") + col("n_terms")))
      .withColumn("q", (col("b_cnt") + 1).cast("double") / (col("bt") + col("n_terms")))
      .withColumn("psi_contrib", round((col("p") - col("q")) * log(col("p") / col("q")), 6))
      .select(col("tok"), col("c_cnt"), col("b_cnt"),
        round(col("p"), 6).as("p"), round(col("q"), 6).as("q"), col("psi_contrib"))
  }

  /** Deterministic train/validation/test split: the salted id-hash lands
    * each row in a per-mille bucket; bucket < trainPermille → train, next
    * `valPermille` → val, remainder → test. Same engine-portable map-side
    * hash discipline as [[hashSample]] — reproducible across runs,
    * engines and partitionings, no RNG state, and independent of every
    * document attribute (so each split is an unbiased stratum of any
    * dimension). Rows carry `bucket_permille` for audit.
    */
  def corpusSplit(
      docs: DataFrame,
      trainPermille: Int = 900,
      valPermille: Int = 50,
      salt: String = "split",
      idCol: String = "doc_id"): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000,
      s"train+val permille must fit in [0, 1000]: $trainPermille + $valPermille")
    docs
      .withColumn("bucket_permille",
        hexHash(concat(lit(s"$salt|"), col(idCol).cast("string"))) % 1000)
      .withColumn("split",
        when(col("bucket_permille") < trainPermille, "train")
          .when(col("bucket_permille") < trainPermille + valPermille, "val")
          .otherwise("test"))
  }

  /** WITHIN-doc repeated-line removal: every non-blank line after its
    * first in-document occurrence is dropped in place (navigation chrome,
    * repeated headers/footers — the self-repetition [[repetitionScore]]
    * reports, acted on; the in-doc sibling of the CROSS-doc
    * [[graft.operators.Dedup.stripDupLines]]). Blank lines survive as
    * structure. Zero shuffle: the keep-filter is index algebra over the
    * line array (first occurrence ⇔ `array_position` equals own index),
    * one map-side pass, per-row cost bounded by a document's line count.
    */
  def stripRepeatedLines(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), bindOnce(split(col("text"), "\n"), ls =>
        bindOnce(transform(
            filter(sequence(lit(1), size(ls)), i =>
              trim(element_at(ls, i)) === "" ||
                array_position(ls, element_at(ls, i)) === i.cast("long")),
            i => element_at(ls, i)), kept =>
          struct(
            array_join(kept, "\n").as("clean_text"),
            size(ls).cast("long").as("n_lines"),
            (size(ls) - size(kept)).cast("long").as("n_removed")))).as("s"))
      .select(col("doc_id"), col("s.clean_text"), col("s.n_lines"),
        col("s.n_removed"))

  /** BM25 top-k lexical retrieval (Robertson & Zaragoza '09, the
    * Okapi/Lucene scoring function) — the keyword half of a RAG serving
    * stack beside the vector half ([[Similarity.chunkKnn]] /
    * [[graft.operators.VectorIndexStore]]): rank documents for a bounded
    * query-term set by Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf the Lucene `ln(1 + (N−df+0.5)/(df+0.5))` form (always positive).
    *
    * 100 TB plan shape: query terms are PLAN LITERALS, so per-doc term
    * frequencies are Q array-filter counts map-side over one tokenize —
    * no explode, no corpus-keyed shuffle anywhere. Corpus statistics
    * (N, Σdl, per-term df) reduce to ONE broadcast row (partials are a
    * row per partition); scoring is map-side against it; the global
    * top-k is TakeOrderedAndProject (no corpus sort, no window over
    * corpus volume). Two scan passes total (statistics + scoring), both
    * scan-bound — the [[unigramLm]] exact-form trade, with a 1-row
    * reduction instead of its vocabulary shuffle.
    *
    * Determinism/portability: per-term contributions sum in QUERY ORDER
    * inside one projection (a fixed expression chain, not a float
    * aggregate), every operation is written in the same order the DuckDB
    * oracle replays, and the score rounds to 4 decimals before the
    * (score desc, doc_id) rank — engine-portable under any partitioning.
    * Zero-scoring documents (no query term present) are dropped.
    */
  /** One term's BM25 contribution (Robertson–Zaragoza; Lucene idf form)
    * as the EXACT expression chain every BM25 surface shares —
    * [[bm25TopK]], [[bm25TopKBatch]] and
    * [[graft.operators.Bm25IndexStore.search]] build their scores from
    * this one function, so the three paths are IEEE-identical by
    * construction (the determinism contract: same ops, same order, then
    * one 4-decimal round before ranking).
    */
  private[operators] def bm25Contrib(
      tfD: Column, dfD: Column, dlD: Column, nD: Column, avgdl: Column,
      k1: Double, b: Double): Column = {
    val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    idf * (tfD * (lit(k1) + lit(1.0))) /
      (tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dlD / avgdl))
  }

  /** Collects and validates an external query batch `(query_id, terms)`
    * — the bounded driver-side fetch (the codebook discipline) shared by
    * [[bm25TopKBatch]] and [[graft.operators.Bm25IndexStore.search]]:
    * null ids/terms, duplicate ids, empty term lists and oversized
    * batches all fail loudly; terms lowercase per query, deduped.
    */
  private[operators] def collectQueryBatch(
      queries: DataFrame, maxQueries: Int): Seq[(Long, Seq[String])] = {
    val qrows = queries
      .select(col("query_id").cast("long"), col("terms").cast("array<string>"))
      .limit(maxQueries + 1).collect()
    require(qrows.nonEmpty, "the query batch needs at least one query")
    require(qrows.length <= maxQueries,
      s"query batch exceeds maxQueries=$maxQueries — split the batch " +
        "(each query's terms become plan literals; an unbounded batch " +
        "would grow the plan without bound)")
    val qs: Seq[(Long, Seq[String])] = qrows.toIndexedSeq.map { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1),
        "query batch rows must carry non-null query_id and terms")
      val ts = r.getSeq[String](1)
      require(ts.forall(_ != null),
        s"query ${r.getLong(0)} carries a null term — terms must be " +
          "non-null strings")
      (r.getLong(0), ts.map(_.toLowerCase).distinct)
    }
    require(qs.map(_._1).distinct.size == qs.size,
      "duplicate query_id in the batch")
    qs.foreach { case (qid, ts) =>
      require(ts.nonEmpty, s"query $qid has no terms") }
    qs
  }

  def bm25TopK(
      docs: DataFrame,
      queryTerms: Seq[String],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(k >= 1, s"k must be >= 1: $k")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val tf = docs.select(col("doc_id"), bindOnce(tokens(col("text")), tk =>
        struct((size(tk).cast("long").as("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            size(filter(tk, x => x === lit(t))).cast("long").as(s"tf$i")
          }): _*)).as("s"))
      .select((col("doc_id") +: col("s.dl").as("dl") +:
        terms.indices.map(i => col(s"s.tf$i").as(s"tf$i"))): _*)
    val stats = tf.agg(
      count(lit(1)).as("n"),
      (sum(col("dl")).as("sdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))): _*)
    val nD = col("n").cast("double")
    val avgdl = col("sdl").cast("double") / nD
    val contribs = terms.indices.map(i => bm25Contrib(
      col(s"tf$i").cast("double"), col(s"df$i").cast("double"),
      col("dl").cast("double"), nD, avgdl, k1, b))
    val topk = tf.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(contribs.reduce(_ + _), 4).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    // rank over the ≤ k survivors only — never a corpus-volume window
    topk.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long"))
      .select(col("doc_id"), col("rank"), col("score"))
  }

  /** BATCH-query [[bm25TopK]] — the serving contract the rest of the
    * store family honors ([[graft.operators.VectorIndexStore.search]]):
    * an EXTERNAL QUERY BATCH `(query_id, terms)` answered from ONE
    * corpus pass, per-query top-k out.
    *
    * 100 TB plan shape: the batch is a BOUNDED external artifact, so it
    * is fetched driver-side once (the codebook discipline, capped at
    * `maxQueries`) and its term UNION becomes plan literals — per-doc
    * term frequencies are |T| map-side array-filter counts over one
    * tokenize, exactly [[bm25TopK]]'s no-explode trick; corpus
    * statistics (N, Σdl, per-term df for all of T) reduce to ONE
    * broadcast row. Scoring then emits per-doc `(query_id, score)`
    * structs with zero-scoring pairs filtered INSIDE the array before
    * the explode, so exploded volume is matching pairs only — on a
    * selective query batch that is a tiny fraction of corpus × Q. The
    * per-query top-k is one window: Spark plants a
    * WindowGroupLimit(Partial) below the exchange, so each task ships
    * at most k rows per query and total shuffle volume is bounded by
    * partitions × Q × k — the corpus is never shuffled on its own key.
    *
    * Determinism: per-term contributions sum in the QUERY's term order
    * inside one projection and the score rounds to 4 decimals before
    * the (score desc, doc_id) rank — [[bm25TopK]]'s engine-portable
    * contract, per query.
    */
  def bm25TopKBatch(
      docs: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      maxQueries: Int = 1024,
      maxTerms: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    val qs = collectQueryBatch(queries, maxQueries)
    val terms = qs.flatMap(_._2).distinct.sorted
    // |T| bounds the stats row width and the per-doc counts array; unbounded
    // it would also grow the scoring projection without limit. Term
    // frequencies come from ONE TermFreqs pass (O(tokens) hash probes, one
    // constant-size plan node) instead of |T| interpreted array-filter
    // copies — at 300+ terms the filter family alone outgrew what Janino
    // accepts in a single method.
    require(terms.size <= maxTerms,
      s"query batch unions ${terms.size} distinct terms, over maxTerms=" +
        s"$maxTerms — split the batch (per-term df statistics widen the " +
        "broadcast stats row and the scoring projection with |T|)")
    val tIdx = terms.zipWithIndex.toMap
    val tf = docs.select(col("doc_id"), bindOnce(tokens(col("text")), tk =>
        struct(size(tk).cast("long").as("dl"),
          graft.functions.TermFreqs(tk, terms).as("tfs"))).as("s"))
      .select((col("doc_id") +: col("s.dl").as("dl") +:
        terms.indices.map(i => element_at(col("s.tfs"), i + 1).as(s"tf$i"))): _*)
    val stats = tf.agg(
      count(lit(1)).as("n"),
      (sum(col("dl")).as("sdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))): _*)
    val nD = col("n").cast("double")
    val avgdl = col("sdl").cast("double") / nD
    def contrib(i: Int): Column = bm25Contrib(
      col(s"tf$i").cast("double"), col(s"df$i").cast("double"),
      col("dl").cast("double"), nD, avgdl, k1, b)
    val scored = tf.crossJoin(broadcast(stats))
      .select(col("doc_id"),
        explode(filter(array(qs.map { case (qid, ts) =>
          struct(lit(qid).as("query_id"),
            round(ts.map(t => contrib(tIdx(t))).reduce(_ + _), 4).as("score"))
        }: _*), s => s.getField("score") > 0)).as("q"))
      .select(col("q.query_id"), col("doc_id"), col("q.score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }
}
