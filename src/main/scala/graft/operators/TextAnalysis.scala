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

  /** Deterministic 60-bit hash of a string column: the first 15 hex digits
    * of md5 as a non-negative long. Shared hash primitive for fingerprints,
    * MinHash families and SimHash bits — chosen because both Spark
    * (`conv(substring(md5(x),1,15),16,10)`) and DuckDB
    * (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`) compute it exactly,
    * making results engine-portable and stable across partitionings.
    */
  def hexHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded hash family: h_i(x) = hexHash(i || '|' || x). */
  def seededHash(seed: Column, c: Column): Column =
    hexHash(concat(seed.cast("string"), lit("|"), c))

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Distinct word n-gram shingles ("a b c" strings). Docs with fewer than
    * `n` tokens yield an empty set (they cannot near-dup at this granularity).
    */
  def shingles(toks: Column, n: Int = 3): Column = array_distinct(
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>")))

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

  /** English stopwords used by quality scoring and language ID. */
  private val EnStop = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*))).cast("long")

  /** Heuristic document quality: length, token stats, punctuation density,
    * stopword ratio, uppercase ratio — the classic cheap filters a corpus
    * pipeline applies before anything expensive (cf. C4/Gopher rules).
    */
  def qualityScore(docs: DataFrame): DataFrame =
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
        round(countIn(col("toks"), EnStop).cast("double") / col("n_tok"), 4)
          .as("stopword_ratio"),
        (size(col("toks")) >= 5 && length(col("text")) >= 40 &&
          countIn(col("toks"), EnStop) > 0).as("passes_quality"))

  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> EnStop,
    "es" -> Seq("el", "los", "las", "y", "es", "que"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"),
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

  /** Rolling-hash document fingerprint: min / max / xor-fold over the
    * shingle hash set — an order-independent content signature (winnowing's
    * cheap cousin). Equal fingerprints ⇒ near-certain duplicate content;
    * computed map-side in one pass.
    */
  def docFingerprint(docs: DataFrame): DataFrame =
    docs
      .withColumn("sh", shingles(tokens(col("text"))))
      .where(size(col("sh")) > 0)
      .withColumn("hashes", transform(col("sh"), hexHash(_)))
      .select(
        col("doc_id"),
        array_min(col("hashes")).as("fp_min"),
        array_max(col("hashes")).as("fp_max"),
        aggregate(col("hashes"), lit(0L), (acc, h) => acc.bitwiseXOR(h)).as("fp_xor"),
        size(col("sh")).cast("long").as("n_shingles"))
}
