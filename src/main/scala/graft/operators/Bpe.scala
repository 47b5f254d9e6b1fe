package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application inside the
  * engine (Sennrich et al. '16, "Neural Machine Translation of Rare
  * Words with Subword Units") — the step a training-data pipeline runs
  * between curation and sharding: learn the merge table from the corpus
  * the model will actually see, then tokenize with it.
  *
  * 100 TB design: the corpus is touched ONCE — the word-count
  * aggregation (map-side combined, so the exchange carries per-partition
  * DISTINCT words). Every merge iteration after that operates on the
  * WORD-VOCABULARY frame (distinct words × their counts), which is
  * corpus-statistics-sized, not corpus-sized — the classic BPE-training
  * factorization: pair statistics over the vocab weighted by word
  * frequency equal pair statistics over the raw corpus (`maxVocab`
  * additionally bounds the frame by the PARAMETER). Per iteration: one
  * vocab-volume pair explode + groupBy, one TakeOrderedAndProject argmax
  * whose single winning row is fetched to the driver (the
  * codebook-training discipline — a bounded plan-time fetch, one row per
  * merge), and one map-side merge of the vocab. Lineage is cut with
  * localCheckpoint every few iterations so plan depth stays bounded in
  * the merge count.
  *
  * Symbol sequences are carried as PADDED STRINGS — every symbol owns a
  * leading and trailing space (`" l  o  w</w> "`), and a merge is ONE
  * codegen'd `replace(repr, " l  r ", " lr ")`: because each symbol owns
  * its own padding, the left-to-right non-overlapping scan of standard
  * string replace is EXACTLY BPE's greedy merge — a consumed middle
  * symbol cannot re-match (`[a,a,a]` under (a,a) → `[aa,a]`), while
  * back-to-back disjoint pairs all match (`[a,b,a,b]` under (a,b) →
  * `[ab,ab]`). The same replace semantics hold in DuckDB, so the oracle
  * replays tokenization verbatim. No higher-order folds in the hot path,
  * no UDFs, no floats; counts are exact longs.
  *
  * Determinism: the argmax tie-breaks on (count desc, left asc, right
  * asc) — byte-order string comparison in both engines — so the learned
  * merge table is a pure function of the corpus, independent of
  * partitioning.
  */
object Bpe {

  /** End-of-word marker carried by each word's final symbol, so merges
    * never cross word boundaries and word-final units stay distinct from
    * word-internal ones (Sennrich §3.2's `</w>`). A marker-carrying
    * symbol can only ever be a merge's RIGHT side (it has no in-word
    * right neighbor), which is what makes streaming a whole document as
    * one padded sequence safe in [[bpeApply]].
    */
  val Eow = "</w>"

  /** A word as its padded initial-symbol string: one single-character
    * symbol per char, each padded `" c "`, the last carrying the marker —
    * "low" → `" l  o  w</w> "`.
    */
  private def wordRepr(w: Column): Column =
    concat(
      regexp_replace(substring(w, lit(1), length(w) - 1), "(.)", " $1 "),
      lit(" "), substring(w, -1, 1), lit(Eow), lit(" "))

  /** One merge step on a padded representation: the single codegen'd
    * string replace described in the object doc.
    */
  private def mergeRepr(repr: Column, l: String, r: String): Column =
    replace(repr, lit(s" $l  $r "), lit(s" ${l + r} "))

  /** Padded representation back to the symbol array (symbols never
    * contain spaces — they come from whitespace tokens).
    */
  private def reprSymbols(repr: Column): Column =
    when(length(trim(repr)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(repr), "  +"))

  /** The word-frequency vocabulary frame: (word, n) over lowercased
    * whitespace tokens — the ONE corpus-volume pass of BPE training.
    */
  private def wordVocab(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Train `numMerges` BPE merges over the corpus. Returns the merge
    * table: (merge_rank, left, right, merged, pair_count) in learning
    * order — the tokenizer artifact ([[bpeApply]] consumes it; persist it
    * like a codebook). Training may stop early (fewer rows than
    * `numMerges`) when no adjacent pair occurs twice — the vocabulary is
    * fully merged.
    *
    * `maxVocab` caps the WORD vocabulary the iterations run over to the
    * most frequent types (count desc, word asc — deterministic): the
    * standard practical cap, since pair statistics are dominated by
    * frequent words and the tail contributes O(1) counts each. With the
    * cap the per-iteration frames are bounded by the PARAMETER at any
    * corpus size; `maxVocab = 0` disables it (exact Sennrich).
    */
  def bpeTrain(
      docs: DataFrame,
      numMerges: Int = 30,
      maxVocab: Int = 50000): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = {
      val wv = wordVocab(docs)
      val capped =
        if (maxVocab > 0) wv.orderBy(col("n").desc, col("word")).limit(maxVocab)
        else wv
      capped.select(col("n"), wordRepr(col("word")).as("repr"))
        .localCheckpoint()
    }
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // adjacent pair counts weighted by word frequency; argmax via
      // TakeOrderedAndProject, ONE row fetched
      val best = vocab
        .select(col("n"), reprSymbols(col("repr")).as("syms"))
        .select(col("n"), col("syms"),
          posexplode(slice(col("syms"), lit(1), size(col("syms")) - 1))
            .as(Seq("i", "l")))
        .withColumn("r", element_at(col("syms"), col("i") + 2))
        .groupBy(col("l"), col("r")).agg(sum(col("n")).as("pn"))
        .where(col("pn") >= 2)
        .orderBy(col("pn").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      best.headOption match {
        case None => done = true
        case Some(row) =>
          val (l, r, pn) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += ((rank, l, r, l + r, pn))
          vocab = vocab.select(col("n"), mergeRepr(col("repr"), l, r).as("repr"))
          // cut lineage so plan depth stays bounded in the merge count
          if (rank % 5 == 4) vocab = vocab.localCheckpoint()
          rank += 1
      }
    }
    merges.result()
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
      .select(col("merge_rank").cast("long"), col("left"), col("right"),
        col("merged"), col("pair_count"))
  }

  /** [[bpeTrain]] with the merge loop moved DRIVER-SIDE — the production
    * trainer. [[bpeTrain]] runs one Spark job per merge (argmax +
    * vocab-map round trip): exact at any vocabulary, but a 30k-merge
    * production run is 30k driver round-trips — hours of scheduling for
    * seconds of work. This variant pays ONE distributed corpus pass (the
    * same capped word-frequency aggregation) and then runs the classic
    * incremental BPE trainer over the collected vocabulary in memory:
    * per-pair counts and a pair→words occurrence index updated only for
    * the words a merge touches, so 30k merges cost seconds. The
    * factorization is unchanged — pair statistics over (word, freq) ARE
    * the corpus statistics — and the cap bounds driver memory by the
    * PARAMETER (`maxVocab` rows of short strings), which is why
    * `maxVocab > 0` is required here: the uncapped exact form stays with
    * [[bpeTrain]].
    *
    * Bit-parity with [[bpeTrain]] (spec-asserted, counts included): the
    * same (count desc, left asc, right asc) argmax with string order
    * compared as UNSIGNED UTF-8 BYTES (Spark's binary string ordering,
    * not Java's UTF-16 compareTo — they differ above the BMP), the same
    * per-word left-to-right non-overlapping merge the padded-string
    * replace performs, the same pairs-counted-per-position semantics
    * (overlapping occurrences of a doubled symbol all count), the same
    * no-pair-recurs early stop.
    */
  def bpeTrainFast(
      docs: DataFrame,
      numMerges: Int = 30,
      maxVocab: Int = 50000): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    require(maxVocab > 0,
      "bpeTrainFast needs the vocabulary cap (maxVocab > 0) — the driver " +
        "loop is bounded by it; use bpeTrain for the uncapped exact form")
    val spark = docs.sparkSession
    import spark.implicits._
    // the ONE corpus-volume pass: capped word-frequency vocabulary,
    // the same deterministic (n desc, word asc) cut bpeTrain takes
    val vocab = wordVocab(docs)
      .orderBy(col("n").desc, col("word")).limit(maxVocab)
      .collect().map(r => (r.getAs[String]("word"), r.getAs[Long]("n")))

    // word → mutable symbol buffer (marked code points, the wordRepr
    // segmentation); pair counts weighted by word frequency, positions
    // counted like the posexplode (overlaps included)
    def segment(w: String): scala.collection.mutable.ArrayBuffer[String] = {
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      if (w.isEmpty) syms += Eow
      else {
        var ci = 0
        while (ci < w.length) {
          val next = ci + Character.charCount(w.codePointAt(ci))
          val s = w.substring(ci, next)
          syms += (if (next >= w.length) s + Eow else s)
          ci = next
        }
      }
      syms
    }
    val words = vocab.map { case (w, n) => (segment(w), n) }
    // Spark's string ordering = unsigned UTF-8 byte order
    val byteOrd: Ordering[String] = (a: String, b: String) => {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      var d = 0
      val m = math.min(x.length, y.length)
      while (d == 0 && i < m) {
        d = (x(i) & 0xff) - (y(i) & 0xff)
        i += 1
      }
      if (d != 0) d else x.length - y.length
    }
    val pairOrd = Ordering.Tuple2(byteOrd, byteOrd)
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    // the argmax structure: (count desc, pair asc-by-bytes), kept in sync
    // incrementally so each merge's best is O(log pairs), not a rescan
    val ranked = scala.collection.mutable.TreeSet.empty[(Long, (String, String))](
      Ordering.Tuple2(Ordering.Long.reverse, pairOrd))
    val occurs = scala.collection.mutable
      .HashMap.empty[(String, String), scala.collection.mutable.HashSet[Int]]
    def bump(p: (String, String), delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) ranked.remove((old, p))
      val nw = old + delta
      if (nw == 0L) counts.remove(p)
      else {
        counts.update(p, nw)
        ranked.add((nw, p))
      }
    }
    def addWord(wi: Int, sign: Long): Unit = {
      val (syms, n) = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        bump(p, sign * n)
        if (sign > 0)
          occurs.getOrElseUpdate(p, scala.collection.mutable.HashSet.empty) += wi
        // a negative pass leaves stale occurrence entries behind — they
        // are filtered at use (the re-check on merge is authoritative)
        i += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))

    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val head = ranked.headOption
      if (head.isEmpty || head.get._1 < 2L) done = true
      else {
        val (bestN, bestPair) = head.get
        val (l, r) = bestPair
        val lr = l + r
        merges += ((rank, l, r, lr, bestN))
        // merge in every word that may carry the pair: subtract the
        // word's pair positions, apply the left-to-right non-overlapping
        // replace, re-add
        val affected = occurs.getOrElse(bestPair, scala.collection.mutable.HashSet.empty)
          .toArray
        occurs.remove(bestPair)
        affected.foreach { wi =>
          val (syms, _) = words(wi)
          var has = false
          var i = 0
          while (!has && i < syms.length - 1) {
            has = syms(i) == l && syms(i + 1) == r
            i += 1
          }
          if (has) {
            addWord(wi, -1L)
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                out += lr
                j += 2
              } else {
                out += syms(j)
                j += 1
              }
            }
            syms.clear()
            syms ++= out
            addWord(wi, 1L)
          }
        }
        rank += 1
      }
    }
    merges.result()
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
      .select(col("merge_rank").cast("long"), col("left"), col("right"),
        col("merged"), col("pair_count"))
  }

  /** Tokenize with a trained merge table — the exact encoder of the
    * trained tokenizer. The merge table arrives as a driver-side list (a
    * bounded artifact, like a codebook — fetch it once via `.collect()`
    * from [[bpeTrain]]'s frame); application is one map-side pass, zero
    * shuffle, through the codegen'd single-pass greedy encoder
    * [[graft.functions.BpeEncode]]: per word, the lowest-rank adjacent
    * pair merges first (leftmost on ties) against a plan-literal rank
    * map, so per-word cost and generated-code size are CONSTANT in the
    * merge count — a 30k-merge production vocabulary runs the same plan
    * as the 8-merge demo table. For any table [[bpeTrain]] can emit this
    * is bit-identical to replaying the merges in rank order
    * ([[bpeApplyFold]]; equivalence contract and proof sketch on
    * [[graft.functions.BpeEncoder]], parity spec-asserted at 100+
    * trained merges).
    *
    * Emits per-doc `bpe_tokens` (subword units in order) and
    * `n_bpe_tokens` — the REAL token count a sequence-packing budget
    * should use in place of the whitespace proxy.
    */
  def bpeApply(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val toks = graft.functions.BpeEncode(TextAnalysis.tokens(col("text")), merges)
    docs.select(col("doc_id"),
      TextAnalysis.bindOnce(toks, t =>
        struct(t.as("bpe_tokens"),
          size(t).cast("long").as("n_bpe_tokens"))).as("s"))
      .select(col("doc_id"), col("s.bpe_tokens"), col("s.n_bpe_tokens"))
  }

  /** The replaced rank-order-replay encoder, retained as [[bpeApply]]'s
    * parity witness: the whole document becomes one padded symbol stream
    * (safe — see [[Eow]]) and each merge is one codegen'd string replace,
    * the fold unrolled into the plan — O(merges × doc-length) per row
    * with plan size linear in the merge count, which is why it is NOT
    * the production encoder. Kept because its semantics are replayable
    * verbatim as nested `replace()` calls in DuckDB (the bpe_tokenize
    * oracle) and because the greedy-equals-rank-order equivalence spec
    * needs both forms.
    */
  def bpeApplyFold(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val repr0 = array_join(transform(TextAnalysis.tokens(col("text")),
      w => wordRepr(w)), "")
    val merged = merges.foldLeft(repr0: Column) {
      case (repr, (l, r)) => mergeRepr(repr, l, r)
    }
    docs.select(col("doc_id"),
      TextAnalysis.bindOnce(reprSymbols(merged), toks =>
        struct(toks.as("bpe_tokens"),
          size(toks).cast("long").as("n_bpe_tokens"))).as("s"))
      .select(col("doc_id"), col("s.bpe_tokens"), col("s.n_bpe_tokens"))
  }

  /** Persist a trained merge table as a parquet artifact (the
    * CodebookStore discipline — train once, tokenize for months): the
    * frame [[bpeTrain]] returns, written as one file. Load with
    * [[loadMerges]] and feed [[bpeApply]]; the replayed tokenization is
    * identical to the training session's (spec-asserted).
    */
  def saveMerges(merges: DataFrame, path: String): Unit =
    merges.repartition(1).write.mode("overwrite").parquet(path)

  /** Load a merge-table artifact back to the (left, right) list in rank
    * order — the form [[bpeApply]] consumes. Fails loudly on an empty or
    * gap-ranked artifact rather than silently tokenizing with a
    * mis-ordered table.
    */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String): Seq[(String, String)] = {
    val rows = spark.read.parquet(path)
      .select(col("merge_rank"), col("left"), col("right"))
      .orderBy("merge_rank")
      .collect()
    require(rows.nonEmpty, s"empty BPE merge artifact at $path")
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getLong(0) == i.toLong,
        s"gap-ranked BPE merge artifact at $path: rank ${r.getLong(0)} at position $i")
    }
    rows.map(r => (r.getString(1), r.getString(2))).toSeq
  }
}
