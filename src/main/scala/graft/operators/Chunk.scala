package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence preparation: document chunking and sequence packing —
  * the last mile of an LLM data pipeline, where a cleaned corpus becomes
  * fixed-size model inputs. Both operators are pure column algebra with
  * DuckDB-mirrorable semantics, and both are shaped for 100 TB:
  * chunking is a map-side explode (no shuffle at all), packing shuffles
  * once on a hash bucket whose count — not the corpus size — bounds every
  * window partition.
  */
object Chunk {

  /** Fixed-window character chunking with overlap: document `text` becomes
    * chunks of up to `window` chars starting every `window - overlap`
    * chars — the standard context-window / RAG-passage splitter. Chunk
    * starts are `1, 1+step, …` while `start ≤ max(len - overlap, 1)`, so
    * the final chunk always reaches the last character and no chunk is
    * wholly contained in its predecessor. Map-side only: one `sequence` +
    * `explode` per row, shuffle-free at any corpus size.
    */
  def docChunk(docs: DataFrame, window: Int = 200, overlap: Int = 40): DataFrame = {
    require(overlap >= 0 && window > overlap,
      s"need window > overlap >= 0, got window=$window overlap=$overlap")
    val step = window - overlap
    docs
      .select(col("doc_id"), col("text"),
        explode(sequence(
          lit(1), greatest(length(col("text")) - overlap, lit(1)), lit(step)))
          .as("chunk_start"))
      .select(
        col("doc_id"),
        ((col("chunk_start") - 1) / step).cast("long").as("chunk_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        col("text").substr(col("chunk_start"), lit(window)).as("chunk_text"))
      .withColumn("n_chars_chunk", length(col("chunk_text")).cast("long"))
  }

  /** Sequence packing, GPT-pretraining style: conceptually concatenate all
    * documents (within a pack stream) and cut every `budget` tokens; each
    * document lands in training sequences `[seq_first, seq_last]` at token
    * `seq_offset` of its first one. Documents hash into `buckets`
    * independent pack streams — the parallelism knob: each stream is one
    * running-sum window partition, so a 100 TB corpus packs with
    * `buckets` ≈ cores × executors while no single task ever sees more
    * than ~1/buckets of the rows. The cut points come from a cumulative
    * token count ordered by doc_id, so the layout is deterministic under
    * any partitioning. Zero-token documents are dropped — they occupy no
    * tokens and have no position in any sequence.
    *
    * By default tokens are whitespace-counted from `text`; `tokenCol`
    * names a precomputed per-doc count instead — the REAL budget unit
    * when a trained tokenizer exists (feed `bpeApply`'s `n_bpe_tokens`
    * so sequences cut at model tokens, not the whitespace proxy). With
    * `tokenCol` set, no `text` column is required at all.
    */
  def packSequences(
      docs: DataFrame, budget: Int = 256, buckets: Int = 8,
      tokenCol: Option[String] = None): DataFrame = {
    require(budget > 0 && buckets > 0,
      s"need budget > 0 and buckets > 0, got budget=$budget buckets=$buckets")
    val nTok = tokenCol.map(c => col(c).cast("long"))
      .getOrElse(size(TextAnalysis.tokens(col("text"))).cast("long"))
    val t = docs
      .select(col("doc_id"), nTok.as("n_tokens"),
        (TextAnalysis.hexHash(concat(lit("pack|"), col("doc_id").cast("string")))
          % buckets).cast("int").as("bucket"))
      .where(col("n_tokens") > 0)
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"), col("bucket"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budget).as("seq_first"),
        floor((col("cum") - 1) / budget).as("seq_last"),
        ((col("cum") - col("n_tokens")) % budget).as("seq_offset"))
  }

  /** Deterministic training-order shuffle: assigns every document a shard
    * and a position within it, reproducibly across engines, runs and
    * partitionings — the global-shuffle step between curation and
    * training, where examples must be decorrelated from their crawl/source
    * order but the epoch order must be replayable. Shard = salted 60-bit
    * id-hash mod `shards`; position = rank of that hash within the shard.
    * The plan is exactly what a 1000-executor shuffle should be: one
    * exchange on the shard key and one per-shard sort — each window
    * partition holds n/shards rows, so `shards` is the parallelism knob
    * and no global sort ever forms. Writers consume this as
    * `repartition(shards) + sortWithinPartitions(pos)` per shard file.
    */
  def trainShuffle(
      docs: DataFrame, shards: Int = 8, salt: String = "shuffle"): DataFrame =
    trainOrder(docs.select(col("doc_id")), shards, salt)
      .select(col("doc_id"), col("shard"), col("pos"))

  /** [[trainShuffle]] carrying EVERY input column — the frame a shard
    * writer consumes (payload + shard + pos). Same hash/rank semantics,
    * same single exchange; the payload rides the shard shuffle instead of
    * being re-joined afterward.
    */
  def trainOrder(
      docs: DataFrame, shards: Int = 8, salt: String = "shuffle"): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    // shard/pos are OUTPUT columns; carrying the whole payload means a
    // same-named input column would be silently clobbered — refuse loudly
    // instead. The hash scratch column gets an internal name no payload
    // plausibly uses (and is checked anyway).
    val taken = docs.columns.toSet
      .intersect(Set("shard", "pos", "__graft_order_h"))
    require(taken.isEmpty,
      s"trainOrder writes columns ${taken.mkString(", ")} which already " +
        "exist in the input — rename them before sharding")
    val h = TextAnalysis.hexHash(concat(lit(salt), col("doc_id").cast("string")))
    docs.withColumn("__graft_order_h", h)
      .withColumn("shard", pmod(col("__graft_order_h"), lit(shards)).cast("int"))
      .withColumn("pos",
        row_number().over(
          Window.partitionBy("shard").orderBy("__graft_order_h", "doc_id"))
          .cast("long"))
      .drop("__graft_order_h")
  }

  /** The training pipeline's deliverable: the shuffled corpus AS per-shard
    * files, each internally in epoch order. One `shard=N/` directory per
    * shard with exactly one data file, rows sorted by `pos` — the layout a
    * training loader streams sequentially while seeking nothing.
    *
    * Plan discipline: the rank window already clusters rows by shard, so
    * the write rides THAT exchange — `sortWithinPartitions(shard, pos)` is
    * a local (near-no-op: rows already arrive in hash order) sort and
    * `partitionBy("shard")` splits directories task-locally. One shuffle
    * total for assign + order + write, at any corpus size; `shards` is the
    * parallelism knob. Same salt ⇒ byte-identical shard files across runs
    * (the hash order is data-independent and the writer sees identical
    * row sequences), which is what makes a training epoch replayable from
    * the artifact alone.
    */
  def writeTrainShards(
      docs: DataFrame, outDir: String, shards: Int = 8, salt: String = "shuffle",
      format: String = "parquet"): Unit =
    trainOrder(docs, shards, salt)
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").format(format).save(outDir)
}
