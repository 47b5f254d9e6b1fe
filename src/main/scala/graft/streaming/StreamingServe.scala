package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.TextAnalysis

/** Streaming BM25 batch serving — the query-side twin of the ingest
  * streams: production retrieval receives QUERIES as a stream (a request
  * log, a reranker queue) while the corpus is the static artifact, the
  * inverse of every ingest twin's shape (static store, streaming docs).
  *
  * Per-query-batch scoring is an aggregation whose plan depends on the
  * batch's term union (terms become plan literals, df statistics are
  * per-term), so the stream side cannot be a stateless row map — the
  * deployment form is `foreachBatch`: each micro-batch of
  * `(query_id, terms)` rows is exactly the "query batch" of
  * [[TextAnalysis.bm25TopKBatch]], and the serve body calls that SAME
  * operator (spec-asserted equal on MemoryStream), so a query answers
  * identically live and in replay. No streaming state store, no
  * watermark: each batch is answered independently, which is serving's
  * semantics.
  *
  * 100 TB shape: the per-batch cost is bm25TopKBatch's measured
  * scan-bound corpus pass (SCALECHECK_r18: 2.5 s at 100× = 500 k docs,
  * sub-linear — one broadcast stats row, map-side scoring, a
  * WindowGroupLimit-capped top-k) — so CACHE/PERSIST `docs` before
  * starting the stream: the scan then amortizes to memory reads across
  * batches. The batch bounds (`maxQueries`, `maxTerms`) apply per
  * micro-batch; size the trigger so request bursts stay inside them.
  * Past the decade where even a cached corpus pass per trigger is too
  * much, serve from the persisted postings instead —
  * [[graft.operators.Bm25IndexStore.search]] answers the identical
  * batch contract bit-identically from Σ df posting rows.
  */
object StreamingServe {

  /** One micro-batch's answers — [[TextAnalysis.bm25TopKBatch]]
    * verbatim; exposed so callers and the spec name the shared operator.
    */
  def answersPerBatch(queries: DataFrame, docs: DataFrame, k: Int = 10): DataFrame =
    TextAnalysis.bm25TopKBatch(docs, queries, k = k)

  /** The serving loop as a ready-to-`start()` writer: `queries` is a
    * STREAMING frame with `(query_id, terms)` columns; `onBatch`
    * receives each micro-batch's `(query_id, doc_id, rank, score)`
    * answers and the batch id (sink them, respond to callers). An empty
    * micro-batch (trigger fired with no requests) produces no call —
    * there is nothing to answer, and the batch operator rightly refuses
    * an empty query batch.
    */
  def serve(
      queries: DataFrame,
      docs: DataFrame,
      k: Int = 10,
      onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) onBatch(answersPerBatch(b, docs, k), id)
      }

  /** The INDEX-SERVED form of [[serve]] — identical stream contract,
    * each micro-batch answered by
    * [[graft.operators.Bm25IndexStore.search]]: Σ df posting rows plus
    * per-segment stats instead of a corpus pass, bit-identical answers
    * (the store's spec'd contract; StreamingServeSpec asserts the two
    * serve bodies agree on a live stream). This is the past-the-decade
    * shape the corpus form's doc points at, as an actual entry point.
    * The store is loaded at its CURRENT epoch per batch, so an ingest
    * loop appending postings mid-stream is picked up at the next
    * trigger — each batch's reads are epoch-pinned (never torn).
    */
  def serveFromIndex(
      queries: DataFrame,
      path: String,
      k: Int = 10,
      onBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    // Postings-frame reuse across triggers (r22; the r20 verdict's open
    // serving item): a full store re-resolve per batch pays manifest
    // reads + parquet file listings of driver metadata I/O per trigger.
    // Now each trigger reads the manifest ONCE (one tiny file — how an
    // epoch-pinned read must begin anyway) and reuses the loaded family
    // frames while the epoch is unchanged; an ingest loop appending
    // mid-stream moves the manifest and the next trigger reloads — the
    // per-batch epoch-pinning semantics are exactly as before.
    var cached: Option[graft.operators.Bm25IndexStore.Loaded] = None
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (!b.isEmpty) {
          val spark = b.sparkSession
          val cur = graft.core.EpochStore.currentEpoch(spark, path)
          val ix = cached match {
            case Some(x) if x.epoch == cur => x
            case _ =>
              val x = graft.operators.Bm25IndexStore.load(spark, path)
              cached = Some(x)
              x
          }
          onBatch(graft.operators.Bm25IndexStore.search(
            spark, ix, b, k, 1.2, 0.75, 1024, 1024), id)
        }
      }
  }
}
