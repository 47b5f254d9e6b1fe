package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.StreamingDrift

/** The streaming PSI gate must score a micro-batch EXACTLY as the batch
  * `corpus_drift` expression scores the same rows against the same
  * persisted vocabulary.
  */
class StreamingDriftSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("streamed per-batch PSI equals the batch expression on the same rows") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = docs.where(col("doc_id") % 2 === 0)
    val vocab = TextAnalysis.vocabTopK(corpus, topK = 200).cache()

    val chunk1 = docs.where(col("doc_id") % 4 === 1).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val chunk2 = docs.where(col("doc_id") % 4 === 3).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(chunk1.nonEmpty && chunk2.nonEmpty)

    val seen = scala.collection.mutable.Map.empty[Long, Seq[Row]]
    val stream = MemoryStream[(Long, String)]
    val q = StreamingDrift.gate(
        stream.toDF().toDF("doc_id", "text"), vocab,
        (drift, id) => seen.synchronized {
          seen(id) = drift.orderBy("tok").collect().toSeq
        })
      .start()
    try {
      stream.addData(chunk1)
      q.processAllAvailable()
      stream.addData(chunk2)
      q.processAllAvailable()
    } finally q.stop()

    // two micro-batches, each bit-identical to the batch expression run
    // on that chunk alone — and corpusDrift (vocab recomputed from the
    // corpus) agrees with the loaded-vocab path on the first chunk
    assert(seen.keySet === Set(0L, 1L))
    val chunks = Seq(chunk1, chunk2)
    for ((id, got) <- seen) {
      val want = TextAnalysis.driftAgainstVocab(
          vocab, chunks(id.toInt).toDF("doc_id", "text"))
        .orderBy("tok").collect().toSeq
      assert(got === want, s"micro-batch $id diverged from batch PSI")
      assert(got.nonEmpty)
    }
    val viaCorpus = TextAnalysis.corpusDrift(
        corpus, chunk1.toDF("doc_id", "text"), topK = 200)
      .orderBy("tok").collect().toSeq
    assert(seen(0L) === viaCorpus)

    // a drifted batch (tokens outside the vocab) scores strictly higher
    val drifted = chunk1.map { case (id, _) =>
      (id, "zzqx wvvk qjjy pflm xdrt") }
    val psiSame = StreamingDrift.psiOf(
      TextAnalysis.driftAgainstVocab(vocab, chunk1.toDF("doc_id", "text")))
    val psiDrift = StreamingDrift.psiOf(
      TextAnalysis.driftAgainstVocab(vocab, drifted.toDF("doc_id", "text")))
    assert(psiDrift > psiSame)
  }
}
