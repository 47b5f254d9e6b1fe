package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.StreamingServe

class StreamingServeSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("streamed query batches answer identically to the batch operator; empty triggers answer nothing") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = docs.select("doc_id", "text").cache()
    val batch1 = Seq((1L, Seq("dup", "row")), (2L, Seq("vector", "table")))
    val batch2 = Seq((3L, Seq("dup", "vector", "row")), (4L, Seq("zzznope")))

    val seen = scala.collection.mutable.Map.empty[Long, Seq[Row]]
    val stream = MemoryStream[(Long, Seq[String])]
    val q = StreamingServe.serve(
        stream.toDF().toDF("query_id", "terms"), corpus, k = 5,
        onBatch = (answers, id) => seen.synchronized {
          seen(id) = answers.orderBy("query_id", "rank").collect().toSeq
        })
      .start()
    try {
      stream.addData(batch1)
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    assert(seen.keySet === Set(0L, 1L))
    val batches = Seq(batch1, batch2)
    for ((id, got) <- seen) {
      val want = TextAnalysis.bm25TopKBatch(
          corpus, batches(id.toInt).toDF("query_id", "terms"), k = 5)
        .orderBy("query_id", "rank").collect().toSeq
      assert(got === want, s"micro-batch $id diverged from the batch operator")
      assert(got.nonEmpty)
    }
    // the corpus-missing query answered nothing, per the batch contract
    assert(!seen(1L).map(_.getLong(0)).contains(4L))

    // an empty trigger never reaches the operator (which rightly refuses
    // empty batches) — drive one through a fresh stream and assert no call
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val empty = MemoryStream[(Long, Seq[String])]
    val q2 = StreamingServe.serve(
        empty.toDF().toDF("query_id", "terms"), corpus, k = 5,
        onBatch = (_, _) => calls.incrementAndGet())
      .start()
    try {
      q2.processAllAvailable() // trigger with zero requests
      empty.addData(Seq((9L, Seq("dup"))))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(calls.get() === 1, "empty trigger must answer nothing; real one must answer")
    corpus.unpersist()
  }

  test("index-served stream answers bit-match the corpus-pass stream") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = docs.select("doc_id", "text")
    val store = java.nio.file.Files.createTempDirectory("graft_ssix").toString
    graft.operators.Bm25IndexStore.save(corpus, store)
    val batches = Seq(
      Seq((1L, Seq("dup", "row")), (2L, Seq("vector", "table"))),
      Seq((3L, Seq("dup", "vector", "row")), (4L, Seq("zzznope"))))

    def drive(
        mk: (org.apache.spark.sql.DataFrame, (org.apache.spark.sql.DataFrame, Long) => Unit) =>
          org.apache.spark.sql.streaming.DataStreamWriter[Row])
        : Map[Long, Seq[Row]] = {
      val seen = scala.collection.mutable.Map.empty[Long, Seq[Row]]
      val onB: (org.apache.spark.sql.DataFrame, Long) => Unit =
        (a, id) => seen.synchronized {
          seen(id) = a.orderBy("query_id", "rank").collect().toSeq
        }
      val stream = MemoryStream[(Long, Seq[String])]
      val q = mk(stream.toDF().toDF("query_id", "terms"), onB).start()
      try batches.foreach { b =>
        stream.addData(b); q.processAllAvailable()
      } finally q.stop()
      seen.toMap
    }
    // the two serve bodies run the one shared bm25Contrib chain over the
    // same statistics (derived vs persisted-additive), so a live stream
    // answered from postings must be ROW-IDENTICAL to one answered by
    // the corpus pass — the serving-tier claim, end to end on a stream
    val fromCorpus = drive((qs, onB) =>
      StreamingServe.serve(qs, corpus, k = 5, onBatch = onB))
    val fromIndex = drive((qs, onB) =>
      StreamingServe.serveFromIndex(qs, store, k = 5, onBatch = onB))
    assert(fromCorpus.keySet === Set(0L, 1L))
    assert(fromIndex.keySet === Set(0L, 1L))
    for (id <- fromCorpus.keys) {
      assert(fromIndex(id) === fromCorpus(id),
        s"micro-batch $id: index-served answers diverged from the corpus pass")
      assert(fromIndex(id).nonEmpty)
    }
  }
}
