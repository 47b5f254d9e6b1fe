package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bm25IndexStore, TextAnalysis}

class Bm25IndexStoreSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text")

  test("index-served answers bit-match the corpus-pass batch operator") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_bm25ix").toString
    Bm25IndexStore.save(docs, store)
    val batch = Seq(
      (7L, Seq("dup", "row")),
      (8L, Seq("vector", "table", "dup")),
      (9L, Seq("zzznope"))).toDF("query_id", "terms")
    val served = Bm25IndexStore.search(spark, store, batch, k = 7)
      .orderBy("query_id", "rank").collect().toSeq
    val direct = TextAnalysis.bm25TopKBatch(docs, batch, k = 7)
      .orderBy("query_id", "rank").collect().toSeq
    // bit-identical, not approximately equal: both score through the one
    // shared bm25Contrib chain with identical statistics
    assert(served === direct)
    assert(served.nonEmpty)
    // the corpus-missing query vanished from both
    assert(!served.map(_.getLong(0)).contains(9L))
  }

  test("append folds a new batch in; served answers equal a re-scored union corpus") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft_bm25ap").toString
    val old = docs.where(col("doc_id") % 2 === 0)
    val fresh = docs.where(col("doc_id") % 2 === 1)
    Bm25IndexStore.save(old, store)
    Bm25IndexStore.append(fresh, store)
    val batch = Seq((1L, Seq("dup", "row", "vector"))).toDF("query_id", "terms")
    val served = Bm25IndexStore.search(spark, store, batch, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    // statistics (N, Σdl, df) are derived, never stored counters — the
    // appended store must answer exactly like an index of the union
    val direct = TextAnalysis.bm25TopKBatch(old.unionByName(fresh), batch, k = 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served === direct)
    assert(served.nonEmpty)
  }

  test("search on an unfounded store and invalid batches fail loudly") {
    import spark.implicits._
    val empty = java.nio.file.Files.createTempDirectory("graft_bm25no").toString
    intercept[IllegalArgumentException] {
      Bm25IndexStore.search(spark, empty,
        Seq((1L, Seq("a"))).toDF("query_id", "terms"))
    }
    val store = java.nio.file.Files.createTempDirectory("graft_bm25v").toString
    Bm25IndexStore.save(docs.limit(50), store)
    intercept[IllegalArgumentException] {
      Bm25IndexStore.search(spark, store,
        Seq((1L, Seq.empty[String])).toDF("query_id", "terms"))
    }
    intercept[IllegalArgumentException] {
      Bm25IndexStore.search(spark, store,
        Seq((1L, Seq("a")), (1L, Seq("b"))).toDF("query_id", "terms"))
    }
  }
}
