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

  test("search is postings-bounded: the plan scans only bmpost + bmstats, never bmdocs or corpus") {
    import spark.implicits._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val store = java.nio.file.Files.createTempDirectory("graft_bm25pb").toString
    Bm25IndexStore.save(docs.where(col("doc_id") % 2 === 0), store)
    Bm25IndexStore.append(docs.where(col("doc_id") % 2 === 1), store)
    val batch = Seq((1L, Seq("dup", "row"))).toDF("query_id", "terms")
    val served = Bm25IndexStore.search(spark, store, batch, k = 5)
    // the r18 scale finding: corpusStats + the dl join each streamed the
    // full O(N-docs) bmdocs family per query batch. Now dl rides
    // denormalized on postings and N/Σdl are per-segment write-time
    // aggregates, so the ONLY file sources in a search plan are the
    // term-pruned postings and the #segments single-row stats files.
    val scanned = served.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten
    assert(scanned.nonEmpty, "no file scans found — plan shape changed")
    assert(scanned.forall(p => p.contains("bmpost_s") || p.contains("bmstats_s")),
      s"search scans a non-postings source (bmdocs or corpus): $scanned")
    assert(scanned.exists(_.contains("bmpost_s")) &&
      scanned.exists(_.contains("bmstats_s")), s"missing a family: $scanned")
    // and the term filter still reaches the postings scan
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"term IN filter not pushed to the postings scan:\n${plan.take(2000)}")
    assert(served.count() > 0)
  }

  test("persisted per-segment stats equal the bmdocs recompute (drift guard)") {
    import graft.core.EpochStore
    val store = java.nio.file.Files.createTempDirectory("graft_bm25dg").toString
    Bm25IndexStore.save(docs.where(col("doc_id") % 3 === 0), store)
    Bm25IndexStore.append(docs.where(col("doc_id") % 3 === 1), store)
    Bm25IndexStore.append(docs.where(col("doc_id") % 3 === 2), store)
    val e = EpochStore.currentEpoch(spark, store)
    def famTotal(name: String, f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Row) =
      f(spark.read.parquet(
        EpochStore.artifactPaths(spark, store, name, e): _*))
    // the audit surface earning its keep: bmstats is DERIVED at write
    // from the same tokenize that wrote bmdocs, so their totals must
    // agree exactly — a drifting stored counter cannot pass this
    val stats = famTotal("bmstats",
      _.agg(sum("n").as("n"), sum("sdl").as("sdl")).head)
    val docsTot = famTotal("bmdocs",
      _.agg(count(lit(1)).cast("long").as("n"),
        coalesce(sum("dl"), lit(0L)).as("sdl")).head)
    assert(stats.getLong(0) === docsTot.getLong(0))
    assert(stats.getLong(1) === docsTot.getLong(1))
    // and the denormalized posting dl matches the per-doc table
    val post = famTotal("bmpost",
      _.select("doc_id", "dl").distinct()
        .agg(count(lit(1)).as("docs"), coalesce(sum("dl"), lit(0L)).as("sdl")).head)
    val docsWithTerms = famTotal("bmdocs",
      _.where(col("dl") > 0)
        .agg(count(lit(1)).as("docs"), coalesce(sum("dl"), lit(0L)).as("sdl")).head)
    assert(post.getLong(0) === docsWithTerms.getLong(0),
      "a doc's denormalized dl disagrees across its postings")
    assert(post.getLong(1) === docsWithTerms.getLong(1))
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
