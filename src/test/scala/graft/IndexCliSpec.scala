package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.cli.IndexMain
import graft.operators.{Bm25IndexStore, TextAnalysis, VectorIndexStore}

/** End-to-end drive of the index CLI over temp dirs — the daily-driver
  * serving-store loop (r19 verdict task 4): found → append →
  * drift-gated re-found → compact → search → vacuum, for both store
  * kinds. The CLI is a THIN main over the store objects: every answer
  * it writes must equal the corresponding library call's.
  */
class IndexCliSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "text")

  test("bm25 store: found, append, compact, search equals the corpus-pass operator, vacuum") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_index_cli_bm").toString
    val old = docs.where(col("doc_id") % 2 === 0)
    val fresh = docs.where(col("doc_id") % 2 === 1)
    old.write.parquet(s"$tmp/corpus.parquet")
    fresh.write.parquet(s"$tmp/batch.parquet")
    Seq((7L, Seq("dup", "row")), (8L, Seq("vector", "table", "dup")))
      .toDF("query_id", "terms").write.parquet(s"$tmp/queries.parquet")

    IndexMain.run(Seq("--bm25", s"$tmp/store",
      "--found", s"$tmp/corpus.parquet"), spark)
    IndexMain.run(Seq("--bm25", s"$tmp/store",
      "--append", s"$tmp/batch.parquet", "--compact"), spark)
    IndexMain.run(Seq("--bm25", s"$tmp/store",
      "--search", s"$tmp/queries.parquet", "-o", s"$tmp/answers",
      "--k", "7", "--vacuum"), spark)

    val served = spark.read.parquet(s"$tmp/answers")
      .orderBy("query_id", "rank").collect().toSeq
    val direct = TextAnalysis.bm25TopKBatch(old.unionByName(fresh),
        Seq((7L, Seq("dup", "row")), (8L, Seq("vector", "table", "dup")))
          .toDF("query_id", "terms"), k = 7)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served === direct)
    assert(served.nonEmpty)
    // compact + vacuum really happened: one live segment per family
    assert(graft.core.EpochStore.readSegments(spark, s"$tmp/store",
      "bmpost", graft.core.EpochStore.currentEpoch(spark, s"$tmp/store"))
      .exists(_.size === 1))
    assert(!new java.io.File(s"$tmp/store/bmpost_s1").exists(),
      "vacuum left the founding fragment")
  }

  test("vector store: found, quiet gate, drifted append fires --refound-if-stale, search, vacuum") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_index_cli_vx").toString
    // the drift-telemetry geometry (VectorIndexStoreSpec): founding
    // clusters on axes e0..e3, the shifted batch on e4..e7 — directions
    // the frozen codebook never saw. centEvery = 37 makes the founding
    // sampling rule (vec_id % 37 == 0 over ids 0..119) pick one vector
    // per axis, so the founding codebook covers its own distribution.
    val dim = 8
    def cluster(ids: Range, axes: Range) = ids.map { i =>
      val axis = axes(i % axes.length)
      (i.toLong, Array.tabulate(dim)(d =>
        (if (d == axis) 1.0f else 0.0f) + 0.02f * ((i * 7 + d * 3) % 5 - 2)))
    }
    cluster(0 until 120, 0 until 4).toDF("vec_id", "embedding")
      .write.parquet(s"$tmp/founding.parquet")
    cluster(1000 until 1080, 0 until 4).toDF("vec_id", "embedding")
      .write.parquet(s"$tmp/indist.parquet")
    cluster(2000 until 2080, 4 until 8).toDF("vec_id", "embedding")
      .write.parquet(s"$tmp/shifted.parquet")
    cluster(5000 until 5010, 4 until 8).toDF("vec_id", "embedding")
      .write.parquet(s"$tmp/queries.parquet")

    IndexMain.run(Seq("--vectors", s"$tmp/store",
      "--found", s"$tmp/founding.parquet",
      "--m", "4", "--cent-every", "37"), spark)
    // in-distribution append: the gate must stay QUIET (no rebuild churn)
    IndexMain.run(Seq("--vectors", s"$tmp/store",
      "--append", s"$tmp/indist.parquet", "--refound-if-stale", "--drift"),
      spark)
    assert(VectorIndexStore.driftStats(spark, s"$tmp/store").count() === 2,
      "the quiet gate must not rebuild")
    // shifted append: the gate fires through the CLI and re-founds at
    // --nlist 8 (drift and growth arrive together)
    IndexMain.run(Seq("--vectors", s"$tmp/store",
      "--append", s"$tmp/shifted.parquet",
      "--refound-if-stale", "--nlist", "8", "--compact"), spark)
    val hist = VectorIndexStore.driftStats(spark, s"$tmp/store").collect()
    assert(hist.length === 1 && hist.head.getString(1) === "founding",
      "a fired gate must restart the drift history at a new founding row")
    assert(VectorIndexStore.load(spark, s"$tmp/store").postings.count() === 280)

    IndexMain.run(Seq("--vectors", s"$tmp/store",
      "--search", s"$tmp/queries.parquet", "-o", s"$tmp/answers",
      "--k", "5", "--nprobe", "1", "--vacuum"), spark)
    val served = spark.read.parquet(s"$tmp/answers")
      .orderBy("query_id", "rank").collect().toSeq
    val direct = VectorIndexStore.search(
        cluster(5000 until 5010, 4 until 8).toDF("vec_id", "embedding"),
        s"$tmp/store", kNN = 5, nprobe = 1)
      .orderBy("query_id", "rank").collect().toSeq
    assert(served === direct)
    assert(served.nonEmpty)
  }

  test("malformed invocations fail loudly") {
    val tmp = Files.createTempDirectory("graft_index_cli_bad").toString
    intercept[IllegalArgumentException] {
      IndexMain.run(Seq("--found", s"$tmp/x.parquet"), spark) // no store kind
    }
    intercept[IllegalArgumentException] {
      IndexMain.run(Seq("--bm25", s"$tmp/a", "--vectors", s"$tmp/b",
        "--vacuum"), spark) // both kinds
    }
    intercept[IllegalArgumentException] {
      IndexMain.run(Seq("--bm25", s"$tmp/a"), spark) // no action
    }
    intercept[IllegalArgumentException] {
      IndexMain.run(Seq("--bm25", s"$tmp/a", "--refound-if-stale"), spark)
    }
  }
}
