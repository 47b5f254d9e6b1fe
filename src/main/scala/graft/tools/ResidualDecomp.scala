package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.VectorIndexStore

/** Per-stage decomposition of the ivfpq_ingest_residual vs
  * ivfpq_ingest_search anchor gap (VERDICT r15 "What's wrong" #3): times
  * save / append / search separately for the residual and non-residual
  * index forms on the same corpus split the SparkEntry demos use, so the
  * residual-specific cost lands on a stage instead of a guess.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ResidualDecomp`
  * — prints one JSON line with min-of-reps seconds per (form, stage).
  */
object ResidualDecomp {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Catalog.tpch(spark, dir).table("embeddings")
      .localCheckpoint() // decomposition isolates the store, not the scan

    def time(fn: () => Unit): Double = {
      val t0 = System.nanoTime()
      fn()
      (System.nanoTime() - t0) / 1e9
    }
    def run(residual: Boolean): Map[String, Double] = {
      // fresh store per rep; report min over reps per stage
      val times = (0 until reps).map { _ =>
        val store = java.nio.file.Files
          .createTempDirectory(s"graft-rdecomp-$residual").toString
        val tSave = time(() =>
          VectorIndexStore.save(emb.where(col("vec_id") % 3 =!= 0), store,
            m = 8, k = 16, centEvery = 40, residual = residual))
        val tAppend = time(() =>
          VectorIndexStore.append(emb.where(col("vec_id") % 3 === 0), store))
        val tSearch = time(() =>
          VectorIndexStore.search(
              emb.where(col("vec_id") % 50 === 0)
                .select(col("vec_id"), col("embedding")),
              store, kNN = 10, nprobe = 2)
            .orderBy("query_id", "rank")
            .write.format("noop").mode("overwrite").save())
        Map("save" -> tSave, "append" -> tAppend, "search" -> tSearch)
      }
      Seq("save", "append", "search").map(k =>
        k -> times.map(_(k)).min).toMap
    }
    run(residual = false) // warmup, discarded
    val nonRes = run(residual = false)
    val res = run(residual = true)
    def j(m: Map[String, Double]) =
      m.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"nonresidual":${j(nonRes)},"residual":${j(res)},"reps":$reps,"sf":"$dir"}""")
    spark.stop()
  }
}
