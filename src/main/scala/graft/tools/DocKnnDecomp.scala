package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** Stage-level decomposition of the doc_knn anchor (VERDICT r15 "What's
  * wrong" #4): times the corpusHint count, the docEmbed subtree, the
  * knnGraph tail, and the demo's trailing global sort separately so the
  * 2.9× lands on a stage. Usage:
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.DocKnnDecomp`.
  */
object DocKnnDecomp {
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

    def docs = graft.core.Catalog.tpch(spark, dir).table("documents")
    // executor-occupancy accounting: wall-clock minus (Σ task run time /
    // slots) is scheduling + driver + plan overhead — the part of the
    // anchor a single-process oracle never pays and a real cluster
    // amortizes over real data volumes
    val taskNanos = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          taskNanos.addAndGet(sc.stageInfo.taskMetrics.executorRunTime * 1000000L)
          stages.incrementAndGet()
        }
      })
    def time(fn: () => Unit): Double = {
      val t0 = System.nanoTime()
      fn()
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def once(): Seq[(String, Double)] = {
      var n = 0L
      val tCount = time(() => n = docs.count())
      val tEmbed = time(() => noop(Similarity.docEmbed(docs, dim = 16)))
      // the knnGraph TAIL alone: embed pre-materialized outside the timer
      val pre = Similarity.docEmbed(docs, dim = 16).localCheckpoint()
      val tTail = time(() => noop(Similarity.knnGraph(
        pre, k = 3, bands = 2, center = true, corpusHint = Some(n))))
      val t0n = taskNanos.get(); val s0 = stages.get()
      val tGraph = time(() => noop(Similarity.knnGraph(
        Similarity.docEmbed(docs, dim = 16),
        k = 3, bands = 2, center = true, corpusHint = Some(n))))
      val busy = (taskNanos.get() - t0n) / 1e9
      val nStages = (stages.get() - s0).toDouble
      val tSorted = time(() => noop(Similarity.knnGraph(
          Similarity.docEmbed(docs, dim = 16),
          k = 3, bands = 2, center = true, corpusHint = Some(n))
        .orderBy("query_id", "rank")))
      Seq("count" -> tCount, "docEmbed" -> tEmbed, "knnGraph_tail" -> tTail,
        "knnGraph_total" -> tGraph, "task_time_sum" -> busy,
        "n_stages" -> nStages, "knnGraph_sorted" -> tSorted)
    }
    once() // warmup
    val runs = (0 until reps).map(_ => once())
    val mins = runs.head.map(_._1).map { k =>
      k -> runs.map(_.toMap.apply(k)).min
    }
    println(mins.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", s""","reps":$reps,"sf":"$dir"}"""))
    spark.stop()
  }
}
