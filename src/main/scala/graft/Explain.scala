package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of selected
  * `SparkEntry.queries` entries — the artifact behind SURVEY §6's plan
  * audits (pushdown reaching scans, broadcasts where intended, no stray
  * BroadcastNestedLoopJoin / corpus-wide Window).
  *
  * Usage: `runMain graft.Explain <sfDir> <query1,query2,...> [final]`
  *
  * With the third arg `final`, each query is EXECUTED first and the
  * adaptive plan printed AFTER execution (isFinalPlan=true) — the only
  * view that shows what AQE actually did (ReusedExchange dedup,
  * AQEShuffleRead coalescing, runtime join rewrites). The pre-execution
  * dump shows duplicated subtrees that the runtime may never pay.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val showFinal = args.length > 2 && args(2) == "final"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names; fn <- SparkEntry.queries.get(name)) {
      println(s"\n========== $name ==========")
      val df = fn(spark, sfDir)
      df.explain("formatted")
      if (showFinal) {
        df.collect(): Unit // execute THIS plan so AQE finalizes it
        println(s"---------- $name: executed (AQE-final) plan ----------")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
