package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Catalog
import graft.operators.{Dedup, Similarity}

/** Wall-clock decomposition probe for the `semantic_groups` chain
  * (docEmbed → knnGraph → cosine filter → dedupGroups): times each
  * stage in isolation so the r21 optimization round attacks the piece
  * that actually costs, not the one that looks iterative. Diagnostic
  * tool, not part of any gate.
  *
  * Usage: `runMain graft.tools.SemGroupsDecomp [sfDir]`
  */
object SemGroupsDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[decomp] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val c = Catalog.tpch(spark, sfDir)
    // warmup: one full run (JIT, codegen, footer caches)
    t("warmup full semantic_groups") {
      val edges = Similarity.knnGraph(
          Similarity.docEmbed(c.table("documents"), dim = 16),
          k = 3, bands = 2, center = true,
          corpusHint = Some(c.rowCount("documents")))
        .where(col("cosine") >= 0.95)
        .select(col("query_id").as("doc_a"), col("neighbor_id").as("doc_b"))
      Dedup.dedupGroups(edges).orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    // timed decomposition
    val emb = t("docEmbed plan-build")(
      Similarity.docEmbed(c.table("documents"), dim = 16))
    t("docEmbed noop")(
      emb.write.format("noop").mode("overwrite").save())
    val graph = t("knnGraph plan-build (incl cp)")(
      Similarity.knnGraph(emb, k = 3, bands = 2, center = true,
        corpusHint = Some(c.rowCount("documents"))))
    t("knnGraph noop")(
      graph.write.format("noop").mode("overwrite").save())
    val edges = graph.where(col("cosine") >= 0.95)
      .select(col("query_id").as("doc_a"), col("neighbor_id").as("doc_b"))
    val groups = t("dedupGroups (eager rounds)")(Dedup.dedupGroups(edges))
    t("groups orderBy noop")(
      groups.orderBy("doc_id").write.format("noop").mode("overwrite").save())
    // second full run for a stable end-to-end number
    t("full semantic_groups (2nd)") {
      val e2 = Similarity.knnGraph(
          Similarity.docEmbed(c.table("documents"), dim = 16),
          k = 3, bands = 2, center = true,
          corpusHint = Some(c.rowCount("documents")))
        .where(col("cosine") >= 0.95)
        .select(col("query_id").as("doc_a"), col("neighbor_id").as("doc_b"))
      Dedup.dedupGroups(e2).orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
