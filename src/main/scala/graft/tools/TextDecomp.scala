package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Catalog
import graft.operators.TextAnalysis

/** Wall-clock decomposition of the shared text substrate (tokens →
  * shingles → hash) that sits under the n-gram/fingerprint/minhash
  * families: times each stage as a noop-sunk pass over `documents` so
  * the r21 round can see which interpreted HOF stage still owns the
  * map-side cost after the HexHash60 swap. Diagnostic tool, not a gate.
  */
object TextDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Catalog.tpch(spark, sfDir).table("documents")
    def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warmup
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[textdecomp] $label%-30s ${runs.sorted.apply(1)}%8.3f s (med of 3)")
    }
    t("raw scan")(docs.select(col("doc_id"), col("text")))
    t("tokens")(docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("tk")))
    t("tokens size only")(docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).as("n")))
    t("shingles")(docs.select(col("doc_id"),
      TextAnalysis.shingles(TextAnalysis.tokens(col("text"))).as("sh")))
    t("shingles + HexHash60All")(docs.select(col("doc_id"),
      graft.functions.HexHash60All(
        TextAnalysis.shingles(TextAnalysis.tokens(col("text")))).as("hs")))
    t("docFingerprint")(TextAnalysis.docFingerprint(docs))
    t("minhash sig (16)")(docs.select(col("doc_id"),
      graft.operators.Dedup.minhashSignature(
        TextAnalysis.shingles(TextAnalysis.tokens(col("text"))), 16).as("sig")))
    spark.stop()
  }
}
