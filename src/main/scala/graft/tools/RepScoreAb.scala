package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Catalog
import graft.operators.TextAnalysis.bindOnce

/** A/B probe for the repetition_score elevation seen after the Tokens
  * kernel landed (r21): times the operator's exact column body with (A)
  * the old filter(split(lower)) token algebra and (B) the codegen'd
  * Tokens expression, interleaved A/B/A/B so host drift cannot masquerade
  * as a code effect. Diagnostic tool, not a gate.
  */
object RepScoreAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Catalog.tpch(spark, sfDir).table("documents")
    def body(tok: Column => Column) =
      docs.select(col("doc_id"),
        bindOnce(tok(col("text")), tk =>
          bindOnce(
            when(size(tk) >= 3,
              transform(sequence(lit(1), size(tk) - 2),
                i => concat_ws(" ", slice(tk, i, lit(3)))))
              .otherwise(array().cast("array<string>")),
            gs => struct(
              size(tk).cast("long").as("n_tokens"),
              round(size(array_distinct(tk)).cast("double") /
                greatest(size(tk), lit(1)), 4).as("distinct_token_ratio"),
              round(when(size(gs) > 0,
                  lit(1.0) - size(array_distinct(gs)).cast("double") / size(gs))
                .otherwise(lit(0.0)), 4).as("dup_3gram_ratio"),
              round(when(size(tk) > 0,
                  array_max(transform(array_distinct(tk),
                    t => size(filter(tk, x => x === t)))).cast("double") / size(tk))
                .otherwise(lit(0.0)), 4).as("top_token_ratio")))).as("s"))
    val oldTok: Column => Column =
      t => filter(split(lower(t), "\\s+"), x => length(x) > 0)
    val newTok: Column => Column = t => graft.functions.Tokens(t)
    def time(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both
    time(body(oldTok)); time(body(newTok))
    val res = (1 to 4).flatMap { _ =>
      Seq("old" -> time(body(oldTok)), "new" -> time(body(newTok)))
    }
    res.groupBy(_._1).foreach { case (k, vs) =>
      val xs = vs.map(_._2).sorted
      println(f"[repab] $k%-4s med=${xs(xs.size / 2)}%.3f all=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
