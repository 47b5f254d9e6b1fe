package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VectorIndexStore

/** Decomposition probe for the refound recall-recovery curve (ScaleCheck
  * `vec_refound` aux): rebuilds the scaled spec geometry at one size and
  * prints WHERE the post-refound recall goes — cells per shifted
  * cluster, probed-cell membership per query, and the recall split by
  * cause. Diagnostic tool, not part of any gate.
  */
object RefoundDecomp {
  def main(args: Array[String]): Unit = {
    val nEmb = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val nShiftClusters = math.max(8, math.min(192, (nEmb * 2 / 3 / 20)))
    val shiftedIdBase = 100000000L
    def twoHot(c: org.apache.spark.sql.Column, base: Int,
        jitter: org.apache.spark.sql.Column,
        i: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (jitter * lit(0.05)
        + when(i === lit(base.toLong) + pmod(c, lit(16L)), lit(1.0))
          .otherwise(lit(0.0))
        + when(i === lit(base + 16L) + pmod(c / 16L, lit(16L)), lit(1.0))
          .otherwise(lit(0.0))).cast("float")
    // deterministic jitter source standing in for the real embeddings
    val emb = spark.range(nEmb).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(col("id") * 31 + i * 7, lit(97L)).cast("double") / 97.0
          - 0.5).cast("float")).as("embedding"))
    val founding = emb.select(col("vec_id"),
      transform(col("embedding"),
        (x, i) => twoHot(pmod(col("vec_id"), lit(64L)), 0, x, i))
        .as("embedding"))
    val shifted = emb.where(col("vec_id") % 3 =!= 0)
      .select((col("vec_id") + lit(shiftedIdBase)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => twoHot(pmod(col("vec_id"), lit(nShiftClusters.toLong)),
            32, x, i)).as("embedding"))
    val s = java.nio.file.Files.createTempDirectory("graft-refdbg").toString
    val ce = math.max(1, (nEmb / 64)) | 1
    VectorIndexStore.save(founding, s, m = 32, centEvery = ce, maxCents = 64)
    VectorIndexStore.append(shifted, s)
    val fired = VectorIndexStore.refoundIfStale(spark, s,
      nlist = 64 + nShiftClusters,
      sampleN = math.min(50000, math.max(10000, nEmb)))
    println(s"nEmb=$nEmb nShiftClusters=$nShiftClusters fired=$fired")
    val ix = VectorIndexStore.load(spark, s)
    println(s"cells=${ix.cents.length}")
    // per shifted cluster: how many cells do its members land in, and
    // what share sits in the modal cell?
    val post = ix.postings.where(col("vec_id") >= shiftedIdBase)
      .select(pmod(col("vec_id") - shiftedIdBase, lit(nShiftClusters.toLong))
        .as("cl"), col("cell"))
    val spread = post.groupBy("cl", "cell").count()
      .groupBy("cl").agg(count(lit(1)).as("ncells"), max("count").as("modal"),
        sum("count").as("members"))
    spread.agg(avg("ncells"), expr("percentile(ncells, 0.5)"),
      avg(col("modal") / col("members"))).show(false)
    // how many distinct cells hold ANY shifted member, and how many hold
    // members of >1 cluster?
    val cellsUsed = post.groupBy("cell")
      .agg(countDistinct("cl").as("ncl")).cache()
    println(s"shifted-occupied cells: ${cellsUsed.count()}; " +
      s"multi-cluster cells: ${cellsUsed.where(col("ncl") > 1).count()}")
    // query diagnostics: 20 shifted queries, nprobe=2 — how many of the
    // top-10 are same-cluster?
    val qIds = shifted.select("vec_id").orderBy("vec_id").limit(20)
      .collect().map(_.getLong(0)).toSeq
    val queries = shifted.where(col("vec_id").isin(qIds: _*))
    val res = VectorIndexStore.search(queries, s, kNN = 11, nprobe = 2)
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (col("neighbor_id") >= shiftedIdBase &&
          pmod(col("neighbor_id") - shiftedIdBase, lit(nShiftClusters.toLong))
            === pmod(col("query_id") - shiftedIdBase,
              lit(nShiftClusters.toLong))).as("same"))
    res.groupBy("query_id").agg(sum(when(col("same"), 1).otherwise(0))
      .as("hits"), count(lit(1)).as("got")).orderBy("query_id").show(30, false)
    spark.stop()
  }
}
