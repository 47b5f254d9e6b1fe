package graft

import org.apache.spark.sql.functions._

import graft.core.Materialize
import graft.operators.VectorIndexStore

/** [[graft.core.Materialize]] — the r22 lineage-cut policy: bare relation
  * scans skip the cut (r21 verdict #3), computed subtrees keep it, and
  * `spark.graft.materialize.reliable=true` swaps every cut to a parquet
  * spill with fault-tolerant file lineage (r21 verdict #4/#9).
  */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  test("bareScan: leaf/project/filter lineage is bare, anything computed is not") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mat-spec").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    assert(Materialize.bareScan(scan))
    assert(Materialize.bareScan(scan.where(col("id") % 2 === 0)))
    assert(Materialize.bareScan(
      scan.select(col("id"), upper(col("s")).as("u")).where(col("id") > 0)))
    assert(Materialize.bareScan(scan.as("t")))
    // local relations are leaves too — nothing upstream to re-run
    assert(Materialize.bareScan(Seq(1).toDF("x")))
    assert(!Materialize.bareScan(scan.groupBy(col("s")).count()))
    assert(!Materialize.bareScan(scan.join(scan.as("o"), "id")))
    assert(!Materialize.bareScan(
      scan.select(col("id"), explode(split(col("s"), "")).as("c"))))
    assert(!Materialize.bareScan(scan.union(scan)))
  }

  test("frame: reliable form spills to parquet with file lineage, rows identical") {
    val df = Seq((1L, 2.0), (2L, 3.0), (3L, 4.0)).toDF("id", "v")
      .groupBy(col("id")).agg(sum(col("v")).as("v")) // computed subtree
    val viaLocal = Materialize.frame(df)
    assert(viaLocal.queryExecution.analyzed.collectLeaves().nonEmpty)
    spark.conf.set("spark.graft.materialize.reliable", "true")
    try {
      val viaSpill = Materialize.frame(df)
      // file-scan lineage: an executor loss recomputes from the spill
      // files, unlike localCheckpoint's unrecoverable blocks
      assert(viaSpill.queryExecution.analyzed.collectLeaves().exists(
        _.getClass.getSimpleName.contains("LogicalRelation")))
      assert(viaSpill.orderBy("id").collect().toSeq ===
        viaLocal.orderBy("id").collect().toSeq)
    } finally spark.conf.set("spark.graft.materialize.reliable", "false")
  }

  test("VectorIndexStore founds/appends/searches under the reliable spill form") {
    val rnd = new scala.util.Random(7)
    def emb(ids: Range) = ids.map(i =>
      (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1))).toDF("vec_id", "embedding")
    val store = java.nio.file.Files.createTempDirectory("graft-mat-vix").toString
    // computed subtrees (distinct) so the cut actually engages
    spark.conf.set("spark.graft.materialize.reliable", "true")
    try {
      VectorIndexStore.save(emb(0 until 60).distinct(), store, m = 4, k = 4,
        centEvery = 10)
      VectorIndexStore.append(emb(60 until 80).distinct(), store)
      val hits = VectorIndexStore.search(
        emb(0 until 5).distinct(), store, kNN = 3).collect()
      assert(hits.length === 15) // 5 queries × k 3
    } finally spark.conf.set("spark.graft.materialize.reliable", "false")
  }
}
