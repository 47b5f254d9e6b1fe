package graft

import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.operators.Similarity

class FunctionsSpec extends SparkSpec {

  test("dot_product SQL function registers and computes the sequential fold") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d").head()
    assert(row.getDouble(0) === 32.0)
  }

  test("dot_product handles nulls and length mismatch") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))")
      .head().isNullAt(0))
    // unequal lengths → NULL (the aggregate(zip_with(...)) contract: a
    // mismatched-dim pair signals a broken pipeline, not a scorable value)
    assert(spark.sql("SELECT dot_product(array(2.0d), array(3.0d, 9.0d))")
      .head().isNullAt(0))
  }

  test("simhash48 SQL function matches the operator's signature column") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT simhash48(array(CAST(5 AS BIGINT), CAST(5 AS BIGINT), CAST(2 AS BIGINT)))")
      .head().getLong(0)
    // bits 0 and 2 voted by two 5s (101) vs one 2 (010): majority 101 = 5
    assert(viaSql === 5L)
  }

  test("DotProduct null-on-mismatch holds through whole-stage codegen") {
    import spark.implicits._
    // non-literal inputs, so this runs the generated code path (the SQL
    // literal tests above are constant-folded through eval)
    val df = Seq(
      (Array(1.0, 2.0), Array(1.0, 2.0, 3.0)),
      (Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val out = df.select(Similarity.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) === 11.0)
  }

  test("adc_distance sums the coded lookup-table cells; mismatch is NULL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT adc_distance(array(array(1.0d, 2.0d), array(10.0d, 20.0d)), " +
        "array(CAST(1 AS BIGINT), CAST(0 AS BIGINT)))").head()
    assert(row.getDouble(0) === 12.0) // lut[0][1] + lut[1][0]
    assert(spark.sql(
      "SELECT adc_distance(array(array(1.0d)), " +
        "array(CAST(0 AS BIGINT), CAST(0 AS BIGINT)))").head().isNullAt(0))
  }

  test("pq_distances SQL function computes the m x k squared-L2 matrix") {
    GraftExtensions.register(spark)
    // m=2 subspaces of 1 dim, k=2 centroids: cb = [[0],[10]] per subspace
    val row = spark.sql(
      "SELECT pq_distances(array(3.0d, 9.0d), array(0.0d, 10.0d, 0.0d, 10.0d), 2, 2) AS m")
      .head()
    val mat = row.getSeq[Seq[Double]](0)
    assert(mat === Seq(Seq(9.0, 49.0), Seq(81.0, 1.0)))
    // vector width != m * sub -> NULL (same contract as dot_product)
    assert(spark.sql(
      "SELECT pq_distances(array(3.0d), array(0.0d, 10.0d, 0.0d, 10.0d), 2, 2)")
      .head().isNullAt(0))
  }

  test("pq_distances rejects non-literal m/k") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT pq_distances(array(1.0d), array(1.0d), CAST(rand() AS INT), 1)").head()
    }
    assert(e.getMessage.contains("integer literal") ||
      String.valueOf(e.getCause).contains("integer literal"))
  }

  test("DotProduct column API matches SQL function result") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val viaColumn = df.select(Similarity.dot(col("a"), col("b"))).head().getDouble(0)
    val viaSql = df.selectExpr("dot_product(a, b)").head().getDouble(0)
    assert(viaColumn === viaSql)
  }

  test("PqResidualDistances is bit-equal to the zip_with residual composition") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val dim = 8
    val m = 4
    val k = 3
    val cents = Array.fill(5)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val cb = Array.fill(m * k * (dim / m))(rnd.nextDouble() * 2 - 1)
    val df = (0 until 64).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1), i % 5))
      .toDF("vec_id", "v", "cell")
      .select(col("vec_id"), col("v"), col("cell").cast("int").as("cell"))
    // the replaced composition: interpreted zip_with residual, then the
    // codegen'd PqDistances over it (Similarity.residualExpr's body)
    val composed = graft.functions.PqDistances(
      zip_with(col("v"),
        element_at(typedLit(cents.map(_.toSeq).toSeq), col("cell") + 1),
        (a, b) => a - b),
      typedLit(cb.toSeq), m, k)
    val fused = graft.functions.PqResidualDistances(
      col("v"), col("cell"), cents, cb, m, k)
    val rows = df.select(col("vec_id"), composed.as("c"), fused.as("f"))
      .orderBy("vec_id").collect()
    rows.foreach { r =>
      assert(r.getSeq[scala.collection.Seq[Double]](1) === r.getSeq[scala.collection.Seq[Double]](2))
    }
    // out-of-range cell: NULL through both forms (element_at OOB null vs
    // the fused expression's explicit range check)
    val bad = df.select(
      graft.functions.PqResidualDistances(
        col("v"), lit(99).cast("int"), cents, cb, m, k).as("f")).head()
    assert(bad.isNullAt(0))
    // width mismatch: NULL, the PqDistances contract
    val narrow = df.select(graft.functions.PqResidualDistances(
      slice(col("v"), 1, 3), col("cell"), cents, cb, m, k).as("f")).head()
    assert(narrow.isNullAt(0))
  }
}
