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

  test("HexHash60 family is bit-identical to the md5/conv column algebra") {
    import spark.implicits._
    val algebra: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val docs = Seq(
      "the quick brown fox", "", "dup", "row vector table",
      "na\u00efve caf\u00e9 \u4e2d\u6587 \ud83d\ude00 mixed", "  spaces  and\ttabs ",
      "a" * 2000).toDF("t")
    val rows = docs.select(
      graft.functions.HexHash60(col("t")).as("fast"),
      algebra(col("t")).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
    // array form vs transform(arr, algebra), incl. empty arrays
    val arrs = Seq(
      Seq("a b c", "b c d", "", "\u4e2d\u6587 shingle"),
      Seq.empty[String]).toDF("sh")
    val ar = arrs.select(
      graft.functions.HexHash60All(col("sh")).as("fast"),
      transform(col("sh"), x => algebra(x)).as("ref")).collect()
    ar.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1), r.toString))
  }

  test("MinHashSig is element-wise identical to the k-walk column algebra") {
    import spark.implicits._
    val MhPrime = 2147483647L
    val MhBase = 1073741824L
    val k = 16
    def mhParam(kind: String, i: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"mh|$kind|$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val as = (0 until k).map(i => mhParam("a", i) % (MhPrime - 1) + 1)
    val bs = (0 until k).map(i => mhParam("b", i) % MhPrime)
    val algebra = {
      val hs = transform(col("sh"),
        x => (conv(substring(md5(x), 1, 15), 16, 10).cast("long") % MhBase))
      array((0 until k).map { i =>
        array_min(transform(hs, h => (h * lit(as(i)) + lit(bs(i))) % MhPrime))
      }: _*)
    }
    val docs = Seq(
      Seq("a b c", "b c d", "c d e"),
      Seq("one two three"),
      Seq.empty[String],
      (1 to 400).map(i => s"sh $i ngram")).toDF("sh")
    val rows = docs.select(
      graft.functions.MinHashSig(col("sh"), MhBase, MhPrime, as, bs).as("fast"),
      algebra.as("ref")).collect()
    rows.foreach { r =>
      val f = if (r.isNullAt(0)) null else r.getSeq[Any](0)
      val g = if (r.isNullAt(1)) null else r.getSeq[Any](1)
      assert(f === g, r.toString)
    }
  }

  test("Tokens/Shingles/FingerprintAgg are bit-identical to the column algebra") {
    import spark.implicits._
    val docs = Seq(
      "  The Quick\tBrown FOX jumps over the lazy dog  ",
      "", "   ", "one",
      "a b c d a b c d a b c d",
      "\u4e2d\u6587 T\u00d6KEN Stra\u00dfe \u0130stanbul mixed CASE text here",
      (1 to 300).map(i => s"tok$i").mkString(" ")).toDF("text")
    val tokAlg = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val tk = docs.select(
      graft.functions.Tokens(col("text")).as("fast"), tokAlg.as("ref")).collect()
    tk.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1), r.toString))
    def shAlg(tkc: org.apache.spark.sql.Column, n: Int) =
      array_distinct(
        when(size(tkc) >= n,
          transform(sequence(lit(1), size(tkc) - (n - 1)),
            i => concat_ws(" ", slice(tkc, i, lit(n)))))
          .otherwise(array().cast("array<string>")))
    val sh = docs
      .select(graft.functions.Tokens(col("text")).as("tk"))
      .select(graft.functions.Shingles(col("tk"), 3).as("fast"),
        shAlg(col("tk"), 3).as("ref")).collect()
    sh.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1), r.toString))
    val fpAlg = {
      val hs = transform(col("sh"),
        x => conv(substring(md5(x), 1, 15), 16, 10).cast("long"))
      when(size(col("sh")) > 0, struct(
        array_min(hs).as("fp_min"), array_max(hs).as("fp_max"),
        aggregate(hs, lit(0L), (acc, h) => acc.bitwiseXOR(h)).as("fp_xor"),
        size(col("sh")).cast("long").as("n_shingles")))
    }
    val fp = docs
      .select(graft.functions.Shingles(
        graft.functions.Tokens(col("text")), 3).as("sh"))
      .select(
        graft.functions.FingerprintAgg(
          graft.functions.HexHash60All(col("sh"))).as("fast"),
        fpAlg.as("ref")).collect()
    fp.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getStruct(0) === r.getStruct(1), r.toString)
    }
  }

  test("SpanHashes is bit-identical to the strided window-hash column algebra") {
    import spark.implicits._
    val docs = Seq(
      (1 to 40).map(i => s"w$i").mkString(" "), // several strides
      (1 to 15).map(i => s"w$i").mkString(" "), // exactly w tokens: one span
      (1 to 14).map(i => s"w$i").mkString(" "), // fewer than w: empty
      "", "   ", "solo",
      "中文 TÖKEN Straße " + (1 to 30).mkString(" "),
      (1 to 203).map(i => s"t${i % 7}").mkString(" ") // stride tail + repeats
    ).toDF("text")
    for ((w, stride) <- Seq((15, 5), (15, 1), (2, 3))) {
      def alg(tk: org.apache.spark.sql.Column) =
        when(size(tk) >= w,
          transform(sequence(lit(1), size(tk) - (w - 1), lit(stride)),
            p => struct(p.as("span_start"),
              graft.functions.HexHash60(concat_ws(" ", slice(tk, p, lit(w))))
                .as("span_hash"))))
          .otherwise(array().cast("array<struct<span_start:int,span_hash:bigint>>"))
      val rows = docs
        .select(graft.functions.Tokens(col("text")).as("tk"))
        .select(graft.functions.SpanHashes(col("tk"), w, stride).as("fast"),
          alg(col("tk")).as("ref")).collect()
      rows.foreach(r =>
        assert(r.getSeq[Any](0) === r.getSeq[Any](1), s"w=$w stride=$stride $r"))
    }
  }

  test("StripSpans is bit-identical to the filter/exists strip column algebra") {
    import spark.implicits._
    val w = 15
    val docs = Seq(
      ((1 to 40).map(i => s"w$i").mkString(" "), Seq(1L)), // head span
      ((1 to 40).map(i => s"w$i").mkString(" "), Seq(26L)), // exact tail fit
      ((1 to 40).map(i => s"w$i").mkString(" "), Seq(1L, 6L, 26L)), // overlaps
      ((1 to 40).map(i => s"w$i").mkString(" "), Seq(1L, 26L)), // gap survives
      ((1 to 40).map(i => s"w$i").mkString(" "), Seq.empty[Long]), // untouched
      ((1 to 15).map(i => s"w$i").mkString(" "), Seq(1L)), // fully covered
      ("", Seq.empty[Long]), ("solo", Seq.empty[Long]))
      .toDF("text", "starts")
    def alg(tk: org.apache.spark.sql.Column, st: org.apache.spark.sql.Column) = {
      val kept = filter(tk, (_, i) =>
        !exists(st, s => s <= i + 1 && i + 1 < s + w))
      struct(
        array_join(kept, " ").as("text_clean"),
        size(tk).cast("long").as("n_tokens"),
        (size(tk) - size(kept)).cast("long").as("n_tokens_removed"))
    }
    val rows = docs
      .select(graft.functions.Tokens(col("text")).as("tk"),
        sort_array(col("starts")).as("st"))
      .select(graft.functions.StripSpans(col("tk"), col("st"), w).as("fast"),
        alg(col("tk"), col("st")).as("ref")).collect()
    rows.foreach(r => assert(r.getStruct(0) === r.getStruct(1), r.toString))
  }

  test("tokens/shingles/minhash NULL input propagates NULL (r21 advice pin)") {
    // The codegen'd kernels PROPAGATE null (UnaryExpression semantics); the
    // pre-r21 column algebra returned empty/k-null arrays instead. No
    // operator path reaches them with NULL text (all filter on token/shingle
    // counts first), but the contract must be pinned, not accidental.
    val nulls = spark.sql("SELECT CAST(NULL AS STRING) AS text")
      .select(
        graft.functions.Tokens(col("text")).as("tk"),
        graft.functions.Shingles(
          graft.functions.Tokens(col("text")), 3).as("sh"),
        graft.functions.SpanHashes(
          graft.functions.Tokens(col("text")), 15, 5).as("sp"))
      .head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
    val sig = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS sh")
      .select(graft.functions.MinHashSig(col("sh"), 1073741824L, 2147483647L,
        (0 until 16).map(i => 17L * i + 1), (0 until 16).map(i => 13L * i + 7))
        .as("sig"))
      .head()
    assert(sig.isNullAt(0))
  }
}
