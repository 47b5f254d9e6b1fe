package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-similarity operators for the LLM-data-pipeline tier
  * (SURVEY.md §2): near-duplicate detection by cosine similarity and
  * (approximate) nearest-neighbor search over an `embeddings(vec_id,
  * embedding: array<float>, ...)` table.
  *
  * All vector math is Catalyst higher-order-function algebra over
  * `array<double>` — a strict sequential left fold, so results are
  * bit-reproducible across partitionings and across engines (the DuckDB
  * oracle mirrors the same fold). No UDFs.
  *
  * Scale notes (100 TB):
  * - `embedCosineDup`/`annTopK` are the exact O(n·m) baselines: fine when
  *   one side broadcasts (queries, or a candidate bucket), wrong as an
  *   all-pairs plan at corpus scale.
  * - `annLsh` is the scale path: sign-random-projection buckets turn the
  *   cross product into an equi-join on the bucket key — shuffle volume is
  *   O(rows), candidate verification is per-bucket.
  */
object Similarity {

  /** Vector column as array<double> (floats widen exactly). */
  def vec(c: Column): Column = transform(c, _.cast("double"))

  /** Sequential-fold dot product: ((0 + a1·b1) + a2·b2) + … — the exact
    * fold the DuckDB oracle replays via `list_reduce`, so the resulting
    * double is bitwise identical in both engines. Backed by the codegen'd
    * [[graft.functions.DotProduct]] expression (a primitive loop in
    * whole-stage codegen) rather than the interpreted
    * `aggregate(zip_with(...))` higher-order form — same fold order, same
    * bits, ~100× less per-pair overhead in the pairwise-scoring joins.
    */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  private def normalized(emb: DataFrame): DataFrame =
    // The cast vector is let-bound (TextAnalysis.bindOnce): a raw `vec(...)`
    // expression referenced by both the output column and the norm fold
    // would be evaluated twice per row when interpreted CSE misses.
    emb.select(col("vec_id"),
        TextAnalysis.bindOnce(vec(col("embedding")),
          v => struct(v.as("v"), l2norm(v).as("nrm"))).as("s"))
      .select(col("vec_id"), col("s.v").as("v"), col("s.nrm").as("nrm"))

  /** All vector pairs with cosine ≥ `threshold` — embedding near-dup
    * detection. Exact O(n²/2) plan (broadcast nested loop on the id
    * inequality); at corpus scale run `annLsh`-style bucketing first and
    * this verification only within buckets.
    */
  def embedCosineDup(emb: DataFrame, threshold: Double = 0.4): DataFrame = {
    val e = normalized(emb)
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cosine"))
  }

  /** Exact top-k neighbors per query vector (brute-force ANN baseline).
    * Queries broadcast; candidates stream map-side; per-query top-k via a
    * window on the (small) query partitions. Ties break on neighbor id.
    */
  def annTopK(emb: DataFrame, queryFilter: Column, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = normalized(emb)
    val q = e.where(queryFilter)
      .select(col("vec_id").as("query_id"), col("v").as("vq"), col("nrm").as("nq"))
    val scored = broadcast(q).join(e, col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("vq"), col("v")) / (col("nq") * col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("cos"), 4).as("cosine"))
  }

  /** Pseudo-random hyperplane weight for (plane p, dimension d ≥ 1):
    * uniform on [-1, 1] in steps of 1e-3, derived from the shared
    * md5-based hash (TextAnalysis.hexHash semantics) so the DuckDB oracle
    * draws the identical planes. Computed DRIVER-SIDE — the weights are
    * row-independent, so hashing them per row (rows × planes × dim md5
    * calls) would be pure waste at scale; as literals they fold into the
    * plan.
    */
  private[operators] def planeWeight(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane|$p|$d".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % 2001 - 1000) / 1000.0
  }

  /** Sign-random-projection bucket key: one bit per hyperplane
    * (sign of v·w_p), concatenated to a string key. `planes` bits ⇒
    * 2^planes buckets. The plane weights are literal arrays (see
    * planeWeight); per row this costs planes × dim fused multiply-adds.
    */
  def lshBucket(v: Column, planes: Int, dim: Int): Column =
    concat_ws("", (0 until planes).map { p =>
      val w = array((1 to dim).map(d => lit(planeWeight(p, d))): _*)
      when(dot(v, w) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** LSH-bucketed ANN: same contract as `annTopK` but candidates are
    * restricted to the query's sign-projection bucket. The cross product
    * becomes an equi-join on the bucket key — the plan that survives
    * 100 TB (shuffle O(rows), verify O(bucket²)). Recall is probabilistic:
    * vectors in neighboring buckets are unseen (by design; add multi-probe
    * for higher recall).
    */
  def annLsh(emb: DataFrame, queryFilter: Column, k: Int = 10, planes: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Embedding width, for materializing the plane-weight literals. One
    // footer-only row fetch at plan time (not a scan).
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val e = normalized(emb).withColumn("bucket", lshBucket(col("v"), planes, dim))
    val q = e.where(queryFilter)
      .select(col("vec_id").as("query_id"), col("v").as("vq"),
        col("nrm").as("nq"), col("bucket").as("qbucket"))
    val scored = e.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("vq"), col("v")) / (col("nq") * col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("cos"), 4).as("cosine"))
  }

  /** IVF-bucketed ANN (inverted-file index): every `centEvery`-th vector
    * acts as a centroid (the deterministic, engine-portable stand-in for a
    * k-means codebook — swapping in trained centroids changes nothing
    * downstream); each vector is assigned to its nearest centroid by
    * cosine; queries probe only their own centroid's cell (nprobe = 1).
    *
    * The 100 TB shape: centroids broadcast (a codebook is small by
    * construction), assignment is one map-side argmax pass, and the search
    * join is an equi-join on `cent_id` — shuffle O(rows), verification
    * O(cell size) per query. Recall is probabilistic: neighbors assigned
    * to a different cell are unseen (raise nprobe for higher recall).
    */
  def annIvf(
      emb: DataFrame,
      queryFilter: Column,
      k: Int = 10,
      centEvery: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = normalized(emb)
    val cents = e.where(col("vec_id") % centEvery === 1)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    // Nearest centroid per vector: broadcast the codebook, score every
    // (vector, centroid), keep the argmax. Ties break on cent_id.
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("cent_id"))
    val assigned = e.join(broadcast(cents))
      .withColumn("cos_c", dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id"))
    val q = assigned.where(queryFilter)
      .select(col("vec_id").as("query_id"), col("v").as("vq"),
        col("nrm").as("nq"), col("cent_id").as("qcent"))
    val scored = assigned.join(broadcast(q),
        col("cent_id") === col("qcent") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("vq"), col("v")) / (col("nq") * col("nrm")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("cos"), 4).as("cosine"))
  }
}
