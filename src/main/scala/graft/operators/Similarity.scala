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
    * double is bitwise identical in both engines.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  private def normalized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), vec(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))

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

  /** Pseudo-random hyperplane weight for (plane p, dimension d), derived
    * from the shared md5 hash so both engines draw the same planes:
    * uniform on [-1, 1] in steps of 1e-3.
    */
  private def planeWeight(p: Column, d: Column): Column =
    (TextAnalysis.seededHash(concat_ws("|", lit("plane"), p.cast("string")), d.cast("string"))
      % 2001 - 1000) / lit(1000.0)

  /** Sign-random-projection bucket key: one bit per hyperplane
    * (sign of v·w_p), concatenated to a string key. `planes` bits ⇒
    * 2^planes buckets.
    */
  def lshBucket(v: Column, planes: Int): Column =
    concat_ws("", transform(sequence(lit(0), lit(planes - 1)), p => {
      val d = aggregate(sequence(lit(1), size(v)), lit(0.0),
        (acc, i) => acc + element_at(v, i) * planeWeight(p, i))
      when(d >= 0, lit("1")).otherwise(lit("0"))
    }))

  /** LSH-bucketed ANN: same contract as `annTopK` but candidates are
    * restricted to the query's sign-projection bucket. The cross product
    * becomes an equi-join on the bucket key — the plan that survives
    * 100 TB (shuffle O(rows), verify O(bucket²)). Recall is probabilistic:
    * vectors in neighboring buckets are unseen (by design; add multi-probe
    * for higher recall).
    */
  def annLsh(emb: DataFrame, queryFilter: Column, k: Int = 10, planes: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = normalized(emb).withColumn("bucket", lshBucket(col("v"), planes))
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
}
