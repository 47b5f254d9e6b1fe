package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) corpus source/sink — the de-facto wire
  * format of LLM training corpora (one document object per line). Thin,
  * opinionated wrappers over Spark's native json reader/writer:
  *
  * - Reading REQUIRES an explicit schema: Spark's schema inference scans
  *   the whole input once before the real read — a full extra pass over
  *   100 TB — and silently widens types on dirty lines. With a schema the
  *   read is a single streaming pass and partitions by file splits
  *   (gzip'd inputs are splittable per FILE, not within — shard corpora
  *   into many files, which every serious jsonl corpus already does).
  * - Malformed lines land in a `corrupt_line` column instead of failing
  *   the job — corpus dumps always carry a few broken lines, and
  *   dropping them silently (DROPMALFORMED) hides data loss; callers
  *   filter and count them explicitly. The read is `text` + `from_json`
  *   rather than the raw json reader, because Spark forbids queries
  *   touching only the json reader's INTERNAL corrupt-record column —
  *   a computed column has no such restriction (and the parse stays one
  *   map-side pass either way).
  * - Writing defaults to gzip compression; each task writes one shard —
  *   the layout that reads back in parallel.
  */
object Jsonl {

  val CorruptCol = "corrupt_line"

  /** Read a jsonl corpus at `path` with the given schema; unparseable
    * lines yield null schema fields and carry the raw line in
    * [[CorruptCol]] (null for well-formed rows).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already contains a '$CorruptCol' field — it would collide with " +
        s"the corrupt-line channel; rename the data column")
    // from_json's own corrupt-record channel: malformed lines parse to a
    // struct whose only non-null field is the raw line.
    val withCorrupt = schema.add(CorruptCol, "string")
    spark.read.text(path)
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)).as("j"),
        col("value"))
      // blank/whitespace lines parse to a NULL struct (not a populated
      // corrupt field) — without the fallback they'd pass readClean as
      // phantom all-null documents
      .select(schema.fieldNames.map(f => col(s"j.`$f`")) :+
        when(col("j").isNull, col("value"))
          .otherwise(col(s"j.`$CorruptCol`")).as(CorruptCol): _*)
  }

  /** The well-formed rows only. */
  def readClean(spark: SparkSession, path: String, schema: StructType): DataFrame =
    read(spark, path, schema).where(col(CorruptCol).isNull).drop(CorruptCol)

  /** Like [[readClean]], but any corrupt line FAILS the job instead of
    * being dropped — for sources that are well-formed by contract (a
    * dump's own shards), where a malformed line means a truncated or
    * partially-written file and silently restoring fewer rows is the
    * worst outcome. The guard is a filter predicate (never pruned, stays
    * distributed): `assert_true` raises with the offending line, and the
    * coalesce-to-true keeps every surviving row.
    */
  def readStrict(spark: SparkSession, path: String, schema: StructType): DataFrame =
    read(spark, path, schema)
      .where(coalesce(
        assert_true(col(CorruptCol).isNull,
          concat(lit(s"corrupt jsonl line in $path: "),
            substring(col(CorruptCol), 1, 200))).cast("boolean"),
        lit(true)))
      .drop(CorruptCol)

  /** Write `df` as jsonl shards under `path` (one file per task). */
  def write(df: DataFrame, path: String, compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)
}
