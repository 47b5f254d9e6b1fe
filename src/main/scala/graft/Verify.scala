package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Iteration aid (mirrors Bench): SPARK_GRAFT_VERIFY_ONLY=q1,q2 restricts
    // the dump; oracle_sql.json still carries every entry for the driver.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY").map(_.split(",").toSet)
    // A throwing query must NOT just vanish from the output keyset (that is
    // how a 3-query regression once hid for a full round): record every
    // failure as an explicit artifact — a per-query marker file plus an
    // aggregate failures.json — so a broken query surfaces loudly.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
        System.err.println(s"[verify] $name failed: $msg")
        failures(name) = msg
        Files.writeString(Paths.get(s"$outDir/$name._FAILED"), msg)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Always written (possibly empty {}) so its absence vs emptiness is
    // never ambiguous to the driver or a human diffing rounds.
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/failures.json"), failJson)
    // Machine-readable counts — the docs regenerate their coverage line
    // from this (scripts/update_counts.py) instead of hand-maintaining
    // numbers that drift.
    val qNames = SparkEntry.queries.keySet
    val rowsOnly = (qNames -- SparkEntry.oracleSql.keySet).toSeq.sorted
    val summary = Seq(
      s"${q("queries")}: ${qNames.size}",
      s"${q("oracles")}: ${SparkEntry.oracleSql.size}",
      s"${q("rows_only")}: ${rowsOnly.map(q).mkString("[", ",", "]")}",
      s"${q("failed")}: ${failures.keys.toSeq.sorted.map(q).mkString("[", ",", "]")}")
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_summary.json"), summary)
    spark.stop()
  }
}
