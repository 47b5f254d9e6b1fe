package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Catalog, TableGraph}
import graft.operators.Closure

/** What to dump — mirrors the reference's `dump()` signature
  * (xdump/base.py:87): whole tables, per-table partial selections, and
  * schema/data toggles. `format` is parquet (the 100 TB-sane archive) or
  * csv-with-header (the reference's wire format, xdump/base.py:197).
  */
final case class DumpSpec(
    fullTables: Seq[String] = Nil,
    partialTables: Map[String, DataFrame] = Map.empty,
    format: String = "parquet",
    dumpSchema: Boolean = true,
    dumpData: Boolean = true)

/** A consistent partial dump as a directory:
  *
  * {{{
  * <path>/manifest.json   — tables, load order, row counts, sequence state
  * <path>/schema/<t>.sql  — CREATE TABLE DDL per table (≙ pg_dump -s)
  * <path>/data/<t>/       — parquet (or CSV w/ header) per table
  * }}}
  *
  * The reference packs CSVs into one zip (xdump/base.py:100); a directory of
  * partitioned files is the distributed equivalent — each table writes in
  * parallel from every executor, no single-writer bottleneck.
  */
object Dump {

  /** Dump `spec` FK-closed: partial selections are widened with every
    * transitively referenced row (Closure.relatedData) before writing, so
    * the dump loads without FK violations — the reference's core guarantee.
    */
  def write(catalog: Catalog, spec: DumpSpec, path: String): Unit = {
    val closed = Closure.relatedData(catalog, spec.fullTables, spec.partialTables)
    val selections: Map[String, DataFrame] =
      spec.fullTables.map(t => t -> catalog.table(t)).toMap ++ closed

    if (spec.dumpSchema) writeSchema(catalog, selections.keys.toSeq.sorted, path)
    if (spec.dumpData) selections.foreach { case (t, df) =>
      val w = df.write.mode(SaveMode.Overwrite)
      spec.format match {
        case "csv" => w.option("header", "true").csv(s"$path/data/$t")
        case _ => w.parquet(s"$path/data/$t")
      }
    }
    writeManifest(catalog, selections, spec, path)
  }

  /** CREATE TABLE DDL per table — the `pg_dump -s` analog
    * (xdump/postgresql.py:129). */
  private def writeSchema(catalog: Catalog, tables: Seq[String], path: String): Unit =
    tables.foreach { t =>
      val ddl = s"CREATE TABLE $t (${catalog.table(t).schema.toDDL});"
      writeText(catalog.spark, s"$path/schema/$t.sql", ddl)
    }

  /** Manifest: load order (TableGraph), per-table row counts, and sequence
    * state — max(pk) per table, the analog of the reference's sequences
    * dump (xdump/postgresql.py:140), so a loader can resume id generation
    * past the loaded rows.
    */
  private def writeManifest(
      catalog: Catalog,
      selections: Map[String, DataFrame],
      spec: DumpSpec,
      path: String): Unit = {
    val order = TableGraph.loadOrder(selections.keys.toSeq, catalog.foreignKeys)
    val entries = order.map { t =>
      val df = selections(t)
      val pk = catalog.primaryKey(t).head
      val agg = df.agg(count(lit(1)).as("n"), max(col(pk).cast("long")).as("mx")).head()
      val rows = agg.getLong(0)
      val seq = if (agg.isNullAt(1)) 0L else agg.getLong(1)
      s"""    {"table": "$t", "rows": $rows, "sequence": $seq, "full": ${spec.fullTables.contains(t)}}"""
    }
    val manifest =
      s"""{
         |  "format": "${spec.format}",
         |  "load_order": [${order.map("\"" + _ + "\"").mkString(", ")}],
         |  "tables": [
         |${entries.mkString(",\n")}
         |  ]
         |}""".stripMargin
    writeText(catalog.spark, s"$path/manifest.json", manifest)
  }

  /** Reads a dump back: tables as DataFrames keyed by name, in manifest load
    * order (≙ xdump/base.py:220 `load`). CSV reads use the dumped DDL for
    * exact types — header-only inference would widen everything to string.
    */
  def load(spark: SparkSession, path: String): Seq[(String, DataFrame)] = {
    val manifest = readText(spark, s"$path/manifest.json")
    val format = """"format":\s*"(\w+)"""".r.findFirstMatchIn(manifest).map(_.group(1)).getOrElse("parquet")
    val order = """"load_order":\s*\[([^\]]*)\]""".r.findFirstMatchIn(manifest)
      .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    order.map { t =>
      val df = format match {
        case "csv" =>
          val ddl = readText(spark, s"$path/schema/$t.sql")
            .stripPrefix(s"CREATE TABLE $t (").stripSuffix(");")
          spark.read.option("header", "true").schema(ddl).csv(s"$path/data/$t")
        case _ => spark.read.parquet(s"$path/data/$t")
      }
      t -> df
    }
  }

  /** Loads a dump into a target directory of parquet tables — the offline
    * analog of loading into a database. `truncate` first clears the target
    * tables (≙ xdump/base.py:214); loading follows manifest order so a
    * future FK-enforcing sink would also be satisfied.
    */
  def loadInto(spark: SparkSession, dumpPath: String, targetDir: String): Unit =
    load(spark, dumpPath).foreach { case (t, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"$targetDir/$t.parquet")
    }

  // Small text-file helpers via the Hadoop FS API (works on any supported
  // filesystem: local, HDFS, S3A...).
  private def writeText(spark: SparkSession, path: String, text: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  private def readText(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }
}
