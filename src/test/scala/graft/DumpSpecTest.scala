package graft

import org.apache.spark.sql.functions._

import graft.core.Catalog
import graft.sources.{Dump, DumpSpec}

class DumpSpecTest extends SparkSpec {
  private lazy val cat = Catalog.tpch(spark, sfDir)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_test").toString

  test("parquet dump is FK-closed and roundtrips") {
    val dir = tmp()
    val seed = cat.table("orders").where(col("o_totalprice") > 400000)
    Dump.write(cat, DumpSpec(
      fullTables = Seq("region"),
      partialTables = Map("orders" -> seed)), dir)

    val loaded = Dump.load(spark, dir).toMap
    // closure pulled orders → customer → nation
    assert(loaded.keySet === Set("region", "orders", "customer", "nation"))
    assert(loaded("region").count() === 5)
    assert(loaded("orders").count() === seed.count())
    // referential consistency: every o_custkey resolves
    val dangling = loaded("orders").select(col("o_custkey").as("k")).distinct()
      .join(loaded("customer"), col("k") === col("c_custkey"), "left_anti")
    assert(dangling.count() === 0)
    // manifest load order is dependency-first
    val order = Dump.load(spark, dir).map(_._1)
    assert(order.indexOf("nation") < order.indexOf("customer"))
    assert(order.indexOf("customer") < order.indexOf("orders"))
  }

  test("many full tables spool concurrently with correct manifest metrics") {
    val dir = tmp()
    Dump.write(cat, DumpSpec(
      fullTables = Seq("region", "nation", "supplier", "part", "documents")), dir)
    val manifest = Dump.readManifest(spark, dir)
    // every table written whole, counts recorded by the concurrent writes
    Seq("region", "nation", "supplier", "part", "documents").foreach { t =>
      assert(manifest.rows(t) === cat.table(t).count(), s"row count for $t")
      assert(spark.read.parquet(s"$dir/data/$t").count() === cat.table(t).count())
    }
    // sequence state rode each concurrent write's observe()
    assert(manifest.sequences("region") === 4)
  }

  test("csv dump preserves schema via dumped DDL") {
    val dir = tmp()
    Dump.write(cat, DumpSpec(
      fullTables = Seq("nation"),
      format = "csv"), dir)
    val loaded = Dump.load(spark, dir).toMap
    val orig = cat.table("nation")
    assert(loaded("nation").schema === orig.schema)
    assert(loaded("nation").count() === orig.count())
  }

  test("jsonl dump roundtrips rows and schema with gzip shards") {
    val dir = tmp()
    Dump.write(cat, DumpSpec(
      fullTables = Seq("nation", "region"),
      format = "jsonl",
      compression = "gzip"), dir)
    val files = new java.io.File(s"$dir/data/nation").listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), s"expected gzip parts, got ${files.toSeq}")
    val loaded = Dump.load(spark, dir).toMap
    for (t <- Seq("nation", "region")) {
      val orig = cat.table(t)
      assert(loaded(t).schema === orig.schema)
      assert(loaded(t).orderBy(orig.columns.head).collect().toSeq ===
        orig.orderBy(orig.columns.head).collect().toSeq)
    }
  }

  test("orc dump roundtrips rows and schema with zstd shards") {
    val dir = tmp()
    Dump.write(cat, DumpSpec(
      fullTables = Seq("nation", "region"),
      format = "orc",
      compression = "zstd"), dir)
    val files = new java.io.File(s"$dir/data/nation").listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".zstd.orc")), s"expected zstd orc parts, got ${files.toSeq}")
    val loaded = Dump.load(spark, dir).toMap
    for (t <- Seq("nation", "region")) {
      val orig = cat.table(t)
      assert(loaded(t).schema === orig.schema)
      assert(loaded(t).orderBy(orig.columns.head).collect().toSeq ===
        orig.orderBy(orig.columns.head).collect().toSeq)
    }
  }

  test("csv dump honors the compression option (gzip) and roundtrips") {
    val dir = tmp()
    Dump.write(cat, DumpSpec(
      fullTables = Seq("nation"),
      format = "csv",
      compression = "gzip"), dir)
    val files = new java.io.File(s"$dir/data/nation").listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".csv.gz")), s"expected gzip parts, got ${files.toSeq}")
    val loaded = Dump.load(spark, dir).toMap
    assert(loaded("nation").count() === cat.table("nation").count())
  }

  test("loadInto writes target tables readable as parquet") {
    val dir = tmp()
    Dump.write(cat, DumpSpec(fullTables = Seq("region", "nation")), s"$dir/d")
    Dump.loadInto(spark, s"$dir/d", s"$dir/t")
    assert(spark.read.parquet(s"$dir/t/nation.parquet").count() === 25)
  }

  test("a vanished dump shard aborts the load instead of restoring fewer rows") {
    val dir = tmp()
    Dump.write(cat, DumpSpec(fullTables = Seq("region", "nation")), s"$dir/d")
    // simulate a truncated dump: overwrite nation's data with a 5-row
    // subset (the remainder reads back cleanly in any format — only the
    // manifest's write-time count knows rows are missing)
    cat.table("nation").limit(5).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/d/data/nation")

    val e = intercept[RuntimeException] {
      Dump.loadInto(spark, s"$dir/d", s"$dir/t")
    }
    assert(e.getMessage.contains("manifest recorded"), e.getMessage)

    // the JDBC load path verifies identically
    val db = java.nio.file.Files.createTempDirectory("graft_derby_vc").toString + "/db"
    val cfg = graft.sources.JdbcConfig(
      url = s"jdbc:derby:$db;create=true", user = "app", password = "app",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
    val e2 = intercept[RuntimeException] {
      Dump.loadIntoJdbc(spark, s"$dir/d", cfg)
    }
    assert(e2.getMessage.contains("manifest recorded"), e2.getMessage)
  }

  test("splitSqlStatements: semicolons inside quoted regions do not split") {
    // the replay splitter must survive user-authored view/CHECK text —
    // literals with ';', escaped quotes, quoted identifiers
    assert(Dump.splitSqlStatements(
      "CREATE VIEW v AS SELECT * FROM t WHERE tag = 'a;b';\n" +
        "ALTER TABLE t ADD CONSTRAINT c CHECK (s IN ('x;y', 'it''s;ok'));")
      === Seq(
        "CREATE VIEW v AS SELECT * FROM t WHERE tag = 'a;b'",
        "ALTER TABLE t ADD CONSTRAINT c CHECK (s IN ('x;y', 'it''s;ok'))"))
    assert(Dump.splitSqlStatements("""SELECT 1 AS "a;b"; SELECT 2""")
      === Seq("""SELECT 1 AS "a;b"""", "SELECT 2"))
    // plain machine-generated DDL splits exactly as before
    assert(Dump.splitSqlStatements("A;\nB;\n\nC;") === Seq("A", "B", "C"))
    assert(Dump.splitSqlStatements("") === Seq.empty)
    // an unterminated literal keeps the tail intact rather than splitting
    assert(Dump.splitSqlStatements("SELECT 'a;b") === Seq("SELECT 'a;b"))
  }

  test("splitColumnList: quoted PK column names survive embedded commas") {
    // quoted-identifier support must reach past the classifier (r19
    // ADVICE): PRIMARY KEY ("a,b", c) is one quoted column + one bare,
    // not three comma fragments producing broken NOT NULL DDL
    assert(Dump.splitColumnList("\"a,b\", c") === Seq("\"a,b\"", "c"))
    assert(Dump.splitColumnList("id") === Seq("id"))
    assert(Dump.splitColumnList("a, b ,c") === Seq("a", "b", "c"))
    assert(Dump.splitColumnList("\"weird, name\"") === Seq("\"weird, name\""))
    assert(Dump.splitColumnList("\"q\", \"r,s\", t")
      === Seq("\"q\"", "\"r,s\"", "t"))
    // unbalanced quotes fail loudly instead of emitting broken DDL
    intercept[IllegalArgumentException] {
      Dump.splitColumnList("\"open, never closed")
    }
  }
}
