package graft

import java.nio.file.Files

import graft.cli.{DumpMain, LoadMain}

class CliSpec extends SparkSpec {

  test("dump/load CLI roundtrip with reference-style flags") {
    val tmp = Files.createTempDirectory("graft_cli").toString
    DumpMain.run(Seq(
      "--source", sfDir,
      "-o", s"$tmp/dump",
      "-f", "region",
      "-p", "orders:SELECT * FROM orders WHERE o_totalprice > 480000",
      "--fk", "orders.o_custkey=customer.c_custkey",
      "--fk", "customer.c_nationkey=nation.n_nationkey",
      "--fk", "nation.n_regionkey=region.r_regionkey",
      "--pk", "orders=o_orderkey",
      "-c", "snappy"), spark)

    LoadMain.run(Seq("-i", s"$tmp/dump", "--target", s"$tmp/loaded"), spark)

    val loadedOrders = spark.read.parquet(s"$tmp/loaded/orders.parquet")
    val expected = spark.read.parquet(s"$sfDir/orders.parquet")
      .where("o_totalprice > 480000")
    assert(loadedOrders.count() === expected.count())
    // FK closure pulled the referenced customers
    val custs = spark.read.parquet(s"$tmp/loaded/customer.parquet").count()
    assert(custs > 0)
    // sequence state restored
    val seqs = graft.sources.Dump.sequencesOf(spark, s"$tmp/loaded")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seqs("orders") === expected.agg(org.apache.spark.sql.functions
      .max("o_orderkey")).head().getLong(0))

    // truncate cleanup: reload over existing target succeeds and keeps counts
    LoadMain.run(Seq("-i", s"$tmp/dump", "--target", s"$tmp/loaded",
      "-m", "truncate"), spark)
    assert(spark.read.parquet(s"$tmp/loaded/orders.parquet").count() === expected.count())

    // recreate cleanup: target wiped then reloaded
    LoadMain.run(Seq("-i", s"$tmp/dump", "--target", s"$tmp/loaded",
      "-m", "recreate"), spark)
    assert(spark.read.parquet(s"$tmp/loaded/orders.parquet").count() === expected.count())
  }

  test("archived dump is one zip that loads back identically") {
    val tmp = Files.createTempDirectory("graft_cli_zip").toString
    DumpMain.run(Seq(
      "--source", sfDir,
      "-o", s"$tmp/dump",
      "-f", "region",
      "-p", "orders:SELECT * FROM orders WHERE o_totalprice > 480000",
      "--fk", "orders.o_custkey=customer.c_custkey",
      "--archive"), spark)
    assert(new java.io.File(s"$tmp/dump.zip").isFile)

    // load straight from the zip
    LoadMain.run(Seq("-i", s"$tmp/dump.zip", "--target", s"$tmp/loaded"), spark)
    val expected = spark.read.parquet(s"$sfDir/orders.parquet")
      .where("o_totalprice > 480000").count()
    assert(spark.read.parquet(s"$tmp/loaded/orders.parquet").count() === expected)
  }

  test("archive compression choice: entry methods, size ordering, stored round-trip") {
    val tmp = Files.createTempDirectory("graft_cli_zipc").toString
    // csv + no codec ⇒ compressible payload, so the ordering is visible
    DumpMain.run(Seq(
      "--source", sfDir,
      "-o", s"$tmp/dump",
      "-f", "region", "-f", "nation",
      "--format", "csv", "-c", "none",
      "--archive", "--archive-compression", "stored"), spark)
    val D = graft.sources.Dump
    D.archive(spark, s"$tmp/dump", s"$tmp/deflated.zip")
    D.archive(spark, s"$tmp/dump", s"$tmp/max.zip", "deflated:9")
    def entries(p: String): Seq[java.util.zip.ZipEntry] = {
      val zf = new java.util.zip.ZipFile(p)
      try {
        val it = zf.entries(); val b = Seq.newBuilder[java.util.zip.ZipEntry]
        while (it.hasMoreElements) b += it.nextElement()
        b.result()
      } finally zf.close()
    }
    // entry methods follow the mapping (≙ reference COMPRESSION_MAPPING)
    assert(entries(s"$tmp/dump.zip").forall(_.getMethod === java.util.zip.ZipEntry.STORED))
    assert(entries(s"$tmp/deflated.zip").forall(_.getMethod === java.util.zip.ZipEntry.DEFLATED))
    assert(entries(s"$tmp/max.zip").forall(_.getMethod === java.util.zip.ZipEntry.DEFLATED))
    // stored entries are byte-for-byte (compressed == uncompressed size);
    // deflated strictly shrinks the text payload; level 9 never loses to
    // the default level
    assert(entries(s"$tmp/dump.zip").forall(e => e.getCompressedSize === e.getSize))
    def len(p: String) = new java.io.File(p).length()
    assert(len(s"$tmp/dump.zip") > len(s"$tmp/deflated.zip"))
    assert(len(s"$tmp/max.zip") <= len(s"$tmp/deflated.zip"))
    // a stored archive loads back identically (CRC/size headers correct)
    LoadMain.run(Seq("-i", s"$tmp/dump.zip", "--target", s"$tmp/loaded"), spark)
    assert(spark.read.parquet(s"$tmp/loaded/region.parquet").count() ===
      spark.read.parquet(s"$sfDir/region.parquet").count())
    // unknown names and bad levels fail loudly
    assertThrows[IllegalArgumentException] {
      D.archive(spark, s"$tmp/dump", s"$tmp/x.zip", "bzip2")
    }
    assertThrows[IllegalArgumentException] {
      D.archive(spark, s"$tmp/dump", s"$tmp/x.zip", "deflated:12")
    }
  }

  test("schema-only dump writes DDL but no data") {
    val tmp = Files.createTempDirectory("graft_cli2").toString
    DumpMain.run(Seq(
      "--source", sfDir,
      "-o", s"$tmp/dump",
      "-f", "region",
      "--no-data"), spark)
    assert(new java.io.File(s"$tmp/dump/schema/region.sql").exists())
    assert(!new java.io.File(s"$tmp/dump/data/region").exists())
  }
}
