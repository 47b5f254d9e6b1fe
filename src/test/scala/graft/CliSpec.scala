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
