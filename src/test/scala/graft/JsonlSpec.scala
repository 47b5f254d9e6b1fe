package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Jsonl

class JsonlSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("jsonl roundtrip preserves the corpus byte-for-byte") {
    val dir = Files.createTempDirectory("jsonl").toString + "/docs"
    Jsonl.write(docs, dir)
    val back = Jsonl.readClean(spark, dir, docs.schema)
    assert(back.count() === docs.count())
    assert(back.select(docs.columns.map(col): _*).orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
    // gzip shards on disk
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), files.mkString(","))
  }

  test("malformed lines surface in corrupt_line instead of failing or vanishing") {
    val dir = Files.createTempDirectory("jsonl").toString
    val f = new java.io.File(dir, "part-0.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"doc_id": 1, "text": "good line"}""")
    w.println("""{"doc_id": 2, "text": "truncated...""")
    w.println("   ") // blank separator line — corrupt, NOT a phantom all-null doc
    w.println("""{"doc_id": 3, "text": "another good one"}""")
    w.close()
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")
    val all = Jsonl.read(spark, dir, schema)
    assert(all.count() === 4)
    assert(all.where(col(Jsonl.CorruptCol).isNotNull).count() === 2)
    val clean = Jsonl.readClean(spark, dir, schema)
    assert(clean.count() === 2)
    assert(clean.columns.toSeq === Seq("doc_id", "text"))
    assert(clean.where(col("doc_id").isNull).count() === 0)

    // the strict reader (the dump-load path) FAILS on the same input
    // instead of silently restoring fewer rows...
    val e = intercept[Exception] {
      Jsonl.readStrict(spark, dir, schema).count()
    }
    assert(e.getMessage != null)
    // ...and passes clean input through whole
    val cleanDir = Files.createTempDirectory("jsonl_ok").toString
    val w2 = new java.io.PrintWriter(new java.io.File(cleanDir, "part-0.json"))
    w2.println("""{"doc_id": 1, "text": "a"}""")
    w2.println("""{"doc_id": 2, "text": "b"}""")
    w2.close()
    assert(Jsonl.readStrict(spark, cleanDir, schema).count() === 2)
  }

  test("a schema already containing corrupt_line is rejected up front") {
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add(Jsonl.CorruptCol, "string")
    val e = intercept[IllegalArgumentException] {
      Jsonl.read(spark, "/nonexistent", schema)
    }
    assert(e.getMessage.contains(Jsonl.CorruptCol))
  }
}
