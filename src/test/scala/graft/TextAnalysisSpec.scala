package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("tokenCount counts whitespace and lexer tokens") {
    val row = TextAnalysis.tokenCount(docs).orderBy("doc_id").head()
    assert(row.getAs[Long]("ws_tokens") > 0)
    // every whitespace token is at least one lexer token
    val bad = TextAnalysis.tokenCount(docs)
      .where(col("bpe_tokens") < col("ws_tokens")).count()
    assert(bad === 0)
  }

  test("qualityScore ratios are bounded") {
    val df = TextAnalysis.qualityScore(docs)
    assert(df.where(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() === 0)
    assert(df.where(col("n_tokens") === 0).count() === 0)
  }

  test("langId emits a prediction for every doc with fixed vocabulary") {
    val df = TextAnalysis.langId(docs)
    assert(df.count() === docs.count())
    val langs = df.select("lang_pred").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr", "zh", "und")))
  }

  test("dedupExact groups identical texts under min doc_id") {
    val dup = docs.limit(5).union(docs.limit(5)) // force exact duplicates
    val res = TextAnalysis.dedupExact(dup)
    assert(res.count() === 5)
    assert(res.where(col("n_copies") === 2).count() === 5)
  }

  test("docFingerprint is content-determined") {
    val a = TextAnalysis.docFingerprint(docs).orderBy("doc_id").collect()
    val b = TextAnalysis.docFingerprint(docs.repartition(7)).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq) // partitioning-independent
  }
}
