package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunk, Similarity, TextAnalysis}

/** Round-6 operator specs: chunking, packing, unigram LM scoring, PII
  * scrubbing and semantic dedup.
  */
class ChunkSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("docChunk covers every character and respects window/overlap") {
    val window = 120; val overlap = 20; val step = window - overlap
    val chunks = Chunk.docChunk(docs, window, overlap)
    // no chunk exceeds the window
    assert(chunks.where(col("n_chars_chunk") > window).count() === 0)
    // consecutive chunks start exactly `step` apart
    assert(chunks
      .where(col("chunk_start") =!= col("chunk_id") * step + 1).count() === 0)
    // the last chunk of every doc reaches the doc's final character
    val lastReach = chunks.groupBy("doc_id")
      .agg(max(col("chunk_start") + col("n_chars_chunk") - 1).as("covered"))
      .join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
      .where(col("covered") =!= col("len"))
    assert(lastReach.count() === 0)
    // reassembling chunk 0 + each later chunk's non-overlapped suffix
    // reproduces every document byte-for-byte
    val rebuilt = chunks
      .withColumn("piece",
        when(col("chunk_id") === 0, col("chunk_text"))
          .otherwise(col("chunk_text").substr(lit(overlap + 1), lit(window))))
      .groupBy("doc_id")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("chunk_id"), col("piece")))),
        s => s.getField("piece")), "").as("glued"))
    val bad = rebuilt.join(docs, "doc_id")
      .where(col("glued") =!= col("text")).count()
    assert(bad === 0)
  }

  test("docChunk reassembles exactly across window/overlap combos and edge lengths") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // edge lengths around every boundary: empty, single char, window±1,
    // step multiples, plus random sizes; mixed-width chars included
    val lengths = Seq(0, 1, 39, 40, 41, 79, 80, 81, 100, 119, 120, 121, 200) ++
      Seq.fill(20)(rnd.nextInt(400))
    val alphabet = "ab é≈語 xyz".toCharArray
    val docs = lengths.zipWithIndex.map { case (len, i) =>
      (i.toLong, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    for ((window, overlap) <- Seq((120, 20), (40, 0), (41, 40), (7, 3))) {
      val step = window - overlap
      val chunks = Chunk.docChunk(docs, window, overlap)
      assert(chunks.where(col("n_chars_chunk") > window).count() === 0,
        s"overlong chunk at window=$window overlap=$overlap")
      val rebuilt = chunks
        .withColumn("piece",
          when(col("chunk_id") === 0, col("chunk_text"))
            .otherwise(col("chunk_text").substr(lit(overlap + 1), lit(window))))
        .groupBy("doc_id")
        .agg(array_join(transform(
          sort_array(collect_list(struct(col("chunk_id"), col("piece")))),
          s => s.getField("piece")), "").as("glued"))
      val bad = rebuilt.join(docs, "doc_id")
        .where(col("glued") =!= col("text")).count()
      assert(bad === 0, s"reassembly failed at window=$window overlap=$overlap")
      // chunk count matches the closed form: ceil(max(len-overlap,1) / step)
      val counts = chunks.groupBy("doc_id").count()
        .join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
        .where(col("count") =!=
          ceil(greatest(col("len") - overlap, lit(1)).cast("double") / step))
      assert(counts.count() === 0, s"chunk count off at window=$window overlap=$overlap")
    }
  }

  test("docChunk is map-side only — no shuffle in the plan") {
    val plan = Chunk.docChunk(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("packSequences packs every token exactly once per bucket stream") {
    val budget = 256
    val packed = Chunk.packSequences(docs, budget = budget, buckets = 8)
    // offsets stay inside the budget
    assert(packed.where(col("seq_offset") < 0 || col("seq_offset") >= budget).count() === 0)
    // a doc spans sequences seq_first..seq_last consistently with its size
    assert(packed.where(col("seq_last") < col("seq_first")).count() === 0)
    assert(packed.where(
      floor((col("seq_offset") + col("n_tokens") - 1) / budget) + col("seq_first")
        =!= col("seq_last")).count() === 0)
    // within a bucket, consecutive docs tile without gaps: sum of tokens =
    // last doc's end position
    val tiles = packed.groupBy("bucket")
      .agg(sum("n_tokens").as("tot"),
        max(col("seq_last") * budget +
          pmod(col("seq_offset") + col("n_tokens") - 1, lit(budget)) + 1)
          .as("reach"))
      .where(col("tot") =!= col("reach"))
    assert(tiles.count() === 0)
    // deterministic under repartitioning
    val a = packed.orderBy("doc_id").collect()
    val b = Chunk.packSequences(docs.repartition(7), budget = budget, buckets = 8)
      .orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("trainShuffle is a deterministic partition-parallel permutation") {
    val shards = 8
    val out = Chunk.trainShuffle(docs, shards = shards)
    val n = docs.count()
    // every doc appears exactly once, shards are in range
    assert(out.count() === n)
    assert(out.select("doc_id").distinct().count() === n)
    assert(out.where(col("shard") < 0 || col("shard") >= shards).count() === 0)
    // positions are a gapless 1..size_of_shard sequence per shard
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("sz"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("dp"))
      .where(col("mx") =!= col("sz") || col("mn") =!= 1 || col("dp") =!= col("sz"))
    assert(bad.count() === 0)
    // deterministic under repartitioning; a different salt permutes
    val a = out.orderBy("doc_id").collect()
    val b = Chunk.trainShuffle(docs.repartition(5), shards = shards)
      .orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
    val salted = Chunk.trainShuffle(docs, shards = shards, salt = "epoch2")
      .orderBy("doc_id").collect()
    assert(a.toSeq !== salted.toSeq)
    // the plan is shard-parallel: no global single-partition sort window
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global window:\n$plan")
  }

  test("writeTrainShards lays out per-shard files in epoch order, byte-identical across runs") {
    val shards = 4
    def freshDir() = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val (out1, out2) = (freshDir(), freshDir())
    Chunk.writeTrainShards(docs, out1, shards = shards, salt = "epoch0")
    Chunk.writeTrainShards(docs, out2, shards = shards, salt = "epoch0")
    def dataFiles(dir: String): Map[Int, java.io.File] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
        .map { d =>
          val files = d.listFiles().filter(f => f.getName.endsWith(".parquet"))
          // the writer's contract: the rank window's own exchange means one
          // task owns a shard, so each directory holds exactly ONE file
          assert(files.length === 1, s"${d.getName}: ${files.length} files")
          d.getName.stripPrefix("shard=").toInt -> files.head
        }.toMap
    val (files1, files2) = (dataFiles(out1), dataFiles(out2))
    assert(files1.keySet === (0 until shards).toSet)
    // the re-read corpus is exactly trainOrder's assignment
    val back = spark.read.parquet(out1)
    val expected = Chunk.trainOrder(docs, shards = shards, salt = "epoch0")
      .select(col("doc_id"), col("shard"), col("pos"))
    assert(back.count() === docs.count())
    assert(back.select(col("doc_id"), col("shard").cast("int"), col("pos"))
      .except(expected).count() === 0)
    // within each shard FILE, rows sit in epoch order: pos is 1..n as stored
    files1.foreach { case (shard, f) =>
      val pos = spark.read.parquet(f.getPath).select("pos").collect().map(_.getLong(0))
      assert(pos.toSeq === (1L to pos.length).toSeq, s"shard $shard out of order")
    }
    // same salt ⇒ byte-identical artifacts: an epoch is replayable from
    // the files alone, and a re-run is provably the same epoch
    files1.foreach { case (shard, f1) =>
      val b1 = java.nio.file.Files.readAllBytes(f1.toPath)
      val b2 = java.nio.file.Files.readAllBytes(files2(shard).toPath)
      assert(java.util.Arrays.equals(b1, b2), s"shard $shard differs between runs")
    }
    // a different salt is a different permutation of the same corpus
    val out3 = freshDir()
    Chunk.writeTrainShards(docs, out3, shards = shards, salt = "epoch1")
    val b3 = spark.read.parquet(out3)
    assert(b3.count() === docs.count())
    assert(b3.select("doc_id", "shard", "pos").except(
      back.select("doc_id", "shard", "pos")).count() > 0)
  }

  test("trainOrder refuses payload columns that collide with its outputs") {
    import spark.implicits._
    // shard/pos are trainOrder's OUTPUT columns — a payload already
    // carrying either must fail loudly instead of being clobbered
    val withShard = docs.withColumn("shard", lit(99))
    val e = intercept[IllegalArgumentException](Chunk.trainOrder(withShard))
    assert(e.getMessage.contains("shard"))
    val withPos = docs.withColumn("pos", lit(0L))
    assert(intercept[IllegalArgumentException](Chunk.trainOrder(withPos))
      .getMessage.contains("pos"))
    // a payload column named "h" (the old scratch name) survives intact
    val withH = docs.withColumn("h", lit("payload"))
    val out = Chunk.trainOrder(withH, shards = 4)
    assert(out.columns.contains("h"))
    assert(out.where(col("h") =!= "payload").count() === 0)
  }

  test("gopherQuality applies the canonical rule battery") {
    import spark.implicits._
    val goodText =
      ("the quick brown network processes tokens and it is running in production " * 6).trim
    val df = Seq(
      (1L, goodText),                                 // passes everything
      (2L, "too short to pass the word count"),       // n_words < 50
      (3L, ("- bullet one\n" * 20) + "- and the final of bullets\n" +
        (1 to 60).map(i => s"word$i").mkString(" ")), // 21 of 22 lines are bullets
      (4L, (1 to 60).map(_ => "12345").mkString(" ")))// no alphabetic words, no stopwords
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(df).orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("passes_gopher"))
    assert(!out(1).getAs[Boolean]("passes_gopher") &&
      out(1).getAs[Long]("n_words") < 50)
    assert(!out(2).getAs[Boolean]("passes_gopher") &&
      out(2).getAs[Double]("frac_bullet_lines") > 0.9)
    assert(!out(3).getAs[Boolean]("passes_gopher") &&
      out(3).getAs[Double]("frac_alpha_words") === 0.0 &&
      out(3).getAs[Long]("n_stop_distinct") === 0L)
  }

  test("unigramLm scores rare-token docs above common-token docs") {
    import spark.implicits._
    val corpus = (Seq.fill(50)("the the the") :+ "zyzzyva qwerty")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val scored = TextAnalysis.unigramLm(corpus).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // the all-"the" docs share one low score; the rare-token doc is higher
    assert(scored(50L) > scored(0L))
    // hapax ratio: the rare doc is 100% hapax, the common docs 0%
    val hapax = TextAnalysis.unigramLm(corpus).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(hapax(50L) === 1.0 && hapax(0L) === 0.0)
  }

  test("tfidfTopK surfaces doc-specific terms over corpus-common ones") {
    import spark.implicits._
    val corpus = ((1 to 20).map(i => (i.toLong, "common words everywhere always")) :+
      (99L, "common quasar pulsar quasar")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopK(corpus, k = 2)
      .where(col("doc_id") === 99L).orderBy("rank").collect()
    // quasar (tf=2, df=1) ranks above pulsar (tf=1, df=1); "common" (df=21)
    // has idf 0 and never makes the top slots
    assert(top.map(_.getAs[String]("term")).toSeq === Seq("quasar", "pulsar"))
    assert(top.head.getAs[Long]("tf") === 2L)
    // every doc gets at most k rows, ranks are 1..k
    val all = TextAnalysis.tfidfTopK(corpus, k = 2)
    assert(all.groupBy("doc_id").count().where(col("count") > 2).count() === 0)
    assert(all.where(col("rank") < 1 || col("rank") > 2).count() === 0)
  }

  test("piiScrub redacts emails, IPs and phones and counts them") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "from 192.168.0.1 and 10.0.0.255"),
      (3L, "call 555-867-5309 or 555.867.5309"),
      (4L, "nothing personal here")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(df).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_emails") === 1)
    assert(out(0).getAs[String]("clean_text") === "mail [EMAIL] now")
    assert(out(1).getAs[Long]("n_ips") === 2)
    assert(out(1).getAs[String]("clean_text") === "from [IP] and [IP]")
    assert(out(2).getAs[Long]("n_phones") === 2)
    assert(out(2).getAs[String]("clean_text") === "call [PHONE] or [PHONE]")
    assert(out(3).getAs[String]("clean_text") === "nothing personal here")
    assert(out(3).getAs[Long]("n_emails") + out(3).getAs[Long]("n_ips") +
      out(3).getAs[Long]("n_phones") === 0)
  }

  test("mixSample reshapes domain proportions and drops unweighted strata") {
    val out = TextAnalysis.mixSample(docs,
      weights = Map("en" -> 80, "de" -> 40), byCol = "lang")
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // unweighted strata vanish entirely
    assert(kept.keySet.subsetOf(Set("en", "de")))
    // keep rates land near the stratum targets (loose bounds, small data)
    val enRate = kept.getOrElse("en", 0L).toDouble / total("en")
    val deRate = kept.getOrElse("de", 0L).toDouble / total("de")
    assert(enRate > 0.6 && enRate <= 1.0, s"en rate $enRate")
    assert(deRate > 0.2 && deRate < 0.6, s"de rate $deRate")
    // deterministic: same result twice
    assert(out.orderBy("doc_id").collect().toSeq ===
      TextAnalysis.mixSample(docs, Map("en" -> 80, "de" -> 40), byCol = "lang")
        .orderBy("doc_id").collect().toSeq)
    // within a kept stratum, the kept set agrees with a plain hashSample at
    // the same pct and salt: the filter is the same hash, stratum-gated
    val en80 = TextAnalysis.hashSample(docs.where(col("lang") === "en"),
      pct = 80, salt = "mix").select("doc_id")
    assert(out.where(col("lang") === "en").select("doc_id")
      .except(en80).count() === 0)
  }

  test("semanticDedup marks within-cell near-dups against the exact baseline") {
    val res = Similarity.semanticDedup(emb, threshold = 0.4, centEvery = 40)
    assert(res.count() === emb.count())
    // dup_of is an earlier vector in the SAME cell
    val cellOf = res.select(col("vec_id").as("dup_of"), col("cell_id").as("cell_of_dup"))
    val bad = res.where(col("is_dup"))
      .join(cellOf, "dup_of")
      .where(col("dup_of") >= col("vec_id") || col("cell_of_dup") =!= col("cell_id"))
    assert(bad.count() === 0)
    // every marked pair really clears the threshold (verify via exact pairs)
    val exact = Similarity.embedCosineDup(emb, threshold = 0.4, exact = true)
      .select(col("id_a"), col("id_b"))
    val marked = res.where(col("is_dup"))
      .select(col("dup_of").as("id_a"), col("vec_id").as("id_b"))
    assert(marked.except(exact).count() === 0)
    // non-trivial on the test corpus: some dups found
    assert(res.where(col("is_dup")).count() > 0)
  }

  test("clusterSample caps every cell at perCell with deterministic picks") {
    val sampled = Similarity.clusterSample(emb, perCell = 8, centEvery = 40)
    // cap respected, picks are 1..perCell per cell
    assert(sampled.groupBy("cell_id").count().where(col("count") > 8).count() === 0)
    assert(sampled.where(col("pick") < 1 || col("pick") > 8).count() === 0)
    // cells agree with semanticDedup's assignment
    val cells = Similarity.semanticDedup(emb, centEvery = 40)
      .select("vec_id", "cell_id")
    assert(sampled.select("vec_id", "cell_id").except(cells).count() === 0)
    // deterministic under repartitioning
    val again = Similarity.clusterSample(emb.repartition(7), perCell = 8, centEvery = 40)
      .orderBy("vec_id").collect()
    assert(sampled.orderBy("vec_id").collect().toSeq === again.toSeq)
    // a full cell keeps exactly 8
    assert(sampled.groupBy("cell_id").count().where(col("count") === 8).count() > 0)
  }

  test("semanticDedup assignment matches annIvf cell semantics") {
    // every vector lands in exactly one cell, and cells are centroid ids
    val res = Similarity.semanticDedup(emb, threshold = 0.4, centEvery = 40)
    val cents = emb.where(col("vec_id") % 40 === 1)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val cells = res.select("cell_id").distinct().collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf(cents))
  }

  test("semanticDedup and clusterSample accept a trained codebook with intact invariants") {
    val trained = Similarity.trainIvfCodebook(emb, k = 13)
    val trainedIds = trained.map(_._1).toSet

    // semanticDedup: cells come from the trained codebook, every marked
    // pair still clears the exact-cosine threshold, full corpus covered
    val res = Similarity.semanticDedup(emb, threshold = 0.4, codebook = Some(trained))
    assert(res.count() === emb.count())
    assert(res.select("cell_id").distinct().collect()
      .map(_.getLong(0)).toSet.subsetOf(trainedIds))
    val exact = Similarity.embedCosineDup(emb, threshold = 0.4, exact = true)
      .select(col("id_a"), col("id_b"))
    val marked = res.where(col("is_dup"))
      .select(col("dup_of").as("id_a"), col("vec_id").as("id_b"))
    assert(marked.except(exact).count() === 0)

    // clusterSample: same codebook ⇒ same cells as semanticDedup, caps hold
    val sampled = Similarity.clusterSample(emb, perCell = 8, codebook = Some(trained))
    assert(sampled.groupBy("cell_id").count().where(col("count") > 8).count() === 0)
    assert(sampled.select("vec_id", "cell_id")
      .except(res.select("vec_id", "cell_id")).count() === 0)

    // a zero-norm centroid is rejected at plan time
    assertThrows[IllegalArgumentException] {
      Similarity.clusterSample(emb,
        codebook = Some(Array((0L, Array(0.0, 0.0)))))
    }
  }
}
