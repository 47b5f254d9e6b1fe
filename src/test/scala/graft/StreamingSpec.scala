package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingHourly

class StreamingSpec extends SparkSpec {

  test("streaming hourly agg matches the batch twin on the same events") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // route through the Catalog: it normalizes either generator timestamp
    // flavor (nanos-as-long / timestamp[us]) to epoch-nanos LONG
    val batch = graft.core.Catalog.tpch(spark, sfDir).table("events")
      .select(col("ts"), col("event_type"), col("value"))
    val rows = batch.limit(2000)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

    val stream = MemoryStream[(Long, String, Double)]
    stream.addData(rows.toSeq)
    val q = StreamingHourly.hourlyAgg(stream.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hourly_stream")
      .orderBy("hour_start", "event_type").collect()
    val want = StreamingHourly.hourlyAgg(
        spark.createDataFrame(rows.toSeq).toDF("ts", "event_type", "value"))
      .orderBy("hour_start", "event_type").collect()
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
  }

  test("streaming clean gates quality, dedups in-horizon, samples deterministically") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val goodA = "the quick brown fox jumps over the lazy dog today"
    val goodB = "a slow green turtle walks under the bright warm sun"
    val stream = MemoryStream[(Long, Long, String)]
    val q = graft.streaming.StreamingClean.cleanStream(
        stream.toDF().toDF("ts", "doc_id", "text"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("clean_stream")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        (100L, 1L, goodA),   // quality ok, first of its digest
        (150L, 2L, "short"), // fails the quality gate
        (200L, 3L, goodA),   // in-horizon duplicate of 1 → dropped
        (250L, 4L, goodB)))  // quality ok
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("clean_stream").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got === Set(1L, 4L))

    // the sample stage is the SAME deterministic filter as the batch
    // operator: pct=50 keeps exactly the ids batch hashSample keeps
    val survivors = Seq((100L, 1L, goodA), (250L, 4L, goodB))
    val expect = graft.operators.TextAnalysis.hashSample(
        survivors.toDF("ts", "doc_id", "text"), pct = 50, salt = "clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val stream2 = MemoryStream[(Long, Long, String)]
    val q2 = graft.streaming.StreamingClean.cleanStream(
        stream2.toDF().toDF("ts", "doc_id", "text"), watermark = "10 minutes", pct = 50)
      .writeStream.format("memory").queryName("clean_stream_sampled")
      .outputMode("append").start()
    try {
      stream2.addData(survivors)
      q2.processAllAvailable()
    } finally q2.stop()
    val got2 = spark.table("clean_stream_sampled").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got2 === expect)
  }

  test("streaming clean routes the quality gate per language when asked") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val deDoc = "der hund und die katze sind nicht auf dem sofa weil der " +
      "regen sie zu den nachbarn mit dem garten treibt"
    val enDoc = "the quick brown fox jumps over the lazy dog in the field today"
    val stream = MemoryStream[(Long, Long, String, String)]
    val q = graft.streaming.StreamingClean.cleanStream(
        stream.toDF().toDF("ts", "doc_id", "lang", "text"),
        watermark = "10 minutes", routeByLang = true)
      .writeStream.format("memory").queryName("clean_stream_routed")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        (100L, 1L, "de", deDoc),  // passes ITS OWN battery (en would reject)
        (150L, 2L, "en", enDoc),  // passes the en battery
        (200L, 3L, "en", deDoc))) // en-tagged German text → rejected
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("clean_stream_routed").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("streaming clean scrubs PII with the batch expression when asked") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val withPii = "please contact the team at alice@example.com for the details today"
    val stream = MemoryStream[(Long, Long, String)]
    val q = graft.streaming.StreamingClean.cleanStream(
        stream.toDF().toDF("ts", "doc_id", "text"),
        watermark = "10 minutes", scrubPii = true)
      .writeStream.format("memory").queryName("clean_stream_pii")
      .outputMode("append").start()
    try {
      stream.addData(Seq((100L, 1L, withPii)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("clean_stream_pii").select("text").head().getString(0)
    // identical to the batch scrub of the same text
    val batch = graft.operators.TextAnalysis.piiScrub(
      Seq((1L, withPii)).toDF("doc_id", "text")).head().getAs[String]("clean_text")
    assert(got === batch)
    assert(got.contains("[EMAIL]") && !got.contains("alice@example.com"))
  }

  test("streaming dedup drops digests already seen within the watermark") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Long, Long, String)]
    val q = graft.streaming.StreamingDedup.dedupStream(
        stream.toDF().toDF("ts", "doc_id", "text"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // same text twice within the horizon → one survivor
      stream.addData(Seq((100L, 1L, "alpha"), (200L, 2L, "alpha"), (250L, 3L, "beta")))
      q.processAllAvailable()
      // advance the watermark far past batch 1 (eviction applies from the
      // NEXT batch — the watermark is recomputed after each batch)
      stream.addData(Seq((100000L, 9L, "gamma")))
      q.processAllAvailable()
      // alpha's digest is now evicted → re-admitted
      stream.addData(Seq((100100L, 4L, "alpha")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_stream").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got.contains(1L) && !got.contains(2L)) // in-horizon dup dropped
    assert(got.contains(3L) && got.contains(9L))
    assert(got.contains(4L)) // re-admitted after watermark eviction
  }

  test("streaming ingest drops accepted-corpus texts and in-stream dups") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val existing = Seq((100L, "alpha"), (101L, "beta")).toDF("doc_id", "text")
    val stream = MemoryStream[(Long, Long, String)]
    val q = graft.streaming.StreamingDedup.ingestStream(
        stream.toDF().toDF("ts", "doc_id", "text"), existing,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("ingest_stream")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        (100L, 1L, "alpha"), // already in the accepted corpus → dropped
        (150L, 2L, "gamma"), // novel → kept
        (200L, 3L, "gamma"), // in-horizon duplicate of 2 → dropped
        (250L, 4L, "delta")))// novel → kept
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ingest_stream").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got === Set(2L, 4L))

    // a pre-fingerprinted static side (the persisted-table shape) behaves
    // identically — the corpus text is never touched
    val fps = existing.select(md5(col("text")).as("text_md5"))
    val stream2 = MemoryStream[(Long, Long, String)]
    val q2 = graft.streaming.StreamingDedup.ingestStream(
        stream2.toDF().toDF("ts", "doc_id", "text"), fps,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("ingest_stream_fp")
      .outputMode("append").start()
    try {
      stream2.addData(Seq((100L, 1L, "alpha"), (150L, 2L, "gamma")))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.table("ingest_stream_fp").select("doc_id").collect()
      .map(_.getLong(0)).toSet === Set(2L))
  }

  test("session_window aggregation matches the custom-state sessionizer's sessions") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = graft.core.Catalog.tpch(spark, sfDir).table("events")
      .select(expr("ts div 1000000000").as("ts"), col("event_id"), col("user_id"))
      .limit(2000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // built-in session_window on a stream...
    val stream = MemoryStream[(Long, Long, Long)]
    stream.addData(rows.toSeq)
    val q = graft.streaming.StreamingSessionize.sessionAgg(
        stream.toDF().toDF("ts", "event_id", "user_id"), gapSeconds = 1800)
      .writeStream.format("memory").queryName("session_agg_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("session_agg_stream")
      .orderBy("user_id", "session_start_s").collect()

    // ...equals the batch sessionize (the exact replay) on the same rows
    val want = graft.operators.Temporal.sessionize(
        spark.createDataFrame(rows.toSeq).toDF("ts", "event_id", "user_id"),
        gapSeconds = 1800)
      .select("user_id", "session_start_s", "session_end_s", "n_events",
        "duration_s")
      .orderBy("user_id", "session_start_s").collect()
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
  }

  test("streaming sessionize closes sessions on gap and on event-time timeout") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val stream = MemoryStream[(Long, Long, Long)]
    val q = graft.streaming.StreamingSessionize.sessionize(
        stream.toDF().toDF("ts", "event_id", "user_id"),
        gapSeconds = 1800, watermark = "10 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // u7: two events 200s apart → one open session
      stream.addData(Seq((100L, 1L, 7L), (300L, 2L, 7L)))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0) // still open, nothing emitted
      // a u7 event past the gap closes the first session inline
      stream.addData(Seq((5000L, 3L, 7L)))
      q.processAllAvailable()
      val first = spark.table("sessions").collect()
      assert(first.length === 1)
      assert(first.head.getAs[Long]("user_id") === 7L &&
        first.head.getAs[Long]("session_start_s") === 100L &&
        first.head.getAs[Long]("session_end_s") === 300L &&
        first.head.getAs[Long]("n_events") === 2L &&
        first.head.getAs[Long]("duration_s") === 200L)
      // push the watermark far past 5000 + gap → the open session times out
      stream.addData(Seq((20000L, 4L, 9L)))
      q.processAllAvailable()
      stream.addData(Seq((20001L, 5L, 9L)))
      q.processAllAvailable()
      val flushed = spark.table("sessions")
        .where(col("session_start_s") === 5000L).collect()
      assert(flushed.length === 1)
      assert(flushed.head.getAs[Long]("n_events") === 1L &&
        flushed.head.getAs[Long]("duration_s") === 0L)
    } finally q.stop()
  }

  test("watermark bounds state: late window closes in append mode") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val hour = 3600L * 1000000000L // nanos
    val stream = MemoryStream[(Long, String, Double)]
    val q = StreamingHourly.hourlyAgg(
        stream.toDF().toDF("ts", "event_type", "value"), watermark = "1 hour")
      .writeStream.format("memory").queryName("hourly_append")
      .outputMode("append").start()
    try {
      stream.addData(Seq((1 * hour, "click", 1.0)))
      q.processAllAvailable()
      // advance event time far past the watermark → hour-1 window finalizes
      stream.addData(Seq((5 * hour, "click", 2.0)))
      q.processAllAvailable()
      stream.addData(Seq((9 * hour, "click", 3.0)))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("hourly_append").collect()
    assert(emitted.exists(_.getAs[Long]("hour_start") === 3600L))
  }

  test("BPE tokenization runs unchanged on a stream (stateless column algebra)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // ingest-time tokenization: the same unrolled-replace plan as batch
    // bpeApply — no state, no watermark, pure map-side
    val merges = Seq(("l", "o"), ("lo", "w</w>"))
    val stream = MemoryStream[(Long, String)]
    val q = graft.operators.Bpe.bpeApply(
        stream.toDF().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").start()
    try {
      stream.addData(Seq((1L, "low lower"), (2L, "slow")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bpe_stream").orderBy("doc_id").collect()
    assert(got(0).getSeq[String](got(0).fieldIndex("bpe_tokens"))
      === Seq("low</w>", "lo", "w", "e", "r</w>"))
    assert(got(1).getSeq[String](got(1).fieldIndex("bpe_tokens"))
      === Seq("s", "low</w>"))
  }

  test("sliding streaming agg matches the batch events_sliding shape") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // one event at minute 30 of hour h lands in windows h and h−1
    val rows = Seq((3600L + 1800L, "click", 2.0), (7200L + 60L, "click", 1.0))
      .map { case (s, t, v) => (s * 1000000000L, t, v) }
    val stream = MemoryStream[(Long, String, Double)]
    stream.addData(rows)
    val q = StreamingHourly.hourlyAgg(
        stream.toDF().toDF("ts", "event_type", "value"),
        windowLen = "2 hours", slide = "1 hour")
      .writeStream.format("memory").queryName("sliding_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sliding_stream").collect()
      .map(r => r.getAs[Long]("hour_start") -> r.getAs[Long]("n_events")).toMap
    // event@5400 → windows starting 0 and 3600; event@7260 → 3600 and 7200
    assert(got === Map(0L -> 1L, 3600L -> 2L, 7200L -> 1L))
  }

  test("streaming anomaly scores vs the static reference, identical to batch") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // reference: clicks distributed around 10 (sd 2·sqrt(…)); stream has
    // one in-distribution and one far-out event
    val reference = Seq.tabulate(100)(i => ("click", 8.0 + (i % 5)))
      .toDF("event_type", "value")
    val stream = MemoryStream[(Long, String, Double)]
    val q = graft.streaming.StreamingAnomaly.scoreStream(
        stream.toDF().toDF("event_id", "event_type", "value"), reference, minZ = 2.5)
      .writeStream.format("memory").queryName("anomaly_stream")
      .outputMode("append").start()
    try {
      stream.addData(Seq((1L, "click", 10.0), (2L, "click", 100.0),
        (3L, "view", 100.0))) // no reference stats for 'view' → unscored
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("anomaly_stream").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("z")).toMap
    assert(got.keySet === Set(2L))
    // the z equals the batch expression on the same reference
    val batchZ = reference
      .join(broadcast(graft.operators.Temporal.anomalyStats(reference)),
        col("event_type") === col("t"))
      .limit(1)
      .withColumn("z",
        round(graft.operators.Temporal.zScore(lit(100.0)), 4))
      .select("z").head().getDouble(0)
    assert(got(2L) === batchZ)
  }

  test("streaming daily actives equal the batch sketch on the same events") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batch = graft.core.Catalog.tpch(spark, sfDir).table("events")
      .select(expr("ts div 1000000000").as("ts"), col("user_id"))
    val rows = batch.limit(2000)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val stream = MemoryStream[(Long, Long)]
    stream.addData(rows.toSeq)
    val q = graft.streaming.StreamingActive.dailyActive(
        stream.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("active_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("active_stream").orderBy("day_start").collect()
    val want = graft.streaming.StreamingActive.dailyActive(
        spark.createDataFrame(rows.toSeq).toDF("ts", "user_id"))
      .orderBy("day_start").collect()
    // HLL++ is hash-based and merge-associative: the streamed sketch is
    // bit-identical to the batch one on the same rows
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
    // and the sketch tracks the exact batch distinct within its rsd
    val exact = spark.createDataFrame(rows.toSeq).toDF("ts", "user_id")
      .groupBy(expr("ts div 86400").as("day"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val day = r.getAs[Long]("day_start") / 86400
      val approx = r.getAs[Long]("dau_approx").toDouble
      val e = exact(day).toDouble
      assert(math.abs(approx - e) / e <= 0.15,
        s"day $day: approx $approx vs exact $e")
    }
  }

  test("stream-stream attribution joins conversions to in-window impressions") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val imps = MemoryStream[(Long, Long, Long)]  // (ts, user_id, imp_id)
    val convs = MemoryStream[(Long, Long, Long)] // (ts, user_id, conv_id)
    val q = graft.streaming.StreamingAttribution.attribute(
        imps.toDF().toDF("ts", "user_id", "imp_id"),
        convs.toDF().toDF("ts", "user_id", "conv_id"),
        windowSeconds = 100)
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    try {
      imps.addData(Seq(
        (100L, 1L, 10L),  // in window of u1's conversion at 150
        (120L, 1L, 11L),  // also in window — both pairs emit
        (10L, 2L, 20L),   // 190 s before u2's conversion — outside
        (100L, 3L, 30L))) // no conversion for u3
      convs.addData(Seq(
        (150L, 1L, 91L),
        (200L, 2L, 92L),
        (90L, 4L, 94L)))  // no impression for u4
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attr_stream")
      .select("conv_id", "imp_id", "lag_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((91L, 10L, 50L), (91L, 11L, 30L)))
  }

  test("attribution rollup equals backward asofJoin with the window as tolerance") {
    // last-touch rollup of the stream-stream join vs the batch temporal
    // family's asofJoin on the SAME rows — the two families must agree
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"),
        expr("unix_timestamp(ts)").as("ts"),
        col("user_id"), col("event_type"))
    val imps = ev.where(col("event_type") === "view")
      .select(col("ts"), col("user_id"), col("event_id").as("imp_id"))
    val convs = ev.where(col("event_type") === "purchase")
      .select(col("ts"), col("user_id"), col("event_id").as("conv_id"))
    val window = 86400L

    val viaRollup = graft.streaming.StreamingAttribution
      .attributeLatest(imps, convs, windowSeconds = window)
      .select("user_id", "conv_id", "conv_ts", "imp_id", "imp_ts", "lag_s")
      .orderBy("conv_id").collect()

    // asofJoin needs ≤1 right row per (key, ts): pre-aggregate ties to
    // max imp_id — the same pick attributeLatest's struct-max makes
    val right = imps.groupBy("user_id", "ts").agg(max("imp_id").as("imp_id"))
      .withColumn("imp_ts", col("ts"))
    val viaAsof = graft.operators.Temporal.asofJoin(
        convs, right, keyCol = "user_id", tsCol = "ts",
        payloadCols = Seq("imp_id", "imp_ts"), tolerance = Some(window))
      .where(col("imp_id").isNotNull)
      .select(col("user_id"), col("conv_id"), col("ts").as("conv_ts"),
        col("imp_id"), col("imp_ts"), (col("ts") - col("imp_ts")).as("lag_s"))
      .orderBy("conv_id").collect()

    assert(viaRollup.toSeq === viaAsof.toSeq)
    assert(viaRollup.nonEmpty)
    // one row per conversion, every lag inside the window
    val ids = viaRollup.map(_.getLong(1))
    assert(ids.distinct.length === ids.length)
    viaRollup.foreach { r =>
      val lag = r.getLong(5)
      assert(lag >= 0 && lag <= window)
    }
  }

  test("streaming funnel emits once on ordered completion, respects the window") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val steps = Seq("signup", "view", "click", "purchase")
    val stream = MemoryStream[(Long, Long, String, Long)]
    val q = graft.streaming.StreamingFunnel.funnel(
        stream.toDF().toDF("user_id", "event_id", "event_type", "ts"),
        steps, windowSeconds = 100)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        (1L, 1L, "signup", 10L), (1L, 2L, "view", 20L),
        // u2's purchase precedes click — chain must not count it
        (2L, 3L, "signup", 10L), (2L, 4L, "purchase", 15L),
        (2L, 5L, "view", 20L), (2L, 6L, "click", 30L),
        // u3 converts only outside the 100 s window
        (3L, 7L, "signup", 10L), (3L, 8L, "view", 20L), (3L, 9L, "click", 30L)))
      q.processAllAvailable()
      stream.addData(Seq(
        // u1 completes across batches
        (1L, 10L, "click", 30L), (1L, 11L, "purchase", 40L),
        (2L, 12L, "purchase", 40L),
        (3L, 13L, "purchase", 200L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel_stream").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getSeq[Long](r.fieldIndex("step_times")), r.getAs[Long]("conversion_s")))
      .toMap
    assert(got.keySet === Set(1L, 2L)) // u3 never converts in-window
    assert(got(1L) === (Seq(10L, 20L, 30L, 40L), 30L))
    assert(got(2L) === (Seq(10L, 20L, 30L, 40L), 30L))
  }

  test("streaming funnel survives new events for a chain whose window expired") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // regression: the funnel timeout is pinned to the FIRST step, so when
    // a key's new in-horizon event arrives in the same micro-batch where
    // the watermark first jumped past its old chain's deadline (data is
    // processed BEFORE timeout eviction), the state function used to
    // re-set a timeout at-or-behind the watermark — setTimeoutTimestamp
    // throws IllegalArgumentException and kills the query. The dead chain
    // must be expired inline instead. noDataMicroBatches is disabled so
    // the watermark-jump batch cannot evict the chain before our event
    // reaches it — the exact race the guard exists for.
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    val steps = Seq("signup", "purchase")
    val stream = MemoryStream[(Long, Long, String, Long)]
    val q = graft.streaming.StreamingFunnel.funnel(
        stream.toDF().toDF("user_id", "event_id", "event_type", "ts"),
        steps, windowSeconds = 60, watermark = "10 seconds")
      .writeStream.format("memory").queryName("funnel_expired_stream")
      .outputMode("append").start()
    try {
      // u1 opens a chain (deadline 160 s); u9's far-future signup will
      // push the watermark to ~9990 s after this batch
      stream.addData(Seq(
        (1L, 1L, "signup", 100L), (9L, 2L, "signup", 10000L)))
      q.processAllAvailable()
      // u1's purchase at 9995 s: in-horizon (watermark 9990 s), but its
      // chain's window closed at 160 s — long behind the watermark
      stream.addData(Seq(
        (1L, 3L, "purchase", 9995L), (9L, 4L, "purchase", 10020L)))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
    } finally {
      q.stop()
      spark.conf.set(key, prev)
    }
    val got = spark.table("funnel_expired_stream").collect()
      .map(_.getAs[Long]("user_id")).toSet
    assert(got === Set(9L)) // u9 converts; u1's dead chain never emits
  }

  test("streaming funnel restarts on a fresh first step in the dead chain's own batch") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // the dead chain must not swallow its batch: a fresh signup arriving
    // in the SAME micro-batch that found the old chain expired restarts
    // the funnel immediately (same inputs → same output regardless of
    // how events happened to be batched)
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    val steps = Seq("signup", "purchase")
    val stream = MemoryStream[(Long, Long, String, Long)]
    val q = graft.streaming.StreamingFunnel.funnel(
        stream.toDF().toDF("user_id", "event_id", "event_type", "ts"),
        steps, windowSeconds = 60, watermark = "10 seconds")
      .writeStream.format("memory").queryName("funnel_restart_stream")
      .outputMode("append").start()
    try {
      stream.addData(Seq(
        (1L, 1L, "signup", 100L), (9L, 2L, "signup", 10000L)))
      q.processAllAvailable()
      // u1's old chain (deadline 160 s) is far behind the watermark; the
      // same batch carries a fresh in-horizon signup+purchase pair
      stream.addData(Seq(
        (1L, 3L, "signup", 9996L), (1L, 4L, "purchase", 9998L)))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
    } finally {
      q.stop()
      spark.conf.set(key, prev)
    }
    val got = spark.table("funnel_restart_stream").collect()
      .map(r => r.getAs[Long]("user_id") ->
        r.getSeq[Long](r.fieldIndex("step_times"))).toMap
    assert(got.keySet === Set(1L))
    assert(got(1L) === Seq(9996L, 9998L)) // the FRESH chain, not the dead one
  }
}
