package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal

class TemporalSpec extends SparkSpec {

  test("asofJoin picks the latest right row at or before each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "u1"), (2L, 200L, "u1"), (3L, 50L, "u1"),
      (4L, 100L, "u2"), (5L, 999L, "u3"))
      .toDF("event_id", "t", "k")
      .withColumn("ts", col("t").cast("timestamp")).drop("t")
    val right = Seq(
      ("u1", 100L, "a"), ("u1", 150L, "b"),
      ("u2", 101L, "c"), ("u9", 1L, "z"))
      .toDF("k", "t", "tag")
      .withColumn("ts", col("t").cast("timestamp")).drop("t")
    val out = Temporal.asofJoin(left, right, "k", "ts", Seq("tag"))
      .select("event_id", "tag").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "a")   // equal ts matches (<= semantics)
    assert(out(2L) === "b")   // latest of two earlier rows
    assert(out(3L) === null)  // nothing at or before ts=50
    assert(out(4L) === null)  // right row is strictly later
    assert(out(5L) === null)  // key absent on the right
  }

  test("asofJoin forward picks the earliest right row at or after each left ts") {
    import spark.implicits._
    // numeric epoch-second ts — the tolerance arithmetic's contract
    // (the production entries divide the catalog's epoch-nanos)
    val left = Seq(
      (1L, 100L, "u1"), (2L, 200L, "u1"), (3L, 50L, "u1"),
      (4L, 102L, "u2"), (5L, 999L, "u3"))
      .toDF("event_id", "ts", "k")
    val right = Seq(
      ("u1", 100L, "a"), ("u1", 150L, "b"),
      ("u2", 101L, "c"), ("u9", 1L, "z"))
      .toDF("k", "ts", "tag")
    val out = Temporal.asofJoin(left, right, "k", "ts", Seq("tag"),
        direction = "forward")
      .select("event_id", "tag").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "a")   // equal ts matches (>= semantics, tie included)
    assert(out(2L) === null)  // nothing at or after ts=200
    assert(out(3L) === "a")   // earliest of the two later rows
    assert(out(4L) === null)  // right row is strictly earlier
    assert(out(5L) === null)  // key absent on the right

    // forward tolerance: matches farther AHEAD than the budget null out
    val tol = Temporal.asofJoin(left, right, "k", "ts", Seq("tag"),
        tolerance = Some(20L), direction = "forward")
      .select("event_id", "tag").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tol(1L) === "a")   // 0 ahead — kept
    assert(tol(3L) === null)  // 50 ahead — beyond the 20 s budget
  }

  test("asofJoin tolerance nulls stale matches without changing fresh ones") {
    import spark.implicits._
    val left = Seq((1L, 100L, "u1"), (2L, 500L, "u1"), (3L, 120L, "u2"))
      .toDF("event_id", "ts", "k")
    val right = Seq(("u1", 90L, "a"), ("u2", 10L, "b")).toDF("k", "ts", "tag")
    val out = Temporal.asofJoin(left, right, "k", "ts", Seq("tag"),
        tolerance = Some(50L))
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("tag"))).toMap
    assert(out(1L) === "a")  // 10 s stale: within budget
    assert(out(2L) === null) // 410 s stale: nulled
    assert(out(3L) === null) // 110 s stale: nulled
  }

  test("asofJoin matches a brute-force reference on seeded random data, all configs") {
    import spark.implicits._
    // dense keys and coarse timestamps force heavy ties (same key, same
    // ts on both sides) — exactly the boundary cases the window's tag
    // ordering exists for
    val rnd = new scala.util.Random(42)
    val left = Seq.tabulate(400)(i =>
      (i.toLong, rnd.nextInt(25).toLong + 1, rnd.nextInt(50).toLong))
    val right = Seq.tabulate(300)(i =>
      (rnd.nextInt(25).toLong + 1, rnd.nextInt(50).toLong, i.toLong + 1000))
      // one payload per (key, ts) — the operator contract (callers
      // pre-aggregate, as the latestOrders entries do)
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val lDf = left.toDF("event_id", "k", "ts")
    val rDf = right.toDF("k", "ts", "tag")

    def brute(backward: Boolean, tol: Option[Long]): Map[Long, Option[Long]] =
      left.map { case (id, k, ts) =>
        val cand = right.filter(r => r._1 == k &&
          (if (backward) r._2 <= ts else r._2 >= ts) &&
          tol.forall(t => (if (backward) ts - r._2 else r._2 - ts) <= t))
        id -> (if (cand.isEmpty) None
        else Some((if (backward) cand.maxBy(_._2) else cand.minBy(_._2))._3))
      }.toMap

    for {
      dir <- Seq("backward", "forward")
      tol <- Seq(None, Some(7L))
    } {
      val got = Temporal.asofJoin(lDf, rDf, "k", "ts", Seq("tag"),
          tolerance = tol, direction = dir)
        .select("event_id", "tag").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got === brute(dir == "backward", tol),
        s"direction=$dir tolerance=$tol diverged from brute force")
    }
  }

  test("retentionCohorts matches a first-active simulation on seeded random activity") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val maxDays = 10
    val activity = Seq.tabulate(500)(i =>
      (i.toLong, rnd.nextInt(40).toLong + 1, rnd.nextInt(25).toLong))
    val df = activity.toDF("event_id", "user_id", "day")

    // reference: cohort = first active day; count distinct users per
    // (cohort, offset) for every later active day within maxDays
    val byUser = activity.groupBy(_._2).view.mapValues(_.map(_._3).distinct).toMap
    val want = byUser.toSeq.flatMap { case (_, days) =>
      val cohort = days.min
      days.filter(d => d - cohort <= maxDays).map(d => (cohort, d - cohort))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val got = Temporal.retentionCohorts(df, maxDays = maxDays).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) ->
        r.getAs[Long]("n_users")).toMap
    assert(got === want)
    // seed produces both day-0 rows and genuine return offsets
    assert(got.keySet.exists(_._2 == 0L) && got.keySet.exists(_._2 > 0L))
  }

  test("sessionize matches a gap-scan simulation on seeded random streams") {
    import spark.implicits._
    val gap = 10L
    val rnd = new scala.util.Random(23)
    // coarse timestamps force events AT the exact gap boundary (the > vs
    // >= edge) and same-ts ties broken by event_id
    val events = Seq.tabulate(500)(i =>
      (i.toLong, rnd.nextInt(20).toLong + 1, rnd.nextInt(80).toLong * 5))
    val df = events.toDF("event_id", "user_id", "ts")

    def sim(uid: Long): Seq[(Long, Long, Long, Long)] = {
      val ts = events.filter(_._2 == uid).map(e => (e._3, e._1)).sorted.map(_._1)
      val sessions = ts.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
        if (acc.nonEmpty && t - acc.last.last <= gap)
          acc.init :+ (acc.last :+ t)
        else acc :+ Vector(t)
      }
      sessions.map(s => (s.head, s.last, s.size.toLong, s.last - s.head))
    }

    val got = Temporal.sessionize(df, gapSeconds = gap)
      .orderBy("user_id", "session_start_s").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_s"),
        r.getAs[Long]("session_end_s"), r.getAs[Long]("n_events"),
        r.getAs[Long]("duration_s")))
    // expected set derives from the INPUT's users, so a user silently
    // dropped by the operator fails the comparison
    val want = events.map(_._2).distinct.sorted.flatMap(uid =>
      sim(uid).map(s => (uid, s._1, s._2, s._3, s._4)))
    assert(got.toSeq === want.toSeq)
    // the seed produces multi-event AND singleton sessions
    assert(got.exists(_._4 > 1) && got.exists(_._4 == 1))
  }

  test("eventFunnel matches a per-user simulation on seeded random streams") {
    import spark.implicits._
    val steps = Seq("signup", "view", "click", "purchase")
    val types = steps ++ Seq("noise", "scroll") // non-step types interleave
    val rnd = new scala.util.Random(11)
    val events = Seq.tabulate(600)(i =>
      (i.toLong, rnd.nextInt(30).toLong + 1,
        types(rnd.nextInt(types.size)), rnd.nextInt(500).toLong))
    val df = events.toDF("event_id", "user_id", "event_type", "ts")

    // reference: earliest chain times per user — t0 = min step-0 ts;
    // t_i = min ts of step-i events at-or-after t_{i-1}
    def sim(uid: Long): (Seq[Option[Long]], Long) = {
      val es = events.filter(_._2 == uid)
      val ts = steps.scanLeft(Option(Long.MinValue)) { (prev, step) =>
        prev.flatMap(p =>
          es.filter(e => e._3 == step && e._4 >= p).map(_._4)
            .minOption)
      }.tail
      (ts, ts.count(_.isDefined).toLong)
    }

    val got = Temporal.eventFunnel(df, steps).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (steps.indices.map(i =>
          if (r.isNullAt(r.fieldIndex(s"t${i + 1}_s"))) None
          else Some(r.getAs[Long](s"t${i + 1}_s"))),
          r.getAs[Long]("steps_completed"))).toMap
    // every input user must appear — a silently dropped key fails here,
    // not just a wrong chain on an emitted one
    assert(got.keySet === events.map(_._2).toSet)
    got.foreach { case (uid, (ts, n)) =>
      assert((ts, n) === sim(uid), s"user $uid diverged from simulation")
    }
    // the seed produces full and partial funnels (the test has teeth)
    assert(got.values.map(_._2).toSet.size > 1)
  }

  test("asofJoin rejects payload names colliding with left columns") {
    import spark.implicits._
    val left = Seq((1L, 10L, "u1")).toDF("event_id", "ts", "k")
    val right = Seq(("u1", 5L, "x")).toDF("k", "ts", "event_id")
    // payload 'event_id' would silently clobber/duplicate left's event_id
    val e = intercept[IllegalArgumentException] {
      Temporal.asofJoin(left, right, "k", "ts", Seq("event_id"))
    }
    assert(e.getMessage.contains("event_id"))
    // internal-name squatting is refused too
    val withSide = left.withColumn("__side", lit(0))
    val e2 = intercept[IllegalArgumentException] {
      Temporal.asofJoin(withSide, right.withColumnRenamed("event_id", "tag"),
        "k", "ts", Seq("tag"))
    }
    assert(e2.getMessage.contains("__side"))
  }

  // events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS);
  // the Catalog normalizes either flavor to epoch-nanos LONG at the
  // boundary — route through it (never read the parquet directly) and
  // normalize to epoch seconds.
  private def eventsSeconds =
    graft.core.Catalog.tpch(spark, sfDir).table("events")
      .withColumn("ts", expr("ts div 1000000000"))

  test("asofJoin is deterministic under repartitioning") {
    val events = eventsSeconds.select(col("event_id"), col("ts"), col("user_id"))
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy(col("o_custkey").as("user_id"),
        col("o_orderdate").cast("timestamp").cast("long").as("ts"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val a = Temporal.asofJoin(events, orders, "user_id", "ts", Seq("o_orderkey"))
      .orderBy("event_id").collect()
    val b = Temporal.asofJoin(events.repartition(7), orders.repartition(3),
        "user_id", "ts", Seq("o_orderkey"))
      .orderBy("event_id").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === events.count())
  }

  test("sessionize splits on gaps and rolls up counts and durations") {
    import spark.implicits._
    val ev = Seq(
      // u1: two sessions — gap of 2000 s between t=300 and t=2300
      (1L, 100L, 7L), (2L, 300L, 7L), (3L, 2300L, 7L), (4L, 2400L, 7L),
      // u2: one single-event session
      (5L, 50L, 8L))
      .toDF("event_id", "t", "user_id")
      .withColumn("ts", col("t").cast("timestamp")).drop("t")
    val s = Temporal.sessionize(ev, gapSeconds = 1800).orderBy("user_id", "session_seq")
      .collect()
    assert(s.length === 3)
    val (s1, s2, s3) = (s(0), s(1), s(2))
    assert(s1.getAs[Long]("user_id") === 7L && s1.getAs[Long]("n_events") === 2L &&
      s1.getAs[Long]("session_start_s") === 100L && s1.getAs[Long]("duration_s") === 200L)
    assert(s2.getAs[Long]("user_id") === 7L && s2.getAs[Long]("n_events") === 2L &&
      s2.getAs[Long]("session_start_s") === 2300L && s2.getAs[Long]("duration_s") === 100L)
    assert(s3.getAs[Long]("user_id") === 8L && s3.getAs[Long]("n_events") === 1L &&
      s3.getAs[Long]("duration_s") === 0L)
  }

  test("sessionize covers every event exactly once") {
    val events = eventsSeconds
    val sessions = Temporal.sessionize(events, gapSeconds = 1800)
    assert(sessions.agg(sum("n_events")).head().getLong(0) === events.count())
    // sessions of one user never overlap: next start > previous end + gap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_seq")
    val bad = sessions
      .withColumn("prev_end", lag(col("session_end_s"), 1).over(w))
      .where(col("prev_end").isNotNull &&
        col("session_start_s") <= col("prev_end") + 1800)
    assert(bad.count() === 0)
  }

  test("eventFunnel enforces step order, not mere presence") {
    import spark.implicits._
    // u1 completes in order; u2 has every type but purchase precedes click
    // (order broken at step 4); u3 never gets past signup; u4 reuses one
    // timestamp for two consecutive steps (>= semantics: both count)
    val ev = Seq(
      (1L, "signup", 10L), (1L, "view", 20L), (1L, "click", 30L), (1L, "purchase", 40L),
      (2L, "signup", 10L), (2L, "view", 20L), (2L, "purchase", 25L), (2L, "click", 30L),
      (3L, "signup", 10L), (3L, "click", 20L),
      (4L, "signup", 10L), (4L, "view", 10L), (4L, "click", 11L), (4L, "purchase", 11L))
      .toDF("user_id", "event_type", "ts")
    val out = Temporal.eventFunnel(ev, Seq("signup", "view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Long]("steps_completed") === 4L)
    assert(out(1L).getAs[Long]("t4_s") === 40L)
    assert(out(2L).getAs[Long]("steps_completed") === 3L) // purchase too early
    assert(out(2L).isNullAt(out(2L).fieldIndex("t4_s")))
    assert(out(3L).getAs[Long]("steps_completed") === 1L) // view missing ⇒ chain stops
    assert(out(3L).isNullAt(out(3L).fieldIndex("t2_s")))
    assert(out(4L).getAs[Long]("steps_completed") === 4L) // equal-ts steps count
  }

  test("eventFunnel step times are non-decreasing and null-monotone on sf data") {
    val out = Temporal.eventFunnel(eventsSeconds,
      Seq("signup", "view", "click", "purchase"))
    // t1 <= t2 <= t3 <= t4 wherever defined; a null never precedes a non-null
    val bad = out.where(
      (col("t2_s").isNotNull && (col("t1_s").isNull || col("t2_s") < col("t1_s"))) ||
      (col("t3_s").isNotNull && (col("t2_s").isNull || col("t3_s") < col("t2_s"))) ||
      (col("t4_s").isNotNull && (col("t3_s").isNull || col("t4_s") < col("t3_s"))))
    assert(bad.count() === 0)
    assert(out.count() === eventsSeconds.select("user_id").distinct().count())
  }

  test("valuePercentiles takes exact integer-rank cuts per group") {
    import spark.implicits._
    val ev = (1 to 10).map(v => ("a", v.toDouble)) ++
      Seq(("b", 1.0), ("b", 1.0), ("b", 1.0), ("b", 2.0))
    val out = Temporal.valuePercentiles(ev.toDF("event_type", "value"))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("a").getAs[Long]("n") === 10L)
    assert(out("a").getAs[Double]("p500") === 5.0)  // ceil(0.5·10) = rank 5
    assert(out("a").getAs[Double]("p950") === 10.0) // ceil(9.5) = rank 10
    assert(out("b").getAs[Double]("p500") === 1.0)  // cum 3 ≥ rank 2
    assert(out("b").getAs[Double]("p950") === 2.0)  // rank ceil(3.8) = 4
    intercept[IllegalArgumentException] {
      Temporal.valuePercentiles(ev.toDF("event_type", "value"), permilles = Seq(0))
    }
  }

  test("valuePercentiles matches the sorted ceil-rank definition on seeded random data") {
    import spark.implicits._
    // 12 seeded pseudo-random groups (sizes 1..600, duplicate-heavy) in
    // ONE frame/job; reference = directly indexing the sorted values at
    // ceil(p·n/1000)
    val rnd = new scala.util.Random(42)
    val permilles = Seq(10, 250, 500, 905, 1000)
    val data = (0 until 12).flatMap { g =>
      val n = 1 + rnd.nextInt(600)
      (0 until n).map(_ => (s"g$g", rnd.nextInt(50).toDouble))
    }
    val out = Temporal.valuePercentiles(
        data.toDF("event_type", "value"), permilles = permilles)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val byGroup = data.groupBy(_._1)
    for ((g, rows) <- byGroup) {
      val sorted = rows.map(_._2).sorted
      val n = sorted.size
      assert(out(g).getAs[Long]("n") === n.toLong)
      for (p <- permilles) {
        val rank = (p.toLong * n + 999) / 1000 // ceil(p·n/1000), ≥ 1 since p ≥ 1
        assert(out(g).getAs[Double](s"p$p") === sorted((rank - 1).toInt),
          s"group $g p$p n=$n")
      }
    }
  }

  test("retentionCohorts counts each user once per offset, anchored at first day") {
    import spark.implicits._
    // u1 active days 0,1,3; u2 active days 1,1 (dup events same day), 2
    val ev = Seq(
      (1L, 0L), (1L, 1L), (1L, 3L),
      (2L, 1L), (2L, 1L), (2L, 2L))
      .toDF("user_id", "day")
    val out = Temporal.retentionCohorts(ev, maxDays = 30)
      .collect().map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) ->
        r.getAs[Long]("n_users")).toMap
    assert(out === Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }
}
