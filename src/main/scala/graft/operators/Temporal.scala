package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark's built-in surface lacks as first-class
  * constructs: the as-of join and inactivity-gap sessionization. Both are
  * expressed as single-shuffle window plans — partitioned by the join/
  * session key, never a corpus-wide window — so they scale with key
  * cardinality like any hash shuffle.
  */
object Temporal {

  /** As-of join: for every left row, the latest right row with
    * `right.tsCol ≤ left.tsCol` on the same key — the point-in-time
    * lookup (market data, feature stores, slowly-changing dims) that
    * relational engines ship natively (DuckDB `ASOF JOIN`) and Spark
    * doesn't.
    *
    * NOT a join at all in the plan: both sides are unioned, tagged and
    * sorted per key by (ts, side) — right before left on equal
    * timestamps, so "≤" holds — and the right payload propagates forward
    * with `last(ignoreNulls) OVER (rows unbounded preceding)`, the
    * merge-asof shape. ONE shuffle on the key, no range-condition
    * explosion, no O(left × right-per-key) intermediate: the standard
    * scalable rewrite of what would otherwise be a theta-join. Left rows
    * with no earlier right row keep NULL payload (left-outer semantics).
    *
    * The caller must ensure at most one right row per (key, ts) —
    * otherwise "the latest" is ambiguous in any engine; pre-aggregate the
    * right side to make it deterministic.
    */
  /** `tolerance`: optional maximum staleness (same units as `tsCol`) — a
    * matched right row older than `left.ts − tolerance` is discarded
    * (pandas `merge_asof(tolerance=...)`; feature-store TTL semantics).
    * Implemented by carrying the right timestamp inside the propagated
    * payload and null-ing the match in the final projection — the plan
    * shape (one shuffle, no range join) is unchanged.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String],
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    // "backward" (default) matches the LATEST right row at-or-before the
    // left timestamp — the quote-for-a-trade shape. "forward" matches the
    // EARLIEST right row at-or-after — the next-fill / next-order shape
    // (pandas merge_asof's direction knob). Same single-shuffle
    // union+tag plan either way: only the tag order, the window frame
    // side, and the tolerance sign flip.
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward: $direction")
    val backward = direction == "backward"
    // the result is left.columns ++ payloadCols under their bare names —
    // an overlap would silently emit duplicate/clobbered columns
    val clash = payloadCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"payload column(s) ${clash.mkString(", ")} collide with left columns; " +
        s"alias them on the right side first")
    val internal = Set("__side", "__payload", "__match", "__rts", "__ok")
    val taken = (left.columns ++ right.columns).toSet.intersect(internal)
    require(taken.isEmpty, s"column(s) ${taken.mkString(", ")} collide with " +
      s"asofJoin's internal names; rename them first")
    // the right timestamp rides inside the payload so the tolerance test
    // can run AFTER propagation, against the row that actually matched
    val payload = struct(payloadCols.map(col) :+ col(tsCol).as("__rts"): _*)
    val leftCols = left.columns
    // tag order puts the right side WITH the frame at equal timestamps:
    // backward sorts right(0) before left(1) so at-or-before includes
    // ties; forward sorts left(0) before right(1) so at-or-after does
    val (lTag, rTag) = if (backward) (1, 0) else (0, 1)
    val l = left.withColumn("__side", lit(lTag))
      .withColumn("__payload", lit(null).cast(right.select(payload).schema.head.dataType))
    val r = right.select(
      (col(keyCol) +: col(tsCol) +: lit(rTag).as("__side") +: payload.as("__payload") +:
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val base = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
    val w =
      if (backward) base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched =
      if (backward) last(col("__payload"), ignoreNulls = true).over(w)
      else first(col("__payload"), ignoreNulls = true).over(w)
    val inTol = tolerance match {
      case Some(tol) =>
        if (backward) col(tsCol) - col("__match.__rts") <= tol
        else col("__match.__rts") - col(tsCol) <= tol
      case None => lit(true)
    }
    l.unionByName(r)
      .withColumn("__match", matched)
      .where(col("__side") === lTag)
      .select(leftCols.map(col) :+ col("__match") :+ inTol.as("__ok"): _*)
      .select(leftCols.map(col) ++ payloadCols.map(c =>
        when(col("__ok"), col(s"__match.$c")).as(c)): _*)
  }

  /** Inactivity-gap sessionization: events of one key belong to the same
    * session while consecutive gaps stay ≤ `gapSeconds`; a larger gap
    * starts a new session (the classic web-analytics / user-journey
    * segmentation). Emits one row per session: key, ordinal session
    * number, start/end epoch seconds, event count and duration.
    *
    * One shuffle on the key: session boundaries are a lag-compare, the
    * session number a running sum of boundary flags, the rollup a groupBy
    * on (key, session) — all within per-key window partitions, bounded by
    * one key's history, not the table. Ties on ts break by `idCol`, so
    * the segmentation is deterministic under any partitioning.
    */
  def sessionize(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      gapSeconds: Long = 1800): DataFrame = {
    val se = col(tsCol).cast("long")
    val w = Window.partitionBy(col(keyCol)).orderBy(se, col(idCol))
    events
      .withColumn("__se", se)
      .withColumn("__new",
        when(lag(col("__se"), 1).over(w).isNull ||
          col("__se") - lag(col("__se"), 1).over(w) > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col("__se")).as("session_start_s"),
        max(col("__se")).as("session_end_s"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_s", col("session_end_s") - col("session_start_s"))
  }

  /** Ordered funnel: for every key, the earliest completion time of each
    * step in `steps`, where step i only counts at-or-after step i−1's
    * completion (the product-analytics conversion funnel: signup → view →
    * click → purchase). Emits one row per key: per-step epoch-second
    * columns `t1_s..tk_s` (NULL from the first uncompleted step onward —
    * the chain condition makes null monotone) and `steps_completed`.
    *
    * ONE shuffle on the key: each step time is a conditional window
    * minimum over the key partition, and step i's condition references
    * step i−1's column — k Window operators stacked over a single
    * exchange (same partitioning throughout; Spark plans one Exchange and
    * k Window nodes), then the per-key reduction rides the same
    * partitioning into the final groupBy. Per-partition state is one
    * key's history — funnel depth never touches corpus volume.
    *
    * `tsCol` must already be numeric epoch seconds (callers divide the
    * catalog's epoch-nanos once, as with [[sessionize]]).
    */
  def eventFunnel(
      events: DataFrame,
      steps: Seq[String],
      keyCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(keyCol))
    val stepped = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) >= col(s"t${i}_s")
      df.withColumn(s"t${i + 1}_s",
        min(when(cond, col(tsCol))).over(w))
    }
    val tCols = steps.indices.map(i => s"t${i + 1}_s")
    stepped
      .groupBy(col(keyCol))
      .agg(min(tCols.head).as(tCols.head),
        tCols.tail.map(c => min(c).as(c)): _*)
      .withColumn("steps_completed",
        tCols.map(c => when(col(c).isNotNull, 1L).otherwise(0L)).reduce(_ + _))
  }

  /** Rolling active users — the DAU/WAU pair every product dashboard
    * leads with: per active day, the count of distinct users that day
    * (`dau`) and the count of distinct users in the trailing
    * `windowDays`-day window ending that day (`wau`). Only observed days
    * are emitted.
    *
    * Scale shape: the corpus reduces map-side+shuffle to the DISTINCT
    * (day, user) activity frame — bounded by users × active days, never
    * event volume. The rolling distinct is EXACT without any distinct-
    * over-window: each activity row expands to the `windowDays` window-
    * end days it contributes to (map-side sequence+explode, ×windowDays
    * rows), then one distinct + one count — a range join re-expressed as
    * bounded expansion, so there is no non-equi join (Spark would
    * nested-loop it) and no corpus-sized window anywhere.
    */
  def activeUsers(
      events: DataFrame,
      windowDays: Int = 7,
      keyCol: String = "user_id",
      dayCol: String = "day"): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive: $windowDays")
    val du = events.select(col(dayCol), col(keyCol)).distinct()
    val dau = du.groupBy(col(dayCol)).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(sequence(col(dayCol),
        col(dayCol) + (windowDays - 1))).as(dayCol), col(keyCol))
      .distinct()
      .groupBy(col(dayCol)).agg(count(lit(1)).as("wau"))
    // inner join restricts to OBSERVED days (expansion manufactures
    // window-end days past each activity burst)
    dau.join(wau, dayCol)
      .select(col(dayCol), col("dau"), col("wau"))
  }

  /** Cohort retention: users grouped by first-active day (their cohort),
    * counted on each later day-offset they return (the classic retention
    * triangle). Emits (cohort_day, day_offset, n_users) for offsets in
    * [0, maxDays].
    *
    * Scale shape: the corpus reduces map-side+shuffle to the DISTINCT
    * (key, day) activity frame — bounded by users × active days, never
    * event volume — cohorts are a same-key aggregation over it, the
    * cohort join is key-co-partitioned (AQE broadcasts the per-user
    * cohort table when it is small), and the output is bounded by
    * days × offsets. No window over anything corpus-sized.
    *
    * `dayCol`-producing expression: callers pass events with an integer
    * epoch-day column (divide the catalog's epoch-nanos once).
    */
  def retentionCohorts(
      events: DataFrame,
      maxDays: Int = 30,
      keyCol: String = "user_id",
      dayCol: String = "day"): DataFrame = {
    val activity = events.select(col(keyCol), col(dayCol)).distinct()
    val cohorts = activity.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("cohort_day"))
    activity.join(cohorts, keyCol)
      .withColumn("day_offset", col(dayCol) - col("cohort_day"))
      .where(col("day_offset") <= maxDays)
      // activity is distinct per (key, day) and each maps to exactly one
      // (cohort_day, day_offset, key) — count(*) IS the distinct-user count
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-group moment statistics for z-scoring: count + exact decimal
    * sums of value and value² (≤ #groups rows — broadcast material).
    * Shared by the batch `events_anomaly` query and the streaming
    * anomaly twin, so "the reference distribution" means exactly one
    * expression everywhere (the piiClean sharing discipline).
    */
  def anomalyStats(
      events: DataFrame,
      groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame =
    events.groupBy(col(groupCol).as("t")).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast("decimal(18,6)")).as("sv"),
      sum((col(valueCol) * col(valueCol)).cast("decimal(28,10)")).as("svv"))

  /** The z-score of `value` against [[anomalyStats]] columns — mean and
    * variance derive from the exact decimal sums, so every z is
    * partition-order independent and engine-portable. */
  def zScore(value: Column): Column = {
    val mean = col("sv").cast("double") / col("n")
    // Clamp the E[x²]−E[x]² form at 0: a constant-valued group has true
    // variance 0 but the double subtraction can land ε below it, and
    // sqrt(−ε) is NaN (engines disagree on NaN propagation). The
    // zero-variance case then yields an EXPLICIT null z via nullif — a
    // constant group has no z-scale, and anomaly consumers must see
    // null ("cannot score"), not NaN or ±Infinity (silently unflagged).
    val variance = greatest(
      col("svv").cast("double") / col("n") - mean * mean, lit(0.0))
    (value - mean) / sqrt(nullif(variance, lit(0.0)))
  }

  /** EXACT per-group percentiles of a metric column by integer rank over
    * the grouped value histogram (the `length_band`/`perplexity_buckets`
    * discipline on events): the p‰ percentile is the smallest value whose
    * cumulative count reaches ⌈p·n/1000⌉, tested in integer
    * cross-multiplication (`cum·1000 ≥ p·n`) — never IEEE division, so
    * the thresholds are bit-identical in any engine and partitioning.
    *
    * Scale shape: the corpus reduces map-side+shuffle to the (group,
    * value) histogram; the cumulative window partitions per group over
    * histogram rows — bounded by the metric's RESOLUTION (fixed-point
    * metrics like prices or latency-ms have bounded distinct values),
    * never event volume. Callers with genuinely continuous metrics bucket
    * the column first (the perplexity_buckets rounding pattern). Output:
    * one row per group with `n` and a `p<permille>` column per requested
    * percentile.
    */
  def valuePercentiles(
      events: DataFrame,
      permilles: Seq[Int] = Seq(500, 950, 990),
      groupCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1, 1000]: $permilles")
    val h = events.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h
      .withColumn("cum", sum(col("c")).over(cumW))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col(groupCol))))
    val pCols = permilles.map(p =>
      min(when(col("cum") * 1000 >= col("n") * p, col("v"))).as(s"p$p"))
    cum.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), pCols: _*)
  }
}
