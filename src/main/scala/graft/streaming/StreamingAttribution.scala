package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STREAM event-time join — the attribution shape: conversions
  * matched to the prior event (impression/send/exposure) of the same
  * user within an attribution window. This is the one streaming join
  * form the rest of the `graft.streaming` family doesn't exercise: both
  * sides are unbounded, so Spark buffers each side in watermarked state
  * and the time-range predicate is what BOUNDS that state — without it
  * the join would have to keep every row forever (Spark rejects inner
  * stream-stream joins with no event-time constraint for exactly that
  * reason).
  *
  * State shape: each side holds rows until the watermark passes the
  * range the OTHER side could still match — impressions live
  * `windowSeconds` + watermark delay, conversions only the delay —
  * so state is bounded by rate × horizon, independent of stream length.
  * One conversion can match several in-window impressions (the join is
  * a join, not an argmax); downstream pick-latest is a grouped agg the
  * caller composes, kept out of here so the join stays append-mode.
  */
object StreamingAttribution {

  /** `impressions` needs `ts` (epoch seconds), `user_id`, `imp_id`;
    * `conversions` needs `ts`, `user_id`, `conv_id`. Emits one row per
    * (conversion, in-window prior impression) pair, append mode:
    * (user_id, conv_id, conv_ts, imp_id, imp_ts, lag_s).
    */
  def attribute(
      impressions: DataFrame,
      conversions: DataFrame,
      windowSeconds: Long = 3600,
      watermark: String = "1 hour"): DataFrame = {
    require(windowSeconds >= 1, s"windowSeconds must be positive: $windowSeconds")
    val imp = impressions
      .withColumn("imp_time", expr("timestamp_seconds(ts)"))
      .withWatermark("imp_time", watermark)
      .select(col("user_id").as("i_user"), col("imp_id"),
        col("ts").as("imp_ts"), col("imp_time"))
    val conv = conversions
      .withColumn("conv_time", expr("timestamp_seconds(ts)"))
      .withWatermark("conv_time", watermark)
      .select(col("user_id"), col("conv_id"),
        col("ts").as("conv_ts"), col("conv_time"))
    conv.join(imp,
        col("user_id") === col("i_user") &&
          col("imp_time") <= col("conv_time") &&
          col("imp_time") >= col("conv_time") - expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("user_id"), col("conv_id"), col("conv_ts"),
        col("imp_id"), col("imp_ts"),
        (col("conv_ts") - col("imp_ts")).as("lag_s"))
  }

  /** The attribution ROLLUP [[attribute]] deliberately leaves to the
    * caller, composed: one row per conversion carrying its LATEST
    * in-window impression (last-touch attribution) — ties on imp_ts
    * break to the larger imp_id, so the pick is deterministic under any
    * partitioning. The struct-max aggregate is one map-side-combined
    * groupBy over the pair stream, bounded by conversions × in-window
    * impressions.
    *
    * Equivalent to `Temporal.asofJoin(conversions, impressions,
    * direction = "backward", tolerance = windowSeconds)` with the
    * impression side pre-aggregated per (user, ts) — spec-asserted row
    * identity, tying the streaming join family to the batch temporal
    * family. On batch frames this runs as-is; a streaming caller keeps
    * the non-windowed groupBy in update mode (state = open conversions
    * within the horizon) or rolls up post-sink — the append-mode join
    * above stays the streaming deliverable.
    */
  def attributeLatest(
      impressions: DataFrame,
      conversions: DataFrame,
      windowSeconds: Long = 3600,
      watermark: String = "1 hour"): DataFrame =
    attribute(impressions, conversions, windowSeconds, watermark)
      .groupBy(col("user_id"), col("conv_id"), col("conv_ts"))
      .agg(max(struct(col("imp_ts"), col("imp_id"))).as("m"))
      .select(col("user_id"), col("conv_id"), col("conv_ts"),
        col("m.imp_id").as("imp_id"), col("m.imp_ts").as("imp_ts"),
        (col("conv_ts") - col("m.imp_ts")).as("lag_s"))
}
