package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming data-quality monitor — the live twin of `q_dq_checks`'
  * per-table scalar checks: the same null-rate / domain-conformance
  * counters, maintained per event-time window under a watermark
  * instead of per batch table. This is the observability loop a 24/7
  * ingest runs NEXT to the pipeline: additive counters (map-side
  * combinable, one state row per window), alerts downstream of the
  * sink. Violation DEFINITIONS are shared with the batch checks by
  * construction (same expressions), so batch audit and live monitor
  * cannot drift.
  */
object DqStream {

  /** Per-hour DQ counter rows: total, null props, out-of-range values.
    * State is bounded by the watermark; emission is append-mode
    * (closed windows only) — the contract a monitoring sink needs.
    */
  def hourlyDq(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("null_props"),
        sum(when(col("value") < 0.0 || col("value") > 1000.0, 1L).otherwise(0L))
          .as("value_range_v"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_user"))
      .select(col("window.start").as("hour_start"), col("n_rows"),
        col("null_props"), col("value_range_v"), col("null_user"))
}
