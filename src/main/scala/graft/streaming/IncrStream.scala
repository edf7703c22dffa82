package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of `q_incr_agg`'s state ⊎ delta maintenance, with an
  * EXPLICIT correction stream (the 12th streaming module — r7 item 7):
  * per (hour, event_type) the running totals are custom state, every
  * micro-batch that touches a key folds its delta in and emits a
  * CORRECTION row carrying the corrected cumulative totals and a
  * monotonically increasing revision, and the event-time timeout
  * emits one FINAL row (is_final = true) when the watermark passes
  * window end + horizon, then frees the state.
  *
  * Why corrections instead of update-mode rewrites: the sink gets an
  * append-only log it can upsert by (window, type) taking max
  * revision — replayable, auditable (every late-arrival correction is
  * a visible row, not an in-place overwrite), and compatible with
  * append-only sinks (files, queues). This is the streaming
  * materialized-view maintenance `q_incr_agg` does in batch, plus the
  * late-data story the batch job solves by re-running the day.
  *
  * Determinism: the value total is kept in CENTS (Long) — additive and
  * associative, so batch/stream equality is exact regardless of how
  * rows split across micro-batches (the repo's DECIMAL-quantization
  * rule; a Double fold would drift with arrival order).
  *
  * Scale: state is one small row per OPEN (hour, type) — bounded by
  * the watermark horizon, not the stream length; eviction is
  * event-time (data-bounded under Trigger.AvailableNow — NOTES gotcha
  * #10). Late rows beyond the horizon are dropped by the watermark
  * filter BEFORE reaching the state function, so a finalized key can
  * never be resurrected.
  */
object IncrStream {

  private val HourMs = 3600L * 1000

  case class RunningTotals(n: Long, sumCents: Long, rev: Int)

  case class Correction(hour_start: Timestamp, event_type: String,
    revision: Int, n: Long, sum_cents: Long, is_final: Boolean)

  /** The correction stream (see object doc). `horizonMs` must match
    * the `horizon` string — both are exposed so tests can pin the
    * boundary exactly.
    */
  def correctedHourlyTotals(spark: SparkSession, events: DataFrame,
      horizon: String = "10 minutes",
      horizonMs: Long = 10L * 60 * 1000): Dataset[Correction] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .withWatermark("ts", horizon)
      // ts stays in the projection: the watermark's late-row filter
      // needs the event-time column in the state operator's input
      .select(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"),
        // quantize before the fold — exact under any batch split
        round(col("value") * 100).cast("long").as("cents"),
        col("ts"))
      .as[(Timestamp, String, Long, Timestamp)]
      .groupByKey(r => (r._1.getTime, r._2))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), rows: Iterator[(Timestamp, String, Long, Timestamp)],
         state: GroupState[RunningTotals]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            // rev + 1: the final row must outrank the last correction
            // so a max-revision upsert is unambiguous (same totals,
            // but is_final flips — ties would leave the sink's pick
            // undefined)
            Iterator.single(Correction(new Timestamp(key._1), key._2,
              s.rev + 1, s.n, s.sumCents, is_final = true))
          } else {
            var n = 0L
            var cents = 0L
            rows.foreach { r => n += 1; cents += r._3 }
            val prev = state.getOption.getOrElse(RunningTotals(0L, 0L, 0))
            val upd = RunningTotals(prev.n + n, prev.sumCents + cents, prev.rev + 1)
            state.update(upd)
            // finalize once the watermark passes window end + horizon;
            // the max() keeps the target legal when the key is already
            // deep in the past (final then fires next tick)
            state.setTimeoutTimestamp(math.max(key._1 + HourMs + horizonMs,
              state.getCurrentWatermarkMs() + 1000L))
            Iterator.single(Correction(new Timestamp(key._1), key._2,
              upd.rev, upd.n, upd.sumCents, is_final = false))
          }
      }
  }

  /** The batch twin the equality spec compares against: one aggregate
    * per (hour, type) with the same cents quantization.
    */
  def batchHourlyTotals(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
}
