package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming touch→conversion attribution — the stream-stream
  * INTERVAL-JOIN twin of [[graft.operators.TimeSeriesOps.qAttribution]]
  * (batch first/last-touch attribution), and the third stateful shape
  * in the repo's recovery matrix: [[IncrStream]]/RecoverySpec pin
  * flatMapGroupsWithState (explicit state, row-level lateness),
  * [[EventsStream]]/WindowRecoverySpec pin windowed aggregation
  * (store-evicted windows, WINDOW-level lateness); a watermarked
  * stream-stream join buffers BOTH sides in the state store, evicts by
  * the join's time-interval bound, and emits LEFT-OUTER null rows only
  * when the watermark proves no match can still arrive — a third,
  * different failure surface under crash/restart
  * (StreamJoinRecoverySpec).
  *
  * Semantics: every non-purchase touchpoint seeks the same user's
  * purchases within [[JoinWindowMinutes]] minutes AFTER the touch;
  * matches emit as soon as both sides have arrived (append-mode inner
  * results), and a touch that the watermark proves unmatched emits
  * exactly one null-extended row. 10-minute watermark delay on both
  * sides, matching the repo's other streaming modules.
  */
object AttributionStream {

  val JoinWindowMinutes = 60
  val DelayMinutes = 10

  /** touches ⟕ purchases within the attribution window, on a streaming
    * events frame (schema [[EventsStream.eventSchema]]).
    */
  def touchConversions(events: DataFrame): DataFrame = {
    val touches = events.where(col("event_type") =!= "purchase")
      .select(col("event_id").as("tid"), col("ts").as("tts"),
        col("user_id").as("t_user"), col("event_type").as("channel"))
      .withWatermark("tts", s"$DelayMinutes minutes")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("cid"), col("ts").as("cts"),
        col("user_id").as("p_user"))
      .withWatermark("cts", s"$DelayMinutes minutes")
    touches.join(purchases,
        expr(s"""t_user = p_user AND cts >= tts AND
                 cts <= tts + INTERVAL $JoinWindowMinutes MINUTES"""),
        "leftOuter")
      .select(col("tid"), col("channel"), col("tts"),
        col("t_user").as("user_id"), col("cid"), col("cts"))
  }

  /** The batch twin over an already-landed events frame: the same
    * left-outer interval join. The recovery spec compares the stream's
    * accumulated output to this over the KEPT rows, restricted to
    * touches whose outer deadline (tts + window) the final watermark
    * passed — the append-mode contract (a still-open touch has emitted
    * nothing yet, exactly like an unclosed window in the aggregation
    * twin).
    */
  def batchTouchConversions(events: DataFrame): DataFrame = {
    val touches = events.where(col("event_type") =!= "purchase")
      .select(col("event_id").as("tid"), col("ts").as("tts"),
        col("user_id").as("t_user"), col("event_type").as("channel"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("cid"), col("ts").as("cts"),
        col("user_id").as("p_user"))
    touches.join(purchases,
        expr(s"""t_user = p_user AND cts >= tts AND
                 cts <= tts + INTERVAL $JoinWindowMinutes MINUTES"""),
        "leftOuter")
      .select(col("tid"), col("channel"), col("tts"),
        col("t_user").as("user_id"), col("cid"), col("cts"))
  }
}
