package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GeoOps

/** Streaming nearest-stop assignment — the live twin of
  * `q_nearest_stop`: position events arrive as a file stream and each
  * is assigned its nearest stop against the STATIC stop dimension.
  *
  * The batch query's per-event argmin is a `groupBy(event_id)` over the
  * event×stop cross join — a stateful aggregation a stream cannot run
  * in append mode. Here the argmin is computed PER ROW (the EmbedStream
  * cell-routing pattern): the (tiny, broadcast) stop table is folded
  * into ONE array value riding each event row, every arriving event
  * scores all stops inside its own row (`transform` + `array_min` over
  * (distance, stop_id) structs — ties to the lowest stop id, the exact
  * tiebreak of the batch `min(struct)`), and the result is stateless:
  * no state store, no watermark, per-batch cost O(batch events ·
  * |stops|). Because every operator is stream-safe AND deterministic,
  * the same function runs on a batch DataFrame unchanged — the spec
  * asserts identical output between the two execution modes.
  *
  * Scale: |stops| is a dimension (thousands); the fold-to-array rides
  * a broadcast, so 100 TB of events stream through map-only tasks. A
  * stop dim too big to broadcast degrades to the cell-bucketed join of
  * `q_spatial_join` instead.
  */
object GeoStream {

  /** (event_id, stop_id, dist_m) — nearest stop per arriving event. */
  def nearestStop(spark: SparkSession, events: DataFrame, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(spark)
    val stopsArr = GeoOps.stopsDim(spark, dir)
      .agg(collect_list(struct(col("stop_id"), col("slat"), col("slng"))).as("stops"))
    GeoOps.withCoords(events)
      .crossJoin(broadcast(stopsArr))
      .select(col("event_id"),
        array_min(transform(col("stops"), s =>
          struct(round(GeoOps.haversineM(col("lat"), col("lng"),
              s.getField("slat"), s.getField("slng")), 6).as("d"),
            s.getField("stop_id").as("stop_id")))).as("b"))
      .select(col("event_id"), col("b.stop_id").as("stop_id"),
        col("b.d").as("dist_m"))
  }
}
