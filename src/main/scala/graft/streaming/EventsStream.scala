package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Structured Streaming variant of the ingest pipeline (SURVEY.md §7
  * Phase 3): the reference is a batch-per-day job whose late-data story
  * is "re-run the day, dedup makes it idempotent" (hfpStorage.ts:15-16).
  * The streaming build replaces that with a file-source stream +
  * watermark, keeping the same cast/filter/route stages.
  *
  * Scale notes: the file source discovers new files incrementally (the
  * blob-archive analog); state for the windowed aggregation is bounded
  * by the watermark; `foreachBatch` reuses the batch JDBC/parquet sink
  * so exactly the same routing + dedup code serves both modes — one
  * pipeline, two execution modes, which is the Spark-native answer to
  * the reference's single-purpose loader.
  */
object EventsStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos-as-long at the wire (TESTDATA)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet. */
  def readEvents(spark: SparkSession, dir: String, glob: String = "*.parquet"): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("pathGlobFilter", glob)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Tumbling-window aggregation with a watermark: the streaming twin
    * of Analytics.qTumblingWindow. Late rows beyond 10 minutes are
    * dropped — the state-bounding contract a 24/7 ingest needs.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window aggregation (1 h window, 15 min slide): each event
    * contributes to 4 overlapping windows — trend smoothing over the
    * stream. State per key is bounded by the same watermark contract as
    * the tumbling twin.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** foreachBatch sink wiring: each micro-batch flows through the same
    * batch write path (JDBC in production, parquet in the harness) —
    * the streaming equivalent of the reference's insert queue, with
    * idempotency provided by the same anti-join dedup when re-processed.
    */
  def sinkTo(df: DataFrame, writeBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => writeBatch(batch, id) }

  case class UserCount(user_id: Long, n: Long)

  /** Custom streaming state via mapGroupsWithState: a running per-user
    * event count that survives across micro-batches. State is bounded
    * by key cardinality (or a configured timeout for expiring users) —
    * the `KeyValueGroupedDataset` custom-state tier below windowed aggs.
    */
  def runningUserCounts(spark: SparkSession, events: DataFrame) = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          UserCount(uid, n)
      }
  }

  /** Streaming exact dedup, built-in tier: watermark-bounded state via
    * `dropDuplicatesWithinWatermark` — duplicates arriving within the
    * watermark horizon are dropped, and state for keys older than the
    * horizon is evicted automatically. This is the streaming twin of
    * the reference's per-day in-memory key set (hfpTask.ts:105-115),
    * with the watermark playing the day boundary: bounded state on an
    * unbounded key space.
    */
  def dedupWithinWatermark(events: DataFrame, horizon: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming exact dedup, custom-state tier: flatMapGroupsWithState
    * with a sliding event-time TTL. First occurrence of a key emits;
    * repeats drop; a key's state is removed once the watermark passes
    * its NEWEST sighting + ttl — each duplicate renews the clock, which
    * watermark dedup cannot express (dropDuplicatesWithinWatermark
    * anchors expiry to the FIRST sighting). Event-time (not
    * processing-time) timeouts matter operationally: pending
    * processing-time timeouts keep scheduling micro-batches forever
    * under Trigger.AvailableNow — event-time timeouts are data-bounded.
    */
  def dedupWithTtl(spark: SparkSession, events: DataFrame,
      ttlMs: Long = 10 * 60 * 1000L): org.apache.spark.sql.Dataset[Long] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts")).as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (id: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seenBefore = state.exists
            state.update(true)
            val newest = rows.map(_._2.getTime).max
            // the timeout must sit above the current watermark; late
            // keys (watermark already past newest+ttl) expire next tick
            val target = math.max(newest + ttlMs, state.getCurrentWatermarkMs() + 1000L)
            state.setTimeoutTimestamp(target)
            if (seenBefore) Iterator.empty
            else Iterator.single(id) // first sighting wins; batch-mates drop
          }
      }
  }

  /** Synchronous smoke runner for tests: memory sink, drain, return. */
  def runToMemory(spark: SparkSession, agg: DataFrame, name: String): StreamingQuery = {
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }
}
