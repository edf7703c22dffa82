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

  def eventSchema(tsType: DataType = TimestampType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet.
    *
    * A streaming source needs its schema up front, but `ts` has shipped
    * as both TIMESTAMP(NANOS) (→ INT64 via nanosAsLong) and
    * TIMESTAMP(MICROS) across driver testdata generations — so peek at
    * the parquet footer with a batch read (metadata-only, no data scan)
    * and declare the matching wire schema, normalizing to a session-TZ
    * TimestampType event-time column either way (session TZ is UTC, so
    * the micros path is a pure reinterpretation).
    */
  def readEvents(spark: SparkSession, dir: String, glob: String = "*.parquet"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // an initially-EMPTY ingest directory is the normal streaming
    // cold-start: the peek then has no footer to read, so default to
    // the TIMESTAMP wire type instead of failing stream setup
    val wireTs =
      try spark.read.option("pathGlobFilter", glob).parquet(dir)
        .schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException => TimestampType }
    val raw = spark.readStream
      .schema(eventSchema(if (wireTs == LongType) LongType else TimestampType))
      .option("pathGlobFilter", glob)
      .parquet(dir)
    if (wireTs == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

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

  /** Streaming grid-cell occupancy — the streaming twin of
    * `GeoOps.hfpGeoCells`: deterministic portable coordinates per
    * event (same synthesis constants, shared from GeoOps so batch and
    * streaming can't drift), watermarked tumbling windows per cell.
    * The grid is INTENTIONALLY 10× coarser than the batch CellDeg: a
    * live density board wants bounded state (fewer, bigger cells) over
    * the batch job's analysis resolution.
    */
  private val StreamCellDeg = graft.operators.GeoOps.CellDeg * 10

  def cellOccupancy(events: DataFrame): DataFrame = {
    import graft.operators.GeoOps.{LatModulus, LngModulus, CoordScale}
    val h1 = graft.functions.PortableHash.hash64(col("event_id").cast("string"))
    val h2 = graft.functions.PortableHash.hash64(col("event_id").cast("string"), 7)
    events
      .withColumn("cx", floor((h1 % LatModulus).cast("double") * lit(CoordScale) / StreamCellDeg).cast("long"))
      .withColumn("cy", floor((h2 % LngModulus).cast("double") * lit(CoordScale) / StreamCellDeg).cast("long"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("cx"), col("cy"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("cx"), col("cy"), col("n"))
  }

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

  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  case class OpenSession(startMs: Long, lastMs: Long, n: Long, total: Double)

  /** Streaming sessionization, custom-state tier: the streaming twin of
    * `q_sessionize` (built-in `session_window`) expressed with
    * flatMapGroupsWithState so a session EMITS exactly once — when its
    * gap closes — rather than updating in place. Per user the state is
    * one open session; events extend it while they arrive within
    * `gapMs`, a larger gap inside a batch closes-and-emits
    * intermediate sessions, and the event-time timeout fires once the
    * watermark passes last_seen + gap, emitting the final session and
    * freeing the state. State is O(active users), eviction is
    * data-bounded (event-time, not processing-time — NOTES gotcha #10).
    *
    * Batch events within a micro-batch arrive unordered → sort the
    * batch's rows per key before folding; cross-batch order is
    * guaranteed by the watermark (late rows beyond it were dropped).
    */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapMs: Long = 30 * 60 * 1000L): org.apache.spark.sql.Dataset[SessionOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.lastMs), s.n, s.total))
          } else {
            val sorted = rows.map(r => (r._2.getTime, r._3)).toArray.sortBy(_._1)
            var open = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { case (t, v) =>
              open match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  open = Some(OpenSession(s.startMs, t, s.n + 1, s.total + v))
                case Some(s) =>
                  closed += SessionOut(uid, new java.sql.Timestamp(s.startMs),
                    new java.sql.Timestamp(s.lastMs), s.n, s.total)
                  open = Some(OpenSession(t, t, 1L, v))
                case None =>
                  open = Some(OpenSession(t, t, 1L, v))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1000L))
            }
            closed.iterator
          }
      }
  }

  /** Streaming twin of `MiningOps.qSeqMining`: frequent a→b patterns
    * inside 10-minute tumbling windows, live. Two CHAINED stateful
    * aggregations in append mode (the multiple-stateful-operator tier):
    *
    *  1. per (window, user): collect the window's events, then a
    *     STATELESS projection derives every ordered type pair (a, b)
    *     with first(a) < last(b) in (ts, event_id) order — pure
    *     higher-order array functions over the collected list, no extra
    *     state;
    *  2. per (re-windowed via `window_time`, a, b): count supporting
    *     users — exact as a plain count because step 1 emits one row
    *     per (window, user).
    *
    * State for (1) is bounded by the watermark (a closed window's list
    * is emitted and evicted); (2) holds one counter per (window, pair).
    * Emission happens when the watermark closes the window, so each
    * (win_start, antecedent, consequent, n_users) row appears exactly
    * once — the live counterpart of the batch miner's per-window core.
    */
  def seqPatterns(events: DataFrame): DataFrame = {
    val lst = col("evs")
    val types = array_distinct(transform(lst, x => x.getField("event_type")))
    def firstOf(t: org.apache.spark.sql.Column) = array_min(
      filter(lst, x => x.getField("event_type") === t))
    def lastOf(t: org.apache.spark.sql.Column) = array_max(
      filter(lst, x => x.getField("event_type") === t))
    val pairs = filter(
      flatten(transform(types, a => transform(types, b => struct(a.as("a"), b.as("b"))))),
      p => p.getField("a") =!= p.getField("b") &&
        firstOf(p.getField("a")) < lastOf(p.getField("b")))
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
      // (ts, event_id) leads the struct so array_min/max = occurrence order
      .agg(collect_list(struct(col("ts"), col("event_id"), col("event_type"))).as("evs"))
      .select(col("window"), col("user_id"), explode(pairs).as("p"))
      .groupBy(window(window_time(col("window")), "10 minutes"),
        col("p.a").as("antecedent"), col("p.b").as("consequent"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("window.start").as("win_start"),
        col("antecedent"), col("consequent"), col("n_users"))
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
