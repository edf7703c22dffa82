package graft

import java.nio.file.{Files, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.EventsStream

/** Checkpoint-recovery contract for the WINDOWED-AGGREGATION stateful
  * shape ([[EventsStream.hourlyCounts]]) — the second stateful module
  * with restart pins. [[RecoverySpec]] covers flatMapGroupsWithState
  * (explicit state, explicit timeouts); watermarked windowed
  * aggregation in append mode has a DIFFERENT failure surface: the
  * window is emitted by the state store's eviction pass (not by user
  * code), so a lost or replayed state store shows up as a duplicated
  * or short-counted window row, and the sink's exactly-once bookkeeping
  * (file-sink commit log) must survive the same crashes. The query is
  * killed and restarted from its checkpoint twice, with data landing
  * while it is down, and the accumulated file-sink output must show:
  *
  *   - every (hour, event_type) window appears EXACTLY ONCE across all
  *     three runs — a replayed committed micro-batch or a lost
  *     "already emitted" marker would duplicate it; a lost state store
  *     would emit a second, partial row for the same window;
  *   - a window that was OPEN at the crash absorbs rows that landed
  *     while the query was down and emits the COMBINED aggregate after
  *     restart (partial counts prove the store didn't recover);
  *   - the watermark recovers, and its admission rule for aggregation
  *     is the WINDOW-level one, NOT RecoverySpec's row-level
  *     `ts <= watermark` drop: a row whose event time is AT (even
  *     below) the recovered watermark still counts as long as its
  *     window's END is above the watermark — the group key governs
  *     lateness, the raw timestamp does not (measured and pinned here,
  *     because porting the flatMapGroupsWithState intuition to windows
  *     silently mispredicts which rows survive a crash);
  *   - a very late row whose WINDOW the recovered watermark already
  *     closed is dropped: no duplicate, no new row for that window;
  *   - emitted rows equal the batch twin (same grouping over the kept
  *     rows) for every window the final watermark closed, and a window
  *     the watermark never closed is absent (append-mode contract).
  */
class WindowRecoverySpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def jsonRow(id: Long, ts: String, tpe: String, v: Double): String =
    s"""{"event_id":$id,"ts":"2024-01-01T$ts:00.000Z","user_id":1,"event_type":"$tpe","value":$v,"props":"{}"}"""

  private def drop(dir: java.nio.file.Path, name: String, rows: String*): Unit =
    Files.write(dir.resolve(name), rows.mkString("\n").getBytes,
      StandardOpenOption.CREATE)

  test("kill/restart from checkpoint: windows emit exactly once, combined across the crash, behind the recovered watermark") {
    val s = sc
    val in = Files.createTempDirectory("win-rec-in")
    val out = Files.createTempDirectory("win-rec-out").toString
    val chk = Files.createTempDirectory("win-rec-chk").toString

    def start() = EventsStream
      .hourlyCounts(s.readStream.schema(schema).json(in.toString))
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .start()

    // ---- run 1: hour-10 rows + the watermark driver (wm -> 10:55,
    // below the window end, so NOTHING may emit before the crash) ----
    val q1 = start()
    try {
      drop(in, "f1.json",
        jsonRow(1, "10:00", "a", 1.0), jsonRow(2, "10:20", "a", 2.0),
        jsonRow(3, "10:40", "b", 4.0), jsonRow(4, "11:05", "a", 8.0))
      q1.processAllAvailable()
    } finally q1.stop() // kill #1 — watermark for the NEXT batch is 10:55

    val afterRun1 =
      try s.read.parquet(out).count() catch { case _: Exception => 0L }
    assert(afterRun1 == 0L,
      s"hour-10 emitted before the watermark passed its end: $afterRun1 rows")

    // data lands while the query is DOWN: both hour-10 rows must
    // survive the recovered watermark — including the one AT the
    // watermark (10:55), because the aggregation late filter keys on
    // the WINDOW's end (11:00 > 10:55), not on the row's timestamp
    // (the custom-state path would have dropped it, ts <= wm — the
    // semantic fork this suite exists to pin); the 12:30 row advances
    // the watermark far enough to close hours 10-11
    drop(in, "f2.json",
      jsonRow(5, "10:56", "a", 16.0), jsonRow(6, "10:55", "b", 32.0),
      jsonRow(7, "12:30", "c", 64.0))

    // ---- run 2: recover, absorb f2, emit hours 10 and 11 -----------
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop() // kill #2 — wm 12:20

    // very late row for the EMITTED hour-10 'a' window lands while
    // down (must vanish behind the recovered 12:20 watermark — a
    // duplicate row here is the lost-bookkeeping signature); the 13:30
    // row closes hour 12
    drop(in, "f3.json",
      jsonRow(8, "10:30", "a", 100.0), jsonRow(9, "13:30", "d", 128.0))

    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()

    val rows = s.read.parquet(out)
      .select("hour_start", "event_type", "n", "sum_value")
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(13), r.getString(1),
        r.getLong(2), r.getDouble(3)))

    // exactly-once: no (window, type) appears twice across three runs
    val dupes = rows.groupBy(x => (x._1, x._2)).filter(_._2.length > 1)
    assert(dupes.isEmpty, s"windows emitted more than once: $dupes")

    val got = rows.map(x => (x._1, x._2) -> (x._3, x._4)).toMap
    // hour-10 'a' combines the pre-crash rows with the while-down
    // 10:56 row (3 rows, 19.0); hour-10 'b' INCLUDES the ts == wm row
    // (its window was still open — the window-level admission rule);
    // hour-11 'a' and hour-12 'c' emit once each; the very late
    // hour-10 row (window closed at the recovered 12:20 watermark) and
    // the still-open hour-13 window emit nothing
    assert(got == Map(
      ("2024-01-01 10", "a") -> (3L, 19.0),
      ("2024-01-01 10", "b") -> (2L, 36.0),
      ("2024-01-01 11", "a") -> (1L, 8.0),
      ("2024-01-01 12", "c") -> (1L, 64.0)), s"emitted windows: $got")

    // stream ≡ batch over the kept rows for every window the final
    // watermark (13:20) closed — the batch twin is the same grouping
    // expression over the input minus the ONE dropped probe (the
    // closed-window row; the ts == wm row was legitimately admitted)
    val closed = s.read.schema(schema).json(in.toString)
      .where(col("event_id") =!= 8L)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .where(col("window.end") <= lit("2024-01-01 13:20:00").cast(TimestampType))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(13), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == closed, s"stream=$got batch=$closed")
  }
}
