package graft

import java.nio.file.{Files, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.AttributionStream

/** Checkpoint-recovery contract for the STREAM-STREAM JOIN stateful
  * shape ([[AttributionStream]]) — the third stateful module with
  * restart pins. RecoverySpec covers flatMapGroupsWithState (explicit
  * state, row-level `ts <= watermark` lateness), WindowRecoverySpec
  * covers windowed aggregation (store-evicted windows, WINDOW-level
  * lateness); a watermarked LEFT-OUTER interval join has a different
  * surface again: BOTH sides buffer in the state store, inner matches
  * emit immediately while outer-null rows wait for the watermark to
  * prove no match can arrive, and eviction keys on the join's
  * time-interval bound. The query is killed and restarted from its
  * checkpoint twice, with data landing while it is down, and the
  * accumulated file-sink output must show:
  *
  *   - a match that SPANS the crash joins: the touch was buffered in
  *     run 1's state store, its purchase arrived while the query was
  *     down, the pair emits after restart;
  *   - outer-null timing: an unmatched touch emits NOTHING until the
  *     recovered watermark passes its deadline (tts + join window),
  *     then exactly one null-extended row;
  *   - no duplicate emission: a late purchase for an already-closed
  *     touch must not add a matched row beside the touch's emitted
  *     null row (the lost-bookkeeping signature for joins);
  *   - a touch whose deadline the final watermark never passed is
  *     ABSENT (append-mode contract — the still-open analog of an
  *     unclosed window);
  *   - the accumulated output equals the batch twin over the kept rows,
  *     restricted to closed touches.
  */
class StreamJoinRecoverySpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def jsonRow(id: Long, ts: String, uid: Long, tpe: String): String =
    s"""{"event_id":$id,"ts":"2024-01-01T$ts:00.000Z","user_id":$uid,"event_type":"$tpe","value":1.0,"props":"{}"}"""

  private def drop(dir: java.nio.file.Path, name: String, rows: String*): Unit =
    Files.write(dir.resolve(name), rows.mkString("\n").getBytes,
      StandardOpenOption.CREATE)

  test("kill/restart from checkpoint: crash-spanning match, exact outer-null timing, no duplicate emission") {
    val s = sc
    val in = Files.createTempDirectory("join-rec-in")
    val out = Files.createTempDirectory("join-rec-out").toString
    val chk = Files.createTempDirectory("join-rec-chk").toString

    def start() = AttributionStream
      .touchConversions(s.readStream.schema(schema).json(in.toString))
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .start()

    // ---- run 1: touch T1 (u1) matches purchase P1 inside the batch —
    // inner results emit IMMEDIATELY; unmatched touch T2 (u2) must
    // emit nothing yet (wm after the batch: 10:30 − 10 min = 10:20,
    // below T2's 11:10 outer deadline) ------------------------------
    val q1 = start()
    try {
      drop(in, "f1.json",
        jsonRow(1, "10:00", 1L, "click"), // T1
        jsonRow(2, "10:10", 2L, "view"), // T2 — never matched
        jsonRow(3, "10:30", 1L, "purchase")) // P1
      q1.processAllAvailable()
    } finally q1.stop() // kill #1

    val afterRun1 = s.read.parquet(out)
      .select("tid", "cid").collect().map(r => (r.getLong(0), r.get(1)))
    assert(afterRun1.toSeq == Seq((1L, 3L)),
      s"run 1 must emit exactly the inner match, no outer rows: ${afterRun1.toSeq}")

    // while DOWN: T1's SECOND purchase lands (the crash-spanning match:
    // T1 lives only in run 1's recovered state), plus 12:00 drivers on
    // BOTH sides — the join's global watermark is the MIN of the two
    // sides' watermarks (multipleWatermarkPolicy=min), so advancing
    // only the touch side would leave the purchase watermark at 10:40
    // and T2's null row pinned open. With both at 12:00 the recovered
    // watermark is 11:50 — past T2's 11:10 deadline
    drop(in, "f2.json",
      jsonRow(4, "10:50", 1L, "purchase"), // P2 — matches buffered T1
      jsonRow(5, "12:00", 3L, "signup"), // T3 — unmatched, open
      jsonRow(9, "12:00", 9L, "purchase")) // purchase-side driver, no touch

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop() // kill #2 — wm 11:50

    val afterRun2 = s.read.parquet(out)
      .select("tid", "cid").collect().map(r => (r.getLong(0), r.get(1))).toSet
    assert(afterRun2 == Set((1L, 3L), (1L, 4L), (2L, null)),
      s"run 2 must add the crash-spanning match and T2's null row ONLY: $afterRun2")

    // while DOWN again: a very late purchase for the CLOSED touch T2
    // (below the recovered 11:50 watermark — must vanish, not pair with
    // the already-emitted null row), a fresh touch T4 that stays open,
    // and 13:30+ drivers on BOTH sides taking the min-watermark to
    // 13:20 — past T3's 13:00 deadline, not past T4's 14:00 (or the
    // 14:40 of the touch-side driver itself)
    drop(in, "f3.json",
      jsonRow(6, "10:15", 2L, "purchase"), // late — dropped
      jsonRow(7, "13:00", 4L, "click"), // T4 — stays open, must be absent
      jsonRow(8, "13:30", 5L, "purchase"), // purchase-side driver, no touch
      jsonRow(10, "13:40", 6L, "click")) // touch-side driver, stays open

    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()

    val rows = s.read.parquet(out)
      .select("tid", "channel", "cid").collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(2)))

    // no (touch, purchase) pair twice across the three runs, and no
    // touch with BOTH a null row and matched rows
    val byPair = rows.groupBy(r => (r._1, r._3)).filter(_._2.length > 1)
    assert(byPair.isEmpty, s"join rows emitted more than once: $byPair")
    val nullAndMatch = rows.groupBy(_._1).filter { case (_, rs) =>
      rs.exists(_._3 == null) && rs.exists(_._3 != null) }
    assert(nullAndMatch.isEmpty,
      s"a touch emitted both null and matched rows: $nullAndMatch")

    assert(rows.toSet == Set(
      (1L, "click", 3L), (1L, "click", 4L), // T1's two matches
      (2L, "view", null), // T2: exactly one null row, late P dropped
      (5L, "signup", null)), // T3: null row after wm passed 13:00
      s"accumulated output: ${rows.toSet}") // T4 absent (still open)

    // stream ≡ batch over the kept rows (minus the dropped late
    // purchase), restricted to touches whose deadline the final
    // watermark (13:20) passed
    val batch = AttributionStream.batchTouchConversions(
        s.read.schema(schema).json(in.toString)
          .where(col("event_id") =!= 6L))
      .where(col("tts") + expr("INTERVAL 60 MINUTES") <=
        lit("2024-01-01 13:20:00").cast(TimestampType))
      .select("tid", "channel", "cid").collect()
      .map(r => (r.getLong(0), r.getString(1), r.get(2))).toSet
    assert(rows.toSet == batch, s"stream=${rows.toSet} batch=$batch")
  }
}
