package graft

import java.nio.file.{Files, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.IncrStream

/** Checkpoint-recovery contract for the correction-stream MV
  * maintenance ([[IncrStream]]): twelve modules pin stream ≡ batch
  * equality, but the revision design exists for RESTART semantics, and
  * nothing pinned those until this suite. A query is killed mid-stream
  * and restarted from its checkpoint twice, with data landing while it
  * is down, and the accumulated file-sink output must show:
  *
  *   - per-key revisions stay STRICTLY monotone across restarts
  *     (contiguous 1..max, no duplicate emission of a committed batch,
  *     no rev reset — i.e. the state store actually recovered);
  *   - the watermark recovers too, pinned AT the boundary: Spark's
  *     stateful late filter drops `ts <= watermark` INCLUSIVE, so a
  *     row exactly at the recovered watermark is dropped and one a
  *     minute above it is kept, both arriving while the query was down;
  *   - no finalized key resurrects: a late row for a finalized hour is
  *     dropped by the recovered watermark, never re-creating state;
  *   - final totals equal [[IncrStream.batchHourlyTotals]] over the
  *     kept rows (stream ≡ batch through two crashes).
  */
class RecoverySpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def jsonRow(id: Long, ts: String): String =
    s"""{"event_id":$id,"ts":"2024-01-01T$ts:00.000Z","user_id":1,"event_type":"a","value":1.5,"props":"{}"}"""

  private def drop(dir: java.nio.file.Path, name: String, rows: String*): Unit =
    Files.write(dir.resolve(name), rows.mkString("\n").getBytes,
      StandardOpenOption.CREATE)

  test("kill/restart from checkpoint: monotone revisions, recovered watermark boundary, no resurrection, batch-equal totals") {
    val s = sc
    val in = Files.createTempDirectory("incr-rec-in")
    val out = Files.createTempDirectory("incr-rec-out").toString
    val chk = Files.createTempDirectory("incr-rec-chk").toString

    def start() = IncrStream
      .correctedHourlyTotals(s, s.readStream.schema(schema).json(in.toString))
      .toDF()
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .start()

    // ---- run 1: two hour-10 rows + the watermark driver ------------
    val q1 = start()
    try {
      drop(in, "f1.json", jsonRow(1, "10:00"), jsonRow(2, "10:20"), jsonRow(3, "11:05"))
      q1.processAllAvailable()
    } finally q1.stop() // kill #1 — watermark for the NEXT batch is 10:55

    // data lands while the query is DOWN: the recovered watermark must
    // keep the 10:56 row and drop the row AT the watermark — Spark's
    // stateful late filter is `ts <= watermark` (inclusive drop), so
    // 10:55 is the last dropped instant. A lost watermark would admit
    // both; a lost state store would emit rev 1 instead of rev 2.
    drop(in, "f2.json", jsonRow(4, "10:56"), jsonRow(5, "10:55"), jsonRow(6, "12:30"))

    // ---- run 2: recover, absorb f2, then advance far enough for the
    // hour-10/11 event-time timeouts (wm 12:20 after f2's 12:30) -----
    val q2 = start()
    try {
      q2.processAllAvailable()
      drop(in, "f3.json", jsonRow(7, "13:30"))
      q2.processAllAvailable()
    } finally q2.stop() // kill #2 — hours 10 & 11 finalized

    // a late row for the FINALIZED hour 10 lands while down: the
    // recovered watermark (13:20) must drop it before the state
    // function, so the freed key can never be re-created
    drop(in, "f4.json", jsonRow(8, "10:59"), jsonRow(9, "14:30"))

    val q3 = start()
    try { q3.processAllAvailable() } finally q3.stop()

    val rows = s.read.parquet(out)
      .select("hour_start", "revision", "n", "sum_cents", "is_final")
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(13), r.getInt(1),
        r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val byHour = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    // revisions contiguous 1..max per key: a replayed committed batch
    // would duplicate a revision; a lost state store would restart at 1
    byHour.foreach { case (h, rs) =>
      val revs = rs.map(_._2).toSeq
      assert(revs == (1 to revs.max).toSeq,
        s"$h: revisions not contiguous-monotone across restarts: $revs")
    }

    // watermark boundary recovered exactly: hour-10's post-restart
    // correction counts the wm + 1 min row (10:56) but not the ts == wm
    // row (10:55, dropped by the INCLUSIVE `ts <= watermark` filter)
    val h10 = byHour("2024-01-01 10")
    assert(h10.map(x => (x._2, x._3, x._5)).toSeq ==
      Seq((1, 2L, false), (2, 3L, false), (3, 3L, true)),
      s"hour-10 sequence wrong (boundary or state not recovered): $h10")
    assert(h10.last._4 == 450L, s"hour-10 cents: $h10")

    // finals exist for the hours the recovered watermark passed, each
    // is the key's LAST revision, and the resurrected-row probe (10:59,
    // dropped at wm 13:20) produced nothing after hour-10's final
    Seq("2024-01-01 10", "2024-01-01 11").foreach { h =>
      val rs = byHour(h)
      assert(rs.count(_._5) == 1, s"$h: expected exactly one final: $rs")
      assert(rs.last._5, s"$h: a row after the final — key resurrected: $rs")
    }

    // stream ≡ batch through two crashes: last revision per key carries
    // the batch twin's totals over the KEPT rows (everything except the
    // two watermark-dropped probes)
    val kept = s.read.schema(schema).json(in.toString)
      .where(!col("event_id").isin(5L, 8L))
    val want = IncrStream.batchHourlyTotals(kept).collect()
      .map(r => r.getTimestamp(0).toString.take(13) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val got = byHour.view.mapValues(rs => (rs.last._3, rs.last._4)).toMap
    assert(got == want, s"stream=$got batch=$want")
  }
}
