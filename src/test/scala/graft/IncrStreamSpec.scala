package graft

import java.nio.file.{Files, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{EventsStream, IncrStream}

/** The 12th streaming module's contract: the correction stream's LAST
  * revision per (hour, type) equals the batch state ⊎ delta totals
  * (stream ≡ batch), revisions increase monotonically, a late-but-in-
  * horizon row produces a VISIBLE correction row (not a silent
  * overwrite), a beyond-horizon row produces nothing, and the
  * event-time timeout emits exactly one final row per key.
  */
class IncrStreamSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def jsonRow(id: Long, ts: String, typ: String = "a", v: Double = 1.5): String =
    s"""{"event_id":$id,"ts":"2024-01-01T$ts:00.000Z","user_id":1,"event_type":"$typ","value":$v,"props":"{}"}"""

  private def stream(dir: String): DataFrame =
    spark.readStream.schema(schema).json(dir)

  private def drop(dir: java.nio.file.Path, name: String, rows: String*): Unit =
    Files.write(dir.resolve(name), rows.mkString("\n").getBytes,
      StandardOpenOption.CREATE)

  test("correction stream's last revision per key equals the batch totals") {
    val s = sc
    val events = EventsStream.readEvents(s, sfDir, "events.parquet")
    assert(events.isStreaming)
    val q = EventsStream.runToMemory(s,
      IncrStream.correctedHourlyTotals(s, events).toDF(), "incr_stream_eq")
    try {
      val got = s.sql(
        """SELECT hour_start, event_type, n, sum_cents FROM (
          |  SELECT *, row_number() OVER (PARTITION BY hour_start, event_type
          |    ORDER BY revision DESC) AS rk FROM incr_stream_eq) WHERE rk = 1
          |""".stripMargin)
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(got.nonEmpty, "no corrections emitted")
      val batch = IncrStream.batchHourlyTotals(graft.sources.Tables(s, sfDir, "events"))
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // every emitted key must carry exactly the batch totals (cents
      // quantization makes the comparison exact under any batch split)
      got.foreach { case (k, v) =>
        assert(batch.get(k).contains(v), s"key $k: stream=$v batch=${batch.get(k)}")
      }
      // AvailableNow lands everything in one batch, so every key emits
      assert(got.size == batch.size, s"emitted=${got.size} batch=${batch.size}")
    } finally q.stop()
  }

  test("late rows: in-horizon emits a visible correction, beyond-horizon emits nothing, timeout finalizes once") {
    val in = Files.createTempDirectory("incr-corr-in")
    val corr = IncrStream.correctedHourlyTotals(spark, stream(in.toString)).toDF()
    val q = corr.writeStream.outputMode("append")
      .format("memory").queryName("incr_corrections").start()
    try {
      // batch 1: two hour-10 rows (rev 1, n = 2); 11:05 sets the NEXT
      // batch's watermark to 10:55
      drop(in, "f1.json", jsonRow(1, "10:00"), jsonRow(2, "10:20"), jsonRow(3, "11:05"))
      q.processAllAvailable()
      // batch 2 (wm = 10:55): 10:58 is late but in-horizon → rev 2
      // correction with n = 3; 09:30 is beyond horizon (ts < wm) →
      // dropped before the state function, hour 09 never appears;
      // 12:30 advances the next watermark to 12:20 > 11:00 + 10 min,
      // arming hour-10's timeout
      drop(in, "f2.json", jsonRow(4, "10:58"), jsonRow(5, "09:30"), jsonRow(6, "12:30"))
      q.processAllAvailable()
      // batch 3 (wm = 12:20): hour-10's timeout fires → final row
      drop(in, "f3.json", jsonRow(7, "13:30"))
      q.processAllAvailable()

      val rows = spark.sql(
        """SELECT hour_start, revision, n, sum_cents, is_final
          |FROM incr_corrections WHERE event_type = 'a'
          |ORDER BY hour_start, revision""".stripMargin)
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))
      // the final row takes rev 3 (last correction + 1) so a
      // max-revision upsert is never ambiguous between the final and
      // its same-totals correction
      val h10 = rows.filter(_._1.startsWith("2024-01-01 10:00"))
      assert(h10.map(x => (x._2, x._3, x._5)).toSeq ==
        Seq((1, 2L, false), (2, 3L, false), (3, 3L, true)),
        s"hour-10 correction sequence wrong: ${h10.mkString(", ")}")
      // cents fold: 3 rows × 1.5 = 450 cents on the corrected revision
      assert(h10.last._4 == 450L, s"cents total: ${h10.mkString(", ")}")
      assert(!rows.exists(_._1.startsWith("2024-01-01 09:00")),
        s"beyond-horizon row resurrected a dead window: ${rows.mkString(", ")}")
      // exactly one final per emitted key, each after its last correction
      rows.groupBy(_._1).foreach { case (h, rs) =>
        assert(rs.count(_._5) <= 1, s"multiple finals for $h: ${rs.mkString(", ")}")
      }
    } finally q.stop()
  }
}
