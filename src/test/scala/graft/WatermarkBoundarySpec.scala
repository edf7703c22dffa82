package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.EventsStream

/** Late-data contract at the watermark boundary, driven with REAL
  * micro-batch sequencing (one file per processAllAvailable round, so
  * the watermark genuinely advances between arrivals — the static
  * AvailableNow specs can't observe lateness because everything lands
  * in one batch):
  *
  *  - a late row INSIDE the horizon is accepted into its (still-open)
  *    window;
  *  - a late row BEYOND the horizon (window end ≤ watermark) is
  *    dropped entirely;
  *  - watermark dedup drops a duplicate while its key state is live
  *    and accepts the key again after the horizon evicts it — the
  *    bounded-state trade the batch anti-join dedup doesn't have to
  *    make.
  */
class WatermarkBoundarySpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def jsonRow(id: Long, ts: String, typ: String = "a"): String =
    s"""{"event_id":$id,"ts":"2024-01-01T$ts:00.000Z","user_id":1,"event_type":"$typ","value":1.0,"props":"{}"}"""

  private def stream(dir: String): DataFrame =
    spark.readStream.schema(schema).json(dir)

  private def drop(dir: java.nio.file.Path, name: String, rows: String*): Unit =
    Files.write(dir.resolve(name), rows.mkString("\n").getBytes,
      StandardOpenOption.CREATE)

  test("windowed agg: in-horizon late row accepted, beyond-horizon late row dropped") {
    val in = Files.createTempDirectory("wm-agg-in")
    val agg = EventsStream.hourlyCounts(stream(in.toString))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_boundary_agg").start()
    try {
      // batch 1: window [10:00,11:00) opens; max ts 11:05 will set the
      // watermark for the NEXT batch to 10:55 (10 min horizon)
      drop(in, "f1.json", jsonRow(1, "10:00"), jsonRow(2, "11:05"))
      q.processAllAvailable()
      // batch 2 (wm = 10:55): 10:58 is late but inside the horizon →
      // joins window [10:00,11:00); 09:30's window end 10:00 ≤ wm →
      // dropped outright; 12:10 advances the next watermark to 12:00
      drop(in, "f2.json", jsonRow(3, "10:58"), jsonRow(4, "09:30"),
        jsonRow(5, "12:10"))
      q.processAllAvailable()
      // batch 3 (wm = 12:00): finalizes [10:00,11:00) and [11:00,12:00)
      drop(in, "f3.json", jsonRow(6, "13:30"))
      q.processAllAvailable()

      val rows = spark.sql(
        "SELECT hour_start, n FROM wm_boundary_agg ORDER BY hour_start")
        .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1))
      assert(rows.toMap.get("2024-01-01 10:00:00.0").contains(2L),
        s"in-horizon late row must join its window: ${rows.mkString(", ")}")
      assert(!rows.exists(_._1.startsWith("2024-01-01 09:00")),
        s"beyond-horizon late row leaked a dead window: ${rows.mkString(", ")}")
      assert(rows.toMap.get("2024-01-01 11:00:00.0").contains(1L))
    } finally q.stop()
  }

  test("watermark dedup: duplicate drops while state lives, re-accepts after eviction") {
    val in = Files.createTempDirectory("wm-dedup-in")
    val dedup = EventsStream.dedupWithinWatermark(stream(in.toString))
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("wm_boundary_dedup").start()
    try {
      // batch 1: both ids emit; max ts 10:52 sets the next watermark
      // to 10:42 — id 1's state (expiry 10:00 + 10 min = 10:10) is
      // evicted, id 2's (expiry 11:02) stays live
      drop(in, "f1.json", jsonRow(1, "10:00"), jsonRow(2, "10:52"))
      q.processAllAvailable()
      // batch 2: id 1 re-appears after eviction → accepted again;
      // id 2 re-appears within its horizon → dropped
      drop(in, "f2.json", jsonRow(1, "10:43"), jsonRow(2, "10:53"))
      q.processAllAvailable()

      val counts = spark.sql(
        "SELECT event_id, count(*) FROM wm_boundary_dedup GROUP BY event_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(counts.get(1L).contains(2L),
        s"evicted key must re-emit (bounded-state contract): $counts")
      assert(counts.get(2L).contains(1L),
        s"live-state duplicate must drop: $counts")
    } finally q.stop()
  }
}
