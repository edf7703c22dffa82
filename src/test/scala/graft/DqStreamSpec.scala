package graft

import org.apache.spark.sql.functions._
import graft.streaming.{DqStream, EventsStream}

/** The streaming DQ monitor must report exactly the batch counters on
  * every window the watermark closes.
  */
class DqStreamSpec extends SparkSuite {

  test("streaming hourly DQ counters match the batch computation on emitted windows") {
    val s = sc
    val stream = EventsStream.readEvents(s, sfDir, "events.parquet")
    assert(stream.isStreaming)
    val q = EventsStream.runToMemory(s, DqStream.hourlyDq(stream), "dq_stream_test")
    try {
      val got = s.sql(
        "SELECT hour_start, n_rows, null_props, value_range_v, null_user FROM dq_stream_test")
        .collect()
        .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      assert(got.nonEmpty, "no windows emitted")
      val batch = graft.sources.Tables(s, sfDir, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("props").isNull, 1L).otherwise(0L)).as("np"),
          sum(when(col("value") < 0.0 || col("value") > 1000.0, 1L).otherwise(0L)).as("vr"),
          sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("nu"))
        .select(col("window.start").as("h"), col("n"), col("np"), col("vr"), col("nu"))
        .collect()
        .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      got.foreach { case (h, v) =>
        assert(batch.get(h).contains(v), s"window $h: stream=$v batch=${batch.get(h)}")
      }
      // the watermark may hold back only the trailing window(s)
      assert(got.size >= batch.size - 2, s"emitted=${got.size} batch=${batch.size}")
    } finally q.stop()
  }
}
