package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** The streaming twin produces the same hourly aggregation the batch
  * query does (modulo windows held back by the final watermark).
  */
class StreamingSpec extends SparkSuite {

  test("file-source stream + watermark + tumbling window drains to memory") {
    val events = EventsStream.readEvents(sc, sfDir, "events.parquet")
    assert(events.isStreaming)
    val agg = EventsStream.hourlyCounts(events)
    val q = EventsStream.runToMemory(spark, agg, "hourly_test")
    try {
      val got = spark.sql("SELECT * FROM hourly_test")
        .collect().map(r => (r.getAs[java.sql.Timestamp]("hour_start"), r.getAs[String]("event_type")) -> r.getAs[Long]("n")).toMap
      // batch truth
      val batch = graft.operators.Analytics.queries("q_tumbling_window")(spark, sfDir)
        .collect().map(r => (r.getAs[java.sql.Timestamp]("hour_start"), r.getAs[String]("event_type")) -> r.getAs[Long]("n")).toMap
      assert(got.nonEmpty)
      // every emitted streaming window agrees with the batch result
      got.foreach { case (k, n) => assert(batch(k) == n, s"window $k") }
    } finally q.stop()
  }
}
