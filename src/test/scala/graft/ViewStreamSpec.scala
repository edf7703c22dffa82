package graft

import org.apache.spark.sql.functions._
import graft.streaming.{EventsStream, ViewStream}

/** Streaming view maintenance: the delta emitted by the stream must be
  * exactly what the batch formulation computes, and folding every
  * delta must reconcile with `q_incr_join`'s full-recompute verdict —
  * the stream IS the incremental side of that identity.
  */
class ViewStreamSpec extends SparkSuite {

  test("stream and batch execution of the view delta are identical") {
    val s = sc
    val cust = graft.sources.Tables(s, sfDir, "customer")
    val stream = ViewStream.readOrders(s, sfDir, "orders.parquet")
    assert(stream.isStreaming)
    val q = EventsStream.runToMemory(s,
      ViewStream.viewDelta(s, stream, cust), "view_delta_test")
    try {
      val got = s.sql("SELECT * FROM view_delta_test").collect()
        .map(_.toString).toSet
      val batchSide = ViewStream.viewDelta(s,
        graft.sources.Tables(s, sfDir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
        cust).collect().map(_.toString).toSet
      assert(got.nonEmpty)
      assert(got == batchSide, s"stream=${got.size} batch=${batchSide.size}")
    } finally q.stop()
  }

  test("folded deltas reconcile with the batch full recompute") {
    val s = sc
    val cust = graft.sources.Tables(s, sfDir, "customer")
    val stream = ViewStream.readOrders(s, sfDir, "orders.parquet")
    val q = EventsStream.runToMemory(s,
      ViewStream.viewDelta(s, stream, cust), "view_fold_test")
    try {
      val folded = s.sql(
        "SELECT COUNT(*) AS n, SUM(price) AS total FROM view_fold_test")
        .collect().head
      val full = SparkEntry.queries("q_incr_join")(s, sfDir).collect().head
      assert(full.getAs[Boolean]("consistent"))
      assert(folded.getAs[Long]("n") == full.getAs[Long]("full_rows"))
      assert(folded.getAs[java.math.BigDecimal]("total").doubleValue() ==
        full.getAs[Double]("full_value"))
    } finally q.stop()
  }
}
