package graft

/** Plan-shape gates for the round-11 ML/eval operators: single-pass
  * aggregation where claimed, broadcasts where intended, no cartesian
  * blowups, truncated iterative lineage. Failures here mean a physical
  * regression even when results still match.
  */
class MlPlanSpec extends SparkSuite {

  private def plan(n: String): String =
    SparkEntry.queries(n)(sc, sfDir).queryExecution.executedPlan.toString

  test("q_ols is one aggregation pass over the scan — a single shuffle") {
    val p = plan("q_ols")
    // one Exchange for the groupBy, one for the final orderBy: no joins
    assert(!p.contains("Join"), p.take(1200))
    assert("Exchange".r.findAllIn(p).length <= 2, p.take(1200))
    assert(p.contains("partial"), p.take(1200)) // map-side combine
  }

  test("q_cms_heavy probes the counter grid via broadcast") {
    val p = plan("q_cms_heavy")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q_item_cf reuses the cached co-purchase relation and broadcasts the top items") {
    val p = plan("q_item_cf")
    assert(p.contains("InMemoryTableScan"), p.take(1200))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    // per-item top-k runs in the bounded-heap operator (r7 promotion);
    // the rank window only sees the ≤k-per-src result
    assert(p.contains("GroupedTopK"), p.take(1200))
  }

  test("q_gd_train broadcasts the 1-row weight state into each step") {
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan("q_gd_train")).length >= 3)
  }

  test("q_dbscan_grid's label loop ends in checkpointed lineage, cell-stage only") {
    val p = plan("q_dbscan_grid")
    // the final plan joins core cells to checkpointed labels — the
    // corpus-sized relation appears only below the first aggregate
    assert(p.contains("Scan ExistingRDD"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q_als_step solves entirely in one groupBy — no driver state, no extra shuffle") {
    val p = plan("q_als_step")
    assert(p.contains("partial"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q_auc ranks once: a single global sort below the final aggregate") {
    val p = plan("q_auc")
    assert(!p.contains("Join"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("mm_clip_filter is a broadcast/shuffle equi-join, never a cartesian") {
    val p = plan("mm_clip_filter")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("ta_cluster_topics assigns cells map-side and top-ks per cluster") {
    val p = plan("ta_cluster_topics")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q_forecast_snaive joins hour-cells, not raw rows") {
    val p = plan("q_forecast_snaive")
    // both sides reduce to (type, hour[, day]) cells before the join —
    // the join inputs are aggregates, so partial combines appear twice
    assert("partial".r.findAllIn(p).length >= 2, p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }
}
