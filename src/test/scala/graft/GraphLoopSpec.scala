package graft

import graft.operators.GraphOps2

/** Convergence early-exit gates for the iterative graph loops (the r7
  * stretch item): the loops may stop before their round budget, but
  * ONLY at a proven fixpoint — k-core exits when a round peels nothing
  * (the restriction joins are then the identity), BFS exits when a
  * round reaches no new node (unit-hop distances are exact on first
  * touch, so values can never change either). Output equality with the
  * fixed-round unrolling is therefore structural, and the DuckDB
  * oracles — which DO unroll the full fixed round count — re-prove it
  * value-exactly at every verify scale. Here we pin the loop contract
  * itself: bounded rounds, determinism across runs, and the round
  * count surfaced for scale measurements (set SPARK_GRAFT_GRAPH_SF to
  * measure at another scale).
  */
class GraphLoopSpec extends SparkSuite {

  private val dir = sys.env.getOrElse("SPARK_GRAFT_GRAPH_SF", sfDir)

  test("kcore peeling: bounded rounds, deterministic, early exit only at a fixpoint") {
    val (df1, r1) = GraphOps2.kcoreLoop(sc, dir)
    val (df2, r2) = GraphOps2.kcoreLoop(sc, dir)
    assert(r1 >= 0 && r1 <= 4, s"rounds $r1 out of budget")
    assert(r1 == r2, "round count must be deterministic")
    val a = df1.collect().map(_.toString).toSeq
    val b = df2.collect().map(_.toString).toSeq
    assert(a == b, "peeling result must be deterministic")
    info(s"kcore executed $r1/4 peel rounds at $dir")
  }

  test("bfs expansion: bounded rounds, deterministic, early exit only at a fixpoint") {
    val (df1, r1) = GraphOps2.bfsLoop(sc, dir)
    val (df2, r2) = GraphOps2.bfsLoop(sc, dir)
    assert(r1 >= 0 && r1 <= 3, s"rounds $r1 out of budget")
    assert(r1 == r2, "round count must be deterministic")
    val a = df1.collect().map(_.toString).toSeq
    val b = df2.collect().map(_.toString).toSeq
    assert(a == b, "bfs result must be deterministic")
    info(s"bfs executed $r1/3 expansion rounds at $dir")
  }

  test("link-predict hub cap: never fires at test scale (exactness), observable when it does") {
    // production cap: dropped_centers = 0 proves the output is
    // byte-identical to the uncapped wedge enumeration the oracle runs
    val exact = GraphOps2.qLinkPredictCapped(sc, dir, GraphOps2.HubCap)
    exact.collect()
    val m0 = exact.queryExecution.observedMetrics(GraphOps2.HubCapMetric)
    assert(m0.getAs[Long]("dropped_centers") == 0L,
      "the shipped cap must not fire at test scale (oracle identity)")
    val maxDeg = m0.getAs[Int]("max_center_degree")
    assert(maxDeg >= 1 && maxDeg < GraphOps2.HubCap / 4,
      s"observed max center degree $maxDeg must sit far under the cap")
    info(s"link-predict max center degree $maxDeg (cap ${GraphOps2.HubCap}) at $dir")
    // a cap low enough to fire: the drop must be observable, not
    // silent. Probe at (observed max degree − 1) so the hottest
    // center(s) drop while nearly all pairs survive — a tiny cap (1-2)
    // would return ZERO pairs, and AQE's empty-relation propagation
    // then replaces the whole subtree — CollectMetrics node included —
    // with an empty LocalTableScan, so no metrics survive to the final
    // plan (observability is only promised for executions that produce
    // output, which any real capped run does)
    val capped = GraphOps2.qLinkPredictCapped(sc, dir, maxDeg - 1)
    assert(capped.collect().nonEmpty,
      "capped probe must keep a non-empty result (else AQE empty-relation " +
        "propagation erases the metric node and the assertion is vacuous)")
    val m1 = capped.queryExecution.observedMetrics(GraphOps2.HubCapMetric)
    assert(m1.getAs[Long]("dropped_centers") > 0L,
      "a firing cap must be observable, not silent")
  }
}
