package graft

import org.apache.spark.sql.functions._

import graft.operators.TraceOps

/** Property gates for the round-13 RL/agentic-trace wave: per-step
  * credit against a hand-computed episode corpus (boundary stitching,
  * suffix-sum arithmetic, the cross-multiplied advantage sign test),
  * the tool-error taxonomy against hand-laid failure chains (cap
  * observability included), and the trajectory collapse against
  * hand-built duplicate rollouts — plus structural invariants and an
  * independent episode-count re-derivation on the real corpus.
  */
class TraceOpsSpec extends SparkSuite {

  private def eventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("trace-ops").toString
    sc.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val T0 = 1704067200000L // 2024-01-01T00:00:00Z
  private def at(hours: Double) =
    new java.sql.Timestamp(T0 + (hours * 3600 * 1000).toLong)

  test("q_trace_credit: hand-computed episodes — gap stitching, return-to-go, advantage sign") {
    val s = sc
    // user 1, episode A: rewards 1.00 / 2.00 / 3.00 at 0h,1h,2h;
    // episode B after a >8h silence: one 5.00 step. user 2: 10.00 then
    // 0.50 one hour apart. Returns-to-go: A = 600,500,300 cents;
    // B = 500; u2 = 1050,50.
    val dir = eventsDir(Seq(
      (1L, at(0), 1L, "click", 1.0, "{}"),
      (2L, at(1), 1L, "view", 2.0, "{}"),
      (3L, at(2), 1L, "purchase", 3.0, "{}"),
      (4L, at(20), 1L, "click", 5.0, "{}"),
      (5L, at(0), 2L, "click", 10.0, "{}"),
      (6L, at(1), 2L, "view", 0.5, "{}")))
    val got = TraceOps.qTraceCredit(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    // step 1: rtgs {600, 500, 1050}, only 1050·3 > 2150 → frac 1/3
    // step 2: rtgs {500, 50}, only 500·2 > 550 → frac 1/2
    // step 3: rtg {300}, 300·1 > 300 is FALSE (ties are not positive)
    assert(got == Seq(
      (1L, 3L, 2150L, 716.666667, 0.333333),
      (2L, 2L, 550L, 275.0, 0.5),
      (3L, 1L, 300L, 300.0, 0.0)), s"got: $got")
  }

  test("q_trace_credit: real corpus — reach counts nonincreasing in depth, fractions in range") {
    val rows = TraceOps.qTraceCredit(sc, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(rows.nonEmpty)
    // every trace reaching step i reached i−1, and steps are 1-based
    // and contiguous
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    val ns = rows.map(_._2).toSeq
    assert(ns == ns.sorted.reverse, s"reach counts not nonincreasing: $ns")
    rows.foreach { case (i, _, f) =>
      assert(f >= 0.0 && f <= 1.0, s"step $i frac_pos_adv $f") }
  }

  test("q_tool_errors: hand-laid chains — routing, classes, chain cap, self-retries") {
    val s = sc
    // one episode holding EIGHT errors (cap = 6, so the last two count
    // in totals but not in chain statistics), one clean click between
    // them (must not break the error chain), and a second user with a
    // single chain-head error. cents = value·100; class = cents % 4;
    // tool = k // 13.
    val dir = eventsDir(Seq(
      (1L, at(0.0), 1L, "error", 0.04, """{"k": 0}"""), // t0 timeout, head
      (2L, at(0.5), 1L, "click", 9.99, """{"k": 50}"""), // non-error
      (3L, at(1.0), 1L, "error", 0.05, """{"k": 1}"""), // t0 rate_limit, self-retry
      (4L, at(2.0), 1L, "error", 0.06, """{"k": 13}"""), // t1 bad_args
      (5L, at(3.0), 1L, "error", 0.07, """{"k": 14}"""), // t1 server_error, self-retry
      (6L, at(4.0), 1L, "error", 0.08, """{"k": 2}"""), // t0 timeout
      (7L, at(5.0), 1L, "error", 0.04, """{"k": 15}"""), // t1 timeout (chain pos 6)
      (8L, at(6.0), 1L, "error", 0.05, """{"k": 3}"""), // BEYOND cap: totals only
      (9L, at(7.0), 1L, "error", 0.06, """{"k": 16}"""), // BEYOND cap: totals only
      (10L, at(0.0), 2L, "error", 0.09, """{"k": 40}"""))) // t3 rate_limit, head
    val got = TraceOps.qToolErrors(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got == Map(
      ("t0", "rate_limit") -> ((2L, 0L, 1L, 0.5)),
      ("t0", "timeout") -> ((2L, 1L, 0L, 0.5)),
      ("t1", "bad_args") -> ((2L, 0L, 0L, 0.5)),
      ("t1", "server_error") -> ((1L, 0L, 1L, 0.25)),
      ("t1", "timeout") -> ((1L, 0L, 0L, 0.25)),
      ("t3", "rate_limit") -> ((1L, 1L, 0L, 1.0))), s"got: $got")
  }

  test("q_tool_errors: real corpus — totals reconcile, per-tool shares sum to one") {
    val s = sc
    val rows = TraceOps.qToolErrors(s, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    assert(rows.nonEmpty)
    val totalErrors = graft.sources.Tables(s, sfDir, "events")
      .where(col("event_type") === "error").count()
    assert(rows.map(_._2).sum == totalErrors,
      "taxonomy must partition every error exactly once")
    rows.foreach { case (t, n, head, retry, _) =>
      assert(head <= n && retry <= n, s"$t: chain stats exceed totals") }
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val share = rs.map(_._5).sum
      assert(math.abs(share - 1.0) < 1e-4, s"$t shares sum to $share") }
  }

  test("q_traj_collapse: identical rollouts collapse, shorter-than-trigram traces are excluded") {
    val s = sc
    def ep(uid: Long, base: Long, actions: Seq[String]) =
      actions.zipWithIndex.map { case (a, i) =>
        (base + i, at(i * 0.5), uid, a, 1.0, "{}")
      }
    val dir = eventsDir(
      ep(1L, 100L, Seq("a", "b", "a", "b", "a")) ++ // {aba, bab}
        ep(2L, 200L, Seq("a", "b", "a", "b", "a")) ++ // same set → collapses
        ep(3L, 300L, Seq("a", "b", "a")) ++ // {aba} alone
        ep(4L, 400L, Seq("c", "c"))) // no trigram — excluded
    val got = TraceOps.qTrajCollapse(s, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (2L, 1000001L, 2L, 1L), // users 1+2 collapsed, keep the oldest
      (1L, 3000001L, 1L, 0L)), s"got: $got")
  }

  test("q_loop_detect: hand-traced repeats, oscillations, and run lengths") {
    val s = sc
    // u1: a a b a b b b — repeats: a@2, b@6, b@7; oscillations: a@4
    // (a-b-a), b@5 (b-a-b); runs: a:2, b:1, a:1, b:3. u2: single c.
    val acts1 = Seq("a", "a", "b", "a", "b", "b", "b")
    val dir = eventsDir(
      acts1.zipWithIndex.map { case (a, i) =>
        ((i + 1).toLong, at(i * 1.0), 1L, a, 1.0, "{}") } ++
        Seq((100L, at(0), 2L, "c", 1.0, "{}")))
    val got = TraceOps.qLoopDetect(s, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(got == Map(
      "a" -> ((3L, 1L, 1L, 2L, 0.333333)),
      "b" -> ((4L, 2L, 1L, 3L, 0.5)),
      "c" -> ((1L, 0L, 0L, 1L, 0.0))), s"got: $got")
  }

  test("q_trace_funnel: hand-built funnel — suffix counts, success lift, observed depths only") {
    val s = sc
    def ep(uid: Long, base: Long, actions: Seq[String]) =
      actions.zipWithIndex.map { case (a, i) =>
        (base + i, at(i * 0.5), uid, a, 1.0, "{}") }
    val dir = eventsDir(
      ep(1L, 100L, Seq("a", "a", "b", "a", "b", "b", "b")) ++ // len 7, fail
        ep(2L, 200L, Seq("c")) ++ // len 1, fail
        ep(3L, 300L, Seq("view", "purchase")) ++ // len 2, success
        ep(4L, 400L, Seq("view", "view", "purchase"))) // len 3, success
    val got = TraceOps.qTraceFunnel(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, 4L, 2L, 0.5),
      (2L, 3L, 2L, 0.666667),
      (3L, 2L, 1L, 0.5),
      (7L, 1L, 0L, 0.0)), s"got: $got")
  }

  test("q_loop_detect / q_trace_funnel: real corpus — totals reconcile, funnel monotone") {
    val s = sc
    val total = graft.sources.Tables(s, sfDir, "events").count()
    val loops = TraceOps.qLoopDetect(s, sfDir).collect()
    assert(loops.map(_.getLong(1)).sum == total,
      "loop diagnostic must partition every step exactly once")
    loops.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) <= r.getLong(1) &&
        r.getLong(4) >= 1L, s"inconsistent loop stats: $r") }
    val funnel = TraceOps.qTraceFunnel(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reaching counts strictly decrease as depth rises (observed
    // depths), success counts are bounded by them, and depth-min
    // reaching equals the episode count
    assert(funnel.map(_._1).toSeq == funnel.map(_._1).sorted.toSeq)
    val reach = funnel.map(_._2).toSeq
    assert(reach == reach.sorted.reverse, s"funnel not monotone: $reach")
    funnel.foreach { case (d, n, sN) => assert(sN <= n, s"depth $d: $sN > $n") }
  }

  test("q_traj_collapse: real corpus — ledger covers exactly the trigram-bearing episodes") {
    val s = sc
    val got = TraceOps.qTrajCollapse(s, sfDir).collect()
    // independent episode-count re-derivation: 8h-gap stitching in
    // plain window ops, counting episodes of ≥ 3 events
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val expected = graft.sources.Tables(s, sfDir, "events")
      .withColumn("b", when(lag("ts", 1).over(w).isNull ||
        unix_millis(col("ts")) - unix_millis(lag("ts", 1).over(w)) >
          8L * 3600 * 1000, 1L).otherwise(0L))
      .withColumn("sid", sum("b").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid").agg(count(lit(1)).as("n"))
      .where(col("n") >= 3).count()
    assert(got.map(_.getLong(3)).sum == expected,
      s"collapse ledger covers ${got.map(_.getLong(3)).sum} of $expected episodes")
    // collapse must actually fire on a 5-action alphabet
    assert(got.exists(_.getLong(4) > 0L), "no rollout collapsed — suspicious")
  }
}
