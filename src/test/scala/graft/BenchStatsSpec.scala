package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's per-query accounting, pinned as pure functions: the
  * min/median/degraded triple and the tie-breaker gate. These numbers
  * feed BENCH_*.json and the floor folds, so their edge cases (ties,
  * zero timings, 2-vs-3 passes) deserve the same spec treatment as a
  * query.
  */
class BenchStatsSpec extends AnyFunSuite {

  test("needThirdPass fires only on >2x disagreement, either direction") {
    assert(!Bench.needThirdPass(1.0, 1.0))
    assert(!Bench.needThirdPass(1.0, 2.0)) // exactly 2x is agreement
    assert(Bench.needThirdPass(1.0, 2.01))
    assert(Bench.needThirdPass(2.01, 1.0)) // symmetric
    assert(Bench.needThirdPass(0.0, 0.5))  // zero-guarded, no div-by-zero
  }

  test("stats on two agreeing passes: min, midpoint median, not degraded") {
    val (min, median, degraded) = Bench.stats(Seq(1.2, 1.0))
    assert(min == 1.0 && median == 1.1 && !degraded)
  }

  test("stats on three passes: min, middle median; one outlier is absorbed") {
    // contention inflated one pass; the tie-breaker agreed with the
    // fast pass, so the query is NOT degraded and the median sits at
    // the agreeing pair
    val (min, median, degraded) = Bench.stats(Seq(5.0, 1.0, 1.1))
    assert(min == 1.0 && median == 1.1 && !degraded)
  }

  test("stats flags degraded when even the second-best is >2x the best") {
    // all three passes disagree: fast mode never reproduced — the min
    // is still reported, but the artifact self-identifies as noisy
    val (min, _, degraded) = Bench.stats(Seq(1.0, 2.5, 3.0))
    assert(min == 1.0 && degraded)
    // bimodal two-pass case (the ADVICE r14 scenario): visible too
    assert(Bench.stats(Seq(1.0, 2.5))._3)
  }
}
