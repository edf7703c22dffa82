package graft

import org.apache.spark.sql.functions._
import graft.operators.EvalOps

/** Semantics tests for the evaluation / governed-release primitives. */
class EvalOpsSpec extends SparkSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("q_auc: matches a brute-force pairwise AUC computation") {
    val s = sc
    val row = EvalOps.qAuc(s, sf001).collect().head
    val auc = row.getDouble(2)
    assert(auc >= 0.0 && auc <= 1.0)
    // brute force: P(score+ > score-) + 0.5 P(tie) over all +/- pairs
    val d = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("n_chars"), (col("lang") === "en").as("y")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = d.filter(_._2).map(_._1)
    val neg = d.filterNot(_._2).map(_._1)
    var num = 0.0
    for (p <- pos; n <- neg)
      num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val brute = num / (pos.length.toDouble * neg.length.toDouble)
    assert(math.abs(auc - brute) < 1e-9, s"rank AUC $auc vs brute $brute")
  }

  test("q_calibration: bins partition the corpus, rates within [0,1]") {
    val rows = EvalOps.qCalibration(sc, sf001).collect()
    assert(rows.length == 10)
    val total = rows.map(_.getLong(1)).sum
    assert(total == spark.read.parquet(s"$sf001/documents.parquet").count())
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("q_rfm: segments cover all customers with orders; digits in 1..5") {
    val s = sc
    val rows = EvalOps.qRfm(s, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      val seg = r.getString(0)
      assert(seg.length == 3 && seg.forall(c => c >= '1' && c <= '5'), seg)
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) > 0.0)
    }
    // top-25 segments are ordered by population
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q_dp_counts: released counts are noised but within Laplace tail bounds") {
    val s = sc
    val rows = EvalOps.qDpCounts(s, sf001).collect()
    assert(rows.length == 5)
    val truth = spark.read.parquet(s"$sf001/events.parquet")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (arm, released) = (r.getString(0), r.getDouble(1))
      val diff = math.abs(released - truth(arm))
      // Laplace(1/eps=1): |noise| > 14 has probability < 1e-6 — the
      // deterministic inverse-CDF draw is bounded by ln(2^20) ≈ 13.9
      assert(diff <= 14.0, s"$arm: |noise| = $diff")
      assert(r.getDouble(2) == 1.0)
    }
  }

  test("q_bootstrap_ci: intervals bracket the point estimate, replicates complete") {
    val rows = EvalOps.qBootstrapCi(sc, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, mean, reps, lo, hi) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n > 0)
      // every replicate kept (Poisson(1) over thousands of rows cannot
      // sum to zero weight)
      assert(reps == 40L, s"${r.getString(0)}: $reps replicates")
      assert(lo <= hi)
      // the 90% percentile interval brackets the observed mean at this
      // sample size
      assert(lo <= mean && mean <= hi,
        s"${r.getString(0)}: CI [$lo, $hi] misses mean $mean")
      // interval is non-degenerate but tight relative to the mean's
      // scale (resampling noise, not data spread)
      assert(hi - lo > 0 && hi - lo < math.max(1L, math.abs(mean)))
    }
  }

  test("ta_ks_test: statistics in [0,1]; self-comparison of the whole corpus is 0") {
    val rows = EvalOps.taKsTest(sc, sf001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val ks = r.getDouble(3)
      assert(ks >= 0.0 && ks <= 1.0, s"${r.getString(0)}: ks=$ks")
      assert(r.getLong(2) >= 0)
    }
    // sanity: D_num/(n_s·N) really is the ECDF sup-distance for one
    // source, recomputed driver-side
    val src = rows.head.getString(0)
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val all: Array[Long] = docs.map(_._2).sorted
    val mine: Array[Long] = docs.filter(_._1 == src).map(_._2).sorted
    val d: Double = all.distinct.map { v =>
      math.abs(mine.count(_ <= v).toDouble / mine.length -
        all.count(_ <= v).toDouble / all.length)
    }.max
    assert(math.abs(rows.head.getDouble(3) - d) < 1e-5,
      s"$src: engine ${rows.head.getDouble(3)} vs brute $d")
  }

  test("q_mutual_information: non-negative scores, rank is a permutation") {
    val rows = graft.operators.MlOps2.qMutualInformation(sc, sf001).collect()
    assert(rows.length == 64)
    // MI ≥ 0 up to the 1e-6 per-term quantization of the log
    rows.foreach(r => assert(r.getLong(1) >= -64 * 4 * 10 * 2,
      s"pos ${r.getLong(0)}: mi_q ${r.getLong(1)}"))
    assert(rows.map(_.getLong(2)).toSet == (1L to 64L).toSet)
  }
}
