package graft

import graft.operators.EvalOps2

/** Semantic invariants for the second eval wave, beyond oracle hash. */
class EvalOps2Spec extends SparkSuite {

  test("q_confusion_stats: quadrants partition the corpus; F1 is the harmonic mean") {
    val r = EvalOps2.qConfusionStats(sc, sfDir).head()
    val (tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(tp + fp + fn + tn ==
      graft.sources.Tables(sc, sfDir, "documents").count())
    val p = tp.toDouble / (tp + fp); val rec = tp.toDouble / (tp + fn)
    assert(math.abs(r.getAs[Double]("f1") - 2 * p * rec / (p + rec)) < 1e-5)
  }

  test("q_cohen_kappa: κ ≤ po, both in [-1, 1], perfect-agreement sanity") {
    val r = EvalOps2.qCohenKappa(sc, sfDir).head()
    val (po, pe, k) = (r.getAs[Double]("po"), r.getAs[Double]("pe"), r.getAs[Double]("kappa"))
    assert(po >= 0 && po <= 1 && pe > 0 && pe < 1)
    assert(k <= po + 1e-9, "chance correction can only lower agreement")
    assert(math.abs(k - (po - pe) / (1 - pe)) < 1e-5)
  }

  test("q_psi: symmetric-ish drift score is non-negative and finite") {
    val r = EvalOps2.qPsi(sc, sfDir).head()
    val psi = r.getAs[Double]("psi")
    // every PSI term (pa−pb)·ln(pa/pb) is ≥ 0 (same sign factors)
    assert(psi >= 0, s"psi=$psi")
    assert(r.getAs[Long]("n_bins") >= 2)
  }

  test("ta_oov_rate: rates in [0,1); token totals partition the corpus stream") {
    val rows = EvalOps2.taOovRate(sc, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0 && rate < 1)
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("ta_wasserstein: non-negative, zero only for identical distributions") {
    val rows = EvalOps2.taWasserstein(sc, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("wasserstein") >= 0))
    // at least one source differs from the corpus blend
    assert(rows.exists(_.getAs[Double]("wasserstein") > 0))
  }

  test("ann_matryoshka: recall in (0, 1], prefix list is k-deep") {
    val r = EvalOps2.annMatryoshka(sc, sfDir).head()
    assert(r.getAs[Long]("k") == 10)
    val rec = r.getAs[Double]("recall_at_k")
    assert(rec > 0 && rec <= 1.0, s"recall=$rec")
  }
}
