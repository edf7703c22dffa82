package graft

/** Semantic property gates for the round-10 post-training/serving
  * wave — each assertion is the estimator's defining guarantee, not a
  * pinned value, so the suite survives testdata regeneration.
  */
class ServingOpsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(sc, sfDir)

  test("q_gae: advantage aggregates are ordered and nonnegative on positive rewards") {
    val rows = run("q_gae").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mn = r.getAs[Double]("min_adv"); val mx = r.getAs[Double]("max_adv")
      val mean = r.getAs[Double]("mean_adv")
      // rewards are positive, so every truncated discounted sum is too
      assert(mn >= 0.0)
      // the quantized mean sits inside the exact [min, max] envelope
      // (floor quantization can only pull it down by < 2^-20)
      assert(mean >= mn - 1e-6 && mean <= mx + 1e-6)
      assert(r.getAs[Long]("n_steps") > 0L)
    }
  }

  test("q_temperature_scale: exactly one winner, and it attains the minimum NLL") {
    val rows = run("q_temperature_scale").collect()
    assert(rows.length == 5, "one row per grid temperature")
    val best = rows.filter(_.getAs[Boolean]("is_best"))
    assert(best.length == 1, "the argmin is unique")
    val minNll = rows.map(_.getAs[Double]("mean_nll")).min
    assert(best.head.getAs[Double]("mean_nll") == minNll)
    rows.foreach(r => assert(r.getAs[Double]("mean_nll") > 0.0))
  }

  test("q_best_of_2: expected pair maximum dominates the mean") {
    val rows = run("q_best_of_2").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mean = r.getAs[Double]("mean_reward")
      val bo2 = r.getAs[Double]("best_of_2")
      // E[max(X1, X2)] >= E[X] for any distribution
      assert(bo2 >= mean - 1e-9, s"best_of_2 $bo2 < mean $mean")
      assert(math.abs(r.getAs[Double]("uplift") - (bo2 - mean)) < 2e-6)
      assert(r.getAs[Long]("n") >= 2L)
    }
  }

  test("q_top_p_cutoff: the cutoff is the first rank reaching 0.9 of the mass") {
    val rows = run("q_top_p_cutoff").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Long]("cutoff_rank"); val n = r.getAs[Long]("n")
      assert(k >= 1L && k <= n)
      val frac = r.getAs[Double]("cutoff_frac")
      assert(frac > 0.0 && frac <= 1.0)
      val mass = r.getAs[Double]("mass_at_cutoff")
      assert(mass >= 0.9 - 1e-9 && mass <= 1.0 + 1e-9)
      // scores are positive and descending-sorted, so reaching 90% of
      // the mass takes strictly fewer than 100% of the rows unless the
      // distribution is a single row
      if (n > 10) assert(k < n)
    }
  }
}
