package graft

/** Semantic property gates for the round-10 preference/eval wave —
  * each assertion is the estimator's defining mathematical guarantee
  * (not a pinned value), so the suite survives testdata regeneration:
  * pass@k is monotone in k and bounded, kappa and the BT strengths
  * live in their theoretical ranges, chosen/rejected margins are
  * strictly positive, BLEU precisions are clipped into [0,1], and
  * length-sorted batching can never pad MORE than arrival order.
  */
class PrefOpsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(sc, sfDir)

  test("q_pref_pairs: chosen beats rejected with a positive margin") {
    val rows = run("q_pref_pairs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("chosen_id") != r.getAs[Long]("rejected_id"),
        "a pair must contain two distinct candidates")
      assert(r.getAs[Double]("margin") > 0.0, "degenerate all-tie prompts are skipped")
      assert(r.getAs[Long]("n_candidates") >= 2L)
    }
  }

  test("q_bradley_terry: strengths positive for winners, wins bounded by games") {
    val rows = run("q_bradley_terry").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val wins = r.getAs[Long]("wins"); val games = r.getAs[Long]("games")
      assert(wins >= 0L && wins <= games)
      val p = r.getAs[Double]("strength")
      if (wins == 0L) assert(p == 0.0) else assert(p > 0.0)
    }
  }

  test("q_fleiss_kappa: p_bar and p_e are probabilities, kappa <= 1") {
    val r = run("q_fleiss_kappa").collect().head
    val pb = r.getAs[Double]("p_bar"); val pe = r.getAs[Double]("p_e")
    assert(pb >= 0.0 && pb <= 1.0)
    assert(pe > 0.0 && pe <= 1.0)
    assert(r.getAs[Double]("kappa") <= 1.0)
    assert(r.getAs[Long]("n_items") > 0L)
  }

  test("q_pass_at_k: pass@3 >= pass@1 (monotone in k) and both in [0,1]") {
    val rows = run("q_pass_at_k").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p1 = r.getAs[Double]("pass_at_1"); val p3 = r.getAs[Double]("pass_at_3")
      assert(p1 >= 0.0 && p1 <= 1.0)
      assert(p3 >= 0.0 && p3 <= 1.0)
      // the unbiased estimator 1 - C(n-c,k)/C(n,k) dominates c/n for k>1
      // (per-problem, hence after averaging); rounding gives 1e-6 slack.
      assert(p3 >= p1 - 1e-6, s"pass@3 $p3 < pass@1 $p1")
    }
  }

  test("q_mcnemar: discordant cells within n; chi2 consistent with flag") {
    val r = run("q_mcnemar").collect().head
    val n = r.getAs[Long]("n"); val b = r.getAs[Long]("b"); val c = r.getAs[Long]("c")
    assert(b >= 0L && c >= 0L && b + c <= n)
    val chi2 = r.getAs[Double]("chi2")
    assert(chi2 >= 0.0)
    assert(r.getAs[Boolean]("significant") == chi2 > 3.841)
  }

  test("q_ngram_overlap: clipped precisions and bleu2 in [0,1]") {
    val rows = run("q_ngram_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("mean_p1", "mean_p2", "mean_bleu2").foreach { cName =>
        val v = r.getAs[Double](cName)
        assert(v >= 0.0 && v <= 1.0, s"$cName=$v out of range")
      }
      // BLEU-2's geometric mean is dominated by its weakest precision.
      assert(r.getAs[Double]("mean_bleu2") <= r.getAs[Double]("mean_p1") + 1e-6)
    }
  }

  test("q_pad_waste: length-sorted batching never pads more than arrival order") {
    val rows = run("q_pad_waste").collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      assert(rs.length == 2, s"$src must report both strategies")
      val byStrat = rs.map(r => r.getAs[String]("strategy") -> r).toMap
      val arrival = byStrat("arrival"); val sorted = byStrat("sorted")
      // same docs, same batch count, same payload — only padding moves.
      assert(arrival.getAs[Long]("n_batches") == sorted.getAs[Long]("n_batches"))
      assert(arrival.getAs[Long]("total_tokens") == sorted.getAs[Long]("total_tokens"))
      // Length-sorted grouping minimizes the sum of batch maxima over
      // equal-size batches (rearrangement); the single partial tail
      // batch could in principle flip this only on adversarial arrival
      // orders, never on a corpus of thousands of random-length docs.
      assert(sorted.getAs[Long]("pad_tokens") <= arrival.getAs[Long]("pad_tokens"),
        s"$src: sorting by length must not increase padding")
      rs.foreach { r =>
        val w = r.getAs[Double]("waste_pct")
        assert(w >= 0.0 && w < 1.0)
      }
    }
  }
}
