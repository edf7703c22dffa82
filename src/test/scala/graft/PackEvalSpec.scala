package graft

/** Semantic property gates for the round-10 batch-construction /
  * test-statistic wave — each assertion is the operator's defining
  * guarantee, not a pinned value, so the suite survives testdata
  * regeneration.
  */
class PackEvalSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(sc, sfDir)

  test("q_chi2_independence: dof identity, chi2 >= 0, Cramér's V is a proportion") {
    val r = run("q_chi2_independence").collect().head
    assert(r.getAs[Long]("dof") ==
      (r.getAs[Long]("r") - 1) * (r.getAs[Long]("c") - 1))
    val chi2 = r.getAs[Double]("chi2")
    assert(chi2 >= 0.0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q_krippendorff: disagreements are proportions, alpha <= 1") {
    val r = run("q_krippendorff").collect().head
    val d_o = r.getAs[Double]("d_o"); val d_e = r.getAs[Double]("d_e")
    assert(d_o >= 0.0 && d_o <= 1.0)
    assert(d_e > 0.0 && d_e <= 1.0)
    assert(r.getAs[Double]("alpha") <= 1.0)
    assert(r.getAs[Long]("n_items") > 0L)
  }

  test("q_cochran_q: model totals bounded by n, Q >= 0, flag consistent") {
    val r = run("q_cochran_q").collect().head
    val n = r.getAs[Long]("n")
    Seq("ga", "gb", "gc").foreach { g =>
      val v = r.getAs[Long](g); assert(v >= 0L && v <= n)
    }
    val q = r.getAs[Double]("q")
    assert(q >= 0.0)
    assert(r.getAs[Boolean]("significant") == q > 5.991)
  }

  test("q_mmr_select: three distinct picks, greedy-relevance first, scores bounded") {
    val rows = run("q_mmr_select").collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 3)
    val rel = rows.map(_.getAs[Double]("relevance"))
    // pick 1 is the pure-relevance argmax; later picks trade it away
    assert(rel.tail.forall(_ <= rel.head))
    assert(rows.head.getAs[Double]("mmr") == rel.head)
    rows.foreach { r =>
      val m = r.getAs[Double]("mmr")
      assert(m >= -1.0 - 1e-9 && m <= 1.0 + 1e-9, s"mmr $m out of cosine bounds")
    }
  }

  test("q_seq_pack: window count is exact ceil, splits bounded, fill in (0,1]") {
    val rows = run("q_seq_pack").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tot = r.getAs[Long]("total_tokens")
      assert(r.getAs[Long]("n_windows") == (tot + 511) / 512)
      assert(r.getAs[Long]("split_docs") <= r.getAs[Long]("n_docs"))
      val fill = r.getAs[Double]("fill")
      assert(fill > 0.0 && fill <= 1.0)
    }
  }

  test("q_stratified_kfold: folds in range, per-stratum masses reconcile") {
    val rows = run("q_stratified_kfold").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Long]("fold")
      assert(f >= 0L && f < 5L)
      assert(r.getAs[Double]("rel_dev") >= 0.0)
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = graft.sources.Tables(sc, sfDir, "documents").count()
    assert(total == docs, "every document lands in exactly one (stratum, fold)")
  }

  test("q_domain_reweight: both distributions normalize, tilt favors diversity") {
    val rows = run("q_domain_reweight").collect()
    assert(rows.nonEmpty)
    val p0 = rows.map(_.getAs[Double]("p0"))
    val w = rows.map(_.getAs[Double]("weight"))
    // entries are rounded to 6 dp, so the sums carry rounding slack
    val eps = rows.length * 1e-6
    assert(math.abs(p0.sum - 1.0) < eps, s"p0 sums to ${p0.sum}")
    assert(math.abs(w.sum - 1.0) < eps, s"weights sum to ${w.sum}")
    assert(w.forall(_ > 0.0))
    // the exponential tilt is monotone: a domain with higher diversity
    // than another AND at least its baseline share must keep a weight
    // ratio at least the baseline ratio
    val byDiv = rows.sortBy(_.getAs[Double]("diversity"))
    val lo = byDiv.head; val hi = byDiv.last
    if (hi.getAs[Double]("diversity") > lo.getAs[Double]("diversity")) {
      val baseRatio = hi.getAs[Double]("p0") / lo.getAs[Double]("p0")
      val newRatio = hi.getAs[Double]("weight") / lo.getAs[Double]("weight")
      assert(newRatio >= baseRatio - 1e-6,
        "the most diverse domain must gain relative to the least diverse")
    }
  }

  test("q_vocab_growth: checkpoints expand monotonically, vocab never outruns tokens") {
    val rows = run("q_vocab_growth").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val byD = rs.sortBy(_.getAs[Long]("decile"))
      Seq("docs_seen", "tokens_seen", "vocab_seen").foreach { c =>
        val v = byD.map(_.getAs[Long](c))
        v.sliding(2).foreach { case Array(a, b) =>
          assert(a <= b, s"$src: $c must be nondecreasing along the walk")
        }
      }
      byD.foreach { r =>
        assert(r.getAs[Long]("vocab_seen") <= r.getAs[Long]("tokens_seen"),
          s"$src: distinct vocabulary cannot exceed tokens read")
      }
      // one fitted exponent per source; growth is sublinear (Heaps'
      // law) and a saturated vocabulary legitimately fits beta = 0
      assert(byD.map(_.getAs[Double]("heaps_beta")).distinct.length == 1)
      val beta = byD.head.getAs[Double]("heaps_beta")
      assert(beta >= 0.0 && beta <= 1.0 + 1e-6, s"$src: beta $beta not in [0, 1]")
    }
  }

  test("dd_threshold_curve: cumulative in t, docs bounded by corpus") {
    val rows = run("dd_threshold_curve").collect().sortBy(_.getAs[Long]("t"))
    assert(rows.map(_.getAs[Long]("t")).toSeq == (0L to 6L))
    Seq("pairs_within", "docs_within").foreach { c =>
      rows.map(_.getAs[Long](c)).sliding(2).foreach { case Array(a, b) =>
        assert(a <= b, s"$c must be cumulative in the threshold")
      }
    }
    rows.foreach { r =>
      val f = r.getAs[Double]("docs_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
    // at the max threshold the pair count equals the dd_simhash relation
    val all = run("dd_simhash").count()
    assert(rows.last.getAs[Long]("pairs_within") == all)
  }

  test("q_quantile_norm: per-type decile means are nondecreasing; reference is shared") {
    val rows = run("q_quantile_norm").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val means = rs.sortBy(_.getAs[Long]("decile")).map(_.getAs[Double]("raw_mean"))
      means.sliding(2).foreach { case Array(a, b) =>
        assert(a <= b + 1e-9, s"$t: decile means must be nondecreasing")
      }
    }
    rows.groupBy(_.getAs[Long]("decile")).foreach { case (d, rs) =>
      assert(rs.map(_.getAs[Double]("norm_value")).distinct.length == 1,
        s"decile $d: all types must map to one shared reference value")
    }
  }
}
