package graft

import graft.operators.FeatureOps

/** Semantic invariants for the feature/release ops beyond the oracle
  * hash: risk-audit arithmetic, encoder shrinkage direction, reservoir
  * determinism, and fusion rank bounds.
  */
class FeatureOpsSpec extends SparkSuite {

  test("q_k_anonymity: class sizes partition the ledger; l ≤ n") {
    val rows = FeatureOps.qKAnonymity(sc, sfDir).collect()
    val total = graft.sources.Tables(sc, sfDir, "orders").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("l_div") <= r.getAs[Long]("n"))
      assert(r.getAs[Boolean]("k_anonymous") == (r.getAs[Long]("n") >= 10))
    }
  }

  test("q_target_encode: encodings shrink toward the prior, bounded by it") {
    val rows = FeatureOps.qTargetEncode(sc, sfDir).collect()
    val gp = rows.map(_.getAs[Long]("n_pos")).sum.toDouble /
      rows.map(_.getAs[Long]("n")).sum
    rows.foreach { r =>
      val raw = r.getAs[Long]("n_pos").toDouble / r.getAs[Long]("n")
      val enc = r.getAs[Double]("enc")
      // enc lies strictly between the raw category mean and the prior
      assert(enc >= math.min(raw, gp) - 1e-6 && enc <= math.max(raw, gp) + 1e-6,
        s"${r.getAs[String]("source")}: raw=$raw enc=$enc prior=$gp")
    }
  }

  test("q_reservoir_sample: k per stratum, deterministic across runs") {
    val a = FeatureOps.qReservoirSample(sc, sfDir).collect()
    val b = FeatureOps.qReservoirSample(sc, sfDir).collect()
    assert(a.toSeq == b.toSeq, "reservoir must be reproducible")
    val perLang = a.groupBy(_.getAs[String]("lang"))
    perLang.values.foreach(g => assert(g.length == 5))
    perLang.values.foreach(g =>
      assert(g.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 5L)))
  }

  test("q_hybrid_rrf: fused list bounded, ranks within list depth, seed absent") {
    val rows = FeatureOps.qHybridRrf(sc, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") != 7L, "seed must not retrieve itself")
      Seq("rank_a", "rank_b").foreach { c =>
        if (!r.isNullAt(r.fieldIndex(c)))
          assert(r.getAs[Long](c) >= 1 && r.getAs[Long](c) <= 10)
      }
    }
    // a doc on both lists outranks the same-rank singleton: scores are
    // monotone in list membership
    val qs = rows.map(_.getAs[Long]("rrf_q"))
    assert(qs.sameElements(qs.sortBy(-_)), "output must be rrf-descending")
  }
}
