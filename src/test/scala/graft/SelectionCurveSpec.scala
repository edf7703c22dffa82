package graft

import org.apache.spark.sql.functions._

import graft.operators.{MlOps2, Similarity3, TrainingOps2}

/** Properties of the round-11c selection/tuning wave beyond the
  * hash-exact oracle: the recall curve is monotone in the probe budget
  * and anchored by brute force, the temperature-mixture table is a
  * proper probability family with the right limiting behavior, and the
  * margin selector returns the true per-source minima.
  */
class SelectionCurveSpec extends SparkSuite {

  test("ann_recall_curve: monotone in nprobe, within [0,1], exact k accounting") {
    val rows = Similarity3.annRecallCurve(sc, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L))
    rows.foreach { case (np, hits, k, rec) =>
      assert(k == 10L && hits >= 0 && hits <= k)
      assert(math.abs(rec - hits.toDouble / k) < 1e-12, s"np=$np")
    }
    // probing MORE cells can only grow the candidate set, so recall is
    // nondecreasing in the budget — the property that makes the curve a
    // tuning instrument
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4, s"recall not monotone: $a -> $b")
    }
  }

  test("q_mixture_temperature: each tau's weights form a distribution; tau=1 recovers the raw shares") {
    val s = sc
    val rows = TrainingOps2.qMixtureTemperature(s, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // per tau: weights sum to 1 (up to the 1e-6 output rounding)
    rows.groupBy(_._2).foreach { case (tau, rs) =>
      val sum = rs.map(_._4).sum
      assert(math.abs(sum - 1.0) < 1e-4, s"tau=$tau weights sum $sum")
    }
    // tau = 1 is the identity mixture: weight == raw share, upsample == 1
    val total = rows.filter(_._2 == 1.0).map(_._3).sum
    rows.filter(_._2 == 1.0).foreach { case (src, _, tok, w, up) =>
      assert(math.abs(w - tok.toDouble / total) < 1e-5, s"$src tau=1 weight $w")
      assert(math.abs(up - 1.0) < 1e-5, s"$src tau=1 upsample $up")
    }
    // tau < 1 up-weights the tail: the smallest source's upsample factor
    // must exceed 1 and grow as tau shrinks
    val smallest = rows.minBy(_._3)._1
    val ups = rows.filter(_._1 == smallest).sortBy(_._2).map(_._5)
    assert(ups.head > 1.0, s"smallest source not up-weighted: ${ups.head}")
    ups.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-9, s"upsample not decreasing in tau: $a -> $b")
    }
  }

  test("q_active_learning_margin: returns the true per-source minimum margins") {
    val s = sc
    val got = MlOps2.qActiveLearningMargin(s, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val perSource = got.groupBy(_._1)
    perSource.foreach { case (_, rs) => assert(rs.length <= 10) }
    // independent recomputation of every doc's margin; the selection
    // must be exactly the 10 smallest (ties to the smallest doc_id)
    val all = graft.sources.Tables(s, sfDir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map { r =>
        val (src, id, nc) = (r.getString(0), r.getLong(1), r.getLong(2))
        val scores = (0 until 5).map { c =>
          val h = graft.functions.PortableMd5.hash60(
            org.apache.spark.unsafe.types.UTF8String.fromString(s"al:$id:$c"))
          (h % 1000).toDouble / 1000.0 + (if (nc % 5 == c) 0.3 else 0.0)
        }.sorted.reverse
        (src, id, scores(0) - scores(1))
      }
    all.groupBy(_._1).foreach { case (src, docs) =>
      // selection is by RAW margin (ties to doc_id); the emitted margin
      // is rounded, so compare membership + rounded values keyed by doc
      val want = docs.sortBy(d => (d._3, d._2)).take(10)
        .map(d => (d._2, math.rint(d._3 * 1e6) / 1e6)).sortBy(_._1).toSeq
      val have = perSource(src).map(r => (r._2, r._3)).sortBy(_._1).toSeq
      assert(have == want, s"$src: $have vs $want")
    }
  }
}
