package graft

import graft.operators.DistillOps

/** Property gates for the distillation wave: full plain-Scala
  * re-derivations (hash logits, integer student mix, first-match
  * argmax, the in-row KL/entropy folds with their 1e-9 transcendental
  * rounding and 2⁻²⁰ quantization) plus the constructions'
  * invariants — a 0.7-teacher student agrees far above chance,
  * softmax entropy rises and top-1 mass falls monotonically with
  * temperature, and the mined examples are exactly the per-source
  * L1 maxima.
  */
class DistillOpsSpec extends SparkSuite {

  private val C = 16
  private val Q = 1L << 20

  private def h64(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def round(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def tArr(id: Long): Array[Long] =
    Array.tabulate(C)(c => h64(s"tea:$c:$id") % 1000 + 1)

  private def sArr(id: Long): Array[Long] =
    Array.tabulate(C)(c => (h64(s"tea:$c:$id") % 1000 + 1) * 7 / 10 +
      (h64(s"stu:$c:$id") % 1000 + 1) * 3 / 10)

  private lazy val docs: Seq[(Long, String)] =
    sc.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("q_distill_agree: exact re-derivation + above-chance agreement") {
    val got = DistillOps.qDistillAgree(sc, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      val rows = ds.map { case (id, _) =>
        val t = tArr(id); val s = sArr(id)
        val ts = t.sum.toDouble; val ss = s.sum.toDouble
        val agree = if (t.indexOf(t.max) == s.indexOf(s.max)) 1L else 0L
        val kl = (1 to C).foldLeft(0.0) { (acc, i) =>
          acc + (t(i - 1) / ts) *
            round(math.log((t(i - 1) / ts) / (s(i - 1) / ss)), 9)
        }
        (agree, math.floor(kl * Q).toLong)
      }
      val n = rows.size.toLong
      src -> (n, rows.map(_._1).sum,
        round(rows.map(_._1).sum.toDouble / n, 6),
        round(rows.map(_._2).sum.toDouble / n / Q, 6))
    }
    assert(got == want, s"got $got\nwant $want")
    // 70% teacher weight keeps top-1 agreement far above the 1/16
    // chance rate (measured ≈ 0.44 — argmax over 16 near-ties flips
    // easily even at 30% noise), and KL(t‖s) is nonnegative up to
    // term rounding
    val (agreeTot, nTot) = (got.values.map(_._2).sum, got.values.map(_._1).sum)
    assert(agreeTot.toDouble / nTot > 0.3, s"$agreeTot/$nTot")
    got.values.foreach { case (_, _, _, kl) => assert(kl >= -1e-6, kl) }
  }

  test("q_distill_temp_curve: exact re-derivation + monotone entropy/peakedness") {
    val got = DistillOps.qDistillTempCurve(sc, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val want = Seq(1, 2, 4, 8).map { tau =>
      val rows = docs.map { case (id, _) =>
        val w = tArr(id).map(x => round(math.exp(x / (100.0 * tau)), 9))
        val z = w.foldLeft(0.0)(_ + _)
        val h = w.foldLeft(0.0) { (acc, x) =>
          acc - (x / z) * round(math.log(x / z), 9) }
        (math.floor(h * Q).toLong, math.floor(w.max / z * Q).toLong)
      }
      val n = rows.size.toLong
      tau -> (n, round(rows.map(_._1).sum.toDouble / n / Q, 6),
        round(rows.map(_._2).sum.toDouble / n / Q, 6))
    }.toMap
    assert(got == want, s"got $got\nwant $want")
    val byTau = Seq(1, 2, 4, 8).map(got)
    // dark knowledge: softening strictly flattens the target
    assert(byTau.map(_._2).sliding(2).forall(p => p(1) > p(0)), byTau)
    assert(byTau.map(_._3).sliding(2).forall(p => p(1) < p(0)), byTau)
    // entropy is bounded by the uniform ln(16)
    byTau.foreach { case (_, h, _) => assert(h > 0 && h < math.log(C) + 1e-6) }
  }

  test("q_distill_mine: exact re-derivation — the per-source L1 maxima, k per source") {
    val got = DistillOps.qDistillMine(sc, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.map { case (id, _) =>
        val t = tArr(id); val s = sArr(id)
        val ts = t.sum.toDouble; val ss = s.sum.toDouble
        val l1 = (1 to C).foldLeft(0.0) { (acc, i) =>
          acc + math.abs(t(i - 1) / ts - s(i - 1) / ss) }
        (src, id, l1)
      }.sortBy(r => (-r._3, r._2)).take(3)
        .map { case (a, b, l) => (a, b, round(l, 6)) }
    }.sortBy(r => (r._1, -r._3, r._2))
    assert(got.toSeq == want, s"got ${got.toSeq.take(5)}\nwant ${want.take(5)}")
    assert(got.groupBy(_._1).values.forall(_.size == 3))
  }
}
