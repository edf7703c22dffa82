package graft

import org.apache.spark.sql.functions._

import graft.operators.{PrefOps, ServingOps, TrainingOps3}

/** Properties of the round-11 serving/training-diagnostics wave beyond
  * the hash-exact oracle: the speculative-decoding readout matches the
  * geometric acceptance model its hash-Bernoulli drafts imply, the
  * gradient-noise-scale estimate reproduces an unquantized in-test
  * recomputation within the quantization error bound, and the
  * length-debiased win rate is a true stratification (per-source pair
  * accounting, rates in range).
  */
class InferenceDiagSpec extends SparkSuite {

  test("q_spec_decode_accept: tokens-per-step matches the geometric acceptance model") {
    val rows = ServingOps.qSpecDecodeAccept(sc, sfDir).collect()
    assert(rows.nonEmpty)
    // acceptance bits are Bernoulli(3/4), so E[accepted] = Σ_{i=1..8}
    // (3/4)^i ≈ 2.966 and E[tokens/step] ≈ 3.966; with hundreds of
    // requests per type the sample mean stays well inside ±0.6
    rows.foreach { r =>
      val (n, accTotal, tps) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n > 0 && accTotal >= 0 && accTotal <= n * 8)
      assert(tps > 3.3 && tps < 4.6,
        s"${r.getString(0)}: tokens_per_step $tps outside the Bernoulli(3/4) band")
      // definitional identity: tokens = (accepted_total + n) / n
      assert(math.abs(tps - (accTotal + n).toDouble / n) < 1e-12)
    }
  }

  test("q_grad_noise_scale: matches an unquantized recomputation within the quantization bound") {
    val s = sc
    val got = TrainingOps3.qGradNoiseScale(s, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    assert(got.nonEmpty)
    got.values.foreach { case (n, trace, g2, b) =>
      assert(n > 0 && trace > 0 && g2 >= 0)
      if (!b.isNaN) assert(b > 0)
    }
    // raw recomputation for every label from the vectors themselves
    val raw = graft.sources.Tables(s, sfDir, "embeddings")
      .select(col("label").cast("long").as("l"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .groupBy(_._1)
    raw.foreach { case (l, vs) =>
      val xs = vs.map(_._2)
      val n = xs.length
      val dims = xs.head.length
      var trace = 0.0
      var g2 = 0.0
      (0 until dims).foreach { d =>
        val col = xs.map(_(d))
        val mean = col.sum / n
        trace += col.map(x => x * x).sum / n - mean * mean
        g2 += mean * mean
      }
      val (_, gTrace, gG2, gB) = got(l)
      // per-element 2^-26 quantization + per-dim 2^-20 fold, 64 dims:
      // absolute error stays far below 1e-3 on O(1)-magnitude values
      assert(math.abs(gTrace - trace) < 1e-3, s"label $l trace: $gTrace vs $trace")
      assert(math.abs(gG2 - g2) < 1e-3, s"label $l |G|^2: $gG2 vs $g2")
      if (g2 > 0) assert(math.abs(gB - trace / g2) / (trace / g2) < 1e-2,
        s"label $l B_simple: $gB vs ${trace / g2}")
    }
  }

  test("q_length_debiased_winrate: exact pair accounting and in-range stratified rates") {
    val s = sc
    val rows = PrefOps.qLengthDebiasedWinrate(s, sfDir).collect()
    assert(rows.nonEmpty)
    val docsPerSource = graft.sources.Tables(s, sfDir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (src, nPairs, wins, raw, debiased, gap) = (r.getString(0),
        r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // adjacent-pair construction: exactly one pair per consecutive
      // doc within the source
      assert(nPairs == docsPerSource(src) - 1, s"$src: $nPairs pairs")
      assert(wins >= 0 && wins <= nPairs)
      assert(raw >= 0.0 && raw <= 1.0 && debiased >= 0.0 && debiased <= 1.0)
      assert(math.abs(gap - (raw - debiased)) < 2e-6, s"$src: gap $gap")
    }
  }
}
