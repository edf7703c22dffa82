package graft

import org.apache.spark.sql.functions._
import graft.operators.{CurationOps3, SpectralOps}

/** Semantics tests for the round-6 additions: super-shingle dedup,
  * perplexity bucketing, and power-iteration PCA.
  */
class SpectralCuration3Spec extends SparkSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("q_pca_power: fixed-point direction is normalized, deterministic, and dominant") {
    val v = SpectralOps.qPcaPower(sc, sf001).collect()
    assert(v.length == 64)
    val vq = v.map(_.getLong(1))
    // L∞ renormalization bounds every component at the fixed-point scale
    assert(vq.map(math.abs).max <= 1048576L)
    assert(vq.map(math.abs).max > 1048576L / 4, "direction collapsed")
    // deterministic under different parallelism (quantized reductions)
    val v2 = SpectralOps.qPcaPower(sc, sf001)
      .repartition(7).orderBy("pos").collect().map(_.getLong(1))
    assert(vq.sameElements(v2))
    // dominance: the Rayleigh quotient of the returned direction beats
    // a fixed arbitrary axis by a wide margin on the same Gram matrix
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    def rayleigh(dir: Array[Double]): Double = {
      val n = math.sqrt(dir.map(x => x * x).sum)
      val u = dir.map(_ / n)
      val uLit = array(u.map(lit(_)): _*)
      emb.select(
        aggregate(zip_with(col("embedding"), uLit,
          (a, b) => a.cast("double") * b), lit(0.0), (acc, y) => acc + y).as("p"))
        .agg(avg(col("p") * col("p"))).head().getDouble(0)
    }
    val rTop = rayleigh(vq.map(_.toDouble))
    val axis = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0)
    assert(rTop > rayleigh(axis), s"top direction not dominant: $rTop")
  }

  test("dd_supershingle: candidates are a high-precision subset of dd_winnowing pairs") {
    val ss = CurationOps3.ddSupershingle(sc, sf001)
      .select("a", "b", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ss.nonEmpty, "no super-shingle candidates at sf0.01")
    // every surviving pair passed the exact containment verify
    ss.values.foreach(sim => assert(sim >= 0.5 && sim <= 1.0))
    // subset property: identical band content implies shared
    // fingerprints, so every pair must also appear in the
    // fingerprint-join variant's output at the same threshold
    val win = graft.operators.CurationOps.ddWinnowing(sc, sf001)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    ss.keys.foreach(p => assert(win.contains(p), s"pair $p not in dd_winnowing"))
  }

  test("q_pca_project: labels partition the corpus; per-label variance is non-negative") {
    val rows = SpectralOps.qPcaProject(sc, sf001).collect()
    assert(rows.nonEmpty)
    val total = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (n, sp, sp2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // n·Σp² ≥ (Σp)² — Cauchy-Schwarz on the exact integer sums
      assert(BigInt(n) * BigInt(sp2) >= BigInt(sp) * BigInt(sp),
        s"label ${r.getLong(0)}: negative variance")
    }
  }

  test("ta_tfidf_cosine: scores are valid cosines over non-negative weights") {
    val rows = CurationOps3.taTfidfCosine(sc, sf001).collect()
    assert(rows.nonEmpty, "no tf-idf cosine pairs at sf0.01")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val c = r.getDouble(2)
      // weights are non-negative (idf > 0 inside the df window), so
      // cosine lands in (0, 1] up to the quantization rounding
      assert(c >= 0.3 && c <= 1.000001, s"cosine out of range: $c")
    }
  }

  test("q_pca_deflate: second direction is near-orthogonal to the first and dominant off-axis") {
    val rows = SpectralOps.qPcaDeflate(sc, sf001).collect()
    assert(rows.length == 64)
    val v1 = rows.map(_.getLong(1).toDouble)
    val v2 = rows.map(_.getLong(2).toDouble)
    def nrm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(nrm(v2) > 0, "second direction collapsed")
    val cos = v1.zip(v2).map { case (a, b) => a * b }.sum / (nrm(v1) * nrm(v2))
    // Hotelling deflation drives the v1 component out; the residual
    // cosine is fixed-point noise
    assert(math.abs(cos) < 0.05, s"|cos(v1,v2)| = ${math.abs(cos)}")
  }

  test("q_feature_quantiles: ordered exact order-statistics per dimension") {
    val rows = SpectralOps.qFeatureQuantiles(sc, sf001).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val Seq(n, mn, q1, med, q3, iqr, mx) = (1 to 7).map(r.getLong)
      assert(n == 500)
      assert(mn <= q1 && q1 <= med && med <= q3 && q3 <= mx)
      assert(iqr == q3 - q1 && iqr >= 0)
    }
    // spot-check one dimension against a driver-side exact quantile
    val vs = spark.read.parquet(s"$sf001/embeddings.parquet")
      .selectExpr("CAST(floor(CAST(embedding[0] AS DOUBLE) * 1048576) AS BIGINT) AS v")
      .collect().map(_.getLong(0)).sorted
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getLong(4) == vs((vs.length + 1) / 2 - 1), "median mismatch")
    assert(r0.getLong(2) == vs.head && r0.getLong(7) == vs.last)
  }

  test("round-6 plan gates: no cartesian pair generation; PCA reduces map-side") {
    // pair generation must stay equi-join-shaped (band signatures /
    // df-windowed postings) — a CartesianProduct here means the 100 TB
    // candidate bound silently vanished
    Seq("dd_supershingle", "ta_tfidf_cosine").foreach { n =>
      val p = SparkEntry.queries(n)(sc, sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$n: ${p.take(800)}")
    }
    // the G·v pass must be a generate + partial-aggregated position
    // sum (d keys), not any whole-relation reshuffle
    val p = SparkEntry.queries("q_pca_power")(sc, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("Generate posexplode"), p.take(800))
    assert(p.contains("partial_sum"), p.take(800))
  }

  test("ta_perplexity_bucket: thirds partition scored docs, ties share a bucket") {
    val rows = CurationOps3.taPerplexityBucket(sc, sf001).collect()
    val n = rows.length
    assert(n > 0)
    val byBucket = rows.groupBy(_.getString(2)).map { case (k, v) => k -> v.length }
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    // each stratum holds about a third (exact only when scores at the
    // cut are untied; allow the tie-absorption slack)
    byBucket.values.foreach(c => assert(c > 0 && c <= (2 * n) / 3))
    // monotone: every head score >= every middle score >= every tail
    def scores(b: String) = rows.filter(_.getString(2) == b).map(_.getLong(1))
    if (byBucket.contains("head") && byBucket.contains("middle"))
      assert(scores("head").min >= scores("middle").max)
    if (byBucket.contains("middle") && byBucket.contains("tail"))
      assert(scores("middle").min >= scores("tail").max)
  }
}
