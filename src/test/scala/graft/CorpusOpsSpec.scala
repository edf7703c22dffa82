package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-5 additions: histogram, decayed aggregate, length bucketing,
  * prefix-dup detection, cosine range search — each checked by an
  * independent recomputation (different formulation than the
  * operator), plus invariants a correct implementation must satisfy.
  */
class CorpusOpsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(sc, sfDir)

  // ---- q_histogram ------------------------------------------------------

  test("histogram bin counts cover the table and respect bin edges") {
    val rows = run("q_histogram").collect()
    val total = Tables(sc, sfDir, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == total, "bin counts must partition the table")
    // every row's bin must contain its mean price
    rows.foreach { r =>
      val bin = r.getLong(0); val mean = r.getDouble(2) / r.getLong(1)
      assert(mean >= bin * 5000.0 && mean < (bin + 1) * 5000.0,
        s"bin $bin mean $mean outside [${bin * 5000.0}, ${(bin + 1) * 5000.0})")
    }
  }

  // ---- q_decay_agg ------------------------------------------------------

  test("decayed totals are bounded by the undecayed sum and reproducible") {
    val got = run("q_decay_agg")
    val plain = Tables(sc, sfDir, "events").groupBy("user_id")
      .agg(sum("value").as("s"))
    val joined = got.join(plain, "user_id")
      .where(col("decayed_value") > col("s") + lit(1e-9))
    assert(joined.count() == 0, "decay can only shrink a non-negative sum")
    // repartition-invariance: quantized sums are order-independent
    val a = got.collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val b = run("q_decay_agg").repartition(7).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(a == b)
  }

  // ---- q_length_buckets -------------------------------------------------

  test("histogram-sketch quantiles land within one bin of the exact rank value") {
    val est = run("q_hist_quantiles").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = Tables(sc, sfDir, "lineitem")
      .selectExpr("percentile_cont(array(0.5, 0.95, 0.99)) WITHIN GROUP (ORDER BY l_extendedprice) ps")
      .head.getSeq[Double](0)
    Seq(0.5, 0.95, 0.99).zip(exact).foreach { case (q, ex) =>
      assert(math.abs(est(q) - ex) <= 5000.0,
        s"q=$q est=${est(q)} exact=$ex off by more than one bin")
    }
    // OHLC sanity rides along: high >= open/close >= low on every bar
    SparkEntry.queries("q_ohlc")(sc, sfDir).collect().foreach { r =>
      val (o, h, l, c) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(h >= o && h >= c && l <= o && l <= c, s"bar violates OHLC: $r")
    }
  }

  test("length buckets partition the corpus with zero waste only at exact fits") {
    val rows = run("q_length_buckets").collect()
    val nDocs = Tables(sc, sfDir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    rows.foreach { r =>
      val (bucket, n, sumTok, pad) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(sumTok + pad == bucket * n, "cap*docs = tokens + padding")
      assert(pad >= 0 && sumTok > bucket / 2 * n,
        s"bucket $bucket holds docs longer than the next bucket down")
    }
  }

  // ---- dd_prefix_dup ----------------------------------------------------

  test("prefix-dup groups match an independent exploded recomputation") {
    val docs = Tables(sc, sfDir, "documents")
    val expect = docs
      .select(concat_ws(" ",
        element_at(split(col("text"), " "), 1),
        element_at(split(col("text"), " "), 2)).as("p"))
      .groupBy("p").count().where(col("count") > 1).count()
    assert(run("dd_prefix_dup").count() == expect)
  }

  // ---- ann_range_search -------------------------------------------------

  test("range search returns exactly the vectors the brute top-k scan clears") {
    val got = run("ann_range_search").collect()
    assert(got.nonEmpty, "threshold must be reachable at sf0.001")
    assert(got.forall(_.getDouble(1) >= 0.2))
    // cross-check against ann_brute: every top-k hit above tau appears
    val brute = run("ann_brute").collect()
      .filter(_.getDouble(1) >= 0.2).map(_.getLong(0)).toSet
    val ids = got.map(_.getLong(0)).toSet
    assert(brute.subsetOf(ids))
    // descending-cosine order
    val cs = got.map(_.getDouble(1))
    assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
  }
}
