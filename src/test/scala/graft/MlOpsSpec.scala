package graft

import org.apache.spark.sql.functions._
import graft.operators.MlOps

/** Semantics and invariant tests for the in-engine ML primitives. */
class MlOpsSpec extends SparkSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("q_ols: per-group closed-form regression matches a direct computation") {
    val rows = MlOps.qOls(sc, sf001).collect()
    assert(rows.nonEmpty)
    // recompute one group naively from the raw table (unquantized ≈)
    val ev = spark.read.parquet(s"$sf001/events.parquet")
      .select(col("event_type"), hour(col("ts")).cast("double").as("x"), col("value").as("y"))
    val g = rows.head.getString(0)
    val pts = ev.where(col("event_type") === g).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(rows.head.getDouble(2) - slope) < 1e-4,
      s"engine slope ${rows.head.getDouble(2)} vs naive $slope")
    // r2 is a squared correlation: always within [0, 1]
    rows.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("q_cms_heavy: estimates dominate true counts (CMS one-sided error)") {
    val rows = MlOps.qCmsHeavy(sc, sf001).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS estimate ${r.getLong(2)} < true count ${r.getLong(1)} for ${r.getString(0)}")
    }
  }

  test("q_item_cf: top-k per item, sims in (0,1], ranks contiguous") {
    val rows = MlOps.qItemCf(sc, sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length).toSeq)
      // within an item, rank order must be non-increasing similarity
      val bySim = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(bySim.zip(bySim.tail).forall { case (a, b) => a >= b })
    }
    rows.foreach(r => assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0))
  }

  test("ta_stem: stems never longer than source tokens; plural fold happens") {
    val rows = MlOps.taStem(sc, sf001).collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getLong(1) > 0))
    // stemming folds the plural variants: no reported stem ends in a
    // strippable plural (the rules keep 'ss' but never bare trailing
    // 's' on long tokens)
    rows.map(_.getString(0)).foreach { st =>
      assert(!st.endsWith("ies") && !(st.endsWith("s") && !st.endsWith("ss") && st.length > 3),
        s"unstripped plural survived: $st")
    }
  }

  test("q_gd_train: loss decreases across GD steps") {
    // re-run the recurrence locally and check the engine's fixed point
    val w = MlOps.qGdTrain(sc, sf001).collect().head
    val feats = spark.read.parquet(s"$sf001/documents.parquet")
      .select((col("n_chars") / lit(1024.0)).as("x"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    def loss(w0: Double, w1: Double): Double =
      feats.map { case (x, y) => val d = w0 + w1 * x - y; d * d }.sum / feats.length
    val l0 = loss(0.0, 0.0)
    val lT = loss(w.getDouble(0), w.getDouble(1))
    assert(lT < l0, s"GD loss did not decrease: $l0 -> $lT")
  }

  test("q_dbscan_grid: clusters cover only core cells and sizes are consistent") {
    val rows = MlOps.qDbscanGrid(sc, sf001).collect()
    assert(rows.nonEmpty)
    val totalPts = rows.map(_.getLong(1)).sum
    val totalCells = rows.map(_.getLong(2)).sum
    // every cluster has at least one cell of >= minPts points
    rows.foreach(r => assert(r.getLong(1) >= 6 && r.getLong(2) >= 1))
    // clustered points can never exceed the corpus
    val n = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(totalPts <= n)
    assert(totalCells >= rows.length) // >= one cell per cluster
  }
}
