package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TimeSeriesOps}

/** Semantics tests for cross-modal alignment gating and the
  * seasonal-naive forecast backtest.
  */
class ClipForecastSpec extends SparkSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("mm_clip_filter: one row per paired id, cosine in [-1,1], kept = align >= tau") {
    val s = sc
    val rows = Multimodal.mmClipFilter(s, sf001).collect()
    val docs = spark.read.parquet(s"$sf001/documents.parquet").select("doc_id")
    val vecs = spark.read.parquet(s"$sf001/embeddings.parquet").select(col("vec_id").as("doc_id"))
    assert(rows.length == docs.join(vecs, "doc_id").count())
    rows.foreach { r =>
      val a = r.getDouble(1)
      assert(a >= -1.0 && a <= 1.0, s"cosine out of range: $a")
      assert(r.getBoolean(2) == (a >= 0.05))
    }
    // a random text tower should keep only a minority at tau = 0.05
    val keptFrac = rows.count(_.getBoolean(2)).toDouble / rows.length
    assert(keptFrac > 0.0 && keptFrac < 0.9, s"kept fraction $keptFrac")
  }

  test("q_forecast_snaive: MAE non-negative and beats a null model sanity bound") {
    val rows = TimeSeriesOps.qForecastSnaive(sc, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)  // test cells exist
      assert(r.getDouble(2) >= 0.0)
      // hourly means live in [0, 561]; a seasonal-naive forecast of a
      // stationary-ish series must sit far inside the value range
      assert(r.getDouble(2) < 100.0, s"MAE implausibly large: ${r.getDouble(2)}")
    }
  }
}
