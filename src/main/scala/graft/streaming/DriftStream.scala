package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SpectralOps

/** Streaming feature-DRIFT monitor — the live companion of
  * `q_feature_quantiles`: the batch query fits the corpus's
  * per-dimension robust profile at rest; this stream checks every
  * arriving embedding against the profile's Tukey fences
  * (Q1 − 1.5·IQR, Q3 + 1.5·IQR) in flight and flags vectors whose
  * coordinates have drifted outside it — the input-distribution
  * monitor a production feature pipeline runs ahead of a model.
  *
  * The profile is O(d) driver model state (two 64-long fence arrays
  * collected from the batch quantile output — the same legitimacy
  * argument as the PCA iterate and the perplexity thresholds), folded
  * into each row as broadcast literals: the check is one in-row pass
  * over the vector's own coordinates — no join, no state store, no
  * watermark, append-safe. Per-batch cost is O(batch vectors · d);
  * the aggregation layer (drift counts per window/source) belongs in
  * the foreachBatch sink, per the DocsStream contract. Because every
  * operator is stream-safe and deterministic, the same function runs
  * on a batch DataFrame unchanged — the spec asserts bit-identical
  * output between the two execution modes.
  */
object DriftStream {

  /** Per-dimension (lo, hi) Tukey fences from the batch quantile
    * profile: lo = Q1 − (3·IQR) DIV 2, hi = Q3 + (3·IQR) DIV 2 —
    * exact integer arithmetic on the already-quantized profile.
    */
  def fences(spark: SparkSession, dir: String): (Array[Long], Array[Long]) = {
    val rows = SpectralOps.qFeatureQuantiles(spark, dir)
      .selectExpr("pos", "q1 - (3 * iqr) DIV 2 AS lo", "q3 + (3 * iqr) DIV 2 AS hi")
      .collect()
    val byPos = rows.map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2))).toMap
    (Array.tabulate(byPos.size)(byPos(_)._1), Array.tabulate(byPos.size)(byPos(_)._2))
  }

  /** Flag each arriving vector: quantize its coordinates exactly like
    * the profile (floor at 2^20), count fence violations in-row, and
    * mark drift at ≥ `minOut` out-of-fence dimensions (a single tail
    * coordinate is ordinary; a handful is a distribution shift).
    * Output: (vec_id, n_out, first_out_pos, drifted).
    */
  def monitor(vectors: DataFrame, lo: Array[Long], hi: Array[Long],
      minOut: Int = 2): DataFrame = {
    val d = lo.length
    val loLit = array(lo.map(lit(_)): _*)
    val hiLit = array(hi.map(lit(_)): _*)
    val xq = transform(col("embedding"),
      x => floor(x.cast("double") * graft.operators.SpectralOps.PcaQ.toDouble).cast("long"))
    val outPos = filter(sequence(lit(0), lit(d - 1)), i =>
      element_at(col("xq"), i + 1) < element_at(loLit, i + 1) ||
        element_at(col("xq"), i + 1) > element_at(hiLit, i + 1))
    vectors.select(col("vec_id"), xq.as("xq"))
      .select(col("vec_id"), outPos.as("outs"))
      .select(col("vec_id"),
        size(col("outs")).cast("long").as("n_out"),
        // try_: ANSI mode throws on element_at over the (common) empty
        // violation list
        try_element_at(col("outs"), lit(1)).cast("long").as("first_out_pos"),
        (size(col("outs")) >= minOut).as("drifted"))
  }

  /** Convenience: fit the fences on the static corpus directory and
    * monitor the stream against them.
    */
  def route(stream: DataFrame, spark: SparkSession, staticDir: String): DataFrame = {
    val (lo, hi) = fences(spark, staticDir)
    monitor(stream, lo, hi)
  }
}
