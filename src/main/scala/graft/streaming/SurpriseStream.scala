package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming surprise router — the live twin of `q_psi`'s
  * population-stability gate: each arriving document is scored by how
  * IMPROBABLE its length bin is under the static corpus's bin
  * distribution, surprise(bin) = −ln p_ref(bin), and flagged when it
  * lands in a < 1 % bin. Stateless and append-safe: the reference
  * model is a BOUNDED bin→surprise map (the length-bin domain, ~10
  * entries) folded into the plan as a literal map column — no join,
  * no state store, every score is one in-row lookup. Smoothing and
  * quantization follow q_psi exactly (Laplace (c+1)/(n+B), 10⁻⁶
  * fixed point), so batch audit and live router cannot drift; an
  * UNSEEN bin scores as a zero-count bin (the maximum surprise the
  * smoothed model can express) and always flags.
  */
object SurpriseStream {

  private[streaming] val BinW = 64L
  private[streaming] val Q = 1000000L
  /** −ln(0.01) quantized: flag bins with reference mass under 1 %. */
  private[graft] val FlagQ = 4605170L

  private def binCol: Column = (col("n_chars").cast(LongType) / BinW).cast(LongType)

  /** (bin → surprise_q) model plus the unseen-bin fallback, fitted on
    * the static corpus: one value-level aggregate, O(#bins) driver
    * state.
    */
  def binSurprise(corpus: DataFrame): (Map[Long, Long], Long) = {
    val hist = corpus.select(binCol.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c"))
    val rows = hist.collect().map(r => r.getLong(0) -> r.getLong(1))
    // empty reference corpus: (c+1)/(n+b) is 1/0 = Inf and the log
    // blows up — degrade to the defined always-flag sentinel instead
    // of taking the router down (EmptyInputSpec philosophy, which the
    // batch suite enforces but streaming modules must self-guard)
    if (rows.isEmpty) return (Map.empty, Long.MaxValue)
    val n = rows.map(_._2).sum
    val b = rows.length.toLong
    def sq(c: Long): Long =
      math.floor(BigDecimal(-math.log((c + 1).toDouble / (n + b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * Q).toLong
    (rows.map { case (bin, c) => bin -> sq(c) }.toMap, sq(0L))
  }

  /** Score and flag a stream of documents against the static corpus's
    * bin model. Output: (doc_id, bin, surprise_q, flagged).
    */
  def route(stream: DataFrame, staticCorpus: DataFrame): DataFrame = {
    val (model, unseenQ) = binSurprise(staticCorpus)
    val mapCol =
      if (model.isEmpty) map()
      else map(model.toSeq.sortBy(_._1).flatMap { case (k, v) =>
        Seq(lit(k), lit(v)) }: _*)
    stream
      .withColumn("bin", binCol)
      .withColumn("surprise_q",
        coalesce(element_at(mapCol, col("bin")), lit(unseenQ)))
      .select(col("doc_id"), col("bin"), col("surprise_q"),
        (col("surprise_q") >= FlagQ).as("flagged"))
  }
}
