package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Post-training / serving evaluation wave: truncated generalized
  * advantage estimation over event trajectories, calibration
  * temperature selection by grid-searched NLL, the exact best-of-n
  * expected-reward estimator (order statistics, n = 2), and top-p
  * (nucleus) cutoff profiling of score distributions. Reference
  * scope: none in the reference (an ETL loader); these extend the
  * RLHF/serving surface beside [[PrefOps]]/[[EvalOps4]].
  */
object ServingOps {

  // --------------------------------------------------------- q_gae

  private val GaeHorizon = 8

  /** Truncated generalized advantage estimation (Schulman et al.,
    * "High-Dimensional Continuous Control Using GAE", 2016) over each
    * user's event trajectory: with V≡0 the TD residual is the reward
    * itself, so A_t = Σ_{k=0..H} (γλ)^k·r_{t+k}, truncated at
    * H = [[GaeHorizon]]. γλ = 0.5 EXACTLY so every weight is a power
    * of two (exact double scaling — no libm, no literal-parsing skew),
    * and the 9-term weighted sum is one fixed expression tree per row,
    * evaluated identically on both engines. Per-type aggregation runs
    * max/min (order-free) and the mean through the exact power-of-two
    * quantization (floor(adv·2²⁰) summed as BIGINT — |adv| < 2¹⁰
    * keeps the sum in range past 10¹² rows per type).
    */
  def qGae(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val adv = (0 to GaeHorizon).map { k =>
      coalesce(lead(col("value"), k).over(w), lit(0.0)) *
        lit(math.pow(0.5, k))
    }.reduce(_ + _)
    val P2 = 1048576.0 // 2^20
    Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("adv", adv)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_steps"), sum(floor(col("adv") * P2)).as("sq"),
        max("adv").as("mx"), min("adv").as("mn"))
      .select(col("event_type"), col("n_steps"),
        round(col("sq").cast(DoubleType) / P2 / col("n_steps"), 6).as("mean_adv"),
        round(col("mx"), 6).as("max_adv"), round(col("mn"), 6).as("min_adv"))
      .orderBy("event_type")
  }

  private val qGaeSql = {
    val terms = (0 to GaeHorizon).map { k =>
      val wgt = math.pow(0.5, k)
      s"COALESCE(lead(value, $k) OVER (PARTITION BY user_id ORDER BY ts, event_id), CAST(0 AS DOUBLE)) * $wgt"
    }.mkString("\n      |      + ")
    s"""WITH a AS (
       |  SELECT event_type,
       |      $terms AS adv
       |  FROM events)
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_steps,
       |  round(CAST(SUM(CAST(floor(adv * 1048576.0) AS BIGINT)) AS DOUBLE)
       |    / 1048576.0 / COUNT(*), 6) AS mean_adv,
       |  round(MAX(adv), 6) AS max_adv, round(MIN(adv), 6) AS min_adv
       |FROM a GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  // --------------------------------------- q_temperature_scale

  private val TsGrid = Seq(0.5, 1.0, 1.5, 2.0, 2.5)

  /** Calibration temperature selection (Guo et al., "On Calibration
    * of Modern Neural Networks", 2017): a fixed logit rule scores the
    * binary lang-id task, and the grid temperature minimizing mean NLL
    * wins. Each per-document NLL term is rounded to 6 dp right after
    * its single libm chain (the ta_ngram_lm rule — cross-engine libm
    * skew dies at the quantization) and averaged through the exact
    * power-of-two sum; the argmin compares exact BIGINT sums, never
    * floats. The grid is a 5-row broadcast — the corpus is scanned
    * once per temperature in one pass (explode), so the query is one
    * keyed aggregate at any scale.
    */
  def qTemperatureScale(s: SparkSession, dir: String): DataFrame = {
    val z = (least(col("n_chars"), lit(1000L)).cast(DoubleType) / 1000.0 -
      lit(0.5)) * 4.0
    val m = when(col("lang") === "en", z).otherwise(-z)
    val P2 = 1048576.0 // 2^20
    val scored = Tables(s, dir, "documents")
      .select(m.as("m"))
      .select(col("m"), explode(lit(TsGrid.toArray)).as("t"))
      .select(col("t"),
        round(log(lit(1.0) + exp(-col("m") / col("t"))), 6).as("nll"))
      .groupBy("t")
      .agg(count(lit(1)).as("n"), sum(floor(col("nll") * P2)).as("snll"))
    val best = scored.agg(min(struct(col("snll"), col("t"))).as("b"))
      .select(col("b.t").as("best_t"))
    scored.crossJoin(broadcast(best))
      .select(col("t"), col("n"),
        round(col("snll").cast(DoubleType) / P2 / col("n"), 6).as("mean_nll"),
        (col("t") === col("best_t")).as("is_best"))
      .orderBy("t")
  }

  private val qTemperatureScaleSql = {
    val grid = TsGrid.map(t => s"($t)").mkString(", ")
    s"""WITH g AS (SELECT CAST(t AS DOUBLE) AS t FROM (VALUES $grid) AS v(t)),
       |d AS (
       |  SELECT CASE WHEN lang = 'en'
       |      THEN (CAST(least(n_chars, 1000) AS DOUBLE) / 1000.0 - 0.5) * 4.0
       |      ELSE -((CAST(least(n_chars, 1000) AS DOUBLE) / 1000.0 - 0.5) * 4.0)
       |    END AS m
       |  FROM documents),
       |scored AS (
       |  SELECT g.t, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(floor(round(ln(CAST(1 AS DOUBLE) + exp(-d.m / g.t)), 6)
       |      * 1048576.0) AS BIGINT)) AS BIGINT) AS snll
       |  FROM d CROSS JOIN g GROUP BY g.t),
       |best AS (
       |  SELECT t AS best_t FROM scored ORDER BY snll ASC, t ASC LIMIT 1)
       |SELECT s.t, s.n,
       |  round(CAST(s.snll AS DOUBLE) / 1048576.0 / s.n, 6) AS mean_nll,
       |  s.t = b.best_t AS is_best
       |FROM scored s CROSS JOIN best b ORDER BY s.t""".stripMargin
  }

  // ------------------------------------------------- q_best_of_2

  /** Exact best-of-n expected reward for n = 2 (the BoN sampling
    * yardstick): with per-type scores sorted ascending,
    * E[max of a uniform random pair] = Σᵢ v₍ᵢ₎·2(i−1)/(N(N−1)) — the
    * order-statistics identity, not a Monte-Carlo estimate. The
    * weighted sum is DECIMAL×integer (scores are 2-dp money-like), so
    * it is exact under any partitioning; one rank window per type,
    * two divisions at the end.
    */
  def qBestOf2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("v", "event_id")
    Tables(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        col("value").cast(DecimalType(12, 2)).as("v"))
      .withColumn("i", row_number().over(w))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v").as("s1"),
        sum(col("v") * (col("i") - 1)).as("s2"))
      .select(col("event_type"), col("n"),
        round(col("s1").cast(DoubleType) / col("n"), 6).as("mean_reward"),
        round(lit(2.0) * col("s2").cast(DoubleType) /
          (col("n").cast(DoubleType) * (col("n") - 1)), 6).as("best_of_2"),
        round(lit(2.0) * col("s2").cast(DoubleType) /
          (col("n").cast(DoubleType) * (col("n") - 1)) -
          col("s1").cast(DoubleType) / col("n"), 6).as("uplift"))
      .orderBy("event_type")
  }

  private val qBestOf2Sql =
    """WITH r AS (
      |  SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY CAST(value AS DECIMAL(12,2)), event_id) AS i
      |  FROM events),
      |g AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(v) AS s1, SUM(v * (i - 1)) AS s2
      |  FROM r GROUP BY event_type)
      |SELECT event_type, n,
      |  round(CAST(s1 AS DOUBLE) / n, 6) AS mean_reward,
      |  round(2.0 * CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)), 6)
      |    AS best_of_2,
      |  round(2.0 * CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))
      |    - CAST(s1 AS DOUBLE) / n, 6) AS uplift
      |FROM g ORDER BY event_type""".stripMargin

  // ---------------------------------------------- q_top_p_cutoff

  private val TopP = 9 // p = 0.9, expressed as the exact fraction 9/10

  /** Top-p (nucleus) cutoff profile: per score distribution, the
    * smallest descending-order rank whose cumulative mass reaches
    * p = 0.9 of the total — the distribution-shape readout that sizes
    * nucleus sampling. The reach test compares 10·cumsum ≥ 9·total in
    * exact DECIMAL (no float threshold), the cutoff pick is a
    * min(struct) argmin, and the window is partitioned by the type
    * shard key.
    */
  def qTopPCutoff(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("v").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = Tables(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        col("value").cast(DecimalType(12, 2)).as("v"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(col("v").desc, col("event_id"))))
      .withColumn("cum", sum("v").over(w))
    // total mass as sum(v), not max(cum): the running-max equals the
    // true total only when every value is nonnegative — an exact
    // DECIMAL sum costs the same and stays right under negative scores
    val tot = ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v").as("tot"))
    ranked.join(tot, "event_type")
      .where(col("cum") * 10 >= col("tot") * TopP)
      .groupBy("event_type")
      .agg(max("n").as("n"), max("tot").as("tot"),
        min(struct(col("rk"), col("cum"))).as("c"))
      .select(col("event_type"), col("n"),
        col("c.rk").cast(LongType).as("cutoff_rank"),
        round(col("c.rk").cast(DoubleType) / col("n"), 6).as("cutoff_frac"),
        round(col("c.cum").cast(DoubleType) / col("tot").cast(DoubleType), 6)
          .as("mass_at_cutoff"))
      .orderBy("event_type")
  }

  private val qTopPCutoffSql =
    s"""WITH r AS (
       |  SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY CAST(value AS DECIMAL(12,2)) DESC, event_id) AS rk,
       |    SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY event_type
       |      ORDER BY CAST(value AS DECIMAL(12,2)) DESC, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM events),
       |tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |  SUM(v) AS tot FROM r GROUP BY event_type),
       |hit AS (
       |  SELECT r.event_type, t.n, t.tot, r.rk, r.cum
       |  FROM r JOIN tot t ON t.event_type = r.event_type
       |  WHERE r.cum * 10 >= t.tot * $TopP),
       |cut AS (
       |  SELECT event_type, n, tot, rk, cum FROM (
       |    SELECT event_type, n, tot, rk, cum,
       |      row_number() OVER (PARTITION BY event_type ORDER BY rk) AS pick
       |    FROM hit) WHERE pick = 1)
       |SELECT event_type, n, rk AS cutoff_rank,
       |  round(CAST(rk AS DOUBLE) / n, 6) AS cutoff_frac,
       |  round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS mass_at_cutoff
       |FROM cut ORDER BY event_type""".stripMargin

  // --------------------------------------------- q_spec_decode_accept

  /** Draft window size (tokens proposed per speculative step). */
  private val SpecK = 8

  /** Speculative-decoding acceptance profiling (Leviathan et al. 2023,
    * "Fast Inference from Transformers via Speculative Decoding"):
    * each request drafts [[SpecK]] tokens, the target model accepts a
    * PREFIX of them — the first rejected position ends the step and
    * the target emits one corrected token, so tokens-per-step =
    * accepted + 1 in every case (all-K accepted ⇒ K + 1 via the bonus
    * sample). Acceptance bits are the deterministic portable-hash
    * Bernoulli (p = 3/4) per (request, position), so the readout —
    * per request-type acceptance totals and expected tokens per step,
    * the number that decides whether speculation pays for the draft
    * model — is exact on both engines. Shapes: one bounded fan-out
    * (×K, AFTER the narrow scan), a keyed min (first-reject argmin,
    * map-side combinable), a keyed sum; the single division happens
    * once per output row on exact BIGINTs.
    */
  def qSpecDecodeAccept(s: SparkSession, dir: String): DataFrame = {
    val draftBit = graft.functions.PortableHash.hash64(
      concat(lit("sd:"), col("event_id").cast(StringType),
        lit(":"), col("p").cast(StringType)))
    val pos = Tables(s, dir, "events")
      .select(col("event_id"), col("event_type"))
      .withColumn("p", explode(sequence(lit(0), lit(SpecK - 1))))
      .withColumn("rej", when(draftBit % 4 === 0, col("p").cast(LongType)))
    val acc = pos.groupBy("event_id", "event_type")
      .agg(coalesce(min("rej"), lit(SpecK.toLong)).as("acc"))
    acc.groupBy("event_type")
      .agg(count(lit(1)).as("n_requests"),
        sum("acc").as("accepted_total"),
        (sum(col("acc") + 1).cast(DoubleType) / count(lit(1)))
          .as("tokens_per_step"))
      .orderBy("event_type")
  }

  private val qSpecDecodeAcceptSql = {
    val h = graft.functions.PortableHash.sql(
      "'sd:' || CAST(event_id AS STRING) || ':' || CAST(p AS STRING)")
    s"""WITH pos AS (
       |  SELECT event_id, event_type, p,
       |    CASE WHEN $h % 4 = 0 THEN p END AS rej
       |  FROM events CROSS JOIN range(0, $SpecK) r(p)),
       |acc AS (
       |  SELECT event_id, event_type,
       |    coalesce(min(rej), $SpecK) AS acc
       |  FROM pos GROUP BY 1, 2)
       |SELECT event_type, COUNT(*) AS n_requests,
       |  CAST(SUM(acc) AS BIGINT) AS accepted_total,
       |  CAST(SUM(acc + 1) AS DOUBLE) / COUNT(*) AS tokens_per_step
       |FROM acc GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gae" -> (qGae(_, _)),
    "q_temperature_scale" -> (qTemperatureScale(_, _)),
    "q_best_of_2" -> (qBestOf2(_, _)),
    "q_top_p_cutoff" -> (qTopPCutoff(_, _)),
    "q_spec_decode_accept" -> (qSpecDecodeAccept(_, _)))

  def oracles: Map[String, String] = Map(
    "q_gae" -> qGaeSql,
    "q_temperature_scale" -> qTemperatureScaleSql,
    "q_best_of_2" -> qBestOf2Sql,
    "q_top_p_cutoff" -> qTopPCutoffSql,
    "q_spec_decode_accept" -> qSpecDecodeAcceptSql)
}
