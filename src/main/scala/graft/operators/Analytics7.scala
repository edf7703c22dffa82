package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Metric-store shapes: fixed-width histograms and time-decayed
  * aggregates — the two workhorse summaries of a feature/metrics
  * pipeline over an append-only event log.
  *
  * Scale notes: both are single-scan map-side-combining hash
  * aggregates (no join, no sort until the final tiny ORDER BY), so at
  * 100 TB they reduce to one shuffle of |bins| or |users| rows. The
  * decay weight is a power of two (0.5^age_days), which an IEEE double
  * carries EXACTLY — multiplying by it only shifts the exponent — so
  * the quantized-sum trick (NOTES.md #4b) gives an order-independent,
  * engine-exact BIGINT total without a global sort.
  */
object Analytics7 {

  private val BinWidth = 5000.0 // l_extendedprice spans ~0.9k..105k → ~21 bins
  private val PriceScale = 64.0 // 2^6; Σ(price·2^6) ≤ 6e5·1e5·64 ≈ 2^42 « 2^53

  /** Fixed-width histogram of lineitem price: bin id, count, exact
    * quantized sum (and its double view). One narrow aggregate.
    */
  def qHistogram(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .select(floor(col("l_extendedprice") / BinWidth).cast(LongType).as("bin"),
        floor(col("l_extendedprice") * PriceScale).cast(LongType).as("p_q"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), (sum("p_q") / PriceScale).as("sum_price"))
      .orderBy("bin")

  private val qHistogramSql =
    s"""SELECT CAST(floor(l_extendedprice / $BinWidth) AS BIGINT) AS bin,
       |  COUNT(*) AS n,
       |  CAST(SUM(CAST(floor(l_extendedprice * $PriceScale) AS BIGINT)) AS DOUBLE)
       |    / $PriceScale AS sum_price
       |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin

  private val DecayScale = 1048576.0 // 2^20

  /** Per-user exponentially-decayed event value: weight 0.5^age_days
    * anchored on the corpus max timestamp. Age in whole days from
    * integral microsecond arithmetic (`div`), weight an exact power of
    * two, totals quantized at 2^20 — byte-exact across engines and
    * partitionings.
    */
  def qDecayAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").select("user_id", "ts", "value")
    val anchor = ev.agg(max("ts").as("t_max"))
    ev.crossJoin(broadcast(anchor))
      .select(col("user_id"),
        expr("(unix_micros(t_max) - unix_micros(ts)) div 86400000000").as("age_d"),
        col("value"))
      .select(col("user_id"),
        floor(col("value") * pow(lit(0.5), col("age_d")) * DecayScale)
          .cast(LongType).as("term_q"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (sum("term_q") / DecayScale).as("decayed_value"))
      .orderBy("user_id")
  }

  private val qDecayAggSql =
    s"""WITH a AS (SELECT max(CAST(ts AS TIMESTAMP)) AS t_max FROM events),
       |t AS (SELECT user_id,
       |    CAST(floor(value * pow(0.5,
       |      divide(epoch_us(a.t_max) - epoch_us(CAST(ts AS TIMESTAMP)), 86400000000)
       |    ) * $DecayScale) AS BIGINT) AS term_q
       |  FROM events, a)
       |SELECT user_id, COUNT(*) AS n_events,
       |  CAST(SUM(term_q) AS DOUBLE) / $DecayScale AS decayed_value
       |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin

  private val OhlcScale = 1048576.0 // 2^20

  /** Time-series downsampling to hourly OHLC bars per event type —
    * open/close are argmin/argmax-by-(ts, event_id) picks (map-side
    * min/max of a struct, never a window over the raw stream),
    * high/low/volume plain aggregates, total quantized. One
    * map-side-combined shuffle of |bars| rows at any scale.
    */
  def qOhlc(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"),
        col("ts"), col("event_id"), col("value"))
      .groupBy("event_type", "hour")
      .agg(
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max("value").as("high"), min("value").as("low"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        count(lit(1)).as("volume"),
        (sum(floor(col("value") * OhlcScale).cast(LongType)) / OhlcScale)
          .as("total"))
      .orderBy("event_type", "hour")

  private val qOhlcSql =
    s"""WITH e AS (SELECT event_type,
       |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
       |    CAST(ts AS TIMESTAMP) AS ts, event_id, value FROM events),
       |rk AS (SELECT *,
       |    row_number() OVER (PARTITION BY event_type, hour
       |      ORDER BY ts ASC, event_id ASC) AS ra,
       |    row_number() OVER (PARTITION BY event_type, hour
       |      ORDER BY ts DESC, event_id DESC) AS rd
       |  FROM e)
       |SELECT event_type, hour,
       |  min(CASE WHEN ra = 1 THEN value END) AS open,
       |  max(value) AS high, min(value) AS low,
       |  min(CASE WHEN rd = 1 THEN value END) AS close,
       |  COUNT(*) AS volume,
       |  CAST(SUM(CAST(floor(value * $OhlcScale) AS BIGINT)) AS DOUBLE)
       |    / $OhlcScale AS total
       |FROM rk GROUP BY event_type, hour
       |ORDER BY event_type, hour""".stripMargin

  private val Quantiles = Seq(0.5, 0.95, 0.99)

  /** Approximate quantiles FROM the histogram sketch — the mergeable,
    * one-pass quantile estimator monitoring systems run (equi-width
    * bins + linear interpolation inside the target bin). Unlike
    * rank-based exact quantiles there is no global sort at any scale:
    * the sketch is a |bins|-row map-combined aggregate, and the
    * interpolation is a window over the BOUNDED bin table (21 rows by
    * construction — the "window" never sees data-sized input). Sketch
    * estimates, exact oracle: the estimator is a deterministic
    * function of the bin counts, so DuckDB computes the identical
    * number.
    */
  def qHistQuantiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Tables(s, dir, "lineitem")
      .select(floor(col("l_extendedprice") / BinWidth).cast(LongType).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum("c").over(w))
      .withColumn("cum_prev", col("cum") - col("c"))
    val n = cum.agg(max("cum").as("n"))
    import s.implicits._
    val qs = Quantiles.toDF("q")
    qs.crossJoin(broadcast(n))
      .join(cum, col("q") * col("n") > col("cum_prev") &&
        col("q") * col("n") <= col("cum"))
      .select(col("q"),
        round(col("bin") * BinWidth +
          (col("q") * col("n") - col("cum_prev")) / col("c") * BinWidth, 6)
          .as("est"))
      .orderBy("q")
  }

  private val qHistQuantilesSql = {
    val qvals = Quantiles.mkString("(", "), (", ")")
    s"""WITH h AS (
       |  SELECT CAST(floor(l_extendedprice / $BinWidth) AS BIGINT) AS bin,
       |    COUNT(*) AS c
       |  FROM lineitem GROUP BY 1),
       |cum AS (SELECT bin, c,
       |    CAST(SUM(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM h),
       |cp AS (SELECT bin, c, cum, cum - c AS cum_prev FROM cum),
       |n AS (SELECT max(cum) AS n FROM cp),
       |qs0(q0) AS (VALUES $qvals),
       |qs AS (SELECT CAST(q0 AS DOUBLE) AS q FROM qs0)
       |SELECT qs.q,
       |  round(cp.bin * CAST($BinWidth AS DOUBLE)
       |    + (qs.q * n.n - cp.cum_prev) / cp.c * CAST($BinWidth AS DOUBLE), 6) AS est
       |FROM qs, n
       |JOIN cp ON qs.q * n.n > cp.cum_prev AND qs.q * n.n <= cp.cum
       |ORDER BY q""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_histogram" -> (qHistogram(_, _)),
    "q_decay_agg" -> (qDecayAgg(_, _)),
    "q_ohlc" -> (qOhlc(_, _)),
    "q_hist_quantiles" -> (qHistQuantiles(_, _)))

  def oracles: Map[String, String] = Map(
    "q_histogram" -> qHistogramSql,
    "q_decay_agg" -> qDecayAggSql,
    "q_ohlc" -> qOhlcSql,
    "q_hist_quantiles" -> qHistQuantilesSql)
}
