package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Third eval/stats wave: winsorized robust means, class-balance
  * diagnostics, sample-ratio-mismatch testing, and deterministic
  * per-group sampling — the remaining pre-training dataset health
  * checks beside [[EvalOps]]/[[EvalOps2]]. Reference scope: none in
  * the reference (an ETL loader).
  */
object EvalOps3 {

  // ---------------------------------------------------- q_winsorize

  /** Winsorized group means: per return flag, clamp the money column
    * at its own [P05, P95] (exact interpolated percentiles, the
    * q_percentiles kernel) and report raw vs winsorized means plus how
    * many rows each bound clamped. Unlike `q_outlier_trim` (which
    * DROPS tail rows) winsorizing keeps n constant — the robust-mean
    * variant a metrics pipeline wants when denominators must not move.
    * Two passes: one percentile aggregate (3 groups, broadcast back),
    * one clamp-and-aggregate. Both means are exact under any
    * partitioning: the raw mean is a DECIMAL money sum over a count,
    * and the winsorized mean decomposes into that same exact interior
    * sum plus n_low·lo + n_high·hi — two single double products — so
    * the interpolated (arbitrary-double) bounds never enter a
    * multi-row float sum.
    */
  def qWinsorize(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val q = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.05)").as("lo"),
        expr("percentile(l_extendedprice, 0.95)").as("hi"))
    val p = col("l_extendedprice")
    val pd = p.cast(DecimalType(12, 2))
    li.join(broadcast(q), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when(p < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(p > col("hi"), 1L).otherwise(0L)).as("n_high"),
        sum(pd).as("sp"),
        sum(when(p >= col("lo") && p <= col("hi"), pd)).as("sm"),
        max("lo").as("lo"), max("hi").as("hi"))
      .select(col("l_returnflag"), col("n"), col("n_low"), col("n_high"),
        round(col("sp").cast(DoubleType) / col("n"), 6).as("mean_raw"),
        round((coalesce(col("sm").cast(DoubleType), lit(0.0)) +
          col("n_low") * col("lo") + col("n_high") * col("hi")) / col("n"), 6)
          .as("mean_winsor"))
      .orderBy("l_returnflag")
  }

  private val qWinsorizeSql =
    """WITH q AS (
      |  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.05) AS lo,
      |         quantile_cont(l_extendedprice, 0.95) AS hi
      |  FROM lineitem GROUP BY l_returnflag),
      |g AS (
      |  SELECT l.l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |    CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sp,
      |    SUM(CASE WHEN l_extendedprice >= lo AND l_extendedprice <= hi
      |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS sm,
      |    MAX(lo) AS lo, MAX(hi) AS hi
      |  FROM lineitem l JOIN q ON q.l_returnflag = l.l_returnflag
      |  GROUP BY l.l_returnflag)
      |SELECT l_returnflag, n, n_low, n_high,
      |  round(CAST(sp AS DOUBLE) / n, 6) AS mean_raw,
      |  round((COALESCE(CAST(sm AS DOUBLE), CAST(0 AS DOUBLE))
      |    + n_low * lo + n_high * hi) / n, 6) AS mean_winsor
      |FROM g ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------ q_class_balance

  private val CbBeta = 0.999

  /** Class-balance report over the embedding labels: per class, count,
    * corpus share, ratio to the majority class, and the effective
    * sample number (1 − β^n)/(1 − β) with β = 0.999 (Cui et al.,
    * "Class-Balanced Loss Based on Effective Number of Samples",
    * CVPR 2019) — the reweighting denominator a class-balanced
    * training loss uses. One aggregate + a broadcast 1-row total.
    */
  def qClassBalance(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "embeddings")
      .groupBy("label").agg(count(lit(1)).as("n"))
    val t = c.agg(sum("n").as("tot"), max("n").as("mx"))
    c.crossJoin(broadcast(t))
      .select(col("label"), col("n"),
        round(col("n").cast(DoubleType) / col("tot"), 6).as("share"),
        round(col("n").cast(DoubleType) / col("mx"), 6).as("ratio_to_max"),
        round((lit(1.0) - pow(lit(CbBeta), col("n"))) / (lit(1.0) - lit(CbBeta)), 6)
          .as("effective_n"))
      .orderBy("label")
  }

  private val qClassBalanceSql =
    s"""WITH c AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
       |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot, MAX(n) AS mx FROM c)
       |SELECT label, n,
       |  round(CAST(n AS DOUBLE) / tot, 6) AS share,
       |  round(CAST(n AS DOUBLE) / mx, 6) AS ratio_to_max,
       |  round((CAST(1 AS DOUBLE) - pow(CAST($CbBeta AS DOUBLE), n))
       |        / (CAST(1 AS DOUBLE) - CAST($CbBeta AS DOUBLE)), 6) AS effective_n
       |FROM c CROSS JOIN t ORDER BY label""".stripMargin

  // ----------------------------------------------------- q_ab_srm

  /** Sample-ratio mismatch check for a 50/50 experiment: users hash
    * deterministically into two variants, and the one-degree-of-
    * freedom chi-square against the expected half-half split flags a
    * broken randomizer (the first thing to check before reading any
    * A/B metric; threshold 3.841 = χ²₁ at p = 0.05). One scan, one
    * row out.
    */
  def qAbSrm(s: SparkSession, dir: String): DataFrame = {
    val variant = PortableHash.hash64(col("user_id").cast(StringType)) % 2
    val c = Tables(s, dir, "events")
      .agg(sum(when(variant === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(variant === 1, 1L).otherwise(0L)).as("n_b"))
    val exp = (col("n_a") + col("n_b")).cast(DoubleType) / 2
    val chi2 = pow(col("n_a") - exp, 2) / exp + pow(col("n_b") - exp, 2) / exp
    c.select(col("n_a"), col("n_b"),
      round(chi2, 6).as("chi2"), (chi2 > 3.841).as("srm"))
  }

  private val qAbSrmSql = {
    val h = PortableHash.sql("CAST(user_id AS STRING)")
    s"""WITH c AS (
       |  SELECT CAST(SUM(CASE WHEN $h % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |         CAST(SUM(CASE WHEN $h % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
       |  FROM events),
       |x AS (SELECT n_a, n_b,
       |    pow(n_a - (n_a + n_b) / CAST(2 AS DOUBLE), 2) / ((n_a + n_b) / CAST(2 AS DOUBLE))
       |  + pow(n_b - (n_a + n_b) / CAST(2 AS DOUBLE), 2) / ((n_a + n_b) / CAST(2 AS DOUBLE)) AS chi2
       |  FROM c)
       |SELECT n_a, n_b, round(chi2, 6) AS chi2, chi2 > 3.841 AS srm FROM x""".stripMargin
  }

  // -------------------------------------------------- q_group_sample

  private val GsK = 20

  /** Deterministic per-group uniform sample: within each event type,
    * keep the [[GsK]] rows with the SMALLEST portable hash of the row
    * key — reproducible across retries and incremental loads (the
    * q_hash_sample rule, per group), cut by the native
    * [[graft.plans.GroupedTopK]] bounded heap instead of a window
    * sort. The hash folds to 50 bits first because the heap compares
    * order keys as DOUBLE (the q_domain_cap rule); negation turns the
    * keep-largest heap into keep-smallest.
    */
  def qGroupSample(s: SparkSession, dir: String): DataFrame = {
    val h = Tables(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        pmod(PortableHash.hash64(col("event_id").cast(StringType)),
          lit(1L << 50)).as("hkey"))
    graft.plans.GroupedTopK(h, s,
        Seq(col("event_type")), -col("hkey"), col("event_id"), GsK)
      .orderBy(asc("event_type"), asc("hkey"), asc("event_id"))
      .select("event_type", "event_id", "hkey")
  }

  private val qGroupSampleSql = {
    val h = s"${PortableHash.sql("CAST(event_id AS STRING)")} % ${1L << 50}"
    s"""WITH h AS (
       |  SELECT event_type, event_id, $h AS hkey FROM events)
       |SELECT event_type, event_id, hkey FROM (
       |  SELECT event_type, event_id, hkey,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY hkey ASC, event_id ASC) AS rk
       |  FROM h) WHERE rk <= $GsK
       |ORDER BY event_type ASC, hkey ASC, event_id ASC""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_winsorize" -> (qWinsorize(_, _)),
    "q_class_balance" -> (qClassBalance(_, _)),
    "q_ab_srm" -> (qAbSrm(_, _)),
    "q_group_sample" -> (qGroupSample(_, _)))

  def oracles: Map[String, String] = Map(
    "q_winsorize" -> qWinsorizeSql,
    "q_class_balance" -> qClassBalanceSql,
    "q_ab_srm" -> qAbSrmSql,
    "q_group_sample" -> qGroupSampleSql)
}
