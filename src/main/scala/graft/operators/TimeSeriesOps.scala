package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Per-series diagnostics over the event log, plus the table-maintenance
  * planner a 100 TB lakehouse runs nightly. Reference scope: the
  * reference engine (an ETL loader) has none of these; they extend the
  * analytics surface the way `q_anomaly_zscore`/`q_ohlc` do.
  *
  * Shared determinism technique (COVERAGE.md "quantized sums"): event
  * values carry two decimals, so `floor(value·100 + 0.5)` is an exact
  * integer "cents" representation computed by the identical IEEE ops on
  * both engines. Every per-series moment is then a BIGINT aggregate
  * (order-independent under any partitioning), and the final statistic
  * is one fixed chain of double ops over those exact integers — written
  * operand-for-operand identically in the oracle SQL, so results are
  * byte-exact without any epsilon.
  *
  * Scale: all three queries partition by their natural key (user series
  * / table partition). The windows scan one series or one partition's
  * file list — bounded units of work that shard across any number of
  * executors; no global sort, no driver loop. The BIGINT moments keep
  * exact headroom to ~1e5 rows per series at this quantization; past
  * that the same shapes carry with DECIMAL(38,0) sums.
  */
object TimeSeriesOps {

  /** value → exact integer cents (two-decimal source data). */
  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100d + 0.5d).cast(LongType)

  private val CentsSql = "CAST(floor(value * 100 + 0.5) AS BIGINT)"

  // ------------------------------------------------------- autocorrelation

  /** Lag-k autocorrelation (k = 1, 2) of each user's event-value series
    * — the "is this signal self-similar / is my sampling cadence right"
    * diagnostic run before modeling a series. Pearson correlation over
    * the lagged pairs: every sum feeding it is a BIGINT over exact
    * cents (sums, squares, cross products), aggregated per user in one
    * map-side-combinable pass after a per-series lag window. sqrt and
    * the divisions are IEEE-exact ops on identical operands, so no
    * rounding is needed.
    */
  def qAutocorr(s: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), cents(col("value")).as("q"))
      .withColumn("q1", lag("q", 1).over(byTs))
      .withColumn("q2", lag("q", 2).over(byTs))
    def corrCols(lagc: String, out: String) = {
      val nk = count(col(lagc)).cast(DoubleType)
      val sa = sum(when(col(lagc).isNotNull, col("q"))).cast(DoubleType)
      val sb = sum(col(lagc)).cast(DoubleType)
      val sab = sum(col("q") * col(lagc)).cast(DoubleType)
      val sa2 = sum(when(col(lagc).isNotNull, col("q") * col("q"))).cast(DoubleType)
      val sb2 = sum(col(lagc) * col(lagc)).cast(DoubleType)
      ((nk * sab - sa * sb) /
        nullif(sqrt((nk * sa2 - sa * sa) * (nk * sb2 - sb * sb)), lit(0d))).as(out)
    }
    ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        corrCols("q1", "r_lag1"), corrCols("q2", "r_lag2"))
      .orderBy("user_id")
  }

  private val qAutocorrSql = {
    def corr(l: String): String =
      s"""(CAST(COUNT(q$l) AS DOUBLE) * CAST(SUM(q * q$l) AS DOUBLE)
         |   - CAST(SUM(CASE WHEN q$l IS NOT NULL THEN q END) AS DOUBLE)
         |     * CAST(SUM(q$l) AS DOUBLE))
         | / nullif(sqrt(
         |     (CAST(COUNT(q$l) AS DOUBLE)
         |        * CAST(SUM(CASE WHEN q$l IS NOT NULL THEN q * q END) AS DOUBLE)
         |      - CAST(SUM(CASE WHEN q$l IS NOT NULL THEN q END) AS DOUBLE)
         |        * CAST(SUM(CASE WHEN q$l IS NOT NULL THEN q END) AS DOUBLE))
         |     * (CAST(COUNT(q$l) AS DOUBLE)
         |          * CAST(SUM(q$l * q$l) AS DOUBLE)
         |        - CAST(SUM(q$l) AS DOUBLE) * CAST(SUM(q$l) AS DOUBLE))), 0)""".stripMargin
    s"""WITH t AS (
       |  SELECT user_id, $CentsSql AS q,
       |    lag($CentsSql, 1) OVER w AS q1,
       |    lag($CentsSql, 2) OVER w AS q2
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, COUNT(*) AS n_events,
       |  ${corr("1")} AS r_lag1,
       |  ${corr("2")} AS r_lag2
       |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // ------------------------------------------------------- changepoint

  /** Single-changepoint (AMOC) detection per user series via the CUSUM
    * statistic max_t |n·S_t − t·S| over centered partial sums — the
    * classic mean-shift estimator, here in the form whose argmax is an
    * EXACT integer comparison: S_t and S are BIGINT cents prefix/total
    * sums, so the per-row statistic is a BIGINT and the winning split
    * needs no float compare at all (ties broken on the earliest
    * position). Only the reported before/after means divide the exact
    * integers down to doubles. One per-series prefix-sum window + one
    * per-series rank — both shard by user.
    */
  def qChangepoint(s: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val rows = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), cents(col("value")).as("q"))
      .withColumn("t", row_number().over(byTs))
      .withColumn("st", sum("q").over(byTs.rowsBetween(Window.unboundedPreceding, 0)))
    val series = rows.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("q").as("stot"))
    val scored = rows.join(series, "user_id")
      .where(col("t") < col("n")) // split AFTER position t; needs both sides non-empty
      .withColumn("stat", abs(col("n") * col("st") - col("t") * col("stot")))
    // per-series argmax through the bounded-heap operator (k = 1): the
    // user_id exchange is already in place from the prefix windows, so
    // this skips the per-series (stat desc) re-sort entirely. stat ≤
    // n·Σcents stays far under 2^53, so the heap's double compare is
    // exact.
    graft.plans.GroupedTopK(scored, s,
        Seq(col("user_id")), col("stat"), col("t"), 1)
      .select(col("user_id"), col("n").as("n_events"), col("t").as("cp_pos"),
        col("stat").as("cusum_stat"),
        (col("st").cast(DoubleType) / col("t") / 100d).as("mean_before"),
        ((col("stot") - col("st")).cast(DoubleType) / (col("n") - col("t")) / 100d)
          .as("mean_after"))
      .orderBy("user_id")
  }

  private val qChangepointSql =
    s"""WITH r AS (
       |  SELECT user_id, $CentsSql AS q,
       |    row_number() OVER w AS t,
       |    SUM($CentsSql) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |ser AS (SELECT user_id, COUNT(*) AS n, SUM(q) AS stot FROM r GROUP BY user_id),
       |scored AS (
       |  SELECT r.user_id, ser.n, r.t, r.st, ser.stot,
       |    abs(ser.n * r.st - r.t * ser.stot) AS stat,
       |    row_number() OVER (PARTITION BY r.user_id
       |      ORDER BY abs(ser.n * r.st - r.t * ser.stot) DESC, r.t ASC) AS rk
       |  FROM r JOIN ser ON r.user_id = ser.user_id
       |  WHERE r.t < ser.n)
       |SELECT user_id, n AS n_events, t AS cp_pos, CAST(stat AS BIGINT) AS cusum_stat,
       |  CAST(st AS DOUBLE) / t / 100 AS mean_before,
       |  CAST(stot - st AS DOUBLE) / (n - t) / 100 AS mean_after
       |FROM scored WHERE rk = 1 ORDER BY user_id""".stripMargin

  // ------------------------------------------------------- compaction plan

  private val TargetBytes = 2048L

  /** Small-file compaction planning — the nightly maintenance pass a
    * 100 TB parquet lake runs to keep scans off thousand-file
    * partitions. Files (here: documents, sized by `n_chars`) are packed
    * per table-partition (`source`) into target-size output bins by
    * size-descending first-fit: a deterministic total order (size DESC,
    * id ASC), one prefix-sum window over the PARTITION'S FILE LIST (a
    * metadata-scale relation — file counts, not file bytes), and
    * `cum div target` as the bin id. Output is the per-bin manifest a
    * rewrite job would execute. Everything shards by partition; no
    * global sort, and the integer division makes bin assignment exact.
    */
  def qCompactionPlan(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy(desc("n_chars"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("cum_before", coalesce(sum("n_chars").over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $TargetBytes"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_files"), sum("n_chars").as("bytes"),
        max("n_chars").as("max_file"),
        (sum("n_chars").cast(DoubleType) / TargetBytes).as("fill_ratio"))
      .orderBy("source", "bin")
  }

  private val qCompactionPlanSql =
    s"""WITH f AS (
       |  SELECT doc_id, source, n_chars,
       |    coalesce(SUM(n_chars) OVER (PARTITION BY source
       |      ORDER BY n_chars DESC, doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM documents)
       |SELECT source, CAST(divide(cum_before, $TargetBytes) AS BIGINT) AS bin,
       |  COUNT(*) AS n_files, CAST(SUM(n_chars) AS BIGINT) AS bytes,
       |  MAX(n_chars) AS max_file,
       |  CAST(SUM(n_chars) AS DOUBLE) / $TargetBytes AS fill_ratio
       |FROM f GROUP BY source, bin ORDER BY source, bin""".stripMargin

  // ------------------------------------------------------- truncated EWMA

  private val EwmaW = 8 // window: lags 0..7, weight 2^(7-k) (α = 1/2)

  /** Exponentially-weighted moving average per user series, α = 1/2,
    * truncated at [[EwmaW]] lags — the smoothing pass behind every
    * "current rate" monitor. The α = 1/2 choice makes every weight a
    * power of two, so numerator and denominator are exact BIGINT
    * window sums over cents (one window pass, [[EwmaW]] `lag` reads,
    * no self-join / no explode) and the only float op is the final
    * division — identical single IEEE ops on both engines. Series
    * heads renormalize automatically: absent lags contribute to
    * neither sum. One window per user series; shards by user.
    */
  def qEwma(s: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val rows = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), cents(col("value")).as("q"))
      .withColumn("rn", row_number().over(byTs))
    val lagged = (0 until EwmaW).foldLeft(rows) { (df, k) =>
      if (k == 0) df.withColumn("l0", col("q"))
      else df.withColumn(s"l$k", lag("q", k).over(byTs))
    }
    val num = (0 until EwmaW)
      .map(k => coalesce(col(s"l$k") * lit(1L << (EwmaW - 1 - k)), lit(0L)))
      .reduce(_ + _)
    val den = (0 until EwmaW)
      .map(k => when(col(s"l$k").isNotNull, lit(1L << (EwmaW - 1 - k))).otherwise(lit(0L)))
      .reduce(_ + _)
    lagged
      .select(col("user_id"), col("rn"), col("q"),
        (num.cast(DoubleType) / den / 100d).as("ewma"))
      .orderBy("user_id", "rn")
  }

  private val qEwmaSql = {
    val lagDefs = (1 until EwmaW).map(k => s"lag(q, $k) OVER w AS l$k").mkString(",\n    ")
    val num = (0 until EwmaW)
      .map(k => s"coalesce(l$k * ${1L << (EwmaW - 1 - k)}, 0)").mkString(" + ")
    val den = (0 until EwmaW)
      .map(k => s"(CASE WHEN l$k IS NOT NULL THEN ${1L << (EwmaW - 1 - k)} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH base AS (
       |  SELECT user_id, ts, event_id, $CentsSql AS q FROM events),
       |t AS (
       |  SELECT user_id, q,
       |    row_number() OVER w AS rn,
       |    q AS l0,
       |    $lagDefs
       |  FROM base
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, rn, q,
       |  CAST($num AS DOUBLE) / ($den) / 100 AS ewma
       |FROM t ORDER BY user_id, rn""".stripMargin
  }

  // ------------------------------------------------------- A/B test report

  /** Two-sample experiment readout per event type: users split into
    * arms by `user_id % 2` (the deterministic stand-in for a hash
    * assignment), Welch z-statistic on mean event value. Every moment
    * (count, sum, sum-of-squares) is a BIGINT over exact cents —
    * one map-side-combinable aggregate over the fact table, arms
    * folded in via conditional aggregation so there is no self-join —
    * and the z-score is one fixed chain of double ops written
    * operand-for-operand identically in the oracle. The shape a
    * training-data pipeline uses to compare ablation cohorts.
    */
  def qAbTest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("event_type"), (col("user_id") % 2).as("arm"), cents(col("value")).as("q"))
    def m(arm: Int, e: org.apache.spark.sql.Column) = sum(when(col("arm") === arm, e))
    val agg = ev.groupBy("event_type").agg(
      m(0, lit(1L)).as("n0"), m(0, col("q")).as("s0"), m(0, col("q") * col("q")).as("ss0"),
      m(1, lit(1L)).as("n1"), m(1, col("q")).as("s1"), m(1, col("q") * col("q")).as("ss1"))
    def mean(s0: String, n: String) =
      col(s0).cast(DoubleType) / col(n) / 100d
    // sample variance in value units: (ss − s²/n) / (n−1) / 100²
    def variance(ss: String, sv: String, n: String) =
      (col(ss).cast(DoubleType) - col(sv).cast(DoubleType) * col(sv) / col(n)) /
        (col(n) - 1) / 10000d
    agg
      .withColumn("mean_a", mean("s0", "n0"))
      .withColumn("mean_b", mean("s1", "n1"))
      .withColumn("z", (col("mean_a") - col("mean_b")) /
        sqrt(variance("ss0", "s0", "n0") / col("n0") +
          variance("ss1", "s1", "n1") / col("n1")))
      .select(col("event_type"), col("n0").as("n_a"), col("n1").as("n_b"),
        col("mean_a"), col("mean_b"), col("z"),
        (abs(col("z")) > 1.96).as("significant"))
      .orderBy("event_type")
  }

  private val qAbTestSql = {
    def m(arm: Int, e: String) = s"SUM(CASE WHEN arm = $arm THEN $e END)"
    def mean(s0: String, n: String) = s"CAST($s0 AS DOUBLE) / $n / 100"
    def variance(ss: String, sv: String, n: String) =
      s"(CAST($ss AS DOUBLE) - CAST($sv AS DOUBLE) * $sv / $n) / ($n - 1) / 10000"
    s"""WITH ev AS (
       |  SELECT event_type, user_id % 2 AS arm, $CentsSql AS q FROM events),
       |agg AS (
       |  SELECT event_type,
       |    ${m(0, "1")} AS n0, ${m(0, "q")} AS s0, ${m(0, "q * q")} AS ss0,
       |    ${m(1, "1")} AS n1, ${m(1, "q")} AS s1, ${m(1, "q * q")} AS ss1
       |  FROM ev GROUP BY event_type),
       |z AS (
       |  SELECT event_type, n0, n1,
       |    ${mean("s0", "n0")} AS mean_a, ${mean("s1", "n1")} AS mean_b,
       |    (${mean("s0", "n0")} - ${mean("s1", "n1")}) /
       |      sqrt(${variance("ss0", "s0", "n0")} / n0 +
       |           ${variance("ss1", "s1", "n1")} / n1) AS z
       |  FROM agg)
       |SELECT event_type, CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
       |  mean_a, mean_b, z,
       |  abs(z) > 1.96 AS significant
       |FROM z ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------------------- Kaplan-Meier

  private val GapBucketUs = 60000000L // gap buckets: whole minutes
  private val SurvZeroLq = -50L * 1073741824L // ln-quantum for survival == 0

  /** Kaplan–Meier survival over inter-event gaps ("time to next
    * activity", the return-time curve a product-analytics pipeline
    * publishes): each event's gap to the user's next event is an
    * observed duration; the final open gap (last event → corpus end)
    * is right-censored. Durations bucket to whole minutes by exact
    * integer division of epoch micros. The risk-set table is one
    * integer prefix window over the DISTINCT-minute relation (never
    * the fact table: n_at_risk = total − cumulative earlier-gap
    * count); the product-limit estimator runs as the exact quantized
    * ln-sum chain (the ta_ngram_lm discipline): per-step ln(1−d/n)
    * rounded at 1e-6, 2^30-quantized cumulative integer sums, one exp
    * at the end — engine-exact under any partitioning, with ln/exp
    * last-ulp agreement the documented platform assumption.
    */
  def qSurvival(s: SparkSession, dir: String): DataFrame = {
    val Pow2_30 = 1073741824.0
    val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ev = Tables(s, dir, "events")
    val horizon = ev.agg(max(unix_micros(col("ts"))).as("maxus"))
    val gaps = ev
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("nxt", lead("us", 1).over(byTs))
      .crossJoin(broadcast(horizon))
      .select(
        // integral `div` (not `/`): double division + cast could land
        // one ulp under an integer and truncate differently than the
        // oracle's exact `//`
        expr(s"CASE WHEN nxt IS NOT NULL THEN (nxt - us) div $GapBucketUs" +
          s" ELSE (maxus - us) div $GapBucketUs END").as("gap_min"),
        col("nxt").isNull.as("censored"))
    val byGap = gaps.groupBy("gap_min")
      .agg(count(lit(1)).as("n_ending"),
        sum(when(!col("censored"), 1L).otherwise(0L)).as("n_deaths"))
    val total = gaps.count()
    val w = Window.orderBy("gap_min").rowsBetween(Window.unboundedPreceding, -1)
    val risk = byGap
      .withColumn("n_at_risk", lit(total) - coalesce(sum("n_ending").over(w), lit(0L)))
      .where(col("n_deaths") > 0)
    val lnf = round(log(lit(1.0) -
      col("n_deaths").cast(DoubleType) / col("n_at_risk")), 6)
    val ws = Window.orderBy("gap_min").rowsBetween(Window.unboundedPreceding, 0)
    risk
      // d == n (risk set fully dies) → ln(0); a fixed −50·2^30 quantum
      // makes exp round to 0 at 1e-6, identically on both engines
      .withColumn("lq", when(col("n_deaths") < col("n_at_risk"),
        floor(lnf * Pow2_30).cast(LongType)).otherwise(lit(SurvZeroLq)))
      .withColumn("survival",
        round(exp(sum("lq").over(ws).cast(DoubleType) / Pow2_30), 6))
      .select(col("gap_min"), col("n_at_risk"), col("n_deaths"), col("survival"))
      .orderBy("gap_min")
  }

  private val qSurvivalSql =
    s"""WITH horizon AS (SELECT max(epoch_us(ts)) AS maxus FROM events),
       |g AS (
       |  SELECT user_id, epoch_us(ts) AS us,
       |    lead(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
       |  FROM events),
       |gaps AS (
       |  SELECT CASE WHEN nxt IS NOT NULL THEN divide(nxt - us, $GapBucketUs)
       |         ELSE divide((SELECT maxus FROM horizon) - us, $GapBucketUs) END AS gap_min,
       |    nxt IS NULL AS censored
       |  FROM g),
       |bygap AS (
       |  SELECT gap_min, COUNT(*) AS n_ending,
       |    CAST(SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS BIGINT) AS n_deaths
       |  FROM gaps GROUP BY gap_min),
       |risk AS (
       |  SELECT gap_min, n_deaths,
       |    CAST((SELECT COUNT(*) FROM gaps) - coalesce(SUM(n_ending) OVER (ORDER BY gap_min
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
       |  FROM bygap),
       |steps AS (
       |  SELECT gap_min, n_at_risk, n_deaths,
       |    CASE WHEN n_deaths < n_at_risk THEN
       |      CAST(floor(round(ln(1.0 - CAST(n_deaths AS DOUBLE) / n_at_risk), 6)
       |        * 1073741824.0) AS BIGINT) ELSE $SurvZeroLq END AS lq
       |  FROM risk WHERE n_deaths > 0)
       |SELECT gap_min, n_at_risk, n_deaths,
       |  round(exp(CAST(SUM(lq) OVER (ORDER BY gap_min
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |    / 1073741824.0), 6) AS survival
       |FROM steps ORDER BY gap_min""".stripMargin

  // ------------------------------------------------------- attribution

  private val AttrWindowDays = 7

  /** First/last-touch marketing attribution: every `purchase` credits
    * the earliest and latest non-purchase touchpoint of the same user
    * within the preceding [[AttrWindowDays]] days. The touch↔conversion
    * join is keyed by user (co-partitioned, per-user bounded) and each
    * conversion picks its first/last touch as min/max(struct(ts,
    * event_id, type)) — map-side-combining aggregates, no windows over
    * the fact table. Output: per-channel credit counts.
    */
  def qAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val conv = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("cid"))
    val touch = ev.where(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts").as("tts"), col("event_id").as("tid"),
        col("event_type").as("channel"))
    val attributed = conv.join(touch, Seq("user_id"))
      .where(col("tts") <= col("cts") &&
        col("tts") >= col("cts") - expr(s"INTERVAL $AttrWindowDays DAYS"))
      .groupBy("cid")
      .agg(min(struct(col("tts"), col("tid"), col("channel"))).as("first"),
        max(struct(col("tts"), col("tid"), col("channel"))).as("last"))
    val firstCredits = attributed.groupBy(col("first.channel").as("channel"))
      .agg(count(lit(1)).as("first_touch"))
    val lastCredits = attributed.groupBy(col("last.channel").as("channel"))
      .agg(count(lit(1)).as("last_touch"))
    firstCredits.join(lastCredits, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"))
      .orderBy("channel")
  }

  private val qAttributionSql =
    s"""WITH conv AS (
       |  SELECT user_id, ts AS cts, event_id AS cid FROM events
       |  WHERE event_type = 'purchase'),
       |touch AS (
       |  SELECT user_id, ts AS tts, event_id AS tid, event_type AS channel
       |  FROM events WHERE event_type <> 'purchase'),
       |attributed AS (
       |  SELECT c.cid,
       |    min_by(t.channel, lpad(CAST(epoch_ms(CAST(t.tts AS TIMESTAMP)) AS STRING), 15, '0')
       |      || lpad(CAST(t.tid AS STRING), 15, '0')) AS first_channel,
       |    max_by(t.channel, lpad(CAST(epoch_ms(CAST(t.tts AS TIMESTAMP)) AS STRING), 15, '0')
       |      || lpad(CAST(t.tid AS STRING), 15, '0')) AS last_channel
       |  FROM conv c JOIN touch t ON c.user_id = t.user_id
       |  WHERE t.tts <= c.cts AND t.tts >= c.cts - INTERVAL $AttrWindowDays DAY
       |  GROUP BY c.cid),
       |fc AS (SELECT first_channel AS channel, COUNT(*) AS first_touch
       |  FROM attributed GROUP BY first_channel),
       |lc AS (SELECT last_channel AS channel, COUNT(*) AS last_touch
       |  FROM attributed GROUP BY last_channel)
       |SELECT coalesce(fc.channel, lc.channel) AS channel,
       |  coalesce(fc.first_touch, 0) AS first_touch,
       |  coalesce(lc.last_touch, 0) AS last_touch
       |FROM fc FULL OUTER JOIN lc ON fc.channel = lc.channel
       |ORDER BY channel""".stripMargin

  // ------------------------------------------------- seasonal backtest

  private val FcCutoff = "2024-01-28" // last 3 days of the archive = test
  private val FcQ = 1000000L

  /** Seasonal-naive forecast backtest: predict each test-day hourly
    * mean by the training-period mean for the same hour-of-day, score
    * MAE per series — the baseline every production forecast must
    * beat, run as a backtest INSIDE the engine. Two aggregation passes
    * (train cells, test cells — both map-side-combinable, both
    * corpus-size-independent after the first reduce) + one broadcast-
    * sized join on (series, hour). Exact: cell means are
    * decimal-sum ÷ count; |error| is rounded at 1e-6 and quantized so
    * the per-series MAE sum is order-independent (trajectory pattern).
    */
  def qForecastSnaive(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    def cells(f: Column => Column) = Tables(s, dir, "events")
      .where(f(col("ts")))
      .groupBy(col("event_type"), hour(col("ts")).cast(LongType).as("hr"))
    val train = cells(_ < lit(FcCutoff).cast(TimestampType))
      .agg((sum(floor(col("value") * 1048576.0).cast(dec)).cast(DoubleType) /
        count(lit(1)).cast(DoubleType) / 1048576.0).as("pred"))
    val test = Tables(s, dir, "events")
      .where(col("ts") >= lit(FcCutoff).cast(TimestampType))
      .groupBy(col("event_type"), to_date(col("ts")).as("day"),
        hour(col("ts")).cast(LongType).as("hr"))
      .agg((sum(floor(col("value") * 1048576.0).cast(dec)).cast(DoubleType) /
        count(lit(1)).cast(DoubleType) / 1048576.0).as("actual"))
    test.join(train, Seq("event_type", "hr"))
      .select(col("event_type"),
        floor(round(abs(col("actual") - col("pred")), 6) * FcQ + 0.5)
          .cast(LongType).as("eq"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_cells"),
        round(sum("eq").cast(DoubleType) / FcQ / count(lit(1)).cast(DoubleType), 6)
          .as("mae"))
      .orderBy("event_type")
  }

  private val qForecastSnaiveSql =
    s"""WITH train AS (
       |  SELECT event_type, CAST(date_part('hour', ts) AS BIGINT) AS hr,
       |    CAST(SUM(CAST(floor(value * 1048576.0) AS BIGINT)) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE) / 1048576.0 AS pred
       |  FROM events WHERE ts < TIMESTAMP '$FcCutoff 00:00:00'
       |  GROUP BY 1, 2),
       |test AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(date_part('hour', ts) AS BIGINT) AS hr,
       |    CAST(SUM(CAST(floor(value * 1048576.0) AS BIGINT)) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE) / 1048576.0 AS actual
       |  FROM events WHERE ts >= TIMESTAMP '$FcCutoff 00:00:00'
       |  GROUP BY 1, 2, 3),
       |e AS (
       |  SELECT t.event_type,
       |    CAST(floor(round(abs(t.actual - tr.pred), 6) * $FcQ + 0.5) AS BIGINT) AS eq
       |  FROM test t JOIN train tr
       |    ON tr.event_type = t.event_type AND tr.hr = t.hr)
       |SELECT event_type, COUNT(*) AS n_cells,
       |  round(CAST(SUM(eq) AS DOUBLE) / $FcQ / CAST(COUNT(*) AS DOUBLE), 6) AS mae
       |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------ MAD outliers

  /** Robust outlier detection per event type: flag values beyond
    * 3·1.4826·MAD of the median (the Hampel rule — immune to the very
    * outliers it hunts, unlike `q_anomaly_zscore`'s moment-based
    * z-score). Both the median and the MAD are rank-selected LOWER
    * medians computed on VALUE-LEVEL cents histograms (one groupBy to
    * (type, cents), cumulative windows over distinct cents only — the
    * `ta_ks_test` shape), so nothing corpus-sized ever enters a
    * window and the whole query is two aggregate passes plus
    * bounded-cardinality joins. The outlier count folds over the same
    * histogram. Threshold arithmetic is one fixed double chain over
    * exact integers, identical in the oracle.
    */
  def qMadOutlier(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").where(col("value").isNotNull)
      .select(col("event_type"), cents(col("value")).as("vc"))
    // the whole med/dev/mad chain derives from this ONE value-level
    // histogram (bounded: |event_types| × |distinct cents| — a value-
    // domain relation, never corpus-sized), but it feeds seven
    // downstream references and Spark shares no subplans without
    // materialization — unpinned, every reference re-runs the corpus
    // scan + aggregate (~10 full scans; the r15 floor-drift root
    // cause). One eager localCheckpoint = one data-sized pass total.
    val hist = ev.groupBy("event_type", "vc").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // lower-median rank selection in ONE window pass: the running sum
    // (ordered frame) and the partition total (unbounded frame) share
    // the event_type exchange, and the per-type total over either
    // histogram IS the corpus n — no separate n aggregate, no join.
    // The groupBy(event_type) after each window rides the window's own
    // HashPartitioning(event_type) (hash keys ⊆ clustering keys), so
    // each median costs one bounded exchange end to end. Per-type
    // results are ≤ |event_types| rows — broadcast them explicitly
    // (the checkpointed LogicalRDD carries no stats, so Spark cannot
    // make the call itself).
    def lowerMedian(h: DataFrame, key: String, out: String): DataFrame = {
      val byType = Window.partitionBy("event_type")
      broadcast(h
        .withColumn("cum", sum("c").over(byType.orderBy(key)))
        .withColumn("tot", sum("c").over(byType))
        .where(col("cum") >= floor((col("tot") + 1) / 2d))
        .groupBy("event_type").agg(min(key).as(out)))
    }
    val med = lowerMedian(hist, "vc", "med")
    // the deviation histogram feeds the MAD selection AND the final
    // fold — checkpoint it too (value-domain-sized) so the second
    // reference re-reads blocks instead of re-running the join+agg
    val dev = hist.join(med, Seq("event_type"))
      .groupBy(col("event_type"), abs(col("vc") - col("med")).as("ad"))
      .agg(sum("c").as("c"))
      .localCheckpoint()
    val mad = lowerMedian(dev, "ad", "mad")
    val thr = lit(3d) * lit(1.4826d) * col("mad").cast(DoubleType)
    dev.join(mad, Seq("event_type"))
      .groupBy("event_type")
      .agg(sum("c").as("n"), first("mad").as("madc"),
        sum(when(col("ad").cast(DoubleType) > thr, col("c")).otherwise(0L))
          .as("n_outliers"))
      .join(med, Seq("event_type"))
      .select(col("event_type"), col("n"),
        round(col("med").cast(DoubleType) / 100d, 6).as("median"),
        round(col("madc").cast(DoubleType) / 100d, 6).as("mad"),
        col("n_outliers"),
        round(col("n_outliers").cast(DoubleType) /
          greatest(col("n"), lit(1L)).cast(DoubleType), 6).as("outlier_rate"))
      .orderBy("event_type")
  }

  private val qMadOutlierSql =
    s"""WITH ev AS (
       |  SELECT event_type, $CentsSql AS vc FROM events WHERE value IS NOT NULL),
       |hist AS (SELECT event_type, vc, COUNT(*) AS c FROM ev GROUP BY 1, 2),
       |n AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY 1),
       |med AS (
       |  SELECT h.event_type, min(h.vc) AS med FROM (
       |    SELECT event_type, vc,
       |      CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY vc) AS BIGINT) AS cum
       |    FROM hist) h JOIN n ON n.event_type = h.event_type
       |  WHERE h.cum >= floor((n.n + 1) / 2.0) GROUP BY h.event_type),
       |dev AS (
       |  SELECT h.event_type, abs(h.vc - m.med) AS ad, CAST(SUM(h.c) AS BIGINT) AS c
       |  FROM hist h JOIN med m ON m.event_type = h.event_type GROUP BY 1, 2),
       |mad AS (
       |  SELECT d.event_type, min(d.ad) AS mad FROM (
       |    SELECT event_type, ad,
       |      CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY ad) AS BIGINT) AS cum
       |    FROM dev) d JOIN n ON n.event_type = d.event_type
       |  WHERE d.cum >= floor((n.n + 1) / 2.0) GROUP BY d.event_type),
       |agg AS (
       |  SELECT d.event_type, CAST(SUM(d.c) AS BIGINT) AS n, min(md.mad) AS madc,
       |    CAST(SUM(CASE WHEN CAST(d.ad AS DOUBLE) > 3.0 * 1.4826 * CAST(md.mad AS DOUBLE)
       |             THEN d.c ELSE 0 END) AS BIGINT) AS n_outliers
       |  FROM dev d JOIN mad md ON md.event_type = d.event_type GROUP BY d.event_type)
       |SELECT a.event_type, a.n,
       |  round(CAST(m.med AS DOUBLE) / 100.0, 6) AS median,
       |  round(CAST(a.madc AS DOUBLE) / 100.0, 6) AS mad,
       |  a.n_outliers,
       |  round(CAST(a.n_outliers AS DOUBLE) / CAST(greatest(a.n, 1) AS DOUBLE), 6)
       |    AS outlier_rate
       |FROM agg a JOIN med m ON m.event_type = a.event_type
       |ORDER BY a.event_type""".stripMargin

  // ------------------------------------------------------- Theil–Sen

  /** Theil–Sen robust trend estimator over each event type's daily
    * volume: the median of all pairwise slopes — immune to the outlier
    * days that wreck an OLS fit (`q_ols`). The corpus collapses to one
    * (type, day, count) row per active day first, so the pairwise
    * self-join is bounded by days², a function of the time range and
    * never of row count (a decade is ~6.6 M pairs per type). The
    * median is the rank-selected LOWER median — `(n+1)/2` over the
    * deterministic (slope, day-pair) order — so both engines pick the
    * identical element and no interpolation enters; slopes themselves
    * are single IEEE divisions of integer counts, bit-equal across
    * engines. The rank window partitions by event type (bounded input
    * per partition: the pair table, not the corpus).
    */
  def qTheilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).cast(LongType).as("d"))
      .agg(count(lit(1)).as("cnt"))
    val a = daily.select(col("event_type"), col("d").as("d1"), col("cnt").as("c1"))
    val b = daily.select(col("event_type"), col("d").as("d2"), col("cnt").as("c2"))
    val pairs = a.join(b, Seq("event_type")).where(col("d1") < col("d2"))
      .select(col("event_type"), col("d1"), col("d2"),
        ((col("c2") - col("c1")).cast(DoubleType) /
          (col("d2") - col("d1")).cast(DoubleType)).as("slope"))
    val w = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    val nDays = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    pairs
      .withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy("event_type")))
      .where(col("rn") === floor((col("n_pairs") + 1) / 2d))
      .join(nDays, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        round(col("slope"), 6).as("ts_slope"))
      .orderBy("event_type")
  }

  private val qTheilSenSql =
    """WITH daily AS (
      |  SELECT event_type,
      |    divide(epoch_ms(CAST(CAST(ts AS DATE) AS TIMESTAMP)), 86400000) AS d,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.event_type, a.d AS d1, b.d AS d2,
      |    CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
      |  FROM daily a JOIN daily b ON b.event_type = a.event_type AND a.d < b.d),
      |ranked AS (
      |  SELECT event_type, slope,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope, d1, d2) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
      |  FROM pairs),
      |nd AS (SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1)
      |SELECT r.event_type, nd.n_days, r.n_pairs, round(r.slope, 6) AS ts_slope
      |FROM ranked r JOIN nd ON nd.event_type = r.event_type
      |WHERE r.rn = CAST(floor((r.n_pairs + 1) / 2.0) AS BIGINT)
      |ORDER BY r.event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_theil_sen" -> (qTheilSen(_, _)),
    "q_mad_outlier" -> (qMadOutlier(_, _)),
    "q_forecast_snaive" -> (qForecastSnaive(_, _)),
    "q_autocorr" -> (qAutocorr(_, _)),
    "q_changepoint" -> (qChangepoint(_, _)),
    "q_compaction_plan" -> (qCompactionPlan(_, _)),
    "q_ewma" -> (qEwma(_, _)),
    "q_ab_test" -> (qAbTest(_, _)),
    "q_survival" -> (qSurvival(_, _)),
    "q_attribution" -> (qAttribution(_, _)))

  def oracles: Map[String, String] = Map(
    "q_theil_sen" -> qTheilSenSql,
    "q_mad_outlier" -> qMadOutlierSql,
    "q_forecast_snaive" -> qForecastSnaiveSql,
    "q_autocorr" -> qAutocorrSql,
    "q_changepoint" -> qChangepointSql,
    "q_compaction_plan" -> qCompactionPlanSql,
    "q_ewma" -> qEwmaSql,
    "q_ab_test" -> qAbTestSql,
    "q_survival" -> qSurvivalSql,
    "q_attribution" -> qAttributionSql)
}
