package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Operators beyond plain relational algebra: as-of join, session
  * windows, percentiles, pivot.
  *
  * The as-of join is the textbook "operator Spark lacks": rather than a
  * custom SparkPlan, it composes as union → single sort per key →
  * last-non-null carry-forward — one shuffle + one sort, the same cost
  * shape a native as-of exec would have, and it scales because the sort
  * is per-partition after hash-partitioning on the key (no broadcast,
  * no range join explosion). The DuckDB oracle uses its NATIVE
  * `ASOF LEFT JOIN`, so the composition is verified against a real
  * as-of implementation, not against itself.
  */
object AdvancedOps {

  /** For each event: the most recent 'purchase' by the same user at or
    * before its timestamp (inclusive).
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    // build side rows: kind=0 so they sort before probe rows at equal ts
    val build = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(0).as("kind"),
        col("event_id"), col("ts").as("pts"))
    val probe = ev.select(col("user_id"), col("ts"), lit(1).as("kind"),
      col("event_id"), lit(null).cast(TimestampType).as("pts"))
    val w = Window.partitionBy("user_id")
      .orderBy(asc("ts"), asc("kind"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    build.unionByName(probe)
      .withColumn("last_purchase_ts", last(col("pts"), ignoreNulls = true).over(w))
      .where(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("last_purchase_ts"),
        (unix_millis(col("ts")) - unix_millis(col("last_purchase_ts"))).as("ms_since"))
      .orderBy("event_id")
  }

  private val qAsofSql =
    """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts FROM events WHERE event_type = 'purchase')
      |SELECT e.event_id, e.user_id, e.ts, p.pts AS last_purchase_ts,
      |  epoch_ms(e.ts) - epoch_ms(p.pts) AS ms_since
      |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.pts
      |ORDER BY event_id""".stripMargin

  /** Range (interval) join: each purchase joined to the same user's
    * errors in the following 30 minutes. Scale note: Spark plans the
    * equi-part (user_id) as the join key and the range as a post-join
    * filter, so this shuffles on user — bounded and parallel; a pure
    * range join with no equi-key would need banding (join on coarse
    * time buckets, filter inside).
    */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val e = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("e_id"), col("ts").as("e_ts"))
    p.join(e, Seq("user_id"))
      .where(col("e_ts") > col("p_ts") &&
        col("e_ts") <= col("p_ts") + expr("interval 30 minutes"))
      .select("user_id", "p_id", "e_id", "p_ts", "e_ts")
      .orderBy("user_id", "p_id", "e_id")
  }

  /** The same purchase→error interval join through the native
    * [[graft.plans.RangeJoin]] exec: one exchange + one sort per side,
    * then a per-key sliding-window merge whose work is
    * |L_k| + |R_k| + |matches| per key — against the SortMergeJoin
    * formulation above, which emits |P_k|·|E_k| pairs per user before
    * the range filter runs (quadratic in a hot user at 100×). Same
    * rows, same oracle.
    */
  def qRangeNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val e = ev.where(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("e_id"),
        col("ts").as("e_ts"))
    graft.plans.RangeJoin(p, e, s,
        col("user_id"), unix_micros(col("p_ts")),
        col("e_user"), unix_micros(col("e_ts")),
        loExcl = 0L, hiIncl = 30L * 60 * 1000 * 1000)
      .select("user_id", "p_id", "e_id", "p_ts", "e_ts")
      .orderBy("user_id", "p_id", "e_id")
  }

  private val qRangeJoinSql =
    """WITH p AS (SELECT user_id, event_id AS p_id, CAST(ts AS TIMESTAMP) AS p_ts
      |           FROM events WHERE event_type = 'purchase'),
      |e AS (SELECT user_id, event_id AS e_id, CAST(ts AS TIMESTAMP) AS e_ts
      |      FROM events WHERE event_type = 'error')
      |SELECT p.user_id, p_id, e_id, p_ts, e_ts
      |FROM p JOIN e ON p.user_id = e.user_id
      |  AND e_ts > p_ts AND e_ts <= p_ts + INTERVAL 30 MINUTE
      |ORDER BY p.user_id, p_id, e_id""".stripMargin

  /** Sessionization with Spark's built-in session_window (30-minute
    * gap); the oracle rebuilds sessions with the lag/running-sum
    * technique — two independent constructions that must agree.
    */
  def qSessionize(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  private val qSessionizeSql =
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |marked AS (SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |         THEN 1 ELSE 0 END AS boundary
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (SELECT user_id, ts,
      |    SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Exact interpolated percentiles per group (transcendental-free, but
    * interpolation arithmetic is rounded at 6 to absorb last-ulp
    * differences between engines).
    */
  def qPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"),
        round(expr("percentile(l_extendedprice, 0.95)"), 6).as("price_p95"))
      .orderBy("l_returnflag")

  private val qPercentilesSql =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
      |  round(quantile_cont(l_quantity, 0.75), 6) AS p75,
      |  round(quantile_cont(l_extendedprice, 0.95), 6) AS price_p95
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val Priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Pivot: order revenue per year × priority (decimal-exact sums). */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")).cast(LongType))
      .groupBy("o_year")
      .pivot("o_orderpriority", Priorities)
      .agg(sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType))
      .orderBy("o_year")

  private val qPivotSql = {
    val cells = Priorities.map(p =>
      s"""CAST(SUM(CASE WHEN o_orderpriority = '$p' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "$p"""")
      .mkString(",\n  ")
    s"""SELECT year(o_orderdate) AS o_year,
       |  $cells
       |FROM orders GROUP BY year(o_orderdate) ORDER BY o_year""".stripMargin
  }

  /** Grouped top-k through the custom physical operator
    * (graft.plans.GroupedTopK): per-group bounded heaps instead of the
    * full window sort. Oracle is the window formulation in DuckDB —
    * two entirely different algorithms that must agree row-for-row.
    */
  def qGroupedTopK(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables(s, dir, "orders")
    graft.plans.GroupedTopK(ord, s,
      Seq(col("o_custkey")), col("o_totalprice"), col("o_orderkey"), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy(asc("o_custkey"), desc("o_totalprice"), asc("o_orderkey"))
  }

  private val qGroupedTopKSql =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |  FROM orders) ranked
      |WHERE rk <= 3
      |ORDER BY o_custkey ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin

  /** The same as-of semantics through the NATIVE custom operator
    * (graft.plans.AsOfJoin: one exchange + one sort per side, single
    * forward merge, O(1) state) — verified against DuckDB's native
    * ASOF LEFT JOIN, i.e. two independent as-of implementations that
    * must agree row-for-row. The window composition above remains as
    * the built-ins-only formulation.
    */
  def qAsofNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val probe = ev.select(col("event_id"), col("user_id"), col("ts"))
    val build = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"),
        col("event_id").as("p_id"))
    graft.plans.AsOfJoin(probe, build, s,
        col("user_id"), unix_micros(col("ts")),
        col("p_user"), unix_micros(col("pts")), col("p_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("pts").as("last_purchase_ts"),
        (unix_millis(col("ts")) - unix_millis(col("pts"))).as("ms_since"))
      .orderBy("event_id")
  }

  /** Equi-depth bucketization (quartile binning) — the feature-
    * engineering discretizer: exact quartile boundaries from one
    * sort-based aggregate (a scalar row, broadcast), bucket assignment
    * as three comparisons against those boundaries (narrow, codegen'd),
    * then per-bucket stats. Exact across engines because both compute
    * the same interpolated quantile doubles (the q_percentiles
    * precedent) and comparisons against identical doubles are IEEE-
    * exact. At 100 TB the exact-percentile pass is the cost knob —
    * swap `percentile` for `approx_percentile` (t-digest) when
    * boundary tolerance allows; the rest of the plan is unchanged.
    */
  def qEquidepthBucketize(s: SparkSession, dir: String): DataFrame = {
    val b = Tables(s, dir, "events").agg(
      expr("percentile(value, 0.25)").as("b1"),
      expr("percentile(value, 0.5)").as("b2"),
      expr("percentile(value, 0.75)").as("b3"))
    val bucket = (when(col("value") > col("b1"), 1).otherwise(0) +
      when(col("value") > col("b2"), 1).otherwise(0) +
      when(col("value") > col("b3"), 1).otherwise(0)).cast(LongType)
    Tables(s, dir, "events")
      .crossJoin(broadcast(b))
      .select(bucket.as("bucket"), col("value"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("value").as("mn"), max("value").as("mx"))
      .orderBy("bucket")
  }

  private val qEquidepthSql =
    """WITH b AS (SELECT quantile_cont(value, 0.25) AS b1,
      |                  quantile_cont(value, 0.5) AS b2,
      |                  quantile_cont(value, 0.75) AS b3 FROM events)
      |SELECT CAST(CASE WHEN value > b1 THEN 1 ELSE 0 END
      |      + CASE WHEN value > b2 THEN 1 ELSE 0 END
      |      + CASE WHEN value > b3 THEN 1 ELSE 0 END AS BIGINT) AS bucket,
      |  COUNT(*) AS n, min(value) AS mn, max(value) AS mx
      |FROM events, b GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------- synthetic draw

  private val SynthPerType = 100
  private val SynthQ = 1073741824L // 2^30 uniform-draw modulus

  /** Synthetic data generation by inverse-CDF sampling of the
    * EMPIRICAL per-type value distribution — the privacy-preserving
    * "draw a lookalike dataset" op (real values never leave the
    * histogram; only (value, count) marginals are consulted). The
    * empirical CDF is the value-level cents histogram with a
    * per-type cumulative (bounded window, the ta_ks_test shape); each
    * deterministic draw k ∈ [1, n] then needs the FIRST value whose
    * cumulative count reaches k — which is exactly an as-of lookup,
    * so the resolution step runs through the native
    * [[graft.plans.AsOfJoin]] operator on negated (k, cum) axes
    * (last −cum ≤ −k ⇔ min cum ≥ k): one exchange + sort per side,
    * single forward merge, no range-join explosion. Draw indices are
    * portable-hash uniforms — re-runs regenerate the identical
    * synthetic set. Oracle: the min-over-qualifying-join formulation,
    * i.e. a second independent inverse-CDF implementation.
    */
  def qSynthSample(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash
    val hist = Tables(s, dir, "events").where(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 100d + 0.5d).cast(LongType).as("vc"))
      .groupBy("event_type", "vc").agg(count(lit(1)).as("c"))
      .withColumn("cum",
        sum("c").over(Window.partitionBy("event_type").orderBy("vc")))
    val n = hist.groupBy("event_type").agg(sum("c").as("n"))
    val probe = n
      .select(col("event_type"), col("n"),
        explode(sequence(lit(0), lit(SynthPerType - 1))).as("i"))
      .withColumn("k",
        PortableHash.hash64(concat(lit("synth:"), col("event_type"),
          lit(":"), col("i").cast(StringType))) % SynthQ % col("n") + 1)
      .select(col("event_type"), col("i").cast(LongType).as("i"), col("k"))
    val build = hist.select(col("event_type").as("b_type"),
      col("cum"), col("vc"))
    graft.plans.AsOfJoin(probe, build, s,
        graft.functions.PortableHash.hash64(col("event_type")),
        lit(0L) - col("k"),
        graft.functions.PortableHash.hash64(col("b_type")),
        lit(0L) - col("cum"), col("vc"))
      .select(col("event_type"), col("i"), col("k"),
        (col("vc").cast(DoubleType) / 100d).as("value"))
      .orderBy("event_type", "i")
  }

  private val qSynthSampleSql = {
    val h = graft.functions.PortableHash.sql(
      "'synth:' || event_type || ':' || CAST(i AS STRING)")
    s"""WITH ev AS (
       |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
       |  FROM events WHERE value IS NOT NULL),
       |hist AS (
       |  SELECT event_type, vc, COUNT(*) AS c,
       |    CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type ORDER BY vc)
       |      AS BIGINT) AS cum
       |  FROM ev GROUP BY event_type, vc),
       |n AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
       |      FROM hist GROUP BY 1),
       |probe AS (
       |  SELECT n.event_type, CAST(t.i AS BIGINT) AS i,
       |    $h % $SynthQ % n.n + 1 AS k
       |  FROM n CROSS JOIN range(0, $SynthPerType) t(i))
       |SELECT p.event_type, p.i, p.k,
       |  CAST(min(h.vc) AS DOUBLE) / 100.0 AS value
       |FROM probe p JOIN hist h
       |  ON h.event_type = p.event_type AND h.cum >= p.k
       |GROUP BY p.event_type, p.i, p.k
       |ORDER BY p.event_type, p.i""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_synth_sample" -> (qSynthSample(_, _)),
    "q_equidepth_bucketize" -> (qEquidepthBucketize(_, _)),
    "q_grouped_topk" -> (qGroupedTopK(_, _)),
    "q_asof_join" -> (qAsofJoin(_, _)),
    "q_asof_native" -> (qAsofNative(_, _)),
    "q_range_join" -> (qRangeJoin(_, _)),
    "q_range_native" -> (qRangeNative(_, _)),
    "q_sessionize" -> (qSessionize(_, _)),
    "q_percentiles" -> (qPercentiles(_, _)),
    "q_pivot" -> (qPivot(_, _)))

  def oracles: Map[String, String] = Map(
    "q_synth_sample" -> qSynthSampleSql,
    "q_equidepth_bucketize" -> qEquidepthSql,
    "q_grouped_topk" -> qGroupedTopKSql,
    "q_asof_join" -> qAsofSql,
    "q_asof_native" -> qAsofSql,
    "q_range_join" -> qRangeJoinSql,
    "q_range_native" -> qRangeJoinSql,
    "q_sessionize" -> qSessionizeSql,
    "q_percentiles" -> qPercentilesSql,
    "q_pivot" -> qPivotSql)
}
