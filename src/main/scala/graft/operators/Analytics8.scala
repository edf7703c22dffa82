package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Event-analytics shapes over the append-only log:
  *
  *  - `q_running_distinct`: cumulative distinct users per day. The
  *    naive formulation (COUNT(DISTINCT) over an expanding window) is
  *    quadratic and unshardable; the scalable rewrite is first-touch
  *    attribution: min(date) per user (one map-combining aggregate),
  *    histogram by first-seen day, running sum over the BOUNDED day
  *    table. The cumulative window sees |days| rows, never |events|.
  *  - `q_path_transitions`: Markov transition counts/probabilities
  *    between consecutive event types per user (lag window partitioned
  *    by user — state is one row, partitions by the natural key), then
  *    a |types²|-row aggregate. The behavioral-analytics staple.
  *  - `q_anomaly_zscore`: per-type daily-count anomaly score against
  *    the trailing 7 days. Mean/variance come from window SUM and
  *    SUM-of-squares of INTEGER counts — exact BIGINTs, then one fixed
  *    IEEE expression chain — not from streaming stddev aggregates
  *    whose accumulation order differs between engines. Full-window
  *    rows only (7 trailing days present), z rounded at 1e-6.
  */
object Analytics8 {

  def qRunningDistinct(s: SparkSession, dir: String): DataFrame = {
    val first = Tables(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id").agg(min("day").as("d0"))
    val hist = first.groupBy("d0").agg(count(lit(1)).as("new_users"))
    // the cumulative window runs over the |days| table (bounded by the
    // calendar), not the event log
    val w = Window.orderBy("d0").rowsBetween(Window.unboundedPreceding, 0)
    hist.withColumn("cum_users", sum("new_users").over(w))
      .orderBy("d0")
  }

  private val qRunningDistinctSql =
    """WITH f AS (
      |  SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0
      |  FROM events GROUP BY user_id),
      |h AS (SELECT d0, COUNT(*) AS new_users FROM f GROUP BY d0)
      |SELECT d0, new_users,
      |  CAST(SUM(new_users) OVER (ORDER BY d0 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      |FROM h ORDER BY d0""".stripMargin

  def qPathTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val steps = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag("event_type", 1).over(w))
      .where(col("prev").isNotNull)
    val counts = steps.groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("prev").agg(sum("n").as("t"))
    counts.join(broadcast(totals), "prev")
      .select(col("prev"), col("next"), col("n"),
        (col("n").cast(DoubleType) / col("t")).as("p"))
      .orderBy("prev", "next")
  }

  private val qPathTransitionsSql =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
      |  FROM events),
      |c AS (SELECT prev, event_type AS next, COUNT(*) AS n
      |      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS t FROM c GROUP BY prev)
      |SELECT c.prev, c.next, c.n, CAST(c.n AS DOUBLE) / t.t AS p
      |FROM c JOIN t ON c.prev = t.prev ORDER BY c.prev, c.next""".stripMargin

  private val Trail = 7

  def qAnomalyZscore(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-Trail, -1)
    // materialize the window sums BEFORE filtering — a window expression
    // referenced after the filter would see only surviving rows
    val mean = col("s1").cast(DoubleType) / Trail
    val variance = (col("s2").cast(DoubleType) -
      col("s1").cast(DoubleType) * col("s1") / Trail) / (Trail - 1)
    daily
      .withColumn("s1", sum("c").over(w))
      .withColumn("s2", sum(col("c") * col("c")).over(w))
      .withColumn("nw", count(lit(1)).over(w))
      .where(col("nw") === Trail)
      .select(col("event_type"), col("day"), col("c"),
        round(mean, 6).as("trail_mean"),
        round((col("c").cast(DoubleType) - mean) / sqrt(variance), 6).as("z"))
      .orderBy("event_type", "day")
  }

  private val qAnomalyZscoreSql =
    s"""WITH d AS (
       |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
       |    COUNT(*) AS c
       |  FROM events GROUP BY 1, 2),
       |w AS (
       |  SELECT event_type, day, c,
       |    CAST(SUM(c) OVER t AS BIGINT) AS s1,
       |    CAST(SUM(c * c) OVER t AS BIGINT) AS s2,
       |    COUNT(*) OVER t AS nw
       |  FROM d WINDOW t AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN $Trail PRECEDING AND 1 PRECEDING))
       |SELECT event_type, day, c,
       |  round(CAST(s1 AS DOUBLE) / $Trail, 6) AS trail_mean,
       |  round((CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / $Trail)
       |    / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / $Trail) / ${Trail - 1}), 6) AS z
       |FROM w WHERE nw = $Trail ORDER BY event_type, day""".stripMargin

  /** Geometric-mean price per return flag through the custom
    * DeclarativeAggregate (`graft_geomean` — pure-expression buffer,
    * codegen'd + map-side-combined like a built-in). The quantized
    * ln-sum makes the result order-independent; the oracle spells the
    * same quantized recurrence in SQL.
    */
  def qGeomean(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .where(col("l_extendedprice") > 0)
      .groupBy("l_returnflag")
      .agg(round(expr("graft_geomean(l_extendedprice)"), 6).as("geomean_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  private val qGeomeanSql =
    """SELECT l_returnflag,
      |  round(exp(CAST(SUM(CAST(floor(ln(l_extendedprice) * 67108864.0) AS BIGINT)) AS DOUBLE)
      |    / 67108864.0 / COUNT(*)), 6) AS geomean_price,
      |  COUNT(*) AS n
      |FROM lineitem WHERE l_extendedprice > 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Empty-relation aggregate semantics — the parity corner engines
    * disagree on most often: a GLOBAL aggregate over zero rows yields
    * exactly one row with COUNT 0 and NULL for sum/min/max/avg, while
    * a GROUPED aggregate yields zero rows (pinned by n_groups below
    * via a scalar-subquery count). The predicate is impossible but not
    * constant-foldable to false, so the aggregate genuinely runs.
    */
  def qEmptyAgg(s: SparkSession, dir: String): DataFrame = {
    val none = Tables(s, dir, "lineitem").where(col("l_quantity") < 0)
    val groups = none.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_groups"))
    none.agg(
      count(lit(1)).as("n"),
      sum(col("l_quantity").cast(DecimalType(12, 2))).cast(DoubleType).as("s"),
      min("l_quantity").as("mn"), max("l_quantity").as("mx"),
      (sum(col("l_quantity").cast(DecimalType(12, 2))).cast(DoubleType) /
        count(col("l_quantity"))).as("av"))
      .crossJoin(groups)
  }

  private val qEmptyAggSql =
    """SELECT g.*, e.n_groups FROM (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s,
      |    min(l_quantity) AS mn, max(l_quantity) AS mx,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS av
      |  FROM lineitem WHERE l_quantity < 0) g
      |CROSS JOIN (
      |  SELECT COUNT(*) AS n_groups FROM (
      |    SELECT l_returnflag FROM lineitem WHERE l_quantity < 0
      |    GROUP BY l_returnflag)) e""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_running_distinct" -> (qRunningDistinct(_, _)),
    "q_path_transitions" -> (qPathTransitions(_, _)),
    "q_anomaly_zscore" -> (qAnomalyZscore(_, _)),
    "q_geomean" -> (qGeomean(_, _)),
    "q_empty_agg" -> (qEmptyAgg(_, _)))

  def oracles: Map[String, String] = Map(
    "q_running_distinct" -> qRunningDistinctSql,
    "q_path_transitions" -> qPathTransitionsSql,
    "q_anomaly_zscore" -> qAnomalyZscoreSql,
    "q_geomean" -> qGeomeanSql,
    "q_empty_agg" -> qEmptyAggSql)
}
