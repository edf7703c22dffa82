package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Product-analytics shapes over the event stream:
  *
  *  - `q_funnel`: ordered multi-stage conversion (view → click within
  *    6 h → purchase within 12 h), each stage anchored on the previous
  *    stage's FIRST qualifying event. Three per-user aggregates chained
  *    by join — every stage shrinks the key set, so the expensive scan
  *    happens once per stage over an already-filtered event type.
  *  - `q_cohort`: weekly retention triangle — users bucketed by
  *    first-activity week, counted per week offset they remain active.
  *    Two aggregates over one scan + a broadcast-sized first-activity
  *    join.
  */
object Analytics6 {

  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").select("user_id", "event_type", "ts")
    val views = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val clicks = ev.where(col("event_type") === "click").as("e")
      .join(views, "user_id")
      .where(col("ts") > col("t_view") &&
        col("ts") <= col("t_view") + expr("INTERVAL 6 HOURS"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val purchases = ev.where(col("event_type") === "purchase").as("e")
      .join(clicks, "user_id")
      .where(col("ts") > col("t_click") &&
        col("ts") <= col("t_click") + expr("INTERVAL 12 HOURS"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    views.agg(count(lit(1)).as("n_view"))
      .crossJoin(clicks.agg(count(lit(1)).as("n_click")))
      .crossJoin(purchases.agg(count(lit(1)).as("n_purchase")))
  }

  private val qFunnelSql =
    """WITH v AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_view
      |           FROM events WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_click
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
      |        AND CAST(e.ts AS TIMESTAMP) <= v.t_view + INTERVAL 6 HOUR
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_purchase
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
      |        AND CAST(e.ts AS TIMESTAMP) <= c.t_click + INTERVAL 12 HOUR
      |      GROUP BY e.user_id)
      |SELECT (SELECT COUNT(*) FROM v) AS n_view,
      |       (SELECT COUNT(*) FROM c) AS n_click,
      |       (SELECT COUNT(*) FROM p) AS n_purchase""".stripMargin

  def qCohort(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").select("user_id", "ts")
    val first = ev.groupBy("user_id")
      .agg(date_trunc("week", min("ts")).as("cohort"))
    ev.join(broadcast(first), "user_id")
      .select(col("user_id"), col("cohort"),
        (datediff(date_trunc("week", col("ts")), col("cohort")) / 7)
          .cast(LongType).as("wk"))
      .distinct()
      .groupBy(col("cohort").cast(DateType).as("cohort_week"), col("wk"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_week", "wk")
  }

  private val qCohortSql =
    """WITH f AS (SELECT user_id, date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS cohort
      |           FROM events GROUP BY user_id),
      |a AS (SELECT DISTINCT e.user_id, f.cohort,
      |        divide(epoch_ms(date_trunc('week', CAST(e.ts AS TIMESTAMP)))
      |          - epoch_ms(f.cohort), 604800000) AS wk
      |      FROM events e JOIN f ON e.user_id = f.user_id)
      |SELECT CAST(cohort AS DATE) AS cohort_week, CAST(wk AS BIGINT) AS wk, COUNT(*) AS n_active
      |FROM a GROUP BY 1, 2 ORDER BY cohort_week, wk""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> (qFunnel(_, _)),
    "q_cohort" -> (qCohort(_, _)))

  def oracles: Map[String, String] = Map(
    "q_funnel" -> qFunnelSql,
    "q_cohort" -> qCohortSql)
}
