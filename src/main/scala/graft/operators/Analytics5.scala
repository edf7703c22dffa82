package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Fifth analytics wave — relational forms not yet covered:
  *
  *  - `q_gap_fill`: date-spine densification (generate the full min→max
  *    day range, left-join daily aggregates, zero-fill gaps) — the
  *    standard time-series preparation step. The spine is generated
  *    from a 1-row bounds aggregate, so the join is a broadcast of the
  *    spine against the (already tiny) daily rollup at any scale.
  *  - `q_posexplode`: ordinal-preserving explode (position + value) —
  *    Spark's posexplode vs DuckDB's zipped unnest.
  *  - `q_lateral_topn`: a true correlated LATERAL subquery join with
  *    ORDER BY + LIMIT inside (per-nation top-2 customers), run through
  *    Spark SQL's lateral join support — the fourth formulation of
  *    grouped top-k in this engine (vs window, custom plan, and
  *    min-struct argmin), kept because LATERAL is its own parser/
  *    planner surface.
  */
object Analytics5 {

  /** Date-spine gap fill over daily event counts. */
  def qGapFill(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    val spine = daily.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy("day")
  }

  private val qGapFillSql =
    """WITH daily AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, COUNT(*) AS n_events,
      |    COUNT(DISTINCT user_id) AS n_users
      |  FROM events GROUP BY 1),
      |spine AS (
      |  SELECT unnest(generate_series((SELECT min(day) FROM daily),
      |                                (SELECT max(day) FROM daily), INTERVAL 1 DAY)) AS day)
      |SELECT CAST(spine.day AS DATE) AS day,
      |  coalesce(n_events, 0) AS n_events, coalesce(n_users, 0) AS n_users
      |FROM spine LEFT JOIN daily ON CAST(spine.day AS DATE) = daily.day
      |ORDER BY day""".stripMargin

  /** Ordinal-preserving explode: (pos, token) per document. */
  def qPosexplode(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .where(col("doc_id") < 10)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"), col("tok"))
      .orderBy("doc_id", "pos")

  private val qPosexplodeSql =
    """SELECT doc_id,
      |  unnest(range(len(string_split(text, ' ')))) AS pos,
      |  unnest(string_split(text, ' ')) AS tok
      |FROM documents WHERE doc_id < 10 ORDER BY doc_id, pos""".stripMargin

  /** Correlated LATERAL top-n: per-nation top-2 customers by balance. */
  def qLateralTopn(s: SparkSession, dir: String): DataFrame = {
    Seq("nation", "customer").foreach(n =>
      Tables(s, dir, n).createOrReplaceTempView(n))
    s.sql(
      """SELECT n_name, t.c_name, t.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)
  }

  private val qLateralSql =
    """SELECT n_name, t.c_name, t.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gap_fill" -> (qGapFill(_, _)),
    "q_posexplode" -> (qPosexplode(_, _)),
    "q_lateral_topn" -> (qLateralTopn(_, _)))

  def oracles: Map[String, String] = Map(
    "q_gap_fill" -> qGapFillSql,
    "q_posexplode" -> qPosexplodeSql,
    "q_lateral_topn" -> qLateralSql)
}
