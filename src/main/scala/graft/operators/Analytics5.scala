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
    """WITH mx AS (
      |  SELECT CAST(max(len(string_split(text, ' '))) AS BIGINT) AS m
      |  FROM documents WHERE doc_id < 10),
      |dims AS (SELECT unnest(generate_series(1, m)) AS i FROM mx)
      |SELECT doc_id, i - 1 AS pos,
      |  list_extract(string_split(text, ' '), CAST(i AS INTEGER)) AS tok
      |FROM documents CROSS JOIN dims
      |WHERE doc_id < 10 AND i <= len(string_split(text, ' '))
      |ORDER BY doc_id, pos""".stripMargin

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

  /** Snapshot diff (CDC classify): full-outer-join two day snapshots of
    * the events table on the key, classify each row added / removed /
    * changed, return the non-identical rows. The join shuffles on the
    * key both sides — at 100 TB both snapshots bucket by the key and
    * the diff is co-located (see ScaleSpec's bucketed-join proof).
    */
  def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val old = ev.where(col("event_id") % 10 < 8)
      .select(col("event_id").as("o_id"), col("value").as("value_old"))
    val neu = ev.where(col("event_id") % 10 >= 1)
      .select(col("event_id").as("n_id"),
        when(col("event_id") % 7 === 0, col("value") + 1.5)
          .otherwise(col("value")).as("value_new"))
    old.join(neu, col("o_id") === col("n_id"), "full_outer")
      .withColumn("change",
        when(col("o_id").isNull, "added")
          .when(col("n_id").isNull, "removed")
          .when(col("value_old") =!= col("value_new"), "changed"))
      .where(col("change").isNotNull)
      .select(coalesce(col("o_id"), col("n_id")).as("event_id"),
        col("change"), col("value_old"), col("value_new"))
      .orderBy("event_id")
  }

  private val qSnapshotDiffSql =
    """WITH old AS (SELECT event_id AS o_id, value AS value_old FROM events WHERE event_id % 10 < 8),
      |neu AS (SELECT event_id AS n_id,
      |          CASE WHEN event_id % 7 = 0 THEN value + 1.5 ELSE value END AS value_new
      |        FROM events WHERE event_id % 10 >= 1),
      |d AS (
      |  SELECT coalesce(o_id, n_id) AS event_id,
      |    CASE WHEN o_id IS NULL THEN 'added'
      |         WHEN n_id IS NULL THEN 'removed'
      |         WHEN value_old <> value_new THEN 'changed' END AS change,
      |    value_old, value_new
      |  FROM old FULL OUTER JOIN neu ON o_id = n_id)
      |SELECT event_id, change, value_old, value_new
      |FROM d WHERE change IS NOT NULL ORDER BY event_id""".stripMargin

  /** URL parsing family: Spark's parse_url (PROTOCOL/HOST/PATH/QUERY +
    * keyed query param) over synthesized order URLs; DuckDB mirrors
    * with anchored regexp_extract groups. The host/domain extract is
    * the first step of URL-level dedup in a crawl pipeline.
    */
  def qUrlFuncs(s: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("https://api.example.com/v2/orders/"), col("o_orderkey"),
      lit("?priority="), regexp_replace(col("o_orderpriority"), " ", "%20"),
      lit("&status="), col("o_orderstatus"))
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), url.as("url"))
      .select(col("o_orderkey"),
        parse_url(col("url"), lit("PROTOCOL")).as("protocol"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("status")).as("status_param"))
      .orderBy("o_orderkey")
  }

  private val qUrlFuncsSql =
    """WITH u AS (SELECT o_orderkey,
      |  'https://api.example.com/v2/orders/' || o_orderkey
      |    || '?priority=' || replace(o_orderpriority, ' ', '%20')
      |    || '&status=' || o_orderstatus AS url
      |  FROM orders)
      |SELECT o_orderkey,
      |  regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
      |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
      |  regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
      |  regexp_extract(url, '[?]([^#]*)', 1) AS query,
      |  regexp_extract(url, '[?&]status=([^&#]*)', 1) AS status_param
      |FROM u ORDER BY o_orderkey""".stripMargin

  /** SCD2 build from a change log: compress consecutive same-value rows
    * per key, then each surviving change opens an interval closed by
    * the next one (lead) — the dimension-table maintenance pattern.
    * Two windows over the same (key, time) partitioning → one shuffle.
    */
  def qScd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val changes = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .where(col("prev_type").isNull || col("event_type") =!= col("prev_type"))
    changes
      .select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
        lead("ts", 1).over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
          .as("valid_to"))
      .orderBy("user_id", "valid_from")
  }

  private val qScd2Sql =
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      |changes AS (
      |  SELECT * FROM (
      |    SELECT user_id, event_id, ts, event_type,
      |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |    FROM e)
      |  WHERE prev_type IS NULL OR event_type <> prev_type)
      |SELECT user_id, event_type, ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |FROM changes ORDER BY user_id, valid_from""".stripMargin

  /** Keep-latest dedup (CDC compaction): one surviving row per key, the
    * one with the greatest (ts, id). The argmax-by-struct form plans as
    * a single aggregate — no window sort over the full table.
    */
  def qDedupKeepLatest(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("last"))
      .select(col("user_id"), col("last.ts").as("last_ts"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_type"))
      .orderBy("user_id")

  private val qDedupKeepLatestSql =
    """SELECT user_id, ts AS last_ts, event_id AS last_event_id, event_type AS last_type FROM (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
      |  FROM events) WHERE rk = 1 ORDER BY user_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scd2" -> (qScd2(_, _)),
    "q_dedup_keep_latest" -> (qDedupKeepLatest(_, _)),
    "q_url_funcs" -> (qUrlFuncs(_, _)),
    "q_gap_fill" -> (qGapFill(_, _)),
    "q_posexplode" -> (qPosexplode(_, _)),
    "q_lateral_topn" -> (qLateralTopn(_, _)),
    "q_snapshot_diff" -> (qSnapshotDiff(_, _)))

  def oracles: Map[String, String] = Map(
    "q_scd2" -> qScd2Sql,
    "q_dedup_keep_latest" -> qDedupKeepLatestSql,
    "q_url_funcs" -> qUrlFuncsSql,
    "q_gap_fill" -> qGapFillSql,
    "q_posexplode" -> qPosexplodeSql,
    "q_lateral_topn" -> qLateralSql,
    "q_snapshot_diff" -> qSnapshotDiffSql)
}
