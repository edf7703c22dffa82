package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Data-governance operators — the constraint-audit and
  * deletion-propagation passes a production lakehouse runs beside its
  * analytics (the Deequ / right-to-be-forgotten shapes). Reference
  * scope: the reference engine has none of these; they extend the
  * pipeline-operations surface the way `q_compaction_plan` does.
  *
  * Scale: every check is a whole-table aggregate or an anti-join on
  * the table's natural key — map-side-combinable, no windows, no
  * collects — and the report rows are constant-sized. The checks run
  * as independent jobs over independently-scannable tables, so a
  * 100 TB audit shards by table and by check.
  */
object GovernanceOps {

  // --------------------------------------------------------- dq checks

  /** Deequ-style data-quality constraint report: one row per declared
    * check with row/violation counts and a pass verdict. Checks are
    * the four production staples — referential integrity (orphan
    * foreign keys, via anti-join counts), key uniqueness (count vs
    * count-distinct), range/domain conformance, and null-rate — each
    * an integer aggregate, so the report is engine-exact with no
    * floats anywhere.
    */
  def qDqChecks(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val ord = Tables(s, dir, "orders")
    val cust = Tables(s, dir, "customer")
    val ev = Tables(s, dir, "events")

    // Every SCALAR check on a table folds into that table's single
    // aggregation pass (one 100 TB scan buys the whole per-table
    // checklist); only referential checks pay a join, and they probe
    // with the key column alone so the scan prunes to one column.
    val liStats = li.agg(count(lit(1)).as("n_rows"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
        .otherwise(0L)).as("qty_v"))
    val ordStats = ord.agg(count(lit(1)).as("n_rows"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_v"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("price_v"))
    val evStats = ev.agg(count(lit(1)).as("n_rows"),
      sum(when(col("props").isNull, 1L).otherwise(0L)).as("null_v"))
    val liOrphans = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("fk_v"))
    val ordOrphans = ord.select(col("o_custkey"))
      .join(cust.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("fk_v"))

    // one row per check, fanned out of the SINGLE stats row by an
    // in-row explode — a union of per-check selects would re-execute
    // the table-scanning aggregate once per check
    def rows(stats: DataFrame, table: String, checks: (String, Column)*): DataFrame =
      stats.select(explode(array(checks.map { case (name, v) =>
        struct(lit(table).as("table_name"), lit(name).as("check_name"),
          col("n_rows"), v.as("n_violations"), (v === 0L).as("pass"))
      }: _*)).as("r")).select(col("r.*"))

    rows(liStats.crossJoin(liOrphans), "lineitem",
        "fk_orderkey_exists" -> col("fk_v"),
        "quantity_in_1_50" -> col("qty_v"))
      .union(rows(ordStats.crossJoin(ordOrphans), "orders",
        "fk_custkey_exists" -> col("fk_v"),
        "pk_orderkey_unique" -> col("dup_v"),
        "totalprice_positive" -> col("price_v")))
      .union(rows(evStats, "events", "props_not_null" -> col("null_v")))
      .orderBy("table_name", "check_name")
  }

  private val qDqChecksSql =
    """SELECT table_name, check_name, n_rows, n_violations,
      |  n_violations = 0 AS pass
      |FROM (
      |  SELECT 'lineitem' AS table_name, 'fk_orderkey_exists' AS check_name,
      |    (SELECT COUNT(*) FROM lineitem) AS n_rows,
      |    (SELECT COUNT(*) FROM lineitem l
      |      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
      |  UNION ALL
      |  SELECT 'orders', 'fk_custkey_exists',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT COUNT(*) FROM orders r
      |      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = r.o_custkey))
      |  UNION ALL
      |  SELECT 'orders', 'pk_orderkey_unique',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
      |  UNION ALL
      |  SELECT 'lineitem', 'quantity_in_1_50',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem)
      |  UNION ALL
      |  SELECT 'orders', 'totalprice_positive',
      |    (SELECT COUNT(*) FROM orders),
      |    (SELECT CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders)
      |  UNION ALL
      |  SELECT 'events', 'props_not_null',
      |    (SELECT COUNT(*) FROM events),
      |    (SELECT CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events))
      |ORDER BY table_name, check_name""".stripMargin

  // ---------------------------------------------------- forget user

  private val ForgetMod = 97L

  /** Right-to-be-forgotten propagation report: given a deletion
    * cohort (here the deterministic stand-in `key % 97 = 0`), count
    * per table what a purge job would delete vs keep. The real purge
    * is the same anti-join shape writing the kept rows back — this
    * report IS its dry run, one aggregate per table, no joins at all
    * since membership is a key predicate (with an uploaded deletion
    * list it becomes a broadcast semi/anti join on the same key).
    */
  def qForgetUser(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .agg(sum(when(col("user_id") % ForgetMod === 0, 1L).otherwise(0L)).as("n_purged"),
        sum(when(col("user_id") % ForgetMod === 0, 0L).otherwise(1L)).as("n_kept"))
      .select(lit("events").as("table_name"), col("n_purged"), col("n_kept"))
    val ord = Tables(s, dir, "orders")
      .agg(sum(when(col("o_custkey") % ForgetMod === 0, 1L).otherwise(0L)).as("n_purged"),
        sum(when(col("o_custkey") % ForgetMod === 0, 0L).otherwise(1L)).as("n_kept"))
      .select(lit("orders").as("table_name"), col("n_purged"), col("n_kept"))
    val cust = Tables(s, dir, "customer")
      .agg(sum(when(col("c_custkey") % ForgetMod === 0, 1L).otherwise(0L)).as("n_purged"),
        sum(when(col("c_custkey") % ForgetMod === 0, 0L).otherwise(1L)).as("n_kept"))
      .select(lit("customer").as("table_name"), col("n_purged"), col("n_kept"))
    ev.union(ord).union(cust).orderBy("table_name")
  }

  private val qForgetUserSql =
    s"""SELECT * FROM (
       |  SELECT 'events' AS table_name,
       |    CAST(SUM(CASE WHEN user_id % $ForgetMod = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
       |    CAST(SUM(CASE WHEN user_id % $ForgetMod = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
       |  FROM events
       |  UNION ALL
       |  SELECT 'orders',
       |    CAST(SUM(CASE WHEN o_custkey % $ForgetMod = 0 THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN o_custkey % $ForgetMod = 0 THEN 0 ELSE 1 END) AS BIGINT)
       |  FROM orders
       |  UNION ALL
       |  SELECT 'customer',
       |    CAST(SUM(CASE WHEN c_custkey % $ForgetMod = 0 THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN c_custkey % $ForgetMod = 0 THEN 0 ELSE 1 END) AS BIGINT)
       |  FROM customer)
       |ORDER BY table_name""".stripMargin

  // ----------------------------------------------------- q_data_card

  /** Per-source dataset card — the release documentation a training
    * corpus ships with, computed from the corpus itself: document and
    * character volume, language spread and its entropy, and the
    * exact-duplicate rate (md5 content hash). ONE scan feeding two
    * map-side-combinable aggregates (per-source rollup + per-source
    * lang/dup sub-aggregates re-aggregated); every number is integer
    * or a single exact division except the entropy, whose per-lang
    * terms are 1e-6-rounded and integer-summed (order-independent).
    */
  def qDataCard(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("source"), col("lang"), col("n_chars"), md5(col("text")).as("h"))
    val langEnt = d.groupBy("source", "lang").agg(count(lit(1)).as("nl"))
      .withColumn("nsrc", sum("nl").over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")))
      .select(col("source"), col("lang"),
        floor(round(-(col("nl").cast(DoubleType) / col("nsrc").cast(DoubleType)) *
          log2(col("nl").cast(DoubleType) / col("nsrc").cast(DoubleType)), 6)
          * 1000000L + 0.5).cast(LongType).as("eq"))
      .groupBy("source").agg(count(lit(1)).as("n_langs"),
        round(sum("eq").cast(DoubleType) / 1000000L, 6).as("lang_entropy"))
    val dups = d.groupBy("source", "h").agg(count(lit(1)).as("nh"))
      .groupBy("source").agg(count(lit(1)).as("n_distinct"))
    d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars_total"))
      .join(langEnt, "source").join(dups, "source")
      .select(col("source"), col("n_docs"), col("n_chars_total"),
        col("n_langs"), col("lang_entropy"),
        (col("n_docs") - col("n_distinct")).as("n_dup_docs"),
        ((col("n_docs") - col("n_distinct")).cast(DoubleType) /
          col("n_docs").cast(DoubleType)).as("dup_rate"))
      .orderBy("source")
  }

  private val qDataCardSql =
    """WITH d AS (
      |  SELECT source, lang, n_chars, md5(text) AS h FROM documents),
      |le AS (
      |  SELECT source, lang, COUNT(*) AS nl FROM d GROUP BY source, lang),
      |lt AS (
      |  SELECT source, lang, nl, SUM(nl) OVER (PARTITION BY source) AS nsrc FROM le),
      |ent AS (
      |  SELECT source, COUNT(*) AS n_langs,
      |    round(CAST(SUM(CAST(floor(round(
      |      -(CAST(nl AS DOUBLE) / CAST(nsrc AS DOUBLE))
      |        * log2(CAST(nl AS DOUBLE) / CAST(nsrc AS DOUBLE)), 6)
      |      * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000, 6) AS lang_entropy
      |  FROM lt GROUP BY source),
      |dd AS (
      |  SELECT source, COUNT(*) AS n_distinct FROM (
      |    SELECT source, h FROM d GROUP BY source, h)
      |  GROUP BY source),
      |base AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |         CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
      |  FROM d GROUP BY source)
      |SELECT b.source, b.n_docs, b.n_chars_total,
      |  e.n_langs, e.lang_entropy,
      |  b.n_docs - dd.n_distinct AS n_dup_docs,
      |  CAST(b.n_docs - dd.n_distinct AS DOUBLE) / CAST(b.n_docs AS DOUBLE) AS dup_rate
      |FROM base b JOIN ent e ON e.source = b.source
      |JOIN dd ON dd.source = b.source
      |ORDER BY b.source""".stripMargin

  // ------------------------------------------------------- l-diversity

  private val LThreshold = 3L

  /** l-diversity audit (Machanavajjhala et al., ICDE'06) — the release
    * gate run after `q_k_anonymity`: a quasi-identifier group is safe
    * to publish only if its sensitive attribute takes ≥ l distinct
    * values (k-anonymity alone leaks when a group is homogeneous).
    * Quasi-identifiers here are (nation, market segment); the
    * sensitive attribute is the account-balance band. One groupBy with
    * a distinct-count — map-side combinable on (QI, band) first, so
    * the pass scales as the number of distinct pairs, not rows.
    */
  def qLDiversity(s: SparkSession, dir: String): DataFrame = {
    val band = floor(col("c_acctbal") / 1000d).cast(LongType)
    Tables(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"), band.as("band"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col("band")).as("l_distinct"))
      .withColumn("meets_l", col("l_distinct") >= LThreshold)
      .orderBy("c_nationkey", "c_mktsegment")
  }

  private val qLDiversitySql =
    s"""SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size,
       |  COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l_distinct,
       |  COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= $LThreshold AS meets_l
       |FROM customer GROUP BY c_nationkey, c_mktsegment
       |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_checks" -> (qDqChecks(_, _)),
    "q_forget_user" -> (qForgetUser(_, _)),
    "q_data_card" -> (qDataCard(_, _)),
    "q_l_diversity" -> (qLDiversity(_, _)))

  def oracles: Map[String, String] = Map(
    "q_dq_checks" -> qDqChecksSql,
    "q_forget_user" -> qForgetUserSql,
    "q_data_card" -> qDataCardSql,
    "q_l_diversity" -> qLDiversitySql)
}
