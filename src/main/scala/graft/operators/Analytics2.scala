package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Second analytics wave: the TPC-H query shapes round 1 did not cover
  * (EXISTS/IN/NOT-IN subqueries, conditional aggregation, disjunctive
  * pushdown predicates, HAVING-subquery top-k, scalar-subquery
  * thresholds) plus the relational forms missing from the round-1
  * surface (full outer join, cross join, union-distinct, literal dim
  * lookup, RANGE window frames, first/last value, regexp family,
  * map/struct functions).
  *
  * Oracle-exactness follows NOTES.md: decimal-exact double sums, total
  * ORDER BY with value tiebreaks, NULLS FIRST pinned when sorting
  * nullable keys, counts cast to BIGINT on the DuckDB side (SUM(int) is
  * HUGEINT there).
  *
  * Scale notes are per query; the common theme is that every shape here
  * rewrites to broadcast/shuffle joins + partial aggregation that
  * Catalyst already plans well — the value is proving the semantics
  * match an independent engine exactly.
  */
object Analytics2 {

  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  private def dec42(c: Column): Column = c.cast(DecimalType(4, 2))
  private def dsum(c: Column): Column = sum(c).cast(DoubleType)

  // ---------------------------------------------------------------------
  // TPC-H shapes
  // ---------------------------------------------------------------------

  /** Q4 shape: correlated EXISTS with a non-equi conjunct. Catalyst
    * rewrites to a left-semi join on (orderkey, shipdate>orderdate); the
    * orders side keeps its pushed date filter. At 100 TB both sides
    * shuffle on orderkey once — no driver-side work.
    */
  def q4PriorityExists(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
    val li = Tables(s, dir, "lineitem")
    ord.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q6 shape: the canonical pushdown showcase — every predicate reaches
    * the parquet scan (PushedFilters), then a single global agg. At
    * 100 TB this reads only the 4 referenced columns and skips row
    * groups via min/max stats.
    */
  def q6SelectiveAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(dsum(dec2(col("l_extendedprice")) * dec42(col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))

  private val q6Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Q7 shape: bi-nation volume through two independent dimension
    * chains (supplier→nation, orders→customer→nation). The nation dim
    * is broadcast twice under different aliases; only the
    * lineitem↔orders join shuffles.
    */
  def q7BiNationVolume(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val ord = Tables(s, dir, "orders")
    val sup = Tables(s, dir, "supplier")
    val cust = Tables(s, dir, "customer")
    val n1 = broadcast(Tables(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables(s, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter(col("s_nationkey") < col("c_nationkey"))
      .withColumn("l_year", year(col("l_shipdate")).cast(LongType))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(dsum(dec2(col("l_extendedprice")) *
        (lit(1) - dec42(col("l_discount"))).cast(DecimalType(4, 2))).as("volume"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS volume
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE s_nationkey < c_nationkey
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q12 shape: conditional aggregation (pivot-style CASE counts) after
    * a fact-fact join with a non-equi filter.
    */
  def q12PriorityConditional(s: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables(s, dir, "orders")
      .join(Tables(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
      .groupBy("l_linestatus")
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  private val q12Sql =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Q14 shape: promo revenue ratio — two decimal-exact sums, one
    * identical double division on both engines.
    */
  def q14PromoRatio(s: SparkSession, dir: String): DataFrame = {
    val discPrice = dec2(col("l_extendedprice")) *
      (lit(1) - dec42(col("l_discount"))).cast(DecimalType(4, 2))
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * dsum(when(col("p_type") === "PROMO", discPrice)
          .otherwise(lit(0).cast(DecimalType(17, 4)))) / dsum(discPrice)).as("promo_revenue_pct"),
        count(lit(1)).as("n_items"))
  }

  private val q14Sql =
    """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
      |    ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS promo_revenue_pct,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  /** Q18 shape: HAVING subquery (orders whose total quantity exceeds a
    * threshold) semi-joined back to the fact. The inner aggregate and
    * the semi join share the orderkey shuffle; AQE reuses the exchange.
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    // one pass over lineitem computes BOTH the HAVING filter and the
    // final per-order quantity (the oracle's re-aggregation over the
    // IN-filtered join is identical because c_name/o_totalprice are
    // functionally dependent on o_orderkey) — the fact is scanned once,
    // the wide joins run only on the qualifying orders
    val bigOrders = li.groupBy("l_orderkey")
      .agg(sum(dec2(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 150)
      .select(col("l_orderkey"), col("qty").cast(DoubleType).as("total_qty"))
    bigOrders
      .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_totalprice"), col("total_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(20)
  }

  private val q18Sql =
    """SELECT c_name, o_orderkey, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey
      |                     HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
      |GROUP BY c_name, o_orderkey, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin

  /** Q19 shape: disjunction of conjunctive brand/size/quantity bands.
    * Catalyst extracts the common join key and pushes the OR-of-ANDs
    * into both scans (parquet row-group skipping on p_brand/p_size).
    */
  def q19DisjunctivePred(s: SparkSession, dir: String): DataFrame = {
    val band1 = col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1, 11)
    val band2 = col("p_brand") === "Brand#11" && col("p_size").between(1, 25) &&
      col("l_quantity").between(10, 20)
    val band3 = col("p_brand") === "Brand#22" && col("p_size").between(1, 35) &&
      col("l_quantity").between(20, 30)
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(band1 || band2 || band3)
      .agg(dsum(dec2(col("l_extendedprice")) *
        (lit(1) - dec42(col("l_discount"))).cast(DecimalType(4, 2))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val q19Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** Q22 shape: scalar-subquery threshold (global average account
    * balance, computed decimal-exact) + EXISTS, grouped by nation. The
    * scalar is a broadcast nested-loop of a 1-row side — free.
    */
  def q22HighBalance(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg((dsum(dec2(col("c_acctbal"))) / count(lit(1))).as("avg_bal"))
    cust.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), dsum(dec2(col("c_acctbal"))).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  private val q22Sql =
    """SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      |                   FROM customer WHERE c_acctbal > 0.0)
      |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // Subquery forms through the SQL frontend
  // ---------------------------------------------------------------------

  /** Uncorrelated IN subquery (rewritten by Catalyst to a semi join). */
  def qInSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "part").createOrReplaceTempView("part")
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.0)
        |ORDER BY p_partkey""".stripMargin)
  }

  private val qInSubquerySql =
    """SELECT p_partkey, p_name FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.0)
      |ORDER BY p_partkey""".stripMargin

  /** NOT IN over a provably non-null key list (null-aware anti join —
    * Catalyst plans BroadcastNestedLoopJoin unless it can prove
    * non-null; the WHERE keeps the build side non-null so the rewrite
    * is a plain anti join).
    */
  def qNotInSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "supplier").createOrReplaceTempView("supplier")
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49.0)
        |ORDER BY s_suppkey""".stripMargin)
  }

  private val qNotInSubquerySql =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49.0)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------------
  // Join forms
  // ---------------------------------------------------------------------

  /** Full outer join of two aggregates (supplier vs customer counts per
    * nation). Both sides pre-aggregate before the join — the join input
    * is 25 rows regardless of fact size.
    */
  def qFullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables(s, dir, "supplier").groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    val cust = Tables(s, dir, "customer").groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    sup.join(cust, col("s_nationkey") === col("c_nationkey"), "full_outer")
      .select(coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
        col("n_suppliers"), col("n_customers"))
      .orderBy("nationkey")
  }

  private val qFullOuterSql =
    """SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey, n_suppliers, n_customers
      |FROM (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
      |FULL OUTER JOIN (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) c
      |ON s_nationkey = c_nationkey
      |ORDER BY nationkey""".stripMargin

  /** Cartesian product of the two smallest dims (25×5 rows) — the only
    * place a cross join is ever acceptable at scale is dim×dim.
    */
  def qCrossJoin(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "nation")
      .crossJoin(Tables(s, dir, "region"))
      .select(col("n_name"), col("r_name"),
        (col("n_nationkey") + col("r_regionkey")).cast(LongType).as("keysum"))
      .orderBy("n_name", "r_name")

  private val qCrossSql =
    """SELECT n_name, r_name, CAST(n_nationkey + r_regionkey AS BIGINT) AS keysum
      |FROM nation CROSS JOIN region ORDER BY n_name, r_name""".stripMargin

  /** Literal dimension lookup: a broadcast join against a VALUES-style
    * inline table (the Spark side builds it from a local Seq — the
    * canonical enrich-from-config pattern).
    */
  def qValuesLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weights = Seq(("1-URGENT", 5), ("2-HIGH", 4), ("3-MEDIUM", 3),
      ("4-NOT SPECIFIED", 2), ("5-LOW", 1)).toDF("pri", "weight")
    Tables(s, dir, "orders")
      .join(broadcast(weights), col("o_orderpriority") === col("pri"))
      .groupBy("weight")
      .agg(count(lit(1)).as("n_orders"),
        dsum(dec2(col("o_totalprice"))).as("total"))
      .orderBy("weight")
  }

  private val qValuesLookupSql =
    """SELECT weight, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders JOIN (VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
      |  ('4-NOT SPECIFIED', 2), ('5-LOW', 1)) AS w(pri, weight)
      |ON o_orderpriority = pri
      |GROUP BY weight ORDER BY weight""".stripMargin

  // ---------------------------------------------------------------------
  // Aggregation / set forms
  // ---------------------------------------------------------------------

  /** HAVING: post-aggregation filter (Catalyst folds it into the agg). */
  def qHaving(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum(dec2(col("o_totalprice"))).as("spend"))
      .filter(col("n_orders") >= 5)
      .orderBy("o_custkey")

  private val qHavingSql =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
      |ORDER BY o_custkey""".stripMargin

  /** UNION with set (distinct) semantics — vs the bag union in
    * hfp_union. Rewrites to union + hash-distinct on one shuffle.
    */
  def qUnionDistinct(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .union(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")

  private val qUnionDistinctSql =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // Window forms
  // ---------------------------------------------------------------------

  /** RANGE frame: trailing 30-day spend per customer. The frame is
    * value-based, so intra-tie row order cannot affect the sum —
    * deterministic by construction; output ordering total via the
    * globally-unique orderkey.
    */
  def qWindowRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val d = datediff(col("o_orderdate").cast(DateType),
      lit("1995-01-01").cast(DateType)).cast(LongType)
    val w = Window.partitionBy("o_custkey").orderBy(col("d"))
      .rangeBetween(-30, Window.currentRow)
    Tables(s, dir, "orders")
      .withColumn("d", d)
      .select(col("o_custkey"), col("o_orderkey"), col("d"),
        sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType).as("spend_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qWindowRangeFrameSql =
    """SELECT o_custkey, o_orderkey,
      |  divide(epoch_ms(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)), 86400000) - 9131 AS d,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY divide(epoch_ms(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)), 86400000) - 9131
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** first_value / last_value with explicit frames (last_value needs the
    * full frame — the default frame ends at CURRENT ROW).
    */
  def qWindowFirstLast(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("o_custkey").orderBy(asc("o_orderdate"), asc("o_orderkey"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        first(col("o_totalprice")).over(ord).as("first_spend"),
        last(col("o_totalprice")).over(full).as("last_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qWindowFirstLastSql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS first_spend,
      |  last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // Scalar families
  // ---------------------------------------------------------------------

  /** Regexp family: extract / match / count / split over p_name
    * ("adjective noun" two-word strings).
    */
  def qRegexpFuncs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part")
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "(\\w+)$", 1).as("noun"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("adjective"),
        col("p_name").rlike("widget$").as("is_widget"),
        regexp_count(col("p_name"), lit("[aeiou]")).cast(LongType).as("n_vowels"),
        size(split(col("p_name"), " ")).cast(LongType).as("n_words"))
      .orderBy("p_partkey")

  private val qRegexpSql =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '(\w+)$', 1) AS noun,
      |  regexp_extract(p_name, '^(\w+)', 1) AS adjective,
      |  regexp_matches(p_name, 'widget$') AS is_widget,
      |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
      |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Map/struct function family: build a map and a struct, transform
    * and extract back to scalars (parquet output stays scalar so the
    * oracle compare is portable — the oracle computes the same scalars
    * directly, verifying the construct→transform→extract round trip).
    */
  def qMapStructFuncs(s: SparkSession, dir: String): DataFrame = {
    val m = map(lit("brand"), col("p_brand"), lit("type"), col("p_type"))
    val st = struct(col("p_size").as("sz"), col("p_retailprice").as("rp"))
    Tables(s, dir, "part")
      .select(col("p_partkey"),
        element_at(m, "brand").as("brand_from_map"),
        element_at(transform_values(m, (_, v) => upper(v)), "type").as("type_upper"),
        concat_ws(",", sort_array(map_keys(m))).as("keys_sorted"),
        size(m).cast(LongType).as("n_keys"),
        st.getField("sz").as("size_from_struct"),
        (st.getField("rp") > 1000.0).as("is_expensive"))
      .orderBy("p_partkey")
  }

  private val qMapStructSql =
    """SELECT p_partkey,
      |  p_brand AS brand_from_map,
      |  upper(p_type) AS type_upper,
      |  'brand,type' AS keys_sorted,
      |  CAST(2 AS BIGINT) AS n_keys,
      |  p_size AS size_from_struct,
      |  p_retailprice > 1000.0 AS is_expensive
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q4_priority_exists" -> (q4PriorityExists(_, _)),
    "q6_selective_agg" -> (q6SelectiveAgg(_, _)),
    "q7_bi_nation_volume" -> (q7BiNationVolume(_, _)),
    "q12_priority_conditional" -> (q12PriorityConditional(_, _)),
    "q14_promo_ratio" -> (q14PromoRatio(_, _)),
    "q18_large_orders" -> (q18LargeOrders(_, _)),
    "q19_disjunctive_pred" -> (q19DisjunctivePred(_, _)),
    "q22_high_balance" -> (q22HighBalance(_, _)),
    "q_in_subquery" -> (qInSubquery(_, _)),
    "q_not_in_subquery" -> (qNotInSubquery(_, _)),
    "q_full_outer_join" -> (qFullOuterJoin(_, _)),
    "q_cross_join" -> (qCrossJoin(_, _)),
    "q_values_lookup" -> (qValuesLookup(_, _)),
    "q_having" -> (qHaving(_, _)),
    "q_union_distinct" -> (qUnionDistinct(_, _)),
    "q_window_range_frame" -> (qWindowRangeFrame(_, _)),
    "q_window_first_last" -> (qWindowFirstLast(_, _)),
    "q_regexp_funcs" -> (qRegexpFuncs(_, _)),
    "q_map_struct_funcs" -> (qMapStructFuncs(_, _)))

  def oracles: Map[String, String] = Map(
    "q4_priority_exists" -> q4Sql,
    "q6_selective_agg" -> q6Sql,
    "q7_bi_nation_volume" -> q7Sql,
    "q12_priority_conditional" -> q12Sql,
    "q14_promo_ratio" -> q14Sql,
    "q18_large_orders" -> q18Sql,
    "q19_disjunctive_pred" -> q19Sql,
    "q22_high_balance" -> q22Sql,
    "q_in_subquery" -> qInSubquerySql,
    "q_not_in_subquery" -> qNotInSubquerySql,
    "q_full_outer_join" -> qFullOuterSql,
    "q_cross_join" -> qCrossSql,
    "q_values_lookup" -> qValuesLookupSql,
    "q_having" -> qHavingSql,
    "q_union_distinct" -> qUnionDistinctSql,
    "q_window_range_frame" -> qWindowRangeFrameSql,
    "q_window_first_last" -> qWindowFirstLastSql,
    "q_regexp_funcs" -> qRegexpSql,
    "q_map_struct_funcs" -> qMapStructSql)
}
