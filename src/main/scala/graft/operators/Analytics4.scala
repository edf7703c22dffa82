package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Fourth analytics wave: the remaining TPC-H query shapes — Q8 market
  * share, Q9 product profit, Q10 returned items, Q11 important parts,
  * Q15 top supplier, Q20 nested-IN — completing coverage of all 22
  * TPC-H query archetypes across Analytics/Analytics2/Analytics3/this
  * (the testdata has no partsupp table; Q2/Q9/Q11/Q20 adapt the
  * part-supplier bridge through lineitem, preserving each query's
  * structural shape: the join topology, subquery nesting, and
  * aggregation pattern).
  */
object Analytics4 {

  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  private def dec42(c: Column): Column = c.cast(DecimalType(4, 2))
  private def dsum(c: Column): Column = sum(c).cast(DoubleType)
  private def discPrice: Column =
    dec2(col("l_extendedprice")) * (lit(1) - dec42(col("l_discount"))).cast(DecimalType(4, 2))
  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))"

  /** Q8 shape: one supplier nation's share of yearly volume sold to one
    * customer region. Share = exact-decimal conditional sum over
    * exact-decimal total, divided once in double.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val nS = broadcast(Tables(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    val nC = broadcast(Tables(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey")))
    val reg = broadcast(Tables(s, dir, "region").filter(col("r_name") === "ASIA"))
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(nS, col("s_nationkey") === col("sn_key"))
      .join(nC, col("c_nationkey") === col("cn_key"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .withColumn("o_year", year(col("o_orderdate")).cast(LongType))
      .groupBy("o_year")
      .agg((dsum(when(col("supp_nation") === "NATION_3", discPrice)
          .otherwise(lit(0).cast(DecimalType(17, 4)))) / dsum(discPrice)).as("mkt_share"),
        count(lit(1)).as("n_items"))
      .orderBy("o_year")
  }

  private val q8Sql =
    s"""SELECT year(o_orderdate) AS o_year,
       |  CAST(SUM(CASE WHEN n1.n_name = 'NATION_3' THEN $discPriceSql
       |           ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
       |    / CAST(SUM($discPriceSql) AS DOUBLE) AS mkt_share,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |JOIN region ON n2.n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY o_year ORDER BY o_year""".stripMargin

  /** Q9 shape: profit by supplier nation and year. Cost side adapts
    * ps_supplycost to p_retailprice·quantity; the two exact decimal
    * sums subtract once in double.
    */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val nat = broadcast(Tables(s, dir, "nation"))
    val cost = dec2(col("p_retailprice")) * dec2(col("l_quantity"))
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "part").filter(col("p_name").like("%widget%")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .withColumn("o_year", year(col("o_orderdate")).cast(LongType))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg((dsum(discPrice) - dsum(cost)).as("profit"))
      .orderBy(asc("nation"), desc("o_year"))
  }

  private val q9Sql =
    s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
       |  CAST(SUM($discPriceSql) AS DOUBLE)
       |    - CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%widget%'
       |GROUP BY n_name, year(o_orderdate)
       |ORDER BY nation ASC, o_year DESC""".stripMargin

  /** Q10 shape: top-20 customers by returned-item revenue. */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val nat = broadcast(Tables(s, dir, "nation"))
    Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(dsum(discPrice).as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  private val q10Sql =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin

  /** Q11 shape: parts whose stocked value exceeds a fraction of the
    * global total — the HAVING-against-global-scalar pattern. Value
    * adapts ps_supplycost·ps_availqty to extendedprice·quantity.
    */
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val value = dec2(col("l_extendedprice")) * dec2(col("l_quantity"))
    val li = Tables(s, dir, "lineitem")
    val perPart = li.groupBy("l_partkey").agg(dsum(value).as("part_value"))
    val threshold = li.agg((dsum(value) * 0.001).as("thresh"))
    perPart.join(broadcast(threshold))
      .filter(col("part_value") > col("thresh"))
      .select(col("l_partkey"), col("part_value"))
      .orderBy(desc("part_value"), asc("l_partkey"))
  }

  private val q11Sql =
    """SELECT l_partkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS part_value
      |FROM lineitem GROUP BY l_partkey
      |HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) >
      |  (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * 0.001
      |   FROM lineitem)
      |ORDER BY part_value DESC, l_partkey ASC""".stripMargin

  /** Q15 shape: supplier(s) achieving the maximum revenue — a CTE used
    * twice (per-supplier revenue and its max), joined back. Exact
    * decimal revenue makes the double equality portable.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
      .groupBy(col("l_suppkey"))
      .agg(dsum(discPrice).as("total_rev"))
    val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
    Tables(s, dir, "supplier")
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(maxRev))
      .filter(col("total_rev") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy("s_suppkey")
  }

  private val q15Sql =
    s"""WITH rev AS (
       |  SELECT l_suppkey, CAST(SUM($discPriceSql) AS DOUBLE) AS total_rev
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_rev
       |FROM supplier JOIN rev ON s_suppkey = l_suppkey
       |WHERE total_rev = (SELECT max(total_rev) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  /** Q20 shape: nested IN — suppliers who moved serious volume of
    * promo parts (part-filter IN inside a grouped-HAVING IN).
    */
  def q20PromoSuppliers(s: SparkSession, dir: String): DataFrame = {
    val promoParts = Tables(s, dir, "part").filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val bigMovers = Tables(s, dir, "lineitem")
      .join(promoParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey")
      .agg(sum(dec2(col("l_quantity"))).as("promo_qty"))
      .filter(col("promo_qty") > 3000)
      .select(col("l_suppkey"), col("promo_qty").cast(DoubleType).as("promo_qty"))
    Tables(s, dir, "supplier")
      .join(bigMovers, col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("promo_qty"))
      .orderBy("s_suppkey")
  }

  private val q20Sql =
    """SELECT s_suppkey, s_name, promo_qty FROM supplier
      |JOIN (SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS promo_qty
      |      FROM lineitem
      |      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      |      GROUP BY l_suppkey
      |      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 3000) b
      |ON s_suppkey = b.l_suppkey
      |ORDER BY s_suppkey""".stripMargin

  /** Q2 shape: correlated MIN — for each part, the supplier(s) whose
    * line price equals that part's global minimum (the testdata's
    * stand-in for min-supplycost). The decorrelated Spark form computes
    * the per-part min once and joins back on (partkey, price equality);
    * the oracle keeps the correlated subquery.
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val minPrice = li.groupBy(col("l_partkey").as("mp_key"))
      .agg(min(col("l_extendedprice")).as("min_price"))
    li.join(minPrice, col("l_partkey") === col("mp_key") &&
        col("l_extendedprice") === col("min_price"))
      .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("min_price"))
      .distinct()
      .orderBy(asc("p_partkey"), asc("s_name"))
      .limit(100)
  }

  private val q2Sql =
    """SELECT DISTINCT p_partkey, p_name, s_name, l_extendedprice AS min_price
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_extendedprice = (SELECT min(l_extendedprice) FROM lineitem l2
      |                         WHERE l2.l_partkey = lineitem.l_partkey)
      |ORDER BY p_partkey ASC, s_name ASC LIMIT 100""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier" -> (q2MinCostSupplier(_, _)),
    "q8_market_share" -> (q8MarketShare(_, _)),
    "q9_product_profit" -> (q9ProductProfit(_, _)),
    "q10_returned_items" -> (q10ReturnedItems(_, _)),
    "q11_important_parts" -> (q11ImportantParts(_, _)),
    "q15_top_supplier" -> (q15TopSupplier(_, _)),
    "q20_promo_suppliers" -> (q20PromoSuppliers(_, _)))

  def oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" -> q2Sql,
    "q8_market_share" -> q8Sql,
    "q9_product_profit" -> q9Sql,
    "q10_returned_items" -> q10Sql,
    "q11_important_parts" -> q11Sql,
    "q15_top_supplier" -> q15Sql,
    "q20_promo_suppliers" -> q20Sql)
}
