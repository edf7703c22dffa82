package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Third analytics wave: the remaining TPC-H query shapes (Q13 outer-
  * join histogram, Q16 distinct-count exclusion, Q17 correlated-average
  * threshold, Q21 EXISTS∧NOT-EXISTS composition) plus UNPIVOT and the
  * array / advanced-string / datetime-arithmetic / encoding scalar
  * families. Oracle-exactness per NOTES.md throughout.
  */
object Analytics3 {

  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  private def dsum(c: Column): Column = sum(c).cast(DoubleType)

  // ---------------------------------------------------------------------
  // TPC-H shapes
  // ---------------------------------------------------------------------

  /** Q13 shape: customers-per-order-count histogram. The left outer
    * join keeps order-less customers (count 0); two cascaded
    * aggregations, each with map-side partials.
    */
  def q13OrderDist(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  private val q13Sql =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q16 shape: distinct suppliers per (brand, size) with an exclusion
    * list (lineitem plays the part-supplier bridge; the testdata has no
    * partsupp table). distinct-count shuffles once on the group key.
    */
  def q16SupplierCounts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(!col("p_brand").isin("Brand#1", "Brand#2") && col("p_size") <= 25)
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_size"))

  private val q16Sql =
    """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand NOT IN ('Brand#1', 'Brand#2') AND p_size <= 25
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand ASC, p_size ASC""".stripMargin

  /** Q17 shape: rows below 20% of their part's average quantity. The
    * correlated average decorrelates to a per-part aggregate joined
    * back — expressed directly that way here (the plan Catalyst would
    * produce), with the oracle keeping the correlated form. The
    * average is decimal-sum/count so the threshold is bit-identical.
    */
  def q17SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val partAvg = li.groupBy(col("l_partkey").as("pk"))
      .agg((lit(0.2) * (dsum(dec2(col("l_quantity"))) / count(lit(1)))).as("qty_thresh"))
    li.join(partAvg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("qty_thresh"))
      .agg((dsum(dec2(col("l_extendedprice"))) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  private val q17Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_items
      |FROM lineitem l1
      |WHERE l_quantity < (
      |  SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
      |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin

  /** Q21 shape: suppliers whose shipments ran very late on multi-
    * supplier orders where NO other supplier was late — an EXISTS and a
    * NOT EXISTS against the same fact, expressed as one semi and one
    * anti join sharing the orderkey shuffle.
    */
  def q21LateSuppliers(s: SparkSession, dir: String): DataFrame = {
    // The EXISTS ∧ NOT-EXISTS pair collapses into per-order aggregates:
    // a late row survives iff its order has ≥2 distinct suppliers
    // overall (EXISTS another supplier) and exactly 1 distinct LATE
    // supplier (NOT EXISTS another late one — which must then be the
    // row's own). r16: ONE pass over the fact instead of two — the old
    // shape shuffled lineitem twice (the orders join AND a separate
    // whole-fact groupBy for the ≥2-suppliers test) and paid two
    // countDistinct Expands; both per-order statistics now fold from a
    // single (orderkey, suppkey) aggregate stacked on the join output.
    // Every l_orderkey has its order row (FK), so aggregating over the
    // join ≡ aggregating over the bare fact. The stacked groupBys ride
    // the join's HashPartitioning(l_orderkey) — grouping keys ⊇
    // partitioning key, so the whole chain costs exactly one fact-sized
    // exchange; at 100 TB this also halves the bytes into that one
    // exchange (3 narrow columns + a boolean).
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val j = li.join(Tables(s, dir, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 1000 DAYS")).as("late"))
    val perSupp = j.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(sum(when(col("late"), 1L).otherwise(0L)).as("late_rows"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supps"),
        sum(when(col("late_rows") > 0, 1L).otherwise(0L)).as("n_late_supps"),
        sum(col("late_rows")).as("n_late_rows"),
        min(when(col("late_rows") > 0, col("l_suppkey"))).as("only_ls"))
      .filter(col("n_late_supps") === 1 && col("n_supps") >= 2)
    perOrder
      .join(Tables(s, dir, "supplier"), col("only_ls") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum(col("n_late_rows")).as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
  }

  private val q21Sql =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 1000 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 1000 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name ASC""".stripMargin

  // ---------------------------------------------------------------------
  // UNPIVOT (long↔wide round trip with q_pivot)
  // ---------------------------------------------------------------------

  /** Wide conditional aggregate → unpivot back to long format. */
  def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("open_cnt"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("filled_cnt"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("partial_cnt"))
    wide.unpivot(
        Array(col("o_orderpriority")),
        Array(col("open_cnt"), col("filled_cnt"), col("partial_cnt")),
        "status_col", "n")
      .orderBy("o_orderpriority", "status_col")
  }

  private val qUnpivotSql =
    """SELECT o_orderpriority, status_col, n FROM (
      |  SELECT o_orderpriority,
      |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_cnt,
      |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS filled_cnt,
      |    CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS partial_cnt
      |  FROM orders GROUP BY o_orderpriority)
      |UNPIVOT (n FOR status_col IN (open_cnt, filled_cnt, partial_cnt))
      |ORDER BY o_orderpriority, status_col""".stripMargin

  // ---------------------------------------------------------------------
  // Scalar families
  // ---------------------------------------------------------------------

  /** Array algebra: construction, set ops (sorted for cross-engine
    * order-independence), slicing, flattening — on small integer arrays
    * derived from key columns. Array-typed outputs are serialized to
    * comma-joined strings so the harness's pandas compare can hash the
    * rows (numpy arrays are unhashable); the DuckDB side wraps its
    * `array_to_string` in COALESCE because DuckDB yields NULL for an
    * empty list where Spark's `array_join` yields "".
    */
  def qArrayAdvanced(s: SparkSession, dir: String): DataFrame = {
    val a1 = array(col("c_custkey") % 7, col("c_nationkey").cast(LongType), col("c_custkey") % 3)
    val a2 = array(col("c_nationkey").cast(LongType), col("c_custkey") % 5)
    def joined(c: Column): Column = array_join(c.cast("array<string>"), ",")
    Tables(s, dir, "customer")
      .select(col("c_custkey"),
        joined(sort_array(array_union(a1, a2))).as("union_sorted"),
        joined(sort_array(array_intersect(a1, a2))).as("intersect_sorted"),
        size(array_except(a1, a2)).cast(LongType).as("except_n"),
        array_contains(a1, col("c_custkey") % 5).as("has_mod5"),
        joined(slice(a1, 2, 2)).as("mid_slice"),
        joined(flatten(array(a1, a2))).as("flat"),
        array_max(a1).as("max_elem"),
        array_position(a1, col("c_nationkey").cast(LongType)).cast(LongType).as("nat_pos"))
      .orderBy("c_custkey")
  }

  private val qArrayAdvancedSql =
    """WITH t AS (SELECT c_custkey, c_nationkey,
      |    list_value(c_custkey % 7, CAST(c_nationkey AS BIGINT), c_custkey % 3) AS a1,
      |    list_value(CAST(c_nationkey AS BIGINT), c_custkey % 5) AS a2
      |  FROM customer)
      |SELECT c_custkey,
      |  COALESCE(array_to_string(list_transform(list_sort(list_distinct(list_concat(a1, a2))), x -> CAST(x AS STRING)), ','), '') AS union_sorted,
      |  COALESCE(array_to_string(list_transform(list_sort(list_distinct(list_filter(a1, x -> list_contains(a2, x)))), x -> CAST(x AS STRING)), ','), '') AS intersect_sorted,
      |  CAST(len(list_distinct(list_filter(a1, x -> NOT list_contains(a2, x)))) AS BIGINT) AS except_n,
      |  list_contains(a1, c_custkey % 5) AS has_mod5,
      |  COALESCE(array_to_string(list_transform(array_slice(a1, 2, 3), x -> CAST(x AS STRING)), ','), '') AS mid_slice,
      |  COALESCE(array_to_string(list_transform(flatten(list_value(a1, a2)), x -> CAST(x AS STRING)), ','), '') AS flat,
      |  list_max(a1) AS max_elem,
      |  CAST(COALESCE(list_position(a1, CAST(c_nationkey AS BIGINT)), 0) AS BIGINT) AS nat_pos
      |FROM t ORDER BY c_custkey""".stripMargin

  /** Advanced string ops: translate / left / right / repeat / reverse /
    * strpos / replace / char padding-trim composition.
    */
  def qStringAdvanced(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part")
      .select(col("p_partkey"),
        translate(col("p_name"), "aeiou", "AEIOU").as("caps_vowels"),
        expr("left(p_name, 4)").as("first4"),
        expr("right(p_name, 3)").as("last3"),
        repeat(col("p_brand"), 2).as("doubled"),
        reverse(col("p_name")).as("reversed"),
        instr(col("p_name"), " ").cast(LongType).as("space_at"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        rtrim(ltrim(concat(lit("  "), col("p_brand"), lit("  ")))).as("trimmed"))
      .orderBy("p_partkey")

  private val qStringAdvancedSql =
    """SELECT p_partkey,
      |  translate(p_name, 'aeiou', 'AEIOU') AS caps_vowels,
      |  left(p_name, 4) AS first4,
      |  right(p_name, 3) AS last3,
      |  repeat(p_brand, 2) AS doubled,
      |  reverse(p_name) AS reversed,
      |  CAST(strpos(p_name, ' ') AS BIGINT) AS space_at,
      |  replace(p_name, ' ', '_') AS snake,
      |  rtrim(ltrim('  ' || p_brand || '  ')) AS trimmed
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Datetime arithmetic: interval add/subtract, month addition with
    * end-of-month clamping, constructed dates, integer month spans.
    */
  def qIntervalArith(s: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate").cast(DateType)
    Tables(s, dir, "orders")
      .select(col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("plus_90d"),
        (col("o_orderdate") - expr("INTERVAL 6 HOURS")).as("minus_6h"),
        add_months(d, 2).as("plus_2mo"),
        make_date(year(d), month(d), lit(1)).as("month_floor"),
        ((year(d) - 1995) * 12 + month(d) - 1).cast(LongType).as("months_since"),
        (dayofweek(d) - 1).cast(LongType).as("dow_sun0"))
      .orderBy("o_orderkey")
  }

  private val qIntervalArithSql =
    """SELECT o_orderkey,
      |  o_orderdate + INTERVAL 90 DAY AS plus_90d,
      |  o_orderdate - INTERVAL 6 HOUR AS minus_6h,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
      |  make_date(year(o_orderdate), month(o_orderdate), 1) AS month_floor,
      |  (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS months_since,
      |  (divide(epoch_ms(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)), 86400000) + 4) % 7 AS dow_sun0
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Encoding round trips: base64 over the utf-8 payload, verified by
    * decoding back, plus the md5 hex digest both engines share.
    */
  def qEncodeFuncs(s: SparkSession, dir: String): DataFrame = {
    val bin = to_binary(col("text"), lit("utf-8"))
    // Spark's base64 is MIME-flavored (CRLF-wrapped at 76 chars);
    // strip the wrapping to get the canonical unchunked encoding
    // DuckDB (and most systems) produce
    val b64 = regexp_replace(base64(bin), "\r\n", "")
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        b64.as("b64"),
        (unbase64(b64) === bin).as("roundtrip_ok"),
        md5(col("text")).as("digest"),
        length(b64).cast(LongType).as("b64_len"))
      .orderBy("doc_id")
  }

  private val qEncodeSql =
    """SELECT doc_id,
      |  base64(encode(text)) AS b64,
      |  from_base64(base64(encode(text))) = encode(text) AS roundtrip_ok,
      |  md5(text) AS digest,
      |  CAST(length(base64(encode(text))) AS BIGINT) AS b64_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Extended math: log bases, cube root, inverse trig, factorial,
    * sign, binary/hex rendering. Transcendentals rounded at 6 per the
    * portability recipe; integer ops exact.
    */
  def qMathExtended(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part")
      .select(col("p_partkey"),
        round(log2(col("p_retailprice")), 6).as("lg2"),
        round(log10(col("p_retailprice")), 6).as("lg10"),
        round(cbrt(col("p_retailprice")), 6).as("cuberoot"),
        round(asin(col("p_size") / 50.0), 6).as("asin_sz"),
        round(acos(col("p_size") / 50.0), 6).as("acos_sz"),
        factorial(col("p_size") % 10).as("fact_sz"),
        signum(col("p_retailprice") - 1000.0).cast(LongType).as("sign_dev"),
        bin(col("p_partkey")).as("bin_key"),
        hex(col("p_partkey")).as("hex_key"))
      .orderBy("p_partkey")

  private val qMathExtendedSql =
    """SELECT p_partkey,
      |  round(log2(p_retailprice), 6) AS lg2,
      |  round(log10(p_retailprice), 6) AS lg10,
      |  round(cbrt(p_retailprice), 6) AS cuberoot,
      |  round(asin(p_size / 50.0), 6) AS asin_sz,
      |  round(acos(p_size / 50.0), 6) AS acos_sz,
      |  CAST(factorial(p_size % 10) AS BIGINT) AS fact_sz,
      |  CAST(sign(p_retailprice - 1000.0) AS BIGINT) AS sign_dev,
      |  bin(p_partkey) AS bin_key,
      |  hex(p_partkey) AS hex_key
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_order_dist" -> (q13OrderDist(_, _)),
    "q16_supplier_counts" -> (q16SupplierCounts(_, _)),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue(_, _)),
    "q21_late_suppliers" -> (q21LateSuppliers(_, _)),
    "q_unpivot" -> (qUnpivot(_, _)),
    "q_array_advanced" -> (qArrayAdvanced(_, _)),
    "q_string_advanced" -> (qStringAdvanced(_, _)),
    "q_interval_arith" -> (qIntervalArith(_, _)),
    "q_encode_funcs" -> (qEncodeFuncs(_, _)),
    "q_math_extended" -> (qMathExtended(_, _)))

  def oracles: Map[String, String] = Map(
    "q13_order_dist" -> q13Sql,
    "q16_supplier_counts" -> q16Sql,
    "q17_small_qty_revenue" -> q17Sql,
    "q21_late_suppliers" -> q21Sql,
    "q_unpivot" -> qUnpivotSql,
    "q_array_advanced" -> qArrayAdvancedSql,
    "q_string_advanced" -> qStringAdvancedSql,
    "q_interval_arith" -> qIntervalArithSql,
    "q_encode_funcs" -> qEncodeSql,
    "q_math_extended" -> qMathExtendedSql)
}
