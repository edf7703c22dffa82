package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Plan-quality gates: these assert the PHYSICAL properties that make
  * the operators viable at 100 TB — if a refactor regresses one (a
  * broadcast becomes a shuffle, a top-k becomes a global sort, a
  * filter stops reaching the scan), these tests fail even though
  * results stay correct.
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(sc, sfDir).queryExecution.executedPlan.toString

  test("dedup anti-join is a broadcast hash join (not a shuffle)") {
    val p = plan("hfp_dedup_anti")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"))
  }

  test("top-k plans as TakeOrderedAndProject, not global sort+limit") {
    val p = plan("q2_topk_orders")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("GlobalLimit")) // would imply a full sort first
  }

  test("q1 aggregation is partial (map-side) before the exchange") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_sum"))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual"))
  }

  test("scans are column-pruned to what the query needs") {
    val p = plan("hfp_dedup_anti")
    // both sides of the dedup read exactly one column from parquet
    assert(p.contains("ReadSchema: struct<event_id:bigint>"))
  }

  test("q3 dimension joins broadcast (orders+customer build sides)") {
    val p = plan("q3_shipping_priority")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), LessThan"))
  }

  test("q5 snowflake dims broadcast; no cartesian anywhere") {
    val p = plan("q5_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
    assert(!p.contains("CartesianProduct"))
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    // default warehouse dir (./spark-warehouse, git-ignored) — the
    // warehouse conf is static and the JVM-shared session already exists
    val li = Tables(sc, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables(sc, sfDir, "orders").select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      // bucket-pre-partitioned on the join key -> no shuffle exchange
      assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
