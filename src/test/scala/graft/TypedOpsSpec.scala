package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Typed-API tier: the cogroup operator against its untyped twin. */
class TypedOpsSpec extends SparkSuite {

  test("typed cogroup equals the full-outer aggregate join") {
    val got = SparkEntry.queries("q_typed_cogroup")(sc, sfDir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val o = Tables(sc, sfDir, "orders")
      .groupBy(col("o_orderkey").as("okey")).agg(count(lit(1)).as("n_orders"))
    val l = Tables(sc, sfDir, "lineitem")
      .groupBy(col("l_orderkey").as("okey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
    val want = o.join(l, Seq("okey"), "full_outer")
      .select(col("okey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("sum_qty"), lit(0L)).as("sum_qty"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want)
    // orders with no lineitems must surface with zero counts
    assert(got.values.exists(_._2 == 0L), "expected zero-line orders in this data")
  }
}
