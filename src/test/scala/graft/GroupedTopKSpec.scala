package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.GroupedTopK
import graft.sources.Tables

class GroupedTopKSpec extends SparkSuite {

  test("custom exec equals the window row_number formulation") {
    val ord = Tables(sc, sfDir, "orders")
    val custom = GroupedTopK(ord, spark,
      Seq(col("o_custkey")), col("o_totalprice"), col("o_orderkey"), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey").collect().toSeq
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val windowed = ord.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey").collect().toSeq
    assert(custom == windowed)
  }

  test("plan: custom exec, one exchange on the group key, no sort below") {
    val ord = Tables(sc, sfDir, "orders")
    val df = GroupedTopK(ord, spark,
      Seq(col("o_custkey")), col("o_totalprice"), col("o_orderkey"), 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GroupedTopK"), p.take(1000)) // exec prints without the Exec suffix
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1500))
    assert(!p.contains("Sort "), p.take(1500)) // the point: heap, not sort
  }

  test("k larger than any group returns all rows") {
    val ord = Tables(sc, sfDir, "orders")
    val n = ord.count()
    val all = GroupedTopK(ord, spark,
      Seq(col("o_custkey")), col("o_totalprice"), col("o_orderkey"), 1000000)
    assert(all.count() == n)
  }
}
