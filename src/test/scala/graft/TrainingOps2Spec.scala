package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-selection operators: semantic invariants plus the plan shapes
  * that make them scale (partition-parallel prefix sum, TakeOrdered
  * instead of global sorts).
  */
class TrainingOps2Spec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(sc, sfDir)

  // ---- q_domain_mix -----------------------------------------------------

  test("domain mix rates flatten the mixture and never upsample") {
    val rows = run("q_domain_mix").collect()
    val total = rows.map(_.getLong(2)).sum.toDouble
    val target = total / rows.length
    rows.foreach { r =>
      val rate = r.getDouble(3); val tokens = r.getLong(2)
      assert(rate > 0 && rate <= 1.0, s"rate $rate out of range")
      val expected = r.getLong(4)
      assert(expected <= tokens, "sampling cannot add tokens")
      // rate-1.0 sources are already under target; capped sources land on it
      if (rate < 1.0)
        assert(math.abs(expected - target) <= target * 0.01 + 1,
          s"capped source should land on the uniform target: $expected vs $target")
    }
  }

  // ---- q_token_budget ---------------------------------------------------

  test("token budget selection equals the naive global running sum") {
    val got = run("q_token_budget")
    val naive = Tables(sc, sfDir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        (size(array_distinct(split(col("text"), " "))).cast("double") /
          size(split(col("text"), " "))).as("ttr"))
      .withColumn("cum_tok",
        sum("n_tok").over(Window.orderBy(desc("ttr"), asc("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .where(col("cum_tok") <= 10000L)
    assert(got.count() == naive.count())
    assert(got.join(naive.select("doc_id"), "doc_id").count() == got.count(),
      "two-phase selection must pick exactly the naive prefix")
    // the two-phase formulation must not plan a single-partition window:
    // every window exchange is hashpartitioning, never SinglePartition
    val plan = got.queryExecution.executedPlan.toString
    val windowExchanges = plan.linesIterator
      .filter(l => l.contains("Exchange"))
      .toList
    assert(windowExchanges.exists(_.contains("hashpartitioning")),
      s"expected a hash-partitioned window stage:\n$plan")
  }

  test("token budget never overspends and maximizes prefix") {
    val rows = run("q_token_budget").collect()
    val spent = rows.map(_.getLong(1)).sum
    assert(spent <= 10000L, s"budget overspent: $spent")
    assert(rows.map(_.getLong(3)).max == spent, "cum_tok of last row = total spend")
  }

  // ---- q_weighted_sample ------------------------------------------------

  test("weighted sample is reproducible and biased toward heavy docs") {
    val a = run("q_weighted_sample").collect().map(_.getLong(0)).toSeq
    val b = run("q_weighted_sample").repartition(13).collect().map(_.getLong(0)).toSeq
    assert(a.toSet == b.toSet, "sample must be partitioning-invariant")
    assert(a.length == math.min(100,
      Tables(sc, sfDir, "documents").count()).toInt)
    // A-ES with weight=length: mean length of the sample should exceed
    // the corpus mean (weighting by length biases toward long docs)
    val corpusMean = Tables(sc, sfDir, "documents")
      .select(avg(size(split(col("text"), " ")))).head.getDouble(0)
    val sampleMean = run("q_weighted_sample")
      .select(avg("weight")).head.getDouble(0)
    assert(sampleMean > corpusMean * 0.95,
      s"length-weighted sample mean $sampleMean vs corpus $corpusMean")
  }

  // ---- q_outlier_trim ---------------------------------------------------

  test("winsor bounds are exact order statistics and clamp is consistent") {
    val r = run("q_outlier_trim").head
    val n = r.getLong(0); val lo = r.getDouble(1); val hi = r.getDouble(2)
    val k = math.ceil(0.01 * n).toLong
    val p = Tables(sc, sfDir, "orders").select(col("o_totalprice").as("v"))
    assert(p.where(col("v") <= lo).count() >= k)
    assert(p.where(col("v") < lo).count() < k)
    assert(p.where(col("v") >= hi).count() >= k)
    assert(p.where(col("v") > hi).count() < k)
    assert(r.getLong(3) < n && r.getLong(4) < n)
    // the order-statistic fetch must plan as TakeOrderedAndProject,
    // not a global Sort
    val plan = SparkEntry.queries("q_outlier_trim")(sc, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }
}
