package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** MiningOps invariants: rule algebra for the A-priori pass, vote
  * accounting and plan shape for the k-NN classifier.
  */
class MiningOpsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(sc, sfDir)

  // ---- q_assoc_rules ----------------------------------------------------

  test("assoc rules: support <= confidence, lift symmetric across directions") {
    val rows = run("q_assoc_rules").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sup, conf) = (r.getDouble(3), r.getDouble(4))
      assert(sup <= conf + 1e-9,
        s"support $sup > confidence $conf: n_a cannot exceed n_orders")
      assert(r.getString(0) != r.getString(1), "antecedent == consequent")
    }
    // lift(a→b) == lift(b→a): both divide the same n_ab·N by n_a·n_b
    val lifts = rows.map(r => ((r.getString(0), r.getString(1)), r.getDouble(5))).toMap
    lifts.foreach { case ((a, b), l) =>
      lifts.get((b, a)).foreach(l2 => assert(l == l2, s"lift asymmetric for ($a,$b)"))
    }
  }

  test("assoc rules: pair support never exceeds either singleton support") {
    val baskets = Tables(sc, sfDir, "lineitem")
      .select(col("l_orderkey").as("oid"), col("l_partkey"))
      .join(Tables(sc, sfDir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("oid"), col("p_brand").as("item")).distinct()
    val singles = baskets.groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    run("q_assoc_rules").collect().foreach { r =>
      val nAb = r.getLong(2)
      assert(nAb <= singles(r.getString(0)) && nAb <= singles(r.getString(1)),
        "monotonicity: pair count exceeds a singleton count")
    }
  }

  // ---- q_knn_classify ---------------------------------------------------

  test("knn classify: confusion matrix accounts for every held-out vector") {
    val rows = run("q_knn_classify").collect()
    val nTest = Tables(sc, sfDir, "embeddings")
      .where(col("vec_id") % 25 === 0).count()
    assert(rows.map(_.getLong(2)).sum == nTest,
      "every test vector must land in exactly one confusion cell")
    val labels = Tables(sc, sfDir, "embeddings")
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    rows.foreach { r =>
      assert(labels.contains(r.getInt(0)) && labels.contains(r.getInt(1)),
        "confusion cells must use real labels")
    }
  }

  // ---- q_skyline --------------------------------------------------------

  test("skyline: no output point dominates another, non-members are dominated") {
    val sky = run("q_skyline").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def dom(a: (Long, Double, Long), b: (Long, Double, Long)) =
      a._2 >= b._2 && a._3 <= b._3 && (a._2 > b._2 || a._3 < b._3)
    for (a <- sky; b <- sky) assert(!dom(a, b), s"$a dominates $b in skyline")
    val all = Tables(sc, sfDir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("t"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val skySet = sky.map(_._1).toSet
    all.filterNot(p => skySet(p._1)).foreach { p =>
      assert(sky.exists(s => dom(s, p)), s"non-member $p not dominated")
    }
  }

  test("skyline is invariant to input partitioning") {
    val a = run("q_skyline").collect().toSeq
    val b = SparkEntry.queries("q_skyline")(sc, sfDir).repartition(13).collect()
      .sortBy(r => (-r.getDouble(1), r.getLong(0))).toSeq
    assert(a == b)
  }

  test("knn classify: top-k runs through GroupedTopKExec, query side broadcast") {
    val plan = run("q_knn_classify").queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"), "expected the bounded-heap top-k exec")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "query slice must broadcast — the corpus side must not shuffle")
  }
}
