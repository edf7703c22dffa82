package graft

import org.apache.spark.sql.functions._
import graft.operators.MlOps2

/** Semantics tests for the second ML-primitive batch. */
class MlOps2Spec extends SparkSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("q_ucb_bandit: exactly one chosen arm, and it has the max UCB score") {
    val rows = MlOps2.qUcbBandit(sc, sf001).collect()
    assert(rows.length == 5)
    val chosen = rows.filter(_.getBoolean(4))
    assert(chosen.length == 1)
    val maxUcb = rows.map(_.getDouble(3)).max
    assert(chosen.head.getDouble(3) == maxUcb)
    // UCB exceeds the mean (the exploration bonus is positive)
    rows.foreach(r => assert(r.getDouble(3) > r.getDouble(2)))
  }

  test("q_als_step: user factors reduce squared error vs the zero vector") {
    val s = sc
    val w = MlOps2.qAlsStep(s, sf001).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(w.size == 20)
    // rebuild the rating rows for those users and check the normal-
    // equation solution beats u = 0 on regularized squared error
    val ratings = graft.sources.Tables(s, sf001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(graft.sources.Tables(s, sf001, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey").as("user")), "l_orderkey")
      .join(graft.sources.Tables(s, sf001, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand").as("item")), "l_partkey")
      .groupBy("user", "item").agg(count(lit(1)).as("r"))
      .where(col("user").isin(w.keys.toSeq: _*))
      .select(col("user"), col("item"), col("r").cast("double").as("r"),
        ((graft.functions.PortableHash.hash64(col("item"), 1) % 1000L).cast("double") / 1000.0 - 0.5).as("v1"),
        ((graft.functions.PortableHash.hash64(col("item"), 2) % 1000L).cast("double") / 1000.0 - 0.5).as("v2"))
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val byUser = ratings.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      val (u1, u2) = w(u)
      def err(a: Double, b: Double): Double =
        rs.map { case (_, r, v1, v2) => val d = r - (a * v1 + b * v2); d * d }.sum +
          0.1 * (a * a + b * b)
      assert(err(u1, u2) <= err(0.0, 0.0) + 1e-9,
        s"user $u: ALS solution worse than zero vector")
    }
  }

  test("q_seasonal_profile: peak >= trough and amplitude consistent") {
    val rows = MlOps2.qSeasonalProfile(sc, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (pm, tm, amp) = (r.getDouble(2), r.getDouble(4), r.getDouble(5))
      assert(pm >= tm)
      assert(amp == pm - tm)
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 23)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 23)
    }
  }
}
