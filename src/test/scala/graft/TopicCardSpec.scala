package graft

import org.apache.spark.sql.functions._
import graft.operators.{GovernanceOps, TopicOps}

/** Semantics tests for topic labeling and the dataset card. */
class TopicCardSpec extends SparkSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("ta_cluster_topics: 5 ranked terms per cluster, scores non-increasing") {
    val rows = TopicOps.taClusterTopics(sc, sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (cell, rs) =>
      assert(rs.length == 5, s"cell $cell has ${rs.length} terms")
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 5L))
      val scores = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"cell $cell scores not ranked: ${scores.mkString(",")}")
      // a corpus-ubiquitous term (idf = 0) can never label a topic
      assert(rs.forall(_.getLong(3) >= 0))
    }
  }

  test("q_data_card: per-source volumes partition the corpus; rates in [0,1]") {
    val s = sc
    val rows = GovernanceOps.qDataCard(s, sf001).collect()
    assert(rows.length == 20)
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    assert(rows.map(_.getLong(1)).sum == docs.count())
    assert(rows.map(_.getLong(2)).sum ==
      docs.agg(sum("n_chars")).head().getLong(0))
    rows.foreach { r =>
      assert(r.getLong(3) >= 1)                       // n_langs
      assert(r.getDouble(4) >= 0.0)                   // entropy
      assert(r.getDouble(4) <= math.log(r.getLong(3).toDouble) / math.log(2.0) + 1e-6)
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0) // dup_rate
      assert(r.getLong(5) >= 0 && r.getLong(5) < r.getLong(1))
    }
  }
}
