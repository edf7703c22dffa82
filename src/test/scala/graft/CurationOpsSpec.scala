package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-6 additions: Gopher quality rules, readability scores,
  * in-plan Naive-Bayes language ID, winnowing fingerprint dedup, HLL
  * distinct sketch, triangle counting — each checked by an independent
  * recomputation or an invariant a correct implementation must satisfy
  * (the DuckDB oracle covers exactness; these cover semantics).
  */
class CurationOpsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(sc, sfDir)

  // ---- ta_gopher_rules --------------------------------------------------

  test("gopher rules: one row per doc, keep ⇔ conjunction of its rule columns") {
    val rows = run("ta_gopher_rules").collect()
    assert(rows.length == Tables(sc, sfDir, "documents").count())
    rows.foreach { r =>
      val (nw, mwl, af, sh, keep) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getBoolean(5))
      val expect = nw >= 10 && nw <= 1000 && mwl >= 2.0 && mwl <= 12.0 &&
        af >= 0.8 && sh >= 2
      assert(keep == expect, s"keep mismatch on $r")
      assert(af >= 0.0 && af <= 1.0)
    }
  }

  // ---- ta_readability ---------------------------------------------------

  test("readability: syllable count recomputed per-word matches the doc-level count") {
    val got = run("ta_readability").limit(50).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    val texts = Tables(sc, sfDir, "documents").select("doc_id", "text")
      .where(col("doc_id").isin(got.keys.toSeq.map(Long.box): _*))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    texts.foreach { case (id, t) =>
      val syl = t.split(" ").map("[aeiouy]+".r.findAllIn(_).length).sum
      assert(got(id) == syl, s"doc $id: expected $syl syllable groups, got ${got(id)}")
    }
  }

  // ---- ta_nb_langid -----------------------------------------------------

  test("NB confusion matrix partitions the corpus and is diagonally dominant") {
    val rows = run("ta_nb_langid").collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables(sc, sfDir, "documents").count(),
      "every doc must receive exactly one prediction")
    val correct = rows.filter(r => r.getString(0) == r.getString(1)).map(_.getLong(2)).sum
    assert(correct.toDouble / total > 0.5,
      s"self-trained NB should beat a coin flip: $correct/$total")
  }

  // ---- dd_winnowing -----------------------------------------------------

  test("winnowing recovers the same near-dup pairs as minhash-LSH on this corpus") {
    val win = run("dd_winnowing").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = run("dd_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // winnowing (char-gram containment) and minhash (word-shingle
    // jaccard) are different estimators of the same planted dups —
    // demand substantial overlap, not equality
    val inter = win.intersect(mh).size
    assert(inter.toDouble >= 0.8 * mh.size,
      s"winnowing found $inter of ${mh.size} minhash pairs (win=${win.size})")
  }

  test("winnowing pair scores are symmetric containments in (0, 1]") {
    run("dd_winnowing").collect().foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be emitted once, a < b")
      val sim = r.getDouble(3)
      assert(sim > 0.0 && sim <= 1.0 && sim >= 0.5, s"score out of range: $r")
      assert(r.getLong(2) >= 1, "shared fingerprint count must be positive")
    }
  }

  // ---- q_hll_distinct ---------------------------------------------------

  test("HLL estimate is within 20% of the exact distinct count") {
    val r = run("q_hll_distinct").head
    val est = r.getDouble(3)
    val exact = Tables(sc, sfDir, "events")
      .select(countDistinct("user_id")).head.getLong(0).toDouble
    assert(math.abs(est - exact) / exact < 0.2,
      s"HLL(m=64) est=$est exact=$exact — beyond 1.04/√64 by a wide margin")
    assert(r.getLong(0) + r.getLong(1) == 64, "registers must partition m")
  }

  // ---- q_triangle_count -------------------------------------------------

  test("triangle count matches a brute-force recomputation on the support graph") {
    val r = run("q_triangle_count").head
    val (nodes, edges, tri, wedges) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // brute force: adjacency set in driver memory (sf0.001 graph is tiny)
    val op = Tables(sc, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.values.foreach { ps =>
      val v = ps.toSeq.sorted
      for (i <- v.indices; j <- i + 1 until v.size)
        pairCount((v(i), v(j))) = pairCount.getOrElse((v(i), v(j)), 0) + 1
    }
    val und = pairCount.filter(_._2 >= 2).keys.toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    und.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    assert(edges == und.size, s"edge count: got $edges want ${und.size}")
    assert(nodes == adj.keys.size)
    val bruteTri = und.toSeq.map { case (u, v) => adj(u).intersect(adj(v)).size }.sum / 3
    assert(tri == bruteTri, s"triangles: got $tri want $bruteTri")
    assert(wedges == adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum)
  }
}
