package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** PageRank + inverted-index invariants (complementing the exact
  * DuckDB oracles with properties a correct implementation must hold).
  */
class RankIndexSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(sc, sfDir)

  test("pagerank mass is conserved and ranks are partitioning-invariant") {
    val top = run("q_pagerank").collect()
    assert(top.length == 50)
    // ranks descend with the declared tiebreak
    top.sliding(2).foreach { case Array(a, b) =>
      val (pa, pb) = (a.getDouble(2), b.getDouble(2))
      assert(pa > pb || (pa == pb && a.getLong(0) < b.getLong(0)))
    }
    // every rank sits inside the theoretical band [0.15/N, 1]
    top.foreach(r => assert(r.getDouble(2) > 0 && r.getDouble(2) < 1))
    // deterministic across independent runs (quantized contributions)
    val again = run("q_pagerank").collect()
    assert(top.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getDouble(2))).toSeq)
  }

  test("pagerank favors high-degree parts overall") {
    val meanDegTop = run("q_pagerank").agg(avg("degree")).head.getDouble(0)
    val li = Tables(sc, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val meanDegAll = li.as("a").join(li.as("b"), Seq("ok"))
      .where(col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst")).distinct()
      .groupBy("src").count().agg(avg("count")).head.getDouble(0)
    assert(meanDegTop > meanDegAll,
      s"top-50 mean degree $meanDegTop should exceed graph mean $meanDegAll")
  }

  test("keep-best keeps exactly one representative per component, the longest") {
    val rows = run("dd_keep_best").collect()
    val byComp = rows.groupBy(_.getLong(1))
    byComp.foreach { case (comp, members) =>
      val kept = members.filter(_.getBoolean(3))
      assert(kept.length == 1, s"component $comp kept ${kept.length}")
      val best = kept.head
      members.foreach { m =>
        assert(m.getLong(2) < best.getLong(2) ||
          (m.getLong(2) == best.getLong(2) && m.getLong(0) >= best.getLong(0)),
          s"member ${m.getLong(0)} dominates the representative in $comp")
      }
    }
    // verdict rows cover exactly the docs dd_components labels
    assert(rows.length == run("dd_components").count())
  }

  test("collocation PMI is symmetric in formulation and bounded by counts") {
    val rows = run("ta_collocations").collect()
    assert(rows.length == 50)
    rows.foreach { r => assert(r.getLong(2) >= 5, "min support violated") }
    // descending by pmi with declared tiebreaks
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) >= b.getDouble(3))
    }
  }

  test("entropy is bounded by ln(vocab) and positive for mixed sources") {
    run("q_entropy").collect().foreach { r =>
      val vocab = r.getLong(1); val h = r.getDouble(3)
      assert(h > 0 && h <= math.log(vocab.toDouble) + 1e-9,
        s"source ${r.getString(0)}: H=$h vocab=$vocab")
    }
  }

  test("BPE training learns applicable merges and is deterministic") {
    val merges = run("ta_bpe_train").collect()
    assert(merges.length == 4)
    assert(merges.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    merges.foreach { m =>
      assert(m.getString(1).nonEmpty && m.getString(2).nonEmpty)
      assert(m.getLong(3) > 0)
    }
    // step-k merge can only pair pieces formable after steps 1..k-1:
    // each side is either a single char or a previously-merged piece
    val known = scala.collection.mutable.Set[String]()
    merges.foreach { m =>
      Seq(m.getString(1), m.getString(2)).foreach(p =>
        assert(p.length == 1 || known.contains(p), s"piece $p unformable"))
      known += m.getString(1) + m.getString(2)
    }
    val again = run("ta_bpe_train").collect()
    assert(merges.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("feature hashing conserves token mass within the slot range") {
    val rows = run("q_feature_hash").collect()
    val total = Tables(sc, sfDir, "documents")
      .select(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == total)
    rows.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < 64))
  }

  test("inverted index df/cf/postings are consistent with the corpus") {
    val rows = run("ta_inverted_index").collect()
    val nDocs = Tables(sc, sfDir, "documents").count()
    val totalTokens = Tables(sc, sfDir, "documents")
      .select(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalTokens,
      "Σcf must equal the corpus token count")
    rows.foreach { r =>
      val df = r.getLong(1); val cf = r.getLong(2)
      // postings are serialized to a comma-joined string (harness-hashable)
      val postings = r.getString(3).split(",").filter(_.nonEmpty).map(_.toLong).toSeq
      assert(df <= nDocs && cf >= df)
      assert(postings.length == math.min(df, 10L).toInt)
      assert(postings == postings.sorted, "postings must be sorted")
    }
  }
}
