package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusPrepOps

/** Semantics tests for the pretraining-objective prep operators. */
class CorpusPrepSpec extends SparkSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("ta_code_detect: per-source counts partition the corpus, flags bounded") {
    val rows = CorpusPrepOps.taCodeDetect(sc, sf001).collect()
    assert(rows.length == 20)
    val docs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == docs)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 0) // non-negative score mass
    }
  }

  test("q_span_corrupt: sentinels pair between input and target; masked tokens round-trip") {
    val rows = CorpusPrepOps.qSpanCorrupt(sc, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSpans, nMasked) = (r.getLong(1), r.getLong(2))
      val input = r.getString(3).split(" ")
      val target = r.getString(4).split(" ")
      val inSent = input.filter(_.startsWith("<extra_id_"))
      val tgtSent = target.filter(_.startsWith("<extra_id_"))
      // every span appears exactly once as a sentinel on both sides
      assert(inSent.length == nSpans, s"doc ${r.getLong(0)}: input sentinels")
      assert(tgtSent.length == nSpans, s"doc ${r.getLong(0)}: target sentinels")
      assert(inSent.toSet == tgtSent.toSet)
      // the target carries exactly the masked tokens plus sentinels
      assert(target.length == nMasked + nSpans,
        s"doc ${r.getLong(0)}: target length ${target.length} != $nMasked + $nSpans")
      // token conservation: input non-sentinels + masked = original count
      val orig = spark.read.parquet(s"$sf001/documents.parquet")
        .where(col("doc_id") === r.getLong(0))
        .select(size(split(col("text"), " "))).head().getInt(0)
      assert((input.length - inSent.length) + nMasked == orig,
        s"doc ${r.getLong(0)}: token conservation")
    }
  }
}
