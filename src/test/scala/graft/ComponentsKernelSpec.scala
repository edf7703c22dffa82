package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, GraphOps}

/** The two connected-component kernels behind dd_components'
  * edge-count gate must be interchangeable: identical (doc_id, lbl)
  * output on the real near-dup pair graph AND on adversarial shapes
  * (long chain, high-degree star, singleton pairs) that stress the
  * respective weak spots — chain diameter for propagation, degree skew
  * for the star ops.
  */
class ComponentsKernelSpec extends SparkSuite {

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("alternating large/small-star equals label propagation on the sf pair graph") {
    val pairs = DedupOps.verifiedPairs(sc, sfDir).cache()
    val prop = labelsOf(GraphOps.propagationLabels(pairs))
    val alt = labelsOf(GraphOps.alternatingLabels(pairs))
    assert(prop.nonEmpty)
    assert(alt == prop)
  }

  test("alternating kernel: chain, star, and disjoint pairs") {
    val s = sc
    import s.implicits._
    // chain 10-9-...-1, star 100-{101..120}, pair (200, 201)
    val chain = (1L until 10L).map(i => (i + 1, i))
    val star = (101L to 120L).map(i => (100L, i))
    val pair = Seq((200L, 201L))
    val pairs = (chain ++ star ++ pair).toDF("a", "b")
    val got = labelsOf(GraphOps.alternatingLabels(pairs))
    (1L to 10L).foreach(n => assert(got(n) == 1L, s"chain node $n"))
    (100L to 120L).foreach(n => assert(got(n) == 100L, s"star node $n"))
    assert(got(200L) == 200L && got(201L) == 200L)
    assert(got.size == 10 + 21 + 2)
    // propagation agrees on the same adversarial graph
    assert(labelsOf(GraphOps.propagationLabels(pairs)) == got)
  }

  test("alternating kernel: empty pair graph yields no labels") {
    val s = sc
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraphOps.alternatingLabels(empty).isEmpty)
  }
}
