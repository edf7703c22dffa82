package graft

import graft.operators.CurationOps

/** The NB langid language-count gate (CurationOps.FanOutLangCap): the
  * fan-out shape wins at this corpus's 5 languages, the pivoted
  * score-vector shape is the 100+-language scale path. Both must
  * produce bit-identical output (the 2^30 quantization makes them
  * algebraically interchangeable), and each must plan as its own
  * shape: the fan-out carries the ×|langs| broadcast-nested-loop
  * fan-out of the fact relation, the vector path must NOT (it streams
  * the facts once through a broadcast-hash join).
  */
class NbLangidShapeSpec extends SparkSuite {

  private val CapKey = "spark.graft.langid.fanoutLangCap"

  private def withCap[A](cap: Option[Int])(body: => A): A = {
    cap.foreach(c => sc.conf.set(CapKey, c.toString))
    try body finally sc.conf.unset(CapKey)
  }

  test("score-vector path is bit-identical to the fan-out path") {
    val fanOut = withCap(None)(CurationOps.taNbLangid(sc, sfDir).collect())
    val vector = withCap(Some(0))(CurationOps.taNbLangid(sc, sfDir).collect())
    assert(fanOut.nonEmpty)
    assert(fanOut.toSeq == vector.toSeq)
  }

  test("each gate branch plans as its own shape") {
    val fanOutPlan = withCap(None)(
      CurationOps.taNbLangid(sc, sfDir).queryExecution.executedPlan.toString)
    val vectorPlan = withCap(Some(0))(
      CurationOps.taNbLangid(sc, sfDir).queryExecution.executedPlan.toString)
    // the fan-out's crossJoin(broadcast(langs)) is a nested-loop
    // broadcast; the vector path must have none — its only fact-side
    // join is the broadcast-hash probe of the pivoted model
    assert(fanOutPlan.contains("BroadcastNestedLoopJoin"), fanOutPlan)
    assert(!vectorPlan.contains("BroadcastNestedLoopJoin"), vectorPlan)
    assert(vectorPlan.contains("lq_0"), vectorPlan)
  }
}
