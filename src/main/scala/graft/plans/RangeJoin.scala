package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native banded range (interval) join — the third whole-operator
  * Catalyst extension (after [[GroupedTopK]] and [[AsOfJoin]]): for
  * every left row, every right row in the same key whose time falls in
  * `(leftTime + loExcl, leftTime + hiIncl]` — the "events within W
  * after the trigger" shape (`q_range_join`'s purchase→error window).
  *
  * Why a custom exec: Spark plans the equi+range predicate as a
  * SortMergeJoin on the key with the range as a POST-JOIN filter, so a
  * hot key k emits |L_k|·|R_k| pairs before filtering — quadratic in
  * the hot key's size no matter how narrow the window is. The native
  * merge sorts each side once per key (declared via
  * requiredChildDistribution / requiredChildOrdering, so the planner
  * inserts exactly one exchange + one sort per side) and streams a
  * sliding window: right rows enter a FIFO when they pass the current
  * left's upper bound and leave it when the lower bound overtakes them,
  * so per-key work is |L_k| + |R_k| + |output| and peak memory is the
  * densest single window, not the key's row count. That is the plan a
  * 100 TB time-range join needs under key skew.
  *
  * Contract: keys and times evaluate to non-null LONGs (cast
  * timestamps with `unix_micros` at the call site); output order
  * within a partition is (leftKey, leftTime) — queries put their own
  * ORDER BY on top. Inner join: lefts with no window match emit
  * nothing.
  */
case class RangeJoinPlan(
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    loExcl: Long, hiIncl: Long,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class RangeJoinExec(
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    loExcl: Long, hiIncl: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKey = leftKey
    val lTime = leftTime
    val rKey = rightKey
    val rTime = rightTime
    val lo = loExcl
    val hi = hiIncl
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyB = BindReferences.bindReference(lKey, lOut)
      val lTimeB = BindReferences.bindReference(lTime, lOut)
      val rKeyB = BindReferences.bindReference(rKey, rOut)
      val rTimeB = BindReferences.bindReference(rTime, rOut)
      val proj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val joined = new JoinedRow

      // one-row lookahead over the right side
      var rCur: InternalRow = null
      var rCurKey = 0L
      var rCurTime = 0L
      def advance(): Unit =
        if (rIter.hasNext) {
          rCur = rIter.next()
          rCurKey = rKeyB.eval(rCur).asInstanceOf[Long]
          rCurTime = rTimeB.eval(rCur).asInstanceOf[Long]
        } else rCur = null
      advance()

      // sliding window of right rows for the current key: everything
      // pulled from rIter with time <= current left's hi bound, minus
      // rows the lo bound has overtaken. Bounded by the densest single
      // (hi - lo) window on this key — never by the key's row count.
      val win = new java.util.ArrayDeque[(Long, InternalRow)]()
      var winKey = Long.MinValue

      lIter.flatMap { lRow =>
        val lk = lKeyB.eval(lRow).asInstanceOf[Long]
        val lt = lTimeB.eval(lRow).asInstanceOf[Long]
        if (lk != winKey) { win.clear(); winKey = lk }
        // right keys strictly below lk can never match again (left is
        // key-ascending) — discard without buffering
        while (rCur != null && rCurKey < lk) advance()
        // pull this key's rows up to the upper bound into the window
        while (rCur != null && rCurKey == lk && rCurTime <= lt + hi) {
          win.addLast((rCurTime, rCur.copy()))
          advance()
        }
        // evict rows the lower bound has passed (times ascend, so the
        // stale prefix is contiguous)
        while (!win.isEmpty && win.peekFirst()._1 <= lt + lo) win.removeFirst()
        // everything remaining is in (lt + lo, lt + hi]. The projected
        // rows share proj's buffer — the standard exec-iterator
        // contract (consumers that buffer must copy), same as AsOfJoin.
        val lCopy = lRow.copy()
        val it = win.iterator()
        new Iterator[InternalRow] {
          override def hasNext: Boolean = it.hasNext
          override def next(): InternalRow = proj(joined(lCopy, it.next()._2))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object RangeJoin {

  /** Planner strategy mapping the logical node to the exec. */
  object strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case RangeJoinPlan(lk, lt, rk, rt, lo, hi, l, r) =>
        RangeJoinExec(lk, lt, rk, rt, lo, hi, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Public API: inner-join `left` to `right` on equal long keys with
    * `rightTime` in `(leftTime + loExcl, leftTime + hiIncl]` (cast
    * timestamps with `unix_micros` at the call site).
    */
  def apply(left: DataFrame, right: DataFrame, spark: SparkSession,
      leftKey: Column, leftTime: Column,
      rightKey: Column, rightTime: Column,
      loExcl: Long, hiIncl: Long): DataFrame = {
    require(loExcl < hiIncl, s"empty range window: ($loExcl, $hiIncl]")
    if (!spark.experimental.extraStrategies.contains(strategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ strategy
    }
    def resolve(df: DataFrame)(c: Column): Expression =
      df.select(c).queryExecution.analyzed.expressions.head match {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
        case e => e
      }
    val plan = RangeJoinPlan(
      resolve(left)(leftKey), resolve(left)(leftTime),
      resolve(right)(rightKey), resolve(right)(rightTime),
      loExcl, hiIncl,
      left.queryExecution.analyzed, right.queryExecution.analyzed)
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, plan)
  }
}
