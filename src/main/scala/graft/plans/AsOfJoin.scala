package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join (left outer): for every left row, the single right
  * row with the greatest `rightTime <= leftTime` within the same key —
  * the second whole-operator Catalyst extension (after
  * [[GroupedTopK]]), this one binary.
  *
  * Why a custom exec: Spark's composable formulations either
  * union+window (one sort over BOTH sides together, carrying right
  * payloads through a last(ignoreNulls) window) or range-join+rank
  * (quadratic candidate blowup). The native merge needs one exchange +
  * one sort PER SIDE — declared via requiredChildDistribution /
  * requiredChildOrdering so the planner inserts exactly those — and
  * then a single forward pass that zips the co-partitioned sides with
  * O(1) state per key. That is the textbook time-series join shape at
  * 100 TB: no buffering beyond one match row, no window state, and
  * each side sorted independently (cheaper than sorting the union).
  *
  * Contract: keys and times evaluate to non-null LONGs (the API casts
  * timestamps to epoch micros); equal right times resolve to the
  * largest `rightTie` (making the payload deterministic); right
  * columns are null when no match exists.
  */
case class AsOfJoinPlan(
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKey = leftKey
    val lTime = leftTime
    val rKey = rightKey
    val rTime = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyB = BindReferences.bindReference(lKey, lOut)
      val lTimeB = BindReferences.bindReference(lTime, lOut)
      val rKeyB = BindReferences.bindReference(rKey, rOut)
      val rTimeB = BindReferences.bindReference(rTime, rOut)
      val proj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

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

      var lastMatch: InternalRow = null
      var lastMatchKey = 0L

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow).asInstanceOf[Long]
        val lt = lTimeB.eval(lRow).asInstanceOf[Long]
        // consume right rows that are now or forever behind this left
        // row: keys strictly below lk can never match again (left is
        // key-ascending), and same-key rows with time <= lt become the
        // current candidate (later rows overwrite — ties resolve to the
        // last in (time, tie) order)
        while (rCur != null &&
          (rCurKey < lk || (rCurKey == lk && rCurTime <= lt))) {
          if (rCurKey == lk) {
            lastMatch = rCur.copy()
            lastMatchKey = lk
          }
          advance()
        }
        val rSide =
          if (lastMatch != null && lastMatchKey == lk) lastMatch else nullRight
        proj(joined(lRow, rSide))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Planner strategy mapping the logical node to the exec. */
  object strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(lk, lt, rk, rt, tie, l, r) =>
        AsOfJoinExec(lk, lt, rk, rt, tie, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Public API: as-of join `left` to `right` on long-typed key and
    * time expressions (cast timestamps with `unix_micros` at the call
    * site). Right columns come back null when no right row precedes.
    */
  def apply(left: DataFrame, right: DataFrame, spark: SparkSession,
      leftKey: Column, leftTime: Column,
      rightKey: Column, rightTime: Column, rightTie: Column): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(strategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ strategy
    }
    def resolve(df: DataFrame)(c: Column): Expression =
      df.select(c).queryExecution.analyzed.expressions.head match {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
        case e => e
      }
    val plan = AsOfJoinPlan(
      resolve(left)(leftKey), resolve(left)(leftTime),
      resolve(right)(rightKey), resolve(right)(rightTime), resolve(right)(rightTie),
      left.queryExecution.analyzed, right.queryExecution.analyzed)
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, plan)
  }
}
