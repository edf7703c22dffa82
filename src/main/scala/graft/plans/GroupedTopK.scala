package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.SparkStrategy

/** A whole-operator Catalyst extension (SURVEY.md preference (c)):
  * grouped top-k — for each group, the k rows with the largest value
  * of `order` (ties broken by the smallest `tie`).
  *
  * Spark's native formulation is
  * `row_number().over(Window.partitionBy(g).orderBy(...)) <= k`,
  * which SORTS EVERY GROUP COMPLETELY before discarding all but k
  * rows. This operator keeps a bounded k-row heap per group instead:
  * O(n log k) per partition with O(groups·k) memory and NO sort —
  * at 100 TB the window sort is the dominant cost and the heap path
  * removes it entirely. The exchange on the group key is still
  * required and is declared via `requiredChildDistribution`, so the
  * planner inserts exactly the one shuffle the semantics need.
  *
  * Wiring: logical node → planner Strategy → physical exec, injectable
  * through `SparkSessionExtensions.injectPlannerStrategy` (see
  * [[GroupedTopK.strategy]]) or registered per-session; the public API
  * is [[GroupedTopK.apply]] which works on any live session.
  */
case class GroupedTopKPlan(
    groupCols: Seq[Expression],
    orderCol: Expression, // descending sort value (numeric)
    tieCol: Expression, // ascending tiebreak (long)
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class GroupedTopKExec(
    groupCols: Seq[Expression],
    orderCol: Expression,
    tieCol: Expression,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupExprs = groupCols
    val orderExpr = orderCol
    val tieExpr = tieCol
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val orderBound = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(orderExpr, childOutput)
      val tieBound = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(tieExpr, childOutput)
      // per group: bounded min-heap keyed by (order asc, tie desc) so the
      // heap head is the weakest row currently kept
      val heapOrd = Ordering.by[(Double, Long, UnsafeRow), (Double, Long)] {
        case (o, t, _) => (o, -t)
      }
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[(Double, Long, UnsafeRow)]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(heapOrd.reverse)
          heaps.put(key.copy(), heap)
        }
        val o = orderBound.eval(row) match {
          case d: java.lang.Double => d.doubleValue()
          case l: java.lang.Long => l.doubleValue()
          case i: java.lang.Integer => i.doubleValue()
          case other => other.toString.toDouble
        }
        val t = tieBound.eval(row) match {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
          case other => other.toString.toLong
        }
        if (heap.size < kLocal) {
          heap.enqueue((o, t, row.asInstanceOf[UnsafeRow].copy()))
        } else {
          val (wo, wt, _) = heap.head
          // keep if strictly better than the current weakest:
          // larger order value, or equal order with smaller tie
          if (o > wo || (o == wo && t < wt)) {
            heap.dequeue()
            heap.enqueue((o, t, row.asInstanceOf[UnsafeRow].copy()))
          }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach { h => h.foreach { case (_, _, r) => out += r } }
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object GroupedTopK {

  /** Planner strategy mapping the logical node to the exec. */
  object strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case GroupedTopKPlan(g, o, t, k, child) =>
        GroupedTopKExec(g, o, t, k, planLater(child)) :: Nil
      case _ => Nil
    }
  }

  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Public API: top `k` rows per group of `df`, largest `order` first,
    * ties to the smallest `tie`. Registers the strategy on the live
    * session (idempotent); `SparkSessionExtensions
    * .injectPlannerStrategy(_ => GroupedTopK.strategy)` is the
    * build-time equivalent.
    */
  def apply(df: DataFrame, spark: SparkSession,
      group: Seq[Column], order: Column, tie: Column, k: Int): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(strategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ strategy
    }
    registered.set(true)
    val analyzed = df.queryExecution.analyzed
    def resolve(c: Column): Expression = df.select(c).queryExecution.analyzed
      .expressions.head match {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      case e => e
    }
    val plan = GroupedTopKPlan(
      group.map(resolve), resolve(order), resolve(tie), k, analyzed)
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, plan)
  }
}
