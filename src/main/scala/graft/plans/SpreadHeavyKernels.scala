package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Levenshtein}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.functions.GraftExpressions.{CdcChunks, DelNeighborhoodExpr,
  DistSq, DotProduct, DotProductF, L2NormSq, L2NormSqF, PrefixChainHashes,
  ShingleHashesExpr, TrigramCountsExpr, WinnowFingerprints, WordPieceTokens}

/** Planning-time promotion of the NOTES #27 rule: a per-row
  * compute-heavy kernel (the shared inventory in the companion — from
  * the quadratic deletion-neighborhood expansion down to the
  * d-multiply-add vector kernels) evaluated directly over a byte-small
  * input runs at raw file-split parallelism (1-2 tasks for a dimension
  * table), so the multiplied workload lands on a fraction of the
  * cluster. Operators used to hand-place
  * `.repartition(defaultParallelism)` below each such kernel
  * (`LinkageOps` r8-r9); this rule inserts the same round-robin spread
  * mechanically whenever a node evaluates a heavy kernel and the input
  * below it is NARROW — where narrow means, walking down from the
  * kernel:
  *
  *  - projections/filters/generators only, ending in a leaf (file
  *    scan, local relation, or CACHED relation) whose estimated split
  *    or partition count is below the session parallelism, or
  *  - a PROBABLE broadcast join (hint first, then size stats with
  *    `JoinSelection`'s exact tie-breaking — equal sizes build right)
  *    whose STREAMED side is narrow by the same test; the spread then
  *    lands on that streamed side, never the build side.
  *
  * Shuffle joins and aggregates below the kernel already decided the
  * parallelism and terminate the walk; so does any LIMIT without a
  * global sort above the kernel (spreading beneath an unordered limit
  * shuffles input that is about to be truncated AND changes which rows
  * the limit samples). The width test is SCALE-ADAPTIVE by
  * construction: a 100 TB scan estimates thousands of splits and is
  * never touched; the spread fires exactly when the input is too small
  * to feed every core, which is when the kernel-over-narrow-input
  * pathology exists. `PlanAuditSpec`'s path-aware gate audits the same
  * contract over the whole registry under the full-suite cache state.
  *
  * Runs once per query (injected via `injectPreCBORule` from
  * [[graft.functions.GraftExtensions]], or the session's
  * `experimental.extraOptimizations` on the runtime-registration
  * path — both sit after the operator-optimization fixpoint, so
  * predicate pushdown cannot re-sink a heavy filter beneath the
  * inserted exchange and re-trigger the rule). Idempotent: the
  * inserted `Repartition(shuffle = true)` makes its subtree wide, so
  * a second pass leaves the plan unchanged.
  */
case class SpreadHeavyKernels(session: SparkSession) extends Rule[LogicalPlan] {

  private def isHeavy(e: Expression): Boolean =
    e.exists(SpreadHeavyKernels.isHeavyKernel)

  private def targetPartitions: Int =
    math.max(session.sparkContext.defaultParallelism,
      session.sessionState.conf.numShufflePartitions)

  /** Estimated file-split count of a leaf, from its size statistics —
    * mirrors `FilePartition` byte-based packing closely enough for a
    * threshold test (tiny dimension files land at 1-2 either way; a
    * warehouse-scale scan lands at thousands either way).
    */
  private def estimatedSplits(leaf: LeafNode): Long = leaf match {
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          val maxSplit = math.max(1L, session.sessionState.conf.filesMaxPartitionBytes)
          math.max(1L, (fs.location.sizeInBytes + maxSplit - 1) / maxSplit)
        case _ => Long.MaxValue // non-file relations: assume wide, don't touch
      }
    case _: LocalRelation => 1L
    // a cached relation runs at its CACHED plan's partition count — a
    // cache of a 1-split scan is 1 partition forever, so treating it as
    // "wide, don't touch" (the r10 behavior) let kernel-over-cached-scan
    // compositions keep raw parallelism exactly when another query had
    // cached the shared relation first (session-order-dependent plans —
    // caught by the full-suite PlanAuditSpec run, invisible in isolation)
    case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
      math.max(1L, imr.cachedPlan.outputPartitioning.numPartitions.toLong)
    case _ => Long.MaxValue // RDD scans, ranges, streaming sources: leave alone
  }

  /** True when the subtree is narrow ops only over leaves that are all
    * estimated below the parallelism target — i.e. inserting a spread
    * is both safe (no shuffle below to respect) and useful.
    */
  private def narrowToSmallScan(p: LogicalPlan): Boolean = p match {
    case leaf: LeafNode => estimatedSplits(leaf) < targetPartitions
    case _: Project | _: Filter | _: Generate | _: SubqueryAlias =>
      p.children.forall(narrowToSmallScan)
    case _ => false // joins, aggregates, exchanges, unions: out of scope
  }

  /** Which side of a join will (probably) be broadcast: an explicit
    * hint decides outright; otherwise the smaller side under the
    * session's auto-broadcast threshold. `None` = neither (a shuffle
    * join, which redistributes by construction).
    */
  private def probableBuildLeft(j: Join): Option[Boolean] = {
    def hinted(h: Option[HintInfo]) = h.exists(_.strategy.contains(BROADCAST))
    if (hinted(j.hint.leftHint)) Some(true)
    else if (hinted(j.hint.rightHint)) Some(false)
    else {
      val thr = session.sessionState.conf.autoBroadcastJoinThreshold
      val (l, r) = (j.left.stats.sizeInBytes, j.right.stats.sizeInBytes)
      if (thr < 0) None
      // mirror JoinSelection's getSmallerSide exactly, TIES INCLUDED:
      // equal sizes build RIGHT (a self-join on a cached relation has
      // byte-identical stats, and guessing the other side spreads the
      // build input while the streamed side keeps raw parallelism)
      else if (r <= thr && r <= l) Some(false)
      else if (l <= thr) Some(true)
      else None
    }
  }

  /** Insert the spread at the right depth below a heavy-kernel node:
    * directly, when the whole subtree is narrow over a small scan; or
    * on the STREAMED side of a probable broadcast join (descending
    * through narrow ops), since a broadcast join preserves its streamed
    * input's partitioning — the r10 rule stopped at the first join and
    * left kernel-over-broadcast-join compositions (the ann_pq /
    * dd_embed_cosine shape) at raw scan parallelism. Build sides are
    * never touched (a spread below a BroadcastExchange is pure waste),
    * and aggregates/exchanges terminate the descent because they
    * already redistribute.
    */
  private def spread(p: LogicalPlan): LogicalPlan = p match {
    case _ if narrowToSmallScan(p) =>
      Repartition(targetPartitions, shuffle = true, p)
    case j: Join =>
      probableBuildLeft(j) match {
        case Some(true) => j.copy(right = spread(j.right))
        case Some(false) => j.copy(left = spread(j.left))
        case None => j
      }
    case _: Project | _: Filter | _: Generate | _: SubqueryAlias =>
      p.withNewChildren(p.children.map(spread))
    case _ => p
  }

  /** Bottom-up rewrite with an unordered-limit guard: `LimitPushDown`
    * sinks projections beneath `LocalLimit`, so a heavy kernel can sit
    * directly over a scan that is about to be TRUNCATED — spreading
    * there is pure waste (shuffle everything, keep 50 rows) and, worse,
    * changes WHICH rows the unordered limit samples (round-robin order
    * replaces scan order; caught by a bit-identity spec sampling
    * `limit(50)` two ways). An ORDERED limit (`LocalLimit(Sort(...))`,
    * the top-k shape) is deterministic whatever the partitioning, and
    * the kernels beneath it are the expensive part — those still
    * spread.
    */
  /** True when the limit's input carries a global sort — possibly
    * behind pruning projections (`Project(Sort(...))` is how column
    * pruning leaves the top-k shape). Ordered ⇒ deterministic result
    * whatever the partitioning below.
    */
  @annotation.tailrec
  private def orderedBelow(p: LogicalPlan): Boolean = p match {
    case s: Sort => s.global
    case _: Project | _: SubqueryAlias => orderedBelow(p.children.head)
    case _ => false
  }

  private def rewrite(p: LogicalPlan, underLimit: Boolean): LogicalPlan = {
    val under = underLimit || (p match {
      case l: LocalLimit => !orderedBelow(l.child)
      case _ => false
    })
    val q = p.withNewChildren(p.children.map(rewrite(_, under)))
    if (!under && q.children.nonEmpty && q.expressions.exists(isHeavy))
      q.withNewChildren(q.children.map(spread))
    else q
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (plan.isStreaming) return plan // stateful queries own their distribution
    rewrite(plan, underLimit = false)
  }
}

object SpreadHeavyKernels {

  /** THE heavy-kernel inventory — the single list shared by the rule
    * above and `PlanAuditSpec`'s gates, so a kernel added to
    * `GraftExpressions` shows up in both or in neither (the r10 gap:
    * the rule knew 2 of the 8 shipped per-row compute kernels, so a
    * winnow/wordpiece/CDC query over a byte-small scan could re-create
    * the NOTES #27 pathology with neither the rule nor the gate
    * firing). Two tiers, one list:
    *
    *  - quadratic in value length: [[DelNeighborhoodExpr]] (n²/2
    *    variants × n-char hashes), [[Levenshtein]] (n·m DP);
    *  - linear per char/element but with a large constant and often a
    *    multiplying array output: [[WinnowFingerprints]] (k-gram hash +
    *    window minima), [[ShingleHashesExpr]], [[TrigramCountsExpr]],
    *    [[WordPieceTokens]] (longest-match inner loop),
    *    [[CdcChunks]] (rolling hash), [[PrefixChainHashes]] (one md5
    *    per 16-token block, multiplying array output — the KV-audit
    *    kernel, built as an expression partly SO this list can see it;
    *    its builtin predecessor was invisible here, VERDICT r12 §1),
    *    and the vector kernels
    *    [[DotProductF]]/[[L2NormSqF]] plus their generic float/double
    *    twins [[DotProduct]]/[[L2NormSq]]/[[DistSq]] (d multiply-adds
    *    per row — d is 64-1536 in practice).
    *
    * Both tiers deserve the spread: the rule only ever fires when the
    * scan below is estimated too narrow to feed every core, and in that
    * regime per-row kernel cost dominates the one extra exchange of a
    * byte-small input regardless of tier.
    */
  private[graft] val isHeavyKernel: Expression => Boolean = {
    case _: DelNeighborhoodExpr | _: Levenshtein | _: WinnowFingerprints |
         _: ShingleHashesExpr | _: TrigramCountsExpr | _: WordPieceTokens |
         _: CdcChunks | _: PrefixChainHashes | _: DotProductF | _: L2NormSqF |
         _: DotProduct | _: L2NormSq | _: DistSq => true
    case _ => false
  }

  /** Idempotent runtime registration (mirrors the planner strategies'
    * `register` pattern — the driver builds a plain session, so the
    * extensions path isn't available there).
    */
  def register(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[SpreadHeavyKernels]))
      spark.experimental.extraOptimizations = cur :+ SpreadHeavyKernels(spark)
  }
}
