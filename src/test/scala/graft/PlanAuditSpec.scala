package graft

/** Plan-shape gates for the round-3 additions (PlanSpec covers the
  * earlier waves): broadcasts where intended, lineage truncation where
  * required. Failures here mean a physical regression even if results
  * still match.
  */
class PlanAuditSpec extends SparkSuite {

  private def plan(n: String): String =
    SparkEntry.queries(n)(sc, sfDir).queryExecution.executedPlan.toString

  test("ann_sq8 broadcasts stats, query coords, and query vector") {
    assert("BroadcastHashJoin".r.findAllIn(plan("ann_sq8")).length >= 2)
  }

  test("ta_tfidf broadcasts the corpus-count scalar") {
    assert(plan("ta_tfidf").contains("BroadcastNestedLoopJoin") ||
      plan("ta_tfidf").contains("BroadcastHashJoin"))
  }

  test("dd_components truncates the iterative lineage") {
    // localCheckpoint per round: the final plan must be a scan of the
    // checkpointed labels, not the k-round join tree (which would grow
    // exponentially with rounds)
    val p = plan("dd_components")
    assert(!p.contains("Join"), p.take(1200))
    assert(p.contains("Scan ExistingRDD"), p.take(1200))
  }

  test("q_gap_fill joins the spine without shuffling it") {
    assert("BroadcastHashJoin".r.findAllIn(plan("q_gap_fill")).length +
      "BroadcastNestedLoopJoin".r.findAllIn(plan("q_gap_fill")).length >= 1)
  }

  test("q_bucketed_join joins bucket-aligned scans with no exchange below the join") {
    val df = SparkEntry.queries("q_bucketed_join")(sc, sfDir)
    df.collect() // force table creation + final (AQE) plan
    // structural audit of the AQE-final plan (dump parsing is brittle
    // across Spark versions — ADVICE r14)
    val nodes = PlanAuditSpec.collectFinalPlan(df.queryExecution.executedPlan)
    val smj = nodes.collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.getOrElse(fail(s"no SortMergeJoin: ${nodes.map(_.nodeName).mkString(", ")}"))
    // below the join: only bucketed scans, no Exchange (the bucketing
    // IS the partitioning — the whole point of paying the bucketed
    // write once)
    val below = PlanAuditSpec.collectFinalPlan(smj).drop(1)
    assert(!below.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]),
      below.map(_.nodeName).mkString(", "))
    assert(below.exists {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.bucketedScan
      case _ => false
    }, below.map(_.nodeName).mkString(", "))
  }

  test("dd_simhash band join never degenerates to a cartesian") {
    val p = plan("dd_simhash")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("dd_embed_cosine is a blocked equi-join, no cartesian, no RDD collect shape") {
    val p = plan("dd_embed_cosine")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // the old driver-collect kernel surfaced as Scan ExistingRDD
    assert(!p.contains("Scan ExistingRDD"), p.take(1200))
  }

  test("q_seq_mining joins per-type aggregates, never raw events") {
    // the pair join must run on the checkpointed (user, win, type)
    // relation — a cartesian or a join with the events scan below it
    // means the collapse-before-join contract broke
    val p = plan("q_seq_mining")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    val joinIdx = p.indexOf("SortMergeJoin") max p.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0, p.take(1200))
    assert(!p.substring(joinIdx).contains("Scan parquet"), p.substring(joinIdx).take(1500))
  }

  test("ta_rake broadcasts the vocabulary-sized word-score table") {
    assert(plan("ta_rake").contains("BroadcastHashJoin"), plan("ta_rake").take(1200))
  }

  test("ta_wordpiece tokenizes inside the scan projection — no per-position relation") {
    val p = plan("ta_wordpiece")
    // exactly one Generate (the piece explode); the kernel call itself
    // is a projection expression, so no join/extra shuffle beyond the
    // two aggregates
    assert("Generate".r.findAllIn(p).length == 1, p.take(1200))
    assert(!p.contains("Join"), p.take(1200))
  }

  test("q_knn_ivf candidate generation is a hash join on the cell id") {
    val p = plan("q_knn_ivf")
    // the only nested-loop product allowed is queries × centroids (a
    // broadcast of the tiny centroid table); the corpus side must meet
    // probes through an equi-join
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p.take(1200))
  }

  test("q_dq_checks folds all scalar checks into one scan per table") {
    val p = plan("q_dq_checks")
    def scans(t: String): Int = s"$t\\.parquet".r.findAllIn(p).length
    // lineitem: stats pass + fk probe side; orders: stats pass + fk
    // build side + its own fk probe; events: stats only. A regression
    // to one-aggregate-per-check would double these.
    assert(scans("lineitem") <= 2, s"lineitem scanned ${scans("lineitem")}x")
    assert(scans("orders") <= 3, s"orders scanned ${scans("orders")}x")
    assert(scans("events") == 1, s"events scanned ${scans("events")}x")
  }

  test("grouped top-k promotions run through GroupedTopKExec, not a window sort") {
    // q_item_cf's peer cut, q_changepoint's per-series argmax and
    // ta_pipeline's keep-first dedup all replaced their per-group
    // window sort with the bounded-heap operator; the only window
    // allowed afterwards is q_item_cf's rank over the ≤k-per-group
    // result
    Seq("q_item_cf", "q_changepoint", "ta_pipeline").foreach { q =>
      assert(plan(q).contains("GroupedTopK"), s"$q lost its heap operator")
    }
    assert(!plan("q_changepoint").contains("RunningWindowFunction"))
  }

  test("MoE routing: in-row logits keep load-balance and churn shuffle-free on token keys") {
    // the wave's scale claim (COVERAGE r13): all 8 expert logits, the
    // argmax and the layer path are higher-order-function arrays per
    // row, so these two queries reach dimension-sized aggregates with
    // NO exchange keyed on the token stream (event_id / user_id) — a
    // regression to a per-(token, expert) window or join would show up
    // here before it showed up in a bench
    for (q <- Seq("q_moe_load_balance", "q_moe_routing_churn")) {
      val p = plan(q)
      assert(!p.contains("hashpartitioning(event_id"), s"$q: ${p.take(800)}")
      assert(!p.contains("hashpartitioning(user_id"), s"$q: ${p.take(800)}")
    }
  }

  test("MoE load balance: aux fold and final join share ONE token scan via exchange reuse") {
    // perExpert feeds both consumers without a materialization
    // boundary; the single data-sized scan relies on AQE deduplicating
    // the identical agg exchanges. If reuse stopped firing the token
    // pipeline would silently run twice — this pins the ReusedExchange
    // in the EXECUTED plan (reuse is runtime-only, invisible in
    // sparkPlan). The structural alternative (localCheckpoint) measured
    // 3x slower end-to-end, hence a gate instead of a plan node.
    // Collected STRUCTURALLY (walking AQE's final plan through query
    // stages), not by parsing the plan dump — the rendered string's
    // AQE sections change across Spark versions (ADVICE r14).
    val df = SparkEntry.queries("q_moe_load_balance")(sc, sfDir)
    df.collect() // force the AQE-final plan
    val nodes = PlanAuditSpec.collectFinalPlan(df.queryExecution.executedPlan)
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ReusedExchangeExec]),
      nodes.map(_.nodeName).mkString(", "))
    val eventScans = nodes.count {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains("events.parquet"))
      case _ => false
    }
    assert(eventScans <= 1, s"token scan duplicated: $eventScans events scans")
  }

  test("MoE capacity drops: both windows ride the one (batch, layer) exchange") {
    val p = plan("q_moe_capacity_drops")
    // exactly one data-sized exchange — the per-expert ranking window
    // (user, layer, expert) must reuse the batch-count window's
    // (user, layer) clustering (hash keys ⊆ clustering keys), never
    // add its own
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      p.take(1200))
    assert("Window \\[".r.findAllIn(p).length == 2, p.take(1200))
  }

  test("registry-wide: no single-partition window over a non-aggregated input") {
    // A WindowExec with an empty partitionSpec moves its WHOLE input to
    // one partition. That is acceptable only when the input is a
    // value-level relation — per-distinct-value histogram counts,
    // bucket grids, replicate means — whose cardinality is bounded by
    // a value domain, not the corpus row count. Heuristic: every leaf
    // of the window's input subtree must sit below an aggregation
    // inside that subtree (the corpus collapsed before the window).
    // This is the gate against the r6 q_auc/q_calibration/q_rfm
    // anti-pattern: a global rank/ntile over a relation that grows
    // with the data.
    import org.apache.spark.sql.execution.{GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    def bounded(p: SparkPlan): Boolean = p match {
      case _: BaseAggregateExec => true        // value-level histogram/grid
      case _: GlobalLimitExec => true          // top-k result
      case _: TakeOrderedAndProjectExec => true
      // per-group top-k: output is k·|groups|; every registered use
      // groups by the bounded query/sample set, not the corpus
      case _: graft.plans.GroupedTopKExec => true
      case leaf if leaf.children.isEmpty => false
      case other => other.children.forall(bounded)
    }
    val failedToPlan = scala.collection.mutable.ListBuffer[String]()
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(sc, sfDir).queryExecution.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
            s"$name: partition-less WindowExec over non-aggregated input"
        }
      } catch { case e: Throwable =>
        failedToPlan += s"$name: ${e.getClass.getSimpleName}"; Nil
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
    assert(failedToPlan.isEmpty, s"queries that failed to plan: $failedToPlan")
  }

  test("registry-wide: compute-heavy work above a broadcast join runs at shuffled parallelism") {
    // The NOTES #27 failure class, promoted from a hand-placed rule to
    // a mechanical gate: a broadcast join's STREAMED side keeps the
    // partitioning of its input, so when that input is a byte-small
    // file scan (1-2 splits) and the join's output feeds a per-row
    // compute bomb (levenshtein DP, deletion-neighborhood expansion),
    // the whole multiplied workload lands on < defaultParallelism
    // tasks — q_entity_resolve ran 47 s that way at sf0.1. The gate:
    // any node evaluating a heavy kernel with a broadcast join below
    // it must have a real redistribution (shuffle exchange, aggregate,
    // or checkpoint scan — anything that resets partitioning to
    // shuffle.partitions) somewhere on the STREAMED path of that join.
    // Shuffle-based joins (SMJ/SHJ) redistribute by construction and
    // need no check. The kernel list is SpreadHeavyKernels' own — one
    // shared inventory (r11), so a kernel added to GraftExpressions is
    // covered by the rule and this gate together or flagged by neither.
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    import graft.plans.SpreadHeavyKernels

    def heavyExpr(e: Expression): Boolean =
      e.exists(SpreadHeavyKernels.isHeavyKernel)
    def hasHeavy(n: SparkPlan): Boolean = n.expressions.exists(heavyExpr)

    // The kernel's parallelism is its input's OUTPUT PARTITIONING, so
    // walk only the partitioning-determining path: stop at anything
    // that redistributes (exchange, aggregate, shuffled leaf — the
    // kernel already runs wide), follow a broadcast join through its
    // STREAMED side only (the build side's partitioning never
    // propagates upward; heavy work inside a build side is audited by
    // its own node visit), and flag a raw leaf only when a broadcast
    // join was actually crossed — a bare kernel-over-scan keeps scan
    // parallelism on purpose (right for corpus work at warehouse
    // scale; the SpreadHeavyKernels rule widens it when the scan is
    // estimated narrow).
    import org.apache.spark.sql.catalyst.plans.physical.{
      HashPartitioning, RangePartitioning, RoundRobinPartitioning}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def narrowThroughBroadcast(p: SparkPlan, sawBJ: Boolean): Boolean = p match {
      case _: ShuffleExchangeLike | _: BaseAggregateExec => false
      // shuffle-based joins redistribute by construction — but this
      // walk runs over sparkPlan, BEFORE EnsureRequirements inserts
      // their exchanges, so the join node itself is the stop signal
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec |
           _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => false
      case imts: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        narrowThroughBroadcast(imts.relation.cachedPlan, sawBJ)
      case aqe: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        narrowThroughBroadcast(aqe.executedPlan, sawBJ)
      case j: BroadcastHashJoinExec =>
        narrowThroughBroadcast(if (j.buildSide == BuildLeft) j.right else j.left, sawBJ = true)
      case j: BroadcastNestedLoopJoinExec =>
        narrowThroughBroadcast(if (j.buildSide == BuildLeft) j.right else j.left, sawBJ = true)
      case leaf if leaf.children.isEmpty =>
        // mirror the rule's width test: a leaf is narrow only when its
        // estimated width is below the session target — a
        // warehouse-scale scan (or a cache of one) with hundreds of
        // splits is exactly the parallelism the kernel wants. File
        // scans report UnknownPartitioning(0), so their width comes
        // from the rule's own byte-based split estimate
        // (relation size / filesMaxPartitionBytes), NOT from
        // outputPartitioning — otherwise every file-scan leaf counts
        // as narrow regardless of size and a genuinely wide scan
        // streamed through a broadcast join would false-positive.
        val target = math.max(sc.sparkContext.defaultParallelism,
          sc.sessionState.conf.numShufflePartitions)
        sawBJ && (leaf match {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            val maxSplit =
              math.max(1L, sc.sessionState.conf.filesMaxPartitionBytes)
            val splits = math.max(1L,
              (f.relation.location.sizeInBytes + maxSplit - 1) / maxSplit)
            splits < target
          case _ => leaf.outputPartitioning match {
            case _: HashPartitioning | _: RangePartitioning |
                 _: RoundRobinPartitioning => false
            case p => p.numPartitions < target
          }
        })
      case other => other.children.exists(narrowThroughBroadcast(_, sawBJ))
    }
    val failedToPlan = scala.collection.mutable.ListBuffer[String]()
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(sc, sfDir).queryExecution.sparkPlan
        plan.collect {
          case n if hasHeavy(n) &&
              n.children.exists(narrowThroughBroadcast(_, sawBJ = false)) =>
            s"$name: heavy kernel runs at the raw scan parallelism of a " +
              s"broadcast join's streamed side (${n.nodeName})"
        }
      } catch { case e: Throwable =>
        failedToPlan += s"$name: ${e.getClass.getSimpleName}"; Nil
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
    assert(failedToPlan.isEmpty, s"queries that failed to plan: $failedToPlan")
  }

  test("quadratic per-row kernels never run on raw file-split parallelism") {
    // DelNeighborhoodExpr is O(L²) per row with array output — the one
    // kernel whose cost profile justifies a redistribution even over an
    // UNJOINED scan (the NOTES #27 site: a byte-small dimension scan
    // inherits 1-2 file splits, then pays the whole neighborhood
    // expansion there). Every evaluation site must have a shuffle,
    // aggregate, or checkpoint below it.
    import graft.functions.GraftExpressions.DelNeighborhoodExpr
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(sc, sfDir).queryExecution.sparkPlan.collect {
          case n if n.expressions.exists(_.exists(_.isInstanceOf[DelNeighborhoodExpr]))
            && n.children.nonEmpty && !n.children.exists(PlanAuditSpec.redistributes) =>
            s"$name: ${n.nodeName} expands a deletion neighborhood at file-split parallelism"
        }
      } catch { case _: Throwable => Nil } // planning failures caught by the sibling gate
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("q_range_native runs through the native RangeJoinExec merge, not SMJ+filter") {
    // the custom exec declares its distribution/ordering requirements,
    // so the plan must show the RangeJoin node with sorts below it and
    // NO SortMergeJoin (which would mean the strategy failed to fire
    // and the query fell back to the |P_k|x|E_k| pair-then-filter shape)
    val p = plan("q_range_native")
    assert(p.contains("RangeJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  // ---- pins for the four queries flagged `degraded` in the r15
  // official bench (host noise flagged them; these assertions make a
  // real plan regression impossible to hide behind that flag) --------

  test("geo queries: one scan, one user-keyed window, no joins") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.window.WindowExec
    Seq("q_geo_speed", "q_geo_trajectory").foreach { q =>
      val df = SparkEntry.queries(q)(sc, sfDir)
      df.collect()
      val nodes = PlanAuditSpec.collectFinalPlan(df.queryExecution.executedPlan)
      val names = nodes.map(_.nodeName).mkString(", ")
      // the whole query is one events pass: scan → lag window over
      // (user, time) → two-level hash agg → sort
      assert(nodes.count(_.isInstanceOf[FileSourceScanExec]) == 1, s"$q: $names")
      val windows = nodes.collect { case w: WindowExec => w }
      assert(windows.size == 1, s"$q: $names")
      assert(windows.head.partitionSpec
        .exists(_.references.exists(_.name == "user_id")), s"$q: unpartitioned window")
      assert(!nodes.exists(_.nodeName.contains("Join")), s"$q: $names")
      // one data shuffle (the window's user_id exchange) + the final
      // range sort — anything more is a regression
      assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) <= 2, s"$q: $names")
    }
  }

  test("ann_ivf: candidates meet probes through a LeftSemi hash join on the cell id") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
    val df = SparkEntry.queries("ann_ivf")(sc, sfDir)
    df.collect()
    val nodes = PlanAuditSpec.collectFinalPlan(df.queryExecution.executedPlan)
    // the corpus is restricted to the probed IVF cells by an equi
    // (semi) join on the cell id — the scale path; a cartesian against
    // the corpus would mean the cell restriction fell out of the plan
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      nodes.map(_.nodeName).mkString(", "))
    val semis = nodes.collect {
      case j: BroadcastHashJoinExec if j.joinType == LeftSemi => j
    }
    assert(semis.exists(_.leftKeys.exists(
      _.references.exists(_.name.startsWith("cell")))),
      s"no cell-keyed semi join: ${nodes.map(_.nodeName).mkString(", ")}")
  }

  test("ta_tfidf_cosine: pair generation is a term-keyed equi self-join under the df cap") {
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, CartesianProductExec}
    val df = SparkEntry.queries("ta_tfidf_cosine")(sc, sfDir)
    df.collect()
    val nodes = PlanAuditSpec.collectFinalPlan(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      nodes.map(_.nodeName).mkString(", "))
    // the doc-pair join is keyed on the (df-capped) term — an equi
    // join, so pair volume is Σ df² over capped terms, never docs²
    val termJoins = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.HashJoin
        if j.leftKeys.exists(_.references.exists(_.name.startsWith("term"))) => j
    }
    assert(termJoins.nonEmpty, nodes.map(_.nodeName).mkString(", "))
    // the df cap itself must sit in the plan (ShingleDfCap analog):
    // without it one corpus-wide term makes the self-join quadratic
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("<= 64"), p.take(1500))
    // both join sides read the shared cached tf relation — losing the
    // cache re-runs the tokenize+explode once per side
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec]),
      nodes.map(_.nodeName).mkString(", "))
  }

  test("dd_ngram_jaccard pairs on the df-capped shingle base") {
    // candidate generation must go through the ShingleDfCap filter —
    // without it, one boilerplate shingle in df documents contributes
    // df² rows to the self-join and the pass goes quadratic at scale
    val p = plan("dd_ngram_jaccard")
    assert(p.contains("<= 128"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }
}

object PlanAuditSpec {
  /** Every node of the RUNTIME plan: resolves AdaptiveSparkPlanExec to
    * its final executed plan and looks through the leaf-like AQE stage
    * wrappers (QueryStageExec) and cached relations. Deliberately does
    * NOT descend into a ReusedExchangeExec's referent — its subtree is
    * the exchange it reuses, already visited once; counting its scans
    * again would double-count exactly the work reuse avoids (matching
    * how the plan dump prints reuse as a one-line reference).
    */
  private[graft] def collectFinalPlan(
      p: org.apache.spark.sql.execution.SparkPlan
  ): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p +: (p match {
      case a: AdaptiveSparkPlanExec => collectFinalPlan(a.executedPlan)
      case q: QueryStageExec => collectFinalPlan(q.plan)
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        collectFinalPlan(i.relation.cachedPlan)
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq.empty
      case other => other.children.flatMap(collectFinalPlan)
    })
  }

  /** True when `p`'s subtree re-establishes real (shuffled) parallelism
    * before reaching a raw leaf: a shuffle exchange, an aggregate, a
    * checkpointed relation, or a cached/leaf relation whose output
    * partitioning is itself the product of a shuffle (hash / range /
    * round-robin) — an InMemoryTableScan of a shuffled plan keeps that
    * plan's partitioning, so compute above it already runs wide.
    */
  private[graft] def redistributes(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.physical.{
      HashPartitioning, RangePartitioning, RoundRobinPartitioning}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    p match {
      case _: ShuffleExchangeLike => true
      case _: BaseAggregateExec => true
      // a cached relation runs at its CACHED plan's parallelism — audit
      // that plan, not the scan leaf standing in for it
      case imts: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        redistributes(imts.relation.cachedPlan)
      // AQE wraps cached plans in a leaf-like node; look through it
      case aqe: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        redistributes(aqe.executedPlan)
      // ExistingRDD (localCheckpoint scan) gets NO free pass: a
      // checkpoint preserves its parent plan's partitioning, so a
      // checkpoint taken straight over a 1-2-split file scan still runs
      // narrow. LogicalRDD carries the checkpointed plan's
      // outputPartitioning into the scan node, so the same
      // shuffled-partitioning check below is the correct test for it —
      // a checkpoint of a repartition/aggregate passes, a checkpoint of
      // a raw scan fails.
      case leaf if leaf.children.isEmpty =>
        leaf.outputPartitioning match {
          case _: HashPartitioning | _: RangePartitioning |
               _: RoundRobinPartitioning => true
          case _ => false
        }
      case other => other.children.exists(redistributes)
    }
  }
}
