package graft

import org.apache.spark.sql.catalyst.plans.logical.Repartition
import org.apache.spark.sql.functions._

import graft.plans.SpreadHeavyKernels
import graft.sources.Tables

/** Gates for the planning-time NOTES #27 rule ([[SpreadHeavyKernels]])
  * that replaced the hand-placed repartitions below heavy kernels
  * (r10): it must fire on a heavy kernel over a narrow scan, respect
  * an explicit user spread, and stay out of the way when the scan is
  * already wide — the property that makes it safe at 100 TB. The
  * end-to-end effect on q_entity_resolve is pinned by PlanAuditSpec's
  * existing file-split-parallelism gate (which would fail if the rule
  * stopped firing, since the operator no longer repartitions by hand).
  */
class SpreadRuleSpec extends SparkSuite {

  private def delHood(c: org.apache.spark.sql.Column) =
    explode(call_function("graft_del_hood", c, lit(2)))

  private def spreads(df: org.apache.spark.sql.DataFrame): Seq[Repartition] =
    df.queryExecution.optimizedPlan.collect { case r: Repartition => r }

  test("inserts a shuffled spread below a heavy kernel over a narrow scan") {
    SpreadHeavyKernels.register(sc)
    val df = Tables(sc, sfDir, "customer")
      .select(col("c_custkey"), delHood(col("c_name")).as("vk"))
    val rs = spreads(df)
    assert(rs.nonEmpty, df.queryExecution.optimizedPlan.toString)
    assert(rs.forall(_.shuffle), "the spread must be a real shuffle, not a coalesce")
    val want = math.max(sc.sparkContext.defaultParallelism,
      sc.sessionState.conf.numShufflePartitions)
    assert(rs.exists(_.numPartitions == want), rs.map(_.numPartitions).toString)
  }

  test("respects an explicit user repartition (no double spread)") {
    SpreadHeavyKernels.register(sc)
    val df = Tables(sc, sfDir, "customer")
      .repartition(8)
      .select(col("c_custkey"), delHood(col("c_name")).as("vk"))
    val rs = spreads(df)
    assert(rs.length == 1, df.queryExecution.optimizedPlan.toString)
    assert(rs.head.numPartitions == 8, "the user's explicit width must survive")
  }

  test("leaves a wide scan alone (the 100 TB behavior)") {
    SpreadHeavyKernels.register(sc)
    val key = "spark.sql.files.maxPartitionBytes"
    val old = sc.conf.get(key)
    try {
      // shrink the split size so the SAME file estimates as a
      // warehouse-scale scan: hundreds of splits >= every core busy
      sc.conf.set(key, "256")
      val df = Tables(sc, sfDir, "customer")
        .select(col("c_custkey"), delHood(col("c_name")).as("vk"))
      assert(spreads(df).isEmpty, df.queryExecution.optimizedPlan.toString)
    } finally sc.conf.set(key, old)
  }

  test("fires for every kernel in the shared heavy inventory (not just del-hood)") {
    // the r10 gap: the rule knew DelNeighborhoodExpr + Levenshtein while
    // GraftExpressions shipped six more per-row compute kernels — a
    // winnow/wordpiece/CDC query over a byte-small scan would re-create
    // the NOTES #27 pathology unguarded. One fire-case per kernel, all
    // driven through the SAME narrow-scan shape as the del-hood case.
    SpreadHeavyKernels.register(sc)
    val docs = () => Tables(sc, sfDir, "documents")
    val embs = () => Tables(sc, sfDir, "embeddings")
    val cases: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "levenshtein" -> Tables(sc, sfDir, "customer")
        .select(levenshtein(col("c_name"), lit("Customer#000000001")).as("d")),
      "graft_winnow" -> docs().select(
        call_function("graft_winnow", col("text"), lit(5), lit(4)).as("fp")),
      "graft_shingle_hashes" -> docs().select(
        call_function("graft_shingle_hashes", col("text")).as("sh")),
      "graft_trigram_counts" -> docs().select(
        call_function("graft_trigram_counts", col("text")).as("tc")),
      "graft_wordpiece" -> docs().select(
        call_function("graft_wordpiece", col("text")).as("wp")),
      "graft_cdc" -> docs().select(
        call_function("graft_cdc", col("text"), lit(16), lit(64L)).as("ch")),
      "graft_dot_f" -> embs().select(
        call_function("graft_dot_f", col("embedding"), col("embedding")).as("dp")),
      "graft_norm_sq_f" -> embs().select(
        call_function("graft_norm_sq_f", col("embedding")).as("nsq")))
    val missing = cases.collect {
      case (name, df) if spreads(df).isEmpty => name
    }
    assert(missing.isEmpty,
      s"kernels whose narrow-scan evaluation got no spread: $missing")
  }

  test("spreads the streamed side of a broadcast join below a heavy kernel") {
    // the ann_pq / dd_embed_cosine composition: per-row vector kernels
    // evaluated over a narrow corpus scan that was first broadcast-
    // joined with a small codebook — the join preserves the streamed
    // side's raw scan parallelism, so the spread must land BELOW the
    // join on that side (never on the build side, where it would just
    // shuffle the broadcast input for nothing)
    SpreadHeavyKernels.register(sc)
    val dims = Tables(sc, sfDir, "embeddings")
      .groupBy("label").agg(count(lit(1)).as("n"))
    val df = Tables(sc, sfDir, "embeddings")
      .join(broadcast(dims), "label")
      .select(call_function("graft_norm_sq_f", col("embedding")).as("nsq"), col("n"))
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty, plan.toString)
    val streamedSpreads = joins.head.left.collect { case r: Repartition => r } ++
      joins.head.right.collect { case r: Repartition => r }
    assert(streamedSpreads.nonEmpty, plan.toString)
    // the spread sits on the scan side, not under the aggregated build side
    val buildSide = joins.head.children.find(c =>
      c.collectLeaves().nonEmpty && c.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate]))
    assert(buildSide.forall(_.collect { case r: Repartition => r }.isEmpty),
      plan.toString)
  }

  test("q_entity_resolve: both deletion-neighborhood sites run above rule-inserted spreads") {
    val plan = SparkEntry.queries("q_entity_resolve")(sc, sfDir)
      .queryExecution.optimizedPlan
    // two Generate(del-hood) sites (master keys, dirty keys), each with
    // a Repartition the RULE placed — the operator code has none
    val rs = plan.collect { case r: Repartition if r.shuffle => r }
    assert(rs.length >= 2, plan.toString.take(2000))
  }
}
