package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** RL / agentic-trace diagnostics — the post-training data story the
  * serving wave (ServingOps/ServingOps2) left open: operators over
  * multi-turn agent TRACES rather than single requests. The events
  * table is read as an agent log (user = agent thread, event = turn,
  * event_type = action, value = step reward signal, props.k = tool
  * route), stitched into episodes by an 8-hour silence gap (the
  * q_sessionize construction, widened so traces are genuinely
  * multi-turn on the synthetic cadence). Reference scope: none in the
  * reference (an ETL loader); public lineage cited per query.
  *
  * Determinism note (NOTES #35): every cross-row reduction in this
  * module is an INTEGER count/sum (rewards are DECIMAL(12,2)-quantized
  * cents before any aggregation — the q_salted_agg pattern), the
  * advantage sign test is a cross-multiplied integer compare, and the
  * trajectory collapse key is a hash of integer minhash signatures —
  * no float folds, no argmaxes, so no DeterminismSpec probes are
  * needed by construction.
  */
object TraceOps {

  /** Episode-stitching silence gap (ms). 30 minutes is the web-session
    * convention (q_sessionize); agent traces pause for tool latency and
    * human turnaround, so the stitcher here uses 8 hours — on the
    * synthetic cadence this yields multi-turn episodes (mean ≈ 2.1
    * turns, max 15 at sf0.01) instead of 1-event fragments.
    */
  private val GapMs = 8L * 3600 * 1000

  /** Synthetic scalar trace id for oracle-comparable output; at real
    * scale the composite (user_id, sid) IS the key and never needs to
    * be packed (sid is bounded by the user's event count, so the pack
    * is exact on the driver corpus).
    */
  private val TraceIdBase = 1000000L

  private def w = Window.partitionBy("user_id").orderBy("ts", "event_id")

  /** events → (user_id, sid, ts, event_id, event_type, cents, props):
    * gap-stitched episodes with the reward signal quantized to cents
    * (DECIMAL(12,2) — both engines round a double to 2 decimals
    * identically, proven by q_salted_agg) so every downstream sum is
    * exact integer arithmetic.
    *
    * The episode key stays the COMPOSITE (user_id, sid), not the packed
    * trace_id, until output: every downstream per-episode window and
    * group keys on (user_id, sid), whose clustering the stitching
    * window's HashPartitioning(user_id) already satisfies (hash keys ⊆
    * clustering keys) — so each trace query pays exactly ONE data-sized
    * shuffle, where a window over the derived `user_id·10⁶ + sid`
    * expression would force a second full exchange Spark cannot prove
    * away.
    */
  private[operators] def episodes(s: SparkSession, dir: String): DataFrame = {
    val boundary = when(lag("ts", 1).over(w).isNull ||
      unix_millis(col("ts")) - unix_millis(lag("ts", 1).over(w)) > GapMs, 1L)
      .otherwise(0L)
    Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"),
        col("props"))
      .withColumn("sid", sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-episode window: keyed on the composite, satisfied by the
    * stitcher's user_id partitioning — no second exchange.
    */
  private[operators] def wTrace = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")

  private def traceId = (col("user_id") * TraceIdBase + col("sid")).as("trace_id")

  /** The episode WITH-chain shared by all three oracles, ending in
    * `ep(trace_id, ts, event_id, event_type, cents, props)`.
    */
  private[operators] val episodesSql =
    s"""e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
       |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents, props
       |  FROM events),
       |marked AS (SELECT *,
       |    CASE WHEN lag(ts) OVER wu IS NULL
       |              OR epoch_ms(ts) - epoch_ms(lag(ts) OVER wu) > $GapMs
       |         THEN 1 ELSE 0 END AS boundary
       |  FROM e WINDOW wu AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |ep AS (SELECT CAST(user_id * $TraceIdBase +
       |    SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS trace_id,
       |    ts, event_id, event_type, cents, props
       |  FROM marked)""".stripMargin

  // -------------------------------------------------- q_trace_credit

  /** Per-step credit assignment over multi-turn traces: undiscounted
    * return-to-go per turn (the Monte-Carlo credit signal policy-
    * gradient methods baseline against — Williams' REINFORCE lineage;
    * GAE's λ=1, γ=1 corner, complementing [[ServingOps]]'s q_gae),
    * aggregated by step index. The baseline at step i is the mean
    * return-to-go across every trace reaching i; a step's advantage is
    * its return-to-go minus that baseline, and `frac_pos_adv` (the
    * share of visits whose advantage is strictly positive) is the
    * per-depth readout that locates WHERE in a trace credit
    * concentrates. The sign test is the cross-multiplied integer
    * compare `rtg · n > sum_rtg` — no division touches the decision.
    * Shapes: one scan, per-trace suffix-sum windows (one shuffle by
    * user), a tiny keyed aggregate (max-trace-length rows), a broadcast
    * join back for the sign test, a second tiny aggregate.
    */
  def qTraceCredit(s: SparkSession, dir: String): DataFrame = {
    val steps = episodes(s, dir)
      .select(col("user_id"), col("sid"), col("ts"), col("event_id"), col("cents"))
      .withColumn("step_idx", row_number().over(wTrace).cast(LongType))
      .withColumn("rtg", sum("cents").over(
        wTrace.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .select(col("step_idx"), col("rtg"))
    val base = steps.groupBy("step_idx")
      .agg(count(lit(1)).as("n_steps"), sum("rtg").as("sum_rtg"))
    steps.join(broadcast(base), "step_idx")
      .groupBy("step_idx", "n_steps", "sum_rtg")
      .agg(sum(when(col("rtg") * col("n_steps") > col("sum_rtg"), 1L)
        .otherwise(0L)).as("n_pos"))
      .select(col("step_idx"), col("n_steps"), col("sum_rtg"),
        round(col("sum_rtg").cast(DoubleType) / col("n_steps"), 6)
          .as("mean_rtg"),
        round(col("n_pos").cast(DoubleType) / col("n_steps"), 6)
          .as("frac_pos_adv"))
      .orderBy("step_idx")
  }

  private val qTraceCreditSql =
    s"""WITH $episodesSql,
       |steps AS (SELECT
       |    CAST(row_number() OVER wt AS BIGINT) AS step_idx,
       |    SUM(cents) OVER (PARTITION BY trace_id ORDER BY ts, event_id
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rtg
       |  FROM ep WINDOW wt AS (PARTITION BY trace_id ORDER BY ts, event_id)),
       |base AS (SELECT step_idx, CAST(COUNT(*) AS BIGINT) AS n_steps,
       |    CAST(SUM(rtg) AS BIGINT) AS sum_rtg
       |  FROM steps GROUP BY step_idx)
       |SELECT s.step_idx, b.n_steps, b.sum_rtg,
       |  round(CAST(b.sum_rtg AS DOUBLE) / b.n_steps, 6) AS mean_rtg,
       |  round(CAST(SUM(CASE WHEN s.rtg * b.n_steps > b.sum_rtg
       |      THEN 1 ELSE 0 END) AS DOUBLE) / b.n_steps, 6) AS frac_pos_adv
       |FROM steps s JOIN base b ON b.step_idx = s.step_idx
       |GROUP BY s.step_idx, b.n_steps, b.sum_rtg
       |ORDER BY s.step_idx""".stripMargin

  // -------------------------------------------------- q_tool_errors

  /** Failure-chain cap: per-episode error-chain statistics read at most
    * this many failures, so the fan-in per episode is bounded whatever
    * one hostile trace contains (the DelHood/BlockCap discipline; the
    * cap is on the ANALYZED chain — raw error counts stay uncapped).
    */
  private val MaxChain = 6

  /** Tool-call error taxonomy over agent traces: failed calls
    * (event_type = 'error') are routed to a tool by the request's
    * declared route (props.k → 8 tools) and classified by the
    * cents-quantized signal (4 classes — the timeout / rate-limit /
    * bad-arguments / server split an agent-ops dashboard tracks). Per
    * (tool, class): total failures, chain-head count (the error that
    * OPENED an episode's failure chain — what to fix first), self-retry
    * count (consecutive failures on the same tool inside the capped
    * chain — retry-loop smell), and the class's share of its tool's
    * failures. Chain statistics are computed on a rank-capped relation
    * ([[MaxChain]] per episode) rather than a collect-and-explode —
    * same bounded semantics, no per-episode array materialization, so
    * the plan is two windows and two keyed aggregates end to end.
    */
  def qToolErrors(s: SparkSession, dir: String): DataFrame = {
    val errs = episodes(s, dir)
      .where(col("event_type") === "error")
      .select(col("user_id"), col("sid"), col("ts"), col("event_id"),
        concat(lit("t"), (get_json_object(col("props"), "$.k").cast(LongType) / 13)
          .cast(LongType)).as("tool"),
        (col("cents") % 4).as("cls_code"))
      .withColumn("cls",
        when(col("cls_code") === 0, "timeout")
          .when(col("cls_code") === 1, "rate_limit")
          .when(col("cls_code") === 2, "bad_args")
          .otherwise("server_error"))
    val chain = errs
      .withColumn("chain_pos", row_number().over(wTrace))
      .where(col("chain_pos") <= MaxChain)
      .withColumn("prev_tool", lag("tool", 1).over(
        Window.partitionBy("user_id", "sid").orderBy("chain_pos")))
    val chainAgg = chain.groupBy("tool", "cls")
      .agg(sum(when(col("chain_pos") === 1, 1L).otherwise(0L)).as("n_chain_head"),
        sum(when(col("prev_tool") === col("tool"), 1L).otherwise(0L))
          .as("n_self_retry"))
    val totals = errs.groupBy("tool", "cls").agg(count(lit(1)).as("n_errors"))
    val perTool = totals.groupBy("tool").agg(sum("n_errors").as("tool_total"))
    totals
      .join(chainAgg, Seq("tool", "cls"), "left")
      .join(broadcast(perTool), "tool")
      .select(col("tool"), col("cls").as("error_class"), col("n_errors"),
        coalesce(col("n_chain_head"), lit(0L)).as("n_chain_head"),
        coalesce(col("n_self_retry"), lit(0L)).as("n_self_retry"),
        round(col("n_errors").cast(DoubleType) / col("tool_total"), 6)
          .as("frac_of_tool"))
      .orderBy("tool", "error_class")
  }

  private val qToolErrorsSql =
    s"""WITH $episodesSql,
       |errs AS (SELECT trace_id, ts, event_id,
       |    't' || CAST(divide(CAST(json_extract_string(props, '$$.k') AS BIGINT), 13)
       |      AS STRING) AS tool,
       |    CASE cents % 4 WHEN 0 THEN 'timeout' WHEN 1 THEN 'rate_limit'
       |      WHEN 2 THEN 'bad_args' ELSE 'server_error' END AS cls
       |  FROM ep WHERE event_type = 'error'),
       |chain AS (SELECT *, lag(tool) OVER (PARTITION BY trace_id
       |      ORDER BY chain_pos) AS prev_tool
       |  FROM (SELECT *, row_number() OVER (PARTITION BY trace_id
       |          ORDER BY ts, event_id) AS chain_pos
       |        FROM errs) r
       |  WHERE chain_pos <= $MaxChain),
       |ca AS (SELECT tool, cls,
       |    CAST(SUM(CASE WHEN chain_pos = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_chain_head,
       |    CAST(SUM(CASE WHEN prev_tool = tool THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_self_retry
       |  FROM chain GROUP BY tool, cls),
       |tot AS (SELECT tool, cls, CAST(COUNT(*) AS BIGINT) AS n_errors
       |  FROM errs GROUP BY tool, cls),
       |pt AS (SELECT tool, CAST(SUM(n_errors) AS BIGINT) AS tool_total
       |  FROM tot GROUP BY tool)
       |SELECT t.tool, t.cls AS error_class, t.n_errors,
       |  coalesce(ca.n_chain_head, 0) AS n_chain_head,
       |  coalesce(ca.n_self_retry, 0) AS n_self_retry,
       |  round(CAST(t.n_errors AS DOUBLE) / pt.tool_total, 6) AS frac_of_tool
       |FROM tot t LEFT JOIN ca ON ca.tool = t.tool AND ca.cls = t.cls
       |JOIN pt ON pt.tool = t.tool
       |ORDER BY t.tool, error_class""".stripMargin

  // -------------------------------------------------- q_traj_collapse

  /** Near-identical rollout collapse: trajectories whose ACTION
    * sequences are near-duplicates (the rollout-dedup step an RL data
    * pipeline runs before advantage estimation, so one repeated
    * behavior doesn't dominate the batch) collapse to a canonical
    * representative. Machinery is [[DedupOps]]'s minhash verbatim,
    * keyed on action 3-grams: each episode's action-trigram set →
    * 16 affine-permuted minhash signatures → collapse key = md5 of the
    * signature vector (+ the set size, separating different-length
    * near-misses). Full-signature equality ≈ Jaccard-1 identity — the
    * COLLAPSE formulation (group-by, linear, no candidate pairs at
    * all), chosen over the pair-emitting LSH because near-identical
    * rollouts over a 5-action alphabet form huge equivalence classes
    * whose pair lists grow quadratically while their collapsed ledger
    * stays one row per class. Episodes with < 3 actions carry no
    * trigram identity and are reported as the `short` singleton tier
    * via n_actions < 3 (exact dedup already covers them). Per class:
    * canonical keep (min trace_id), collapsed count, dropped count.
    */
  def qTrajCollapse(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash
    val tri = episodes(s, dir)
      .select(col("user_id"), col("sid"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("a2", lead("event_type", 1).over(wTrace))
      .withColumn("a3", lead("event_type", 2).over(wTrace))
      .where(col("a3").isNotNull)
      .select(col("user_id"), col("sid"),
        PortableHash.hash64(concat_ws(" ", col("event_type"), col("a2"),
          col("a3"))).as("h"))
      .distinct()
    val base = col("h") % DedupOps.MersenneP
    val sigAggs = DedupOps.perms.zipWithIndex.map { case ((a, b), i) =>
      min((base * a + b) % DedupOps.MersenneP).as(s"sig$i")
    }
    // distinct, signature agg and (via first-partial) the window above
    // all key on (user_id, sid) subsets — one exchange end to end
    val sigs = tri.groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_shingles"), sigAggs: _*)
    val sigCols: Seq[Column] =
      DedupOps.perms.indices.map(i => col(s"sig$i").cast(StringType))
    sigs
      .select(traceId, col("n_shingles"),
        md5(concat_ws(",", sigCols: _*)).as("collapse_key"))
      .groupBy("collapse_key", "n_shingles")
      .agg(min("trace_id").as("keep_trace"),
        count(lit(1)).as("n_traj"))
      .select(col("collapse_key"), col("n_shingles"), col("keep_trace"),
        col("n_traj"), (col("n_traj") - 1).as("n_dropped"))
      .orderBy("keep_trace")
  }

  private val qTrajCollapseSql = {
    import graft.functions.PortableHash
    val baseH = s"(h % ${DedupOps.MersenneP})"
    val sigExprs = DedupOps.perms.zipWithIndex
      .map { case ((a, b), i) =>
        s"min(($baseH * $a + $b) % ${DedupOps.MersenneP}) AS sig$i" }
      .mkString(",\n  ")
    val keyParts = DedupOps.perms.indices
      .map(i => s"CAST(sig$i AS STRING)").mkString(" || ',' || ")
    s"""WITH $episodesSql,
       |tri AS (SELECT DISTINCT trace_id,
       |    ${PortableHash.sql("shingle")} AS h
       |  FROM (SELECT trace_id,
       |      event_type || ' ' || lead(event_type, 1) OVER wt
       |        || ' ' || lead(event_type, 2) OVER wt AS shingle,
       |      lead(event_type, 2) OVER wt AS a3
       |    FROM ep WINDOW wt AS (PARTITION BY trace_id ORDER BY ts, event_id)) x
       |  WHERE a3 IS NOT NULL),
       |sigs AS (SELECT trace_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |    $sigExprs
       |  FROM tri GROUP BY trace_id)
       |SELECT md5($keyParts) AS collapse_key, n_shingles,
       |  min(trace_id) AS keep_trace, CAST(COUNT(*) AS BIGINT) AS n_traj,
       |  CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
       |FROM sigs GROUP BY 1, 2
       |ORDER BY keep_trace""".stripMargin
  }

  // -------------------------------------------------- q_loop_detect

  /** Action-loop diagnostic: the degenerate-behavior signatures an
    * agentic-trace pipeline filters before training on rollouts —
    * IMMEDIATE REPEATS (the same action as the previous turn: a stuck
    * retry), PERIOD-2 OSCILLATIONS (a-b-a: the agent ping-ponging
    * between two actions), and the longest consecutive RUN of each
    * action (gaps-and-islands over the episode: a run boundary is any
    * action change or episode start, the run id is the boundary
    * running sum — the q_sessionize construction one level down).
    * Per action: occurrences, repeat steps, oscillation steps, longest
    * run, repeat fraction. All counts integer; windows key on
    * (user_id, sid) subsets — one data-sized shuffle (NOTES #52).
    */
  def qLoopDetect(s: SparkSession, dir: String): DataFrame = {
    val steps = episodes(s, dir)
      .select(col("user_id"), col("sid"), col("ts"), col("event_id"),
        col("event_type").as("action"))
      .withColumn("prev", lag("action", 1).over(wTrace))
      .withColumn("prev2", lag("action", 2).over(wTrace))
      .withColumn("rep", when(col("action") === col("prev"), 1L).otherwise(0L))
      .withColumn("osc", when(col("action") === col("prev2") &&
        col("action") =!= col("prev"), 1L).otherwise(0L))
      .withColumn("boundary",
        when(col("prev").isNull || col("action") =!= col("prev"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum("boundary").over(
        wTrace.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = steps.groupBy("user_id", "sid", "run_id", "action")
      .agg(count(lit(1)).as("run_len"),
        sum("rep").as("rep"), sum("osc").as("osc"))
    runs.groupBy("action")
      .agg(sum("run_len").as("n_steps"),
        sum("rep").as("n_repeat_steps"),
        sum("osc").as("n_osc_steps"),
        max("run_len").as("max_run_len"))
      .select(col("action"), col("n_steps"), col("n_repeat_steps"),
        col("n_osc_steps"), col("max_run_len"),
        round(col("n_repeat_steps").cast(DoubleType) / col("n_steps"), 6)
          .as("repeat_frac"))
      .orderBy("action")
  }

  private val qLoopDetectSql =
    s"""WITH $episodesSql,
       |steps AS (SELECT trace_id, event_type AS action,
       |    lag(event_type) OVER wt AS prev,
       |    lag(event_type, 2) OVER wt AS prev2,
       |    ts, event_id
       |  FROM ep WINDOW wt AS (PARTITION BY trace_id ORDER BY ts, event_id)),
       |lmark AS (SELECT trace_id, action,
       |    CASE WHEN action = prev THEN 1 ELSE 0 END AS rep,
       |    CASE WHEN action = prev2 AND action <> prev THEN 1 ELSE 0 END AS osc,
       |    SUM(CASE WHEN prev IS NULL OR action <> prev THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY trace_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
       |  FROM steps),
       |runs AS (SELECT trace_id, run_id, action,
       |    CAST(COUNT(*) AS BIGINT) AS run_len,
       |    CAST(SUM(rep) AS BIGINT) AS rep, CAST(SUM(osc) AS BIGINT) AS osc
       |  FROM lmark GROUP BY 1, 2, 3)
       |SELECT action, CAST(SUM(run_len) AS BIGINT) AS n_steps,
       |  CAST(SUM(rep) AS BIGINT) AS n_repeat_steps,
       |  CAST(SUM(osc) AS BIGINT) AS n_osc_steps,
       |  max(run_len) AS max_run_len,
       |  round(CAST(SUM(rep) AS DOUBLE) / SUM(run_len), 6) AS repeat_frac
       |FROM runs GROUP BY action ORDER BY action""".stripMargin

  // -------------------------------------------------- q_trace_funnel

  /** Success-by-depth funnel: for each OBSERVED episode length d, how
    * many episodes ran at least d turns and what fraction of those
    * completed the task
    * (contain a `purchase` action — the conversion convention the
    * attribution family uses). The curve an RL data pipeline reads to
    * decide whether long trajectories are worth their tokens (success
    * lift vs depth) and where to truncate rollouts. Built without any
    * per-depth fan-out: episodes aggregate to (length, success), group
    * to the tiny length histogram, and two suffix sums over it (window
    * over max-trace-length rows) produce the ≥-depth counts — integer
    * end to end, one data-sized shuffle then length-histogram-sized
    * work.
    */
  def qTraceFunnel(s: SparkSession, dir: String): DataFrame = {
    val eps = episodes(s, dir)
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("len"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("success"))
    val hist = eps.groupBy("len")
      .agg(count(lit(1)).as("n_eps"), sum("success").as("n_succ"))
    val wSuffix = Window.orderBy(col("len").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("n_reaching", sum("n_eps").over(wSuffix))
      .withColumn("n_success", sum("n_succ").over(wSuffix))
      .select(col("len").as("depth"), col("n_reaching"), col("n_success"),
        round(col("n_success").cast(DoubleType) / col("n_reaching"), 6)
          .as("success_rate"))
      .orderBy("depth")
  }

  private val qTraceFunnelSql =
    s"""WITH $episodesSql,
       |eps AS (SELECT trace_id, CAST(COUNT(*) AS BIGINT) AS len,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS success
       |  FROM ep GROUP BY 1),
       |hist AS (SELECT len, CAST(COUNT(*) AS BIGINT) AS n_eps,
       |    CAST(SUM(success) AS BIGINT) AS n_succ
       |  FROM eps GROUP BY len)
       |SELECT len AS depth,
       |  CAST(SUM(n_eps) OVER w AS BIGINT) AS n_reaching,
       |  CAST(SUM(n_succ) OVER w AS BIGINT) AS n_success,
       |  round(CAST(SUM(n_succ) OVER w AS DOUBLE)
       |    / SUM(n_eps) OVER w, 6) AS success_rate
       |FROM hist
       |WINDOW w AS (ORDER BY len DESC ROWS BETWEEN UNBOUNDED PRECEDING
       |  AND CURRENT ROW)
       |ORDER BY depth""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_trace_credit" -> (qTraceCredit(_, _)),
    "q_tool_errors" -> (qToolErrors(_, _)),
    "q_traj_collapse" -> (qTrajCollapse(_, _)),
    "q_loop_detect" -> (qLoopDetect(_, _)),
    "q_trace_funnel" -> (qTraceFunnel(_, _)))

  def oracles: Map[String, String] = Map(
    "q_trace_credit" -> qTraceCreditSql,
    "q_tool_errors" -> qToolErrorsSql,
    "q_traj_collapse" -> qTrajCollapseSql,
    "q_loop_detect" -> qLoopDetectSql,
    "q_trace_funnel" -> qTraceFunnelSql)
}
