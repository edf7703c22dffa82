package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Reward-model / RLHF diagnostics wave — the audits a post-training
  * pipeline runs on its REWARD SIGNAL before (and while) optimizing
  * against it, complementing [[PrefOps]] (preference fitting),
  * [[ServingOps]] (inference economics) and [[TraceOps]] (trace
  * shapes): best-of-n over-optimization (proxy-vs-gold divergence as
  * selection pressure grows — Gao, Schulman & Hilton, "Scaling Laws
  * for Reward Model Overoptimization", 2023; the BoN estimator lineage
  * is Nakano et al., WebGPT, 2021 App. I), preference-cycle census
  * (circular triads in the pairwise tournament — Kendall & Babington
  * Smith 1940, the consistency check LLM-judge papers run, e.g. Zheng
  * et al., "Judging LLM-as-a-Judge", 2023), per-depth policy/reference
  * KL over agent traces (the per-token KL penalty readout of
  * PPO-RLHF — Stiennon et al. 2020), reward-vs-length regression
  * (verbosity bias — Singhal et al., "A Long Way to Go: Investigating
  * Length Correlations in RLHF", 2023), and judge position-bias
  * measurement via swapped-order re-judging (Zheng et al. 2023 §3.3).
  * Reference scope: none in the reference (an ETL loader — its closest
  * analog is the scored-event stream these queries read as synthetic
  * reward logs).
  *
  * Determinism (NOTES #35): rewards and qualities are hash-derived
  * BIGINTs, every cross-row reduction is an integer sum/count, and
  * each query's single float division happens once at output. The one
  * transcendental (q_step_kl's ln) follows the ta_ngram_lm pattern —
  * rounded at 1e-9 immediately, then folded in VALUE-SORTED order so
  * both engines sum bit-identical terms in the same sequence.
  */
object RewardOps {

  private def wUser = Window.partitionBy("user_id").orderBy("ts", "event_id")

  private def h(prefix: String, c: Column): Column =
    PortableHash.hash64(concat(lit(prefix + ":"), c.cast(StringType)))

  private def hSql(prefix: String, e: String): String =
    PortableHash.sql(s"'$prefix:' || CAST($e AS STRING)")

  /** Exact-cents reward signal (the q_salted_agg quantization — both
    * engines round a double to DECIMAL(12,2) identically).
    */
  private def cents: Column =
    (col("value").cast(DecimalType(12, 2)) * 100).cast(LongType)

  private val centsSql = "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"

  // --------------------------------------------------- q_bon_overopt

  /** The n-grid: doubling selection pressure up to best-of-16 (each
    * user's first 16 events are the candidate pool).
    */
  private val BonNs = Seq(1, 2, 4, 8, 16)

  /** Best-of-n over-optimization curve (Gao et al. 2023): each user's
    * first [[BonNs]].max events are candidate responses scored by a
    * PROXY reward the selector sees and a GOLD reward it does not.
    * The synthetic decomposition plants the failure mode the audit
    * exists to catch: candidates carry independent hash components
    * `base` (true quality, rewarded by both) and `hack` (reward-model
    * exploit, rewarded by proxy only) — proxy = base + 3·hack,
    * gold = 2·base − hack — so argmax-proxy selection increasingly
    * harvests `hack`, and the proxy−gold gap of the SELECTED candidate
    * widens with n while mean proxy rises monotonically (guaranteed:
    * a superset's max dominates). Per n: prompts, mean selected proxy,
    * mean selected gold, mean gap. Shapes: one window over users (one
    * shuffle), a broadcast 5-row grid join (the q_draft_length_curve
    * pattern), per-(n, prompt) argmax as one map-side-combinable
    * `min(struct(...))`, then a 5-row aggregate — no per-n rescans.
    *
    * Mixed-pool note (deliberate divergence from the Gao et al.
    * estimator): a user with k < n candidates still contributes their
    * best-of-k to the n row (`rn <= n_bon` keeps whatever exists), so
    * each grid row mixes pool sizes instead of filtering to users with
    * ≥ n candidates. Both engines and the oracle agree on this
    * definition; it reports "selection pressure over the traffic you
    * actually have", which is the operational question — switch to a
    * `HAVING count(*) >= n_bon` per grid row for the paper's estimator.
    */
  def qBonOveropt(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cand = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(wUser))
      .where(col("rn") <= BonNs.max)
      .withColumn("base", h("bon_base", col("event_id")) % 1000)
      .withColumn("hack", h("bon_hack", col("event_id")) % 1000)
      .select(col("user_id"), col("event_id"), col("rn"),
        (col("base") + lit(3L) * col("hack")).as("proxy"),
        (lit(2L) * col("base") - col("hack")).as("gold"))
    val grid = BonNs.toDF("n_bon")
    cand.join(broadcast(grid), col("rn") <= col("n_bon"))
      .groupBy("n_bon", "user_id")
      .agg(min(struct((-col("proxy")).as("np"), col("event_id").as("id"),
        col("proxy").as("p"), col("gold").as("g"))).as("w"))
      .groupBy("n_bon")
      .agg(count(lit(1)).as("n_prompts"),
        sum(col("w.p")).as("sp"), sum(col("w.g")).as("sg"))
      .select(col("n_bon"), col("n_prompts"),
        round(col("sp").cast(DoubleType) / col("n_prompts"), 6).as("mean_proxy"),
        round(col("sg").cast(DoubleType) / col("n_prompts"), 6).as("mean_gold"),
        round((col("sp") - col("sg")).cast(DoubleType) / col("n_prompts"), 6)
          .as("reward_gap"))
      .orderBy("n_bon")
  }

  private val qBonOveroptSql = {
    val ns = BonNs.map(n => s"($n)").mkString(", ")
    s"""WITH cand AS (SELECT user_id, event_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events),
       |scored AS (SELECT user_id, event_id, rn,
       |    ${hSql("bon_base", "event_id")} % 1000 AS base,
       |    ${hSql("bon_hack", "event_id")} % 1000 AS hack
       |  FROM cand WHERE rn <= ${BonNs.max}),
       |sel AS (SELECT g.n_bon, s.user_id,
       |    s.base + 3 * s.hack AS proxy, 2 * s.base - s.hack AS gold,
       |    row_number() OVER (PARTITION BY g.n_bon, s.user_id
       |      ORDER BY s.base + 3 * s.hack DESC, s.event_id) AS rk
       |  FROM scored s JOIN (VALUES $ns) g(n_bon) ON s.rn <= g.n_bon)
       |SELECT n_bon, CAST(COUNT(*) AS BIGINT) AS n_prompts,
       |  round(CAST(SUM(proxy) AS DOUBLE) / COUNT(*), 6) AS mean_proxy,
       |  round(CAST(SUM(gold) AS DOUBLE) / COUNT(*), 6) AS mean_gold,
       |  round(CAST(SUM(proxy - gold) AS DOUBLE) / COUNT(*), 6) AS reward_gap
       |FROM sel WHERE rk = 1
       |GROUP BY n_bon ORDER BY n_bon""".stripMargin
  }

  // --------------------------------------------- q_pref_transitivity

  /** Circular-triad census over the pairwise model tournament
    * (Kendall & Babington Smith 1940): events are judgments of 8
    * models (the props.k → tool routing [[TraceOps]] uses), a user
    * prefers model i to j when their best i-judgment outscores their
    * best j-judgment (max — float-order independent; exact ties
    * abstain), each pair is ORIENTED by majority across users (vote
    * ties stay unoriented), and the oriented tournament is scanned for
    * directed 3-cycles i→j→k→i — the intransitive preference loops
    * that make a "strength" ordering ill-defined. Per model: out-degree
    * (wins), in-degree, unoriented pairs, cyclic triads through the
    * model, and win share. The per-user comparison relation is keyed
    * by user (never all-pairs over rows — the q_bradley_terry
    * discipline), and everything after the pair vote is an ≤ 28-row
    * edge relation, so the triangle join is broadcast-scale at any
    * corpus size.
    */
  def qPrefTransitivity(s: SparkSession, dir: String): DataFrame = {
    val scores = Tables(s, dir, "events")
      .select(col("user_id"),
        concat(lit("t"), (get_json_object(col("props"), "$.k").cast(LongType) / 13)
          .cast(LongType)).as("model"),
        cents.as("c"))
      .groupBy("user_id", "model")
      .agg(max("c").as("mx"))
    // votes is referenced by edges (three times, via the triangle
    // join), and twice by the per-model fold — localCheckpoint cuts
    // the lineage so the data-sized comparison pipeline runs ONCE and
    // the five consumers read the ≤ |models|²/2-row result (the
    // EvalOps/GraphOps bounded-materialization precedent; the bound is
    // alphabet-sized, corpus-independent). eager = false keeps plan
    // CONSTRUCTION side-effect-free (PlanDump / registry-wide audits
    // must not run a data-sized job); the blocks materialize at the
    // first real action and are shared by every later consumer.
    val votes = scores.as("l")
      .join(scores.as("r"), col("l.user_id") === col("r.user_id") &&
        col("l.model") < col("r.model"))
      .select(col("l.model").as("mi"), col("r.model").as("mj"),
        when(col("l.mx") > col("r.mx"), 1L).otherwise(0L).as("wi"),
        when(col("r.mx") > col("l.mx"), 1L).otherwise(0L).as("wj"))
      .groupBy("mi", "mj")
      .agg(sum("wi").as("wi"), sum("wj").as("wj"))
      .localCheckpoint(eager = false)
    val edges = votes
      .where(col("wi") =!= col("wj"))
      .select(when(col("wi") > col("wj"), col("mi")).otherwise(col("mj")).as("u"),
        when(col("wi") > col("wj"), col("mj")).otherwise(col("mi")).as("v"))
    val cycles = edges.as("e1")
      .join(edges.as("e2"), col("e2.u") === col("e1.v"))
      .join(edges.as("e3"), col("e3.u") === col("e2.v") &&
        col("e3.v") === col("e1.u"))
      .where(col("e1.u") < col("e1.v") && col("e1.u") < col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val cyclic = cycles.select(col("a").as("model"))
      .union(cycles.select(col("b").as("model")))
      .union(cycles.select(col("c").as("model")))
      .groupBy("model").agg(count(lit(1)).as("n_cyclic"))
    val perModel = votes.select(col("mi").as("model"),
        when(col("wi") > col("wj"), 1L).otherwise(0L).as("w"),
        when(col("wj") > col("wi"), 1L).otherwise(0L).as("l"),
        when(col("wi") === col("wj"), 1L).otherwise(0L).as("t"))
      .union(votes.select(col("mj").as("model"),
        when(col("wj") > col("wi"), 1L).otherwise(0L).as("w"),
        when(col("wi") > col("wj"), 1L).otherwise(0L).as("l"),
        when(col("wi") === col("wj"), 1L).otherwise(0L).as("t")))
      .groupBy("model")
      .agg(sum("w").as("n_wins"), sum("l").as("n_losses"), sum("t").as("n_ties"))
    perModel.join(broadcast(cyclic), Seq("model"), "left")
      .select(col("model"), col("n_wins"), col("n_losses"), col("n_ties"),
        coalesce(col("n_cyclic"), lit(0L)).as("n_cyclic_triads"),
        round(col("n_wins").cast(DoubleType) /
          greatest(col("n_wins") + col("n_losses"), lit(1L)), 6).as("win_share"))
      .orderBy("model")
  }

  private val qPrefTransitivitySql =
    s"""WITH scores AS (SELECT user_id,
       |    't' || CAST(divide(CAST(json_extract_string(props, '$$.k') AS BIGINT), 13)
       |      AS STRING) AS model,
       |    MAX($centsSql) AS mx
       |  FROM events GROUP BY 1, 2),
       |votes AS (SELECT l.model AS mi, r.model AS mj,
       |    CAST(SUM(CASE WHEN l.mx > r.mx THEN 1 ELSE 0 END) AS BIGINT) AS wi,
       |    CAST(SUM(CASE WHEN r.mx > l.mx THEN 1 ELSE 0 END) AS BIGINT) AS wj
       |  FROM scores l JOIN scores r
       |    ON r.user_id = l.user_id AND l.model < r.model
       |  GROUP BY 1, 2),
       |edges AS (SELECT CASE WHEN wi > wj THEN mi ELSE mj END AS u,
       |    CASE WHEN wi > wj THEN mj ELSE mi END AS v
       |  FROM votes WHERE wi <> wj),
       |cycles AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |  FROM edges e1 JOIN edges e2 ON e2.u = e1.v
       |  JOIN edges e3 ON e3.u = e2.v AND e3.v = e1.u
       |  WHERE e1.u < e1.v AND e1.u < e2.v),
       |cyc AS (SELECT model, CAST(COUNT(*) AS BIGINT) AS n_cyclic FROM (
       |    SELECT a AS model FROM cycles
       |    UNION ALL SELECT b FROM cycles
       |    UNION ALL SELECT c FROM cycles) x GROUP BY model),
       |pm AS (SELECT model, CAST(SUM(w) AS BIGINT) AS n_wins,
       |    CAST(SUM(l) AS BIGINT) AS n_losses, CAST(SUM(t) AS BIGINT) AS n_ties
       |  FROM (
       |    SELECT mi AS model, CASE WHEN wi > wj THEN 1 ELSE 0 END AS w,
       |      CASE WHEN wj > wi THEN 1 ELSE 0 END AS l,
       |      CASE WHEN wi = wj THEN 1 ELSE 0 END AS t FROM votes
       |    UNION ALL
       |    SELECT mj, CASE WHEN wj > wi THEN 1 ELSE 0 END,
       |      CASE WHEN wi > wj THEN 1 ELSE 0 END,
       |      CASE WHEN wi = wj THEN 1 ELSE 0 END FROM votes) x
       |  GROUP BY model)
       |SELECT pm.model, pm.n_wins, pm.n_losses, pm.n_ties,
       |  coalesce(cyc.n_cyclic, 0) AS n_cyclic_triads,
       |  round(CAST(pm.n_wins AS DOUBLE) /
       |    greatest(pm.n_wins + pm.n_losses, 1), 6) AS win_share
       |FROM pm LEFT JOIN cyc ON cyc.model = pm.model
       |ORDER BY pm.model""".stripMargin

  // ------------------------------------------------------ q_step_kl

  /** Per-depth KL(policy at depth d ‖ overall reference) over agent
    * traces: the action distribution at each step depth of the
    * gap-stitched episodes ([[TraceOps.episodes]]) against the global
    * action distribution — the per-step KL-to-reference readout an
    * RLHF runtime tracks to see WHERE in a trajectory the policy
    * drifts (early steps mirror the reference; deep steps are
    * conditioned on survival and diverge). Counts are exact integers;
    * each of the ≤ 5 per-depth terms computes
    * (c_da/n_d)·ln(c_da·N / (n_d·c_a)) with the ln rounded at 1e-9
    * immediately (the ta_ngram_lm transcendental discipline), and the
    * per-depth sum folds the VALUE-SORTED term list (NOTES #48a) so
    * both engines add bit-identical doubles in the same order. Shape:
    * the episode stitch's one user-keyed shuffle into ONE
    * (depth, action) aggregate; the depth/action/total margins are
    * windows OVER that aggregate — a join formulation would recompute
    * the data-sized stitch once per margin (Spark shares no subplans
    * without caching; the first cut paid four full stitches), where
    * the margin windows touch only max-depth × |action-alphabet| rows,
    * a data-independent bound, so even their global window is
    * broadcast-scale.
    */
  def qStepKl(s: SparkSession, dir: String): DataFrame = {
    val da = TraceOps.episodes(s, dir)
      .select(col("user_id"), col("sid"), col("ts"), col("event_id"),
        col("event_type").as("action"))
      .withColumn("depth", row_number().over(TraceOps.wTrace).cast(LongType))
      .groupBy("depth", "action")
      .agg(count(lit(1)).as("c_da"))
    // ratio of IEEE-exact division results, never a BIGINT product —
    // c_da·N would overflow long before the counts themselves do
    val term = (col("c_da").cast(DoubleType) / col("n_d")) *
      round(log((col("c_da").cast(DoubleType) / col("n_d")) /
        (col("c_a").cast(DoubleType) / col("n_total"))), 9)
    da
      .withColumn("n_d", sum("c_da").over(Window.partitionBy("depth")))
      .withColumn("c_a", sum("c_da").over(Window.partitionBy("action")))
      // deliberate global frame: runs on the tiny margin relation only
      .withColumn("n_total", sum("c_da").over(Window.partitionBy()))
      .select(col("depth"), col("n_d"), term.as("term"))
      .groupBy("depth", "n_d")
      .agg(count(lit(1)).as("n_actions"),
        sort_array(collect_list("term")).as("terms"))
      .select(col("depth"), col("n_d").as("n_steps"), col("n_actions"),
        round(aggregate(col("terms"), lit(0.0), (acc, x) => acc + x), 6)
          .as("kl_nats"))
      .orderBy("depth")
  }

  private val qStepKlSql =
    s"""WITH ${TraceOps.episodesSql},
       |da AS (SELECT depth, action, CAST(COUNT(*) AS BIGINT) AS c_da FROM (
       |    SELECT CAST(row_number() OVER (PARTITION BY trace_id
       |        ORDER BY ts, event_id) AS BIGINT) AS depth,
       |      event_type AS action
       |    FROM ep) x GROUP BY 1, 2),
       |nd AS (SELECT depth, CAST(SUM(c_da) AS BIGINT) AS n_d FROM da GROUP BY 1),
       |ca AS (SELECT action, CAST(SUM(c_da) AS BIGINT) AS c_a FROM da GROUP BY 1),
       |n AS (SELECT CAST(SUM(c_da) AS BIGINT) AS n_total FROM da),
       |terms AS (SELECT da.depth, nd.n_d,
       |    (CAST(da.c_da AS DOUBLE) / nd.n_d) *
       |      round(ln((CAST(da.c_da AS DOUBLE) / nd.n_d) /
       |        (CAST(ca.c_a AS DOUBLE) / n.n_total)), 9) AS term
       |  FROM da JOIN nd ON nd.depth = da.depth
       |  JOIN ca ON ca.action = da.action CROSS JOIN n)
       |SELECT depth, n_d AS n_steps, CAST(COUNT(*) AS BIGINT) AS n_actions,
       |  round(list_aggregate(list_sort(array_agg(term)), 'sum'), 6) AS kl_nats
       |FROM terms GROUP BY depth, n_d ORDER BY depth""".stripMargin

  // -------------------------------------------- q_reward_length_slope

  /** Reward-vs-length regression per source (Singhal et al. 2023's
    * verbosity-bias audit): a synthetic reward model scores each
    * document as an unbiased hash term plus a PLANTED per-source
    * length bias (coefficient source-number mod 4, applied to
    * n_chars/10) — the audit recovers the planted slope from data via
    * exact-integer ordinary least squares: slope and intercept come
    * from the closed forms (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) and
    * (Σy·Σx² − Σx·Σxy)/(n·Σx² − (Σx)²), whose numerators and
    * denominator are pure BIGINT sums — one float division each at
    * output. (Second moments of bounded n_chars fit BIGINT up to
    * ~10¹⁰ docs/source; past that the accumulators would move to
    * DECIMAL(38) — the documented scale bound.) One scan, one
    * source-keyed aggregate — map-side combinable end to end.
    */
  def qRewardLengthSlope(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("coef", substring(col("source"), 4, 10).cast(LongType) % 4)
      .withColumn("reward", h("rm", col("doc_id")) % 500 +
        col("coef") * (col("n_chars") / 10).cast(LongType))
    d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        max("coef").as("planted_coef"),
        sum("n_chars").as("sx"), sum("reward").as("sy"),
        sum(col("n_chars") * col("reward")).as("sxy"),
        sum(col("n_chars") * col("n_chars")).as("sxx"))
      .select(col("source"), col("n_docs"), col("planted_coef"),
        round((col("n_docs") * col("sxy") - col("sx") * col("sy"))
          .cast(DoubleType) /
          (col("n_docs") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") * col("sxx") - col("sx") * col("sxy"))
          .cast(DoubleType) /
          (col("n_docs") * col("sxx") - col("sx") * col("sx")), 6)
          .as("intercept"),
        round(col("sy").cast(DoubleType) / col("n_docs"), 6).as("mean_reward"))
      .orderBy("source")
  }

  private val qRewardLengthSlopeSql =
    s"""WITH d AS (SELECT source, n_chars,
       |    CAST(substr(source, 4) AS BIGINT) % 4 AS coef,
       |    ${hSql("rm", "doc_id")} % 500 +
       |      (CAST(substr(source, 4) AS BIGINT) % 4) * divide(n_chars, 10) AS reward
       |  FROM documents),
       |m AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    MAX(coef) AS planted_coef,
       |    CAST(SUM(n_chars) AS BIGINT) AS sx, CAST(SUM(reward) AS BIGINT) AS sy,
       |    CAST(SUM(n_chars * reward) AS BIGINT) AS sxy,
       |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
       |  FROM d GROUP BY source)
       |SELECT source, n_docs, planted_coef,
       |  round(CAST(n_docs * sxy - sx * sy AS DOUBLE) /
       |    (n_docs * sxx - sx * sx), 6) AS slope,
       |  round(CAST(sy * sxx - sx * sxy AS DOUBLE) /
       |    (n_docs * sxx - sx * sx), 6) AS intercept,
       |  round(CAST(sy AS DOUBLE) / n_docs, 6) AS mean_reward
       |FROM m ORDER BY source""".stripMargin

  // ------------------------------------------- q_judge_position_bias

  /** First-slot preference the synthetic judge applies — chosen well
    * inside the 0–99 quality range so both consistent and flipped
    * verdicts occur (a pair flips exactly when |qa − qb| < 7).
    */
  private val PosBonus = 7

  /** Judge position-bias audit via swapped-order re-judging (Zheng et
    * al. 2023 §3.3): consecutive events of a user form an (A, B)
    * response pair; a synthetic judge with hash qualities q and a
    * [[PosBonus]]-point first-slot preference rules each pair TWICE —
    * once per presentation order — and the audit reports, per pair
    * category (A's event type), how often the two verdicts agree
    * (position-consistent) and how often the first slot wins across
    * all 2n judgments (0.5 for an unbiased judge). Integer compares
    * decide every verdict. Shape: one window over users (pairing +
    * lead — one shuffle), then a 5-row aggregate.
    */
  def qJudgePositionBias(s: SparkSession, dir: String): DataFrame = {
    val paired = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(wUser))
      .withColumn("qa", h("judge_q", col("event_id")) % 100)
      .withColumn("qb", lead("qa", 1).over(wUser))
      .where(col("rn") % 2 === 1 && col("qb").isNotNull)
      .select(col("event_type").as("category"),
        when(col("qa") + PosBonus > col("qb"), 1L).otherwise(0L).as("a_wins_1st"),
        when(col("qb") + PosBonus > col("qa"), 1L).otherwise(0L).as("b_wins_1st"))
    paired.groupBy("category")
      .agg(count(lit(1)).as("n_pairs"),
        // exactly one of the two verdicts names the same response ⇔
        // the winner did not depend on presentation order; sum = 2
        // means BOTH orders crowned the first slot — a position flip
        sum(when(col("a_wins_1st") + col("b_wins_1st") === 1L, 1L).otherwise(0L))
          .as("n_consistent"),
        sum(col("a_wins_1st") + col("b_wins_1st")).as("n_first_wins"))
      .select(col("category"), col("n_pairs"), col("n_consistent"),
        round(col("n_consistent").cast(DoubleType) / col("n_pairs"), 6)
          .as("consistency_rate"),
        round(col("n_first_wins").cast(DoubleType) / (col("n_pairs") * 2), 6)
          .as("first_win_rate"))
      .orderBy("category")
  }

  private val qJudgePositionBiasSql =
    s"""WITH r AS (SELECT user_id, event_type,
       |    row_number() OVER wu AS rn,
       |    ${hSql("judge_q", "event_id")} % 100 AS qa,
       |    lead(${hSql("judge_q", "event_id")} % 100) OVER wu AS qb
       |  FROM events WINDOW wu AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |p AS (SELECT event_type AS category,
       |    CASE WHEN qa + $PosBonus > qb THEN 1 ELSE 0 END AS a_wins_1st,
       |    CASE WHEN qb + $PosBonus > qa THEN 1 ELSE 0 END AS b_wins_1st
       |  FROM r WHERE rn % 2 = 1 AND qb IS NOT NULL)
       |SELECT category, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(CASE WHEN a_wins_1st + b_wins_1st = 1 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_consistent,
       |  round(CAST(SUM(CASE WHEN a_wins_1st + b_wins_1st = 1 THEN 1 ELSE 0 END)
       |    AS DOUBLE) / COUNT(*), 6) AS consistency_rate,
       |  round(CAST(SUM(a_wins_1st + b_wins_1st) AS DOUBLE)
       |    / (COUNT(*) * 2), 6) AS first_win_rate
       |FROM p GROUP BY category ORDER BY category""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bon_overopt" -> (qBonOveropt(_, _)),
    "q_pref_transitivity" -> (qPrefTransitivity(_, _)),
    "q_step_kl" -> (qStepKl(_, _)),
    "q_reward_length_slope" -> (qRewardLengthSlope(_, _)),
    "q_judge_position_bias" -> (qJudgePositionBias(_, _)))

  def oracles: Map[String, String] = Map(
    "q_bon_overopt" -> qBonOveroptSql,
    "q_pref_transitivity" -> qPrefTransitivitySql,
    "q_step_kl" -> qStepKlSql,
    "q_reward_length_slope" -> qRewardLengthSlopeSql,
    "q_judge_position_bias" -> qJudgePositionBiasSql)
}
