package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Preference-data and benchmark-evaluation wave: the operators an
  * RLHF / evaluation pipeline runs after generation — preference-pair
  * construction (DPO-style chosen/rejected), Bradley–Terry strength
  * fitting over pairwise outcomes, inter-annotator agreement (Fleiss'
  * kappa), the unbiased pass@k estimator, McNemar's paired-model
  * test, BLEU-style n-gram overlap scoring, and a padding-waste audit
  * of length-bucketed batching. Reference scope: none in the
  * reference (an ETL loader); these extend the eval surface beside
  * [[EvalOps]]/[[EvalOps2]]/[[EvalOps3]].
  */
object PrefOps {

  // --------------------------------------------------- q_pref_pairs

  /** DPO-style preference-pair construction: each user's events are
    * treated as scored candidate responses to one prompt; emit the
    * (chosen, rejected) pair — highest vs lowest score, ties broken
    * to the smallest event id — plus the score margin, skipping
    * degenerate prompts where all scores tie. Both elections are
    * map-side-combinable `min(struct(...))` argmaxes in ONE aggregate
    * over the prompt key (no windows, no self-join), so the shape is
    * a single shuffle on `user_id` at any corpus size.
    */
  def qPrefPairs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy("user_id")
      .agg(
        min(struct((-col("value")).as("v"), col("event_id").as("id"))).as("ch"),
        min(struct(col("value").as("v"), col("event_id").as("id"))).as("rj"),
        max("value").as("mx"), min("value").as("mn"),
        count(lit(1)).as("n_candidates"))
      .where(col("mx") > col("mn"))
      .select(col("user_id").as("prompt_id"), col("ch.id").as("chosen_id"),
        col("rj.id").as("rejected_id"), round(col("mx") - col("mn"), 6).as("margin"),
        col("n_candidates"))
      .orderBy("prompt_id")

  private val qPrefPairsSql =
    """WITH ch AS (
      |  SELECT user_id, chosen_id FROM (
      |    SELECT user_id, event_id AS chosen_id,
      |      row_number() OVER (PARTITION BY user_id
      |        ORDER BY value DESC, event_id ASC) AS rk
      |    FROM events) WHERE rk = 1),
      |rj AS (
      |  SELECT user_id, rejected_id FROM (
      |    SELECT user_id, event_id AS rejected_id,
      |      row_number() OVER (PARTITION BY user_id
      |        ORDER BY value ASC, event_id ASC) AS rk
      |    FROM events) WHERE rk = 1),
      |g AS (SELECT user_id, MAX(value) AS mx, MIN(value) AS mn,
      |        COUNT(*) AS n_candidates
      |      FROM events GROUP BY user_id)
      |SELECT g.user_id AS prompt_id, ch.chosen_id, rj.rejected_id,
      |  round(g.mx - g.mn, 6) AS margin, g.n_candidates
      |FROM g JOIN ch ON ch.user_id = g.user_id
      |JOIN rj ON rj.user_id = g.user_id
      |WHERE g.mx > g.mn ORDER BY prompt_id""".stripMargin

  // ------------------------------------------------ q_bradley_terry

  private val BtRounds = 3

  /** Bradley–Terry strength fitting over pairwise preference
    * outcomes. Each user compares every pair of event types they
    * scored (winner = higher per-user MAX score — max, not mean, so
    * the comparison is float-order independent; exact ties abstain);
    * the per-pair win/game counts then drive [[BtRounds]] rounds of
    * the classic MM update p_i ← W_i / Σ_j n_ij/(p_i+p_j) (Hunter,
    * "MM algorithms for generalized Bradley-Terry models", Ann.
    * Stat. 2004) from p=1. The comparison relation is keyed by user
    * (never all-pairs over rows), and the iteration runs on the
    * type×type match matrix — dimension-sized, constant in the
    * corpus, so every round is a broadcast-scale join at 100 TB.
    */
  def qBradleyTerry(s: SparkSession, dir: String): DataFrame = {
    val rep = Tables(s, dir, "events")
      .groupBy("user_id", "event_type").agg(max("value").as("v"))
    val a = rep.select(col("user_id"), col("event_type").as("ta"), col("v").as("va"))
    val b = rep.select(col("user_id"), col("event_type").as("tb"), col("v").as("vb"))
    val games = a.join(b, Seq("user_id"))
      .where(col("ta") < col("tb") && col("va") =!= col("vb"))
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("n"),
        sum(when(col("va") > col("vb"), 1L).otherwise(0L)).as("wa"))
    // r16 (guide §2.4): the unrolled MM rounds reference `m` 3× and
    // `wtot` 5×, and Spark shares no subplans without materialization —
    // the events scan → per-user rep → user self-join → games chain
    // re-executed once per reference (184 parquet scans / 444 exchanges
    // in the before-plan; only the exchanges dedupe at runtime, the
    // data-sized self-join re-runs). The match matrix is
    // dimension-sized (|event_type|² rows, constant in the corpus), so
    // one eager localCheckpoint of `m` (and of the |types|-row `wtot`)
    // collapses the whole plan to ONE pass over the events-derived
    // chain; every round is then arithmetic over materialized
    // broadcast-scale rows. Values are untouched: the rounds consume
    // the same rows, and the sorted-fold denominator is
    // partitioning-independent by construction.
    val m = games.select(col("ta").as("i"), col("tb").as("j"), col("n"), col("wa").as("w"))
      .unionAll(games.select(col("tb").as("i"), col("ta").as("j"), col("n"),
        (col("n") - col("wa")).as("w")))
      .localCheckpoint()
    val wtot = m.groupBy("i").agg(sum("w").as("wins"), sum("n").as("games"))
      .localCheckpoint()
    var p = wtot.select(col("i"), lit(1.0).as("p"))
    for (_ <- 1 to BtRounds) {
      // the denominator folds the VALUE-sorted term list SEQUENTIALLY:
      // the group is |types|-sized, so collect_list is bounded by the
      // dimension; ordering by the summands themselves means partition
      // order can't perturb the double sum AND the oracle spells the
      // identical fold in shared dialect
      // (list_aggregate(list_sort(array_agg(term)), 'sum')), keeping
      // the statement parity-pinned on spark.sql
      val denom = m
        .join(p.select(col("i"), col("p").as("pi")), "i")
        .join(p.select(col("i").as("j"), col("p").as("pj")), "j")
        .select(col("i"),
          (col("n").cast(DoubleType) / (col("pi") + col("pj"))).as("term"))
        .groupBy("i")
        .agg(sort_array(collect_list(col("term"))).as("l"))
        .select(col("i"),
          expr("aggregate(l, CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
            .as("denom"))
      p = wtot.join(denom, "i")
        .select(col("i"),
          when(col("wins") === 0, lit(0.0))
            .otherwise(col("wins").cast(DoubleType) / col("denom")).as("p"))
        // |types| rows; materialized per round (the pagerankLoop
        // pattern) — the next round references p twice, which would
        // otherwise double the prior round's join chain per round
        .localCheckpoint()
    }
    wtot.join(p, "i")
      .select(col("i").as("event_type"), col("wins"), col("games"),
        round(col("p"), 6).as("strength"))
      .orderBy("event_type")
  }

  private val qBradleyTerrySql = {
    def iter(prev: String, cur: String) =
      s"""$cur AS (
         |  SELECT w.i, CASE WHEN w.wins = 0 THEN CAST(0 AS DOUBLE)
         |    ELSE CAST(w.wins AS DOUBLE) / d.denom END AS p
         |  FROM wtot w JOIN (
         |    SELECT m.i, list_aggregate(list_sort(array_agg(
         |        CAST(m.n AS DOUBLE) / (pi.p + pj.p))), 'sum') AS denom
         |    FROM m JOIN $prev pi ON pi.i = m.i
         |           JOIN $prev pj ON pj.i = m.j
         |    GROUP BY m.i) d ON d.i = w.i)""".stripMargin
    s"""WITH rep AS (
       |  SELECT user_id, event_type, MAX(value) AS v
       |  FROM events GROUP BY user_id, event_type),
       |games AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS n,
       |    CAST(SUM(CASE WHEN a.v > b.v THEN 1 ELSE 0 END) AS BIGINT) AS wa
       |  FROM rep a JOIN rep b ON a.user_id = b.user_id
       |  WHERE a.event_type < b.event_type AND a.v <> b.v
       |  GROUP BY 1, 2),
       |m AS (
       |  SELECT ta AS i, tb AS j, n, wa AS w FROM games
       |  UNION ALL
       |  SELECT tb AS i, ta AS j, n, n - wa AS w FROM games),
       |wtot AS (SELECT i, CAST(SUM(w) AS BIGINT) AS wins,
       |           CAST(SUM(n) AS BIGINT) AS games FROM m GROUP BY i),
       |p0 AS (SELECT i, CAST(1 AS DOUBLE) AS p FROM wtot),
       |${iter("p0", "p1")},
       |${iter("p1", "p2")},
       |${iter("p2", "p3")}
       |SELECT w.i AS event_type, w.wins, w.games, round(p.p, 6) AS strength
       |FROM wtot w JOIN p3 p ON p.i = w.i ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------------ q_fleiss_kappa

  private val FkRaters = 4

  /** Fleiss' kappa over multi-rater categorical labels: orders with
    * exactly [[FkRaters]] lineitems are items rated by 4 annotators,
    * the return flag is the assigned category. Per-item agreement
    * P_i = (Σ_j n_ij² − R)/(R(R−1)), chance agreement from the
    * category marginals, κ = (P̄ − P_e)/(1 − P_e) (Fleiss, 1971).
    * Everything until the final three divisions is INTEGER counting —
    * P̄ = (Σ_i s2_i − R·n)/(R(R−1)·n) and P_e = Σ_c cn_c²/(R·n)² are
    * ratios of exact integer sums — so the coefficient is
    * bit-identical under any partitioning and across engines. Two
    * keyed aggregates and a 3-row marginal, no windows.
    */
  def qFleissKappa(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables(s, dir, "lineitem")
      .groupBy("l_orderkey", "l_returnflag").agg(count(lit(1)).as("n"))
    val items = counts.groupBy("l_orderkey")
      .agg(sum("n").as("rtot"), sum(col("n") * col("n")).as("s2"))
      .where(col("rtot") === FkRaters)
    val tot = items.agg(count(lit(1)).as("n_items"), sum("s2").as("ss2"))
    val marg = counts.join(items.select("l_orderkey"), "l_orderkey")
      .groupBy("l_returnflag").agg(sum("n").as("cn"))
    val pb = (col("ss2") - lit(FkRaters.toLong) * col("n_items")).cast(DoubleType) /
      (lit((FkRaters * (FkRaters - 1)).toLong) * col("n_items")).cast(DoubleType)
    // square in DOUBLE space: (R·n)² overflows BIGINT near 10⁹ items,
    // and a product of two identical doubles is deterministic anyway
    val rn = col("n_items").cast(DoubleType) * FkRaters
    val pe = col("snc2").cast(DoubleType) / (rn * rn)
    marg.crossJoin(broadcast(tot))
      .groupBy("n_items", "ss2")
      .agg(sum(col("cn") * col("cn")).as("snc2"))
      .select(col("n_items"), round(pb, 6).as("p_bar"), round(pe, 6).as("p_e"),
        round((pb - pe) / (lit(1.0) - pe), 6).as("kappa"))
  }

  private val qFleissKappaSql =
    s"""WITH counts AS (
       |  SELECT l_orderkey, l_returnflag, COUNT(*) AS n
       |  FROM lineitem GROUP BY 1, 2),
       |items AS (
       |  SELECT l_orderkey, SUM(n * n) AS s2
       |  FROM counts GROUP BY 1 HAVING SUM(n) = $FkRaters),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       |  CAST(SUM(s2) AS BIGINT) AS ss2 FROM items),
       |marg AS (
       |  SELECT c.l_returnflag, SUM(c.n) AS cn
       |  FROM counts c JOIN items i ON i.l_orderkey = c.l_orderkey
       |  GROUP BY 1),
       |agg AS (
       |  SELECT t.n_items, t.ss2, CAST(SUM(m.cn * m.cn) AS BIGINT) AS snc2
       |  FROM marg m CROSS JOIN tot t GROUP BY 1, 2)
       |SELECT n_items,
       |  round(CAST(ss2 - $FkRaters * n_items AS DOUBLE)
       |    / CAST(${FkRaters * (FkRaters - 1)} * n_items AS DOUBLE), 6) AS p_bar,
       |  round(CAST(snc2 AS DOUBLE)
       |    / ((CAST(n_items AS DOUBLE) * $FkRaters) * (CAST(n_items AS DOUBLE) * $FkRaters)), 6) AS p_e,
       |  round((CAST(ss2 - $FkRaters * n_items AS DOUBLE)
       |      / CAST(${FkRaters * (FkRaters - 1)} * n_items AS DOUBLE)
       |    - CAST(snc2 AS DOUBLE)
       |      / ((CAST(n_items AS DOUBLE) * $FkRaters) * (CAST(n_items AS DOUBLE) * $FkRaters)))
       |   / (CAST(1 AS DOUBLE)
       |    - CAST(snc2 AS DOUBLE)
       |      / ((CAST(n_items AS DOUBLE) * $FkRaters) * (CAST(n_items AS DOUBLE) * $FkRaters))), 6)
       |    AS kappa
       |FROM agg""".stripMargin

  // -------------------------------------------------- q_pass_at_k

  private val PassK = 3

  /** Unbiased pass@k estimator (Chen et al., "Evaluating Large
    * Language Models Trained on Code", 2021 — §2.1): orders are
    * problems, their lineitems are sampled attempts, an attempt
    * passes when the return flag is 'R'. Per problem with n ≥ k
    * attempts and c passes, pass@k = 1 − C(n−c,k)/C(n,k), the
    * combination ratio written as the explicit k-term product (k=
    * [[PassK]]) so both engines evaluate identical arithmetic.
    * Reported per order priority; the per-problem estimates average
    * through the exact power-of-two quantization (NOTES #4b:
    * `floor(p·2³⁰)` summed as BIGINT — p ∈ [0,1], so the sum stays in
    * range past 10⁹ problems) so summation order can't leak in. One
    * keyed aggregate + one broadcast-sized join — no windows.
    */
  def qPassAtK(s: SparkSession, dir: String): DataFrame = {
    val att = Tables(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("c"))
      .where(col("n") >= PassK)
    val f = col("n") - col("c")
    val ratio = (f * (f - 1) * (f - 2)).cast(DoubleType) /
      (col("n") * (col("n") - 1) * (col("n") - 2)).cast(DoubleType)
    val pass3 = when(f < PassK, lit(1.0)).otherwise(lit(1.0) - ratio)
    val pass1 = col("c").cast(DoubleType) / col("n").cast(DoubleType)
    val P2 = 1073741824.0 // 2^30
    Tables(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      .join(att, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_problems"),
        sum(floor(pass1 * P2)).as("s1"), sum(floor(pass3 * P2)).as("s3"))
      .select(col("o_orderpriority"), col("n_problems"),
        round(col("s1").cast(DoubleType) / P2 / col("n_problems"), 6).as("pass_at_1"),
        round(col("s3").cast(DoubleType) / P2 / col("n_problems"), 6).as("pass_at_3"))
      .orderBy("o_orderpriority")
  }

  private val qPassAtKSql =
    s"""WITH att AS (
       |  SELECT l_orderkey, COUNT(*) AS n,
       |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c
       |  FROM lineitem GROUP BY 1 HAVING COUNT(*) >= $PassK)
       |SELECT o.o_orderpriority, COUNT(*) AS n_problems,
       |  round(CAST(SUM(CAST(floor(CAST(a.c AS DOUBLE) / CAST(a.n AS DOUBLE)
       |      * 1073741824.0) AS BIGINT)) AS DOUBLE) / 1073741824.0 / COUNT(*), 6)
       |    AS pass_at_1,
       |  round(CAST(SUM(CAST(floor((CASE WHEN a.n - a.c < $PassK THEN CAST(1 AS DOUBLE)
       |    ELSE CAST(1 AS DOUBLE)
       |      - CAST((a.n - a.c) * (a.n - a.c - 1) * (a.n - a.c - 2) AS DOUBLE)
       |        / CAST(a.n * (a.n - 1) * (a.n - 2) AS DOUBLE) END)
       |      * 1073741824.0) AS BIGINT)) AS DOUBLE) / 1073741824.0 / COUNT(*), 6)
       |    AS pass_at_3
       |FROM orders o JOIN att a ON a.l_orderkey = o.o_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------- q_mcnemar

  /** McNemar's test for paired model comparison: two rule models
    * predict returns on the SAME lineitem rows (A: quantity > 25,
    * B: discount > 0.05; truth: flag = 'R'), and the
    * continuity-corrected statistic (|b−c|−1)²/(b+c) over the
    * discordant cells decides whether their accuracies differ —
    * the correct test when both models score one shared eval set.
    * Pure integer counting in one scan; one row out.
    */
  def qMcnemar(s: SparkSession, dir: String): DataFrame = {
    val truth = col("l_returnflag") === "R"
    val okA = (col("l_quantity") > 25) === truth
    val okB = (col("l_discount") > 0.05) === truth
    val agg = Tables(s, dir, "lineitem")
      .agg(count(lit(1)).as("n"),
        sum(when(okA && !okB, 1L).otherwise(0L)).as("b"),
        sum(when(!okA && okB, 1L).otherwise(0L)).as("c"))
    val chi2 = pow(abs(col("b") - col("c")).cast(DoubleType) - lit(1.0), 2) /
      (col("b") + col("c")).cast(DoubleType)
    agg.select(col("n"), col("b"), col("c"), round(chi2, 6).as("chi2"),
      (chi2 > 3.841).as("significant"))
  }

  private val qMcnemarSql =
    """WITH cells AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN (l_quantity > 25) = (l_returnflag = 'R')
      |          AND NOT ((l_discount > 0.05) = (l_returnflag = 'R'))
      |        THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(SUM(CASE WHEN NOT ((l_quantity > 25) = (l_returnflag = 'R'))
      |          AND (l_discount > 0.05) = (l_returnflag = 'R')
      |        THEN 1 ELSE 0 END) AS BIGINT) AS c
      |  FROM lineitem)
      |SELECT n, b, c,
      |  round(pow(CAST(abs(b - c) AS DOUBLE) - CAST(1 AS DOUBLE), 2)
      |        / CAST(b + c AS DOUBLE), 6) AS chi2,
      |  pow(CAST(abs(b - c) AS DOUBLE) - CAST(1 AS DOUBLE), 2)
      |    / CAST(b + c AS DOUBLE) > 3.841 AS significant
      |FROM cells""".stripMargin

  // ----------------------------------------------- q_ngram_overlap

  /** BLEU-style n-gram overlap scoring: even documents are candidate
    * generations, the next odd document (same pair id) their
    * reference; modified unigram/bigram precision (clipped counts)
    * and BLEU-2 = BP·√(p1·p2) with the standard brevity penalty,
    * averaged per candidate source. Gram multisets explode linearly
    * per document and meet in a (pair, gram)-keyed join — never
    * text×text — so the shape is two keyed shuffles at any corpus
    * size. Pairs where either side has < 2 tokens are skipped (no
    * bigram precision exists).
    */
  def qNgramOverlap(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .withColumn("n_tok", size(col("toks")))
      .where(col("n_tok") >= 2)
    def grams(side: DataFrame, role: String): DataFrame = {
      val len1 = (col("n_tok") - 1).cast(IntegerType)
      val bi = zip_with(slice(col("toks"), lit(1), len1), slice(col("toks"), lit(2), len1),
        (x, y) => concat(x, lit(" "), y))
      side.select(col("pair_id"), explode(map(lit(1), col("toks"), lit(2), bi)).as(Seq("n", "gs")))
        .select(col("pair_id"), col("n"), explode(col("gs")).as("gram"))
        .groupBy("pair_id", "n", "gram").agg(count(lit(1)).as(s"${role}_cnt"))
    }
    val cand = d.where(col("doc_id") % 2 === 0)
      .withColumn("pair_id", (col("doc_id") / 2).cast(LongType))
    val ref = d.where(col("doc_id") % 2 === 1)
      .withColumn("pair_id", ((col("doc_id") - 1) / 2).cast(LongType))
      .select("pair_id", "toks", "n_tok")
    val paired = cand.select(col("pair_id"), col("source"), col("n_tok").as("c_len"))
      .join(ref.select(col("pair_id"), col("n_tok").as("r_len")), "pair_id")
    val cg = grams(cand, "c")
    val rg = grams(ref, "r")
    val clipped = cg.join(rg, Seq("pair_id", "n", "gram"))
      .groupBy("pair_id", "n")
      .agg(sum(least(col("c_cnt"), col("r_cnt"))).as("clip"))
    val totals = cg.groupBy("pair_id", "n").agg(sum("c_cnt").as("tot"))
    val prec = totals.join(clipped, Seq("pair_id", "n"), "left")
      .select(col("pair_id"), col("n"),
        (coalesce(col("clip"), lit(0L)).cast(DoubleType) / col("tot")).as("p"))
      .groupBy("pair_id")
      .agg(max(when(col("n") === 1, col("p"))).as("p1"),
        max(when(col("n") === 2, col("p"))).as("p2"))
    val bp = when(col("c_len") > col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("r_len").cast(DoubleType) / col("c_len")))
    // per-pair scores live in [0,1]: average through the exact
    // power-of-two quantization (NOTES #4b) so summation order can't
    // leak in — floor(x·2³⁰) sums stay in BIGINT range past 10⁹ pairs
    val P2 = 1073741824.0 // 2^30
    paired.join(prec, "pair_id")
      .select(col("source"), col("p1"), col("p2"),
        (bp * sqrt(col("p1") * col("p2"))).as("bleu2"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_pairs"), sum(floor(col("p1") * P2)).as("s1"),
        sum(floor(col("p2") * P2)).as("s2"), sum(floor(col("bleu2") * P2)).as("sb"))
      .select(col("source"), col("n_pairs"),
        round(col("s1").cast(DoubleType) / P2 / col("n_pairs"), 6).as("mean_p1"),
        round(col("s2").cast(DoubleType) / P2 / col("n_pairs"), 6).as("mean_p2"),
        round(col("sb").cast(DoubleType) / P2 / col("n_pairs"), 6).as("mean_bleu2"))
      .orderBy("source")
  }

  private val qNgramOverlapSql =
    """WITH d AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n_tok
      |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
      |cand AS (SELECT divide(doc_id, 2) AS pair_id, source, toks, n_tok AS c_len
      |         FROM d WHERE doc_id % 2 = 0),
      |ref AS (SELECT divide(doc_id - 1, 2) AS pair_id, toks, n_tok AS r_len
      |        FROM d WHERE doc_id % 2 = 1),
      |cg AS (
      |  SELECT pair_id, n, gram, COUNT(*) AS c_cnt FROM (
      |    SELECT pair_id, 1 AS n, unnest(toks) AS gram FROM cand
      |    UNION ALL
      |    SELECT pair_id, 2 AS n,
      |      unnest(list_transform(generate_series(1, len(toks) - 1),
      |        i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1))) AS gram
      |    FROM cand) GROUP BY 1, 2, 3),
      |rg AS (
      |  SELECT pair_id, n, gram, COUNT(*) AS r_cnt FROM (
      |    SELECT pair_id, 1 AS n, unnest(toks) AS gram FROM ref
      |    UNION ALL
      |    SELECT pair_id, 2 AS n,
      |      unnest(list_transform(generate_series(1, len(toks) - 1),
      |        i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1))) AS gram
      |    FROM ref) GROUP BY 1, 2, 3),
      |clip AS (
      |  SELECT cg.pair_id, cg.n, SUM(least(cg.c_cnt, rg.r_cnt)) AS clip
      |  FROM cg JOIN rg ON rg.pair_id = cg.pair_id AND rg.n = cg.n AND rg.gram = cg.gram
      |  GROUP BY 1, 2),
      |tot AS (SELECT pair_id, n, SUM(c_cnt) AS tot FROM cg GROUP BY 1, 2),
      |prec AS (
      |  SELECT t.pair_id,
      |    MAX(CASE WHEN t.n = 1 THEN CAST(COALESCE(c.clip, 0) AS DOUBLE) / t.tot END) AS p1,
      |    MAX(CASE WHEN t.n = 2 THEN CAST(COALESCE(c.clip, 0) AS DOUBLE) / t.tot END) AS p2
      |  FROM tot t LEFT JOIN clip c ON c.pair_id = t.pair_id AND c.n = t.n
      |  GROUP BY 1),
      |paired AS (
      |  SELECT c.pair_id, c.source, c.c_len, r.r_len
      |  FROM cand c JOIN ref r ON r.pair_id = c.pair_id),
      |scored AS (
      |  SELECT pa.source, pr.p1, pr.p2,
      |    (CASE WHEN pa.c_len > pa.r_len THEN CAST(1 AS DOUBLE)
      |      ELSE exp(CAST(1 AS DOUBLE) - CAST(pa.r_len AS DOUBLE) / pa.c_len) END)
      |    * sqrt(pr.p1 * pr.p2) AS bleu2
      |  FROM paired pa JOIN prec pr ON pr.pair_id = pa.pair_id)
      |SELECT source, COUNT(*) AS n_pairs,
      |  round(CAST(SUM(CAST(floor(p1 * 1073741824.0) AS BIGINT)) AS DOUBLE)
      |    / 1073741824.0 / COUNT(*), 6) AS mean_p1,
      |  round(CAST(SUM(CAST(floor(p2 * 1073741824.0) AS BIGINT)) AS DOUBLE)
      |    / 1073741824.0 / COUNT(*), 6) AS mean_p2,
      |  round(CAST(SUM(CAST(floor(bleu2 * 1073741824.0) AS BIGINT)) AS DOUBLE)
      |    / 1073741824.0 / COUNT(*), 6) AS mean_bleu2
      |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin

  // ----------------------------------------------------- q_pad_waste

  private val PwBatch = 8

  /** Padding-waste audit for length-bucketed batching: per source,
    * form batches of [[PwBatch]] docs in (a) arrival order and (b)
    * length-sorted order; every row in a batch pads to the batch max,
    * so waste = Σ_batch (max·count − sum). Reports both strategies
    * side by side — the measurement that justifies length-grouped
    * batching to a trainer. Windows are PARTITIONED by source (the
    * natural shard key; never a global sort), and all arithmetic is
    * integer until the final percentage.
    */
  def qPadWaste(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        ((col("n_chars") + 3) / 4).cast(LongType).as("tokens"))
    def strat(name: String, w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
      d.withColumn("batch", ((row_number().over(w) - 1) / PwBatch).cast(LongType))
        .groupBy("source", "batch")
        .agg(count(lit(1)).as("cnt"), max("tokens").as("mx"), sum("tokens").as("sm"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_batches"), sum("sm").as("total_tokens"),
          sum(col("mx") * col("cnt") - col("sm")).as("pad_tokens"))
        .select(col("source"), lit(name).as("strategy"), col("n_batches"),
          col("total_tokens"), col("pad_tokens"),
          round(col("pad_tokens").cast(DoubleType) /
            (col("pad_tokens") + col("total_tokens")), 6).as("waste_pct"))
    val arrival = strat("arrival",
      Window.partitionBy("source").orderBy(col("doc_id")))
    val sorted = strat("sorted",
      Window.partitionBy("source").orderBy(col("tokens"), col("doc_id")))
    arrival.unionAll(sorted).orderBy("source", "strategy")
  }

  private val qPadWasteSql = {
    def strat(name: String, order: String) =
      s"""SELECT source, '$name' AS strategy,
         |    CAST(COUNT(*) AS BIGINT) AS n_batches,
         |    CAST(SUM(sm) AS BIGINT) AS total_tokens,
         |    CAST(SUM(mx * cnt - sm) AS BIGINT) AS pad_tokens,
         |    round(CAST(SUM(mx * cnt - sm) AS DOUBLE)
         |          / (SUM(mx * cnt - sm) + SUM(sm)), 6) AS waste_pct
         |  FROM (
         |    SELECT source, divide(rn - 1, $PwBatch) AS batch,
         |      COUNT(*) AS cnt, MAX(tokens) AS mx, SUM(tokens) AS sm
         |    FROM (
         |      SELECT source, tokens,
         |        row_number() OVER (PARTITION BY source ORDER BY $order) AS rn
         |      FROM d)
         |    GROUP BY 1, 2)
         |  GROUP BY 1""".stripMargin
    s"""WITH d AS (
       |  SELECT source, doc_id, divide(n_chars + 3, 4) AS tokens
       |  FROM documents)
       |${strat("arrival", "doc_id")}
       |UNION ALL
       |${strat("sorted", "tokens, doc_id")}
       |ORDER BY source, strategy""".stripMargin
  }

  // ------------------------------------ q_length_debiased_winrate

  private val LwQ = 1073741824.0 // 2^30: bucket-rate fold quantization
  private val LwBuckets = 4

  /** Length-controlled pairwise win rate (the AlpacaEval 2.0 concern:
    * judges prefer LONGER responses, so a raw win rate confounds
    * quality with verbosity). Candidate pairs are adjacent documents
    * within a source; the synthetic judge scores
    * hash-quality + length/4 — length-biased BY CONSTRUCTION, so the
    * debiasing readout is observable. The debiased estimate stratifies
    * pairs by |Δlength| bucket and averages the per-bucket win rates
    * with equal weight (the coarse exact cousin of AlpacaEval's
    * logistic length control — stratification needs no fitted model,
    * so it stays engine-exact). Determinism: wins and pair counts are
    * integer until each bucket's single division; the ≤[[LwBuckets]]
    * bucket rates re-quantize to floor(r·2³⁰) BIGINTs before the
    * cross-bucket fold (NOTES #35). Shapes: one per-source window
    * (lead), two keyed integer aggregates; never a self-join.
    */
  def qLengthDebiasedWinrate(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val pairs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("b_id", lead("doc_id", 1).over(w))
      .withColumn("b_len", lead("n_chars", 1).over(w))
      .where(col("b_id").isNotNull)
      .select(col("source"),
        (graft.functions.PortableHash.hash64(
          concat(lit("lw:"), col("doc_id").cast(StringType))) % 1000 +
          expr("n_chars div 4")).as("qa"),
        (graft.functions.PortableHash.hash64(
          concat(lit("lw:"), col("b_id").cast(StringType))) % 1000 +
          expr("b_len div 4")).as("qb"),
        least(lit(LwBuckets.toLong - 1),
          expr("abs(n_chars - b_len) div 64")).as("bucket"))
      .select(col("source"), col("bucket"),
        when(col("qa") > col("qb"), 1L).otherwise(0L).as("win"))
    val byBucket = pairs.groupBy("source", "bucket")
      .agg(count(lit(1)).as("nb"), sum("win").as("wb"))
      .select(col("source"), col("nb"), col("wb"),
        floor(col("wb").cast(DoubleType) / col("nb") * LwQ)
          .cast(LongType).as("rateq"))
    byBucket.groupBy("source")
      .agg(sum("nb").as("n_pairs"), sum("wb").as("wins"),
        round(sum("wb").cast(DoubleType) / sum("nb"), 6).as("raw_rate"),
        round(sum("rateq").cast(DoubleType) / LwQ /
          count(lit(1)), 6).as("debiased_rate"),
        round(sum("wb").cast(DoubleType) / sum("nb") -
          sum("rateq").cast(DoubleType) / LwQ / count(lit(1)), 6)
          .as("length_bias_gap"))
      .orderBy("source")
  }

  private val qLengthDebiasedWinrateSql = {
    def q(id: String) = graft.functions.PortableHash.sql(
      s"'lw:' || CAST($id AS STRING)")
    s"""WITH p AS (
       |  SELECT source, doc_id, n_chars,
       |    lead(doc_id) OVER w AS b_id, lead(n_chars) OVER w AS b_len
       |  FROM documents WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
       |pw AS (
       |  SELECT source,
       |    least(${LwBuckets - 1}, divide(CAST(abs(n_chars - b_len) AS BIGINT), 64)) AS bucket,
       |    CASE WHEN ${q("doc_id")} % 1000 + divide(n_chars, 4)
       |       > ${q("b_id")} % 1000 + divide(b_len, 4) THEN 1 ELSE 0 END AS win
       |  FROM p WHERE b_id IS NOT NULL),
       |bb AS (
       |  SELECT source, bucket, COUNT(*) AS nb, CAST(SUM(win) AS BIGINT) AS wb,
       |    CAST(floor(CAST(SUM(win) AS DOUBLE) / COUNT(*) * $LwQ) AS BIGINT) AS rateq
       |  FROM pw GROUP BY 1, 2)
       |SELECT source, CAST(SUM(nb) AS BIGINT) AS n_pairs,
       |  CAST(SUM(wb) AS BIGINT) AS wins,
       |  round(CAST(SUM(wb) AS DOUBLE) / SUM(nb), 6) AS raw_rate,
       |  round(CAST(SUM(rateq) AS DOUBLE) / $LwQ / COUNT(*), 6) AS debiased_rate,
       |  round(CAST(SUM(wb) AS DOUBLE) / SUM(nb)
       |    - CAST(SUM(rateq) AS DOUBLE) / $LwQ / COUNT(*), 6) AS length_bias_gap
       |FROM bb GROUP BY source ORDER BY source""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_length_debiased_winrate" -> (qLengthDebiasedWinrate(_, _)),
    "q_pref_pairs" -> (qPrefPairs(_, _)),
    "q_bradley_terry" -> (qBradleyTerry(_, _)),
    "q_fleiss_kappa" -> (qFleissKappa(_, _)),
    "q_pass_at_k" -> (qPassAtK(_, _)),
    "q_mcnemar" -> (qMcnemar(_, _)),
    "q_ngram_overlap" -> (qNgramOverlap(_, _)),
    "q_pad_waste" -> (qPadWaste(_, _)))

  def oracles: Map[String, String] = Map(
    "q_length_debiased_winrate" -> qLengthDebiasedWinrateSql,
    "q_pref_pairs" -> qPrefPairsSql,
    "q_bradley_terry" -> qBradleyTerrySql,
    "q_fleiss_kappa" -> qFleissKappaSql,
    "q_pass_at_k" -> qPassAtKSql,
    "q_mcnemar" -> qMcnemarSql,
    "q_ngram_overlap" -> qNgramOverlapSql,
    "q_pad_waste" -> qPadWasteSql)
}
