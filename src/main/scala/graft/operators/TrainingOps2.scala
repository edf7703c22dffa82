package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Data-selection and mixture operators — the step between a cleaned
  * corpus and a training run: decide HOW MUCH of each domain to keep,
  * WHICH documents fill a token budget, and how to sample when weights
  * matter.
  *
  *  - `q_domain_mix`: domain rebalancing. Per-source token mass →
  *    per-source sampling rate that flattens the mixture to a uniform
  *    target (`rate = min(1, (T/S)/tokens_src)`), plus the expected
  *    post-sampling token count. One narrow aggregate + a broadcast of
  *    the S-row totals — at 100 TB this is a map-side-combined reduce
  *    to |sources| rows, and the rates then drive `q_hash_sample`-style
  *    deterministic filters.
  *  - `q_token_budget`: quality-ranked greedy selection under a global
  *    token budget (top documents by type-token ratio until the budget
  *    is spent). The naive formulation is a GLOBAL running sum — a
  *    single-partition window barrier at scale. Implemented instead as
  *    the two-phase parallel prefix sum: coarse quality buckets
  *    (monotone in the sort key) are aggregated to per-bucket token
  *    totals, a ~20-row running offset is broadcast back, and the
  *    within-bucket window runs partitioned by bucket — every partition
  *    windows concurrently, same answer as the global window (the
  *    oracle IS the global window).
  *  - `q_weighted_sample`: weighted sampling without replacement via
  *    exponential keys (Efraimidis–Spirakis A-ES): priority =
  *    ln(u)/weight with u a deterministic uniform from the portable
  *    hash; top-K priorities = a weighted sample, reproducible across
  *    runs and partitionings. TakeOrdered top-K — per-partition heaps +
  *    driver merge, no global sort. ln is transcendental → priority
  *    rounded at 1e-6 on both sides with doc_id tiebreak (NOTES #3).
  *  - `q_outlier_trim`: winsorization at exact order statistics. The
  *    p1/p99 bounds are the k-th smallest / (n-k+1)-th largest values
  *    fetched with orderBy+limit (TakeOrderedAndProject: per-partition
  *    top-k, no global sort — k is 1% of n, the only rows that move),
  *    then one clamp-and-aggregate pass. Quantized sums keep the
  *    clamped total engine-exact.
  */
object TrainingOps2 {

  private def nTok = size(split(col("text"), " ")).cast(LongType)

  // ---------------------------------------------------------------------
  // Domain mixture rebalancing
  // ---------------------------------------------------------------------

  def qDomainMix(s: SparkSession, dir: String): DataFrame = {
    val bySrc = Tables(s, dir, "documents")
      .select(col("source"), nTok.as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"))
    val totals = bySrc.agg(
      sum("tokens").as("total_tokens"), count(lit(1)).as("n_sources"))
    val rate = least(lit(1.0),
      col("total_tokens").cast(DoubleType) / (col("n_sources") * col("tokens")))
    bySrc.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("tokens"),
        rate.as("sample_rate"),
        floor(rate * col("tokens")).cast(LongType).as("expected_tokens"))
      .orderBy("source")
  }

  private val qDomainMixSql =
    """WITH s AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens,
      |             COUNT(*) AS n_sources FROM s)
      |SELECT s.source, s.n_docs, s.tokens,
      |  least(1.0, CAST(t.total_tokens AS DOUBLE) / (t.n_sources * s.tokens)) AS sample_rate,
      |  CAST(floor(least(1.0, CAST(t.total_tokens AS DOUBLE) / (t.n_sources * s.tokens))
      |    * s.tokens) AS BIGINT) AS expected_tokens
      |FROM s, t ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // Token-budget greedy selection (two-phase parallel prefix sum)
  // ---------------------------------------------------------------------

  private val Budget = 10000L
  private val NBuckets = 20

  def qTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables(s, dir, "documents")
      .select(col("doc_id"), nTok.as("n_tok"),
        (size(array_distinct(split(col("text"), " "))).cast(DoubleType) /
          size(split(col("text"), " "))).as("ttr"))
      // bucket is monotone nondecreasing in ttr, so ordering buckets
      // descending then (ttr desc, doc_id) within = the global order
      .withColumn("bkt", floor(col("ttr") * NBuckets).cast(LongType))
    val offsets = scored.groupBy("bkt").agg(sum("n_tok").as("btok"))
      .withColumn("offset",
        coalesce(sum("btok").over(
          Window.orderBy(desc("bkt")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("bkt", "offset")
    val inBkt = Window.partitionBy("bkt").orderBy(desc("ttr"), asc("doc_id"))
    scored.join(broadcast(offsets), "bkt")
      .withColumn("cum_tok", col("offset") + sum("n_tok").over(inBkt))
      .where(col("cum_tok") <= Budget)
      .select("doc_id", "n_tok", "ttr", "cum_tok")
      .orderBy(desc("ttr"), asc("doc_id"))
  }

  private val qTokenBudgetSql =
    s"""WITH scored AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS ttr
       |  FROM documents),
       |c AS (SELECT doc_id, n_tok, ttr,
       |    CAST(SUM(n_tok) OVER (ORDER BY ttr DESC, doc_id ASC
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
       |  FROM scored)
       |SELECT doc_id, n_tok, ttr, cum_tok FROM c
       |WHERE cum_tok <= $Budget ORDER BY ttr DESC, doc_id ASC""".stripMargin

  // ---------------------------------------------------------------------
  // Weighted sampling without replacement (A-ES exponential keys)
  // ---------------------------------------------------------------------

  private val SampleK = 100
  private val UDenom = 1073741825.0 // 2^30 + 1: u ∈ (0, 1) strictly

  def qWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val u = ((PortableHash.hash64(concat(lit("ws:"), col("doc_id").cast(StringType)))
      % 1073741824L) + 1L) / lit(UDenom)
    Tables(s, dir, "documents")
      .select(col("doc_id"), nTok.as("weight"),
        round(log(u) / nTok, 6).as("priority"))
      .orderBy(desc("priority"), asc("doc_id"))
      .limit(SampleK)
  }

  private val qWeightedSampleSql = {
    val h = PortableHash.sql("'ws:' || CAST(doc_id AS STRING)")
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
       |  round(ln(($h % 1073741824 + 1) / $UDenom)
       |    / len(string_split(text, ' ')), 6) AS priority
       |FROM documents
       |ORDER BY priority DESC, doc_id ASC LIMIT $SampleK""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Outlier winsorization at exact order statistics
  // ---------------------------------------------------------------------

  private val TrimFrac = 0.01
  private val PriceScale = 32768.0 // 2^15 (NOTES #4b: terms ≤2^36, exact)

  def qOutlierTrim(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir, "orders").select(col("o_totalprice").as("v"))
    val n = p.count()
    val k = math.ceil(TrimFrac * n).toLong
    // k-th smallest / k-th largest via TakeOrdered: only k rows reach
    // the driver-side merge, never a global sort of n
    val lo = p.orderBy(asc("v")).limit(k.toInt).agg(max("v").as("lo"))
    val hi = p.orderBy(desc("v")).limit(k.toInt).agg(min("v").as("hi"))
    val clamped = greatest(col("lo"), least(col("hi"), col("v")))
    p.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .agg(count(lit(1)).as("n"),
        min("lo").as("p_lo"), min("hi").as("p_hi"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_above"),
        sum(floor(clamped * PriceScale).cast(LongType)).as("sum_winsor_q"))
  }

  private val qOutlierTrimSql =
    s"""WITH p AS (SELECT o_totalprice AS v FROM orders),
       |n AS (SELECT COUNT(*) AS n, CAST(ceil($TrimFrac * COUNT(*)) AS BIGINT) AS k FROM p),
       |lo AS (SELECT max(v) AS lo FROM
       |  (SELECT v, row_number() OVER (ORDER BY v ASC) AS rn FROM p) rl, n
       |  WHERE rn <= k),
       |hi AS (SELECT min(v) AS hi FROM
       |  (SELECT v, row_number() OVER (ORDER BY v DESC) AS rn FROM p) rh, n
       |  WHERE rn <= k),
       |c AS (SELECT v, lo, hi, greatest(lo, least(hi, v)) AS cv FROM p, lo, hi)
       |SELECT COUNT(*) AS n, min(lo) AS p_lo, min(hi) AS p_hi,
       |  CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
       |  CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
       |  CAST(SUM(CAST(floor(cv * $PriceScale) AS BIGINT)) AS BIGINT) AS sum_winsor_q
       |FROM c""".stripMargin

  // ------------------------------------------------------- domain cap

  private val DomainCap = 10

  /** Per-domain cap sampling — the curation rule "no source may
    * contribute more than N documents" that keeps a crawl's megadomain
    * from dominating the training mix (the Gopher/C4 recipe next to
    * `q_domain_mix`'s proportional targets). Selection is the N
    * smallest portable hashes per source, so membership is a pure
    * function of the doc id: re-runs, incremental loads and other
    * workers agree on the kept set with no coordination. Runs through
    * the [[graft.plans.GroupedTopK]] physical operator — per-group
    * bounded heaps, one shuffle by source, never a full per-source
    * sort; the oracle is DuckDB's window formulation, so two different
    * algorithms must agree row-for-row.
    */
  def qDomainCap(s: SparkSession, dir: String): DataFrame = {
    // % 2^50 keeps the selection key inside double-exact range: the
    // GroupedTopK heap compares order keys as Double, and a raw 60-bit
    // hash would let two distinct keys collide at double precision
    // (breaking the tie differently than the oracle's exact BIGINT
    // order). Folded to 50 bits, any double-equal pair is exactly
    // equal in both engines and falls through to the doc_id tiebreak.
    val h = PortableHash.hash64(concat(lit("cap:"), col("doc_id").cast(StringType))) %
      lit(1125899906842624L)
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        h.as("h"))
    graft.plans.GroupedTopK(docs, s,
        Seq(col("source")), lit(0L) - col("h"), col("doc_id"), DomainCap)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .orderBy("source", "doc_id")
  }

  private val qDomainCapSql = {
    val h = PortableHash.sql("'cap:' || CAST(doc_id AS STRING)") +
      " % 1125899906842624"
    s"""SELECT doc_id, source, lang, n_chars FROM (
       |  SELECT doc_id, source, lang, n_chars,
       |    row_number() OVER (PARTITION BY source ORDER BY $h ASC, doc_id ASC)
       |      AS rk
       |  FROM documents) ranked
       |WHERE rk <= $DomainCap
       |ORDER BY source, doc_id""".stripMargin
  }

  // --------------------------------------------- effective sample size

  /** Effective sample size of the token-count importance weights, per
    * source — the readout that tells you whether `q_weighted_sample` /
    * `ta_dsir`-style weighting has quietly collapsed a source onto a
    * handful of giant documents: ESS = (Σw)²/Σw² (Kish), reported with
    * its ratio to n (1.0 = uniform weights, →1/n = one document
    * dominates). Both moments are exact BIGINT sums from the one
    * corpus pass; the two divisions are a fixed double chain.
    */
  def qEffectiveSampleSize(s: SparkSession, dir: String): DataFrame = {
    val m = Tables(s, dir, "documents")
      .select(col("source"), nTok.as("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("w").as("sw"),
        sum(col("w") * col("w")).as("sw2"))
    val ess = col("sw").cast(DoubleType) * col("sw").cast(DoubleType) /
      col("sw2").cast(DoubleType)
    m.select(col("source"), col("n"), col("sw").as("total_tokens"),
        round(ess, 6).as("ess"),
        round(ess / col("n").cast(DoubleType), 6).as("ess_ratio"))
      .orderBy("source")
  }

  private val qEffectiveSampleSizeSql =
    """WITH m AS (
      |  SELECT source, COUNT(*) AS n,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sw,
      |    CAST(SUM(len(string_split(text, ' ')) * len(string_split(text, ' ')))
      |      AS BIGINT) AS sw2
      |  FROM documents GROUP BY source)
      |SELECT source, n, sw AS total_tokens,
      |  round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE), 6)
      |    AS ess,
      |  round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE)
      |    / CAST(n AS DOUBLE), 6) AS ess_ratio
      |FROM m ORDER BY source""".stripMargin

  // -------------------------------------------- q_mixture_temperature

  private val MixTaus = Seq(0.3, 0.5, 0.7, 1.0)

  /** Temperature-based mixture-weight curve (the multilingual/domain
    * sampling rule of XLM-R / mT5: draw from source i with probability
    * ∝ pᵢ^τ, τ < 1 up-weighting the tail): for every τ on the grid,
    * each source's normalized sampling weight and its upsampling
    * factor weight/pᵢ — the whole tuning table a data-mixing run picks
    * its τ from, in one pass. Exactness: pᵢ is one division of exact
    * BIGINTs; pow() is the only libm call and is rounded to 9 dp
    * immediately (the ta_ngram_lm rule); the per-τ normalizer folds
    * the VALUE-sorted term list SEQUENTIALLY (dimension-sized group —
    * the NOTES #35 idiom; ordering by the summands themselves lets the
    * oracle spell the identical fold in shared dialect and stay
    * parity-pinned), so partition order cannot perturb it.
    * Shapes: one keyed aggregate over the corpus, then everything is
    * |sources|·|τ|-sized — broadcast-scale at 100 TB.
    */
  def qMixtureTemperature(s: SparkSession, dir: String): DataFrame = {
    val bySrc = Tables(s, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      .groupBy("source").agg(sum("n_tok").as("tokens"))
    val tot = bySrc.agg(sum("tokens").as("all_tok"))
    val raw = bySrc.crossJoin(broadcast(tot))
      .select(col("source"), col("tokens"),
        (col("tokens").cast(DoubleType) / col("all_tok")).as("p"))
      .crossJoin(broadcast(s.range(1)
        .select(explode(lit(MixTaus.toArray)).as("tau"))))
      .select(col("source"), col("tau"), col("tokens"), col("p"),
        round(pow(col("p"), col("tau")), 9).as("w_raw"))
    val z = raw.groupBy("tau")
      .agg(sort_array(collect_list(col("w_raw"))).as("l"))
      .select(col("tau").as("zt"),
        expr("aggregate(l, CAST(0 AS DOUBLE), (acc, x) -> acc + x)").as("z"))
    raw.join(broadcast(z), col("tau") === col("zt"))
      .select(col("source"), col("tau"), col("tokens"),
        round(col("w_raw") / col("z"), 6).as("weight"),
        round(col("w_raw") / col("z") / col("p"), 6).as("upsample"))
      .orderBy("source", "tau")
  }

  private val qMixtureTemperatureSql = {
    val taus = MixTaus.map(t => s"($t)").mkString(", ")
    s"""WITH s AS (
       |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
       |  FROM documents GROUP BY source),
       |t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS all_tok FROM s),
       |g AS (SELECT CAST(tau AS DOUBLE) AS tau FROM (VALUES $taus) v(tau)),
       |raw AS (
       |  SELECT s.source, g.tau, s.tokens,
       |    CAST(s.tokens AS DOUBLE) / t.all_tok AS p,
       |    round(pow(CAST(s.tokens AS DOUBLE) / t.all_tok, g.tau), 9) AS w_raw
       |  FROM s CROSS JOIN t CROSS JOIN g),
       |z AS (
       |  SELECT tau AS zt, list_aggregate(list_sort(array_agg(w_raw)), 'sum') AS z
       |  FROM raw GROUP BY tau)
       |SELECT r.source, r.tau, r.tokens,
       |  round(r.w_raw / z.z, 6) AS weight,
       |  round(r.w_raw / z.z / r.p, 6) AS upsample
       |FROM raw r JOIN z ON z.zt = r.tau
       |ORDER BY source, tau""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mixture_temperature" -> (qMixtureTemperature(_, _)),
    "q_ess" -> (qEffectiveSampleSize(_, _)),
    "q_domain_cap" -> (qDomainCap(_, _)),
    "q_domain_mix" -> (qDomainMix(_, _)),
    "q_token_budget" -> (qTokenBudget(_, _)),
    "q_weighted_sample" -> (qWeightedSample(_, _)),
    "q_outlier_trim" -> (qOutlierTrim(_, _)))

  def oracles: Map[String, String] = Map(
    "q_mixture_temperature" -> qMixtureTemperatureSql,
    "q_ess" -> qEffectiveSampleSizeSql,
    "q_domain_cap" -> qDomainCapSql,
    "q_domain_mix" -> qDomainMixSql,
    "q_token_budget" -> qTokenBudgetSql,
    "q_weighted_sample" -> qWeightedSampleSql,
    "q_outlier_trim" -> qOutlierTrimSql)
}
