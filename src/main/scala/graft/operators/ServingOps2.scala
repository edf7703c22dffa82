package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Serving / post-training diagnostics, second wave (round 12): the
  * KV-cache prefix-reuse audit a prefix-caching server (vLLM-style
  * block caching, RadixAttention lineage) sizes its cache from, the
  * draft-length tuning curve for speculative decoding (the K sweep
  * over [[ServingOps.qSpecDecodeAccept]]'s acceptance machinery), and
  * the router/cascade cost-quality frontier a model-cascade picks its
  * confidence threshold from. Reference scope: none in the reference
  * (an ETL loader); these extend [[ServingOps]].
  *
  * Determinism note (NOTES #35): every cross-row reduction in this
  * module is an INTEGER count/sum — the only doubles are final
  * per-output-row divisions of exact BIGINTs — so no float-fold or
  * argmax probes are needed; the frontier's dominance test compares
  * exact integers, never floats.
  */
object ServingOps2 {

  // ------------------------------------------------ q_kv_prefix_reuse

  /** KV-cache block size in tokens (vLLM's default block granularity). */
  private val KvBlock = 16

  /** KV-cache prefix-reuse audit: prompts are cached in
    * [[KvBlock]]-token blocks, and a block is reusable exactly when the
    * WHOLE prefix up to and including it matches a previously seen
    * prompt's — so the distinct (prefix-so-far) count per source IS the
    * number of KV blocks a prefix cache must materialize, and
    * total − distinct is the recomputation the cache saves. Per source:
    * requests, total full-block instances, distinct cached blocks,
    * reuse fraction, and saved tokens. Block identity is the CHAINED
    * block hash `h[i] = md5(h[i−1] ‖ '|' ‖ block-i tokens)` — the
    * radix-trie key (two prompts share h[i] iff their whole prefixes up
    * to i·16 tokens match), computed in ONE linear pass per document by
    * the codegen'd [[graft.functions.PrefixChain]] kernel. The r12
    * shape re-hashed the FULL joined prefix at every depth — Σ 16·i ≈
    * L²/32 tokens of join+hash work per document, ~9 GB of string
    * traffic for one 200k-token doc (VERDICT r12 §1); the chain carries
    * identical distinct/reuse readouts at O(L). The constant-width hash
    * is also what shuffles (never the multi-KB prefix string — the
    * 100 TB shape), and the tail partial block is never cached,
    * matching block-cache semantics. Shapes: one narrow scan, one
    * per-row kernel (heavy-kernel-spread eligible), a bounded explode,
    * then two map-side-combinable keyed aggregates.
    */
  def qKvPrefixReuse(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
    val perSource = toks.groupBy("source").agg(count(lit(1)).as("n_requests"))
    val inst = toks
      .select(col("source"),
        explode(expr(s"graft_prefix_chain(t, $KvBlock)")).as("bh"))
    val agg = inst.groupBy("source")
      .agg(count(lit(1)).as("total_blocks"),
        countDistinct(col("bh")).as("distinct_blocks"))
    perSource.join(agg, Seq("source"), "left")
      .select(col("source"), col("n_requests"),
        coalesce(col("total_blocks"), lit(0L)).as("total_blocks"),
        coalesce(col("distinct_blocks"), lit(0L)).as("distinct_blocks"))
      .select(col("source"), col("n_requests"), col("total_blocks"),
        col("distinct_blocks"),
        when(col("total_blocks") > 0,
          round((col("total_blocks") - col("distinct_blocks"))
            .cast(DoubleType) / col("total_blocks"), 6))
          .otherwise(lit(0.0)).as("reuse_frac"),
        ((col("total_blocks") - col("distinct_blocks")) * KvBlock)
          .as("saved_tokens"))
      .orderBy("source")
  }

  /** The chained-hash instance relation shared by both KV oracles: per
    * (doc, depth i), fold blocks 1..i with `md5(h ‖ '|' ‖ block)` from
    * the empty-string seed — DuckDB's native `list_reduce` over a
    * `list_prepend('', …)` seed, exactly the composition the SqlCompat
    * alias maps to Spark's `aggregate`, so the statement still
    * parity-pins. The oracle re-folds per depth (fine at verify scale);
    * the engine side computes the whole chain once per document. The
    * `i >= 1` guard keeps the all-short-docs corpus exact on the Spark
    * parity run too: `generate_series(1, 0)` is empty on DuckDB, and
    * the aliased Sequence now matches (ADVICE r12 — a phantom depth-0
    * block otherwise appears when every doc has < $KvBlock tokens).
    */
  private def kvInstSql(cols: String) =
    s"""mx AS (SELECT CAST(max(divide(len(t), $KvBlock)) AS BIGINT) AS m FROM toks),
       |blocks AS (SELECT unnest(generate_series(1, m)) AS i FROM mx),
       |inst AS (
       |  SELECT $cols,
       |    list_reduce(
       |      list_prepend('', list_transform(generate_series(1, CAST(i AS INTEGER)),
       |        j -> array_to_string(array_slice(t,
       |          CAST((j - 1) * $KvBlock + 1 AS INTEGER),
       |          CAST(j * $KvBlock AS INTEGER)), ' '))),
       |      (h, b) -> md5(h || '|' || b)) AS bh
       |  FROM toks CROSS JOIN blocks
       |  WHERE i >= 1 AND i <= divide(len(t), $KvBlock))""".stripMargin

  private val qKvPrefixReuseSql =
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
       |per AS (SELECT source, COUNT(*) AS n_requests FROM toks GROUP BY source),
       |${kvInstSql("source")},
       |agg AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS total_blocks,
       |    CAST(COUNT(DISTINCT bh) AS BIGINT) AS distinct_blocks
       |  FROM inst GROUP BY source)
       |SELECT p.source, p.n_requests,
       |  coalesce(a.total_blocks, 0) AS total_blocks,
       |  coalesce(a.distinct_blocks, 0) AS distinct_blocks,
       |  CASE WHEN coalesce(a.total_blocks, 0) > 0
       |    THEN round(CAST(a.total_blocks - a.distinct_blocks AS DOUBLE)
       |      / a.total_blocks, 6)
       |    ELSE CAST(0 AS DOUBLE) END AS reuse_frac,
       |  (coalesce(a.total_blocks, 0) - coalesce(a.distinct_blocks, 0))
       |    * $KvBlock AS saved_tokens
       |FROM per p LEFT JOIN agg a ON a.source = p.source
       |ORDER BY p.source""".stripMargin

  // --------------------------------------------- q_draft_length_curve

  /** Draft-length grid; the max bounds the position fan-out. */
  private val DraftKs = Seq(2, 4, 8, 16)
  private val DraftKMax = DraftKs.max

  /** Cost of one drafted token relative to one target-model token —
    * an exact eighth so the speedup arithmetic stays bit-stable.
    */
  private val DraftCostNum = 1
  private val DraftCostDen = 8

  /** Draft-length tuning curve for speculative decoding: the
    * [[ServingOps.qSpecDecodeAccept]] acceptance model swept over
    * K ∈ {2, 4, 8, 16} (the ann_recall_curve pattern — one fan-out, the
    * whole tuning table in one pass). The per-(request, position)
    * acceptance bits reuse q_spec_decode_accept's EXACT hash stream
    * ("sd:<id>:<p>"), so the K = 8 column of this curve equals that
    * query row-for-row (spec-pinned), and accepted totals are monotone
    * nondecreasing in K by construction (a longer draft window can
    * only extend the accepted prefix). The speedup proxy divides
    * tokens-per-step by the relative step cost (K drafts at 1/8 target
    * cost + 1 verify) — the readout that picks K. Shapes: one bounded
    * fan-out (×Σ K after the narrow scan), a keyed min per
    * (request, K), a keyed sum; every cross-row reduction is integer.
    */
  def qDraftLengthCurve(s: SparkSession, dir: String): DataFrame = {
    val draftBit = graft.functions.PortableHash.hash64(
      concat(lit("sd:"), col("event_id").cast(StringType),
        lit(":"), col("p").cast(StringType)))
    val pos = Tables(s, dir, "events")
      .select(col("event_id"), col("event_type"))
      .withColumn("k", explode(lit(DraftKs.toArray)))
      .withColumn("p", explode(sequence(lit(0), lit(DraftKMax - 1))))
      .where(col("p") < col("k"))
      .withColumn("rej", when(draftBit % 4 === 0, col("p").cast(LongType)))
    val acc = pos.groupBy("event_id", "event_type", "k")
      .agg(coalesce(min("rej"), col("k").cast(LongType)).as("acc"))
    acc.groupBy("event_type", "k")
      .agg(count(lit(1)).as("n_requests"),
        sum("acc").as("accepted_total"),
        (sum(col("acc") + 1).cast(DoubleType) / count(lit(1)))
          .as("tokens_per_step"))
      .select(col("event_type"), col("k"), col("n_requests"),
        col("accepted_total"), col("tokens_per_step"),
        round(col("tokens_per_step") /
          (col("k").cast(DoubleType) * DraftCostNum / DraftCostDen + 1.0), 6)
          .as("speedup"))
      .orderBy("event_type", "k")
  }

  private val qDraftLengthCurveSql = {
    val h = graft.functions.PortableHash.sql(
      "'sd:' || CAST(event_id AS STRING) || ':' || CAST(p AS STRING)")
    val ks = DraftKs.map(k => s"($k)").mkString(", ")
    s"""WITH ks AS (SELECT CAST(k AS INTEGER) AS k FROM (VALUES $ks) v(k)),
       |pos AS (
       |  SELECT event_id, event_type, ks.k, p,
       |    CASE WHEN $h % 4 = 0 THEN p END AS rej
       |  FROM events CROSS JOIN ks CROSS JOIN range(0, $DraftKMax) r(p)
       |  WHERE p < ks.k),
       |acc AS (
       |  SELECT event_id, event_type, k,
       |    coalesce(min(rej), k) AS acc
       |  FROM pos GROUP BY 1, 2, 3)
       |SELECT event_type, k, COUNT(*) AS n_requests,
       |  CAST(SUM(acc) AS BIGINT) AS accepted_total,
       |  CAST(SUM(acc + 1) AS DOUBLE) / COUNT(*) AS tokens_per_step,
       |  round(CAST(SUM(acc + 1) AS DOUBLE) / COUNT(*)
       |    / (CAST(k AS DOUBLE) * $DraftCostNum / $DraftCostDen + 1.0), 6)
       |    AS speedup
       |FROM acc GROUP BY 1, 2 ORDER BY event_type, k""".stripMargin
  }

  // ------------------------------------------------ q_router_frontier

  /** Confidence thresholds in milli-units (route-to-small when
    * conf ≥ thr), and the big/small cost ratio.
    */
  private val RouterThresholds = Seq(500, 600, 700, 800, 900)
  private val BigCost = 8

  /** Router / cascade cost-quality frontier: a two-model cascade sends
    * a request to the SMALL model when a confidence score clears the
    * threshold, else to the big model; sweeping the threshold yields
    * the (cost, accuracy) curve, and the Pareto-undominated points are
    * the operating frontier (the skyline over thresholds). The
    * synthetic-but-calibrated ground truth: confidence is the portable
    * hash in milli-units, the small model's correctness is a Bernoulli
    * whose probability RISES with confidence (0.55 + 0.4·conf — so the
    * threshold genuinely trades cost against quality), the big model is
    * a flat 0.9; the Bernoulli test is the cross-multiplied integer
    * compare (bit·1000 < 550000 + 400·conf — no division anywhere), so
    * both the route decision and the correctness bits are engine-exact.
    * Dominance is tested on the exact integer (n_small, n_correct)
    * pair — more-to-small is strictly cheaper at equal n, never on
    * rounded doubles. Shapes: one scan × |grid| fan-out, one keyed
    * aggregate, then a |grid|²-row dominance join — broadcast-scale at
    * any corpus size.
    */
  def qRouterFrontier(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash.hash64
    val conf = hash64(concat(lit("rt1:"), col("event_id").cast(StringType))) % 1000
    val smallOk = when(
      hash64(concat(lit("rt2:"), col("event_id").cast(StringType))) % 1000 * 1000 <
        lit(550000L) + lit(400L) * col("conf"),
      1L).otherwise(0L)
    val bigOk = when(
      hash64(concat(lit("rt3:"), col("event_id").cast(StringType))) % 1000 < 900,
      1L).otherwise(0L)
    val scored = Tables(s, dir, "events")
      .select(col("event_id"), conf.as("conf"))
      .select(col("event_id"), col("conf"), smallOk.as("small_ok"), bigOk.as("big_ok"))
    val r = scored
      .crossJoin(broadcast(s.range(1).select(
        explode(lit(RouterThresholds.map(_.toLong).toArray)).as("thr"))))
      .groupBy("thr")
      .agg(count(lit(1)).as("n"),
        sum(when(col("conf") >= col("thr"), 1L).otherwise(0L)).as("n_small"),
        sum(when(col("conf") >= col("thr"), col("small_ok"))
          .otherwise(col("big_ok"))).as("n_correct"))
    val b = r.select(col("thr").as("bthr"), col("n_small").as("bs"),
      col("n_correct").as("bc"))
    val dom = r.join(broadcast(b),
        col("bs") >= col("n_small") && col("bc") >= col("n_correct") &&
          (col("bs") > col("n_small") || col("bc") > col("n_correct")),
        "left")
      .groupBy("thr", "n", "n_small", "n_correct")
      .agg(count(col("bthr")).as("n_dominators"))
    dom.select(col("thr").as("threshold_milli"),
        col("n_small").as("n_routed_small"),
        round(col("n_small").cast(DoubleType) / col("n"), 6).as("frac_small"),
        round(col("n_correct").cast(DoubleType) / col("n"), 6).as("accuracy"),
        round((col("n_small") + lit(BigCost) * (col("n") - col("n_small")))
          .cast(DoubleType) / col("n"), 6).as("mean_cost"),
        (col("n_dominators") === 0).as("on_frontier"))
      .orderBy("threshold_milli")
  }

  private val qRouterFrontierSql = {
    import graft.functions.PortableHash.{sql => hsql}
    val h1 = hsql("'rt1:' || CAST(event_id AS STRING)")
    val h2 = hsql("'rt2:' || CAST(event_id AS STRING)")
    val h3 = hsql("'rt3:' || CAST(event_id AS STRING)")
    val grid = RouterThresholds.map(t => s"($t)").mkString(", ")
    s"""WITH g AS (SELECT CAST(t AS BIGINT) AS thr FROM (VALUES $grid) v(t)),
       |e AS (
       |  SELECT event_id, $h1 % 1000 AS conf,
       |    CASE WHEN $h2 % 1000 * 1000 < 550000 + 400 * ($h1 % 1000)
       |      THEN 1 ELSE 0 END AS small_ok,
       |    CASE WHEN $h3 % 1000 < 900 THEN 1 ELSE 0 END AS big_ok
       |  FROM events),
       |r AS (
       |  SELECT g.thr, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN e.conf >= g.thr THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_small,
       |    CAST(SUM(CASE WHEN e.conf >= g.thr THEN e.small_ok ELSE e.big_ok END)
       |      AS BIGINT) AS n_correct
       |  FROM e CROSS JOIN g GROUP BY g.thr),
       |dom AS (
       |  SELECT a.thr, a.n, a.n_small, a.n_correct,
       |    CAST(COUNT(b.thr) AS BIGINT) AS n_dominators
       |  FROM r a LEFT JOIN r b
       |    ON b.n_small >= a.n_small AND b.n_correct >= a.n_correct
       |    AND (b.n_small > a.n_small OR b.n_correct > a.n_correct)
       |  GROUP BY 1, 2, 3, 4)
       |SELECT thr AS threshold_milli, n_small AS n_routed_small,
       |  round(CAST(n_small AS DOUBLE) / n, 6) AS frac_small,
       |  round(CAST(n_correct AS DOUBLE) / n, 6) AS accuracy,
       |  round(CAST(n_small + $BigCost * (n - n_small) AS DOUBLE) / n, 6)
       |    AS mean_cost,
       |  n_dominators = 0 AS on_frontier
       |FROM dom ORDER BY threshold_milli""".stripMargin
  }

  // ----------------------------------------------- q_kv_depth_profile

  /** KV prefix-sharing DEPTH profile — [[qKvPrefixReuse]]'s global
    * companion readout: at each block depth i, how many prompts reach
    * that depth and how many DISTINCT prefix blocks they fan out into —
    * the trie-shape curve that locates where shared system-prompt
    * prefixes end and per-request content begins (reuse ≈ 1 at shallow
    * depths, → 0 where prompts diverge), which is what sizes the cache
    * tier per depth. Block identity is the chained block hash
    * ([[qKvPrefixReuse]]'s radix-trie key — whole-prefix equality
    * preserved, linear per document), so identical prefixes share
    * across sources — a GLOBAL cache's view. Shapes: one per-row
    * kernel pass, a posexplode (depth = position + 1), one keyed
    * aggregate by depth (output is max-blocks rows — data-bounded and
    * tiny); integer counts, one final division per row.
    */
  def qKvDepthProfile(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents").select(split(col("text"), " ").as("t"))
    toks
      .select(posexplode(expr(s"graft_prefix_chain(t, $KvBlock)")).as(Seq("p", "bh")))
      .select((col("p") + 1).as("depth"), col("bh"))
      .groupBy("depth")
      .agg(count(lit(1)).as("n_docs_reaching"),
        countDistinct(col("bh")).as("distinct_blocks"))
      .select(col("depth"), col("n_docs_reaching"), col("distinct_blocks"),
        round((col("n_docs_reaching") - col("distinct_blocks"))
          .cast(DoubleType) / col("n_docs_reaching"), 6).as("reuse_frac"))
      .orderBy("depth")
  }

  private val qKvDepthProfileSql =
    s"""WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
       |${kvInstSql(s"CAST(i AS INTEGER) AS depth")}
       |SELECT depth, COUNT(*) AS n_docs_reaching,
       |  CAST(COUNT(DISTINCT bh) AS BIGINT) AS distinct_blocks,
       |  round(CAST(COUNT(*) - COUNT(DISTINCT bh) AS DOUBLE) / COUNT(*), 6)
       |    AS reuse_frac
       |FROM inst GROUP BY depth ORDER BY depth""".stripMargin

  // ----------------------------------------------- q_cache_ttl_curve

  /** Response-cache TTL grid in seconds. */
  private val CacheTtls = Seq(60, 300, 900, 3600)

  /** Response-cache TTL tuning curve: a per-user cache serves a repeat
    * request when the SAME user's previous request arrived within the
    * TTL (sliding expiry — each request refreshes its entry), so the
    * hit rate at TTL t is the fraction of requests whose backward gap
    * is ≤ t. One lag window per user computes every gap once; the TTL
    * grid then sweeps over the gap relation (the tuning-curve pattern —
    * ann_recall_curve / q_draft_length_curve), with the boundary
    * INCLUSIVE (gap = TTL hits — pinned by the spec). All arithmetic
    * is integer epoch-milliseconds; the single division per output row
    * closes the curve. Shapes: one window partitioned by the natural
    * key, a ×|grid| fan-out of a single BIGINT column, one keyed
    * aggregate.
    */
  def qCacheTtlCurve(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = Tables(s, dir, "events")
      .select(col("user_id"), col("ts").cast(TimestampType).as("ts"),
        col("event_id"))
      .withColumn("gap_ms",
        unix_millis(col("ts")) - unix_millis(lag("ts", 1).over(w)))
      .select(col("gap_ms"))
    gaps
      .crossJoin(broadcast(s.range(1).select(
        explode(lit(CacheTtls.map(_.toLong).toArray)).as("ttl_s"))))
      .groupBy("ttl_s")
      .agg(count(lit(1)).as("n_requests"),
        sum(when(col("gap_ms").isNotNull &&
          col("gap_ms") <= col("ttl_s") * 1000, 1L).otherwise(0L)).as("n_hits"))
      .select(col("ttl_s"), col("n_requests"), col("n_hits"),
        round(col("n_hits").cast(DoubleType) / col("n_requests"), 6)
          .as("hit_rate"))
      .orderBy("ttl_s")
  }

  private val qCacheTtlCurveSql = {
    val grid = CacheTtls.map(t => s"($t)").mkString(", ")
    val hit = "CASE WHEN gap_ms IS NOT NULL AND gap_ms <= ttl_s * 1000 THEN 1 ELSE 0 END"
    s"""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
       |g AS (
       |  SELECT epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id)) AS gap_ms
       |  FROM e),
       |t AS (SELECT CAST(t AS BIGINT) AS ttl_s FROM (VALUES $grid) v(t))
       |SELECT ttl_s, COUNT(*) AS n_requests,
       |  CAST(SUM($hit) AS BIGINT) AS n_hits,
       |  round(CAST(SUM($hit) AS DOUBLE) / COUNT(*), 6) AS hit_rate
       |FROM g CROSS JOIN t GROUP BY ttl_s ORDER BY ttl_s""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kv_prefix_reuse" -> (qKvPrefixReuse(_, _)),
    "q_kv_depth_profile" -> (qKvDepthProfile(_, _)),
    "q_draft_length_curve" -> (qDraftLengthCurve(_, _)),
    "q_router_frontier" -> (qRouterFrontier(_, _)),
    "q_cache_ttl_curve" -> (qCacheTtlCurve(_, _)))

  def oracles: Map[String, String] = Map(
    "q_kv_prefix_reuse" -> qKvPrefixReuseSql,
    "q_kv_depth_profile" -> qKvDepthProfileSql,
    "q_draft_length_curve" -> qDraftLengthCurveSql,
    "q_router_frontier" -> qRouterFrontierSql,
    "q_cache_ttl_curve" -> qCacheTtlCurveSql)
}
