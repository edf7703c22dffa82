package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Third training-data wave: the operators a contrastive-training and
  * data-quality pipeline runs between curation and the trainer —
  * hard-negative mining, deterministic negative sampling, curriculum
  * scheduling, ranking evaluation (MAP@K), and three distribution
  * diagnostics (Benford digit test, Hill tail index, embedding
  * centering stats). Reference scope: none in the reference (an ETL
  * loader); these extend the training/eval surface beside
  * [[TrainingOps]]/[[EvalOps]].
  */
object TrainingOps3 {

  // ------------------------------------------------ q_hard_negatives

  private val AnchorMod = 37
  private val NegK = 5

  /** Contrastive hard-negative mining: for every anchor vector (a
    * deterministic 1/[[AnchorMod]] sample), the [[NegK]] highest-cosine
    * vectors with a DIFFERENT label inside the anchor's own IVF cell —
    * the "hardest" negatives by construction, since the coarse
    * quantizer already put them next to the anchor. Candidate
    * generation is the cell equi-join (bucket-bounded, the
    * [[Similarity.assignCells]] machinery and its shared cache — never
    * an all-pairs scan), scoring is the codegen'd float dot kernel,
    * and the per-anchor cut runs on the native [[graft.plans.GroupedTopK]]
    * bounded heap, not a window sort. At 100 TB the cell id is the
    * partition key and every stage stays linear in candidates.
    */
  def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val e = Similarity.withNorm(s, emb)
    val centroids = e.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val cl = Similarity.assignCells(e, centroids)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
    val anchors = cl.where(col("vec_id") % AnchorMod === 0)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("ae"),
        col("nrm").as("an"), col("cell"), col("label").as("albl"))
    val cand = cl.join(anchors, Seq("cell"))
      .where(col("vec_id") =!= col("anchor_id") && col("label") =!= col("albl"))
      .select(col("anchor_id"), col("vec_id").as("neg_id"),
        (expr("graft_dot_f(embedding, ae)") / (col("nrm") * col("an"))).as("cos"))
    graft.plans.GroupedTopK(cand, s,
        Seq(col("anchor_id")), col("cos"), col("neg_id"), NegK)
      .orderBy(asc("anchor_id"), desc("cos"), asc("neg_id"))
      .select(col("anchor_id"), col("neg_id"), round(col("cos"), 6).as("cosine"))
  }

  private val qHardNegativesSql = {
    def dot(a: String, b: String) =
      s"list_aggregate(list_transform(generate_series(1, len($a)), i -> CAST(list_extract($a, i) AS DOUBLE) * CAST(list_extract($b, i) AS DOUBLE)), 'sum')"
    def norm(a: String) =
      s"sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    s"""WITH n AS (SELECT vec_id, embedding, ${norm("embedding")} AS nrm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM n WHERE vec_id % 50 = 0),
       |assigned AS (
       |  SELECT vec_id, embedding, nrm, cell FROM (
       |    SELECT n.vec_id, n.embedding, n.nrm, cent.cid AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ${dot("n.embedding", "cent.ce")} / (n.nrm * cent.cn) DESC, cent.cid ASC) AS rk
       |    FROM n CROSS JOIN cent) WHERE rk = 1),
       |cl AS (SELECT a.vec_id, a.embedding, a.nrm, a.cell, e.label
       |       FROM assigned a JOIN embeddings e ON e.vec_id = a.vec_id),
       |anch AS (SELECT vec_id AS anchor_id, embedding AS ae, nrm AS an, cell, label AS albl
       |         FROM cl WHERE vec_id % $AnchorMod = 0),
       |cand AS (
       |  SELECT a.anchor_id, c.vec_id AS neg_id,
       |    ${dot("c.embedding", "a.ae")} / (c.nrm * a.an) AS cos
       |  FROM cl c JOIN anch a ON c.cell = a.cell
       |  WHERE c.vec_id <> a.anchor_id AND c.label <> a.albl)
       |SELECT anchor_id, neg_id, round(cos, 6) AS cosine FROM (
       |  SELECT anchor_id, neg_id, cos,
       |    row_number() OVER (PARTITION BY anchor_id
       |      ORDER BY cos DESC, neg_id ASC) AS rk
       |  FROM cand) WHERE rk <= $NegK
       |ORDER BY anchor_id ASC, cos DESC, neg_id ASC""".stripMargin
  }

  // -------------------------------------------- q_negative_sampling

  private val NegPerCust = 4
  private val NegSeed = 23

  /** Deterministic uniform negative sampling for implicit-feedback
    * training: every customer draws [[NegPerCust]] pseudo-random part
    * candidates (the portable seeded hash, so retries and incremental
    * loads re-draw identically), and candidates the customer actually
    * purchased leave through an anti-join against the positives —
    * the standard "sampled negatives minus accidental positives" set
    * (slots that collide with a positive are dropped, not re-drawn,
    * keeping the draw single-pass). Scale: candidate volume is
    * exactly [[NegPerCust]]·|customers|, the anti-join shuffles on the
    * composite key, and nothing is quadratic.
    */
  def qNegativeSampling(s: SparkSession, dir: String): DataFrame = {
    val pCnt = Tables(s, dir, "part").agg(count(lit(1)).as("p_cnt"))
    val slots = (0 until NegPerCust).map(i => lit(i.toLong))
    val cand = Tables(s, dir, "customer").select(col("c_custkey"))
      .crossJoin(broadcast(pCnt))
      .select(col("c_custkey"), explode(array(slots: _*)).as("slot"), col("p_cnt"))
      .select(col("c_custkey"), col("slot"),
        (PortableHash.hash64(
          concat(col("c_custkey").cast(StringType), lit("#"),
            col("slot").cast(StringType)), NegSeed) % col("p_cnt") + 1)
          .as("p_partkey"))
    val pos = Tables(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"))
      .join(Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c_custkey"), col("l_partkey").as("p_partkey"))
      .distinct()
    cand.join(pos, Seq("c_custkey", "p_partkey"), "left_anti")
      .select("c_custkey", "slot", "p_partkey")
      .orderBy("c_custkey", "slot")
  }

  private val qNegativeSamplingSql = {
    val h = PortableHash.sql(
      "CAST(c_custkey AS STRING) || '#' || CAST(i AS STRING)", NegSeed)
    s"""WITH pc AS (SELECT COUNT(*) AS p_cnt FROM part),
       |cand AS (
       |  SELECT c_custkey, i AS slot, $h % p_cnt + 1 AS p_partkey
       |  FROM customer CROSS JOIN pc CROSS JOIN range(0, $NegPerCust) t(i)),
       |pos AS (SELECT DISTINCT o_custkey AS c_custkey, l_partkey AS p_partkey
       |        FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
       |SELECT c.c_custkey, c.slot, c.p_partkey FROM cand c
       |WHERE NOT EXISTS (SELECT 1 FROM pos p
       |  WHERE p.c_custkey = c.c_custkey AND p.p_partkey = c.p_partkey)
       |ORDER BY c_custkey, slot""".stripMargin
  }

  // ------------------------------------------------- q_curriculum

  /** (phase, max-chars) schedule; the last phase admits everything. */
  private val Phases = Seq((1L, 500L), (2L, 1000L), (3L, 2000L), (4L, 1000000L))

  /** Curriculum schedule report: for each training phase with its
    * fixed difficulty ceiling (doc length in chars — short docs first,
    * the standard length-based curriculum), the CUMULATIVE admitted
    * corpus mass (docs, whitespace tokens, mean length). Fixed
    * thresholds keep the schedule reproducible across corpus growth —
    * a quantile-based schedule would reshuffle phases every refresh.
    * One corpus pass against a 4-row broadcast dimension.
    */
  def qCurriculum(s: SparkSession, dir: String): DataFrame = {
    val phases = Phases.map { case (p, t) => struct(lit(p).as("phase"), lit(t).as("threshold")) }
    val dim = s.range(1)
      .select(explode(array(phases: _*)).as("pt"))
      .select(col("pt.phase").as("phase"), col("pt.threshold").as("threshold"))
    Tables(s, dir, "documents")
      .select(size(split(col("text"), " ")).cast(LongType).as("ntok"), col("n_chars"))
      .crossJoin(broadcast(dim))
      .where(col("n_chars") <= col("threshold"))
      .groupBy("phase", "threshold")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"),
        round(avg(col("n_chars").cast(DoubleType)), 6).as("mean_chars"))
      .orderBy("phase")
  }

  private val qCurriculumSql = {
    val rows = Phases.map { case (p, t) => s"($p, $t)" }.mkString(", ")
    s"""WITH phases AS (
       |  SELECT CAST(phase AS BIGINT) AS phase, CAST(threshold AS BIGINT) AS threshold
       |  FROM (VALUES $rows) pt(phase, threshold))
       |SELECT phase, threshold, COUNT(*) AS n_docs,
       |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       |  round(avg(CAST(n_chars AS DOUBLE)), 6) AS mean_chars
       |FROM documents CROSS JOIN phases
       |WHERE n_chars <= threshold
       |GROUP BY phase, threshold ORDER BY phase""".stripMargin
  }

  // --------------------------------------------------- q_map_at_k

  private val MapK = 10

  /** Ranking evaluation — average precision at [[MapK]] per user:
    * events ranked by (value DESC, event_id ASC), a hit is a purchase,
    * AP@K = Σ_{hits i ≤ K} (hits-so-far / i) / min(K, total hits).
    * Users with no purchases are excluded (undefined AP). Windows are
    * partitioned by user — never a global sort — and everything after
    * the per-user pass is one aggregate.
    */
  def qMapAtK(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
    val ranked = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("rel"))
      .withColumn("rk", row_number().over(w))
      .withColumn("cum", sum("rel").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    ranked.groupBy("user_id")
      .agg(sum("rel").as("n_rel"),
        sum(when(col("rk") <= MapK && col("rel") === 1L,
          col("cum").cast(DoubleType) / col("rk")).otherwise(0.0)).as("apsum"))
      .where(col("n_rel") > 0)
      .select(col("user_id"), col("n_rel"),
        round(col("apsum") / least(lit(MapK.toLong), col("n_rel")), 6).as("ap"))
      .orderBy("user_id")
  }

  private val qMapAtKSql =
    s"""WITH ranked AS (
       |  SELECT user_id, event_id, value,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel,
       |    row_number() OVER w AS rk,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC))
       |SELECT user_id, CAST(SUM(rel) AS BIGINT) AS n_rel,
       |  round(SUM(CASE WHEN rk <= $MapK AND rel = 1
       |      THEN CAST(cum AS DOUBLE) / rk ELSE 0 END)
       |    / least($MapK, SUM(rel)), 6) AS ap
       |FROM ranked GROUP BY user_id HAVING SUM(rel) > 0
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------- q_benford

  /** Benford first-digit conformance of the money column: observed
    * digit frequencies vs log10(1 + 1/d), with each digit's chi-square
    * contribution — the standard fabricated-data screen. The digit is
    * extracted from the DECIMAL(12,2) string rendering (both engines
    * print decimals identically; double→string formatting differs, and
    * floor(log10(x)) flips at power-of-ten boundaries — the string
    * route has neither hazard). One scan, 9-row output.
    */
  def qBenford(s: SparkSession, dir: String): DataFrame = {
    val digits = Tables(s, dir, "lineitem")
      .select(substring(col("l_extendedprice").cast(DecimalType(12, 2))
        .cast(StringType), 1, 1).cast(LongType).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum("n").as("tot"))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast(DoubleType) / col("tot"), 6).as("obs_freq"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("exp_freq"),
        round(pow(col("n").cast(DoubleType) / col("tot")
            - log10(lit(1.0) + lit(1.0) / col("digit")), 2)
          / log10(lit(1.0) + lit(1.0) / col("digit")) * col("tot"), 6)
          .as("chi2_term"))
      .orderBy("digit")
  }

  private val qBenfordSql =
    s"""WITH d AS (
       |  SELECT CAST(substr(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS STRING), 1, 1) AS BIGINT) AS digit
       |  FROM lineitem),
       |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
       |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c)
       |SELECT digit, n,
       |  round(CAST(n AS DOUBLE) / tot, 6) AS obs_freq,
       |  round(log10(1.0 + 1.0 / digit), 6) AS exp_freq,
       |  round(pow(CAST(n AS DOUBLE) / tot - log10(1.0 + 1.0 / digit), 2)
       |    / log10(1.0 + 1.0 / digit) * tot, 6) AS chi2_term
       |FROM c CROSS JOIN t ORDER BY digit""".stripMargin

  // -------------------------------------------------- q_tail_index

  private val HillM = 100

  /** Hill tail-index estimate of the doc-length distribution: over the
    * top [[HillM]]+1 order statistics (total order — ties broken by
    * doc_id), mean log-excess ln(x_i / x_{m+1}) and its inverse, the
    * power-law exponent α. The (m+1)-th row contributes ln(1) = 0, so
    * the sum over all m+1 rows IS the sum over the top m. Heavy-tailed
    * length distributions (α ≲ 2) are what make unbatched
    * whole-doc kernels blow up — this is the diagnostic that says so
    * before the 100 TB run does. TakeOrderedAndProject keeps the
    * top-(m+1) cut distributed; everything after is a 101-row fold.
    */
  def qTailIndex(s: SparkSession, dir: String): DataFrame = {
    val top = Tables(s, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast(DoubleType).as("x"))
      .orderBy(desc("n_chars"), asc("doc_id"))
      .limit(HillM + 1)
    val xk = top.agg(min("x").as("xk"))
    top.crossJoin(broadcast(xk))
      .agg(min("xk").as("x_min"),
        sum(log(col("x") / col("xk"))).as("lsum"))
      .select(lit(HillM.toLong).as("m"), col("x_min"),
        round(col("lsum") / HillM, 6).as("hill_mean"),
        round(lit(HillM.toDouble) / col("lsum"), 6).as("alpha"))
  }

  private val qTailIndexSql =
    s"""WITH topm AS (
       |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS x FROM documents
       |  ORDER BY n_chars DESC, doc_id ASC LIMIT ${HillM + 1}),
       |mn AS (SELECT MIN(x) AS xk FROM topm)
       |SELECT CAST($HillM AS BIGINT) AS m, MIN(xk) AS x_min,
       |  round(SUM(ln(x / xk)) / $HillM, 6) AS hill_mean,
       |  round($HillM / SUM(ln(x / xk)), 6) AS alpha
       |FROM topm CROSS JOIN mn""".stripMargin

  // --------------------------------------------- q_embedding_center

  private val EmbDim = 64

  /** Per-dimension centering statistics of the embedding corpus (mean
    * and population std per coordinate) — the pass a whitening /
    * mean-centering step runs before indexing, and the drift check a
    * re-embedding pipeline diffs between model versions. The explode
    * is dimension-bounded (×[[EmbDim]]), aggregation is
    * map-side-combining sum/sumsq — no windows, no driver state.
    */
  def qEmbeddingCenter(s: SparkSession, dir: String): DataFrame = {
    val dims = s.range(1)
      .select(explode(sequence(lit(1L), lit(EmbDim.toLong))).as("dim"))
    Tables(s, dir, "embeddings")
      .crossJoin(broadcast(dims))
      .select(col("dim"),
        element_at(col("embedding"), col("dim").cast(IntegerType))
          .cast(DoubleType).as("x"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("x").as("s1"), sum(col("x") * col("x")).as("s2"))
      .select(col("dim"), col("n"),
        round(col("s1") / col("n"), 6).as("mean"),
        round(sqrt(greatest(col("s2") / col("n")
          - pow(col("s1") / col("n"), 2), lit(0.0))), 6).as("std"))
      .orderBy("dim")
  }

  private val qEmbeddingCenterSql =
    s"""WITH dims AS (
       |  SELECT CAST(dim AS BIGINT) AS dim
       |  FROM (SELECT unnest(generate_series(1, $EmbDim)) AS dim)),
       |v AS (
       |  SELECT dim, CAST(list_extract(embedding, CAST(dim AS INTEGER)) AS DOUBLE) AS x
       |  FROM embeddings CROSS JOIN dims),
       |agg AS (
       |  SELECT dim, COUNT(*) AS n, SUM(x) AS s1, SUM(x * x) AS s2
       |  FROM v GROUP BY dim)
       |SELECT dim, n, round(s1 / n, 6) AS mean,
       |  round(sqrt(greatest(s2 / n - pow(s1 / n, 2), 0.0)), 6) AS std
       |FROM agg ORDER BY dim""".stripMargin

  // ---------------------------------------------- q_grad_noise_scale

  private val GnsQ = 67108864.0   // 2^26: per-element quantization
  private val GnsQ2 = 1048576.0   // 2^20: per-dimension term fold

  /** Simple gradient-noise-scale estimate (McCandlish et al. 2018,
    * "An Empirical Model of Large-Batch Training"): treating each
    * vector as a per-example gradient and each `label` group as a
    * batch, B_simple = tr(Σ) / |G|² — the batch size at which gradient
    * noise stops paying for itself, THE readout a training-data
    * pipeline feeds the batch-size schedule. Exactness discipline
    * (NOTES #35) end to end: per-element values quantize to
    * floor(x·2²⁶) / floor(x²·2²⁶) BIGINTs before any cross-row sum,
    * the per-dimension variance and squared-mean terms are then exact
    * doubles off those BIGINTs, and the dimension fold re-quantizes at
    * 2²⁰ — so the only unquantized division is the final trace/|G|²
    * per label. Shapes: one dimension-bounded fan-out after the narrow
    * scan, two map-side-combinable keyed aggregates ((label, dim) then
    * label); nothing is driver-side, nothing is a window.
    */
  def qGradNoiseScale(s: SparkSession, dir: String): DataFrame = {
    val perDim = Tables(s, dir, "embeddings")
      .select(col("label").cast(LongType).as("label"),
        posexplode(col("embedding")).as(Seq("d", "xf")))
      .select(col("label"), col("d"), col("xf").cast(DoubleType).as("x"))
      .groupBy("label", "d")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x") * GnsQ).cast(LongType)).as("s1q"),
        sum(floor(col("x") * col("x") * GnsQ).cast(LongType)).as("s2q"))
    val terms = perDim.select(col("label"), col("n"),
      (col("s1q").cast(DoubleType) / GnsQ / col("n")).as("mean"),
      (col("s2q").cast(DoubleType) / GnsQ / col("n")).as("ex2"))
      .select(col("label"), col("n"),
        floor((col("ex2") - col("mean") * col("mean")) * GnsQ2)
          .cast(LongType).as("varq"),
        floor(col("mean") * col("mean") * GnsQ2).cast(LongType).as("g2q"))
    terms.groupBy("label")
      .agg(max("n").as("n_examples"),
        round(sum("varq").cast(DoubleType) / GnsQ2, 6).as("grad_trace"),
        round(sum("g2q").cast(DoubleType) / GnsQ2, 6).as("grad_norm_sq"),
        when(sum("g2q") > 0,
          round(sum("varq").cast(DoubleType) / sum("g2q").cast(DoubleType), 6))
          .as("b_simple"))
      .orderBy("label")
  }

  private val qGradNoiseScaleSql =
    s"""WITH mx AS (
       |  SELECT CAST(max(len(embedding)) AS BIGINT) AS m FROM embeddings),
       |dims AS (SELECT unnest(generate_series(1, m)) AS i FROM mx),
       |v AS (
       |  SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS INT) AS d,
       |    CAST(list_extract(embedding, CAST(i AS INTEGER)) AS DOUBLE) AS x
       |  FROM embeddings CROSS JOIN dims
       |  WHERE i <= len(embedding)),
       |perdim AS (
       |  SELECT label, d, COUNT(*) AS n,
       |    CAST(SUM(CAST(floor(x * $GnsQ) AS BIGINT)) AS BIGINT) AS s1q,
       |    CAST(SUM(CAST(floor(x * x * $GnsQ) AS BIGINT)) AS BIGINT) AS s2q
       |  FROM v GROUP BY 1, 2),
       |terms AS (
       |  SELECT label, n,
       |    CAST(floor(((CAST(s2q AS DOUBLE) / $GnsQ / n)
       |      - (CAST(s1q AS DOUBLE) / $GnsQ / n) * (CAST(s1q AS DOUBLE) / $GnsQ / n))
       |      * $GnsQ2) AS BIGINT) AS varq,
       |    CAST(floor((CAST(s1q AS DOUBLE) / $GnsQ / n) * (CAST(s1q AS DOUBLE) / $GnsQ / n)
       |      * $GnsQ2) AS BIGINT) AS g2q
       |  FROM perdim)
       |SELECT label, max(n) AS n_examples,
       |  round(CAST(SUM(varq) AS DOUBLE) / $GnsQ2, 6) AS grad_trace,
       |  round(CAST(SUM(g2q) AS DOUBLE) / $GnsQ2, 6) AS grad_norm_sq,
       |  CASE WHEN SUM(g2q) > 0 THEN
       |    round(CAST(SUM(varq) AS DOUBLE) / CAST(SUM(g2q) AS DOUBLE), 6)
       |  END AS b_simple
       |FROM terms GROUP BY label ORDER BY label""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hard_negatives" -> (qHardNegatives(_, _)),
    "q_negative_sampling" -> (qNegativeSampling(_, _)),
    "q_curriculum" -> (qCurriculum(_, _)),
    "q_map_at_k" -> (qMapAtK(_, _)),
    "q_benford" -> (qBenford(_, _)),
    "q_tail_index" -> (qTailIndex(_, _)),
    "q_embedding_center" -> (qEmbeddingCenter(_, _)),
    "q_grad_noise_scale" -> (qGradNoiseScale(_, _)))

  def oracles: Map[String, String] = Map(
    "q_hard_negatives" -> qHardNegativesSql,
    "q_negative_sampling" -> qNegativeSamplingSql,
    "q_curriculum" -> qCurriculumSql,
    "q_map_at_k" -> qMapAtKSql,
    "q_benford" -> qBenfordSql,
    "q_tail_index" -> qTailIndexSql,
    "q_embedding_center" -> qEmbeddingCenterSql,
    "q_grad_noise_scale" -> qGradNoiseScaleSql)
}
