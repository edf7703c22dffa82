package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Second wave of evaluation/readout operators: classifier confusion
  * arithmetic, inter-rater agreement (Cohen's κ), population-stability
  * drift (PSI), and Matryoshka-prefix retrieval fidelity. Exactness:
  * every statistic reduces to integer contingency counts; doubles
  * appear only in final divisions or per-bin terms quantized at 10⁻⁶
  * before the (order-nondeterministic) distributed sum.
  */
object EvalOps2 {

  // -------------------------------------------------- q_confusion_stats

  private val CsThresh = 300L // "long doc ⇒ English" toy classifier

  /** Confusion matrix + derived metrics for a threshold classifier
    * (n_chars ≥ [[CsThresh]]) against the is-English label: tp/fp/fn/tn
    * from ONE map-side-combinable aggregate; accuracy, precision,
    * recall and F1 are exact divisions of those integers.
    */
  def qConfusionStats(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(
      (col("n_chars") >= CsThresh).as("pred"),
      (col("lang") === "en").as("y"))
    d.agg(
        sum(when(col("pred") && col("y"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("y"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("y"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("y"), 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        round((col("tp") + col("tn")).cast(DoubleType) /
          (col("tp") + col("fp") + col("fn") + col("tn")).cast(DoubleType), 6).as("accuracy"),
        round(col("tp").cast(DoubleType) / (col("tp") + col("fp")).cast(DoubleType), 6).as("precision"),
        round(col("tp").cast(DoubleType) / (col("tp") + col("fn")).cast(DoubleType), 6).as("recall"),
        round(lit(2.0) * col("tp").cast(DoubleType) /
          (lit(2.0) * col("tp") + col("fp") + col("fn")).cast(DoubleType), 6).as("f1"))
  }

  private val qConfusionStatsSql =
    s"""WITH d AS (SELECT n_chars >= $CsThresh AS pred, lang = 'en' AS y FROM documents),
       |c AS (
       |  SELECT CAST(SUM(CASE WHEN pred AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |         CAST(SUM(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |         CAST(SUM(CASE WHEN NOT pred AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |         CAST(SUM(CASE WHEN NOT pred AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM d)
       |SELECT tp, fp, fn, tn,
       |  round(CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE), 6) AS accuracy,
       |  round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) AS precision,
       |  round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) AS recall,
       |  round(2.0 * tp / CAST(2.0 * tp + fp + fn AS DOUBLE), 6) AS f1
       |FROM c""".stripMargin

  // ---------------------------------------------------- q_cohen_kappa

  /** Cohen's κ between the marker-token language rater (ta_langid's
    * argmax rule) and the labeled language — the inter-annotator
    * agreement readout, chance-corrected. Multi-class:
    * κ = (agree·N − S) / (N² − S) with S = Σ_c nA_c·nB_c — ONE exact
    * integer division, computed from the 5×5 contingency counts (one
    * aggregate over the corpus, a 25-cell grid after).
    */
  def qCohenKappa(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    def score(words: Seq[String]) =
      size(filter(toks, t => t.isin(words.map(x => x: Any): _*))).cast(LongType)
    val en = score(Seq("the", "a", "is")); val es = score(Seq("data", "row", "value"))
    val de = score(Seq("join", "merge", "group")); val fr = score(Seq("filter", "sort", "order"))
    val zh = score(Seq("spark", "query", "table"))
    val pred =
      when(en >= es && en >= de && en >= fr && en >= zh, "en")
        .when(es >= de && es >= fr && es >= zh, "es")
        .when(de >= fr && de >= zh, "de")
        .when(fr >= zh, "fr").otherwise("zh")
    val cells = Tables(s, dir, "documents")
      .select(pred.as("ra"), col("lang").as("rb"))
      .groupBy("ra", "rb").agg(count(lit(1)).as("c"))
    val margA = cells.groupBy("ra").agg(sum("c").as("na"))
    val margB = cells.groupBy("rb").agg(sum("c").as("nb"))
    val sProd = margA.join(margB, col("ra") === col("rb"))
      .agg(sum(col("na") * col("nb")).as("s"))
    val agg = cells.agg(sum("c").as("n"),
      sum(when(col("ra") === col("rb"), col("c")).otherwise(0L)).as("agree"))
    agg.crossJoin(broadcast(sProd))
      .select(col("n"), col("agree"), col("s"),
        round(col("agree").cast(DoubleType) / col("n").cast(DoubleType), 6).as("po"),
        round(col("s").cast(DoubleType) / (col("n") * col("n")).cast(DoubleType), 6).as("pe"),
        round((col("agree") * col("n") - col("s")).cast(DoubleType) /
          (col("n") * col("n") - col("s")).cast(DoubleType), 6).as("kappa"))
  }

  private val qCohenKappaSql = {
    def score(words: Seq[String]) = {
      val lst = words.map(w => s"'$w'").mkString("list_value(", ", ", ")")
      s"CAST(len(list_filter(string_split(text, ' '), t -> list_contains($lst, t))) AS BIGINT)"
    }
    s"""WITH sc AS (
       |  SELECT lang AS rb,
       |    ${score(Seq("the", "a", "is"))} AS en, ${score(Seq("data", "row", "value"))} AS es,
       |    ${score(Seq("join", "merge", "group"))} AS de, ${score(Seq("filter", "sort", "order"))} AS fr,
       |    ${score(Seq("spark", "query", "table"))} AS zh
       |  FROM documents),
       |cells AS (
       |  SELECT CASE WHEN en >= es AND en >= de AND en >= fr AND en >= zh THEN 'en'
       |              WHEN es >= de AND es >= fr AND es >= zh THEN 'es'
       |              WHEN de >= fr AND de >= zh THEN 'de'
       |              WHEN fr >= zh THEN 'fr' ELSE 'zh' END AS ra,
       |         rb, COUNT(*) AS c
       |  FROM sc GROUP BY 1, 2),
       |ma AS (SELECT ra, CAST(SUM(c) AS BIGINT) AS na FROM cells GROUP BY ra),
       |mb AS (SELECT rb, CAST(SUM(c) AS BIGINT) AS nb FROM cells GROUP BY rb),
       |sp AS (SELECT CAST(SUM(na * nb) AS BIGINT) AS s
       |       FROM ma JOIN mb ON ma.ra = mb.rb),
       |ag AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
       |         CAST(SUM(CASE WHEN ra = rb THEN c ELSE 0 END) AS BIGINT) AS agree
       |       FROM cells)
       |SELECT n, agree, s,
       |  round(CAST(agree AS DOUBLE) / n, 6) AS po,
       |  round(CAST(s AS DOUBLE) / CAST(n * n AS DOUBLE), 6) AS pe,
       |  round(CAST(agree * n - s AS DOUBLE) / CAST(n * n - s AS DOUBLE), 6) AS kappa
       |FROM ag CROSS JOIN sp""".stripMargin
  }

  // ------------------------------------------------------------ q_psi

  private val PsiSrc = "src0"
  private val PsiBinW = 64L
  private val PsiQ = 1000000L

  /** Population Stability Index of one source's document-length
    * distribution against the rest of the corpus — the classic "is
    * this feed drifting" release gate next to ta_ks_test's
    * nonparametric sup-distance. Fixed-width length bins with
    * Laplace-smoothed proportions (pa = (ca+1)/(na+B)); each bin's
    * (pa−pb)·ln(pa/pb) term is quantized at 10⁻⁶ BEFORE the sum, so
    * the distributed reduction is order-independent and engine-exact.
    * Everything after the first aggregate lives on the bounded bin
    * grid.
    */
  def qPsi(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(
      (col("n_chars").cast(LongType) / PsiBinW).cast(LongType).as("bin"),
      (col("source") === PsiSrc).as("ina"))
    val hist = d.groupBy("bin").agg(
      sum(when(col("ina"), 1L).otherwise(0L)).as("ca"),
      sum(when(!col("ina"), 1L).otherwise(0L)).as("cb"))
    val tot = hist.agg(sum("ca").as("na"), sum("cb").as("nb"),
      count(lit(1)).as("nbins"))
    val terms = hist.crossJoin(broadcast(tot))
      .withColumn("pa", (col("ca") + 1).cast(DoubleType) / (col("na") + col("nbins")).cast(DoubleType))
      .withColumn("pb", (col("cb") + 1).cast(DoubleType) / (col("nb") + col("nbins")).cast(DoubleType))
      .withColumn("term_q",
        floor(round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 6) * PsiQ.toDouble)
          .cast(LongType))
    terms.agg(count(lit(1)).as("n_bins"), sum("term_q").as("psi_q"))
      .select(col("n_bins"),
        (col("psi_q").cast(DoubleType) / PsiQ.toDouble).as("psi"))
  }

  private val qPsiSql =
    s"""WITH d AS (SELECT divide(n_chars, $PsiBinW) AS bin, source = '$PsiSrc' AS ina FROM documents),
       |hist AS (
       |  SELECT bin, CAST(SUM(CASE WHEN ina THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |         CAST(SUM(CASE WHEN NOT ina THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM d GROUP BY bin),
       |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
       |               COUNT(*) AS nbins FROM hist),
       |terms AS (
       |  SELECT CAST(floor(round(
       |    (CAST(ca + 1 AS DOUBLE) / (na + nbins) - CAST(cb + 1 AS DOUBLE) / (nb + nbins))
       |    * ln((CAST(ca + 1 AS DOUBLE) / (na + nbins)) / (CAST(cb + 1 AS DOUBLE) / (nb + nbins))), 6)
       |    * $PsiQ.0) AS BIGINT) AS term_q
       |  FROM hist CROSS JOIN tot)
       |SELECT COUNT(*) AS n_bins, CAST(SUM(term_q) AS DOUBLE) / $PsiQ.0 AS psi
       |FROM terms""".stripMargin

  // ------------------------------------------------------------ q_gini

  /** Gini concentration of customer revenue — the inequality readout a
    * data-mix planner runs on any weight distribution (revenue here;
    * tokens-per-source or docs-per-domain identically). Uses the
    * rank-sum identity G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) computed
    * ENTIRELY on the distinct-revenue value histogram: a tie group
    * (value v, count c, min-rank r) contributes v·(c·r + c(c−1)/2) —
    * integers throughout, one final division. Per-customer revenue
    * sums are near-UNIQUE, so the histogram is customer-sized and a
    * flat cumulative window over it would be a single-partition sort
    * of the customer domain; the cumulative count instead runs
    * two-level (the qRfm monetary shape): per-(cents >> 20) bucket
    * masses, one bounded cumulative window over the DISTINCT buckets
    * (the quantized price domain, ~400 buckets here), and a window
    * PARTITIONED by bucket for the within-bucket remainder —
    * identical cumc, no corpus-sized sort anywhere. Row-count bound:
    * terms grow as n²·max_cents — int64-exact to ~10⁶ customers at
    * this price domain; beyond, pre-divide ranks to fixed point.
    */
  def qGini(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType)).as("cents"))
    val hist = per.groupBy("cents").agg(count(lit(1)).as("c"))
      .withColumn("_b", shiftright(col("cents"), 20))
    val boff = hist.groupBy("_b").agg(sum("c").as("_cb"))
      .withColumn("_off", coalesce(sum("_cb").over(
        Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("_b", "_off")
    val cum = hist.join(boff, Seq("_b"))
      .withColumn("cumc", col("_off") +
        sum("c").over(Window.partitionBy("_b").orderBy("cents")))
    // min-rank of the tie group = cumc − c + 1
    val agg = cum.select(col("cents"), col("c"),
        (col("cents") * (col("c") * (col("cumc") - col("c") + 1) +
          call_function("div", col("c") * (col("c") - 1), lit(2L)))).as("ri"),
        (col("cents") * col("c")).as("sx"))
      .agg(sum("ri").as("sri"), sum("sx").as("ssx"), sum("c").as("n"))
    agg.select(col("n"),
      (col("ssx").cast(DoubleType) / 100.0).as("total_revenue"),
      round((lit(2.0) * col("sri") - (col("n") + 1).cast(DoubleType) * col("ssx")) /
        (col("n").cast(DoubleType) * col("ssx").cast(DoubleType)), 6).as("gini"))
  }

  private val qGiniSql =
    """WITH per AS (
      |  SELECT o_custkey, CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY o_custkey),
      |hist AS (SELECT cents, COUNT(*) AS c FROM per GROUP BY cents),
      |cum AS (SELECT cents, c,
      |          CAST(SUM(c) OVER (ORDER BY cents) AS BIGINT) AS cumc FROM hist),
      |a AS (
      |  SELECT CAST(SUM(cents * (c * (cumc - c + 1) + divide(c * (c - 1), 2))) AS BIGINT) AS sri,
      |         CAST(SUM(cents * c) AS BIGINT) AS ssx,
      |         CAST(SUM(c) AS BIGINT) AS n
      |  FROM cum)
      |SELECT n, CAST(ssx AS DOUBLE) / 100.0 AS total_revenue,
      |  round((2.0 * sri - CAST(n + 1 AS DOUBLE) * ssx)
      |    / (CAST(n AS DOUBLE) * CAST(ssx AS DOUBLE)), 6) AS gini
      |FROM a""".stripMargin

  // ------------------------------------------------------ q_ht_estimate

  private val HtPct = 10L // 10 % deterministic hash sample

  /** Horvitz–Thompson estimation from the deterministic hash sample:
    * the total-revenue estimate Σ x/π over the π = 10 % sample next to
    * the true total and the relative error — the estimator every
    * sampled pipeline audit should publish with its point numbers.
    * Membership is the q_hash_sample portable-hash rule, so the sample
    * (and hence the estimate) is reproducible across engines and
    * re-runs. Exact decimal sums; two final divisions.
    */
  def qHtEstimate(s: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.PortableHash.hash64(
      concat(lit("ht:"), col("o_orderkey").cast(StringType))) % 100
    val o = Tables(s, dir, "orders").select(
      (h < HtPct).as("in_s"),
      (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
    o.agg(count(lit(1)).as("n"),
        sum(when(col("in_s"), 1L).otherwise(0L)).as("n_sampled"),
        sum("cents").as("true_c"),
        sum(when(col("in_s"), col("cents")).otherwise(0L)).as("samp_c"))
      .select(col("n"), col("n_sampled"),
        (col("samp_c").cast(DoubleType) * (100.0 / HtPct) / 100.0).as("est_total"),
        (col("true_c").cast(DoubleType) / 100.0).as("true_total"),
        round(abs(col("samp_c").cast(DoubleType) * (100.0 / HtPct) - col("true_c").cast(DoubleType)) /
          col("true_c").cast(DoubleType), 6).as("rel_err"))
  }

  private val qHtEstimateSql = {
    val h = graft.functions.PortableHash.sql("'ht:' || CAST(o_orderkey AS STRING)")
    s"""WITH o AS (
       |  SELECT ($h % 100) < $HtPct AS in_s,
       |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
       |  FROM orders),
       |a AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(SUM(CASE WHEN in_s THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       |    CAST(SUM(cents) AS BIGINT) AS true_c,
       |    CAST(SUM(CASE WHEN in_s THEN cents ELSE 0 END) AS BIGINT) AS samp_c
       |  FROM o)
       |SELECT n, n_sampled,
       |  CAST(samp_c AS DOUBLE) * (100.0 / $HtPct) / 100.0 AS est_total,
       |  CAST(true_c AS DOUBLE) / 100.0 AS true_total,
       |  round(ABS(CAST(samp_c AS DOUBLE) * (100.0 / $HtPct) - CAST(true_c AS DOUBLE))
       |    / CAST(true_c AS DOUBLE), 6) AS rel_err
       |FROM a""".stripMargin
  }

  // ----------------------------------------------------- ann_matryoshka

  private val MatK = 10
  private val MatDim = 16
  private val MatQueryId = 0

  /** Matryoshka-prefix retrieval fidelity: recall@k of the 16-dim
    * PREFIX cosine ranking against the full-64-dim ranking for the
    * same query — the readout that decides whether truncated
    * embeddings (4× cheaper to store and scan) are good enough to
    * serve. Two brute-force top-k passes over the corpus (the exact
    * baseline; the IVF path composes identically) + a k-row semi-join.
    */
  def annMatryoshka(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(s)
    def topk(vecCol: Column): DataFrame = {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), vecCol.as("v"))
        .withColumn("nrm", sqrt(expr("graft_norm_sq_f(v)")))
      val q = e.where(col("vec_id") === MatQueryId)
        .select(col("v").as("qv"), col("nrm").as("qn"))
      e.where(col("vec_id") =!= MatQueryId)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          (expr("graft_dot_f(v, qv)") / (col("nrm") * col("qn"))).as("cosine"))
        .orderBy(desc("cosine"), asc("vec_id")).limit(MatK)
    }
    val full = topk(col("embedding")).select("vec_id")
    val prefix = topk(slice(col("embedding"), 1, MatDim)).select("vec_id")
    prefix.join(full, Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
      .select(lit(MatDim.toLong).as("dim_prefix"), col("hits"),
        lit(MatK.toLong).as("k"),
        (col("hits").cast(DoubleType) / MatK).as("recall_at_k"))
  }

  private val annMatryoshkaSql = {
    def dotSql(a: String, b: String) =
      s"list_aggregate(list_transform(generate_series(1, len($a)), i -> CAST(list_extract($a, i) AS DOUBLE) * CAST(list_extract($b, i) AS DOUBLE)), 'sum')"
    def normSql(a: String) =
      s"sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    def topk(vec: String) =
      s"""SELECT n.vec_id, ${dotSql("n.v", "q.qv")} / (n.nrm * q.qn) AS cosine
         |  FROM (SELECT vec_id, $vec AS v, ${normSql(vec)} AS nrm FROM embeddings) n,
         |       (SELECT $vec AS qv, ${normSql(vec)} AS qn FROM embeddings WHERE vec_id = $MatQueryId) q
         |  WHERE n.vec_id <> $MatQueryId
         |  ORDER BY cosine DESC, vec_id ASC LIMIT $MatK""".stripMargin
    s"""WITH fullk AS (${topk("embedding")}),
       |pfx AS (${topk(s"array_slice(embedding, 1, $MatDim)")})
       |SELECT CAST($MatDim AS BIGINT) AS dim_prefix,
       |  CAST(COUNT(*) AS BIGINT) AS hits, CAST($MatK AS BIGINT) AS k,
       |  CAST(COUNT(*) AS DOUBLE) / $MatK AS recall_at_k
       |FROM pfx WHERE vec_id IN (SELECT vec_id FROM fullk)""".stripMargin
  }

  // --------------------------------------------------------- ta_oov_rate

  private val OovVocab = 1000

  /** Tokenizer-coverage eval: out-of-vocabulary rate per source under
    * a top-[[OovVocab]] frequency vocabulary trained on the corpus
    * itself — the readout that decides whether a fixed vocab is big
    * enough for a feed. Corpus token counts map-side-combine; the
    * vocabulary is a bounded top-V cut (freq desc, token asc —
    * deterministic boundary); per-source OOV is one broadcast
    * left-join + aggregate. Exact: integer counts, one division.
    */
  def taOovRate(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("tok")).limit(OovVocab)
      .select(col("tok"), lit(1L).as("in_v"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast(DoubleType) / col("n_tokens").cast(DoubleType), 6)
          .as("oov_rate"))
      .orderBy("source")
  }

  private val taOovRateSql =
    s"""WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
       |v AS (SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM t GROUP BY tok
       |      ORDER BY c DESC, tok ASC LIMIT $OovVocab)),
       |j AS (SELECT t.source, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
       |      FROM t LEFT JOIN v ON t.tok = v.tok)
       |SELECT source, COUNT(*) AS n_tokens,
       |  CAST(SUM(oov) AS BIGINT) AS n_oov,
       |  round(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6) AS oov_rate
       |FROM j GROUP BY source ORDER BY source""".stripMargin

  // ----------------------------------------------------- ta_wasserstein

  /** 1-D Wasserstein (earth-mover) distance of every source's
    * document-length distribution against the whole corpus — the
    * magnitude-sensitive companion to ta_ks_test's sup-distance (KS
    * says IF distributions differ, W₁ says by HOW MANY characters).
    * W₁ = Σ_values |F_s(v) − F(v)|·gap(v), computed on the integer
    * cross-products |cum_s·N − cum·n_s|·gap with ONE final division by
    * n_s·N — the exact value-level ECDF shape of taKsTest, gaps from a
    * lead() over the bounded distinct-value grid. Row-count bound:
    * terms grow as N²·gap, int64-exact to ~10⁷ documents at this value
    * domain (tighter than KS by the gap factor — fixed-point ECDFs are
    * the >10⁷ path).
    */
  def taWasserstein(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents").select(col("source"), col("n_chars").as("v"))
    val hist = docs.groupBy("source", "v").agg(count(lit(1)).as("c"))
    val sv = hist.select("source").distinct()
      .crossJoin(docs.select("v").distinct())
      .join(hist, Seq("source", "v"), "left").na.fill(0L, Seq("c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("v")
    val cumS = sv
      .withColumn("cum_s", sum("c").over(w))
      .withColumn("gap", lead("v", 1).over(w) - col("v"))
      .where(col("gap").isNotNull)
    val cumG = docs.groupBy("v").agg(count(lit(1)).as("cg"))
      .withColumn("cum", sum("cg").over(
        org.apache.spark.sql.expressions.Window.orderBy("v")))
    val ns = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
    val n = docs.agg(count(lit(1)).as("n"))
    cumS.join(cumG.select("v", "cum"), Seq("v"))
      .join(ns, Seq("source")).crossJoin(broadcast(n))
      .select(col("source"), col("n_s"), col("n"),
        (abs(col("cum_s") * col("n") - col("cum") * col("n_s")) * col("gap")).as("t"))
      .groupBy("source")
      .agg(first("n_s").as("n_s"), sum("t").as("w_num"), first("n").as("nn"))
      .select(col("source"), col("n_s"),
        round(col("w_num").cast(DoubleType) /
          (col("n_s").cast(DoubleType) * col("nn")), 6).as("wasserstein"))
      .orderBy("source")
  }

  private val taWassersteinSql =
    """WITH d AS (SELECT source, n_chars AS v FROM documents),
      |hist AS (SELECT source, v, COUNT(*) AS c FROM d GROUP BY 1, 2),
      |sv AS (
      |  SELECT s.source, vv.v, COALESCE(h.c, 0) AS c
      |  FROM (SELECT DISTINCT source FROM hist) s
      |  CROSS JOIN (SELECT DISTINCT v FROM d) vv
      |  LEFT JOIN hist h ON h.source = s.source AND h.v = vv.v),
      |cs AS (SELECT source, v,
      |         CAST(SUM(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum_s,
      |         lead(v) OVER (PARTITION BY source ORDER BY v) - v AS gap
      |       FROM sv),
      |cg AS (SELECT v, CAST(SUM(cg) OVER (ORDER BY v) AS BIGINT) AS cum
      |       FROM (SELECT v, COUNT(*) AS cg FROM d GROUP BY v)),
      |ns AS (SELECT source, COUNT(*) AS n_s FROM d GROUP BY source),
      |nn AS (SELECT COUNT(*) AS n FROM d),
      |terms AS (
      |  SELECT cs.source, ns.n_s, nn.n,
      |    ABS(cs.cum_s * nn.n - cg.cum * ns.n_s) * cs.gap AS t
      |  FROM cs JOIN cg USING (v) JOIN ns USING (source) CROSS JOIN nn
      |  WHERE cs.gap IS NOT NULL)
      |SELECT source, CAST(MIN(n_s) AS BIGINT) AS n_s,
      |  round(CAST(SUM(t) AS DOUBLE) / (CAST(MIN(n_s) AS DOUBLE) * MIN(n)), 6) AS wasserstein
      |FROM terms GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------------ registry

  // ------------------------------------------------------ power analysis

  private val ZAlpha = 1.959964 // two-sided α = 0.05
  private val ZBeta = 0.841621  // power 80 %
  private val MdeFrac = 0.05    // detect a 5 % lift of the mean

  /** A/B sample-size calculator — the experiment-design step BEFORE
    * `q_ab_test` reads one out: per event type, the per-arm n needed
    * to detect a [[MdeFrac]] lift of the observed mean at α = 0.05 /
    * 80 % power, n = 2(z_α+z_β)²σ²/δ². Variance comes from the exact
    * integer cents moments (n, Σq, Σq²) of one map-side-combinable
    * pass — the engine-exact moment technique every readout here uses
    * — and the z constants are fixed literals, so the final double
    * chain is written operand-for-operand identically in the oracle.
    */
  def qPowerAnalysis(s: SparkSession, dir: String): DataFrame = {
    val m = Tables(s, dir, "events").where(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 100d + 0.5d).cast(LongType).as("q"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("q").as("sq"),
        sum(col("q") * col("q")).as("sq2"))
    val nD = col("n").cast(DoubleType)
    val mean = col("sq").cast(DoubleType) / nD / 100d
    val variance = (nD * col("sq2").cast(DoubleType) -
      col("sq").cast(DoubleType) * col("sq").cast(DoubleType)) /
      (nD * (nD - 1d)) / 10000d
    val delta = lit(MdeFrac) * mean
    m.select(col("event_type"), col("n"),
        round(mean, 6).as("mean"),
        round(variance, 6).as("variance"),
        round(delta, 6).as("mde"),
        ceil(lit(2d) * lit((ZAlpha + ZBeta) * (ZAlpha + ZBeta)) * variance /
          (delta * delta)).cast(LongType).as("n_per_arm"))
      .orderBy("event_type")
  }

  private val qPowerAnalysisSql = {
    val z2 = (ZAlpha + ZBeta) * (ZAlpha + ZBeta)
    s"""WITH m AS (
       |  SELECT event_type, COUNT(*) AS n,
       |    CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(q * q) AS BIGINT) AS sq2
       |  FROM (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
       |        FROM events WHERE value IS NOT NULL)
       |  GROUP BY event_type)
       |SELECT event_type, n,
       |  round(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS mean,
       |  round((CAST(n AS DOUBLE) * CAST(sq2 AS DOUBLE)
       |      - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
       |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 10000.0, 6)
       |    AS variance,
       |  round($MdeFrac * (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 100.0), 6)
       |    AS mde,
       |  CAST(ceil(2.0 * $z2
       |      * ((CAST(n AS DOUBLE) * CAST(sq2 AS DOUBLE)
       |          - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
       |        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 10000.0)
       |      / (($MdeFrac * (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 100.0))
       |        * ($MdeFrac * (CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 100.0))))
       |    AS BIGINT) AS n_per_arm
       |FROM m ORDER BY event_type""".stripMargin
  }

  // -------------------------------------------------------- Brier score

  /** Brier score + skill of the length-derived probability
    * (p = min(n_chars, 1000)/1000) against the is-English label — the
    * proper-scoring-rule companion to `q_calibration`'s reliability
    * bins. EXACT by construction: p is the rational k/1000, so each
    * row's squared error is the integer (k − 1000·y)² ≤ 10⁶ and the
    * corpus sum is one BIGINT aggregate — no per-row doubles, no
    * quantization step. The skill score divides by the climatology
    * reference b̄(1−b̄) in one fixed double chain.
    */
  def qBrierScore(s: SparkSession, dir: String): DataFrame = {
    val k = least(col("n_chars"), lit(1000L)).cast(LongType)
    val y = when(col("lang") === "en", 1L).otherwise(0L)
    val d = (k - lit(1000L) * y).as("d")
    val m = Tables(s, dir, "documents")
      .select(d, y.as("y"))
      .agg(count(lit(1)).as("n"), sum(col("d") * col("d")).as("sd2"),
        sum("y").as("npos"))
    val nD = col("n").cast(DoubleType)
    val brier = col("sd2").cast(DoubleType) / nD / 1000000d
    val base = col("npos").cast(DoubleType) / nD
    m.select(col("n"), col("npos"),
        round(brier, 6).as("brier"),
        round(base, 6).as("base_rate"),
        round(lit(1d) - brier / (base * (lit(1d) - base)), 6).as("brier_skill"))
  }

  private val qBrierScoreSql =
    """WITH d AS (
      |  SELECT least(n_chars, 1000) -
      |      1000 * (CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS d,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |m AS (SELECT COUNT(*) AS n, CAST(SUM(d * d) AS BIGINT) AS sd2,
      |        CAST(SUM(y) AS BIGINT) AS npos FROM d)
      |SELECT n, npos,
      |  round(CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6) AS brier,
      |  round(CAST(npos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS base_rate,
      |  round(1.0 - (CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0)
      |    / ((CAST(npos AS DOUBLE) / CAST(n AS DOUBLE))
      |      * (1.0 - CAST(npos AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS brier_skill
      |FROM m""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_brier_score" -> (qBrierScore(_, _)),
    "q_power_analysis" -> (qPowerAnalysis(_, _)),
    "q_confusion_stats" -> (qConfusionStats(_, _)),
    "q_cohen_kappa" -> (qCohenKappa(_, _)),
    "q_psi" -> (qPsi(_, _)),
    "ann_matryoshka" -> (annMatryoshka(_, _)),
    "ta_oov_rate" -> (taOovRate(_, _)),
    "q_gini" -> (qGini(_, _)),
    "q_ht_estimate" -> (qHtEstimate(_, _)),
    "ta_wasserstein" -> (taWasserstein(_, _)))

  def oracles: Map[String, String] = Map(
    "q_brier_score" -> qBrierScoreSql,
    "q_power_analysis" -> qPowerAnalysisSql,
    "q_confusion_stats" -> qConfusionStatsSql,
    "q_cohen_kappa" -> qCohenKappaSql,
    "q_psi" -> qPsiSql,
    "ann_matryoshka" -> annMatryoshkaSql,
    "ta_oov_rate" -> taOovRateSql,
    "q_gini" -> qGiniSql,
    "q_ht_estimate" -> qHtEstimateSql,
    "ta_wasserstein" -> taWassersteinSql)
}
