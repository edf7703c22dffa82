package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Model-evaluation and governed-release primitives — the readout side
  * of the training pipeline: ranking quality (AUC), probability
  * calibration, customer segmentation, and differentially-private
  * aggregate release. Exactness: AUC is pure integer rank arithmetic;
  * calibration/RFM are exact integer/decimal aggregates; the DP noise
  * passes through ln and is rounded at 1e-6 (NOTES technique 3).
  */
object EvalOps {

  // ------------------------------------------------- two-phase rank kit

  /** Global row_number over (bucket, ord...) order WITHOUT a global
    * single-partition window: per-bucket counts, a cumulative-offset
    * window over the DISTINCT buckets only (bounded by the bucket
    * domain, never the row count), and a row_number partitioned by
    * bucket. `bktOrd` must order buckets consistently with the row
    * order's leading component (asc or desc).
    */
  private[graft] def rnBucketed(df: DataFrame, bkt: Column, bktOrd: Column,
      ord: Seq[Column]): DataFrame = {
    val base = df.withColumn("_b", bkt)
    val offs = base.groupBy("_b").agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(sum("_c").over(
        Window.orderBy(bktOrd).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("_b", "_off")
    base.join(offs, Seq("_b"))
      .withColumn("rn", col("_off") +
        row_number().over(Window.partitionBy("_b").orderBy(ord: _*)))
      .drop("_b", "_off")
  }

  /** Global row_number over (key, id) total order for a BOUNDED-domain
    * key (score histogram values, day counts, order frequencies) and a
    * monotone integer id, with no corpus-sized window anywhere: the id
    * is coarsened to `id >> idShift` sub-buckets that nest inside each
    * key value, offsets come from two bounded cumulative windows (over
    * distinct keys; over sub-buckets within a key), and row_number runs
    * per (key, sub-bucket) cell. idShift trades sub-bucket count
    * against cell population and scales with the id range (a deploy
    * knob, fixed here for the oracle).
    */
  private[graft] def rnValueId(df: DataFrame, key: Column, keyAsc: Boolean,
      id: Column, idShift: Int): DataFrame = {
    val kOrd = if (keyAsc) asc("_k") else desc("_k")
    val base = df.withColumn("_k", key).withColumn("_i", id)
      .withColumn("_ib", shiftright(col("_i"), idShift))
    val grid = base.groupBy("_k", "_ib").agg(count(lit(1)).as("_c"))
    val koff = grid.groupBy("_k").agg(sum("_c").as("_ck"))
      .withColumn("_koff", coalesce(sum("_ck").over(
        Window.orderBy(kOrd).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("_k", "_koff")
    val offs = grid
      .withColumn("_ioff", coalesce(sum("_c").over(
        Window.partitionBy("_k").orderBy(asc("_ib"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(koff, Seq("_k"))
      .select(col("_k"), col("_ib"), (col("_koff") + col("_ioff")).as("_off"))
    base.join(offs, Seq("_k", "_ib"))
      .withColumn("rn", col("_off") +
        row_number().over(Window.partitionBy("_k", "_ib").orderBy(asc("_i"))))
      .drop("_k", "_i", "_ib", "_off")
  }

  /** SQL-standard ntile(n) bin from a 1-based global row_number `rn`
    * and the total row count `nTot`: the first (N % n) bins take
    * ceil(N/n) rows, the rest floor(N/n) — exactly the bucket layout
    * ntile() produces over the same total order, so results are
    * bit-identical to the window function without its single-partition
    * sort. (When N < n the else-branch is unreachable: cut = N.)
    */
  private[graft] def ntileBin(n: Int, rn: Column, nTot: Column): Column = {
    def idiv(a: Column, b: Column) = call_function("div", a, b) // exact IntegralDivide
    val q = idiv(nTot.cast(LongType), lit(n.toLong))
    val r = nTot.cast(LongType) % n
    val cut = r * (q + 1)
    when(rn <= cut, idiv(rn - 1, q + 1) + 1)
      .otherwise(r + idiv(rn - cut - 1, q) + 1)
  }

  // ------------------------------------------------------------- q_auc

  /** Exact ROC-AUC of a score against a binary label (here: document
    * length scoring "is English") via the rank-sum (Mann-Whitney U)
    * identity with tie correction: AUC = (2·Σ avgrank⁺ − n⁺(n⁺+1)) /
    * (2·n⁺·n⁻), where avgrank is the average rank of a tied score
    * group. Ranks are NEVER materialized per row: the corpus collapses
    * to the per-distinct-score histogram (cnt, pos) in one map-side-
    * combinable pass, the tie group spanning ranks [rmin, rmin+cnt-1]
    * has rmin = cum_cnt − cnt + 1, so 2·avgrank = 2·cum_cnt − cnt + 1,
    * and Σ avgrank⁺ = Σ_scores pos·avgrank — all from one cumulative
    * window over DISTINCT scores (bounded by the score domain, not the
    * corpus). Everything up to the final division is INTEGER arithmetic
    * so the AUC double is one exact IEEE division. Row-count bound: the
    * rank-sum terms grow as pos·2N, so int64 is exact to ~2^31 rows —
    * beyond that, shift to per-score 128-bit decimal sums.
    */
  def qAuc(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(
      col("n_chars").as("score"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val hist = d.groupBy("score")
      .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
    val cum = hist.withColumn("cumt",
      sum("cnt").over(Window.orderBy("score")))
    // 2·avgrank of the tie group at this score = 2·cumt − cnt + 1
    cum.agg(
        sum(col("pos") * (lit(2) * col("cumt") - col("cnt") + 1)).as("r2pos"),
        sum(col("pos")).as("npos"),
        sum(col("cnt") - col("pos")).as("nneg"))
      .select(col("npos"), col("nneg"),
        ((col("r2pos") - col("npos") * (col("npos") + 1)).cast(DoubleType) /
          (lit(2.0) * col("npos").cast(DoubleType) * col("nneg").cast(DoubleType)))
          .as("auc"))
  }

  private val qAucSql =
    """WITH d AS (
      |  SELECT n_chars AS score,
      |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |ranked AS (
      |  SELECT y,
      |    2 * CAST(rank() OVER (ORDER BY score) AS BIGINT)
      |      + CAST(COUNT(*) OVER (PARTITION BY score) AS BIGINT) - 1 AS r2
      |  FROM d),
      |a AS (
      |  SELECT CAST(SUM(CASE WHEN y = 1 THEN r2 ELSE 0 END) AS BIGINT) AS r2pos,
      |         CAST(SUM(y) AS BIGINT) AS npos,
      |         CAST(SUM(1 - y) AS BIGINT) AS nneg
      |  FROM ranked)
      |SELECT npos, nneg,
      |  CAST(r2pos - npos * (npos + 1) AS DOUBLE)
      |    / (2.0 * CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE)) AS auc
      |FROM a""".stripMargin

  // ----------------------------------------------------- q_calibration

  private val CalBins = 10

  /** Probability-calibration (reliability) bins: decile-bucket the
    * score, report per-bin observed positive rate vs mean score — the
    * standard diagnostic before trusting a quality classifier's
    * probabilities to gate a corpus. Deciles are deterministic over the
    * total order (score, doc_id) and BIT-IDENTICAL to ntile(10), but no
    * ntile window runs: the global row_number comes from [[rnValueId]]
    * (bounded histogram offsets + per-cell row_number — nothing
    * corpus-sized enters one partition) and the bin from the
    * SQL-standard bucket arithmetic in [[ntileBin]].
    */
  def qCalibration(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(
      col("doc_id"), col("n_chars").as("score"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val nTot = d.agg(count(lit(1)).as("_N"))
    rnValueId(d, col("score"), keyAsc = true, col("doc_id"), idShift = 12)
      .crossJoin(broadcast(nTot))
      .withColumn("bin", ntileBin(CalBins, col("rn"), col("_N")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum("score").as("score_sum"))
      .select(col("bin"), col("n"),
        (col("n_pos").cast(DoubleType) / col("n").cast(DoubleType)).as("pos_rate"),
        (col("score_sum").cast(DoubleType) / col("n").cast(DoubleType)).as("mean_score"))
      .orderBy("bin")
  }

  private val qCalibrationSql =
    s"""WITH d AS (
       |  SELECT doc_id, n_chars AS score,
       |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |b AS (
       |  SELECT y, score,
       |         CAST(ntile($CalBins) OVER (ORDER BY score, doc_id) AS BIGINT) AS bin
       |  FROM d)
       |SELECT bin, COUNT(*) AS n,
       |  CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pos_rate,
       |  CAST(CAST(SUM(score) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_score
       |FROM b GROUP BY bin ORDER BY bin""".stripMargin

  // -------------------------------------------------------------- q_rfm

  private val RfmTiles = 5

  /** RFM segmentation: per customer recency (days since last order,
    * against the corpus max date), frequency (order count) and
    * monetary (exact decimal revenue), each quintile-scored over a
    * total order, then segment-level population and revenue. The
    * customer relation GROWS with the data, so none of the three
    * quintile ranks may run as a global window: recency (day domain)
    * and frequency (order-count domain) rank via [[rnValueId]] over
    * their bounded value histograms; monetary (near-unique decimals)
    * ranks via [[rnBucketed]] on quantized-cents range buckets
    * (cents >> 20 ≈ $10k slices — monotone in the sort order, bounded
    * by the price domain). Quintile bins replicate ntile(5) exactly
    * through [[ntileBin]]. The customer aggregate is localCheckpoint'd
    * once: three rank passes reuse the materialized relation instead
    * of re-running the corpus groupBy per rank.
    */
  def qRfm(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 6)
    val per = Tables(s, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast(dec)).as("monetary"))
    val maxD = per.agg(max("last_order").as("maxd"))
    val base = per.crossJoin(broadcast(maxD))
      .withColumn("recency_days",
        datediff(col("maxd").cast(DateType), col("last_order").cast(DateType)).cast(LongType))
      .localCheckpoint()
    val nTot = base.agg(count(lit(1)).as("_N"))
    def quint(rn: Column) = ntileBin(RfmTiles, rn, col("_N"))
    // three independent rank relations over slim projections of the
    // checkpointed base (not chained — chaining re-evaluates each rank
    // subtree inside the next one's grid aggregation), joined back on
    // the customer key
    val rnR = rnValueId(base.select("custkey", "recency_days"),
        col("recency_days"), keyAsc = true, col("custkey"), idShift = 7)
      .select(col("custkey"), col("rn").as("rn_r"))
    val rnF = rnValueId(base.select("custkey", "freq"),
        col("freq"), keyAsc = false, col("custkey"), idShift = 7)
      .select(col("custkey"), col("rn").as("rn_f"))
    val cents = (col("monetary") * 100).cast(LongType)
    val rnM = rnBucketed(base.select("custkey", "monetary"),
        shiftright(cents, 20), desc("_b"),
        Seq(col("monetary").desc, col("custkey").asc))
      .select(col("custkey"), col("rn").as("rn_m"))
    val scored = base.select("custkey", "monetary")
      .join(rnR, Seq("custkey")).join(rnF, Seq("custkey"))
      .join(rnM, Seq("custkey"))
      .crossJoin(broadcast(nTot))
      .withColumn("r", quint(col("rn_r")))
      .withColumn("f", quint(col("rn_f")))
      .withColumn("m", quint(col("rn_m")))
    scored.groupBy(concat(col("r"), col("f"), col("m")).as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum("monetary").as("revenue"))
      .select(col("segment"), col("n_customers"),
        col("revenue").cast(DoubleType).as("revenue"))
      .orderBy(desc("n_customers"), asc("segment"))
      .limit(25)
  }

  private val qRfmSql =
    s"""WITH per AS (
       |  SELECT o_custkey AS custkey, max(o_orderdate) AS last_order,
       |         COUNT(*) AS freq,
       |         SUM(CAST(o_totalprice AS DECIMAL(38, 6))) AS monetary
       |  FROM orders GROUP BY o_custkey),
       |maxd AS (SELECT max(last_order) AS maxd FROM per),
       |scored AS (
       |  SELECT custkey, monetary,
       |    CAST(ntile($RfmTiles) OVER (ORDER BY divide(epoch_ms(CAST(CAST(maxd AS DATE) AS TIMESTAMP)) - epoch_ms(CAST(CAST(last_order AS DATE) AS TIMESTAMP)), 86400000) ASC, custkey ASC) AS BIGINT) AS r,
       |    CAST(ntile($RfmTiles) OVER (ORDER BY freq DESC, custkey ASC) AS BIGINT) AS f,
       |    CAST(ntile($RfmTiles) OVER (ORDER BY monetary DESC, custkey ASC) AS BIGINT) AS m
       |  FROM per, maxd)
       |SELECT CAST(r AS STRING) || CAST(f AS STRING) || CAST(m AS STRING) AS segment,
       |  COUNT(*) AS n_customers,
       |  CAST(SUM(monetary) AS DOUBLE) AS revenue
       |FROM scored GROUP BY 1
       |ORDER BY n_customers DESC, segment ASC LIMIT 25""".stripMargin

  // --------------------------------------------------------- q_dp_counts

  private val DpEps = 1.0
  private val DpU = 1048576L // 2^20 uniform grid for the inverse-CDF draw

  /** Differentially-private count release: per-group counts with
    * Laplace(1/ε) noise drawn by inverse CDF from a deterministic
    * per-group uniform (hash-seeded — reproducible releases, the
    * audit-friendly deployment where the noise seed is a secret, not
    * the mechanism). The true count never leaves the engine in the
    * release row set; here the noised value is rounded at 1e-6 for the
    * cross-engine oracle. One aggregation pass; noise is constant-time
    * per released row.
    */
  def qDpCounts(s: SparkSession, dir: String): DataFrame = {
    val u = ((PortableHash.hash64(concat(lit("dp:"), col("event_type"))) % (DpU - 1) + 1)
      .cast(DoubleType) / DpU.toDouble) - 0.5
    val noise = -signum(u) * log(lit(1.0) - lit(2.0) * abs(u)) / DpEps
    Tables(s, dir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        round(col("n").cast(DoubleType) + noise, 6).as("released_count"),
        lit(DpEps).as("epsilon"))
      .orderBy("event_type")
  }

  private val qDpCountsSql = {
    val h = PortableHash.sql("'dp:' || event_type")
    val u = s"(CAST($h % ${DpU - 1} + 1 AS DOUBLE) / $DpU.0) - 0.5"
    s"""WITH g AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type),
       |u AS (SELECT event_type, n, $u AS u FROM g)
       |SELECT event_type,
       |  round(CAST(n AS DOUBLE) + (-sign(u) * ln(1.0 - 2.0 * abs(u)) / $DpEps), 6) AS released_count,
       |  CAST($DpEps AS DOUBLE) AS epsilon
       |FROM u ORDER BY event_type""".stripMargin
  }

  // ----------------------------------------------------- q_bootstrap_ci

  private val BootB = 40           // bootstrap replicates
  private val BootVQ = 1048576L    // 2^20 value quantizer
  private val BootP = 2147483647L  // 2^31 - 1 (the minhash perm modulus)
  /** Poisson(1) CDF cut points on the 31-bit affine-hash domain:
    * replicate weight w = #thresholds below u, capped at 5
    * (P(w>5) < 6e-4). Computed ONCE here and interpolated verbatim
    * into the oracle SQL, so both engines binarize identical integers.
    */
  private val BootCuts: Seq[Long] = {
    val e1 = math.exp(-1.0)
    Seq(1.0, 2.0, 2.5, 8.0 / 3, 65.0 / 24)
      .map(c => math.floor(c * e1 * BootP).toLong)
  }
  /** per-replicate uniform: ONE portable hash per row, fanned to
    * [[BootB]] replicate draws by the seeded affine family over the
    * Mersenne-31 modulus (the minhash-perm construction —
    * `DedupOps.perms`): 40 md5s/row would dominate the query (2.1 s
    * profiled), one md5 + 40 multiplies is 4× cheaper. The family is
    * pairwise-independent, the documented fidelity tradeoff of a
    * deterministic reproducible bootstrap.
    */
  private val bootUSql =
    s"(h * ((1103515245 * (2 * CAST(r AS BIGINT) + 1) + 12345) % ${BootP - 1} + 1)" +
      s" + ((1103515245 * (2 * CAST(r AS BIGINT) + 2) + 54321) % $BootP)) % $BootP"

  /** Percentile-bootstrap confidence interval for the per-type mean of
    * `value` — the uncertainty readout an experiment/eval pipeline
    * attaches to every point estimate. Resampling is the POISSON
    * bootstrap (the only bootstrap that works on a distributed scan:
    * each row draws its per-replicate multiplicity independently, so
    * no replicate ever needs the dataset's row count or a global
    * shuffle): w(row, r) = Poisson(1) by inverse-CDF on the portable
    * row×replicate hash — deterministic, reproducible, identical in
    * the oracle. The ×[[BootB]] fan-out map-side-combines into
    * (type, replicate) integer sums; replicate means are exact floor
    * divisions; the CI is rank-based over the [[BootB]] replicate
    * means per type (a bounded 40-row window, never corpus-sized)
    * with ceil-rank cut points at 5%/95%.
    */
  def qBootstrapCi(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .where(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * BootVQ.toDouble).cast(LongType).as("vq"))
    val point = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("vq").as("svq"))
      .selectExpr("event_type", "n",
        "(svq - ((svq % n + n) % n)) DIV n AS mean_obs_q")
    val wCol = when(col("u") < BootCuts(0), 0L)
      .when(col("u") < BootCuts(1), 1L)
      .when(col("u") < BootCuts(2), 2L)
      .when(col("u") < BootCuts(3), 3L)
      .when(col("u") < BootCuts(4), 4L)
      .otherwise(5L)
    val repMeans = ev
      .withColumn("h", PortableHash.hash64(
        concat(lit("boot:"), col("event_id").cast(StringType))) % BootP)
      .select(col("h"), col("event_type"), col("vq"),
        explode(sequence(lit(0), lit(BootB - 1))).as("r"))
      .withColumn("u", expr(bootUSql))
      .withColumn("w", wCol)
      .groupBy("event_type", "r")
      .agg(sum(col("w") * col("vq")).as("swv"), sum("w").as("sw"))
      .where(col("sw") > 0)
      .selectExpr("event_type", "r",
        "(swv - ((swv % sw + sw) % sw)) DIV sw AS mean_q")
    val ranked = repMeans.withColumn("rn",
      row_number().over(Window.partitionBy("event_type")
        .orderBy(col("mean_q"), col("r"))))
    val ci = ranked
      .join(repMeans.groupBy("event_type").agg(count(lit(1)).as("n_reps")),
        Seq("event_type"))
      .withColumn("lo_rk", expr("(n_reps + 19) DIV 20"))
      .withColumn("hi_rk", expr("n_reps + 1 - ((n_reps + 19) DIV 20)"))
      .groupBy("event_type")
      .agg(first("n_reps").as("n_reps"),
        min(when(col("rn") === col("lo_rk"), col("mean_q"))).as("ci_lo_q"),
        min(when(col("rn") === col("hi_rk"), col("mean_q"))).as("ci_hi_q"))
    point.join(ci, Seq("event_type"))
      .select("event_type", "n", "mean_obs_q", "n_reps", "ci_lo_q", "ci_hi_q")
      .orderBy("event_type")
  }

  private val qBootstrapCiSql = {
    val h = PortableHash.sql("'boot:' || CAST(event_id AS STRING)")
    s"""WITH ev AS (
       |  SELECT event_id, event_type,
       |    CAST(floor(value * $BootVQ.0) AS BIGINT) AS vq
       |  FROM events WHERE value IS NOT NULL),
       |pt AS (
       |  SELECT event_type, COUNT(*) AS n, CAST(SUM(vq) AS BIGINT) AS svq
       |  FROM ev GROUP BY event_type),
       |point AS (SELECT event_type, n,
       |            divide(svq - ((svq % n + n) % n), n) AS mean_obs_q FROM pt),
       |reps AS (
       |  SELECT $h % $BootP AS h, event_type, vq,
       |    unnest(range(0, $BootB)) AS r
       |  FROM ev),
       |us AS (SELECT event_type, r, vq, $bootUSql AS u FROM reps),
       |ws AS (
       |  SELECT event_type, r, vq,
       |    CASE WHEN u < ${BootCuts(0)} THEN 0
       |         WHEN u < ${BootCuts(1)} THEN 1
       |         WHEN u < ${BootCuts(2)} THEN 2
       |         WHEN u < ${BootCuts(3)} THEN 3
       |         WHEN u < ${BootCuts(4)} THEN 4
       |         ELSE 5 END AS w
       |  FROM us),
       |rm AS (
       |  SELECT event_type, r, CAST(SUM(w * vq) AS BIGINT) AS swv,
       |    CAST(SUM(w) AS BIGINT) AS sw
       |  FROM ws GROUP BY 1, 2),
       |means AS (
       |  SELECT event_type, r,
       |    divide(swv - ((swv % sw + sw) % sw), sw) AS mean_q
       |  FROM rm WHERE sw > 0),
       |ranked AS (
       |  SELECT event_type, r, mean_q,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY mean_q, r) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n_reps
       |  FROM means),
       |ci AS (
       |  SELECT event_type, CAST(MIN(n_reps) AS BIGINT) AS n_reps,
       |    MIN(CASE WHEN rn = divide(n_reps + 19, 20) THEN mean_q END) AS ci_lo_q,
       |    MIN(CASE WHEN rn = n_reps + 1 - divide(n_reps + 19, 20)
       |             THEN mean_q END) AS ci_hi_q
       |  FROM ranked GROUP BY event_type)
       |SELECT p.event_type, p.n, p.mean_obs_q, ci.n_reps, ci.ci_lo_q, ci.ci_hi_q
       |FROM point p JOIN ci USING (event_type)
       |ORDER BY event_type""".stripMargin
  }

  // --------------------------------------------------------- ta_ks_test

  /** Two-sample Kolmogorov–Smirnov statistic of every source's
    * document-length distribution against the whole corpus — the
    * nonparametric drift test (is this source's length profile the
    * corpus's?) next to q_ab_test's parametric readout. The ECDF
    * comparison stays EXACT: D's argmax is computed over the integer
    * cross-products |cum_s·N − cum·n_s| (no per-point division, so no
    * float ordering), and only the reported statistic divides once.
    * Everything runs on VALUE-level relations — per-(source, length)
    * counts, the source×distinct-length grid, and per-source
    * cumulative windows over distinct lengths — so at 100 TB the
    * windows never see a corpus-sized row set (the
    * q_feature_quantiles shape). Row-count bound: the cross-products
    * cum_s·N and cum·n_s grow as N², so int64 is exact only to
    * ~3·10⁹ documents — past that, divide both ECDFs to fixed-point
    * (cum·2³⁰ DIV n) first so the sup-distance terms stay bounded,
    * at the cost of one quantization ulp in tie-breaking.
    */
  def taKsTest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("source"), col("n_chars").as("v"))
    val hist = docs.groupBy("source", "v").agg(count(lit(1)).as("c"))
    val sv = hist.select("source").distinct()
      .crossJoin(docs.select("v").distinct())
      .join(hist, Seq("source", "v"), "left")
      .na.fill(0L, Seq("c"))
    val cumS = sv.withColumn("cum_s",
      sum("c").over(Window.partitionBy("source").orderBy("v")))
    val cumG = docs.groupBy("v").agg(count(lit(1)).as("cg"))
      .withColumn("cum", sum("cg").over(Window.orderBy("v")))
    val ns = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
    val n = docs.agg(count(lit(1)).as("n"))
    cumS.join(cumG.select("v", "cum"), Seq("v"))
      .join(ns, Seq("source")).crossJoin(broadcast(n))
      .select(col("source"), col("n_s"), col("n"),
        abs(col("cum_s") * col("n") - col("cum") * col("n_s")).as("d"))
      .groupBy("source")
      .agg(first("n_s").as("n_s"), max("d").as("d_num"), first("n").as("nn"))
      .select(col("source"), col("n_s"), col("d_num"),
        round(col("d_num").cast(DoubleType) /
          (col("n_s").cast(DoubleType) * col("nn")), 6).as("ks"))
      .orderBy("source")
  }

  private val taKsTestSql =
    """WITH d AS (SELECT source, n_chars AS v FROM documents),
      |hist AS (SELECT source, v, COUNT(*) AS c FROM d GROUP BY 1, 2),
      |sv AS (
      |  SELECT s.source, vv.v, COALESCE(h.c, 0) AS c
      |  FROM (SELECT DISTINCT source FROM hist) s
      |  CROSS JOIN (SELECT DISTINCT v FROM d) vv
      |  LEFT JOIN hist h ON h.source = s.source AND h.v = vv.v),
      |cs AS (SELECT source, v,
      |         CAST(SUM(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum_s
      |       FROM sv),
      |cg AS (SELECT v, CAST(SUM(cg) OVER (ORDER BY v) AS BIGINT) AS cum
      |       FROM (SELECT v, COUNT(*) AS cg FROM d GROUP BY v)),
      |ns AS (SELECT source, COUNT(*) AS n_s FROM d GROUP BY source),
      |nn AS (SELECT COUNT(*) AS n FROM d),
      |diffs AS (
      |  SELECT cs.source, ns.n_s, nn.n,
      |    ABS(cs.cum_s * nn.n - cg.cum * ns.n_s) AS dd
      |  FROM cs JOIN cg USING (v) JOIN ns USING (source) CROSS JOIN nn)
      |SELECT source, CAST(MIN(n_s) AS BIGINT) AS n_s,
      |  CAST(MAX(dd) AS BIGINT) AS d_num,
      |  round(CAST(MAX(dd) AS DOUBLE) /
      |    (CAST(MIN(n_s) AS DOUBLE) * MIN(n)), 6) AS ks
      |FROM diffs GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------------ registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_auc" -> (qAuc(_, _)),
    "q_calibration" -> (qCalibration(_, _)),
    "q_rfm" -> (qRfm(_, _)),
    "q_dp_counts" -> (qDpCounts(_, _)),
    "q_bootstrap_ci" -> (qBootstrapCi(_, _)),
    "ta_ks_test" -> (taKsTest(_, _)))

  def oracles: Map[String, String] = Map(
    "q_auc" -> qAucSql,
    "q_calibration" -> qCalibrationSql,
    "q_rfm" -> qRfmSql,
    "q_dp_counts" -> qDpCountsSql,
    "q_bootstrap_ci" -> qBootstrapCiSql,
    "ta_ks_test" -> taKsTestSql)
}
