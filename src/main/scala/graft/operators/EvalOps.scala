package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  // ------------------------------------------------------------- q_auc

  /** Exact ROC-AUC of a score against a binary label (here: document
    * length scoring "is English") via the rank-sum (Mann-Whitney U)
    * identity with tie correction: AUC = (2·Σ avgrank⁺ − n⁺(n⁺+1)) /
    * (2·n⁺·n⁻), where avgrank is the average rank of a tied score
    * group. Everything up to the final division is INTEGER arithmetic
    * (2·avgrank = min_rank + max_rank is always integral), so the AUC
    * double is one exact IEEE division — no sampling, no approximation,
    * and the only shuffle is the global rank sort, which at 100 TB is
    * the same range-partitioned sort every global ranking pays (or is
    * replaced by the two-phase q_global_shuffle rank pattern).
    */
  def qAuc(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(
      col("n_chars").as("score"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val w = Window.orderBy("score")
    val ranked = d
      .withColumn("rmin", rank().over(w).cast(LongType))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("score")))
      // 2·avgrank of a tie group spanning ranks [rmin, rmin+cnt-1]
      .withColumn("r2", lit(2) * col("rmin") + col("cnt") - lit(1))
    ranked.agg(
        sum(when(col("y") === 1, col("r2")).otherwise(0L)).as("r2pos"),
        sum(col("y")).as("npos"),
        sum(lit(1L) - col("y")).as("nneg"))
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
    * probabilities to gate a corpus. Deciles come from ntile over a
    * total order (score, doc_id), so bins are deterministic; per-bin
    * stats are integer counts and one exact division each.
    */
  def qCalibration(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(
      col("doc_id"), col("n_chars").as("score"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    d.withColumn("bin",
        ntile(CalBins).over(Window.orderBy("score", "doc_id")).cast(LongType))
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
    * total order, then segment-level population and revenue. Two
    * aggregates and three window ranks over the CUSTOMER-sized
    * relation — the corpus-sized pass is the first groupBy only.
    */
  def qRfm(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 6)
    val per = Tables(s, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast(dec)).as("monetary"))
    val maxD = per.agg(max("last_order").as("maxd"))
    def tile(c: String, asc: Boolean) = ntile(RfmTiles).over(
      if (asc) Window.orderBy(col(c).asc, col("custkey").asc)
      else Window.orderBy(col(c).desc, col("custkey").asc)).cast(LongType)
    val scored = per.crossJoin(broadcast(maxD))
      .withColumn("recency_days",
        datediff(col("maxd").cast(DateType), col("last_order").cast(DateType)).cast(LongType))
      .withColumn("r", tile("recency_days", asc = true))
      .withColumn("f", tile("freq", asc = false))
      .withColumn("m", tile("monetary", asc = false))
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
       |    CAST(ntile($RfmTiles) OVER (ORDER BY date_diff('day', CAST(last_order AS DATE), CAST(maxd AS DATE)) ASC, custkey ASC) AS BIGINT) AS r,
       |    CAST(ntile($RfmTiles) OVER (ORDER BY freq DESC, custkey ASC) AS BIGINT) AS f,
       |    CAST(ntile($RfmTiles) OVER (ORDER BY monetary DESC, custkey ASC) AS BIGINT) AS m
       |  FROM per, maxd)
       |SELECT CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) AS segment,
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
    val h = PortableHash.sql("'boot:' || CAST(event_id AS VARCHAR)")
    s"""WITH ev AS (
       |  SELECT event_id, event_type,
       |    CAST(floor(value * $BootVQ.0) AS BIGINT) AS vq
       |  FROM events WHERE value IS NOT NULL),
       |pt AS (
       |  SELECT event_type, COUNT(*) AS n, CAST(SUM(vq) AS BIGINT) AS svq
       |  FROM ev GROUP BY event_type),
       |point AS (SELECT event_type, n,
       |            (svq - ((svq % n + n) % n)) // n AS mean_obs_q FROM pt),
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
       |    (swv - ((swv % sw + sw) % sw)) // sw AS mean_q
       |  FROM rm WHERE sw > 0),
       |ranked AS (
       |  SELECT event_type, r, mean_q,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY mean_q, r) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n_reps
       |  FROM means),
       |ci AS (
       |  SELECT event_type, CAST(MIN(n_reps) AS BIGINT) AS n_reps,
       |    MIN(CASE WHEN rn = (n_reps + 19) // 20 THEN mean_q END) AS ci_lo_q,
       |    MIN(CASE WHEN rn = n_reps + 1 - ((n_reps + 19) // 20)
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
    * q_feature_quantiles shape).
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
