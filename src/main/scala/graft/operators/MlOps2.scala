package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Second batch of in-engine ML primitives: online-experimentation
  * readout (UCB), a closed-form matrix-factorization half-step (ALS),
  * and a seasonal profile extractor. Same exactness contract as
  * [[MlOps]]: integer/quantized aggregation everywhere order could
  * matter; transcendentals only in final scalars, rounded at 1e-6 on
  * both engines (NOTES technique 3).
  */
object MlOps2 {

  // ----------------------------------------------------- q_ucb_bandit

  /** UCB1 bandit readout over the experiment arms (event types):
    * per-arm pull count, exact mean reward, UCB1 score
    * mean + √(2·ln N / n), and the arm the policy would pull next.
    * One aggregation pass (counts + decimal-exact sums); the score
    * arithmetic runs on the 5-row arm summary — the 100 TB cost is
    * the scan, like every experiment readout (q_ab_test).
    *
    * Mean is engine-exact (decimal sum ÷ count, one IEEE division);
    * the UCB score passes through ln so it is rounded at 1e-6 on both
    * sides; the argmax runs on the ROUNDED score with arm-name
    * tiebreak, so the chosen arm is deterministic.
    */
  def qUcbBandit(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val arms = Tables(s, dir, "events").groupBy(col("event_type").as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1048576.0).cast(dec)).as("sq"))
    val tot = arms.agg(sum("n").as("big_n"))
    val scored = arms.crossJoin(broadcast(tot))
      .select(col("arm"), col("n"),
        (col("sq").cast(DoubleType) / col("n").cast(DoubleType) / 1048576.0).as("mean_reward"),
        round((col("sq").cast(DoubleType) / col("n").cast(DoubleType) / 1048576.0) +
          sqrt(lit(2.0) * log(col("big_n").cast(DoubleType)) / col("n").cast(DoubleType)), 6)
          .as("ucb"))
    val best = scored.agg(max(struct(col("ucb"), col("arm"))).as("b"))
      .select(col("b.ucb").as("bu"), col("b.arm").as("ba"))
    scored.crossJoin(broadcast(best))
      .select(col("arm"), col("n"), col("mean_reward"), col("ucb"),
        (col("arm") === col("ba")).as("chosen"))
      .orderBy("arm")
  }

  private val qUcbBanditSql =
    s"""WITH arms AS (
       |  SELECT event_type AS arm, COUNT(*) AS n,
       |         SUM(CAST(floor(value * 1048576.0) AS BIGINT)) AS sq
       |  FROM events GROUP BY event_type),
       |tot AS (SELECT SUM(n) AS big_n FROM arms),
       |scored AS (
       |  SELECT arm, n,
       |    CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0 AS mean_reward,
       |    round((CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0) +
       |      sqrt(2.0 * ln(CAST(big_n AS DOUBLE)) / CAST(n AS DOUBLE)), 6) AS ucb
       |  FROM arms, tot),
       |best AS (
       |  SELECT arm AS ba FROM (
       |    SELECT arm, row_number() OVER (ORDER BY ucb DESC, arm DESC) AS rk
       |    FROM scored) WHERE rk = 1)
       |SELECT arm, CAST(n AS BIGINT) AS n, mean_reward, ucb,
       |       arm = (SELECT ba FROM best) AS chosen
       |FROM scored ORDER BY arm""".stripMargin

  // ------------------------------------------------------- q_als_step

  private val AlsQ = 1073741824.0 // 2^30 quantizer for factor-product sums
  private val AlsLambda = 0.1
  private val AlsTopUsers = 20

  /** One closed-form ALS half-step (rank 2): with item factors fixed
    * (hash-initialized), each user's factor vector solves its own 2×2
    * regularized normal equation u = (Σvᵢvᵢᵀ + λI)⁻¹ Σ rᵤᵢvᵢ — the
    * alternating-least-squares recommender update, run entirely as ONE
    * groupBy over the rating table (five quantized sums per user) plus
    * constant-time per-user algebra. No driver-side state, no
    * iteration inside the step: at 100 TB this is exactly the
    * Spark-native ALS sub-step shape (ratings co-partitioned by user,
    * item factors broadcast — here they are derived in-row from the
    * item key, so not even a join).
    *
    * Engine-exact: item factors are deterministic per item; every
    * per-row product is individually-rounded IEEE; the five per-user
    * sums are 2^30-quantized (order-independent); the 2×2 solve is a
    * short identical op chain over the dequantized scalars.
    */
  def qAlsStep(s: SparkSession, dir: String): DataFrame = {
    // rating r(user, brand) = number of order lines (implicit count
    // feedback — integer, so the rating itself needs no quantization)
    val ratings = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(Tables(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
        col("o_custkey").as("user_id")), "l_orderkey")
      .join(Tables(s, dir, "part").select(col("p_partkey").as("l_partkey"),
        col("p_brand").as("item")), "l_partkey")
      .groupBy("user_id", "item").agg(count(lit(1)).as("r"))
    // deterministic item factors in [-0.5, 0.5): v_d = hash(d:item)‰ − 0.5
    def itemF(d: Int): Column =
      (PortableHash.hash64(col("item"), d) % 1000L).cast(DoubleType) / 1000.0 - 0.5
    val q = ratings.select(col("user_id"), col("r").cast(DoubleType).as("r"),
        itemF(1).as("v1"), itemF(2).as("v2"))
      .select(col("user_id"),
        floor(col("v1") * col("v1") * AlsQ).as("a11"),
        floor(col("v1") * col("v2") * AlsQ).as("a12"),
        floor(col("v2") * col("v2") * AlsQ).as("a22"),
        floor(col("r") * col("v1") * AlsQ).as("b1"),
        floor(col("r") * col("v2") * AlsQ).as("b2"))
      .groupBy("user_id")
      .agg(sum("a11").as("a11"), sum("a12").as("a12"), sum("a22").as("a22"),
        sum("b1").as("b1"), sum("b2").as("b2"))
    def dq(c: String): Column = col(c).cast(DoubleType) / AlsQ
    val a11 = dq("a11") + AlsLambda
    val a22 = dq("a22") + AlsLambda
    val a12 = dq("a12")
    val det = a11 * a22 - a12 * a12
    q.select(col("user_id"),
        ((a22 * dq("b1") - a12 * dq("b2")) / det).as("u1"),
        ((a11 * dq("b2") - a12 * dq("b1")) / det).as("u2"))
      .orderBy("user_id").limit(AlsTopUsers)
  }

  private val qAlsStepSql = {
    def h(seed: Int) =
      s"CAST(${PortableHash.sql("item", seed)} % 1000 AS DOUBLE) / 1000.0 - 0.5"
    s"""WITH ratings AS (
       |  SELECT o.o_custkey AS user_id, p.p_brand AS item, COUNT(*) AS r
       |  FROM lineitem l
       |  JOIN orders o ON o.o_orderkey = l.l_orderkey
       |  JOIN part p ON p.p_partkey = l.l_partkey
       |  GROUP BY 1, 2),
       |f AS (
       |  SELECT user_id, CAST(r AS DOUBLE) AS r,
       |         ${h(1)} AS v1, ${h(2)} AS v2
       |  FROM ratings),
       |qs AS (
       |  SELECT user_id,
       |    SUM(CAST(floor(v1 * v1 * 1073741824.0) AS BIGINT)) AS a11,
       |    SUM(CAST(floor(v1 * v2 * 1073741824.0) AS BIGINT)) AS a12,
       |    SUM(CAST(floor(v2 * v2 * 1073741824.0) AS BIGINT)) AS a22,
       |    SUM(CAST(floor(r * v1 * 1073741824.0) AS BIGINT)) AS b1,
       |    SUM(CAST(floor(r * v2 * 1073741824.0) AS BIGINT)) AS b2
       |  FROM f GROUP BY 1),
       |sv AS (
       |  SELECT user_id,
       |    CAST(a11 AS DOUBLE) / 1073741824.0 + 0.1 AS a11,
       |    CAST(a12 AS DOUBLE) / 1073741824.0 AS a12,
       |    CAST(a22 AS DOUBLE) / 1073741824.0 + 0.1 AS a22,
       |    CAST(b1 AS DOUBLE) / 1073741824.0 AS b1,
       |    CAST(b2 AS DOUBLE) / 1073741824.0 AS b2
       |  FROM qs)
       |SELECT user_id,
       |  (a22 * b1 - a12 * b2) / (a11 * a22 - a12 * a12) AS u1,
       |  (a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12) AS u2
       |FROM sv ORDER BY user_id LIMIT $AlsTopUsers""".stripMargin
  }

  // -------------------------------------------------- q_seasonal_profile

  /** Hour-of-day seasonal profile per event type: exact hourly means,
    * then the peak hour, trough hour and seasonal amplitude. Two
    * map-side-combinable aggregates (rows → 24·|types| hourly cells →
    * |types| profiles); the argmax/argmin run on exact means with hour
    * tiebreaks. The hourly-cell relation is corpus-size-independent,
    * so the second stage is free at any scale.
    */
  def qSeasonalProfile(s: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val hourly = Tables(s, dir, "events")
      .groupBy(col("event_type"), hour(col("ts")).cast(LongType).as("hr"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1048576.0).cast(dec)).as("sq"))
      .select(col("event_type"), col("hr"),
        (col("sq").cast(DoubleType) / col("n").cast(DoubleType) / 1048576.0).as("m"))
    hourly.groupBy("event_type")
      .agg(max(struct(col("m"), col("hr"))).as("pk"),
        min(struct(col("m"), col("hr"))).as("tr"))
      .select(col("event_type"),
        col("pk.hr").as("peak_hour"), col("pk.m").as("peak_mean"),
        col("tr.hr").as("trough_hour"), col("tr.m").as("trough_mean"),
        (col("pk.m") - col("tr.m")).as("amplitude"))
      .orderBy("event_type")
  }

  private val qSeasonalProfileSql =
    s"""WITH hourly AS (
       |  SELECT event_type, CAST(date_part('hour', ts) AS BIGINT) AS hr,
       |    CAST(SUM(CAST(floor(value * 1048576.0) AS BIGINT)) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE) / 1048576.0 AS m
       |  FROM events GROUP BY 1, 2),
       |pk AS (
       |  SELECT event_type, hr, m FROM (
       |    SELECT event_type, hr, m, row_number() OVER (
       |      PARTITION BY event_type ORDER BY m DESC, hr DESC) AS rk
       |    FROM hourly) WHERE rk = 1),
       |tr AS (
       |  SELECT event_type, hr, m FROM (
       |    SELECT event_type, hr, m, row_number() OVER (
       |      PARTITION BY event_type ORDER BY m ASC, hr ASC) AS rk
       |    FROM hourly) WHERE rk = 1)
       |SELECT pk.event_type,
       |  pk.hr AS peak_hour, pk.m AS peak_mean,
       |  tr.hr AS trough_hour, tr.m AS trough_mean,
       |  pk.m - tr.m AS amplitude
       |FROM pk JOIN tr ON pk.event_type = tr.event_type
       |ORDER BY pk.event_type""".stripMargin

  // ------------------------------------------------- q_mutual_information

  private val MiQ = 1073741824L // 2^30 quantizer for the log terms
  private val MiVQ = 1048576L   // 2^20 coordinate quantizer (the profile's)

  /** Mutual information I(bin(x_d); label) per embedding dimension —
    * the filter-method feature selector (which coordinates carry label
    * signal) run fully in-engine. Each coordinate discretizes into 4
    * fixed bins at ±2^18 around zero (fixed thresholds, not data-
    * dependent — exact and one pass); the (dim, bin, label)
    * contingency counts map-side-combine, and
    * I = Σ n_bl·ln(n_bl·N / (n_b·n_l)) / N accumulates as the usual
    * quantized-log integer sum, reported as mi_q = Σ n_bl·q(term)
    * (the N division left to the reader keeps the output integer-
    * exact). The relation after the first aggregate is
    * |dims|·|bins|·|labels| — corpus-size-independent; a rank orders
    * dims by score with a declared tiebreak.
    */
  def qMutualInformation(s: SparkSession, dir: String): DataFrame = {
    val half = MiVQ / 4 // 2^18 bin edge
    val xq = Tables(s, dir, "embeddings")
      .select(col("label"), posexplode(transform(col("embedding"),
        x => floor(x.cast(DoubleType) * MiVQ.toDouble).cast(LongType)))
        .as(Seq("pos", "v")))
      .select(col("label"), col("pos"),
        when(col("v") < -half, 0).when(col("v") < 0, 1)
          .when(col("v") < half, 2).otherwise(3).as("bin"))
    val nbl = xq.groupBy("pos", "bin", "label").agg(count(lit(1)).as("n_bl"))
    val nb = nbl.groupBy("pos", "bin").agg(sum("n_bl").as("n_b"))
    val nl = nbl.groupBy("pos", "label").agg(sum("n_bl").as("n_l"))
    val n = nbl.groupBy("pos").agg(sum("n_bl").as("n"))
    val mi = nbl.join(nb, Seq("pos", "bin")).join(nl, Seq("pos", "label"))
      .join(n, Seq("pos"))
      .select(col("pos"),
        (col("n_bl") * floor(round(
          log(col("n_bl").cast(DoubleType) * col("n") /
            (col("n_b").cast(DoubleType) * col("n_l"))), 6) * MiQ.toDouble)
          .cast(LongType)).as("term"))
      .groupBy("pos").agg(sum("term").as("mi_q"))
    mi.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("mi_q").desc, col("pos"))).cast(LongType))
      .select(col("pos").cast(LongType).as("pos"), col("mi_q"), col("rank"))
      .orderBy("pos")
  }

  private val qMutualInformationSql =
    s"""WITH xq AS (
       |  SELECT label, i - 1 AS pos,
       |    CAST(floor(CAST(list_extract(embedding, i) AS DOUBLE) * $MiVQ) AS BIGINT) AS v
       |  FROM (SELECT label, embedding,
       |          unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)),
       |b AS (SELECT label, pos,
       |        CASE WHEN v < ${-MiVQ / 4} THEN 0 WHEN v < 0 THEN 1
       |             WHEN v < ${MiVQ / 4} THEN 2 ELSE 3 END AS bin
       |      FROM xq),
       |nbl AS (SELECT pos, bin, label, COUNT(*) AS n_bl FROM b GROUP BY 1, 2, 3),
       |nb AS (SELECT pos, bin, CAST(SUM(n_bl) AS BIGINT) AS n_b
       |       FROM nbl GROUP BY 1, 2),
       |nl AS (SELECT pos, label, CAST(SUM(n_bl) AS BIGINT) AS n_l
       |       FROM nbl GROUP BY 1, 2),
       |nn AS (SELECT pos, CAST(SUM(n_bl) AS BIGINT) AS n FROM nbl GROUP BY 1),
       |mi AS (
       |  SELECT nbl.pos, CAST(SUM(n_bl *
       |    CAST(floor(round(ln(CAST(n_bl AS DOUBLE) * n /
       |      (CAST(n_b AS DOUBLE) * n_l)), 6) * $MiQ.0) AS BIGINT))
       |    AS BIGINT) AS mi_q
       |  FROM nbl JOIN nb USING (pos, bin) JOIN nl USING (pos, label)
       |  JOIN nn USING (pos)
       |  GROUP BY 1)
       |SELECT CAST(pos AS BIGINT) AS pos, mi_q,
       |  row_number() OVER (ORDER BY mi_q DESC, pos) AS rank
       |FROM mi ORDER BY pos""".stripMargin

  // --------------------------------------- q_active_learning_margin

  private val AlClasses = 5
  private val AlK = 10

  /** Margin-based uncertainty sampling (the classic active-learning
    * acquisition rule, Lewis & Gale 1994 lineage): per document, a
    * [[AlClasses]]-way synthetic classifier scores each class (seeded
    * portable hash + a deterministic true-class bonus so the margin
    * distribution is non-trivial), the MARGIN is top1 − top2 of the
    * in-row sorted score array, and the [[AlK]] LOWEST-margin documents
    * per source are selected for labeling. Exactness: every score is
    * (h % 1000)/1000 (+ the exact 0.3 bonus) — identical IEEE doubles
    * on both engines — and the sort is in-row over 5 elements.
    * Scale shape: the selection runs on the native
    * [[graft.plans.GroupedTopK]] bounded heap (order = NEGATED margin,
    * so smallest-margin wins; ties to the earliest doc) — per-source
    * heaps of [[AlK]], zero sorts of the corpus.
    */
  def qActiveLearningMargin(s: SparkSession, dir: String): DataFrame = {
    def score(c: Int): Column =
      (PortableHash.hash64(concat(lit(s"al:"), col("doc_id").cast(StringType),
        lit(s":$c"))) % 1000).cast(DoubleType) / 1000.0 +
        when(col("n_chars") % AlClasses === c, lit(0.3)).otherwise(lit(0.0))
    val scored = Tables(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        sort_array(array((0 until AlClasses).map(score): _*), asc = false).as("sc"))
      .select(col("source"), col("doc_id"),
        (element_at(col("sc"), 1) - element_at(col("sc"), 2)).as("margin"))
    graft.plans.GroupedTopK(
        scored.select(col("source"), col("doc_id"), (-col("margin")).as("negm")),
        s, Seq(col("source")), col("negm"), col("doc_id"), AlK)
      .select(col("source"), col("doc_id"), round(-col("negm"), 6).as("margin"))
      .orderBy(asc("source"), asc("margin"), asc("doc_id"))
  }

  private val qActiveLearningMarginSql = {
    def score(c: Int) =
      s"CAST(${PortableHash.sql(s"'al:' || CAST(doc_id AS STRING) || ':$c'")} % 1000 AS DOUBLE) / 1000.0" +
        s" + CASE WHEN n_chars % $AlClasses = $c THEN 0.3 ELSE 0.0 END"
    val arr = (0 until AlClasses).map(score).mkString("list_value(", ",\n      |      ", ")")
    s"""WITH sc AS (
       |  SELECT source, doc_id,
       |    list_sort($arr, 'DESC') AS l
       |  FROM documents),
       |m AS (
       |  SELECT source, doc_id,
       |    list_extract(l, 1) - list_extract(l, 2) AS margin
       |  FROM sc),
       |r AS (
       |  SELECT source, doc_id, margin,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY margin ASC, doc_id ASC) AS rk
       |  FROM m)
       |SELECT source, doc_id, round(margin, 6) AS margin
       |FROM r WHERE rk <= $AlK
       |ORDER BY source ASC, margin ASC, doc_id ASC""".stripMargin
  }

  // ------------------------------------------------------------ registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_active_learning_margin" -> (qActiveLearningMargin(_, _)),
    "q_ucb_bandit" -> (qUcbBandit(_, _)),
    "q_als_step" -> (qAlsStep(_, _)),
    "q_seasonal_profile" -> (qSeasonalProfile(_, _)),
    "q_mutual_information" -> (qMutualInformation(_, _)))

  def oracles: Map[String, String] = Map(
    "q_active_learning_margin" -> qActiveLearningMarginSql,
    "q_ucb_bandit" -> qUcbBanditSql,
    "q_als_step" -> qAlsStepSql,
    "q_seasonal_profile" -> qSeasonalProfileSql,
    "q_mutual_information" -> qMutualInformationSql)
}
