package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Knowledge-distillation diagnostics — the audits a distillation
  * pipeline runs on a (teacher, student) pair before committing to the
  * student (Hinton, Vinyals & Dean, "Distilling the Knowledge in a
  * Neural Network", 2015; the agreement/efficiency framing of Sanh et
  * al., DistilBERT, 2019): per-domain teacher–student agreement and
  * distribution divergence, the dark-knowledge temperature sweep
  * (how much of the teacher's soft-target structure survives each
  * softening temperature), and hardest-disagreement mining (the
  * examples distillation training should upweight — served by the
  * native [[graft.plans.GroupedTopK]] heap, zero corpus sorts).
  * Documents are the example stream; teacher logits are portable
  * hashes over [[Classes]] classes and the student is a 0.7/0.3
  * teacher/noise mix, so agreement is high but imperfect by
  * construction. Reference scope: none in the reference (an ETL
  * loader).
  *
  * Determinism (NOTES #35): logits are BIGINT; every per-document
  * reduction is an IN-ROW higher-order fold over a literal class
  * sequence (fixed array order — no partition-order sensitivity);
  * transcendentals (ln, exp) are rounded at 1e-9 immediately (the
  * ta_ngram_lm / q_mixture_temperature discipline); per-document
  * doubles are quantized to integer 2⁻²⁰ units BEFORE any cross-row
  * sum (the q_grad_noise_scale pattern), so cross-document aggregates
  * are exact BIGINT arithmetic with one float division at output.
  */
object DistillOps {

  /** Soft-target vocabulary (16 classes keeps the in-row folds cheap
    * while leaving argmax ties possible at %1000 logit granularity).
    */
  private val Classes = 16

  /** Per-document quantities quantized to 2⁻²⁰ for exact folding. */
  private val Q = 1L << 20

  /** Hardest-disagreement examples kept per source. */
  private val MineK = 3

  /** Dark-knowledge softening temperatures. */
  private val Temps = Seq(1, 2, 4, 8)

  /** Teacher logits: BIGINT array over [[Classes]], values 1..1000. */
  private def tArr: Column =
    transform(sequence(lit(0), lit(Classes - 1)),
      c => PortableHash.hash64(concat(lit("tea:"), c, lit(":"),
        col("doc_id"))) % 1000 + 1)

  /** Student logits: 0.7·teacher + 0.3·noise, exact integer mix
    * (floor of the double quotient equals DuckDB's divide() here —
    * numerators < 7000, so the quotient is never within an ulp of an
    * integer it isn't).
    */
  private def sArr: Column =
    transform(sequence(lit(0), lit(Classes - 1)),
      c => floor((PortableHash.hash64(concat(lit("tea:"), c, lit(":"),
        col("doc_id"))) % 1000 + 1) * 7 / 10.0).cast(LongType) +
        floor((PortableHash.hash64(concat(lit("stu:"), c, lit(":"),
          col("doc_id"))) % 1000 + 1) * 3 / 10.0).cast(LongType))

  private def tArrSql = {
    val h = PortableHash.sql("'tea:' || CAST(c AS STRING) || ':' || CAST(doc_id AS STRING)")
    s"list_transform(generate_series(0, ${Classes - 1}), c -> $h % 1000 + 1)"
  }

  private def sArrSql = {
    val ht = PortableHash.sql("'tea:' || CAST(c AS STRING) || ':' || CAST(doc_id AS STRING)")
    val hs = PortableHash.sql("'stu:' || CAST(c AS STRING) || ':' || CAST(doc_id AS STRING)")
    s"""list_transform(generate_series(0, ${Classes - 1}),
       |      c -> divide(($ht % 1000 + 1) * 7, 10) + divide(($hs % 1000 + 1) * 3, 10))""".stripMargin
  }

  // ------------------------------------------------ q_distill_agree

  /** Per-source teacher–student agreement and divergence: top-1
    * agreement rate (first-match argmax on both sides, same tiebreak)
    * and mean KL(teacher ‖ student) over the linearly-normalized
    * logit distributions — each document's KL is one in-row fold over
    * the class axis (ln rounded at 1e-9 per term, fixed fold order),
    * quantized to 2⁻²⁰ integer units, and the per-source mean is an
    * exact BIGINT sum divided once at output. One scan, one
    * map-side-combinable aggregate to |sources| rows.
    */
  def qDistillAgree(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("t", tArr).withColumn("st", sArr)
      .withColumn("ts", aggregate(col("t"), lit(0L), (a, x) => a + x))
      .withColumn("ss", aggregate(col("st"), lit(0L), (a, x) => a + x))
      .withColumn("agree",
        when(array_position(col("t"), array_max(col("t"))) ===
          array_position(col("st"), array_max(col("st"))), 1L).otherwise(0L))
      .withColumn("kl_q", expr(
        s"""CAST(floor(aggregate(sequence(1, $Classes), CAST(0.0 AS DOUBLE),
           |  (acc, i) -> acc + (element_at(t, i) / CAST(ts AS DOUBLE)) *
           |    round(ln((element_at(t, i) / CAST(ts AS DOUBLE)) /
           |      (element_at(st, i) / CAST(ss AS DOUBLE))), 9)) * $Q)
           |AS BIGINT)""".stripMargin))
    base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("agree").as("n_agree"),
        sum("kl_q").as("sum_klq"))
      .select(col("source"), col("n_docs"), col("n_agree"),
        round(col("n_agree").cast(DoubleType) / col("n_docs"), 6)
          .as("agree_rate"),
        round(col("sum_klq").cast(DoubleType) / col("n_docs") / Q, 6)
          .as("mean_kl"))
      .orderBy("source")
  }

  private val qDistillAgreeSql =
    s"""WITH d AS (SELECT doc_id, source, $tArrSql AS t,
       |    $sArrSql AS st
       |  FROM documents),
       |n AS (SELECT doc_id, source, t, st,
       |    CAST(list_aggregate(t, 'sum') AS BIGINT) AS ts,
       |    CAST(list_aggregate(st, 'sum') AS BIGINT) AS ss
       |  FROM d),
       |k AS (SELECT source,
       |    CASE WHEN list_position(t, list_max(t)) =
       |      list_position(st, list_max(st)) THEN 1 ELSE 0 END AS agree,
       |    CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, $Classes),
       |        i -> (list_extract(t, i) / CAST(ts AS DOUBLE)) *
       |          round(ln((list_extract(t, i) / CAST(ts AS DOUBLE)) /
       |            (list_extract(st, i) / CAST(ss AS DOUBLE))), 9))),
       |      (acc, x) -> acc + x) * $Q) AS BIGINT) AS kl_q
       |  FROM n)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(agree) AS BIGINT) AS n_agree,
       |  round(CAST(SUM(agree) AS DOUBLE) / COUNT(*), 6) AS agree_rate,
       |  round(CAST(SUM(kl_q) AS DOUBLE) / COUNT(*) / $Q, 6) AS mean_kl
       |FROM k GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------- q_distill_temp_curve

  /** Dark-knowledge temperature sweep (Hinton 2015 §2): the teacher's
    * softmax at temperature τ — entropy (how much soft-target
    * structure a student sees) and top-1 mass (how peaked the target
    * stays) per τ, averaged over the corpus. exp and ln round at 1e-9
    * per element; per-document entropy and top-1 mass quantize to
    * 2⁻²⁰ units before the cross-document integer sum. Entropy is
    * monotonically non-decreasing in τ and top-1 mass non-increasing
    * (per document, hence in the mean) — the spec pins both. Shape:
    * broadcast 4-row τ grid, all softmax math in-row, one aggregate
    * to 4 rows.
    */
  def qDistillTempCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grid = Temps.toDF("tau")
    Tables(s, dir, "documents")
      .select(col("doc_id"))
      .crossJoin(broadcast(grid))
      .withColumn("t", tArr)
      .withColumn("w", expr(
        "transform(t, x -> round(exp(x / (100.0 * tau)), 9))"))
      .withColumn("z", expr(
        "aggregate(w, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"))
      .withColumn("h_q", expr(
        s"""CAST(floor(aggregate(w, CAST(0.0 AS DOUBLE),
           |  (acc, x) -> acc - (x / z) * round(ln(x / z), 9)) * $Q)
           |AS BIGINT)""".stripMargin))
      .withColumn("m_q", expr(
        s"CAST(floor(array_max(w) / z * $Q) AS BIGINT)"))
      .groupBy("tau")
      .agg(count(lit(1)).as("n_docs"), sum("h_q").as("sh"), sum("m_q").as("sm"))
      .select(col("tau"), col("n_docs"),
        round(col("sh").cast(DoubleType) / col("n_docs") / Q, 6)
          .as("mean_entropy"),
        round(col("sm").cast(DoubleType) / col("n_docs") / Q, 6)
          .as("mean_top1_mass"))
      .orderBy("tau")
  }

  private val qDistillTempCurveSql = {
    val taus = Temps.map(t => s"($t)").mkString(", ")
    s"""WITH d AS (SELECT doc_id, tau, $tArrSql AS t
       |  FROM documents CROSS JOIN (VALUES $taus) tg(tau)),
       |w AS (SELECT doc_id, tau,
       |    list_transform(t, x -> round(exp(x / (100.0 * tau)), 9)) AS w
       |  FROM d),
       |z AS (SELECT tau,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), w),
       |      (acc, x) -> acc + x) AS z, w
       |  FROM w),
       |q AS (SELECT tau,
       |    CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(w, x -> -(x / z) * round(ln(x / z), 9))),
       |      (acc, x) -> acc + x) * $Q) AS BIGINT) AS h_q,
       |    CAST(floor(list_max(w) / z * $Q) AS BIGINT) AS m_q
       |  FROM z)
       |SELECT tau, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  round(CAST(SUM(h_q) AS DOUBLE) / COUNT(*) / $Q, 6) AS mean_entropy,
       |  round(CAST(SUM(m_q) AS DOUBLE) / COUNT(*) / $Q, 6) AS mean_top1_mass
       |FROM q GROUP BY tau ORDER BY tau""".stripMargin
  }

  // ------------------------------------------------ q_distill_mine

  /** Hardest-disagreement mining: the [[MineK]] documents per source
    * with the largest L1 distance between the normalized teacher and
    * student distributions — the examples a distillation run should
    * upweight (or a data pipeline should route for relabeling).
    * The distance is one in-row fold (exact IEEE divisions, fixed
    * order); the selection runs on the native
    * [[graft.plans.GroupedTopK]] bounded heap (largest gap first,
    * ties to the smallest doc id) — per-source heaps of [[MineK]],
    * zero corpus sorts.
    */
  def qDistillMine(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("t", tArr).withColumn("st", sArr)
      .withColumn("ts", aggregate(col("t"), lit(0L), (a, x) => a + x))
      .withColumn("ss", aggregate(col("st"), lit(0L), (a, x) => a + x))
      .withColumn("l1", expr(
        s"""aggregate(sequence(1, $Classes), CAST(0.0 AS DOUBLE),
           |  (acc, i) -> acc + abs(element_at(t, i) / CAST(ts AS DOUBLE) -
           |    element_at(st, i) / CAST(ss AS DOUBLE)))""".stripMargin))
      .select(col("source"), col("doc_id"), col("l1"))
    graft.plans.GroupedTopK(scored, s, Seq(col("source")), col("l1"),
        col("doc_id"), MineK)
      .select(col("source"), col("doc_id"), round(col("l1"), 6).as("l1_gap"))
      .orderBy(asc("source"), desc("l1_gap"), asc("doc_id"))
  }

  private val qDistillMineSql =
    s"""WITH d AS (SELECT doc_id, source, $tArrSql AS t,
       |    $sArrSql AS st
       |  FROM documents),
       |n AS (SELECT doc_id, source, t, st,
       |    CAST(list_aggregate(t, 'sum') AS BIGINT) AS ts,
       |    CAST(list_aggregate(st, 'sum') AS BIGINT) AS ss
       |  FROM d),
       |l AS (SELECT source, doc_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(generate_series(1, $Classes),
       |        i -> abs(list_extract(t, i) / CAST(ts AS DOUBLE) -
       |          list_extract(st, i) / CAST(ss AS DOUBLE)))),
       |      (acc, x) -> acc + x) AS l1
       |  FROM n),
       |r AS (SELECT source, doc_id, l1,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY l1 DESC, doc_id ASC) AS rk
       |  FROM l)
       |SELECT source, doc_id, round(l1, 6) AS l1_gap
       |FROM r WHERE rk <= $MineK
       |ORDER BY source ASC, l1_gap DESC, doc_id ASC""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_distill_agree" -> (qDistillAgree(_, _)),
    "q_distill_temp_curve" -> (qDistillTempCurve(_, _)),
    "q_distill_mine" -> (qDistillMine(_, _)))

  def oracles: Map[String, String] = Map(
    "q_distill_agree" -> qDistillAgreeSql,
    "q_distill_temp_curve" -> qDistillTempCurveSql,
    "q_distill_mine" -> qDistillMineSql)
}
