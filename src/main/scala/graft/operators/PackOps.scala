package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Batch-construction wave: the operators that turn a curated corpus
  * into trainer-shaped input — sequence packing into fixed context
  * windows, stratified k-fold assignment with a balance audit,
  * exponential-tilting domain reweighting (one exponentiated-gradient
  * step of the DoReMi scheme), and cross-group quantile normalization.
  * Reference scope: none in the reference (an ETL loader); these
  * extend the training surface beside [[TrainingOps]]/[[PrefOps]].
  */
object PackOps {

  // ----------------------------------------------------- q_seq_pack

  private val CtxLen = 512

  /** Sequence-packing audit under the concat-and-chunk policy (the
    * GPT-style pretraining layout: documents are concatenated in
    * arrival order per source shard and sliced into fixed
    * [[CtxLen]]-token windows, so a document may straddle a window
    * boundary). Reports windows needed, how many documents get split,
    * and the fill ratio of the final layout. Pure integer arithmetic
    * over ONE per-source running sum — the exclusive cumulative sum is
    * the document's start offset, and a doc splits iff its start and
    * (inclusive) end land in different `div CtxLen` windows. The
    * alternative pad-at-boundary policy needs a running reset (greedy
    * bin state), which is inherently sequential — [[qPadWaste]]'s
    * fixed-count batching covers that trade instead.
    */
  def qSeqPack(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        ((col("n_chars") + 3) / 4).cast(LongType).as("tokens"))
      .withColumn("start_off", coalesce(sum("tokens").over(w), lit(0L)))
      .withColumn("splits",
        when(expr(s"start_off div $CtxLen") <
          expr(s"(start_off + tokens - 1) div $CtxLen"), 1L).otherwise(0L))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("total_tokens"),
        sum("splits").as("split_docs"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        expr(s"(total_tokens + ${CtxLen - 1}) div $CtxLen").as("n_windows"),
        col("split_docs"),
        round(col("split_docs").cast(DoubleType) / col("n_docs"), 6).as("split_rate"),
        round(col("total_tokens").cast(DoubleType) /
          (expr(s"(total_tokens + ${CtxLen - 1}) div $CtxLen") * CtxLen), 6).as("fill"))
      .orderBy("source")
  }

  private val qSeqPackSql =
    s"""WITH d AS (
       |  SELECT source, doc_id, divide(n_chars + 3, 4) AS tokens
       |  FROM documents),
       |off AS (
       |  SELECT source, tokens,
       |    COALESCE(SUM(tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
       |  FROM d),
       |g AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(tokens) AS BIGINT) AS total_tokens,
       |    CAST(SUM(CASE WHEN divide(start_off, $CtxLen)
       |        < divide(start_off + tokens - 1, $CtxLen)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS split_docs
       |  FROM off GROUP BY source)
       |SELECT source, n_docs, total_tokens,
       |  CAST(divide(total_tokens + ${CtxLen - 1}, $CtxLen) AS BIGINT) AS n_windows,
       |  split_docs,
       |  round(CAST(split_docs AS DOUBLE) / n_docs, 6) AS split_rate,
       |  round(CAST(total_tokens AS DOUBLE)
       |    / (divide(total_tokens + ${CtxLen - 1}, $CtxLen) * $CtxLen), 6) AS fill
       |FROM g ORDER BY source""".stripMargin

  // ----------------------------------------- q_stratified_kfold

  private val Folds = 5

  /** Stratified k-fold assignment plus the balance audit a trainer
    * runs before trusting it: each document lands in a deterministic
    * hash fold WITHIN its source stratum, and every (stratum, fold)
    * row reports its document/token mass and the relative deviation
    * from the stratum's per-fold mean. One scan, one keyed aggregate,
    * one stratum-level window — no shuffles beyond the group keys.
    */
  def qStratifiedKfold(s: SparkSession, dir: String): DataFrame = {
    val byStratum = Window.partitionBy("source")
    Tables(s, dir, "documents")
      .select(col("source"),
        (PortableHash.hash64(col("doc_id").cast(StringType), 17) % Folds).as("fold"),
        ((col("n_chars") + 3) / 4).cast(LongType).as("tokens"))
      .groupBy("source", "fold")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("fold_tokens"))
      .withColumn("rel_dev",
        round(abs(col("n_docs") - avg("n_docs").over(byStratum)) /
          avg("n_docs").over(byStratum), 6))
      .orderBy("source", "fold")
  }

  private val qStratifiedKfoldSql = {
    val fold = s"${PortableHash.sql("CAST(doc_id AS STRING)", 17)} % $Folds"
    s"""WITH a AS (
       |  SELECT source, $fold AS fold, divide(n_chars + 3, 4) AS tokens
       |  FROM documents),
       |g AS (
       |  SELECT source, fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(tokens) AS BIGINT) AS fold_tokens
       |  FROM a GROUP BY source, fold)
       |SELECT source, fold, n_docs, fold_tokens,
       |  round(abs(n_docs - AVG(n_docs) OVER (PARTITION BY source))
       |    / AVG(n_docs) OVER (PARTITION BY source), 6) AS rel_dev
       |FROM g ORDER BY source, fold""".stripMargin
  }

  // --------------------------------------------- q_domain_reweight

  /** Exponential-tilting domain reweighting — one exponentiated-
    * gradient step of the DoReMi mixture scheme (Xie et al., "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    * 2023): start from the token-share baseline p₀, tilt each domain
    * by exp(excess signal) where the signal is the domain's
    * corpus-level lexical diversity (distinct-token mass over token
    * mass — a ratio of two EXACT integer sums, so no float summation
    * order crosses the engines), and renormalize. The whole update
    * runs on a domain-sized (≤ tens of rows) aggregate — every join
    * below is broadcast-scale at 100 TB.
    */
  def qDomainReweight(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val d = Tables(s, dir, "documents")
      .select(col("source"), size(toks).cast(LongType).as("n_tok"),
        size(array_distinct(toks)).cast(LongType).as("n_distinct"))
      .groupBy("source")
      .agg(sum("n_tok").as("tok"), sum("n_distinct").as("dst"))
    val tot = d.agg(sum("tok").as("all_tok"))
    val base = d.crossJoin(broadcast(tot))
      .select(col("source"),
        (col("tok").cast(DoubleType) / col("all_tok")).as("p0"),
        (col("dst").cast(DoubleType) / col("tok")).as("loss"))
    // the two global double reductions over the domain frame fold the
    // VALUE-sorted term list SEQUENTIALLY — the order is the summands
    // themselves, so partition order can't perturb the sum on either
    // engine, and the oracle spells the identical fold in shared
    // dialect (list_aggregate(list_sort(array_agg(term)), 'sum')),
    // keeping the statement parity-pinned on spark.sql
    def foldSum(df: DataFrame, term: org.apache.spark.sql.Column, as: String) =
      df.agg(sort_array(collect_list(term)).as("l"))
        .select(expr("aggregate(l, CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
          .as(as))
    val mu = foldSum(base, col("p0") * col("loss"), "mu")
    val tilted = base.crossJoin(broadcast(mu))
      .select(col("source"), col("p0"), col("loss"),
        (col("p0") * exp(col("loss") - col("mu"))).as("t"))
    val z = foldSum(tilted, col("t"), "z")
    tilted.crossJoin(broadcast(z))
      .select(col("source"), round(col("p0"), 6).as("p0"),
        round(col("loss"), 6).as("diversity"),
        round(col("t") / col("z"), 6).as("weight"))
      .orderBy("source")
  }

  private val qDomainReweightSql =
    """WITH d AS (
      |  SELECT source,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tok,
      |    CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS BIGINT) AS dst
      |  FROM documents GROUP BY source),
      |base AS (
      |  SELECT source,
      |    CAST(tok AS DOUBLE) / (SELECT SUM(tok) FROM d) AS p0,
      |    CAST(dst AS DOUBLE) / tok AS loss
      |  FROM d),
      |mu AS (SELECT list_aggregate(list_sort(array_agg(p0 * loss)), 'sum')
      |         AS mu FROM base),
      |t AS (SELECT source, p0, loss, p0 * exp(loss - mu.mu) AS t
      |      FROM base, mu)
      |SELECT source, round(p0, 6) AS p0, round(loss, 6) AS diversity,
      |  round(t / (SELECT list_aggregate(list_sort(array_agg(t)), 'sum')
      |             FROM t), 6) AS weight
      |FROM t ORDER BY source""".stripMargin

  // ---------------------------------------------- q_quantile_norm

  /** Cross-group quantile normalization (decile granularity): rank
    * each event type's values into deciles, replace every decile's
    * level with the decile's cross-type reference mean — the transform
    * that puts heterogeneous per-type score scales onto one common
    * distribution before mixing. All means are ratios of exact
    * DECIMAL sums over counts, so no float summation order crosses
    * the engines; the per-type window is the natural shard key.
    */
  def qQuantileNorm(s: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy("event_type").orderBy("v", "event_id")
    val deciled = Tables(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        col("value").cast(DecimalType(12, 2)).as("v"))
      .withColumn("decile", ntile(10).over(byType))
    val local = deciled.groupBy("event_type", "decile")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .select(col("event_type"), col("decile"), col("n"),
        (col("sv").cast(DoubleType) / col("n")).as("raw_mean"))
    val ref = deciled.groupBy("decile")
      .agg((sum("v").cast(DoubleType) / count(lit(1))).as("ref_mean"))
    local.join(ref, "decile")
      .select(col("event_type"), col("decile").cast(LongType).as("decile"),
        col("n"), round(col("raw_mean"), 6).as("raw_mean"),
        round(col("ref_mean"), 6).as("norm_value"))
      .orderBy("event_type", "decile")
  }

  private val qQuantileNormSql =
    """WITH d AS (
      |  SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
      |    ntile(10) OVER (PARTITION BY event_type
      |      ORDER BY CAST(value AS DECIMAL(12,2)), event_id) AS decile
      |  FROM events),
      |loc AS (
      |  SELECT event_type, decile, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(v) AS DOUBLE) / COUNT(*) AS raw_mean
      |  FROM d GROUP BY 1, 2),
      |ref AS (
      |  SELECT decile, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS ref_mean
      |  FROM d GROUP BY 1)
      |SELECT l.event_type, CAST(l.decile AS BIGINT) AS decile, l.n,
      |  round(l.raw_mean, 6) AS raw_mean, round(r.ref_mean, 6) AS norm_value
      |FROM loc l JOIN ref r ON r.decile = l.decile
      |ORDER BY event_type, decile""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seq_pack" -> (qSeqPack(_, _)),
    "q_stratified_kfold" -> (qStratifiedKfold(_, _)),
    "q_domain_reweight" -> (qDomainReweight(_, _)),
    "q_quantile_norm" -> (qQuantileNorm(_, _)))

  def oracles: Map[String, String] = Map(
    "q_seq_pack" -> qSeqPackSql,
    "q_stratified_kfold" -> qStratifiedKfoldSql,
    "q_domain_reweight" -> qDomainReweightSql,
    "q_quantile_norm" -> qQuantileNormSql)
}
