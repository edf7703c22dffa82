package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming perplexity ROUTER — the live twin of
  * `ta_perplexity_bucket`: newly crawled documents are scored in-row
  * against a compact broadcast bigram LM and routed to their CCNet
  * quality stratum (head/middle/tail) as they arrive.
  *
  * The batch query scores each bigram by joining the corpus-sized
  * model relation — a stream cannot do that statelessly (the per-doc
  * sum after a stream-static join is an aggregation needing state).
  * The production shape for a streaming quality gate is the one here:
  * the model is COMPACTED to its top-K bigram/unigram entries (plus
  * an add-one-smoothing default for everything out of vocabulary),
  * shipped as ONE broadcast map row, and each document scores itself
  * with an in-row fold over its own bigram array — no join, no state,
  * append-mode safe. Bucket thresholds are two longs of driver-side
  * model state, extracted from the static corpus's score distribution
  * under the SAME compacted model (so rank-bucketing at rest and
  * threshold-bucketing in flight agree exactly — ties share a bucket
  * in both). At 100 TB the model build is the nightly batch job; the
  * stream pays O(batch tokens) per micro-batch with no shuffle.
  */
object QualityStream {

  private val TopK = 4096          // bigram/unigram entries kept in the map
  private val PplQ = 1073741824L   // 2^30 — ta_perplexity_bucket's quantizer

  private def toks: Column = split(col("text"), " ")

  private def bigramArr: Column = {
    val n = size(toks)
    when(n < 2, array().cast(ArrayType(StructType(Seq(
        StructField("w1", StringType), StructField("w2", StringType))))))
      .otherwise(transform(sequence(lit(1), n - 1), i => struct(
        element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2"))))
  }

  /** One-row broadcastable model: top-[[TopK]] bigram logp map, top-K
    * unigram OOV-continuation map, and the unknown-word default — all
    * quantized exactly like the batch query (round to 1e-6, floor at
    * 2^30). Ties at the top-K cut break on the token text so the model
    * is deterministic.
    */
  def perplexityModel(corpus: DataFrame): DataFrame = {
    val bg = corpus.select(explode(bigramArr).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val unic = corpus.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val vocab = unic.agg(count(lit(1)).as("v"))
    val bgc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    def q(logp: Column): Column =
      floor(round(logp, 6) * PplQ.toDouble).cast(LongType)
    val topBg = bgc.join(unic, col("w1") === col("w")).crossJoin(broadcast(vocab))
      .select(concat(col("w1"), lit(" "), col("w2")).as("k"),
        q(log((col("cb") + 1.0) / (col("cw") + col("v")))).as("lq"),
        col("cb"), col("w1"), col("w2"))
      .orderBy(desc("cb"), asc("w1"), asc("w2")).limit(TopK)
    val topUni = unic.crossJoin(broadcast(vocab))
      .select(col("w").as("k"),
        q(log(lit(1.0) / (col("cw") + col("v")))).as("lq"), col("cw"))
      .orderBy(desc("cw"), asc("k")).limit(TopK)
    topBg.agg(map_from_entries(collect_list(struct(col("k"), col("lq"))))
        .as("bg_map"))
      .crossJoin(topUni.agg(
        map_from_entries(collect_list(struct(col("k"), col("lq"))))
          .as("uni_map")))
      .crossJoin(vocab.select(q(log(lit(1.0) / col("v"))).as("default_q")))
  }

  /** Per-document score under the broadcast model: a stateless in-row
    * fold (bigram hit → its logp; miss with known first word → that
    * word's OOV continuation; unknown word → global default). Shared
    * by the stream and the threshold extraction so they cannot drift.
    */
  def scored(docs: DataFrame, model: DataFrame): DataFrame = {
    val qArr = transform(bigramArr, b => coalesce(
      element_at(col("bg_map"), concat(b.getField("w1"), lit(" "), b.getField("w2"))),
      element_at(col("uni_map"), b.getField("w1")),
      col("default_q")))
    docs.crossJoin(broadcast(model))
      .withColumn("sumq",
        aggregate(qArr, lit(0L), (acc, y) => acc + y))
      .withColumn("nb", (size(toks) - 1).cast(LongType))
      .where(col("nb") >= 1)
      .selectExpr("doc_id", "(sumq - ((sumq % nb + nb) % nb)) DIV nb AS avg_q")
  }

  /** Head/middle minimum-score thresholds from the static corpus's
    * rank-bucketing under the same model — two longs of driver model
    * state (the value-level histogram window is the batch query's
    * 100 TB-safe shape).
    */
  def thresholds(corpus: DataFrame, model: DataFrame): (Long, Long) = {
    val av = scored(corpus, model)
    val hist = av.groupBy("avg_q").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum("c").over(Window.orderBy(col("avg_q").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val row = cum.crossJoin(broadcast(av.agg(count(lit(1)).as("nd"))))
      .selectExpr(
        "min(CASE WHEN cum <= (nd + 2) DIV 3 THEN avg_q END) AS t1",
        "min(CASE WHEN cum <= (2 * nd + 2) DIV 3 THEN avg_q END) AS t2")
      .head()
    // Tie mass at the top score can leave a rank cut empty (no score's
    // cum fits under it) → NULL threshold. Degrade like the batch
    // bucketing does: an unreachable threshold (Long.MaxValue) routes
    // those docs to the next stratum instead of crashing the router.
    def at(i: Int) = if (row.isNullAt(i)) Long.MaxValue else row.getLong(i)
    (at(0), at(1))
  }

  /** The router: score each arriving document in-row and assign its
    * stratum by threshold comparison. Output: (doc_id, avg_q, bucket).
    */
  def route(stream: DataFrame, staticCorpus: DataFrame): DataFrame = {
    val model = perplexityModel(staticCorpus).cache()
    val (t1, t2) = thresholds(staticCorpus, model)
    scored(stream, model)
      .withColumn("bucket",
        when(col("avg_q") >= t1, "head")
          .when(col("avg_q") >= t2, "middle")
          .otherwise("tail"))
  }
}
