package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Composed training-data pipeline operators — the end-to-end shapes a
  * pretraining data team actually runs, built from the round-1
  * primitives:
  *
  *  - `ta_pipeline`: quality-filter → exact-dedup → language-route →
  *    per-language corpus stats, as ONE composed query (each stage's
  *    semantics already oracle-verified in isolation; this verifies the
  *    composition).
  *  - `q_stratified_sample`: per-stratum deterministic downsampling
  *    (cap the dominant language, keep the tail) — hash-membership so
  *    re-runs and different partitionings pick identical rows.
  *  - `dd_cosine_lsh`: random-hyperplane LSH over embeddings — the
  *    scale path for embedding near-dup: candidates meet only inside a
  *    sign-bucket (256 buckets → ~1/256 of the n² pairs), then exact
  *    cosine verifies. Hyperplanes are deterministic integer lattices so
  *    the DuckDB oracle reproduces the buckets bit-for-bit.
  *  - `mm_frame_sample`: video-style frame sampling over a binary-ish
  *    payload: metadata-driven stride enumeration (sequence+explode) +
  *    per-frame feature stub — the multimodal fan-out shape
  *    (one row → n_frames rows) with bounded blowup.
  */
object Pipelines {

  private val toks = split(col("text"), " ")
  private val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is")
  private val stopListSql = Stopwords.map(w => s"'$w'").mkString("list_value(", ", ", ")")

  /** The ta_quality composite score (same formula as TextAnalysis). */
  private[operators] def qualityScore: Column = {
    val nToks = size(toks)
    val stopRatio = size(filter(toks, t => t.isin(Stopwords.map(x => x: Any): _*)))
      .cast(DoubleType) / nToks
    val ttr = size(array_distinct(toks)).cast(DoubleType) / nToks
    (stopRatio * lit(0.4)) + (ttr * lit(0.4)) +
      (least(nToks.cast(DoubleType) / lit(100.0), lit(1.0)) * lit(0.2))
  }

  private[operators] val qualityScoreSql =
    s"""((CAST(len(list_filter(toks, t -> list_contains($stopListSql, t))) AS DOUBLE) / len(toks)) * 0.4
       | + (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.4
       | + least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.2)""".stripMargin.replace("\n", "")

  /** Composed doc-prep pipeline. Stage order matters for cost at scale:
    * the cheap quality filter runs first (narrow projection, no
    * shuffle), dedup shuffles only survivors, and the final per-lang
    * agg is a 5-group reduce. The mean-quality aggregate uses the
    * power-of-two quantization recipe (floor(q·2^32) summed as BIGINT)
    * so the cross-engine sum is exact despite double inputs.
    */
  def taPipeline(s: SparkSession, dir: String): DataFrame = {
    val survivors = Tables(s, dir, "documents")
      .withColumn("q", qualityScore)
      .filter(col("q") >= 0.33)
      .withColumn("_h", md5(col("text")))
    // keep-first dedup as bounded-heap top-1 per content hash (order by
    // -doc_id keeps the SMALLEST id) — no per-hash sort; a boilerplate
    // hash with millions of copies costs O(n) scan, not O(n log n)
    graft.plans.GroupedTopK(survivors, s,
        Seq(col("_h")), -col("doc_id"), col("doc_id"), 1)
      .drop("_h")
      .withColumn("pred_is_en",
        size(filter(toks, t => t.isin("the", "a", "is"))) >= 2)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks).cast(LongType)).as("total_tokens"),
        sum(floor(col("q") * lit(4294967296.0)).cast(LongType)).as("sum_q32"),
        sum(when(col("pred_is_en"), 1L).otherwise(0L)).as("n_pred_en"))
      .orderBy("lang")
  }

  private val taPipelineSql =
    s"""WITH d AS (SELECT doc_id, text, lang, string_split(text, ' ') AS toks FROM documents),
       |scored AS (SELECT doc_id, text, lang, toks, $qualityScoreSql AS q FROM d
       |           WHERE $qualityScoreSql >= 0.33),
       |deduped AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
       |            FROM scored) WHERE rk = 1)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
       |  CAST(SUM(CAST(floor(q * 4294967296.0) AS BIGINT)) AS BIGINT) AS sum_q32,
       |  CAST(SUM(CASE WHEN len(list_filter(toks, t -> list_contains(list_value('the','a','is'), t))) >= 2
       |       THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_en
       |FROM deduped GROUP BY lang ORDER BY lang""".stripMargin

  /** Stratified deterministic sampling: keep 5% of the dominant 'en'
    * stratum, 20% of everything else. Membership is a seeded key hash —
    * no RNG state, so the sample is identical across re-runs, retries,
    * executors, and partitionings (what `df.sample` cannot promise).
    */
  def qStratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val bucket = PortableHash.hash64(col("doc_id").cast(StringType), 7) % 100
    val rate = when(col("lang") === "en", 5).otherwise(20)
    Tables(s, dir, "documents")
      .where(bucket < rate)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  private val qStratifiedSampleSql = {
    val bucket = s"${PortableHash.sql("CAST(doc_id AS STRING)", 7)} % 100"
    s"""SELECT doc_id, lang, n_chars FROM documents
       |WHERE $bucket < (CASE WHEN lang = 'en' THEN 5 ELSE 20 END)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Random-hyperplane LSH for embedding near-dup
  // ---------------------------------------------------------------------

  private val NPlanes = 8
  private val Dim = 64
  private val CloseCos = 0.25

  /** Deterministic integer hyperplanes (Knuth multiplicative lattice,
    * components in [-500, 500]) — identical literals feed the Spark
    * expression and the generated oracle SQL.
    */
  private val Planes: Seq[Array[Double]] = (0 until NPlanes).map { p =>
    Array.tabulate(Dim)(j => (((2654435761L * (p * Dim + j + 1)) % 1001L) - 500L).toDouble)
  }

  /** Sequential-fold dot of the embedding with a literal plane —
    * the same left-to-right double accumulation DuckDB's
    * list_aggregate('sum') performs, so the sign bits agree exactly.
    */
  private def planeDot(w: Array[Double]): Column =
    aggregate(
      zip_with(col("embedding"), typedLit(w.toSeq), (x, wv) => x.cast(DoubleType) * wv),
      lit(0.0), (acc, x) => acc + x)

  private def planeDotSql(tbl: String, w: Array[Double]): String = {
    val lst = w.map(_.toLong).mkString("list_value(", ", ", ")")
    s"list_aggregate(list_transform(generate_series(1, len($tbl.embedding)), i -> CAST(list_extract($tbl.embedding, i) AS DOUBLE) * CAST(list_extract($lst, i) AS DOUBLE)), 'sum')"
  }

  /** Cosine-LSH near-dup: bucket by 8 hyperplane sign bits, verify
    * exact cosine only within buckets. At 100 TB the bucket column is
    * the shuffle key — candidate generation is a self-join on an
    * 8-bit-keyed repartition, ~1/2^8 of the all-pairs work; more planes
    * tighten it geometrically. Reports per-bucket candidate statistics.
    */
  def ddCosineLsh(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(s)
    val bucket = Planes.zipWithIndex
      .map { case (w, p) => when(planeDot(w) >= 0, lit(1L << p)).otherwise(lit(0L)) }
      .reduce(_ + _)
    val n = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        sqrt(expr("graft_norm_sq_f(embedding)")).as("nrm"),
        bucket.as("bucket"))
    val cos = (expr("graft_dot_f(a.embedding, b.embedding)") /
      (col("a.nrm") * col("b.nrm"))).as("cosine")
    n.as("a").join(n.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.bucket").as("bucket"), cos)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("cosine") >= CloseCos, 1L).otherwise(0L)).as("n_close"),
        round(max(col("cosine")), 6).as("max_cos"))
      .orderBy("bucket")
  }

  private val ddCosineLshSql = {
    def bucketSql(tbl: String) = Planes.zipWithIndex
      .map { case (w, p) => s"(CASE WHEN ${planeDotSql(tbl, w)} >= 0 THEN ${1L << p} ELSE 0 END)" }
      .mkString(" + ")
    val dot = "list_aggregate(list_transform(generate_series(1, len(a.embedding)), i -> CAST(list_extract(a.embedding, i) AS DOUBLE) * CAST(list_extract(b.embedding, i) AS DOUBLE)), 'sum')"
    val nrm = "sqrt(list_aggregate(list_transform(%s.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    s"""WITH n AS (SELECT vec_id, embedding, ${nrm.format("embeddings")} AS nrm,
       |  CAST(${bucketSql("embeddings")} AS BIGINT) AS bucket FROM embeddings),
       |pairs AS (SELECT a.bucket, $dot / (a.nrm * b.nrm) AS cosine
       |  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT bucket, COUNT(*) AS n_pairs,
       |  CAST(SUM(CASE WHEN cosine >= $CloseCos THEN 1 ELSE 0 END) AS BIGINT) AS n_close,
       |  round(max(cosine), 6) AS max_cos
       |FROM pairs GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Multimodal frame sampling
  // ---------------------------------------------------------------------

  /** Frame sampling over a video-style payload: each document plays a
    * media blob whose frame count comes from metadata
    * (n_frames = min(n_chars, 240)); every 10th frame is sampled and a
    * per-frame feature extracted (stubbed as the byte at the frame
    * offset — a real decoder plugs into the same row→frames fan-out).
    * sequence()+explode keeps the blowup bounded and fully pipelined —
    * no shuffle until the final presentation sort.
    */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    val nFrames = least(col("n_chars"), lit(240L))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), nFrames - 1, lit(10L))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        ascii(col("text").substr(col("frame_idx").cast(IntegerType) + 1, lit(1)))
          .cast(LongType).as("frame_feature"))
      .orderBy("doc_id", "frame_idx")
  }

  private val mmFrameSampleSql =
    """SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  CAST(ord(substr(text, CAST(frame_idx AS INT) + 1, 1)) AS BIGINT) AS frame_feature
      |FROM documents CROSS JOIN range(0, 240, 10) AS r(frame_idx)
      |WHERE frame_idx < least(n_chars, 240)
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------------
  // Training-sequence packing and context chunking
  // ---------------------------------------------------------------------

  private val PackShards = 8
  private val CtxTokens = 1024L

  /** Greedy sequence packing: assign documents to fixed-token training
    * contexts. Docs are sharded by a portable key hash, then packed
    * within each shard by running token count — bin = prefix/1024.
    * The shard step IS the scale story: packing is inherently
    * sequential (a running sum), so at 100 TB you partition first and
    * pack each shard independently — one window per shard, never one
    * global ordering. Deterministic: shard and order derive only from
    * doc_id.
    */
  def qDocPacking(s: SparkSession, dir: String): DataFrame = {
    val shard = PortableHash.hash64(col("doc_id").cast(StringType), 11) % PackShards
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "documents")
      .select(col("doc_id"), shard.as("shard"),
        size(toks).cast(LongType).as("n_tokens"))
      .withColumn("prefix", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", floor(col("prefix") / CtxTokens).cast(LongType))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("shard", "bin")
  }

  private val qDocPackingSql = {
    val shard = s"${PortableHash.sql("CAST(doc_id AS STRING)", 11)} % $PackShards"
    s"""WITH d AS (SELECT doc_id, $shard AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
       |p AS (SELECT doc_id, shard, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS prefix
       |  FROM d)
       |SELECT shard, CAST(floor(prefix / $CtxTokens) AS BIGINT) AS bin,
       |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM p GROUP BY shard, bin ORDER BY shard, bin""".stripMargin
  }

  /** RAG-style context chunking: split each document into fixed-width
    * character chunks with overlap (width 200, stride 150). One row
    * fans out to ⌈len/stride⌉ rows via sequence+explode — fully
    * pipelined, no shuffle before the presentation sort, and chunk
    * boundaries depend only on the document itself (stable ids for
    * incremental re-embedding).
    */
  def qContextChunks(s: SparkSession, dir: String): DataFrame = {
    val starts = sequence(lit(0L), greatest(col("n_chars") - 1, lit(0L)), lit(150L))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"),
        explode(starts).as("chunk_start"))
      .select(col("doc_id"), col("chunk_start"),
        col("text").substr(col("chunk_start").cast(IntegerType) + 1, lit(200)).as("chunk"),
        length(col("text").substr(col("chunk_start").cast(IntegerType) + 1, lit(200)))
          .cast(LongType).as("chunk_len"))
      .orderBy("doc_id", "chunk_start")
  }

  private val qContextChunksSql =
    """SELECT doc_id, CAST(chunk_start AS BIGINT) AS chunk_start,
      |  substr(text, CAST(chunk_start AS INT) + 1, 200) AS chunk,
      |  CAST(length(substr(text, CAST(chunk_start AS INT) + 1, 200)) AS BIGINT) AS chunk_len
      |FROM documents CROSS JOIN range(0, 4000, 150) AS r(chunk_start)
      |WHERE chunk_start < n_chars
      |ORDER BY doc_id, chunk_start""".stripMargin

  // ---------------------------------------------------- q_curation_funnel

  /** The curation funnel report — the observability table a data team
    * reads after every pipeline run: docs and tokens surviving each
    * cumulative stage (raw → quality ≥ 0.33 → exact keep-first dedup →
    * near-dup component collapse) with retention against raw. Stage
    * semantics reuse the exact building blocks already oracle-verified
    * in isolation (ta_pipeline's filter + keep-first, dd_components'
    * labels — a doc survives stage 3 iff it IS its component's min
    * representative, components being corpus-global). Cost: one corpus
    * scan per stage aggregate plus the memoized component labels;
    * every statistic is an integer count/sum, retention one division.
    */
  def qCurationFunnel(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        size(toks).cast(LongType).as("ntok"), qualityScore.as("q"),
        md5(col("text")).as("h"))
    val s1 = base.where(col("q") >= 0.33)
    val keepers = s1.groupBy("h").agg(min("doc_id").as("doc_id"))
    val s2 = s1.join(keepers, Seq("h", "doc_id"), "left_semi")
    val nonReps = GraphOps.ddComponents(s, dir)
      .where(col("component") =!= col("doc_id")).select("doc_id")
    val s3 = s2.join(nonReps, Seq("doc_id"), "left_anti")
    def stage(df: DataFrame, id: Int, name: String) =
      df.agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
        .select(lit(id.toLong).as("stage_id"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    val raw = base.agg(count(lit(1)).as("raw_docs"))
    stage(base, 0, "raw")
      .union(stage(s1, 1, "quality"))
      .union(stage(s2, 2, "exact_dedup"))
      .union(stage(s3, 3, "neardup_dedup"))
      .crossJoin(broadcast(raw))
      .select(col("stage_id"), col("stage"), col("n_docs"), col("n_tokens"),
        // greatest(.,1): an empty corpus reports 0/1 retention, not 0/0
        round(col("n_docs").cast(DoubleType) /
          greatest(col("raw_docs"), lit(1L)).cast(DoubleType), 6).as("retention"))
      .orderBy("stage_id")
  }

  private val qCurationFunnelSql =
    s"""WITH ${GraphOps.componentsSqlChain},
       |d AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
       |base AS (SELECT doc_id, md5(text) AS h,
       |           CAST(len(toks) AS BIGINT) AS ntok, $qualityScoreSql AS q FROM d),
       |s1 AS (SELECT * FROM base WHERE q >= 0.33),
       |s2 AS (SELECT s1.* FROM s1
       |       JOIN (SELECT h, min(doc_id) AS doc_id FROM s1 GROUP BY h) k
       |       USING (h, doc_id)),
       |s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN
       |       (SELECT doc_id FROM comp WHERE component <> doc_id)),
       |raw AS (SELECT COUNT(*) AS raw_docs FROM base),
       |st AS (
       |  SELECT 0 AS stage_id, 'raw' AS stage, COUNT(*) AS n_docs,
       |    CAST(SUM(ntok) AS BIGINT) AS n_tokens FROM base
       |  UNION ALL SELECT 1, 'quality', COUNT(*), CAST(SUM(ntok) AS BIGINT) FROM s1
       |  UNION ALL SELECT 2, 'exact_dedup', COUNT(*), CAST(SUM(ntok) AS BIGINT) FROM s2
       |  UNION ALL SELECT 3, 'neardup_dedup', COUNT(*), CAST(SUM(ntok) AS BIGINT) FROM s3)
       |SELECT CAST(stage_id AS BIGINT) AS stage_id, stage, n_docs, n_tokens,
       |  round(CAST(n_docs AS DOUBLE) / greatest(raw_docs, 1), 6) AS retention
       |FROM st CROSS JOIN raw ORDER BY stage_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_doc_packing" -> (qDocPacking(_, _)),
    "q_context_chunks" -> (qContextChunks(_, _)),
    "ta_pipeline" -> (taPipeline(_, _)),
    "q_stratified_sample" -> (qStratifiedSample(_, _)),
    "dd_cosine_lsh" -> (ddCosineLsh(_, _)),
    "mm_frame_sample" -> (mmFrameSample(_, _)),
    "q_curation_funnel" -> (qCurationFunnel(_, _)))

  def oracles: Map[String, String] = Map(
    "q_doc_packing" -> qDocPackingSql,
    "q_context_chunks" -> qContextChunksSql,
    "ta_pipeline" -> taPipelineSql,
    "q_stratified_sample" -> qStratifiedSampleSql,
    "dd_cosine_lsh" -> ddCosineLshSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "q_curation_funnel" -> qCurationFunnelSql)
}
