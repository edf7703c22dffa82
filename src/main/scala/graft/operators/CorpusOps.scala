package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Corpus-preparation operators for training-data batching and
  * boilerplate detection.
  *
  *  - `q_length_buckets`: assign every document to the smallest
  *    power-of-two token-length bucket (16/32/64/128 — the corpus spans
  *    10..100 tokens) and report per-bucket doc counts, token totals,
  *    and padding waste. This is the sequence-length bucketing step in
  *    front of a trainer: batches drawn within a bucket pad to the
  *    bucket cap, and `waste_frac` is the fraction of compute lost to
  *    pad tokens. One narrow scan + a 4-row aggregate — at 100 TB this
  *    is a map-side-combined reduce with a 4-row shuffle.
  *  - `dd_prefix_dup`: boilerplate-prefix detection — documents that
  *    open with the same leading tokens (here the first 2; the window
  *    is a parameter) are grouped and counted, surfacing shared
  *    headers/templates that near-dup metrics dilute. The prefix is a
  *    bounded-length key (never the whole document), so the groupBy
  *    shuffles short strings, not the corpus; at scale you'd hash the
  *    prefix first (see `graft_hash64`) and carry doc ids only.
  *  - `q_cdc_chunks`: content-defined chunking + chunk-level dedup
  *    (see the method doc).
  */
object CorpusOps {

  private val Buckets = Seq(16, 32, 64, 128)
  private val PrefixTokens = 2

  def qLengthBuckets(s: SparkSession, dir: String): DataFrame = {
    val n = size(split(col("text"), " "))
    val cap = Buckets.foldRight(lit(Buckets.last): org.apache.spark.sql.Column) {
      case (b, acc) => when(n <= b, b).otherwise(acc)
    }
    Tables(s, dir, "documents")
      .select(cap.cast(LongType).as("bucket"), n.cast(LongType).as("n_tok"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("sum_tokens"),
        (sum(col("bucket") - col("n_tok"))).as("pad_tokens"))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"), col("pad_tokens"),
        (col("pad_tokens").cast(DoubleType) / (col("bucket") * col("n_docs")))
          .as("waste_frac"))
      .orderBy("bucket")
  }

  private val qLengthBucketsSql = {
    val caseCap = Buckets.init
      .map(b => s"WHEN n <= $b THEN $b").mkString("CASE ", " ", s" ELSE ${Buckets.last} END")
    s"""WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
       |b AS (SELECT CAST($caseCap AS BIGINT) AS bucket, n FROM t)
       |SELECT bucket, COUNT(*) AS n_docs,
       |  CAST(SUM(n) AS BIGINT) AS sum_tokens,
       |  CAST(SUM(bucket - n) AS BIGINT) AS pad_tokens,
       |  CAST(SUM(bucket - n) AS DOUBLE) / (bucket * COUNT(*)) AS waste_frac
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  def ddPrefixDup(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 1, PrefixTokens), " ").as("prefix"))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .where(col("n_docs") > 1)
      .orderBy(desc("n_docs"), asc("prefix"))

  private val ddPrefixDupSql =
    s"""SELECT array_to_string(array_slice(string_split(text, ' '), 1, $PrefixTokens), ' ') AS prefix,
       |  COUNT(*) AS n_docs, min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM documents GROUP BY 1 HAVING COUNT(*) > 1
       |ORDER BY n_docs DESC, prefix ASC""".stripMargin

  // ---------------------------------------------------------------------
  // Content-defined chunking + chunk-level dedup
  // ---------------------------------------------------------------------

  private val CdcW = 4      // rolling window (tokens) feeding the boundary hash
  private val CdcMask = 7L  // boundary when hash % 8 == 0 → ~8-token chunks

  /** Content-defined chunking: chunk boundaries fall where the rolling
    * window hash clears a mask — so an insertion early in a document
    * shifts ONE chunk, not every fixed-width block after it (the
    * resync property storage dedup and incremental-sync systems rely
    * on). Chunk id = running count of boundaries (a per-document
    * window — partitioned by the natural key), chunk hash = md5 of the
    * chunk's tokens, and the final aggregate counts how often each
    * chunk repeats across the corpus. Every stage is a narrow
    * projection or a map-combining shuffle of (hash, count).
    */
  def qCdcChunks(s: SparkSession, dir: String): DataFrame = {
    // the whole boundary scan runs per-document inside graft_cdc (one
    // codegen'd kernel call: rolling window hash, cut test, chunk
    // md5s) — the corpus-sized (doc, pos, tok) relation, its window
    // running sum and the collect_list/sort per chunk never exist.
    // repartition: documents is one input split at test scale (#27)
    val chunks = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        explode(expr(s"graft_cdc(text, $CdcW, ${CdcMask + 1})")).as("c"))
      .select(col("doc_id"), col("c.chash").as("chash"), col("c.n_tok").as("n_tok"))
    chunks.groupBy("chash")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("doc_id").as("n_docs"),
        min("n_tok").as("n_tok"))
      .where(col("n_occurrences") > 1)
      .orderBy(desc("n_occurrences"), asc("chash"))
  }

  private val qCdcChunksSql = {
    // greatest(): the i >= CdcW guard does not protect the slice on
    // spark.sql — subexpression elimination hoists the hashed window
    // out of the CASE branch, so a raw i − 3 start would throw at
    // i < 4; the clamp keeps the expression total (and is invisible
    // where the guard admits it, i − 3 ≥ 1)
    val winExpr =
      s"array_to_string(array_slice(d.toks, greatest(i - ${CdcW - 1}, 1), i), ' ')"
    s"""WITH mx AS (
       |  SELECT CAST(max(len(string_split(text, ' '))) AS BIGINT) AS m FROM documents),
       |dims AS (SELECT unnest(generate_series(1, m)) AS i FROM mx),
       |t AS (
       |  SELECT d.doc_id, i AS p, list_extract(d.toks, CAST(i AS INTEGER)) AS tok,
       |    CASE WHEN i >= $CdcW
       |      AND ${PortableHash.sql(winExpr)} % ${CdcMask + 1} = 0
       |    THEN 1 ELSE 0 END AS cut
       |  FROM (SELECT doc_id, toks FROM
       |          (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)) d
       |  CROSS JOIN dims WHERE i <= len(d.toks)),
       |c AS (SELECT doc_id, p, tok,
       |    CAST(SUM(cut) OVER (PARTITION BY doc_id ORDER BY p
       |      ROWS UNBOUNDED PRECEDING) - cut AS BIGINT) AS chunk
       |  FROM t),
       |ch AS (SELECT doc_id, chunk, COUNT(*) AS n_tok,
       |    md5(array_to_string(list_transform(list_sort(array_agg(
       |      lpad(CAST(p AS STRING), 7, '0') || ':' || tok)),
       |      s -> substr(s, 9)), ' ')) AS chash
       |  FROM c GROUP BY doc_id, chunk)
       |SELECT chash, COUNT(*) AS n_occurrences,
       |  COUNT(DISTINCT doc_id) AS n_docs, min(n_tok) AS n_tok
       |FROM ch GROUP BY chash HAVING COUNT(*) > 1
       |ORDER BY n_occurrences DESC, chash ASC""".stripMargin
  }

  /** The storage-dedup LEDGER the chunk histogram (q_cdc_chunks) feeds:
    * a chunk's globally-first occurrence — min (doc_id, chunk_idx) —
    * is "stored"; every later occurrence is deduplicated away. Per
    * document: chunks/tokens stored vs deduped and the savings ratio —
    * the per-item accounting an incremental-sync or training-shard
    * dedup stage reports. Shape: the same one-kernel-call chunking,
    * one min-aggregate per chash (map-side combining), one hash join
    * back on chash, one per-doc rollup. The ratio is a single
    * identically-written division.
    */
  def ddChunkLedger(s: SparkSession, dir: String): DataFrame = {
    val chunks = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        posexplode(expr(s"graft_cdc(text, $CdcW, ${CdcMask + 1})")).as(Seq("ci", "c")))
      .select(col("doc_id"), col("ci"),
        col("c.chash").as("chash"), col("c.n_tok").as("n_tok"))
    val firstOcc = chunks.groupBy("chash")
      .agg(min(struct(col("doc_id"), col("ci"))).as("first"))
      .select(col("chash"), col("first.doc_id").as("fdoc"), col("first.ci").as("fci"))
    chunks.join(firstOcc, "chash")
      .withColumn("stored", col("doc_id") === col("fdoc") && col("ci") === col("fci"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("stored"), 1L).otherwise(0L)).as("stored_chunks"),
        sum(when(col("stored"), col("n_tok")).otherwise(0L)).as("stored_tokens"),
        sum(when(!col("stored"), col("n_tok")).otherwise(0L)).as("deduped_tokens"))
      .select(col("doc_id"), col("n_chunks"), col("stored_chunks"),
        col("stored_tokens"), col("deduped_tokens"),
        (col("deduped_tokens").cast(DoubleType)
          / (col("stored_tokens") + col("deduped_tokens"))).as("savings"))
      .orderBy("doc_id")
  }

  private val ddChunkLedgerSql = {
    // greatest(): the i >= CdcW guard does not protect the slice on
    // spark.sql — subexpression elimination hoists the hashed window
    // out of the CASE branch, so a raw i − 3 start would throw at
    // i < 4; the clamp keeps the expression total (and is invisible
    // where the guard admits it, i − 3 ≥ 1)
    val winExpr =
      s"array_to_string(array_slice(d.toks, greatest(i - ${CdcW - 1}, 1), i), ' ')"
    s"""WITH mx AS (
       |  SELECT CAST(max(len(string_split(text, ' '))) AS BIGINT) AS m FROM documents),
       |dims AS (SELECT unnest(generate_series(1, m)) AS i FROM mx),
       |t AS (
       |  SELECT d.doc_id, i AS p, list_extract(d.toks, CAST(i AS INTEGER)) AS tok,
       |    CASE WHEN i >= $CdcW
       |      AND ${PortableHash.sql(winExpr)} % ${CdcMask + 1} = 0
       |    THEN 1 ELSE 0 END AS cut
       |  FROM (SELECT doc_id, toks FROM
       |          (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)) d
       |  CROSS JOIN dims WHERE i <= len(d.toks)),
       |c AS (SELECT doc_id, p, tok,
       |    CAST(SUM(cut) OVER (PARTITION BY doc_id ORDER BY p
       |      ROWS UNBOUNDED PRECEDING) - cut AS BIGINT) AS ci
       |  FROM t),
       |ch AS (SELECT doc_id, ci, COUNT(*) AS n_tok,
       |    md5(array_to_string(list_transform(list_sort(array_agg(
       |      lpad(CAST(p AS STRING), 7, '0') || ':' || tok)),
       |      s -> substr(s, 9)), ' ')) AS chash
       |  FROM c GROUP BY doc_id, ci),
       |fo AS (SELECT chash,
       |    min(lpad(CAST(doc_id AS STRING), 12, '0') || ':'
       |        || lpad(CAST(ci AS STRING), 12, '0')) AS first
       |  FROM ch GROUP BY chash),
       |led AS (SELECT ch.doc_id, ch.n_tok,
       |    (lpad(CAST(ch.doc_id AS STRING), 12, '0') || ':'
       |     || lpad(CAST(ch.ci AS STRING), 12, '0') = fo.first) AS stored
       |  FROM ch JOIN fo ON ch.chash = fo.chash)
       |SELECT doc_id, COUNT(*) AS n_chunks,
       |  CAST(SUM(CASE WHEN stored THEN 1 ELSE 0 END) AS BIGINT) AS stored_chunks,
       |  CAST(SUM(CASE WHEN stored THEN n_tok ELSE 0 END) AS BIGINT) AS stored_tokens,
       |  CAST(SUM(CASE WHEN NOT stored THEN n_tok ELSE 0 END) AS BIGINT) AS deduped_tokens,
       |  CAST(SUM(CASE WHEN NOT stored THEN n_tok ELSE 0 END) AS DOUBLE)
       |    / (CAST(SUM(CASE WHEN stored THEN n_tok ELSE 0 END) AS BIGINT)
       |       + CAST(SUM(CASE WHEN NOT stored THEN n_tok ELSE 0 END) AS BIGINT)) AS savings
       |FROM led GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_length_buckets" -> (qLengthBuckets(_, _)),
    "q_cdc_chunks" -> (qCdcChunks(_, _)),
    "dd_chunk_ledger" -> (ddChunkLedger(_, _)),
    "dd_prefix_dup" -> (ddPrefixDup(_, _)))

  def oracles: Map[String, String] = Map(
    "q_length_buckets" -> qLengthBucketsSql,
    "q_cdc_chunks" -> qCdcChunksSql,
    "dd_chunk_ledger" -> ddChunkLedgerSql,
    "dd_prefix_dup" -> ddPrefixDupSql)
}
