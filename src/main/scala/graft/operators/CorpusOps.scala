package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
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
    s"""SELECT array_to_string(string_split(text, ' ')[1:$PrefixTokens], ' ') AS prefix,
       |  COUNT(*) AS n_docs, min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM documents GROUP BY 1 HAVING COUNT(*) > 1
       |ORDER BY n_docs DESC, prefix ASC""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_length_buckets" -> (qLengthBuckets(_, _)),
    "dd_prefix_dup" -> (ddPrefixDup(_, _)))

  def oracles: Map[String, String] = Map(
    "q_length_buckets" -> qLengthBucketsSql,
    "dd_prefix_dup" -> ddPrefixDupSql)
}
