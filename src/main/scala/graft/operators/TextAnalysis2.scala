package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Second text-analysis wave — the pretraining-corpus filters that run
  * after the basics in [[TextAnalysis]]:
  *
  *  - repetition signals (Gopher-style): adjacent-duplicate tokens,
  *    duplicate-token fraction, most-frequent-bigram fraction. Pure
  *    per-row array expressions — no shuffle, whole-stage codegen,
  *    embarrassingly parallel at 100 TB.
  *  - PII scrubbing: regex detect + replace of emails/phones with
  *    placeholder tags, counting hits. Again a narrow projection.
  *  - TF-IDF: the classic explode → (doc,term) counts → document
  *    frequency join → per-doc top-k terms. The df side is
  *    vocabulary-sized (≪ corpus) and aggregates with map-side combine;
  *    the final top-k is a bounded window per doc.
  *  - BM25: scoring every document against a fixed query-term set —
  *    the retrieval shape. Only rows containing a query term survive
  *    the first filter, so the join fan-in is tiny at any scale.
  *
  * All four have exact DuckDB oracles (transcendental ln rounded to 6
  * decimals on both sides per NOTES.md technique #3).
  */
object TextAnalysis2 {

  private val toks = split(col("text"), " ")

  /** Repetition signals. Guard n<2 explicitly: Spark's sequence(1, 0)
    * yields a DESCENDING [1,0] rather than DuckDB range(1,1)'s [].
    */
  def taRepetition(s: SparkSession, dir: String): DataFrame = {
    val n = size(toks)
    val idx = sequence(lit(1), n - 1)
    val adjDups = when(n < 2, lit(0)).otherwise(
      size(filter(idx, i => element_at(toks, i) === element_at(toks, i + 1))))
    val bgs = transform(idx, i =>
      concat(element_at(toks, i), lit(" "), element_at(toks, i + 1)))
    val topBg = when(n < 2, lit(0)).otherwise(
      array_max(transform(array_distinct(bgs), g => size(filter(bgs, x => x === g)))))
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        n.cast(LongType).as("n_tokens"),
        adjDups.cast(LongType).as("adj_dup_cnt"),
        (lit(1.0) - size(array_distinct(toks)).cast(DoubleType) / n).as("dup_token_frac"),
        topBg.cast(LongType).as("top_bigram_cnt"),
        when(n < 2, lit(0.0)).otherwise(topBg.cast(DoubleType) / (n - 1)).as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  private val taRepetitionSql =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |b AS (SELECT doc_id, toks, len(toks) AS n,
      |        list_transform(range(1, len(toks)), i -> list_extract(toks, i) || ' ' || list_extract(toks, i+1)) AS bgs
      |      FROM d)
      |SELECT doc_id,
      |  CAST(n AS BIGINT) AS n_tokens,
      |  CAST(CASE WHEN n < 2 THEN 0
      |       ELSE len(list_filter(range(1, n), i -> list_extract(toks, i) = list_extract(toks, i+1))) END AS BIGINT) AS adj_dup_cnt,
      |  1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / n AS dup_token_frac,
      |  CAST(CASE WHEN n < 2 THEN 0
      |       ELSE list_max(list_transform(list_distinct(bgs), g -> len(list_filter(bgs, x -> x = g)))) END AS BIGINT) AS top_bigram_cnt,
      |  CASE WHEN n < 2 THEN 0.0
      |       ELSE CAST(list_max(list_transform(list_distinct(bgs), g -> len(list_filter(bgs, x -> x = g)))) AS DOUBLE) / (n - 1) END AS top_bigram_frac
      |FROM b ORDER BY doc_id""".stripMargin

  /** PII scrub: the testdata has no real PII, so the note column is
    * synthesized from customer fields (name + TPC-H phone + derived
    * email) and then scrubbed — the regex/replace/count machinery is
    * the operator; the synthesis just feeds it. Spark's regexp_replace
    * is global by default; DuckDB needs the 'g' flag.
    */
  private val EmailRe = "[a-z0-9.#]+@[a-z0-9.]+"
  private val PhoneRe = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def taPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val phone = format_string("%02d-%03d-%03d-%04d",
      k % 90 + 10, k % 1000, (k * 7) % 1000, (k * 13) % 10000)
    val note = concat(col("c_name"), lit(" reachable at "), phone,
      lit(" or "), lower(regexp_replace(col("c_name"), " ", ".")), lit("@example.com"))
    Tables(s, dir, "customer")
      .select(col("c_custkey"), note.as("note"))
      .select(col("c_custkey"),
        regexp_count(col("note"), lit(EmailRe)).cast(LongType).as("n_emails"),
        regexp_count(col("note"), lit(PhoneRe)).cast(LongType).as("n_phones"),
        md5(regexp_replace(regexp_replace(col("note"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).as("scrubbed_md5"))
      .orderBy("c_custkey")
  }

  private val taPiiScrubSql =
    s"""WITH n AS (SELECT c_custkey,
       |  c_name || ' reachable at '
       |    || printf('%02d-%03d-%03d-%04d', c_custkey % 90 + 10, c_custkey % 1000,
       |              (c_custkey * 7) % 1000, (c_custkey * 13) % 10000) || ' or '
       |    || lower(regexp_replace(c_name, ' ', '.', 'g')) || '@example.com' AS note
       |  FROM customer)
       |SELECT c_custkey,
       |  CAST(len(regexp_extract_all(note, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(note, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(note, '$EmailRe', '<EMAIL>', 'g'),
       |      '$PhoneRe', '<PHONE>', 'g')) AS scrubbed_md5
       |FROM n ORDER BY c_custkey""".stripMargin

  /** TF-IDF top-3 terms per document. idf = ln(N/df), tfidf rounded to
    * 6 decimals BEFORE the ranking sort so Spark and DuckDB rank on
    * bit-identical keys (ties → term asc).
    */
  def taTfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val terms = docs.select(col("doc_id"), explode(toks).as("tok"))
    val tf = terms.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df_cnt"))
    val byDoc = Window.partitionBy("doc_id").orderBy(desc("tfidf"), asc("tok"))
    tf.join(df, "tok")
      .join(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast(DoubleType) / col("df_cnt")), 6))
      .withColumn("rk", row_number().over(byDoc))
      .where(col("rk") <= 3)
      .select(col("doc_id"), col("rk").cast(LongType).as("rk"), col("tok"),
        col("tf"), col("df_cnt"), col("tfidf"))
      .orderBy("doc_id", "rk")
  }

  private val taTfidfSql =
    """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM terms GROUP BY doc_id, tok),
      |df AS (SELECT tok, COUNT(*) AS df_cnt FROM tf GROUP BY tok),
      |scored AS (
      |  SELECT tf.doc_id, tf.tok, tf.tf, df.df_cnt,
      |    round(tf.tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df.df_cnt), 6) AS tfidf
      |  FROM tf JOIN df ON tf.tok = df.tok),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rk
      |  FROM scored)
      |SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, tf, df_cnt, tfidf
      |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** BM25 (k1=1.2, b=0.75) of every document against a fixed query-term
    * set — only docs containing a query term are scored (the explode is
    * filtered before the shuffle, so the aggregate fan-in is bounded by
    * hit count, not corpus size).
    */
  private val QueryTerms = Seq("spark", "query", "join")

  def taBm25(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    // ONE corpus tokenization: a single explode + per-doc aggregate
    // yields doc length and the per-query-term tf counts together.
    // Everything downstream (corpus stats, df, scoring) derives from
    // this cached doc-sized relation, so the query scans the corpus
    // exactly once regardless of suite cache state.
    val perdoc = docs.select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("dl"),
        QueryTerms.map(q =>
          sum(when(col("tok") === q, 1L).otherwise(0L)).as(s"tf_$q")): _*)
      .cache()
    val stats = perdoc.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast(DoubleType) / count(lit(1))).as("avgdl"))
    val stackExpr = s"stack(${QueryTerms.size}, " +
      QueryTerms.map(q => s"'$q', tf_$q").mkString(", ") + ") AS (tok, tf)"
    val tf = perdoc.select(col("doc_id"), col("dl"), expr(stackExpr))
      .where(col("tf") > 0)
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df_cnt"))
    val partial = tf.join(broadcast(df), "tok")
      .join(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df_cnt") + 0.5) / (col("df_cnt") + 0.5)))
      .withColumn("contrib",
        col("idf") * (col("tf") / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))))
    partial.groupBy("doc_id")
      .agg(round(sum(col("contrib")), 6).as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(10)
  }

  private val taBm25Sql = {
    val termList = QueryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avgdl
       |  FROM documents),
       |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
       |hits AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM hits
       |       WHERE tok IN ($termList) GROUP BY doc_id, tok),
       |df AS (SELECT tok, COUNT(*) AS df_cnt FROM tf GROUP BY tok),
       |partial AS (
       |  SELECT tf.doc_id,
       |    ln(1.0 + (stats.n_docs - df.df_cnt + 0.5) / (df.df_cnt + 0.5))
       |      * (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS contrib
       |  FROM tf JOIN df ON tf.tok = df.tok
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats)
       |SELECT doc_id, round(SUM(contrib), 6) AS bm25
       |FROM partial GROUP BY doc_id
       |ORDER BY bm25 DESC, doc_id ASC LIMIT 10""".stripMargin
  }

  /** Bigram language-model scoring with add-one smoothing: score each
    * document by its average conditional log-probability under the
    * corpus's own bigram statistics — the perplexity-style quality
    * filter a pretraining pipeline runs (low avg_logp ⇒ text is
    * improbable under the corpus LM). Counts are two hash aggregates;
    * the per-doc sum uses the exact power-of-two quantization
    * (NOTES.md #4b) so double summation order can't leak in.
    */
  def taNgramLm(s: SparkSession, dir: String): DataFrame = {
    val Pow2_30 = 1073741824.0
    val docs = Tables(s, dir, "documents")
    val n = size(toks)
    val idx = sequence(lit(1), n - 1)
    val bgArr = when(n < 2, array().cast(ArrayType(StructType(Seq(
        StructField("w1", StringType), StructField("w2", StringType))))))
      .otherwise(transform(idx, i => struct(
        element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2"))))
    // Pre-aggregate occurrences to per-doc DISTINCT bigrams with a
    // multiplicity k before anything is reused: the relation that feeds
    // both the global bigram-count build and the probe side is then
    // distinct-bigram-sized, not corpus-sized, so the query's cost no
    // longer depends on whether a corpus-sized cache survives across
    // the suite. k-weighting keeps the per-occurrence sums exact
    // (every occurrence of a bigram has the identical quantized logp).
    val bgd = docs.select(col("doc_id"), explode(bgArr).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("k"))
      .cache()
    val unic = docs.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val vocab = unic.agg(count(lit(1)).as("v"))
    val bgc = bgd.groupBy(col("w1").as("b1"), col("w2").as("b2"))
      .agg(sum("k").as("cb"))
    bgd.join(bgc, col("w1") === col("b1") && col("w2") === col("b2"))
      .join(unic, col("w1") === col("w"))
      .join(broadcast(vocab))
      .withColumn("logp", round(log((col("cb") + 1.0) / (col("cw") + col("v"))), 6))
      .groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"),
        (sum(col("k") * floor(col("logp") * Pow2_30)).cast(DoubleType) / Pow2_30
          / sum("k")).as("avg_logp"))
      .orderBy("doc_id")
  }

  private val taNgramLmSql =
    """WITH d AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      |bg AS (SELECT doc_id, list_extract(toks, i) AS w1, list_extract(toks, i+1) AS w2
      |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM d)),
      |unic AS (SELECT w, COUNT(*) AS cw FROM (SELECT unnest(toks) AS w FROM d) GROUP BY w),
      |vocab AS (SELECT COUNT(*) AS v FROM unic),
      |bgc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2),
      |scored AS (
      |  SELECT bg.doc_id,
      |    round(ln((bgc.cb + 1.0) / (unic.cw + vocab.v)), 6) AS logp
      |  FROM bg JOIN bgc ON bg.w1 = bgc.w1 AND bg.w2 = bgc.w2
      |  JOIN unic ON bg.w1 = unic.w
      |  CROSS JOIN vocab)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(CAST(floor(logp * 1073741824.0) AS BIGINT)) AS DOUBLE)
      |    / 1073741824.0 / COUNT(*) AS avg_logp
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Inverted index build
  // ---------------------------------------------------------------------

  private val PostingsCap = 10

  /** Corpus inverted index: term → document frequency, collection
    * frequency, and the first [[PostingsCap]] doc ids of the postings
    * list. The explode + (term, doc) pre-aggregation is the same
    * map-side-combining shuffle as TF-IDF's df side; the postings
    * assembly groups by term, so each task materializes one term's
    * (bounded, capped) list — at 100 TB the vocabulary partitions the
    * work and hot terms cap their list instead of collecting the
    * corpus. Oracle: DuckDB `list(... ORDER BY ...)` sliced to the cap.
    * The postings list is serialized to a comma-joined string so the
    * harness's pandas compare can hash the rows (numpy arrays are
    * unhashable).
    */
  def taInvertedIndex(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("c").as("cf"),
        array_join(
          slice(array_sort(collect_list(col("doc_id"))), 1, PostingsCap)
            .cast("array<string>"), ",")
          .as("postings"))
      .orderBy("term")

  private val taInvertedIndexSql =
    s"""WITH td AS (
       |  SELECT unnest(string_split(text, ' ')) AS term, doc_id FROM documents),
       |tdc AS (SELECT term, doc_id, COUNT(*) AS c FROM td GROUP BY term, doc_id)
       |SELECT term, COUNT(*) AS df, CAST(SUM(c) AS BIGINT) AS cf,
       |  COALESCE(array_to_string(list_transform(
       |    array_slice(list_sort(array_agg(doc_id)), 1, $PostingsCap),
       |    x -> CAST(x AS STRING)), ','), '') AS postings
       |FROM tdc GROUP BY term ORDER BY term""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_inverted_index" -> (taInvertedIndex(_, _)),
    "ta_ngram_lm" -> (taNgramLm(_, _)),
    "ta_repetition" -> (taRepetition(_, _)),
    "ta_pii_scrub" -> (taPiiScrub(_, _)),
    "ta_tfidf" -> (taTfidf(_, _)),
    "ta_bm25" -> (taBm25(_, _)))

  def oracles: Map[String, String] = Map(
    "ta_inverted_index" -> taInvertedIndexSql,
    "ta_ngram_lm" -> taNgramLmSql,
    "ta_repetition" -> taRepetitionSql,
    "ta_pii_scrub" -> taPiiScrubSql,
    "ta_tfidf" -> taTfidfSql,
    "ta_bm25" -> taBm25Sql)
}
