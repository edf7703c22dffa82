package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Corpus-level keyphrase extraction (round-3 additions to the text
  * family). Reference scope: the reference engine has no text
  * analytics; these extend the training-data-pipeline surface the way
  * `ta_textrank`/`ta_collocations` do, with exact DuckDB oracles.
  */
object TextAnalysis3 {

  // ------------------------------------------------------------- RAKE

  private val RakeStop = Seq("the", "a", "of", "to", "and", "in", "is")
  private val RakeTopK = 40
  private val RakeScale = 1073741824.0 // 2^30 — fixed-point word scores

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal stopword-free token runs; each word scores
    * degree/frequency where degree sums the lengths of every phrase the
    * word occurs in (corpus-wide), and a phrase scores the sum of its
    * word scores. Top-[[RakeTopK]] distinct phrases by score.
    *
    * Spark shape: one posexplode, a per-doc running stopword count
    * (window partitioned by doc — the only sequential step, and it
    * scales embarrassingly) to assign phrase ids, then hash aggregates
    * only: phrase build, corpus word stats, per-occurrence score,
    * distinct-phrase rollup. The word-stats table is vocabulary-sized →
    * broadcast. Word scores are quantized (`floor(deg/freq·2^30)`:
    * degree/freq is one IEEE division, the 2^30 multiply and floor are
    * exact) so the per-phrase sum is BIGINT and order-independent on
    * both engines; a single final /2^30 restores a portable double.
    */
  def taRake(s: SparkSession, dir: String): DataFrame = {
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val tok = Tables(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("is_stop", col("tok").isin(RakeStop.map(x => x: Any): _*))
      .withColumn("phrase_id", sum(col("is_stop").cast(LongType)).over(byPos))
    // one row per phrase OCCURRENCE, in token order
    val phrases = tok.where(!col("is_stop"))
      .groupBy("doc_id", "phrase_id")
      .agg(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("phrase"),
        count(lit(1)).as("plen"),
        collect_list(col("tok")).as("words"))
      .localCheckpoint() // read twice: word stats + occurrence scores
    val wordStats = phrases
      .select(explode(col("words")).as("word"), col("plen"))
      .groupBy("word")
      .agg(floor(sum("plen").cast(DoubleType) / count(lit(1)) * lit(RakeScale))
        .cast(LongType).as("wscore_q"))
    val occScores = phrases
      .select(col("doc_id"), col("phrase_id"), col("phrase"),
        explode(col("words")).as("word"))
      .join(broadcast(wordStats), "word")
      .groupBy("doc_id", "phrase_id", "phrase")
      .agg(sum("wscore_q").as("sq"))
    occScores.groupBy("phrase")
      .agg(min("sq").as("sq"), count(lit(1)).as("n_occ"))
      .select(col("phrase"),
        (col("sq").cast(DoubleType) / lit(RakeScale)).as("score"),
        col("n_occ"))
      .orderBy(desc("score"), asc("phrase"))
      .limit(RakeTopK)
  }

  private val taRakeSql = {
    val stop = RakeStop.map(w => s"'$w'").mkString("list_value(", ", ", ")")
    s"""WITH tok AS (
       |  SELECT doc_id, pos, tok,
       |    list_contains($stop, tok) AS is_stop,
       |    SUM(CASE WHEN list_contains($stop, tok) THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
       |               unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
       |        FROM documents)),
       |phrases AS (
       |  SELECT doc_id, phrase_id,
       |    string_agg(tok, ' ' ORDER BY pos) AS phrase,
       |    COUNT(*) AS plen, list(tok ORDER BY pos) AS words
       |  FROM tok WHERE NOT is_stop GROUP BY doc_id, phrase_id),
       |ws AS (
       |  SELECT word,
       |    CAST(floor(CAST(SUM(plen) AS DOUBLE) / COUNT(*) * $RakeScale) AS BIGINT) AS wscore_q
       |  FROM (SELECT unnest(words) AS word, plen FROM phrases)
       |  GROUP BY word),
       |occ AS (
       |  SELECT p.doc_id, p.phrase_id, p.phrase,
       |    CAST(SUM(ws.wscore_q) AS BIGINT) AS sq
       |  FROM (SELECT doc_id, phrase_id, phrase, unnest(words) AS word FROM phrases) p
       |  JOIN ws ON p.word = ws.word
       |  GROUP BY p.doc_id, p.phrase_id, p.phrase)
       |SELECT phrase, CAST(min(sq) AS DOUBLE) / $RakeScale AS score,
       |  COUNT(*) AS n_occ
       |FROM occ GROUP BY phrase
       |ORDER BY score DESC, phrase ASC LIMIT $RakeTopK""".stripMargin
  }

  // ------------------------------------------------------- lexicon sentiment

  /** (term, polarity) lexicon — the VADER/AFINN shape, scored over the
    * corpus vocabulary. Weights are small integers so every per-doc
    * aggregate stays in BIGINT.
    */
  private val SentLexicon = Seq(
    "fast" -> 2L, "big" -> 1L, "merge" -> 1L, "value" -> 1L,
    "slow" -> -2L, "small" -> -1L, "error" -> -3L, "filter" -> -1L)

  /** Lexicon-based sentiment scoring (the AFINN/VADER-style pass a
    * curation pipeline runs to tag tone): explode tokens, inner-join
    * the broadcast lexicon, per-doc integer polarity sum and hit
    * count, then re-attach every document (zero-hit docs score 0).
    * Score is fixed-point — `floor(polarity·2^30 / n_tokens)` as
    * BIGINT — the `ta_rake` quantization pattern: the 2^30 multiply is
    * exact (|polarity·2^30| < 2^53), the divide is ONE IEEE op
    * identical on both engines, and floor of an identical double is an
    * identical integer — so the hashed output is engine-portable, which
    * a raw double ratio was not (r3/r4 hash mismatch). One corpus scan,
    * one hash aggregate keyed by doc, one broadcast join: the aggregate
    * fan-in is bounded by lexicon hits, not corpus size, and nothing
    * shuffles except the doc-keyed sums.
    */
  def taSentiment(s: SparkSession, dir: String): DataFrame = {
    val lex = s.createDataFrame(SentLexicon).toDF("tok", "w")
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"),
        split(col("text"), " ").as("toks"))
    val hits = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(broadcast(lex), "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), sum("w").as("polarity"))
    docs.select("doc_id", "n_tokens")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("polarity"), lit(0L)).as("polarity"),
        floor(coalesce(col("polarity"), lit(0L)).cast(DoubleType) * lit(RakeScale)
          / col("n_tokens")).cast(LongType).as("score_q"))
      .orderBy("doc_id")
  }

  private val taSentimentSql = {
    val lexRows = SentLexicon.map { case (t, w) => s"('$t', $w)" }.mkString(", ")
    s"""WITH lex(tok, w) AS (VALUES $lexRows),
       |d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
       |hits AS (
       |  SELECT t.doc_id, COUNT(*) AS n_hits, SUM(lex.w) AS polarity
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
       |  JOIN lex ON t.tok = lex.tok
       |  GROUP BY t.doc_id)
       |SELECT d.doc_id, d.n_tokens,
       |  coalesce(h.n_hits, 0) AS n_hits,
       |  CAST(coalesce(h.polarity, 0) AS BIGINT) AS polarity,
       |  CAST(floor(CAST(coalesce(h.polarity, 0) AS DOUBLE) * $RakeScale / d.n_tokens) AS BIGINT) AS score_q
       |FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // ------------------------------------------------ quality classifier

  // fixed published-model weights (the fastText-quality inference
  // shape: a linear model over the ta_quality feature family)
  private val W0 = -1.0; private val WStop = 2.0; private val WTtr = 1.5
  private val WLen = 1.0; private val WPunct = -3.0
  private val QlrStop = Seq("the", "a", "of", "to", "and", "in", "is")

  /** Quality-classifier INFERENCE at corpus scale — the pass a
    * pretraining pipeline runs with a trained quality model (fastText /
    * logistic) to keep high-quality documents: featurize each doc
    * (stopword ratio, type-token ratio, length saturation, punctuation
    * density — the ta_quality family), apply fixed weights, sigmoid.
    * One narrow projection per document, no shuffle at all except the
    * final ORDER BY; the model is 5 constants, the 100 TB cost is the
    * scan. The logit z is a fixed chain of IEEE ops evaluated in the
    * same order on both engines — so `floor(z·2^30)` is a portable
    * BIGINT and `keep` compares the exact z against 0. The sigmoid is
    * deliberately NOT in the hashed output: exp's last ulp is a
    * platform assumption (this query hash-mismatched in r3/r4 for
    * exactly that reason — round(σ(z), 6) still flips at rounding
    * boundaries), and σ is monotone in z so logit_q carries the full
    * ranking information.
    */
  def taQualityLr(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nToks = size(toks).cast(DoubleType)
    val stopRatio = size(filter(toks,
      t => t.isin(QlrStop.map(x => x: Any): _*))).cast(DoubleType) / nToks
    val ttr = size(array_distinct(toks)).cast(DoubleType) / nToks
    val lenSat = least(nToks / 100.0, lit(1.0))
    val punct = regexp_count(col("text"), lit("[.,;:!?]")).cast(DoubleType) /
      length(col("text"))
    val z = lit(W0) + lit(WStop) * stopRatio + lit(WTtr) * ttr +
      lit(WLen) * lenSat + lit(WPunct) * punct
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        floor(z * lit(RakeScale)).cast(LongType).as("logit_q"),
        (z >= 0).as("keep"))
      .orderBy("doc_id")
  }

  private val taQualityLrSql = {
    val stop = QlrStop.map(w => s"'$w'").mkString("list_value(", ", ", ")")
    val z = s"($W0 + $WStop * (CAST(len(list_filter(toks, t -> list_contains($stop, t))) AS DOUBLE) / len(toks))" +
      s" + $WTtr * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))" +
      s" + $WLen * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)" +
      s" + $WPunct * (CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / length(text)))"
    s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
       |SELECT doc_id,
       |  CAST(floor($z * $RakeScale) AS BIGINT) AS logit_q,
       |  $z >= 0 AS keep
       |FROM d ORDER BY doc_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_rake" -> (taRake(_, _)),
    "ta_sentiment" -> (taSentiment(_, _)),
    "ta_quality_lr" -> (taQualityLr(_, _)))

  def oracles: Map[String, String] = Map(
    "ta_rake" -> taRakeSql,
    "ta_sentiment" -> taSentimentSql,
    "ta_quality_lr" -> taQualityLrSql)
}
