package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token statistics, quality scoring, language ID,
  * and document fingerprinting. All pure Catalyst expressions — each
  * document is processed independently (embarrassingly parallel, no
  * shuffle except the final presentation sort), which is exactly the
  * shape that scales to 100 TB: a single narrow projection over the
  * scan with whole-stage codegen.
  */
object TextAnalysis {

  private val toks = split(col("text"), " ")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single symbols. */
  private val BpeRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  private val BpeReSql = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Token counting: whitespace tokens, BPE-ish regex tokens, distinct
    * tokens, characters.
    */
  def taTokens(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(toks).cast(LongType).as("n_tokens"),
        regexp_count(col("text"), lit(BpeRe)).cast(LongType).as("n_bpe_tokens"),
        size(array_distinct(toks)).cast(LongType).as("n_distinct_tokens"),
        length(col("text")).cast(LongType).as("n_chars"))
      .orderBy("doc_id")

  private val taTokensSql =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(len(regexp_extract_all(text, '$BpeReSql')) AS BIGINT) AS n_bpe_tokens,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  private val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is")

  /** Quality scoring: punctuation ratio, stopword ratio, mean word
    * length, type-token ratio, and a weighted composite — the filters a
    * pretraining pipeline runs before anything expensive.
    */
  def taQuality(s: SparkSession, dir: String): DataFrame = {
    val nToks = size(toks)
    val punct = regexp_count(col("text"), lit("[.,;:!?]"))
    val stopHits = size(filter(toks, t => t.isin(Stopwords.map(x => x: Any): _*)))
    val punctRatio = punct.cast(DoubleType) / length(col("text"))
    val stopRatio = stopHits.cast(DoubleType) / nToks
    val ttr = size(array_distinct(toks)).cast(DoubleType) / nToks
    val meanWordLen = length(regexp_replace(col("text"), " ", "")).cast(DoubleType) / nToks
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        punctRatio.as("punct_ratio"),
        stopRatio.as("stopword_ratio"),
        ttr.as("type_token_ratio"),
        meanWordLen.as("mean_word_len"),
        ((stopRatio * lit(0.4)) + (ttr * lit(0.4)) + (least(nToks.cast(DoubleType) / lit(100.0), lit(1.0)) * lit(0.2)))
          .as("quality_score"))
      .orderBy("doc_id")
  }

  private val stopListSql = Stopwords.map(w => s"'$w'").mkString("list_value(", ", ", ")")

  private val taQualitySql =
    s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / length(text) AS punct_ratio,
       |  CAST(len(list_filter(toks, t -> list_contains($stopListSql, t))) AS DOUBLE) / len(toks) AS stopword_ratio,
       |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS type_token_ratio,
       |  CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) / len(toks) AS mean_word_len,
       |  ((CAST(len(list_filter(toks, t -> list_contains($stopListSql, t))) AS DOUBLE) / len(toks)) * 0.4
       |   + (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.4
       |   + (least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)) * 0.2) AS quality_score
       |FROM d ORDER BY doc_id""".stripMargin

  /** Language-ID by marker-token hits (n-gram-heuristic family). The
    * synthetic corpus shares one vocabulary across langs, so accuracy
    * is meaningless here — the operator shape (per-lang scores, argmax
    * with a fixed tiebreak) is what carries to a real marker table.
    */
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is"),
    "es" -> Seq("data", "row", "value"),
    "de" -> Seq("join", "merge", "group"),
    "fr" -> Seq("filter", "sort", "order"),
    "zh" -> Seq("spark", "query", "table"))

  def taLangid(s: SparkSession, dir: String): DataFrame = {
    val scores = Markers.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words.map(x => x: Any): _*))).cast(LongType)
    }
    val Seq(en, es, de, fr, zh) = scores.map(_._2)
    val pred =
      when(en >= es && en >= de && en >= fr && en >= zh, "en")
        .when(es >= de && es >= fr && es >= zh, "es")
        .when(de >= fr && de >= zh, "de")
        .when(fr >= zh, "fr")
        .otherwise("zh")
    Tables(s, dir, "documents")
      .select(Seq(col("doc_id")) ++
        scores.map { case (l, c) => c.as(s"score_$l") } ++
        Seq(pred.as("pred_lang"), col("lang").as("actual_lang")): _*)
      .orderBy("doc_id")
  }

  private def markerSql(words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("list_value(", ", ", ")")
    s"CAST(len(list_filter(toks, t -> list_contains($lst, t))) AS BIGINT)"
  }

  private val taLangidSql = {
    val Seq(en, es, de, fr, zh) = Markers.map { case (_, ws) => markerSql(ws) }
    s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
       |sc AS (SELECT doc_id, lang, $en AS score_en, $es AS score_es, $de AS score_de,
       |       $fr AS score_fr, $zh AS score_zh FROM d)
       |SELECT doc_id, score_en, score_es, score_de, score_fr, score_zh,
       |  CASE WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
       |       WHEN score_es >= score_de AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
       |       WHEN score_de >= score_fr AND score_de >= score_zh THEN 'de'
       |       WHEN score_fr >= score_zh THEN 'fr'
       |       ELSE 'zh' END AS pred_lang,
       |  lang AS actual_lang
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprinting: whole-doc content hash + a rolling
    * polynomial hash over token hashes (order-sensitive, unlike the
    * content hash of a token *set*) — the cheap prefilter for
    * shift-tolerant dedup.
    */
  def taFingerprint(s: SparkSession, dir: String): DataFrame = {
    val tokHashes = transform(toks, t => PortableHash.hash64(t) % lit(1000003L))
    val rolling = aggregate(tokHashes, lit(0L), (acc, h) => (acc * lit(31L) + h) % lit(1000003L))
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        md5(col("text")).as("content_md5"),
        rolling.as("rolling_hash"),
        (PortableHash.hash64(col("text")) % lit(1000003L)).as("doc_hash"))
      .orderBy("doc_id")
  }

  private val taFingerprintSql = {
    val tokH = PortableHash.sql("t") + " % 1000003"
    s"""SELECT doc_id, md5(text) AS content_md5,
       |  CASE WHEN len(string_split(text, ' ')) = 0 THEN 0
       |       ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ' '), t -> $tokH)),
       |                        (a, h) -> (a * 31 + h) % 1000003) END AS rolling_hash,
       |  ${PortableHash.sql("text")} % 1000003 AS doc_hash
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Heavy hitters via the Misra-Gries sketch, prune-then-verify: the
    * mergeable sketch (one pass, k=64 counters, map-side combine)
    * nominates candidate tokens — guaranteed to include everything with
    * frequency > n/65 — then an exact count over just the candidates
    * applies the real threshold (count·32 ≥ n, strictly inside the
    * guarantee). At 100 TB the exact pass groups a candidate set of ≤64
    * tokens instead of the full vocabulary; output is exact, so the
    * oracle is a plain GROUP BY/HAVING.
    */
  def taHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(s)
    val t = Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    // ONE sketch pass computes both the candidate set and the corpus
    // total, and the total rides along in the candidate broadcast (the
    // sketch emits distinct tokens, so the inner join is the semi-join)
    // — the corpus is scanned exactly twice, sketch + exact-count,
    // independent of what else the suite has cached.
    val cands = t.agg(expr("graft_heavy_hitters(tok, 64)").as("cs"),
        count(lit(1)).as("total"))
      .select(explode(col("cs")).as("cand"), col("total"))
    t.join(broadcast(cands), col("tok") === col("cand"))
      .groupBy("tok")
      .agg(count(lit(1)).as("cnt"), min("total").as("total"))
      .filter(col("cnt") * 32 >= col("total"))
      .select(col("tok"), col("cnt"))
      .orderBy(desc("cnt"), asc("tok"))
  }

  private val taHeavyHittersSql =
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |SELECT tok, COUNT(*) AS cnt FROM t GROUP BY tok
      |HAVING COUNT(*) * 32 >= (SELECT COUNT(*) FROM t)
      |ORDER BY cnt DESC, tok ASC""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_heavy_hitters" -> (taHeavyHitters(_, _)),
    "ta_tokens" -> (taTokens(_, _)),
    "ta_quality" -> (taQuality(_, _)),
    "ta_langid" -> (taLangid(_, _)),
    "ta_fingerprint" -> (taFingerprint(_, _)))

  def oracles: Map[String, String] = Map(
    "ta_heavy_hitters" -> taHeavyHittersSql,
    "ta_tokens" -> taTokensSql,
    "ta_quality" -> taQualitySql,
    "ta_langid" -> taLangidSql,
    "ta_fingerprint" -> taFingerprintSql)
}
