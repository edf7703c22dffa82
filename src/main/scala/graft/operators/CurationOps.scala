package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Corpus-curation operators — the published filter/fingerprint passes
  * an LLM training-data pipeline runs between raw crawl and tokenizer:
  *
  *  - `ta_gopher_rules`: the Gopher-paper document quality rules
  *    (word count bounds, mean word length bounds, alphabetic-word
  *    fraction, minimum stopword hits) as one narrow projection per
  *    document. All-integer counting plus two identically-written
  *    divisions, so the oracle is exact.
  *  - `ta_readability`: Flesch reading-ease + Flesch-Kincaid grade from
  *    vowel-group syllable counting (the standard heuristic). Counts
  *    are exact integers; the two score polynomials are written with
  *    identical association on both engines and rounded at 1e-6
  *    (NOTES #3).
  *  - `ta_nb_langid`: multinomial Naive-Bayes language ID trained
  *    in-plan on the labeled corpus (Laplace-smoothed char-trigram
  *    likelihoods, doc-frequency priors) and self-scored into a
  *    confusion matrix. Per-(feature, lang) log-likelihoods are
  *    quantized at 2^30 BEFORE the per-document sum (ta_ngram_lm
  *    precedent) so the argmax is order-independent and engine-exact.
  *  - `dd_winnowing`: MOSS-style winnowing fingerprints (Schleimer/
  *    Wilkerson/Aiken): k-gram rolling hashes, minimum per sliding
  *    window of w, distinct selected hashes as the document signature,
  *    boilerplate fingerprints (doc-frequency > MaxDf) dropped, pairs
  *    scored by containment |A∩B|/min(|A|,|B|). On this corpus the
  *    0.5 threshold recovers exactly the 25 known near-dup pairs.
  *  - `q_hll_distinct`: HyperLogLog distinct-count with m=64 registers
  *    built from the portable 60-bit hash — bucket = h mod 64, rho =
  *    leading-zero rank of the remaining 54 bits via an exact
  *    power-of-two join (no floating log2). The register sum Σ2^-M is
  *    quantized at 2^50 so it is order-independent; the small-range
  *    linear-counting correction is applied per the published
  *    algorithm. Everything up to the final two divisions is integer.
  *
  * Scale notes: gopher/readability are stateless projections (no
  * shuffle at all); NB training is one vocabulary-sized aggregate and
  * scoring joins per-doc WORD COUNTS (not token occurrences) against a
  * broadcast |vocab|×|langs| model; winnowing shuffles only selected
  * fingerprints (~n/w per doc) and the MaxDf pass is the same
  * stop-fingerprint guard production MOSS uses; HLL is the textbook
  * mergeable sketch — 64 longs per partition, map-side combined.
  *
  * Reference scope: the reference (HSLdevcom/hfp-loader) has no text
  * operators at all (SURVEY.md §2 "operators the reference does NOT
  * have") — these are north-star extensions per SURVEY.md §7 phase 3.
  */
object CurationOps {

  // ---------------------------------------------------------------- gopher

  /** Stopword set adapted to the synthetic corpus vocabulary (the
    * Gopher paper's rule is "≥ 2 hits from a small stopword list"; the
    * list itself is corpus/language-specific).
    */
  private val Stopwords = Seq("the", "a", "to", "of", "and")
  private val MinWords = 10
  private val MaxWords = 1000
  private val MinMeanWordLen = 2.0
  private val MaxMeanWordLen = 12.0
  private val MinAlphaFrac = 0.8
  private val MinStopHits = 2

  def taGopherRules(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("t"))
    val nWords = size(col("t")).cast(LongType)
    val nAlpha = expr("size(filter(t, w -> w rlike '^[a-z]+$'))").cast(LongType)
    val stopHits = Stopwords.map(w =>
      when(array_contains(col("t"), w), 1).otherwise(0).cast(LongType))
      .reduce(_ + _)
    d.select(
      col("doc_id"),
      nWords.as("n_words"),
      round(length(regexp_replace(col("text"), " ", ""))
        .cast(DoubleType) / nWords, 6).as("mean_word_len"),
      round(nAlpha.cast(DoubleType) / nWords, 6).as("alpha_frac"),
      stopHits.as("stop_hits"))
      .withColumn("keep",
        col("n_words").between(MinWords, MaxWords) &&
          col("mean_word_len").between(MinMeanWordLen, MaxMeanWordLen) &&
          col("alpha_frac") >= MinAlphaFrac &&
          col("stop_hits") >= MinStopHits)
      .orderBy("doc_id")
  }

  private val taGopherRulesSql = {
    val hits = Stopwords
      .map(w => s"CASE WHEN list_contains(t, '$w') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(t) AS BIGINT) AS n_words,
       |    round(CAST(len(replace(text, ' ', '')) AS DOUBLE) / CAST(len(t) AS BIGINT), 6) AS mean_word_len,
       |    round(CAST(len(list_filter(t, w -> regexp_matches(w, '^[a-z]+$$'))) AS DOUBLE) / CAST(len(t) AS BIGINT), 6) AS alpha_frac,
       |    CAST($hits AS BIGINT) AS stop_hits
       |  FROM d)
       |SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
       |  (n_words BETWEEN $MinWords AND $MaxWords
       |   AND mean_word_len BETWEEN $MinMeanWordLen AND $MaxMeanWordLen
       |   AND alpha_frac >= $MinAlphaFrac
       |   AND stop_hits >= $MinStopHits) AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------------- readability

  def taReadability(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val words = size(split(col("text"), " ")).cast(LongType)
    val sentences = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
      .cast(LongType)
    val syllables = regexp_count(col("text"), lit("[aeiouy]+")).cast(LongType)
    val wps = words.cast(DoubleType) / sentences
    val spw = syllables.cast(DoubleType) / words
    d.select(
      col("doc_id"),
      words.as("words"),
      sentences.as("sentences"),
      syllables.as("syllables"),
      round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6).as("flesch"),
      round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6).as("fk_grade"))
      .orderBy("doc_id")
  }

  private val taReadabilitySql =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
      |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS sentences,
      |    CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS syllables
      |  FROM documents)
      |SELECT doc_id, words, sentences, syllables,
      |  round(206.835 - 1.015 * (CAST(words AS DOUBLE) / sentences)
      |        - 84.6 * (CAST(syllables AS DOUBLE) / words), 6) AS flesch,
      |  round(0.39 * (CAST(words AS DOUBLE) / sentences)
      |        + 11.8 * (CAST(syllables AS DOUBLE) / words) - 15.59, 6) AS fk_grade
      |FROM m ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- nb langid

  private val NbQ = 1073741824L // 2^30 quantizer (NOTES #4b: |terms| ≪ 2^23)

  /** Language-count gate between the two NB scoring shapes (both
    * built, both A/B'd at sf0.1): at ≤ this many candidate languages
    * the ×|langs| fan-out of the per-doc fact relation wins (1.8 s vs
    * 3.5 s — the vector path's model-side pivot jobs dominate); beyond
    * it the fan-out's |facts|·|langs| rows dominate instead and the
    * pivoted score-vector path streams the fact relation ONCE — the
    * production-langid shape at 100+ languages. The 2^30 quantization
    * makes the two algebraically interchangeable (bit-identical
    * output); `NbLangidShapeSpec` pins that and the plan shapes.
    * Overridable via `spark.graft.langid.fanoutLangCap` for tests.
    */
  private val FanOutLangCap = 16

  def taNbLangid(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    // char-trigram features, not words: this corpus draws every lang
    // from one shared word vocabulary, so word-level NB has no signal —
    // trigrams cross word boundaries and pick up per-lang phrase habits
    // (same feature family as ta_langid_profile, and standard for
    // production langid models)
    // pre-aggregated (doc_id, lang, w, k): occurrence counts are Σk
    val toks = CorpusStats.trigrams(s, dir).withColumnRenamed("tg", "w")
    // model: per-(lang, word) counts, per-lang token totals, vocab size,
    // per-lang doc priors — all exact longs, broadcastable (|vocab|·|langs|)
    val wc = toks.groupBy("lang", "w").agg(sum("k").as("c"))
    val lc = wc.groupBy("lang").agg(sum("c").as("n_l"))
    val vocab = wc.select("w").distinct().agg(count(lit(1)).as("v"))
    val prior = docs.groupBy("lang").agg(count(lit(1)).as("nd"))
      .crossJoin(docs.agg(count(lit(1)).as("ntot")))
    val dw = toks.select("doc_id", "w", "k")
    val cap = s.conf.getOption("spark.graft.langid.fanoutLangCap")
      .map(_.toInt).getOrElse(FanOutLangCap)
    // the gate itself: one pruned single-column distinct-count —
    // trivial next to the model build either branch runs
    val nLangs = docs.select("lang").distinct().count()
    val pred =
      if (nLangs <= cap) nbFanOutPred(dw, wc, lc, vocab, prior)
      else nbScoreVectorPred(dw, wc, lc, vocab, prior)
    docs.select("doc_id", "lang").join(pred, "doc_id")
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  /** Fan-out scoring: per-doc WORD COUNTS × candidate langs,
    * left-joined against the model; the per-(w, lang) log-likelihood
    * is quantized before the k-weighted per-doc sum so the reduction
    * is order-independent. The winner at small language counts.
    */
  private def nbFanOutPred(dw: DataFrame, wc: DataFrame, lc: DataFrame,
      vocab: DataFrame, prior: DataFrame): DataFrame = {
    val langs = lc.select(col("lang").as("plang"), col("n_l"))
      .crossJoin(vocab)
    val ll = dw.crossJoin(broadcast(langs))
      .join(broadcast(wc.select(col("lang").as("plang"), col("w"), col("c"))),
        Seq("plang", "w"), "left")
      .select(col("doc_id"), col("plang"),
        (col("k") * floor(log((coalesce(col("c"), lit(0L)) + lit(1))
          .cast(DoubleType) / (col("n_l") + col("v"))) * NbQ)
          .cast(LongType)).as("tq"))
      .groupBy("doc_id", "plang").agg(sum("tq").as("sq"))
    val scored = ll.join(
      broadcast(prior.select(col("lang").as("plang"),
        floor(log(col("nd").cast(DoubleType) / col("ntot")) * NbQ)
          .cast(LongType).as("pq"))), "plang")
      .select(col("doc_id"), col("plang"), (col("sq") + col("pq")).as("score"))
    scored.groupBy("doc_id")
      .agg(min(struct((-col("score")).as("ns"), col("plang").as("plang"))).as("b"))
      .select(col("doc_id"), col("b.plang").as("predicted"))
  }

  /** Score-vector scoring — the 100+-language scale path: quantized
    * log-likelihoods are pivoted into one |langs|-wide model row per
    * trigram (misses filled with the per-lang smoothed-zero constant),
    * the fact relation streams ONCE through a broadcast-hash join, and
    * the per-doc reduction is |langs| map-side-combined sums instead of
    * a ×|langs| row fan-out. Per-lang totals/priors are collected to
    * the driver first — |langs| rows of model metadata, bounded at any
    * corpus scale (they are what a served langid model ships with).
    * Each per-slot double op (`(c+1)/(n_l+v)`, `log`, `*NbQ`, `floor`)
    * is written operand-for-operand as in [[nbFanOutPred]], so the
    * quantized longs — and therefore the argmin — are bit-identical.
    */
  private def nbScoreVectorPred(dw: DataFrame, wc: DataFrame, lc: DataFrame,
      vocab: DataFrame, prior: DataFrame): DataFrame = {
    // |langs| rows + one vocab scalar to the driver (NOT corpus data)
    val v = vocab.head().getLong(0)
    val stats = lc.join(prior, "lang").collect()
      .map { r =>
        val nl = r.getAs[Long]("n_l")
        val nd = r.getAs[Long]("nd")
        val ntot = r.getAs[Long]("ntot")
        (r.getAs[String]("lang"), nl + v,
          // same IEEE ops as the engine-side expressions: Math.log on
          // a double quotient, scaled and floored to a long
          math.floor(math.log(nd.toDouble / ntot) * NbQ).toLong)
      }.sortBy(_._1)
    // pivot: one row per trigram, one quantized-log slot per language;
    // max(when(...)) selects the unique (w, lang) cell, coalesce fills
    // model misses with the smoothed-zero constant floor(log(1/(n_l+v))·Q)
    val slots = stats.zipWithIndex.map { case ((lang, den, _), i) =>
      val zq = math.floor(math.log(1.0 / den) * NbQ).toLong
      coalesce(
        max(when(col("lang") === lang,
          floor(log((col("c") + lit(1L)).cast(DoubleType) / lit(den)) * NbQ)
            .cast(LongType))),
        lit(zq)).as(s"lq_$i")
    }
    val vec = wc.groupBy("w").agg(slots.head, slots.tail: _*)
    // ONE pass over the facts: broadcast-hash join on the trigram,
    // |langs| per-doc sums (inner join — every observed w has a model
    // row by construction; a doc-lang slot miss is already the zq fill)
    val sums = stats.indices.map(i =>
      sum(col("k") * col(s"lq_$i")).as(s"sq_$i"))
    val perDoc = dw.join(broadcast(vec), "w")
      .groupBy("doc_id").agg(sums.head, sums.tail: _*)
    // argmin over (−score, lang) structs — the same tiebreak as the
    // fan-out's min(struct(ns, plang))
    val cands = stats.zipWithIndex.map { case ((lang, _, pq), i) =>
      struct((-(col(s"sq_$i") + lit(pq))).as("ns"), lit(lang).as("plang"))
    }
    val best = if (cands.size == 1) cands.head else least(cands: _*)
    perDoc.select(col("doc_id"), best.getField("plang").as("predicted"))
  }

  private val taNbLangidSql =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, substr(text, CAST(i AS INTEGER), 3) AS w
       |  FROM (SELECT doc_id, lang, text,
       |          unnest(range(1, len(text) - 1)) AS i FROM documents)),
       |wc AS (SELECT lang, w, COUNT(*) AS c FROM toks GROUP BY lang, w),
       |lc AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l FROM wc GROUP BY lang),
       |vocab AS (SELECT COUNT(DISTINCT w) AS v FROM wc),
       |prior AS (
       |  SELECT lang, COUNT(*) AS nd, (SELECT COUNT(*) FROM documents) AS ntot
       |  FROM documents GROUP BY lang),
       |dw AS (SELECT doc_id, w, COUNT(*) AS k FROM toks GROUP BY doc_id, w),
       |ll AS (
       |  SELECT dw.doc_id, l.lang AS plang,
       |    CAST(SUM(dw.k * CAST(floor(ln(CAST(COALESCE(wc.c, 0) + 1 AS DOUBLE)
       |      / (l.n_l + v.v)) * $NbQ) AS BIGINT)) AS BIGINT) AS sq
       |  FROM dw CROSS JOIN lc l CROSS JOIN vocab v
       |  LEFT JOIN wc ON wc.lang = l.lang AND wc.w = dw.w
       |  GROUP BY dw.doc_id, l.lang),
       |scored AS (
       |  SELECT ll.doc_id, ll.plang,
       |    ll.sq + CAST(floor(ln(CAST(p.nd AS DOUBLE) / p.ntot) * $NbQ) AS BIGINT) AS score
       |  FROM ll JOIN prior p ON ll.plang = p.lang),
       |pred AS (
       |  SELECT doc_id, plang AS predicted FROM (
       |    SELECT doc_id, plang, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, plang ASC) AS rk FROM scored) WHERE rk = 1)
       |SELECT d.lang, pr.predicted, COUNT(*) AS n
       |FROM documents d JOIN pred pr ON d.doc_id = pr.doc_id
       |GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin

  // ------------------------------------------------------------ winnowing

  private val WinK = 10     // k-gram length (chars)
  private val WinW = 4      // winnowing window (grams)
  private val WinMaxDf = 64 // boilerplate fingerprint doc-frequency cap
  private val WinSim = 0.5  // containment threshold

  def ddWinnowing(s: SparkSession, dir: String): DataFrame = {
    // winnowing selection stays INSIDE the row: graft_winnow runs the
    // whole k-gram hash + deque window-min + distinct pass per document
    // in one codegen'd kernel, so the corpus-sized (doc, pos, hash)
    // relation — and the per-doc window SORT it would need — never
    // exists. Only the ~n/w selected fingerprints per document are
    // exploded and shuffled.
    // documents.parquet is one input split at test scale — repartition
    // the (tiny) raw text so the per-doc hashing kernel uses every core;
    // at 100 TB the scan's natural splits already provide this
    val fps = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        explode(expr(s"graft_winnow(text, $WinK, $WinW)")).as("fp"))
      // six downstream branches (df counts, sizes, both join sides) read
      // this ~n/w-per-doc table — cache it or the hashing kernel runs
      // once per branch
      .cache()
    val df = fps.groupBy("fp").agg(count(lit(1)).as("df")).cache()
    val good = df.where(col("df") <= WinMaxDf).select("fp")
    val f2 = fps.join(good, "fp")
    val sz = f2.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // the pair self-join only needs fingerprints at least TWO documents
    // share — df=1 rows (the overwhelming majority) can't produce an
    // a<b pair, so dropping them shrinks the join input by ~the corpus
    // while leaving `shared` counts (and sizes above) unchanged
    val shared2 = df.where(col("df") >= 2 && col("df") <= WinMaxDf).select("fp")
    // explicit join-key parallelism (ddSimhash rationale): the shared-
    // fingerprint relation is byte-small but the pair fan-out is the
    // query's CPU core — pin the self-join width instead of letting
    // AQE's byte-sizing under-partition it
    val fj = fps.join(shared2, "fp")
      .repartition(math.max(s.sparkContext.defaultParallelism,
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt), col("fp"))
    val a = fj.select(col("doc_id").as("a"), col("fp"))
    val b = fj.select(col("doc_id").as("b"), col("fp"))
    a.join(b, "fp").where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
      // no broadcast hint: sz is doc-sized (scales with the corpus) —
      // AQE broadcasts it while small and shuffles beyond the threshold
      .join(sz.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sz.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"), col("shared"),
        round(col("shared").cast(DoubleType) / least(col("na"), col("nb")), 6)
          .as("sim"))
      .where(col("sim") >= WinSim)
      .orderBy("a", "b")
  }

  private val ddWinnowingSql =
    s"""WITH grams AS (
       |  SELECT doc_id, i AS pos,
       |    ${PortableHash.sql(s"substr(text, CAST(i AS INTEGER), $WinK)")} % 1073741824 AS h
       |  FROM (SELECT doc_id, text,
       |          unnest(range(1, len(text) - ${WinK - 2})) AS i FROM documents)),
       |sel AS (
       |  SELECT doc_id, pos, min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN ${WinW - 1} PRECEDING AND CURRENT ROW) AS fp
       |  FROM grams),
       |fps AS (SELECT DISTINCT doc_id, fp FROM sel WHERE pos >= $WinW),
       |good AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= $WinMaxDf),
       |f2 AS (SELECT doc_id, fps.fp FROM fps JOIN good USING (fp)),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM f2 GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS shared
       |  FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT p.a, p.b, p.shared,
       |    round(CAST(p.shared AS DOUBLE) / least(sa.n, sb.n), 6) AS sim
       |  FROM pairs p JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id)
       |SELECT a, b, shared, sim FROM scored
       |WHERE sim >= $WinSim ORDER BY a, b""".stripMargin

  // ------------------------------------------------------------------ hll

  private val HllM = 64      // registers (b = 6 bits)
  private val HllAlpha = 0.709
  private val HllWBits = 54  // 60-bit hash minus 6 bucket bits
  private val HllZQ = 1125899906842624L // 2^50 register-sum quantizer

  def qHllDistinct(s: SparkSession, dir: String): DataFrame = {
    val vals = Tables(s, dir, "events")
      .where(col("user_id").isNotNull)
      .select(PortableHash.hash64(col("user_id").cast(StringType)).as("h"))
      .distinct()
      // h is 60-bit positive: bucket = low 6 bits, w = high 54 via an
      // exact shift (double division would round above 2^53)
      .select((col("h") % HllM).as("bucket"), shiftright(col("h"), 6).as("w"))
    // rho = leading-zero rank of the 54-bit remainder, via an exact
    // power-of-two join (floating log2 would be off-by-one near powers)
    val powers = s.range(0, HllWBits).select(col("id").as("p"),
      pow(lit(2.0), col("id")).cast(LongType).as("pv"))
    val rho = vals.join(broadcast(powers), col("pv") <= col("w"), "left")
      .groupBy("bucket", "w")
      .agg(when(col("w") === 0, HllWBits + 1)
        .otherwise(lit(HllWBits) - max("p")).cast(LongType).as("rho"))
    val regs = rho.groupBy("bucket").agg(max("rho").as("m"))
    regs.agg(
      count(lit(1)).as("nonempty"),
      sum(when(col("m") <= 50, pow(lit(2.0), lit(50) - col("m")).cast(LongType))
        .otherwise(0L)).as("zq"))
      .select(col("nonempty"),
        (lit(HllM) - col("nonempty")).as("zeros"),
        round(lit(HllAlpha * HllM * HllM) /
          ((col("zq") + (lit(HllM.toLong) - col("nonempty")) * HllZQ)
            .cast(DoubleType) / HllZQ), 6).as("est_raw"))
      .select(col("nonempty"), col("zeros"), col("est_raw"),
        when(col("est_raw") <= lit(2.5 * HllM) && col("zeros") > 0,
          round(lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros")), 6))
          .otherwise(col("est_raw")).as("estimate"))
  }

  private val qHllDistinctSql =
    s"""WITH vals AS (
       |  SELECT DISTINCT ${PortableHash.sql("CAST(user_id AS STRING)")} AS h
       |  FROM events WHERE user_id IS NOT NULL),
       |parts AS (SELECT h % $HllM AS bucket, divide(h, $HllM) AS w FROM vals),
       |rho AS (
       |  SELECT bucket, w,
       |    CAST(CASE WHEN w = 0 THEN ${HllWBits + 1}
       |         ELSE $HllWBits - max(p) END AS BIGINT) AS rho
       |  FROM parts LEFT JOIN range(0, $HllWBits) t(p)
       |    ON CAST(pow(2, p) AS BIGINT) <= w
       |  GROUP BY bucket, w),
       |regs AS (SELECT bucket, max(rho) AS m FROM rho GROUP BY bucket),
       |agg AS (
       |  SELECT COUNT(*) AS nonempty, $HllM - COUNT(*) AS zeros,
       |    round(${HllAlpha * HllM * HllM} /
       |      (CAST(SUM(CASE WHEN m <= 50 THEN CAST(pow(2, 50 - m) AS BIGINT)
       |                     ELSE 0 END) + ($HllM - COUNT(*)) * $HllZQ AS DOUBLE)
       |       / $HllZQ), 6) AS est_raw
       |  FROM regs)
       |SELECT nonempty, zeros, est_raw,
       |  CASE WHEN est_raw <= ${2.5 * HllM} AND zeros > 0
       |       THEN round($HllM.0 * ln($HllM.0 / zeros), 6)
       |       ELSE est_raw END AS estimate
       |FROM agg""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_gopher_rules" -> (taGopherRules(_, _)),
    "ta_readability" -> (taReadability(_, _)),
    "ta_nb_langid" -> (taNbLangid(_, _)),
    "dd_winnowing" -> (ddWinnowing(_, _)),
    "q_hll_distinct" -> (qHllDistinct(_, _)))

  def oracles: Map[String, String] = Map(
    "ta_gopher_rules" -> taGopherRulesSql,
    "ta_readability" -> taReadabilitySql,
    "ta_nb_langid" -> taNbLangidSql,
    "dd_winnowing" -> ddWinnowingSql,
    "q_hll_distinct" -> qHllDistinctSql)
}
