package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Round-6 curation additions: Broder-style super-shingle dedup (the
  * band-bucketed winnowing variant NOTES flagged as the next bound on
  * candidate fan-out) and CCNet-style perplexity bucketing (the
  * head/middle/tail quality split a pretraining mix is sampled from).
  */
object CurationOps3 {

  // ---------------------------------------------------- dd_supershingle

  private val SsK = 10       // k-gram length (chars) — matches dd_winnowing
  private val SsW = 4        // winnowing window (grams)
  private val SsBands = 8    // super-shingle bands (fp % SsBands)
  private val SsBandMaxDf = 64 // identical-band doc-frequency cap
  private val SsSim = 0.5    // containment threshold for the verify pass

  /** Super-shingle near-dup candidates (Broder, SEQUENCES'97 "On the
    * resemblance and containment of documents"; the "fingerprints of
    * fingerprints" construction): each document's winnowing
    * fingerprints are split into [[SsBands]] bands by `fp % bands`,
    * each band is collapsed to ONE order-independent signature
    * (count, sum, bit_xor), and candidate pairs are documents sharing
    * at least one identical band signature. Versus `dd_winnowing`'s
    * shared-fingerprint join, the join key here is band-sized (≤ 8
    * rows/doc instead of ~n/w fingerprints/doc), so at 100 TB the
    * pair stage's input shrinks by ~the fingerprint count and hot
    * boilerplate bands are df-capped ([[SsBandMaxDf]]) the same way
    * minhash band buckets are. The tradeoff is recall: an edit that
    * touches a band kills that band's match (only fully-identical
    * band content pairs), which is the documented super-shingle
    * semantics — high-precision candidates for heavily-duplicated
    * corpora, verified here by the exact containment score over the
    * full fingerprint sets.
    */
  def ddSupershingle(s: SparkSession, dir: String): DataFrame = {
    // same in-row winnowing kernel as dd_winnowing: the corpus-sized
    // (doc, pos, hash) relation never exists (graft_winnow scaladoc)
    val fps = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        explode(expr(s"graft_winnow(text, $SsK, $SsW)")).as("fp"))
      .cache() // band build + both verify sides + sizes re-read it
    val bands = fps
      .groupBy(col("doc_id"), (col("fp") % SsBands).as("band"))
      .agg(count(lit(1)).as("cnt"), sum("fp").as("bs"),
        expr("bit_xor(fp)").as("bx"))
    // identical-band doc frequency: df=1 bands can't pair (winnowing's
    // NOTES #25 pruning), df>cap bands are boilerplate fan-out bombs
    val sigDf = bands.groupBy("band", "cnt", "bs", "bx")
      .agg(count(lit(1)).as("bdf"))
    val goodSig = sigDf.where(col("bdf") >= 2 && col("bdf") <= SsBandMaxDf)
      .select("band", "cnt", "bs", "bx")
    val cb = bands.join(goodSig, Seq("band", "cnt", "bs", "bx"))
    val pairs = cb.select(col("doc_id").as("a"), col("band"), col("cnt"), col("bs"), col("bx"))
      .join(cb.select(col("doc_id").as("b"), col("band"), col("cnt"), col("bs"), col("bx")),
        Seq("band", "cnt", "bs", "bx"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_bands"))
      // pair-sized and read three times (verify a-side, b-side
      // restriction, final assembly) — without the cache each reader
      // re-runs the whole band+self-join pipeline
      .cache()
    // verify: exact containment over the FULL fingerprint sets, but
    // only for candidate pairs — fps is streamed against the (small)
    // pair list, never self-joined
    val sz = fps.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // restrict BOTH verify sides to candidate docs before the fp join:
    // without the b-side semi-join the (b, fp) equi-join shuffles the
    // whole corpus-sized fingerprint relation per invocation (profiled
    // at ~2.2 s steady vs ~1.2 s with it); candidate doc lists are
    // pair-sized, so AQE broadcasts them
    val fpsB = fps.join(pairs.select(col("b").as("doc_id")).distinct(), Seq("doc_id"))
    val shared = fps.withColumnRenamed("doc_id", "a")
      .join(pairs.select("a", "b"), Seq("a"))
      .join(fpsB.select(col("doc_id").as("b"), col("fp")), Seq("b", "fp"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
    pairs.join(shared, Seq("a", "b"))
      .join(sz.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sz.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"), col("n_bands"), col("shared"),
        round(col("shared").cast(DoubleType) / least(col("na"), col("nb")), 6)
          .as("sim"))
      .where(col("sim") >= SsSim)
      .orderBy("a", "b")
  }

  private val ddSupershingleSql =
    s"""WITH grams AS (
       |  SELECT doc_id, i AS pos,
       |    ${PortableHash.sql(s"substr(text, CAST(i AS INTEGER), $SsK)")} % 1073741824 AS h
       |  FROM (SELECT doc_id, text,
       |          unnest(range(1, len(text) - ${SsK - 2})) AS i FROM documents)),
       |sel AS (
       |  SELECT doc_id, pos, min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN ${SsW - 1} PRECEDING AND CURRENT ROW) AS fp
       |  FROM grams),
       |fps AS (SELECT DISTINCT doc_id, fp FROM sel WHERE pos >= $SsW),
       |bands AS (
       |  SELECT doc_id, fp % $SsBands AS band, COUNT(*) AS cnt,
       |    CAST(SUM(fp) AS BIGINT) AS bs, bit_xor(fp) AS bx
       |  FROM fps GROUP BY 1, 2),
       |goodsig AS (
       |  SELECT band, cnt, bs, bx FROM bands
       |  GROUP BY 1, 2, 3, 4 HAVING COUNT(*) BETWEEN 2 AND $SsBandMaxDf),
       |cb AS (SELECT b.* FROM bands b JOIN goodsig g
       |       USING (band, cnt, bs, bx)),
       |pairs AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_bands
       |  FROM cb x JOIN cb y ON x.band = y.band AND x.cnt = y.cnt
       |    AND x.bs = y.bs AND x.bx = y.bx AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM fps GROUP BY doc_id),
       |shared AS (
       |  SELECT p.a, p.b, COUNT(*) AS shared
       |  FROM pairs p JOIN fps fa ON fa.doc_id = p.a
       |  JOIN fps fb ON fb.doc_id = p.b AND fb.fp = fa.fp
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT p.a, p.b, p.n_bands, sh.shared,
       |    round(CAST(sh.shared AS DOUBLE) / least(sa.n, sb.n), 6) AS sim
       |  FROM pairs p JOIN shared sh ON p.a = sh.a AND p.b = sh.b
       |  JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id)
       |SELECT a, b, n_bands, shared, sim FROM scored
       |WHERE sim >= $SsSim ORDER BY a, b""".stripMargin

  // ---------------------------------------------- ta_perplexity_bucket

  private val PplQ = 1073741824L // 2^30 logp quantizer (ta_ngram_lm's)

  /** CCNet-style perplexity bucketing (Wenzek et al., LREC'20): score
    * every document by the corpus's own add-one-smoothed bigram LM
    * (ta_ngram_lm's exact-quantized score), then split the corpus
    * into head/middle/tail thirds — the quality strata a pretraining
    * mix samples from at different rates. The thresholds are computed
    * on the VALUE level: a histogram of distinct quantized scores
    * (value-sized, not corpus-sized) gets one descending cumulative
    * window, and each document joins its bucket back by score — so
    * the only single-partition window runs over |distinct scores|
    * rows, the 100 TB-safe shape for a global quantile split. Ties
    * share a bucket by construction (CCNet's threshold-comparison
    * semantics), and the integer average (floor division of the
    * quantized sum) keeps both engines bit-identical.
    */
  def taPerplexityBucket(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val toks = split(col("text"), " ")
    val n = size(toks)
    val idx = sequence(lit(1), n - 1)
    val bgArr = when(n < 2, array().cast(ArrayType(StructType(Seq(
        StructField("w1", StringType), StructField("w2", StringType))))))
      .otherwise(transform(idx, i => struct(
        element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2"))))
    // distinct-bigram pre-aggregation with multiplicity k — the
    // ta_ngram_lm shape: the model build and the probe side both read
    // a distinct-bigram-sized relation
    val bgd = docs.select(col("doc_id"), explode(bgArr).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("k"))
      .cache()
    val unic = docs.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val vocab = unic.agg(count(lit(1)).as("v"))
    val bgc = bgd.groupBy(col("w1").as("b1"), col("w2").as("b2"))
      .agg(sum("k").as("cb"))
    val perDoc = bgd.join(bgc, col("w1") === col("b1") && col("w2") === col("b2"))
      .join(unic, col("w1") === col("w"))
      .join(broadcast(vocab))
      .withColumn("logp", round(log((col("cb") + 1.0) / (col("cw") + col("v"))), 6))
      .groupBy("doc_id")
      .agg(sum(col("k") * floor(col("logp") * PplQ.toDouble).cast(LongType)).as("sumq"),
        sum("k").as("nb"))
      // integer average: floor division via the sign-safe mod formula,
      // exact in both engines (NOTES #29's fdiv pattern)
      .selectExpr("doc_id",
        "(sumq - ((sumq % nb + nb) % nb)) DIV nb AS avg_q")
      // r16 (guide §2.4): referenced 3× below (histogram, total, final
      // join) — the bgd⋈bgc⋈unic join chain re-executed per reference
      // (19 parquet scans / 65 exchanges in the before-plan). The frame
      // is (doc_id, avg_q) — doc-count-sized, two longs — so one eager
      // localCheckpoint collapses the plan to one model-build pass
      // (after-plan: 0 repeated scans).
      .localCheckpoint()
    val hist = perDoc.groupBy("avg_q").agg(count(lit(1)).as("c"))
    // the one global window — over DISTINCT score values only
    val cum = hist.withColumn("cum",
      sum("c").over(Window.orderBy(col("avg_q").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = perDoc.agg(count(lit(1)).as("nd"))
    perDoc.join(cum.select("avg_q", "cum"), Seq("avg_q"))
      .crossJoin(broadcast(tot))
      .selectExpr("doc_id", "avg_q",
        s"""CASE WHEN cum <= (nd + 2) DIV 3 THEN 'head'
           |     WHEN cum <= (2 * nd + 2) DIV 3 THEN 'middle'
           |     ELSE 'tail' END AS bucket""".stripMargin.replace("\n", " "))
      .orderBy("doc_id")
  }

  private val taPerplexityBucketSql =
    s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
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
       |  CROSS JOIN vocab),
       |ds AS (
       |  SELECT doc_id,
       |    CAST(SUM(CAST(floor(logp * $PplQ.0) AS BIGINT)) AS BIGINT) AS sumq,
       |    COUNT(*) AS nb
       |  FROM scored GROUP BY doc_id),
       |av AS (SELECT doc_id,
       |         divide(sumq - ((sumq % nb + nb) % nb), nb) AS avg_q FROM ds),
       |hist AS (SELECT avg_q, COUNT(*) AS c FROM av GROUP BY avg_q),
       |cum AS (SELECT avg_q,
       |          CAST(SUM(c) OVER (ORDER BY avg_q DESC) AS BIGINT) AS cum
       |        FROM hist),
       |tot AS (SELECT COUNT(*) AS nd FROM av)
       |SELECT a.doc_id, a.avg_q,
       |  CASE WHEN cum <= divide(nd + 2, 3) THEN 'head'
       |       WHEN cum <= divide(2 * nd + 2, 3) THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM av a JOIN cum USING (avg_q) CROSS JOIN tot
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ ta_tfidf_cosine

  private val TcQ = 1024L      // 2^10 fixed-point weight scale
  private val TcDfMin = 2      // df=1 terms can't pair (NOTES #25)
  private val TcDfCap = 64     // stopword/boilerplate df cap
  private val TcSim = 0.3      // cosine threshold

  /** Sparse tf-idf cosine similarity join via the inverted index — the
    * document-at-a-time sparse dot product IR engines run, and the
    * third classic near-dup signal next to shingle Jaccard and dense
    * embedding cosine. Features are word TRIGRAMS (phrase-level
    * n-gram tf-idf — unigrams saturate on a small closed vocabulary:
    * every unigram's df grows with the corpus until the window is
    * empty, where trigram df stays Zipf-bounded), and the vocabulary
    * is df-windowed to the [[TcDfMin]]..[[TcDfCap]] band (df=1 terms
    * cannot produce a pair; df>cap terms are boilerplate phrases
    * whose postings would fan out quadratically), which REDEFINES the
    * similarity space CCNet-style: weights, norms and dots all live
    * in the windowed vocabulary. Per-term partial products are exact
    * integers (weights quantized at 2^10), so the order-free groupBy
    * sums are engine-exact; the final score does the only float math
    * (two sqrt, two divides — identical single IEEE ops in the
    * oracle). At 100 TB the term postings partition the pair work
    * (the DAAT shape) and the df cap bounds every posting list's
    * fan-out.
    */
  def taTfidfCosine(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val toks = split(col("text"), " ")
    val n3 = size(toks)
    val terms = when(n3 < 3, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(1), n3 - 2), i => concat_ws(" ",
        element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
    val tf = docs.select(col("doc_id"), explode(terms).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .cache() // df build + weight build read it
    val n = docs.agg(count(lit(1)).as("n"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .where(col("df") >= TcDfMin && col("df") <= TcDfCap)
    val w = tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        floor(col("tf").cast(DoubleType) *
          round(log(col("n").cast(DoubleType) / col("df")), 6) * TcQ.toDouble)
          .cast(LongType).as("wq"))
      .cache() // norm side + both pair sides read it
    val nrm = w.groupBy("doc_id").agg(sum(col("wq") * col("wq")).as("nq"))
    // pin join-key parallelism: the df-capped postings are byte-small
    // but the pair fan-out is the CPU core (ddWinnowing rationale)
    val wj = w.repartition(math.max(s.sparkContext.defaultParallelism,
      s.conf.get("spark.sql.shuffle.partitions", "32").toInt), col("term"))
    val dot = wj.select(col("doc_id").as("a"), col("term"), col("wq").as("wa"))
      .join(wj.select(col("doc_id").as("b"), col("term"), col("wq").as("wb")), "term")
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(sum(col("wa") * col("wb")).as("dot"))
    dot.join(nrm.select(col("doc_id").as("a"), col("nq").as("na")), "a")
      .join(nrm.select(col("doc_id").as("b"), col("nq").as("nb")), "b")
      .select(col("a"), col("b"),
        round(col("dot").cast(DoubleType) /
          sqrt(col("na").cast(DoubleType)) / sqrt(col("nb").cast(DoubleType)), 6)
          .as("cosine"))
      .where(col("cosine") >= TcSim)
      .orderBy("a", "b")
  }

  private val taTfidfCosineSql =
    s"""WITH tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf
       |  FROM (SELECT doc_id,
       |          list_extract(toks, i) || ' ' || list_extract(toks, i+1) || ' ' || list_extract(toks, i+2) AS term
       |        FROM (SELECT doc_id, string_split(text, ' ') AS toks,
       |                unnest(range(1, len(string_split(text, ' ')) - 1)) AS i
       |              FROM documents))
       |  GROUP BY 1, 2),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term
       |       HAVING COUNT(*) BETWEEN $TcDfMin AND $TcDfCap),
       |w AS (
       |  SELECT tf.doc_id, tf.term,
       |    CAST(floor(CAST(tf.tf AS DOUBLE) *
       |      round(ln(CAST(n.n AS DOUBLE) / df.df), 6) * $TcQ.0) AS BIGINT) AS wq
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |nrm AS (SELECT doc_id, CAST(SUM(wq * wq) AS BIGINT) AS nq
       |        FROM w GROUP BY doc_id),
       |dots AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b,
       |    CAST(SUM(x.wq * y.wq) AS BIGINT) AS dot
       |  FROM w x JOIN w y ON x.term = y.term AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.a, d.b,
       |    round(CAST(d.dot AS DOUBLE) / sqrt(CAST(na.nq AS DOUBLE))
       |      / sqrt(CAST(nb.nq AS DOUBLE)), 6) AS cosine
       |  FROM dots d JOIN nrm na ON d.a = na.doc_id
       |  JOIN nrm nb ON d.b = nb.doc_id)
       |SELECT a, b, cosine FROM scored
       |WHERE cosine >= $TcSim ORDER BY a, b""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_supershingle" -> (ddSupershingle(_, _)),
    "ta_perplexity_bucket" -> (taPerplexityBucket(_, _)),
    "ta_tfidf_cosine" -> (taTfidfCosine(_, _)))

  def oracles: Map[String, String] = Map(
    "dd_supershingle" -> ddSupershingleSql,
    "ta_perplexity_bucket" -> taPerplexityBucketSql,
    "ta_tfidf_cosine" -> taTfidfCosineSql)
}
