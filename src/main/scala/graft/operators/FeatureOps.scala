package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Feature-engineering and release-audit operators — the last-mile ops
  * between a curated corpus and a training run: re-identification risk
  * (k-anonymity / l-diversity), leakage-safe categorical encoding
  * (smoothed target encoding), deterministic per-stratum sampling
  * (hash reservoirs), and hybrid retrieval fusion (lexical ∪ tf-idf
  * rankings under reciprocal-rank fusion). Exactness: integer counts
  * everywhere; doubles only in final single divisions or through the
  * fixed-point `floor(round(x,6)·10⁶)` recipe (NOTES technique 3).
  */
object FeatureOps {

  // ------------------------------------------------------ q_k_anonymity

  private val KAnonK = 10

  /** k-anonymity / l-diversity audit over the order ledger: each
    * quasi-identifier class (priority, status, order year) reports its
    * population n, its sensitive-attribute diversity l (distinct
    * customers), and whether it meets the k = [[KAnonK]] release bar.
    * One map-side-combinable aggregate over the corpus; the class
    * grid is bounded by the QI value domains (5·3·#years), never the
    * row count.
    */
  def qKAnonymity(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        col("o_orderstatus").as("status"),
        year(col("o_orderdate").cast(DateType)).cast(LongType).as("yr"))
      .agg(count(lit(1)).as("n"),
        countDistinct("o_custkey").as("l_div"))
      .withColumn("k_anonymous", col("n") >= KAnonK)
      .orderBy("priority", "status", "yr")

  private val qKAnonymitySql =
    s"""SELECT o_orderpriority AS priority, o_orderstatus AS status,
       |  CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
       |  COUNT(*) AS n,
       |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS l_div,
       |  COUNT(*) >= $KAnonK AS k_anonymous
       |FROM orders GROUP BY 1, 2, 3 ORDER BY priority, status, yr""".stripMargin

  // ---------------------------------------------------- q_target_encode

  private val TeSmooth = 20

  /** Smoothed mean-target encoding of the document source against the
    * "is English" label: enc = (n⁺ + m·prior) / (n + m) with
    * m = [[TeSmooth]] — the standard leakage-damped categorical
    * encoder (raw per-category means overfit rare categories; the
    * prior pulls them back). Integer counts per category + one global
    * prior division + one encoding division per category — the whole
    * query is two aggregates, the second over the category domain.
    */
  def qTargetEncode(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("source"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val prior = d.agg(sum("y").as("gp"), count(lit(1)).as("gn"))
      .select((col("gp").cast(DoubleType) / col("gn").cast(DoubleType)).as("prior"))
    d.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"))
      .crossJoin(broadcast(prior))
      .select(col("source"), col("n"), col("n_pos"),
        round((col("n_pos").cast(DoubleType) + lit(TeSmooth) * col("prior")) /
          (col("n").cast(DoubleType) + TeSmooth), 6).as("enc"))
      .orderBy("source")
  }

  private val qTargetEncodeSql =
    s"""WITH d AS (SELECT source,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
       |p AS (SELECT CAST(SUM(y) AS DOUBLE) / COUNT(*) AS prior FROM d)
       |SELECT source, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
       |  round((CAST(SUM(y) AS BIGINT) + $TeSmooth * MIN(p.prior))
       |    / (COUNT(*) + $TeSmooth), 6) AS enc
       |FROM d CROSS JOIN p GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------- q_reservoir_sample

  private val RsK = 5
  private val RsMod = 1099511627776L // 2^40: hash ranks stay double-exact

  /** Deterministic per-stratum reservoir: the [[RsK]] documents with
    * the smallest 40-bit portable hash rank per language — the
    * reproducible "random" sample every eval/debug pipeline wants
    * (same corpus ⇒ same sample, across engines and reruns). The
    * selection runs in the bounded-heap GroupedTopK operator: one
    * exchange on the stratum, O(n log k) scan, no per-stratum sort.
    * The 2^40 modulus keeps ranks exact through the heap's double
    * compare (NOTES #4b).
    */
  def qReservoirSample(s: SparkSession, dir: String): DataFrame = {
    val h = PortableHash.hash64(concat(lit("rs:"), col("doc_id").cast(StringType)))
    val ranked = Tables(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        (((h % RsMod) + RsMod) % RsMod).as("h40"))
    graft.plans.GroupedTopK(ranked, s,
        Seq(col("lang")), -col("h40"), col("doc_id"), RsK)
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(asc("h40"), asc("doc_id"))).cast(LongType))
      .select("lang", "rk", "doc_id", "h40")
      .orderBy("lang", "rk")
  }

  private val qReservoirSampleSql = {
    val h = PortableHash.sql("'rs:' || CAST(doc_id AS STRING)")
    s"""WITH r AS (
       |  SELECT lang, doc_id, (($h % $RsMod) + $RsMod) % $RsMod AS h40
       |  FROM documents)
       |SELECT lang, rk, doc_id, h40 FROM (
       |  SELECT lang,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h40, doc_id) AS BIGINT) AS rk,
       |    doc_id, h40
       |  FROM r) ranked
       |WHERE rk <= $RsK
       |ORDER BY lang, rk""".stripMargin
  }

  // ----------------------------------------------------- q_hybrid_rrf

  private val RrfSeed = 7L   // query-by-example seed document
  private val RrfC = 60      // the standard RRF dampening constant
  private val RrfTopN = 10   // per-list depth
  private val RrfQ = 1000000L
  private val HDfMin = 2     // idf postings band (df=1 terms are noise,
  private val HDfCap = 128   //  df>cap terms are boilerplate — DedupOps' band)

  /** Hybrid "related documents" retrieval for a seed document: a
    * LEXICAL ranking (multiset token overlap Σ min(tf_d, tf_seed) —
    * pure integers) and a TF-IDF COSINE ranking (df-banded idf
    * weights, fixed-point; cosine ordering per the ta_tfidf_cosine
    * recipe), fused by reciprocal-rank fusion:
    * rrf(d) = Σ_lists 1/(C + rank_d). Each per-rank term is
    * quantized at 10⁻⁶ and integer-summed, so fusion is exact. Both
    * candidate passes join the corpus postings against the BROADCAST
    * seed postings — the corpus-sized side is touched once per list
    * and reduced map-side; ranks only ever index the two
    * [[RrfTopN]]-row lists.
    */
  def qHybridRrf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .cache() // seed postings + overlap pass + weight pass share it
    val seedTf = tf.where(col("doc_id") === RrfSeed)
      .select(col("tok"), col("tf").as("tf_s"))
    // list A: multiset token overlap with the seed
    val listA = tf.where(col("doc_id") =!= RrfSeed)
      .join(broadcast(seedTf), "tok")
      .groupBy("doc_id").agg(sum(least(col("tf"), col("tf_s"))).as("overlap"))
      .orderBy(desc("overlap"), asc("doc_id")).limit(RrfTopN)
      .withColumn("rank_a", row_number().over(
        Window.orderBy(desc("overlap"), asc("doc_id"))).cast(LongType))
      .select("doc_id", "rank_a")
    // list B: df-banded tf-idf cosine to the seed vector
    val n = docs.agg(count(lit(1)).as("n"))
    val dfp = tf.groupBy("tok").agg(count(lit(1)).as("dfc"))
      .where(col("dfc") >= HDfMin && col("dfc") <= HDfCap)
    val w = tf.join(dfp, "tok").crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"),
        floor(col("tf").cast(DoubleType) *
          round(log(col("n").cast(DoubleType) / col("dfc")), 6) * RrfQ.toDouble)
          .cast(LongType).as("wq"))
      .cache() // seed vector + corpus side + norms share it
    val seedW = w.where(col("doc_id") === RrfSeed)
      .select(col("tok"), col("wq").as("wq_s"))
    val nrm = w.groupBy("doc_id").agg(sum(col("wq") * col("wq")).as("nq"))
    val listB = w.where(col("doc_id") =!= RrfSeed)
      .join(broadcast(seedW), "tok")
      .groupBy("doc_id").agg(sum(col("wq") * col("wq_s")).as("dot"))
      .join(nrm, "doc_id")
      .select(col("doc_id"),
        round(col("dot").cast(DoubleType) / sqrt(col("nq").cast(DoubleType)), 6)
          .as("cos_s")) // seed norm is a shared positive factor — rank-neutral
      .where(col("cos_s") > 0)
      .orderBy(desc("cos_s"), asc("doc_id")).limit(RrfTopN)
      .withColumn("rank_b", row_number().over(
        Window.orderBy(desc("cos_s"), asc("doc_id"))).cast(LongType))
      .select("doc_id", "rank_b")
    // fusion: quantized reciprocal ranks, integer-summed
    def rq(r: org.apache.spark.sql.Column) = when(r.isNull, 0L).otherwise(
      floor(round(lit(1.0) / (lit(RrfC) + r.cast(DoubleType)), 6) * RrfQ + 0.5)
        .cast(LongType))
    listA.join(listB, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_a"), col("rank_b"),
        (rq(col("rank_a")) + rq(col("rank_b"))).as("rrf_q"))
      .orderBy(desc("rrf_q"), asc("doc_id")).limit(RrfTopN)
  }

  private val qHybridRrfSql = {
    def rq(r: String) =
      s"CASE WHEN $r IS NULL THEN 0 ELSE CAST(floor(round(1.0 / ($RrfC + $r), 6) * $RrfQ + 0.5) AS BIGINT) END"
    s"""WITH tf AS (
       |  SELECT doc_id, tok, COUNT(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY doc_id, tok),
       |seed AS (SELECT tok, tf AS tf_s FROM tf WHERE doc_id = $RrfSeed),
       |la AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY overlap DESC, doc_id ASC) AS BIGINT) AS rank_a
       |  FROM (
       |    SELECT tf.doc_id, CAST(SUM(LEAST(tf.tf, seed.tf_s)) AS BIGINT) AS overlap
       |    FROM tf JOIN seed USING (tok) WHERE tf.doc_id <> $RrfSeed
       |    GROUP BY tf.doc_id
       |    ORDER BY overlap DESC, doc_id ASC LIMIT $RrfTopN)),
       |nn AS (SELECT COUNT(*) AS n FROM documents),
       |dfp AS (SELECT tok, COUNT(*) AS dfc FROM tf GROUP BY tok
       |        HAVING COUNT(*) >= $HDfMin AND COUNT(*) <= $HDfCap),
       |w AS (
       |  SELECT tf.doc_id, tf.tok,
       |    CAST(floor(CAST(tf.tf AS DOUBLE)
       |      * round(ln(CAST(nn.n AS DOUBLE) / dfc), 6) * $RrfQ.0) AS BIGINT) AS wq
       |  FROM tf JOIN dfp USING (tok) CROSS JOIN nn),
       |sw AS (SELECT tok, wq AS wq_s FROM w WHERE doc_id = $RrfSeed),
       |nrm AS (SELECT doc_id, CAST(SUM(wq * wq) AS BIGINT) AS nq FROM w GROUP BY doc_id),
       |lb AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY cos_s DESC, doc_id ASC) AS BIGINT) AS rank_b
       |  FROM (
       |    SELECT d.doc_id,
       |      round(CAST(d.dot AS DOUBLE) / sqrt(CAST(nrm.nq AS DOUBLE)), 6) AS cos_s
       |    FROM (
       |      SELECT w.doc_id, CAST(SUM(w.wq * sw.wq_s) AS BIGINT) AS dot
       |      FROM w JOIN sw USING (tok) WHERE w.doc_id <> $RrfSeed
       |      GROUP BY w.doc_id) d
       |    JOIN nrm USING (doc_id)
       |    WHERE round(CAST(d.dot AS DOUBLE) / sqrt(CAST(nrm.nq AS DOUBLE)), 6) > 0
       |    ORDER BY cos_s DESC, doc_id ASC LIMIT $RrfTopN))
       |SELECT COALESCE(la.doc_id, lb.doc_id) AS doc_id, rank_a, rank_b,
       |  ${rq("rank_a")} + ${rq("rank_b")} AS rrf_q
       |FROM la FULL OUTER JOIN lb ON la.doc_id = lb.doc_id
       |ORDER BY rrf_q DESC, doc_id ASC LIMIT $RrfTopN""".stripMargin
  }

  // ------------------------------------------------------------ registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_k_anonymity" -> (qKAnonymity(_, _)),
    "q_target_encode" -> (qTargetEncode(_, _)),
    "q_reservoir_sample" -> (qReservoirSample(_, _)),
    "q_hybrid_rrf" -> (qHybridRrf(_, _)))

  def oracles: Map[String, String] = Map(
    "q_k_anonymity" -> qKAnonymitySql,
    "q_target_encode" -> qTargetEncodeSql,
    "q_reservoir_sample" -> qReservoirSampleSql,
    "q_hybrid_rrf" -> qHybridRrfSql)
}
