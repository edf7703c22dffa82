package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Second curation wave — two operators a web-scale pretraining
  * pipeline runs before anything else touches the corpus:
  *
  *  - `dd_url_dedup`: URL canonicalization dedup. Crawl frontiers carry
  *    the same page under host-case variants, trailing slashes,
  *    tracking parameters and fragments; canonicalize (lowercase host,
  *    strip `utm_*` params / fragments / trailing slash) and keep the
  *    lowest doc id per canonical URL. All string rewrites are narrow
  *    codegen'd expressions; the dedup is one hash aggregate on the
  *    canonical key — at 100 TB this is a map-side-combining shuffle of
  *    |distinct URLs| keys, the cheapest dedup tier there is (runs
  *    before any content hashing).
  *  - `ta_dsir`: DSIR-style importance weights (Xie et al. 2023,
  *    "Data Selection for Language Models via Importance Resampling"):
  *    score every raw document by how target-like its hashed-bigram
  *    distribution is, log w(x) = Σ_b k_b·(ln p_target[b] − ln p_raw[b]),
  *    with bigrams hashed into a FIXED feature space of [[DsirBuckets]]
  *    buckets. The feature table is O(B) = 1024 rows regardless of
  *    corpus size — it broadcasts at any scale, so scoring is one
  *    narrow pass + a map-side join; only the per-doc bucket pre-agg
  *    shuffles. Quantization: the per-bucket λ_b is a single ln rounded
  *    at 1e-6, per-doc sums quantize at 2^30 (the exact ta_ngram_lm
  *    machinery), so the DuckDB oracle matches bit-for-bit.
  *
  * URLs are synthesized deterministically from doc_id/source (the
  * documents table carries no URL column), identically in both engines.
  */
object CurationOps2 {

  // ---------------------------------------------------------------------
  // URL canonicalization dedup
  // ---------------------------------------------------------------------

  /** Synthesized crawl URL for a document — includes every variant the
    * canonicalizer must collapse: host case (doc_id%2), trailing slash
    * (%3), tracking params appended after any real param (%4), fragment
    * (%5). The path clusters docs in groups of 7, so real duplicate
    * clusters exist by construction.
    */
  private def synthUrl: Column = {
    val cluster = (col("doc_id") / 7).cast(LongType)
    // host derives from the CLUSTER (not the per-doc source) so real
    // duplicate clusters exist; the case variant is per-doc
    val hostName = concat(lit("site"), cluster % 10)
    val host = concat(
      when(col("doc_id") % 2 === 0, upper(hostName)).otherwise(hostName),
      lit(".Example.COM"))
    val path = concat(lit("/docs/"), cluster)
    val slash = when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit(""))
    val params = when(col("doc_id") % 4 === 0,
        concat(lit("?id="), cluster % 5, lit("&utm_source=feed")))
      .when(col("doc_id") % 4 === 1, lit("?utm_campaign=x"))
      .otherwise(lit(""))
    val frag = when(col("doc_id") % 5 === 0, lit("#sec1")).otherwise(lit(""))
    concat(lit("https://"), host, path, slash, params, frag)
  }

  private val synthUrlSql =
    """'https://' ||
      |  (CASE WHEN doc_id % 2 = 0 THEN upper('site' || (divide(doc_id, 7) % 10))
      |        ELSE 'site' || (divide(doc_id, 7) % 10) END) || '.Example.COM' ||
      |  '/docs/' || divide(doc_id, 7) ||
      |  (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) ||
      |  (CASE WHEN doc_id % 4 = 0 THEN '?id=' || (divide(doc_id, 7) % 5) || '&utm_source=feed'
      |        WHEN doc_id % 4 = 1 THEN '?utm_campaign=x' ELSE '' END) ||
      |  (CASE WHEN doc_id % 5 = 0 THEN '#sec1' ELSE '' END)""".stripMargin

  /** Canonicalization chain (RE2-compatible patterns only — the oracle
    * engine has no lookarounds): strip fragment, strip utm_* params
    * (always appended last by the synthesizer, as real trackers are),
    * strip orphaned '?'/trailing slash, lowercase the host segment and
    * reassemble.
    */
  private def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noUtm = regexp_replace(noFrag, "[?&]utm_[^&]*", "")
    val noSlash = regexp_replace(noUtm, "/$", "")
    val host = regexp_extract(noSlash, "^https://([^/?]+)", 1)
    concat(lit("https://"), lower(host),
      noSlash.substr(lit(9) + length(host), length(noSlash)))
  }

  private def canonicalizeSql(url: String): String = {
    val noFrag = s"regexp_replace($url, '#.*$$', '')"
    val noUtm = s"regexp_replace($noFrag, '[?&]utm_[^&]*', '', 'g')"
    val noSlash = s"regexp_replace($noUtm, '/$$', '')"
    s"""'https://' || lower(regexp_extract($noSlash, '^https://([^/?]+)', 1)) ||
       | substr($noSlash, 9 + len(regexp_extract($noSlash, '^https://([^/?]+)', 1)))""".stripMargin
  }

  def ddUrlDedup(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), synthUrl.as("url"))
      .select(col("doc_id"), canonicalize(col("url")).as("canonical"))
      .groupBy("canonical")
      .agg(count(lit(1)).as("n_dups"), min("doc_id").as("keeper"))
      .orderBy("canonical")

  private val ddUrlDedupSql =
    s"""WITH u AS (SELECT doc_id, $synthUrlSql AS url FROM documents),
       |c AS (SELECT doc_id, ${canonicalizeSql("url")} AS canonical FROM u)
       |SELECT canonical, COUNT(*) AS n_dups, min(doc_id) AS keeper
       |FROM c GROUP BY canonical ORDER BY canonical""".stripMargin

  // ---------------------------------------------------------------------
  // DSIR importance weights
  // ---------------------------------------------------------------------

  private val DsirBuckets = 1024
  private val Pow2_30 = 1073741824.0
  private val TargetSource = "src0"

  private def toks: Column = split(col("text"), " ")

  def taDsir(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val n = size(toks)
    val idx = sequence(lit(1), n - 1)
    val bgArr = when(n < 2, array().cast(ArrayType(StringType)))
      .otherwise(transform(idx, i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
    // hashed-bigram bucket stream, ONE explode feeding both the feature
    // build (via its own aggregation) and the per-doc probe pre-agg —
    // cached at per-doc distinct-bucket granularity like ta_ngram_lm
    val occ = docs.select(col("doc_id"), col("source"),
        explode(bgArr).as("bg"))
      .select(col("doc_id"), col("source"),
        pmod(PortableHash.hash64(col("bg")), lit(DsirBuckets.toLong)).as("b"))
    val perDoc = occ.groupBy("doc_id", "source", "b")
      .agg(count(lit(1)).as("k"))
      .cache()
    // feature table: B rows, target/raw counts per bucket — broadcasts
    // at ANY corpus size (that's the DSIR trick: fixed feature space)
    val isTarget = col("source") === TargetSource
    val feat = perDoc.groupBy("b")
      .agg(sum(when(isTarget, col("k")).otherwise(0L)).as("ct"),
        sum(when(!isTarget, col("k")).otherwise(0L)).as("cr"))
    val tot = feat.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    val lam = feat.crossJoin(broadcast(tot))
      .select(col("b").as("fb"),
        round(log(((col("ct") + 1L) * (col("nr") + DsirBuckets)).cast(DoubleType) /
          ((col("cr") + 1L) * (col("nt") + DsirBuckets)).cast(DoubleType)), 6)
          .as("lam"))
    perDoc.where(!isTarget)
      .join(broadcast(lam), col("b") === col("fb"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"),
        (sum(col("k") * floor(col("lam") * Pow2_30)).cast(DoubleType) / Pow2_30)
          .as("dsir_logw"))
      .orderBy("doc_id")
  }

  private val taDsirSql = {
    val h = PortableHash.sql("list_extract(toks, i) || ' ' || list_extract(toks, i+1)")
    s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
       |occ AS (
       |  SELECT doc_id, source, $h % $DsirBuckets AS b
       |  FROM (SELECT doc_id, source, toks, unnest(range(1, len(toks))) AS i FROM d)),
       |perdoc AS (SELECT doc_id, source, b, COUNT(*) AS k
       |           FROM occ GROUP BY doc_id, source, b),
       |feat AS (
       |  SELECT b,
       |    CAST(SUM(CASE WHEN source = '$TargetSource' THEN k ELSE 0 END) AS BIGINT) AS ct,
       |    CAST(SUM(CASE WHEN source <> '$TargetSource' THEN k ELSE 0 END) AS BIGINT) AS cr
       |  FROM perdoc GROUP BY b),
       |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cr) AS BIGINT) AS nr FROM feat),
       |lam AS (
       |  SELECT b, round(ln(CAST((ct + 1) * (nr + $DsirBuckets) AS DOUBLE)
       |    / CAST((cr + 1) * (nt + $DsirBuckets) AS DOUBLE)), 6) AS lam
       |  FROM feat CROSS JOIN tot)
       |SELECT p.doc_id, CAST(SUM(p.k) AS BIGINT) AS n_bigrams,
       |  CAST(SUM(p.k * CAST(floor(lam.lam * $Pow2_30) AS BIGINT)) AS DOUBLE) / $Pow2_30
       |    AS dsir_logw
       |FROM perdoc p JOIN lam ON p.b = lam.b
       |WHERE p.source <> '$TargetSource'
       |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_url_dedup" -> (ddUrlDedup(_, _)),
    "ta_dsir" -> (taDsir(_, _)))

  def oracles: Map[String, String] = Map(
    "dd_url_dedup" -> ddUrlDedupSql,
    "ta_dsir" -> taDsirSql)
}
