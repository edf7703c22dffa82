package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Second dedup wave: near-dup cluster CANONICALIZATION (what a
  * training pipeline actually does with `dd_components`' output — pick
  * one survivor per duplicate cluster) and cross-modal JOINT dedup
  * (require the text fingerprint and the image-modality fingerprint to
  * AGREE before calling two items duplicates — the multimodal
  * curation rule that cuts false positives from either modality
  * alone). Reference scope: the reference engine (an ETL loader) has
  * no dedup surface; these extend the `dd_*` family the round-5 waves
  * built.
  */
object DedupOps2 {

  // ----------------------------------------------------- dd_canonical

  /** Canonical-document election over the near-dup components: every
    * doc that sits in a duplicate cluster, labeled with its cluster's
    * canonical representative — the member with the MOST content
    * (max n_chars; ties to the lowest doc_id, so the election is
    * total). Downstream, training keeps `is_canonical` rows and drops
    * the rest — this is the standard keep-longest policy near-dup
    * pipelines apply after clustering.
    *
    * Scale: reuses [[GraphOps.componentLabels]] (memoized; large-star/
    * small-star gated at scale), one broadcast-sized join to pull
    * n_chars, and the election is a single map-side-combinable
    * `min(struct(-n_chars, doc_id))` argmax per cluster — no windows,
    * no driver state (the [[Similarity.assignCells]] pattern).
    */
  def ddCanonical(s: SparkSession, dir: String): DataFrame = {
    val mem = GraphOps.componentLabels(s, dir)
      .select(col("doc_id"), col("lbl").as("component"))
      .join(Tables(s, dir, "documents").select("doc_id", "n_chars"), "doc_id")
    val canon = mem.groupBy("component")
      .agg(min(struct((-col("n_chars")).as("neg"), col("doc_id").as("id"))).as("b"))
      .select(col("component"), col("b.id").as("canonical_id"))
    mem.join(canon, "component")
      .select(col("doc_id"), col("component"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
      .orderBy("doc_id")
  }

  private val ddCanonicalSql =
    s"""WITH ${GraphOps.componentsSqlChain},
       |mem AS (
       |  SELECT c.doc_id, c.component, d.n_chars
       |  FROM comp c JOIN documents d ON d.doc_id = c.doc_id),
       |canon AS (
       |  SELECT component, canonical_id FROM (
       |    SELECT component, doc_id AS canonical_id,
       |      row_number() OVER (PARTITION BY component
       |        ORDER BY n_chars DESC, doc_id ASC) AS rk
       |    FROM mem) WHERE rk = 1)
       |SELECT m.doc_id, m.component, c.canonical_id,
       |  m.doc_id = c.canonical_id AS is_canonical
       |FROM mem m JOIN canon c ON c.component = m.component
       |ORDER BY m.doc_id""".stripMargin

  // -------------------------------------------------- mm_joint_dedup

  /** Text-fingerprint agreement threshold for a phash-blocked pair. */
  private val JointHammingMax = 6

  /** Hot-bucket cap on the phash block size (the ShingleDfCap trade):
    * a phash shared by more docs than this is a degenerate constant
    * (think: all-black thumbnails) whose pair output is quadratic —
    * those buckets are dropped whole. Observed max bucket at every
    * test scale is far below the cap, so the output equals the
    * uncapped query's (the oracle applies the same bucket-size rule).
    */
  private val PhBucketCap = 128

  /** Cross-modal joint dedup: candidate pairs BLOCK on exact equality
    * of the image-modality perceptual hash ([[Multimodal.phashFingerprints]])
    * and VERIFY on the text simhash ([[DedupOps.simhashFps]]) within
    * hamming ≤ [[JointHammingMax]] — a pair is a joint duplicate only
    * when both modalities agree. Blocking on the 16-bit phash keeps
    * candidate generation an equi-join (bucket-occupancy-bounded, with
    * the [[PhBucketCap]] guard against degenerate constant hashes);
    * the hamming verify is two cached doc-sized fingerprint relations
    * and codegen'd bit ops.
    */
  def mmJointDedup(s: SparkSession, dir: String): DataFrame = {
    val j = Multimodal.phashFingerprints(s, dir)
      .join(DedupOps.simhashFps(s, dir), "doc_id")
    val small = j.groupBy("phash").agg(count(lit(1)).as("n"))
      .where(col("n") <= PhBucketCap).select("phash")
    val jj = j.join(small, Seq("phash"), "left_semi")
    val l = jj.select(col("phash"), col("doc_id").as("a"),
      col("fingerprint").as("fa"))
    val r = jj.select(col("phash").as("pb"), col("doc_id").as("b"),
      col("fingerprint").as("fb"))
    l.join(r, col("phash") === col("pb") && col("a") < col("b"))
      .select(col("a"), col("b"), col("phash"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast(LongType).as("text_hamming"))
      .where(col("text_hamming") <= JointHammingMax)
      .orderBy("a", "b")
  }

  private val mmJointDedupSql =
    s"""WITH ${Multimodal.phashFpSqlChain},
       |${DedupOps.simhashFpsSqlChain},
       |j AS (
       |  SELECT f.doc_id, f.phash, s.fingerprint
       |  FROM fp f JOIN fps s ON s.doc_id = f.doc_id),
       |small AS (
       |  SELECT phash FROM j GROUP BY phash HAVING COUNT(*) <= $PhBucketCap)
       |SELECT x.doc_id AS a, y.doc_id AS b, x.phash,
       |  CAST(bit_count(xor(x.fingerprint, y.fingerprint)) AS BIGINT) AS text_hamming
       |FROM j x JOIN j y ON x.phash = y.phash AND x.doc_id < y.doc_id
       |JOIN small k ON k.phash = x.phash
       |WHERE bit_count(xor(x.fingerprint, y.fingerprint)) <= $JointHammingMax
       |ORDER BY a, b""".stripMargin
      // j is referenced three times and each reference would otherwise
      // re-inline the whole per-char phash chain (the SpectralOps
      // rule); no RECURSIVE CTE here, so the blanket rewrite is safe
      .replace("AS (", "AS MATERIALIZED (")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_canonical" -> (ddCanonical(_, _)),
    "mm_joint_dedup" -> (mmJointDedup(_, _)))

  def oracles: Map[String, String] = Map(
    "dd_canonical" -> ddCanonicalSql,
    "mm_joint_dedup" -> mmJointDedupSql)
}
