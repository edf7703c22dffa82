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
      // r13: the AS MATERIALIZED rewrite is GONE — measured on the live
      // DuckDB, inlining j's three references costs 1.36 s vs 0.92 s at
      // sf0.1 (the engine CSEs the per-char chain well enough), and
      // dropping the DuckDB-only keyword lets the statement parse on
      // spark.sql, moving this query onto the parity-pinned list

  // ------------------------------------------------- mm_cross_contam

  /** Cross-modal train/eval contamination audit — the q_split_leakage
    * question asked across modalities: an EVAL asset (doc_id % 10 = 0,
    * the deterministic split convention the training family uses) is
    * contaminated when some TRAIN asset shares its image-modality
    * perceptual hash exactly AND sits inside its text fingerprint's
    * hamming-≤[[JointHammingMax]] neighborhood — an eval image that is
    * pixel-near-identical to a training image AND caption-near-identical
    * leaks the answer, even though neither split ever compared raw
    * bytes. Same scale shape as [[mmJointDedup]]: blocking is an
    * equi-join on the 16-bit phash (bucket-occupancy-bounded, the
    * [[PhBucketCap]] guard drops degenerate constant-hash buckets
    * whole), the verify is codegen'd bit ops over two cached doc-sized
    * fingerprint relations, and the report aggregates per eval asset —
    * never a cross-split cartesian.
    */
  def mmCrossContam(s: SparkSession, dir: String): DataFrame = {
    val j = Multimodal.phashFingerprints(s, dir)
      .join(DedupOps.simhashFps(s, dir), "doc_id")
    val small = j.groupBy("phash").agg(count(lit(1)).as("n"))
      .where(col("n") <= PhBucketCap).select("phash")
    val jj = j.join(small, Seq("phash"), "left_semi")
    val eval = jj.where(col("doc_id") % 10 === 0)
      .select(col("phash"), col("doc_id").as("eval_doc"),
        col("fingerprint").as("fe"))
    val train = jj.where(col("doc_id") % 10 =!= 0)
      .select(col("phash").as("pt"), col("doc_id").as("train_doc"),
        col("fingerprint").as("ft"))
    eval.join(train, col("phash") === col("pt"))
      .withColumn("text_hamming",
        bit_count(col("fe").bitwiseXOR(col("ft"))).cast(LongType))
      .where(col("text_hamming") <= JointHammingMax)
      .groupBy("eval_doc")
      .agg(count(lit(1)).as("n_contaminating"),
        min("text_hamming").as("min_hamming"),
        min("train_doc").as("first_train_doc"))
      .orderBy("eval_doc")
  }

  private val mmCrossContamSql =
    s"""WITH ${Multimodal.phashFpSqlChain},
       |${DedupOps.simhashFpsSqlChain},
       |j AS (
       |  SELECT f.doc_id, f.phash, s.fingerprint
       |  FROM fp f JOIN fps s ON s.doc_id = f.doc_id),
       |small AS (
       |  SELECT phash FROM j GROUP BY phash HAVING COUNT(*) <= $PhBucketCap)
       |SELECT e.doc_id AS eval_doc, COUNT(*) AS n_contaminating,
       |  min(CAST(bit_count(xor(e.fingerprint, t.fingerprint)) AS BIGINT)) AS min_hamming,
       |  min(t.doc_id) AS first_train_doc
       |FROM j e JOIN j t ON e.phash = t.phash
       |JOIN small k ON k.phash = e.phash
       |WHERE e.doc_id % 10 = 0 AND t.doc_id % 10 <> 0
       |  AND bit_count(xor(e.fingerprint, t.fingerprint)) <= $JointHammingMax
       |GROUP BY e.doc_id ORDER BY eval_doc""".stripMargin
      // same r13 de-materialization as mmJointDedupSql: 1.05 s inlined
      // vs 0.75 s at sf0.1 on the live DuckDB, and the shared text now
      // parses on spark.sql (parity-pinned)

  // --------------------------------------------------- q_survivorship

  /** Golden-record election over the near-dup components — the field-
    * level MERGE that follows [[ddCanonical]]'s keep-longest pick: per
    * cluster, the canonical doc (max n_chars, ties to min doc_id), the
    * MODAL language (most members, ties to the lexicographically
    * smallest — a per-field survivorship rule, not a whole-row pick),
    * and the cluster's mass. Every election is a
    * map-side-combinable min(struct(...)) argmax; no windows.
    */
  def qSurvivorship(s: SparkSession, dir: String): DataFrame = {
    val mem = GraphOps.componentLabels(s, dir)
      .select(col("doc_id"), col("lbl").as("component"))
      .join(Tables(s, dir, "documents").select("doc_id", "n_chars", "lang"), "doc_id")
    val canon = mem.groupBy("component")
      .agg(min(struct((-col("n_chars")).as("neg"), col("doc_id").as("id"))).as("b"))
      .select(col("component"), col("b.id").as("canonical_id"))
    val modal = mem.groupBy("component", "lang").agg(count(lit(1)).as("n"))
      .groupBy("component")
      .agg(min(struct((-col("n")).as("neg"), col("lang").as("lang"))).as("b"))
      .select(col("component"), col("b.lang").as("modal_lang"))
    mem.groupBy("component")
      .agg(count(lit(1)).as("n_members"), sum("n_chars").as("total_chars"))
      .join(canon, "component").join(modal, "component")
      .select(col("component"), col("canonical_id"), col("modal_lang"),
        col("n_members"), col("total_chars"))
      .orderBy("component")
  }

  private val qSurvivorshipSql =
    s"""WITH ${GraphOps.componentsSqlChain},
       |mem AS (
       |  SELECT c.doc_id, c.component, d.n_chars, d.lang
       |  FROM comp c JOIN documents d ON d.doc_id = c.doc_id),
       |canon AS (
       |  SELECT component, canonical_id FROM (
       |    SELECT component, doc_id AS canonical_id,
       |      row_number() OVER (PARTITION BY component
       |        ORDER BY n_chars DESC, doc_id ASC) AS rk
       |    FROM mem) WHERE rk = 1),
       |lc AS (SELECT component, lang, COUNT(*) AS n FROM mem GROUP BY 1, 2),
       |ml AS (
       |  SELECT component, modal_lang FROM (
       |    SELECT component, lang AS modal_lang,
       |      row_number() OVER (PARTITION BY component
       |        ORDER BY n DESC, lang ASC) AS rk
       |    FROM lc) WHERE rk = 1)
       |SELECT m.component, c.canonical_id, l.modal_lang,
       |  COUNT(*) AS n_members, CAST(SUM(m.n_chars) AS BIGINT) AS total_chars
       |FROM mem m JOIN canon c ON c.component = m.component
       |JOIN ml l ON l.component = m.component
       |GROUP BY 1, 2, 3 ORDER BY m.component""".stripMargin

  // -------------------------------------------------- q_split_leakage

  /** Train/test leakage audit: simhash near-dup pairs (the
    * [[DedupOps.ddSimhash]] relation) whose endpoints land in
    * DIFFERENT q_train_split buckets — each such pair is an eval
    * answer the model saw in training. Reports pair counts per
    * (split, split) cell with an example pair. The split is the
    * deterministic hash rule itself (no join needed to assign it);
    * the pair relation is the banded simhash join, so the audit adds
    * only one aggregate on top of machinery both sides already run.
    */
  def qSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    def split(c: org.apache.spark.sql.Column) = {
      val bucket = graft.functions.PortableHash.hash64(c.cast(StringType)) % 100
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    }
    // r16 (guide §2.5/§2.6 — serial stage, not a plan defect): the pair
    // relation lands from ddSimhash's candidate-dedup at ~40 MB
    // (1.66M rows at sf0.1), which AQE's byte-sized coalescing packs
    // into ~1 post-shuffle partition — and THIS query then evaluates
    // two portable md5 hashes per pair row inside that stage, so the
    // whole 3.3M-hash classification ran serially (bench: 3.8 s vs
    // dd_simhash's 1.2 s on the same pair build). An explicit
    // hash-repartition on `a` (count tracks the session's declared
    // shuffle width, the ddSimhash band-join rationale) spreads the
    // hashing across every core; the aggregate's values are
    // partitioning-independent (counts + mins).
    DedupOps.ddSimhash(s, dir)
      .repartition(math.max(s.sparkContext.defaultParallelism,
        s.conf.get("spark.sql.shuffle.partitions", "32").toInt), col("a"))
      .select(col("a"), col("b"), split(col("a")).as("split_a"),
        split(col("b")).as("split_b"))
      .where(col("split_a") =!= col("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"),
        min("a").as("example_a"), min("b").as("example_b"))
      .orderBy("split_a", "split_b")
  }

  private val qSplitLeakageSql = {
    def split(e: String) = {
      val b = s"${graft.functions.PortableHash.sql(s"CAST($e AS STRING)")} % 100"
      s"CASE WHEN $b < 80 THEN 'train' WHEN $b < 90 THEN 'val' ELSE 'test' END"
    }
    s"""WITH ${DedupOps.simhashFpsSqlChain},
       |p AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b
       |  FROM fps x JOIN fps y ON x.doc_id < y.doc_id
       |  WHERE bit_count(xor(x.fingerprint, y.fingerprint)) <= ${DedupOps.HammingMax}),
       |cls AS (SELECT a, b, ${split("a")} AS split_a, ${split("b")} AS split_b FROM p)
       |SELECT split_a, split_b, COUNT(*) AS n_pairs,
       |  min(a) AS example_a, min(b) AS example_b
       |FROM cls WHERE split_a <> split_b
       |GROUP BY split_a, split_b ORDER BY split_a, split_b""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_canonical" -> (ddCanonical(_, _)),
    "mm_joint_dedup" -> (mmJointDedup(_, _)),
    "mm_cross_contam" -> (mmCrossContam(_, _)),
    "q_survivorship" -> (qSurvivorship(_, _)),
    "q_split_leakage" -> (qSplitLeakage(_, _)))

  def oracles: Map[String, String] = Map(
    "dd_canonical" -> ddCanonicalSql,
    "mm_joint_dedup" -> mmJointDedupSql,
    "mm_cross_contam" -> mmCrossContamSql,
    "q_survivorship" -> qSurvivorshipSql,
    "q_split_leakage" -> qSplitLeakageSql)
}
