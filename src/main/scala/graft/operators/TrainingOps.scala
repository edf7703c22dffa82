package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Training-corpus curation operators beyond document-level dedup:
  *
  *  - `dd_substring`: substring-span dedup in the style of Lee et al.
  *    2021 ("Deduplicating Training Data Makes Language Models
  *    Better") — every 10-token window of every document, windows
  *    occurring in ≥2 distinct documents marked as duplicated span,
  *    per-doc duplicated-window fraction. The full suffix-array
  *    construction is replaced by fixed-width window fingerprints: one
  *    explode + one groupBy on a 60-bit hash — both map-side-combining
  *    shuffles that scale linearly, vs. the suffix array's global sort
  *    of every byte offset. At 100 TB the window→df aggregation
  *    partitions by hash (uniform by construction — no skew), and docs
  *    rejoin their window verdicts by hash equality.
  *  - `ta_contamination`: train/test overlap detection (the
  *    benchmark-contamination check every eval pipeline needs): the
  *    distinct 8-token windows of each held-out doc probed against the
  *    train-split window set; a doc is contaminated when ≥20% of its
  *    windows appear verbatim in train. The train set is the big side
  *    — the probe is a semi-join-shaped left join on the window hash;
  *    at 100 TB a bloom filter on the (much smaller) test window set
  *    prefilters the train scan (ScaleSpec shows that machinery).
  *  - `q_global_shuffle`: deterministic epoch shuffle + shard packing
  *    for training-data ordering — seeded hash order, row_number
  *    within epoch, fixed 64-doc shards. Reproducible across runs and
  *    partitionings (pure function of (epoch, doc_id)); at scale the
  *    sort is a range-partitioned total order on the hash, and shard
  *    boundaries fall out of the global row number.
  *  - `q_merge_upsert`: MERGE INTO semantics (the warehouse upsert the
  *    reference's idempotent day-load implies): base snapshot
  *    full-outer CDC batch → update/insert/keep classification with
  *    final-state aggregates. Keys partition the join; at scale this
  *    is the same shuffled-hash full outer any MERGE implementation
  *    bottoms out in.
  *
  * All four have exact DuckDB oracles: window hashes are
  * [[PortableHash]], fractions are a single double division of exact
  * longs, and money sums use the power-of-two quantization trick
  * (NOTES.md technique #4b — floor(v·2^15); terms ≤2^36, ≤150k terms
  * per group keeps sums far inside exact-BIGINT/double range).
  */
object TrainingOps {

  // ---------------------------------------------------------------------
  // Substring-span dedup (fixed-width window fingerprints)
  // ---------------------------------------------------------------------

  private val SpanW = 10

  /** Position-indexed W-token windows (NOT distinct — spans repeat). */
  private def windowHashes(docs: DataFrame, w: Int, distinctPerDoc: Boolean): DataFrame = {
    val toks = split(col("text"), " ")
    val wins = transform(sequence(lit(0), size(toks) - w),
      i => concat_ws(" ", slice(toks, i + 1, lit(w))))
    // <w tokens → empty array → no window rows (guards sequence's
    // descending-on-negative-range behavior, NOTES.md gotcha #14)
    val arr0 = when(size(toks) < w, array().cast(ArrayType(StringType))).otherwise(wins)
    val arr = if (distinctPerDoc) array_distinct(arr0) else arr0
    docs.select(col("doc_id"), col("source"), explode(arr).as("win"))
      .select(col("doc_id"), col("source"), PortableHash.hash64(col("win")).as("h"))
  }

  def ddSubstring(s: SparkSession, dir: String): DataFrame = {
    // pre-aggregate to (doc, window) occurrence counts and reuse that
    // one materialization for both the corpus-frequency side and the
    // per-doc attribution side — the window explode + md5 runs once
    val w = windowHashes(Tables(s, dir, "documents"), SpanW, distinctPerDoc = false)
      .groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
      .cache()
    // w is distinct per (doc, h), so doc-frequency is a plain count
    val wf = w.groupBy("h").agg(count(lit(1)).as("ndocs"))
    val dup = sum(when(col("ndocs") >= 2, col("c")).otherwise(0L))
    w.join(wf, "h")
      .groupBy("doc_id")
      .agg(sum("c").as("n_windows"), dup.as("n_dup"),
        (dup.cast(DoubleType) / sum("c")).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** DuckDB window generator (lateral generate_series unsupported in
    * 1.0 → bounded range cross join; list slice is 1-based inclusive).
    */
  private def windowsSql(w: Int, distinct: Boolean): String = {
    val d = if (distinct) "DISTINCT " else ""
    s"""SELECT ${d}d.doc_id, d.source,
       |  ${PortableHash.sql(s"array_to_string(array_slice(d.toks, i, i+${w - 1}), ' ')")} AS h
       |FROM (SELECT doc_id, source, toks, unnest(range(1, len(toks) - ${w - 2})) AS i
       |      FROM (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents)) d""".stripMargin
  }

  private val ddSubstringSql =
    s"""WITH w AS (${windowsSql(SpanW, distinct = false)}),
       |wf AS (SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM w GROUP BY h)
       |SELECT w.doc_id, COUNT(*) AS n_windows,
       |  CAST(SUM(CASE WHEN wf.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  CAST(SUM(CASE WHEN wf.ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_frac
       |FROM w JOIN wf ON w.h = wf.h GROUP BY w.doc_id ORDER BY doc_id""".stripMargin

  /** Span REMOVAL — the cleaned corpus [[ddSubstring]] implies: every
    * token covered by a cross-document duplicated window is dropped and
    * the document re-assembled from the survivors. Output carries
    * md5(cleaned_text) so the oracle proves byte-exact reconstruction
    * without shipping the text. Reconstruction is per-document
    * (collect_list bounded by doc length — the right unit of work at
    * any scale); everything upstream is the same linear window/hash
    * shuffles as dd_substring.
    */
  def ddSpanRemoval(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val toksCol = split(col("text"), " ")
    val winArr = when(size(toksCol) < SpanW, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(0), size(toksCol) - SpanW),
        i => concat_ws(" ", slice(toksCol, i + 1, lit(SpanW)))))
    val w = docs.select(col("doc_id"), posexplode(winArr).as(Seq("i0", "win")))
      .select(col("doc_id"), (col("i0") + 1).as("i"),
        PortableHash.hash64(col("win")).as("h"))
      .cache()
    val wf = w.groupBy("h").agg(countDistinct("doc_id").as("nd"))
      .where(col("nd") >= 2).select("h")
    val cov = w.join(wf, "h")
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + SpanW - 1)).as("p"))
      .distinct()
    val toks = docs.select(col("doc_id"), posexplode(toksCol).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
    val kept = toks.join(cov, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok"))).as("cleaned"))
    docs.select("doc_id").join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        md5(coalesce(col("cleaned"), lit(""))).as("cleaned_hash"))
      .orderBy("doc_id")
  }

  private val ddSpanRemovalSql =
    s"""WITH mx AS (
       |  SELECT CAST(max(len(string_split(text, ' '))) AS BIGINT) AS m FROM documents),
       |dims AS (SELECT unnest(generate_series(1, m)) AS i FROM mx),
       |w AS (
       |  SELECT d.doc_id, d.i,
       |    ${PortableHash.sql(s"array_to_string(array_slice(d.toks, i, i+${SpanW - 1}), ' ')")} AS h
       |  FROM (SELECT doc_id, toks, i
       |        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |        CROSS JOIN dims WHERE i <= len(toks) - ${SpanW - 1}) d),
       |wf AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
       |cov AS (SELECT DISTINCT w.doc_id, w.i + r.off AS p
       |        FROM w JOIN wf ON w.h = wf.h CROSS JOIN range(0, $SpanW) r(off)),
       |toks AS (SELECT doc_id,
       |                list_extract(string_split(text, ' '), CAST(i AS INTEGER)) AS tok,
       |                i AS p
       |         FROM documents CROSS JOIN dims
       |         WHERE i <= len(string_split(text, ' '))),
       |kept AS (
       |  SELECT t.doc_id,
       |    array_to_string(list_transform(list_sort(array_agg(
       |      lpad(CAST(t.p AS STRING), 7, '0') || ':' || t.tok)),
       |      s -> substr(s, 9)), ' ') AS cleaned,
       |    COUNT(*) AS n_kept
       |  FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p
       |  WHERE c.p IS NULL GROUP BY t.doc_id)
       |SELECT d.doc_id, coalesce(k.n_kept, 0) AS n_kept,
       |  md5(coalesce(k.cleaned, '')) AS cleaned_hash
       |FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Train/test contamination
  // ---------------------------------------------------------------------

  private val ContamW = 8
  private val TestSources = Seq("src8", "src9")
  private val ContamThreshold = 0.2

  def taContamination(s: SparkSession, dir: String): DataFrame = {
    val w = windowHashes(Tables(s, dir, "documents"), ContamW, distinctPerDoc = true)
    val train = w.where(!col("source").isin(TestSources: _*))
      .select("h").distinct().withColumn("hit", lit(1))
    val test = w.where(col("source").isin(TestSources: _*)).select("doc_id", "h")
    val hits = sum(when(col("hit").isNotNull, 1L).otherwise(0L))
    test.join(train, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"), hits.as("n_hit"),
        (hits.cast(DoubleType) / count(lit(1))).as("contam_frac"))
      .withColumn("contaminated", col("contam_frac") >= ContamThreshold)
      .orderBy("doc_id")
  }

  private val taContaminationSql = {
    val srcs = TestSources.map(x => s"'$x'").mkString(", ")
    s"""WITH w AS (${windowsSql(ContamW, distinct = true)}),
       |train AS (SELECT DISTINCT h FROM w WHERE source NOT IN ($srcs)),
       |test AS (SELECT doc_id, h FROM w WHERE source IN ($srcs))
       |SELECT t.doc_id, COUNT(*) AS n_windows,
       |  CAST(SUM(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  CAST(SUM(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS contam_frac,
       |  CAST(SUM(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
       |    >= $ContamThreshold AS contaminated
       |FROM test t LEFT JOIN train tr ON t.h = tr.h
       |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // BPE merge application (tokenizer inference)
  // ---------------------------------------------------------------------

  /** Ordered merge table — in production this is the trained tokenizer
    * artifact (a broadcast list); semantics per rule are leftmost
    * non-overlapping application, encoded as a piece-delimited string
    * rewrite so a merge can never fire inside a previously-formed
    * multi-char piece.
    */
  private val BpeMerges = Seq(
    "e" -> "r", "i" -> "n", "s" -> "t", "t" -> "a",
    "a" -> "r", "o" -> "r", "u" -> "e", "r" -> "o")

  /** Apply a trained BPE merge table corpus-wide and report per-doc
    * tokenization stats (word → pieces compression). Pure scalar
    * rewrite chain — narrow stage, whole-stage codegen, no shuffle
    * until the per-doc aggregate; `replace` has identical
    * leftmost-non-overlapping semantics in both engines, so the
    * oracle is exact.
    */
  def taBpe(s: SparkSession, dir: String): DataFrame = {
    val words = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val enc0 = concat(lit("|"),
      concat_ws("|", array_remove(split(col("w"), ""), "")), lit("|"))
    val merged = BpeMerges.foldLeft(enc0) { case (acc, (x, y)) =>
      call_function("replace", acc, lit(s"|$x|$y|"), lit(s"|$x$y|"))
    }
    val pieces = (length(merged) - length(call_function("replace", merged, lit("|"), lit("")))) - 1
    words.select(col("doc_id"), pieces.cast(LongType).as("np"), length(col("w")).as("nc"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("np").as("n_pieces"),
        sum("nc").cast(LongType).as("n_chars"),
        (sum("np").cast(DoubleType) / count(lit(1))).as("pieces_per_word"))
      .orderBy("doc_id")
  }

  private val taBpeSql = {
    val enc0 = "'|' || array_to_string(regexp_split_to_array(w, ''), '|') || '|'"
    val merged = BpeMerges.foldLeft(enc0) { case (acc, (x, y)) =>
      s"replace($acc, '|$x|$y|', '|$x$y|')"
    }
    s"""WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |enc AS (SELECT doc_id,
       |    len($merged) - len(replace($merged, '|', '')) - 1 AS np,
       |    len(w) AS nc
       |  FROM words)
       |SELECT doc_id, COUNT(*) AS n_words,
       |  CAST(SUM(np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(nc) AS BIGINT) AS n_chars,
       |  CAST(SUM(np) AS DOUBLE) / COUNT(*) AS pieces_per_word
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Deterministic epoch shuffle + shard packing
  // ---------------------------------------------------------------------

  private val Epochs = 3
  private val ShardSize = 64

  def qGlobalShuffle(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents").select("doc_id")
    val epochs = s.range(Epochs).select(col("id").as("epoch"))
    val h = PortableHash.hash64(
      concat(col("epoch").cast(StringType), lit(":"), col("doc_id").cast(StringType)))
    // two-phase per-epoch rank: a Window partitioned only by epoch puts
    // EVERY doc of an epoch in one task — instead bucket by the hash's
    // top 8 bits (monotone in the (h, doc_id) sort order, and h is
    // unique-ish so buckets are balanced by construction), broadcast
    // the 3×256 bucket offsets, and row_number only within a bucket
    val withH = docs.crossJoin(broadcast(epochs))
      .select(col("epoch"), col("doc_id"), h.as("h"))
      .withColumn("bkt", shiftright(col("h"), 52))
    val offs = withH.groupBy("epoch", "bkt").agg(count(lit(1)).as("nb"))
      .withColumn("offset", coalesce(sum("nb").over(
        Window.partitionBy("epoch").orderBy(asc("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("epoch", "bkt", "offset")
    val inBkt = Window.partitionBy("epoch", "bkt").orderBy(asc("h"), asc("doc_id"))
    withH.join(broadcast(offs), Seq("epoch", "bkt"))
      .withColumn("rn", col("offset") + row_number().over(inBkt))
      .select(col("epoch"), col("doc_id"),
        ((col("rn") - 1) / lit(ShardSize)).cast(LongType).as("shard"),
        ((col("rn") - 1) % lit(ShardSize)).cast(LongType).as("pos"))
      .orderBy("epoch", "shard", "pos")
  }

  private val qGlobalShuffleSql =
    s"""WITH m AS (
       |  SELECT e.epoch, d.doc_id,
       |    row_number() OVER (PARTITION BY e.epoch
       |      ORDER BY ${PortableHash.sql("CAST(e.epoch AS STRING) || ':' || CAST(d.doc_id AS STRING)")}, d.doc_id) AS rn
       |  FROM documents d CROSS JOIN range(0, $Epochs) e(epoch))
       |SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
       |  CAST(divide(rn - 1, $ShardSize) AS BIGINT) AS shard,
       |  CAST((rn - 1) % $ShardSize AS BIGINT) AS pos
       |FROM m ORDER BY epoch, shard, pos""".stripMargin

  // ---------------------------------------------------------------------
  // MERGE upsert
  // ---------------------------------------------------------------------

  private val PriceScale = 32768.0 // 2^15: terms ≤2^36, exact through 150k-row groups

  def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    // simulated CDC batch: every 3rd key re-priced (×2 is exact in
    // double), every 7th key re-inserted under a fresh (negated) key
    val upd = base.where(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("k"), (col("o_totalprice") * 2).as("p"),
        col("o_orderpriority").as("pr"))
    // fresh keys: −key−1 (plain negation would collide key 0 with
    // itself and double-classify it)
    val ins = base.where(col("o_orderkey") % 7 === 0)
      .select((-col("o_orderkey") - 1).as("k"), col("o_totalprice").as("p"),
        col("o_orderpriority").as("pr"))
    val chg = upd.union(ins)
    val merged = base.join(chg, col("o_orderkey") === col("k"), "full_outer")
      .select(
        when(col("o_orderkey").isNotNull && col("k").isNotNull, "update")
          .when(col("o_orderkey").isNull, "insert")
          .otherwise("keep").as("action"),
        coalesce(col("pr"), col("o_orderpriority")).as("o_orderpriority"),
        coalesce(col("p"), col("o_totalprice")).as("fp"))
    merged.groupBy("action", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("fp") * PriceScale).cast(LongType)).as("sum_price_q"))
      .orderBy("action", "o_orderpriority")
  }

  private val qMergeUpsertSql =
    s"""WITH upd AS (SELECT o_orderkey AS k, o_totalprice * 2 AS p, o_orderpriority AS pr
       |             FROM orders WHERE o_orderkey % 3 = 0),
       |ins AS (SELECT -o_orderkey - 1 AS k, o_totalprice AS p, o_orderpriority AS pr
       |        FROM orders WHERE o_orderkey % 7 = 0),
       |chg AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
       |m AS (
       |  SELECT CASE WHEN b.o_orderkey IS NOT NULL AND c.k IS NOT NULL THEN 'update'
       |              WHEN b.o_orderkey IS NULL THEN 'insert' ELSE 'keep' END AS action,
       |         coalesce(c.pr, b.o_orderpriority) AS o_orderpriority,
       |         coalesce(c.p, b.o_totalprice) AS fp
       |  FROM orders b FULL OUTER JOIN chg c ON b.o_orderkey = c.k)
       |SELECT action, o_orderpriority, COUNT(*) AS n,
       |  CAST(SUM(CAST(floor(fp * $PriceScale) AS BIGINT)) AS BIGINT) AS sum_price_q
       |FROM m GROUP BY action, o_orderpriority ORDER BY action, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // N-gram novelty (corpus diversity metric)
  // ---------------------------------------------------------------------

  /** Per-document n-gram NOVELTY: the fraction of a doc's distinct
    * [[SpanW]]-gram windows whose FIRST corpus appearance (lowest
    * doc_id) is this document — the diversity report a curation run
    * publishes alongside its dedup rates (a novelty collapse across
    * doc-id order flags a templated tail). One window pass + one
    * min-per-hash aggregate + one count join; at 100 TB the hash
    * relation is the same bounded (h → min doc) shuffle dd_substring
    * already pays.
    */
  def taNovelty(s: SparkSession, dir: String): DataFrame = {
    // cached: both the first-seen build and the per-doc count consume
    // it, and it is already per-doc distinct (the dd_substring pattern)
    val w = windowHashes(Tables(s, dir, "documents"), SpanW,
      distinctPerDoc = true).select("doc_id", "h").cache()
    val firstSeen = w.groupBy("h").agg(min("doc_id").as("first_doc"))
    w.join(firstSeen, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"),
        (sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1))).as("novelty_frac"))
      .orderBy("doc_id")
  }

  private val taNoveltySql =
    s"""WITH w AS (${windowsSql(SpanW, distinct = true)}),
       |fs AS (SELECT h, min(doc_id) AS first_doc FROM w GROUP BY h)
       |SELECT w.doc_id, COUNT(*) AS n_windows,
       |  CAST(SUM(CASE WHEN fs.first_doc = w.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |  CAST(SUM(CASE WHEN fs.first_doc = w.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*) AS novelty_frac
       |FROM w JOIN fs ON w.h = fs.h
       |GROUP BY w.doc_id ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_substring" -> (ddSubstring(_, _)),
    "dd_span_removal" -> (ddSpanRemoval(_, _)),
    "ta_contamination" -> (taContamination(_, _)),
    "ta_novelty" -> (taNovelty(_, _)),
    "ta_bpe" -> (taBpe(_, _)),
    "q_global_shuffle" -> (qGlobalShuffle(_, _)),
    "q_merge_upsert" -> (qMergeUpsert(_, _)))

  def oracles: Map[String, String] = Map(
    "dd_substring" -> ddSubstringSql,
    "dd_span_removal" -> ddSpanRemovalSql,
    "ta_contamination" -> taContaminationSql,
    "ta_novelty" -> taNoveltySql,
    "ta_bpe" -> taBpeSql,
    "q_global_shuffle" -> qGlobalShuffleSql,
    "q_merge_upsert" -> qMergeUpsertSql)
}
