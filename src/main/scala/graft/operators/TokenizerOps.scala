package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Tokenizer-construction operators:
  *
  *  - `ta_bpe_train`: learn a BPE merge table FROM the corpus (the
  *    training side of `ta_bpe`, which applies a given table). Classic
  *    BPE trains on the word-frequency table, not the corpus — the
  *    distinct-word pre-aggregation is what makes the loop scale: each
  *    round re-encodes |vocab| rows (not |corpus|), counts adjacent
  *    piece pairs weighted by word count, and takes the single most
  *    frequent pair. The data-dependent merge is kept INSIDE the plan:
  *    the 1-row argmax result cross-joins back and `replace` runs with
  *    column (not literal) arguments — no driver round-trip per step.
  *    Output: the learned merge table (step, left, right, weighted
  *    pair count). Oracle: the same recurrence unrolled into CTEs,
  *    with DuckDB's `replace` taking the joined columns the same way.
  *  - `q_feature_hash`: the hashing trick — token → slot via portable
  *    hash mod D, per-(doc, slot) counts. The long (doc, slot, n)
  *    layout IS the sparse vector (dense assembly is a per-row pivot
  *    at the consumer); one explode + one map-side-combined aggregate,
  *    vocabulary-independent by construction — the point of feature
  *    hashing at 100 TB.
  */
object TokenizerOps {

  private val MergeSteps = 4
  private val HashDim = 64

  // ---------------------------------------------------------------------
  // BPE training
  // ---------------------------------------------------------------------

  /** Adjacent piece pairs of a delimiter-encoded word: list_extract(pieces, i) and
    * list_extract(pieces, i+1) (pieces = enc split on '|', empties trimmed).
    */
  private def pairCol(enc: Column): Column = {
    val pieces = array_remove(split(enc, "\\|"), "")
    when(size(pieces) < 2, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(0), size(pieces) - 2),
        i => concat(element_at(pieces, i + 1), lit("|"), element_at(pieces, i + 2))))
  }

  def taBpeTrain(s: SparkSession, dir: String): DataFrame = {
    val words = Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    var enc = words.select(
      concat(lit("|"), concat_ws("|", array_remove(split(col("w"), ""), "")), lit("|")).as("enc"),
      col("wc"))
    var merges: DataFrame = null
    for (step <- 1 to MergeSteps) {
      val top = enc
        .select(explode(pairCol(col("enc"))).as("p"), col("wc"))
        .groupBy("p").agg(sum("wc").as("c"))
        .select(split(col("p"), "\\|").getItem(0).as("left"),
          split(col("p"), "\\|").getItem(1).as("right"), col("c"))
        .orderBy(desc("c"), asc("left"), asc("right"))
        .limit(1)
        .withColumn("step", lit(step.toLong))
        // 1 row; materialized so each later round's broadcast doesn't
        // re-execute the whole earlier chain
        .localCheckpoint()
      merges = if (merges == null) top else merges.union(top)
      enc = enc.crossJoin(broadcast(top.select(col("left").as("ml"), col("right").as("mr"))))
        .select(call_function("replace", col("enc"),
          concat(lit("|"), col("ml"), lit("|"), col("mr"), lit("|")),
          concat(lit("|"), col("ml"), col("mr"), lit("|"))).as("enc"),
          col("wc"))
    }
    merges.select(col("step"), col("left"), col("right"), col("c").as("pair_count"))
      .orderBy("step")
  }

  private val taBpeTrainSql = {
    // pairs of enc: zip pieces with their successors
    // single line: this string is re-embedded in stripMargin'd chains,
    // where a line starting with '||' would lose its first pipe
    def pairsOf(encExpr: String): String = {
      val pieces = s"list_filter(string_split($encExpr, '|'), x -> x <> '')"
      s"list_transform(range(1, len($pieces)), i -> list_extract($pieces, i) || '|' || list_extract($pieces, i + 1))"
    }
    val chain = new StringBuilder
    chain ++=
      s"""wv AS (SELECT w, COUNT(*) AS wc FROM
         |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY w),
         |enc0 AS (SELECT '|' || array_to_string(list_filter(regexp_split_to_array(w, ''), x -> x <> ''), '|') || '|' AS enc, wc FROM wv)""".stripMargin
    for (step <- 1 to MergeSteps) {
      chain ++= s""",
         |cnt$step AS (
         |  SELECT list_extract(string_split(p, '|'), 1) AS l, list_extract(string_split(p, '|'), 2) AS r,
         |    CAST(SUM(wc) AS BIGINT) AS c
         |  FROM (SELECT unnest(${pairsOf("enc")}) AS p, wc FROM enc${step - 1})
         |  GROUP BY 1, 2),
         |m$step AS (SELECT l, r, c FROM cnt$step ORDER BY c DESC, l ASC, r ASC LIMIT 1),
         |enc$step AS (
         |  SELECT replace(e.enc, '|' || m.l || '|' || m.r || '|', '|' || m.l || m.r || '|') AS enc, e.wc
         |  FROM enc${step - 1} e, m$step m)""".stripMargin
    }
    val out = (1 to MergeSteps)
      .map(i => s"SELECT $i AS step, l AS \"left\", r AS \"right\", c AS pair_count FROM m$i")
      .mkString(" UNION ALL ")
    s"WITH ${chain.toString}\nSELECT CAST(step AS BIGINT) AS step, \"left\", \"right\", pair_count FROM ($out) ORDER BY step"
  }

  // ---------------------------------------------------------------------
  // Feature hashing
  // ---------------------------------------------------------------------

  def qFeatureHash(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"),
        (PortableHash.hash64(col("w")) % HashDim).as("slot"))
      .groupBy("doc_id", "slot").agg(count(lit(1)).as("n"))
      .orderBy("doc_id", "slot")

  private val qFeatureHashSql =
    s"""SELECT doc_id, ${PortableHash.sql("w")} % $HashDim AS slot, COUNT(*) AS n
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |GROUP BY 1, 2 ORDER BY doc_id, slot""".stripMargin

  /** WordPiece greedy maximal-munch tokenization (Wu et al. 2016) over
    * a fixed vocabulary, as the codegen'd whole-document kernel
    * [[graft.functions.WordPiece]] — per document ONE static call
    * emits the piece array, so tokenization never materializes a
    * per-position relation (the graft_winnow discipline; at 100 TB the
    * corpus-sized intermediate is the difference between a projection
    * and a shuffle). Output: corpus piece frequencies + document
    * frequencies. The oracle replays the same longest-match recurrence
    * as a recursive CTE over the same VALUES vocabulary, longest match
    * chosen by a NOT EXISTS against longer matching pieces (aggregate-
    * and window-free, so it is legal in the recursive term).
    */
  def taWordpiece(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(s)
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(expr("graft_wordpiece(text)")).as("piece"))
      .groupBy("piece")
      .agg(count(lit(1)).as("cnt"), countDistinct("doc_id").as("n_docs"))
      .orderBy(desc("cnt"), asc("piece"))
  }

  private val taWordpieceSql =
    s"""WITH RECURSIVE vocab(piece, len) AS (
       |  SELECT * FROM (VALUES ${graft.functions.WordPiece.vocabSqlValues}) t(p, l)),
       |words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
       |                 unnest(range(1, len(string_split(text, ' ')) + 1)) AS wid
       |          FROM documents),
       |munch(doc_id, wid, w, pos, piece) AS (
       |  SELECT doc_id, wid, w, 1, CAST(NULL AS STRING) FROM words
       |  UNION ALL
       |  SELECT m.doc_id, m.wid, m.w, m.pos + v.len, v.piece
       |  FROM munch m JOIN vocab v
       |    ON m.pos <= len(m.w) AND substr(m.w, m.pos, v.len) = v.piece
       |  WHERE NOT EXISTS (SELECT 1 FROM vocab v2 WHERE v2.len > v.len
       |                    AND substr(m.w, m.pos, v2.len) = v2.piece))
       |SELECT piece, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS n_docs
       |FROM munch WHERE piece IS NOT NULL
       |GROUP BY piece ORDER BY cnt DESC, piece ASC""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_bpe_train" -> (taBpeTrain(_, _)),
    "ta_wordpiece" -> (taWordpiece(_, _)),
    "q_feature_hash" -> (qFeatureHash(_, _)))

  def oracles: Map[String, String] = Map(
    "ta_bpe_train" -> taBpeTrainSql,
    "ta_wordpiece" -> taWordpieceSql,
    "q_feature_hash" -> qFeatureHashSql)
}
