package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Pretraining-objective corpus preparation: code/prose routing and
  * T5-style span corruption — the final text transforms between a
  * curated corpus and a training batch.
  */
object CorpusPrepOps {

  // ------------------------------------------------------ ta_code_detect

  private val CodeQ = 1048576L // 2^20 fixed-point for the hashed score

  /** Code-vs-prose routing signals: symbol density, digit density and
    * mean token length per document, combined into a fixed-point score
    * and a route flag, rolled up per source — the filter that keeps
    * code out of (or routes it into) a pretraining mix. Pure per-row
    * codegen'd regexp/length arithmetic + one aggregate; integers and
    * single exact divisions everywhere (the quality-scoring family's
    * contract).
    */
  def taCodeDetect(s: SparkSession, dir: String): DataFrame = {
    val len = length(col("text")).cast(DoubleType)
    val sym = regexp_count(col("text"), lit("[{}()\\[\\];=<>|&]")).cast(DoubleType)
    val dig = regexp_count(col("text"), lit("[0-9]")).cast(DoubleType)
    val nTok = size(split(col("text"), " ")).cast(DoubleType)
    // score = 4·sym_ratio + digit_ratio + 1/mean_tok_len, quantized;
    // each ratio is ONE division of exact integers
    val score = lit(4.0) * (sym / len) + dig / len + nTok / len
    Tables(s, dir, "documents")
      .select(col("source"),
        floor(score * CodeQ).cast(LongType).as("score_q"))
      .select(col("source"), col("score_q"),
        (col("score_q") >= (CodeQ / 8)).as("is_code"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_code"), 1L).otherwise(0L)).as("n_code"),
        sum("score_q").as("score_q_sum"))
      .orderBy("source")
  }

  private val taCodeDetectSql =
    s"""WITH d AS (
       |  SELECT source,
       |    CAST(floor((4.0 * (CAST(len(regexp_extract_all(text, '[{}();=<>|&]'))
       |          + len(string_split(text, '[')) - 1
       |          + len(string_split(text, ']')) - 1 AS DOUBLE) / length(text))
       |      + CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)
       |      + CAST(len(string_split(text, ' ')) AS DOUBLE) / length(text)) * $CodeQ) AS BIGINT) AS score_q
       |  FROM documents)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN score_q >= ${CodeQ / 8} THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
       |  CAST(SUM(score_q) AS BIGINT) AS score_q_sum
       |FROM d GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------ q_span_corrupt

  private val SpanLen = 3   // tokens per corrupted span
  private val SpanMod = 10L // ~1 span start per 10 positions
  private val SpanDocs = 40 // report the first N docs

  /** T5/UL2 span-corruption prep: deterministic span starts (hash over
    * token positions) mask runs of tokens; the INPUT replaces each
    * masked run with a numbered sentinel, the TARGET lists each
    * sentinel with the tokens it hides. All set algebra is equi-join +
    * window (gaps-and-islands for run numbering) and the final texts
    * are ORDER-BY string aggregations — fully declarative, linear in
    * tokens, shuffled only by doc. This is the objective-construction
    * stage between a curated corpus and the trainer's batch files.
    */
  def qSpanCorrupt(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .where(col("doc_id") < SpanDocs)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val starts = docs.where(
        PortableHash.hash64(concat(lit("sc:"), col("doc_id").cast(StringType),
          lit(":"), col("pos").cast(StringType))) % SpanMod === 0)
      .select(col("doc_id"), col("pos").as("sp"))
    // masked position set: each start covers [sp, sp+SpanLen-1]
    val masked = starts
      .select(col("doc_id"), explode(sequence(col("sp"), col("sp") + (SpanLen - 1))).as("pos"))
      .distinct()
    val marked = docs.join(masked.withColumn("m", lit(true)), Seq("doc_id", "pos"), "left")
      .select(col("doc_id"), col("pos"), col("tok"), coalesce(col("m"), lit(false)).as("m"))
    // gaps-and-islands: consecutive masked positions share (pos − rank)
    val wMask = Window.partitionBy("doc_id").orderBy("pos")
    val runs = marked.where(col("m"))
      .withColumn("grp", col("pos") - row_number().over(wMask))
      .withColumn("run_id", dense_rank().over(Window.partitionBy("doc_id").orderBy("grp")))
    // input: unmasked tokens at their positions + one sentinel per run
    // (at the run's first position)
    val sentinels = runs.groupBy("doc_id", "run_id")
      .agg(min("pos").as("pos"))
      .select(col("doc_id"), col("pos"),
        concat(lit("<extra_id_"), col("run_id").cast(StringType), lit(">")).as("piece"))
    val inputPieces = marked.where(!col("m"))
      .select(col("doc_id"), col("pos"), col("tok").as("piece"))
      .union(sentinels)
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    def assemble(pieces: DataFrame): DataFrame =
      pieces.groupBy("doc_id")
        .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("piece")))),
          x => x.getField("piece")), " ").as("txt"))
    // target: per run, sentinel then its hidden tokens, runs in order
    val targetPieces = runs
      .select(col("doc_id"), (col("pos") * 2 + 1).as("pos"), col("tok").as("piece"))
      .union(sentinels.select(col("doc_id"), (col("pos") * 2).as("pos"), col("piece")))
    val inputs = assemble(inputPieces).withColumnRenamed("txt", "input_text")
    val targets = assemble(targetPieces).withColumnRenamed("txt", "target_text")
    val counts = runs.groupBy("doc_id")
      .agg(countDistinct("run_id").as("n_spans"), count(lit(1)).as("n_masked"))
    inputs.join(targets, "doc_id")
      .join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        col("input_text"), col("target_text"))
      .orderBy("doc_id")
  }

  private val qSpanCorruptSql = {
    val h = PortableHash.sql("'sc:' || CAST(doc_id AS STRING) || ':' || CAST(pos AS STRING)")
    s"""WITH mx AS (
       |  SELECT CAST(max(len(string_split(text, ' '))) AS BIGINT) AS m
       |  FROM documents WHERE doc_id < $SpanDocs),
       |dims AS (SELECT unnest(generate_series(1, m)) AS i FROM mx),
       |toks AS (
       |  SELECT doc_id,
       |         list_extract(string_split(text, ' '), CAST(i AS INTEGER)) AS tok,
       |         i - 1 AS pos
       |  FROM documents CROSS JOIN dims
       |  WHERE doc_id < $SpanDocs AND i <= len(string_split(text, ' '))),
       |starts AS (SELECT doc_id, pos AS sp FROM toks WHERE $h % $SpanMod = 0),
       |masked AS (
       |  SELECT DISTINCT doc_id, sp + o AS pos
       |  FROM starts CROSS JOIN (SELECT unnest(range(0, $SpanLen)) AS o)),
       |marked AS (
       |  SELECT t.doc_id, t.pos, t.tok, m.pos IS NOT NULL AS m
       |  FROM toks t LEFT JOIN masked m ON m.doc_id = t.doc_id AND m.pos = t.pos),
       |runs AS (
       |  SELECT doc_id, pos, tok,
       |    dense_rank() OVER (PARTITION BY doc_id ORDER BY grp) AS run_id
       |  FROM (
       |    SELECT doc_id, pos, tok,
       |      pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |    FROM marked WHERE m)),
       |sent AS (
       |  SELECT doc_id, min(pos) AS pos,
       |    '<extra_id_' || CAST(run_id AS STRING) || '>' AS piece
       |  FROM runs GROUP BY doc_id, run_id),
       |inp AS (
       |  SELECT doc_id, array_to_string(list_transform(list_sort(array_agg(
       |      lpad(CAST(pos AS STRING), 7, '0') || ':' || piece)),
       |      s -> substr(s, 9)), ' ') AS input_text FROM (
       |    SELECT doc_id, pos, tok AS piece FROM marked WHERE NOT m
       |    UNION ALL SELECT doc_id, pos, piece FROM sent)
       |  GROUP BY doc_id),
       |tgt AS (
       |  SELECT doc_id, array_to_string(list_transform(list_sort(array_agg(
       |      lpad(CAST(pos AS STRING), 7, '0') || ':' || piece)),
       |      s -> substr(s, 9)), ' ') AS target_text FROM (
       |    SELECT doc_id, pos * 2 + 1 AS pos, tok AS piece FROM runs
       |    UNION ALL SELECT doc_id, pos * 2 AS pos, piece FROM sent)
       |  GROUP BY doc_id),
       |cnt AS (
       |  SELECT doc_id, COUNT(DISTINCT run_id) AS n_spans, COUNT(*) AS n_masked
       |  FROM runs GROUP BY doc_id)
       |SELECT i.doc_id,
       |  COALESCE(c.n_spans, 0) AS n_spans, COALESCE(c.n_masked, 0) AS n_masked,
       |  i.input_text, t.target_text
       |FROM inp i JOIN tgt t ON t.doc_id = i.doc_id
       |LEFT JOIN cnt c ON c.doc_id = i.doc_id
       |ORDER BY i.doc_id""".stripMargin
  }

  // ------------------------------------------------------------ registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_code_detect" -> (taCodeDetect(_, _)),
    "q_span_corrupt" -> (qSpanCorrupt(_, _)))

  def oracles: Map[String, String] = Map(
    "ta_code_detect" -> taCodeDetectSql,
    "q_span_corrupt" -> qSpanCorruptSql)
}
