package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Corpus organization: unsupervised topic labeling by composing the
  * engine's own primitives — embedding-space clustering (the IVF cell
  * assignment from [[Similarity]]) labeled with class-based TF-IDF
  * terms (the BERTopic shape: cluster → c-TF-IDF → top terms). This is
  * the "what is IN this corpus" readout a training-data curation run
  * ends with.
  */
object TopicOps {

  private val TopTerms = 5

  /** Top-5 c-TF-IDF terms per embedding cluster. Scale shape: the
    * cluster assignment is the IVF argmin (|vectors|·|centroids| map
    * work, no shuffle beyond the 1:1 doc join); the term stage is two
    * map-side-combinable aggregates over (cluster, term) — the
    * cluster-level relation is corpus-size-independent, and the top-k
    * is a per-cluster WindowGroupLimit. Exact: term counts are
    * integers; the idf factor is 1e-6-rounded-then-integer, so every
    * score is exact integer arithmetic with declared tiebreaks.
    */
  def taClusterTopics(s: SparkSession, dir: String): DataFrame = {
    val e = Similarity.withNorm(s, Tables(s, dir, "embeddings"))
    val centroids = e.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val cells = Similarity.assignCells(e, centroids)
      .select(col("vec_id").as("doc_id"), col("cell"))
    val docTok = Tables(s, dir, "documents")
      .join(cells, "doc_id")
      .select(col("cell"), explode(split(col("text"), " ")).as("tok"))
    val ct = docTok.groupBy("cell", "tok").agg(count(lit(1)).as("cnt"))
    // cluster count rides a broadcast 1-row aggregate — no driver value
    val nc = ct.agg(countDistinct("cell").as("c"))
    val idf = ct.groupBy("tok").agg(count(lit(1)).as("dfc"))
      .crossJoin(broadcast(nc))
      .select(col("tok"),
        floor(round(log2(col("c").cast(DoubleType) / col("dfc").cast(DoubleType)), 6)
          * 1000000L + 0.5).cast(LongType).as("idf_q"))
    val scored = ct.join(idf, "tok")
      .select(col("cell"), col("tok"), (col("cnt") * col("idf_q")).as("score_q"))
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy("cell").orderBy(desc("score_q"), asc("tok"))).cast(LongType))
      .where(col("rnk") <= TopTerms)
      .select(col("cell"), col("rnk"), col("tok"), col("score_q"))
      .orderBy("cell", "rnk")
  }

  private val taClusterTopicsSql = {
    val dot = "list_aggregate(list_transform(generate_series(1, len(n.embedding)), i -> CAST(list_extract(n.embedding, i) AS DOUBLE) * CAST(list_extract(cent.ce, i) AS DOUBLE)), 'sum')"
    def norm(a: String) =
      s"sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    s"""WITH n AS (SELECT vec_id, embedding, ${norm("embedding")} AS nrm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM n WHERE vec_id % 50 = 0),
       |assigned AS (
       |  SELECT vec_id AS doc_id, cell FROM (
       |    SELECT n.vec_id, cent.cid AS cell,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY $dot / (n.nrm * cent.cn) DESC, cent.cid ASC) AS rk
       |    FROM n CROSS JOIN cent) WHERE rk = 1),
       |dt AS (
       |  SELECT a.cell, unnest(string_split(d.text, ' ')) AS tok
       |  FROM documents d JOIN assigned a ON a.doc_id = d.doc_id),
       |ct AS (SELECT cell, tok, COUNT(*) AS cnt FROM dt GROUP BY cell, tok),
       |nc AS (SELECT COUNT(DISTINCT cell) AS c FROM ct),
       |idf AS (
       |  SELECT tok, CAST(floor(round(log2(CAST(c AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 6)
       |    * 1000000 + 0.5) AS BIGINT) AS idf_q
       |  FROM ct, nc GROUP BY tok, c),
       |scored AS (
       |  SELECT ct.cell, ct.tok, CAST(ct.cnt * idf.idf_q AS BIGINT) AS score_q
       |  FROM ct JOIN idf ON idf.tok = ct.tok),
       |r AS (
       |  SELECT cell, tok, score_q,
       |    row_number() OVER (PARTITION BY cell ORDER BY score_q DESC, tok ASC) AS rnk
       |  FROM scored)
       |SELECT cell, CAST(rnk AS BIGINT) AS rnk, tok, score_q
       |FROM r WHERE rnk <= $TopTerms ORDER BY cell, rnk""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_cluster_topics" -> (taClusterTopics(_, _)))

  def oracles: Map[String, String] = Map(
    "ta_cluster_topics" -> taClusterTopicsSql)
}
