package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Typed Dataset API surface: case-class rows + `KeyValueGroupedDataset`
  * + a custom `Aggregator` — the Encoder-based custom-aggregation tier
  * (the other two tiers, TypedImperativeAggregate and built-in
  * aggregates, are covered by GraftExpressions and the Analytics
  * modules). The aggregator state is integer sums, so results are
  * exact and the DuckDB oracle is a plain GROUP BY.
  */
object TypedOps {

  case class DocRow(lang: String, n_chars: Long, text: String)
  case class LangStats(n_docs: Long, total_chars: Long, total_tokens: Long)

  /** Typed fold over documents: counts + char/token totals per group.
    * Commutative integer merge → map-side partial aggregation applies,
    * same as any built-in agg.
    */
  val langStatsAgg: Aggregator[DocRow, LangStats, LangStats] =
    new Aggregator[DocRow, LangStats, LangStats] {
      override def zero: LangStats = LangStats(0L, 0L, 0L)
      override def reduce(b: LangStats, r: DocRow): LangStats =
        LangStats(b.n_docs + 1, b.total_chars + r.n_chars,
          b.total_tokens + (r.text.count(_ == ' ') + 1))
      override def merge(a: LangStats, b: LangStats): LangStats =
        LangStats(a.n_docs + b.n_docs, a.total_chars + b.total_chars,
          a.total_tokens + b.total_tokens)
      override def finish(r: LangStats): LangStats = r
      override def bufferEncoder: Encoder[LangStats] = Encoders.product[LangStats]
      override def outputEncoder: Encoder[LangStats] = Encoders.product[LangStats]
    }

  /** Per-language corpus stats through the typed path:
    * Dataset[DocRow] → groupByKey → custom Aggregator → flatten.
    * The mean divides two exact integers once — portable.
    */
  def qTypedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(col("lang"), col("n_chars"), col("text"))
      .as[DocRow]
      .groupByKey(_.lang)
      .agg(langStatsAgg.toColumn.name("stats"))
      .select(col("key").as("lang"),
        col("stats.n_docs").as("n_docs"),
        col("stats.total_chars").as("total_chars"),
        col("stats.total_tokens").as("total_tokens"),
        (col("stats.total_chars").cast("double") / col("stats.n_docs")).as("mean_chars"))
      .orderBy("lang")
  }

  private val qTypedAggSql =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_typed_agg" -> (qTypedAgg(_, _)))

  def oracles: Map[String, String] = Map(
    "q_typed_agg" -> qTypedAggSql)
}
