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

  case class LineQty(l_orderkey: Long, l_quantity: Double)

  /** Typed cogroup: orders ⟂ lineitem aligned per order key through
    * `KeyValueGroupedDataset.cogroup` — the typed twin of a full-outer
    * aggregate join (orders with zero lines and lines with no order
    * both surface). Per-key state is two integer accumulators;
    * l_quantity is integral in this dataset (checked 1..50), so the
    * `toLong` sum is exact and the DuckDB oracle is a FULL OUTER JOIN
    * of the two plain aggregates.
    *
    * At scale: cogroup declares ClusteredDistribution on the key for
    * both children — one exchange per side, the same shape as the
    * full-outer SortMergeJoin, with per-key iterators never
    * materializing more than one order's lines.
    */
  def qTypedCogroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables(s, dir, "orders")
      .select(col("o_orderkey")).as[Long]
    val lines = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity")).as[LineQty]
    orders.groupByKey(identity)
      .cogroup(lines.groupByKey(_.l_orderkey)) { (k, os, ls) =>
        var nOrders = 0L
        os.foreach(_ => nOrders += 1)
        var nLines = 0L; var qty = 0L
        ls.foreach { r => nLines += 1; qty += r.l_quantity.toLong }
        Iterator((k, nOrders, nLines, qty))
      }
      .toDF("okey", "n_orders", "n_lines", "sum_qty")
      .orderBy("okey")
  }

  private val qTypedCogroupSql =
    """WITH o AS (SELECT o_orderkey AS okey, COUNT(*) AS n_orders FROM orders GROUP BY 1),
      |l AS (SELECT l_orderkey AS okey, COUNT(*) AS n_lines,
      |        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |      FROM lineitem GROUP BY 1)
      |SELECT COALESCE(o.okey, l.okey) AS okey,
      |  CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
      |  CAST(COALESCE(l.n_lines, 0) AS BIGINT) AS n_lines,
      |  CAST(COALESCE(l.sum_qty, 0) AS BIGINT) AS sum_qty
      |FROM o FULL OUTER JOIN l ON o.okey = l.okey
      |ORDER BY okey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_typed_agg" -> (qTypedAgg(_, _)),
    "q_typed_cogroup" -> (qTypedCogroup(_, _)))

  def oracles: Map[String, String] = Map(
    "q_typed_agg" -> qTypedAggSql,
    "q_typed_cogroup" -> qTypedCogroupSql)
}
