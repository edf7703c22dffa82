package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash
import graft.sources.Tables

/** Physical-layout planning analytics — the reports a lakehouse team
  * reads before choosing how to shard training corpora and cluster
  * fact tables. Reference scope: none in the reference (an ETL
  * loader); these extend the table-maintenance surface beside
  * `q_compaction_plan` / `q_zorder`.
  *
  * Scale: both queries are one aggregation pass over the fact table
  * (map-side combinable, no windows over row-level input); everything
  * after the first groupBy operates on file/shard-count-sized
  * relations (≤ thousands of rows regardless of corpus size).
  */
object LayoutOps {

  // ---------------------------------------------------------- shard plan

  private val NumShards = 16

  /** Deterministic training-shard assignment audit: hash-partition the
    * document corpus into [[NumShards]] shards (the reproducible
    * `q_hash_sample` rule, so retries and incremental loads land docs
    * identically) and report each shard's doc/token/char mass plus its
    * skew against the ideal uniform share — the go/no-go check before
    * writing a sharded training set. One corpus pass; the skew join is
    * against a broadcast 1-row total.
    */
  def qShardPlan(s: SparkSession, dir: String): DataFrame = {
    val shard = PortableHash.hash64(col("doc_id").cast(StringType)) % NumShards
    val perShard = Tables(s, dir, "documents")
      .select(shard.as("shard_id"),
        size(split(col("text"), " ")).cast(LongType).as("ntok"), col("n_chars"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"),
        sum("n_chars").as("n_chars"))
    val total = perShard.agg(sum("n_docs").as("total_docs"))
    perShard.crossJoin(broadcast(total))
      .select(col("shard_id"), col("n_docs"), col("n_tokens"), col("n_chars"),
        round(col("n_docs") * NumShards.toLong /
          greatest(col("total_docs"), lit(1L)).cast(DoubleType), 6).as("skew"))
      .orderBy("shard_id")
  }

  private val qShardPlanSql = {
    val shard = s"${PortableHash.sql("CAST(doc_id AS VARCHAR)")} % $NumShards"
    s"""WITH per_shard AS (
       |  SELECT $shard AS shard_id, COUNT(*) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
       |  FROM documents GROUP BY 1),
       |total AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM per_shard)
       |SELECT shard_id, n_docs, n_tokens, n_chars,
       |  round(n_docs * $NumShards / CAST(greatest(total_docs, 1) AS DOUBLE), 6) AS skew
       |FROM per_shard CROSS JOIN total ORDER BY shard_id""".stripMargin
  }

  // ------------------------------------------------------------ zone map

  /** File size (rows) for the synthetic insert-order layout. */
  private val FileRows = 250L

  private val P1Lo = "1996-01-01"
  private val P1Hi = "1996-04-01" // exclusive
  private val P2Lo = "1999-01-01"

  /** Zone-map (min/max statistics) pruning effectiveness report: the
    * same fact rows grouped into files two ways — insert order
    * (orderkey ranges) vs date-clustered (ship month) — then for two
    * ship-date predicates, how many files a min/max zone map lets a
    * scanner skip and how many rows the surviving files hold. This is
    * the measurement that justifies a re-clustering (Z-order /
    * partition-by-date) decision: the row counts are identical across
    * layouts, only the file-skip ratio moves. One aggregation pass per
    * layout; the report derives from the file-count-sized zone tables.
    */
  def qZoneMap(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    def ts(d: String) = lit(d).cast(TimestampType)
    def zones(fileId: Column) = li
      .groupBy(fileId.as("file_id"))
      .agg(min("l_shipdate").as("mn"), max("l_shipdate").as("mx"),
        count(lit(1)).as("n_rows"),
        sum(when(col("l_shipdate") >= ts(P1Lo) && col("l_shipdate") < ts(P1Hi), 1L)
          .otherwise(0L)).as("m1"),
        sum(when(col("l_shipdate") >= ts(P2Lo), 1L).otherwise(0L)).as("m2"))
    def report(z: DataFrame, layout: String, pred: String, overlap: Column,
               matched: Column): DataFrame =
      z.agg(count(lit(1)).as("n_files"),
          sum(when(overlap, 1L).otherwise(0L)).as("files_scanned"),
          coalesce(sum(when(overlap, col("n_rows"))), lit(0L)).as("rows_scanned"),
          coalesce(sum(matched), lit(0L)).as("rows_matched"))
        .select(lit(layout).as("layout"), lit(pred).as("predicate"),
          col("n_files"), col("files_scanned"), col("rows_scanned"),
          col("rows_matched"),
          round(col("files_scanned") /
            greatest(col("n_files"), lit(1L)).cast(DoubleType), 6).as("scan_frac"))
    val ov1 = col("mn") < ts(P1Hi) && col("mx") >= ts(P1Lo)
    val ov2 = col("mx") >= ts(P2Lo)
    def both(z: DataFrame, layout: String): DataFrame =
      report(z, layout, "q1_1996q1", ov1, col("m1"))
        .union(report(z, layout, "q2_ge_1999", ov2, col("m2")))
    both(zones(floor(col("l_orderkey") / FileRows).cast(LongType)), "insert_order")
      .union(both(
        zones((year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).cast(LongType)),
        "date_clustered"))
      .orderBy("layout", "predicate")
  }

  private val qZoneMapSql = {
    def zones(fileExpr: String) =
      s"""SELECT $fileExpr AS file_id, min(l_shipdate) AS mn, max(l_shipdate) AS mx,
         |    COUNT(*) AS n_rows,
         |    CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '$P1Lo'
         |               AND l_shipdate < TIMESTAMP '$P1Hi' THEN 1 ELSE 0 END) AS BIGINT) AS m1,
         |    CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '$P2Lo' THEN 1 ELSE 0 END) AS BIGINT) AS m2
         |  FROM lineitem GROUP BY 1""".stripMargin
    def report(ztab: String, layout: String, pred: String, overlap: String, m: String) =
      s"""SELECT '$layout' AS layout, '$pred' AS predicate, COUNT(*) AS n_files,
         |  CAST(SUM(CASE WHEN $overlap THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
         |  CAST(coalesce(SUM(CASE WHEN $overlap THEN n_rows END), 0) AS BIGINT) AS rows_scanned,
         |  CAST(coalesce(SUM($m), 0) AS BIGINT) AS rows_matched,
         |  round(CAST(SUM(CASE WHEN $overlap THEN 1 ELSE 0 END) AS DOUBLE)
         |    / greatest(COUNT(*), 1), 6) AS scan_frac
         |FROM $ztab""".stripMargin
    val ov1 = s"mn < TIMESTAMP '$P1Hi' AND mx >= TIMESTAMP '$P1Lo'"
    val ov2 = s"mx >= TIMESTAMP '$P2Lo'"
    s"""WITH zi AS (${zones(s"CAST(floor(l_orderkey / $FileRows) AS BIGINT)")}),
       |zd AS (${zones("CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)")})
       |${report("zi", "insert_order", "q1_1996q1", ov1, "m1")}
       |UNION ALL ${report("zi", "insert_order", "q2_ge_1999", ov2, "m2")}
       |UNION ALL ${report("zd", "date_clustered", "q1_1996q1", ov1, "m1")}
       |UNION ALL ${report("zd", "date_clustered", "q2_ge_1999", ov2, "m2")}
       |ORDER BY layout, predicate""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shard_plan" -> (qShardPlan(_, _)),
    "q_zone_map" -> (qZoneMap(_, _)))

  def oracles: Map[String, String] = Map(
    "q_shard_plan" -> qShardPlanSql,
    "q_zone_map" -> qZoneMapSql)
}
