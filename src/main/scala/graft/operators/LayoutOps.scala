package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    val shard = s"${PortableHash.sql("CAST(doc_id AS STRING)")} % $NumShards"
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

  // ---------------------------------------------------------- bloom skip

  private val BloomBits = 8192
  private val BloomSeeds = Seq(21, 22, 23)
  private val NProbes = 20

  /** File-level Bloom-filter skipping audit — the point-lookup
    * companion to [[qZoneMap]]'s range pruning (the Parquet
    * bloom_filter / Iceberg skip-index decision): build a 3-hash,
    * 8192-bit membership filter per file over the part key, probe 20
    * point-lookup keys, and report per key how many files the filter
    * admits vs how many truly contain the key — the false-positive
    * overhead a scanner would pay. The filter is modeled as a DISTINCT
    * (file, bit-position) relation so both engines compute it exactly
    * (a deployment stores per-file bitmaps; the admit rule — all k
    * probe positions set — is the same). One corpus pass builds the
    * positions (bounded by files × bits); probes are tiny joins.
    * Bloom's no-false-negative guarantee shows up as
    * n_candidates ≥ n_true on every row.
    */
  def qBloomSkip(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .select(floor(col("l_orderkey") / FileRows).cast(LongType).as("file_id"),
        col("l_partkey"))
    def posCols(key: Column) = array(BloomSeeds.map(seed =>
      PortableHash.hash64(key.cast(StringType), seed) % BloomBits): _*)
    val filePos = li
      .select(col("file_id"), explode(posCols(col("l_partkey"))).as("pos"))
      .distinct()
    val probes = s.range(NProbes.toLong).select((col("id") * 100 + 7).as("probe_key"))
    val probePos = probes
      .select(col("probe_key"), explode(posCols(col("probe_key"))).as("pos"))
      .distinct()
    val needed = probePos.groupBy("probe_key").agg(count(lit(1)).as("np"))
    val admitted = probePos.join(filePos, Seq("pos"))
      .groupBy("probe_key", "file_id").agg(count(lit(1)).as("nm"))
      .join(needed, Seq("probe_key"))
      .where(col("nm") === col("np"))
      .groupBy("probe_key").agg(count(lit(1)).as("n_candidates"))
    val truth = li.distinct()
      .join(probes, li("l_partkey") === probes("probe_key"))
      .groupBy("probe_key").agg(count(lit(1)).as("n_true"))
    val nFiles = li.select("file_id").distinct().agg(count(lit(1)).as("n_files"))
    probes.crossJoin(broadcast(nFiles))
      .join(admitted, Seq("probe_key"), "left_outer")
      .join(truth, Seq("probe_key"), "left_outer")
      .select(col("probe_key"), col("n_files"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        (coalesce(col("n_candidates"), lit(0L)) -
          coalesce(col("n_true"), lit(0L))).as("n_false_pos"))
      .orderBy("probe_key")
  }

  private val qBloomSkipSql = {
    def pos(e: String, seed: Int) =
      s"${PortableHash.sql(s"CAST($e AS STRING)", seed)} % $BloomBits"
    def posUnion(src: String, idCol: String, e: String) =
      BloomSeeds.map(sd =>
        s"SELECT $idCol, ${pos(e, sd)} AS pos FROM $src").mkString("\n  UNION\n  ")
    s"""WITH li AS (
       |  SELECT CAST(floor(l_orderkey / $FileRows) AS BIGINT) AS file_id, l_partkey
       |  FROM lineitem),
       |file_pos AS (
       |  ${posUnion("li", "file_id", "l_partkey")}),
       |probes AS (SELECT CAST(i * 100 + 7 AS BIGINT) AS probe_key
       |           FROM range(0, $NProbes) t(i)),
       |probe_pos AS (
       |  ${posUnion("probes", "probe_key", "probe_key")}),
       |needed AS (SELECT probe_key, COUNT(*) AS np FROM probe_pos GROUP BY 1),
       |admitted AS (
       |  SELECT probe_key, COUNT(*) AS n_candidates FROM (
       |    SELECT p.probe_key, f.file_id, COUNT(*) AS nm
       |    FROM probe_pos p JOIN file_pos f ON f.pos = p.pos
       |    GROUP BY p.probe_key, f.file_id) m
       |  JOIN needed n USING (probe_key)
       |  WHERE m.nm = n.np GROUP BY probe_key),
       |truth AS (
       |  SELECT p.probe_key, COUNT(*) AS n_true FROM (
       |    SELECT DISTINCT file_id, l_partkey FROM li) d
       |  JOIN probes p ON p.probe_key = d.l_partkey GROUP BY 1),
       |nf AS (SELECT COUNT(DISTINCT file_id) AS n_files FROM li)
       |SELECT p.probe_key, nf.n_files,
       |  coalesce(a.n_candidates, 0) AS n_candidates,
       |  coalesce(t.n_true, 0) AS n_true,
       |  coalesce(a.n_candidates, 0) - coalesce(t.n_true, 0) AS n_false_pos
       |FROM probes p CROSS JOIN nf
       |LEFT JOIN admitted a USING (probe_key)
       |LEFT JOIN truth t USING (probe_key)
       |ORDER BY p.probe_key""".stripMargin
  }

  // ------------------------------------------------------ delta encoding

  /** Delta-encoding advisor — the per-column report behind Parquet's
    * encoding choice: within each file (insert-order row groups,
    * [[FileRows]] rows), how many bits does a delta between
    * consecutive values need vs the raw 64-bit word? The clustered key
    * (l_orderkey) compresses to a few bits; the unclustered one
    * (l_partkey) doesn't — the measured gap is the argument for
    * re-clustering before re-encoding. Bit widths are computed as
    * binary-string lengths of the per-file max |delta| (integer-exact
    * in both engines — no float log2), +1 sign bit. The lag windows
    * partition by file — a CONSTANT [[FileRows]]-row unit of work per
    * partition regardless of corpus size, the shard-friendly shape.
    */
  def qDeltaEncoding(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("file_id").orderBy("l_orderkey", "l_linenumber")
    val li = Tables(s, dir, "lineitem")
      .select(floor(col("l_orderkey") / FileRows).cast(LongType).as("file_id"),
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    def report(colName: String): DataFrame = {
      val d = li
        .withColumn("dlt", abs(col(colName) - lag(col(colName), 1).over(w)))
        .where(col("dlt").isNotNull)
        .groupBy("file_id")
        .agg(max("dlt").as("maxd"), count(lit(1)).as("n_deltas"))
        .withColumn("bits", length(conv(col("maxd").cast(StringType), 10, 2)) + 1)
      d.agg(count(lit(1)).as("n_files"), sum("n_deltas").as("n_deltas"),
          sum(col("n_deltas") * col("bits")).as("total_bits"))
        .select(lit(colName).as("col_name"), col("n_files"), col("n_deltas"),
          round(col("total_bits").cast(DoubleType) /
            greatest(col("n_deltas"), lit(1L)).cast(DoubleType), 6)
            .as("avg_delta_bits"),
          round(col("total_bits").cast(DoubleType) /
            greatest(col("n_deltas"), lit(1L)).cast(DoubleType) / 64d, 6)
            .as("vs_raw64"))
    }
    report("l_orderkey").union(report("l_partkey")).orderBy("col_name")
  }

  private val qDeltaEncodingSql = {
    def report(c: String) =
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_files,
         |  CAST(SUM(n_deltas) AS BIGINT) AS n_deltas,
         |  round(CAST(SUM(n_deltas * bits) AS DOUBLE)
         |    / CAST(greatest(SUM(n_deltas), 1) AS DOUBLE), 6) AS avg_delta_bits,
         |  round(CAST(SUM(n_deltas * bits) AS DOUBLE)
         |    / CAST(greatest(SUM(n_deltas), 1) AS DOUBLE) / 64.0, 6) AS vs_raw64
         |FROM (
         |  SELECT file_id, max(dlt) AS maxd, COUNT(*) AS n_deltas,
         |    length(bin(max(dlt))) + 1 AS bits
         |  FROM (
         |    SELECT file_id, abs($c - lag($c, 1) OVER w) AS dlt
         |    FROM li
         |    WINDOW w AS (PARTITION BY file_id ORDER BY l_orderkey, l_linenumber))
         |  WHERE dlt IS NOT NULL GROUP BY file_id)""".stripMargin
    s"""WITH li AS (
       |  SELECT CAST(floor(l_orderkey / $FileRows) AS BIGINT) AS file_id,
       |    l_orderkey, l_linenumber, l_partkey
       |  FROM lineitem)
       |${report("l_orderkey")}
       |UNION ALL
       |${report("l_partkey")}
       |ORDER BY col_name""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shard_plan" -> (qShardPlan(_, _)),
    "q_zone_map" -> (qZoneMap(_, _)),
    "q_bloom_skip" -> (qBloomSkip(_, _)),
    "q_delta_encoding" -> (qDeltaEncoding(_, _)))

  def oracles: Map[String, String] = Map(
    "q_shard_plan" -> qShardPlanSql,
    "q_zone_map" -> qZoneMapSql,
    "q_bloom_skip" -> qBloomSkipSql,
    "q_delta_encoding" -> qDeltaEncodingSql)
}
