package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Skew-handling patterns, verified for semantic equivalence against
  * the plain (skew-vulnerable) formulation.
  *
  * Salting: a hot grouping key concentrates one reducer at 100 TB; the
  * two-phase rewrite — aggregate on (key, salt) first, then combine the
  * partials per key — bounds any single task to 1/SaltBuckets of the
  * hot key's rows. The partial aggregates here are algebraic (count,
  * decimal sum), so phase 2 is exact. AQE's skew-join splitting covers
  * the join-side equivalent at runtime; this is the groupBy-side
  * pattern you apply by hand.
  */
object ScaleOps {

  private val SaltBuckets = 8

  /** Two-phase salted aggregation over events by event_type (the
    * deliberately-low-cardinality = skew-prone key). Output is
    * identical to a direct groupBy — which is exactly what the DuckDB
    * oracle computes.
    */
  def qSaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val dec = col("value").cast(DecimalType(12, 2))
    val phase1 = Tables(s, dir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(SaltBuckets)))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"), sum(dec).as("psum"))
    phase1
      .groupBy("event_type")
      .agg(sum(col("pn")).as("n"), sum(col("psum")).cast(DoubleType).as("sum_value"))
      .orderBy("event_type")
  }

  private val qSaltedSql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Join-side salting: when one join key is hot and BOTH sides are too
    * large to broadcast, replicate the build side across `buckets`
    * salt values and join on (key, salt) — the hot key's probe rows
    * spread over `buckets` reducers instead of one. Result is
    * row-identical to the unsalted join (tested); AQE's skew-join
    * split is the automatic variant, this is the explicit one for
    * engines/plans where AQE can't see the skew.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int = SaltBuckets): DataFrame = {
    // the salt must vary PER ROW (a key-derived salt would land the hot
    // key in one bucket again); the join result is invariant to which
    // salt each row draws, so a per-row id works
    val salted = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Deterministic hash sampling: the reproducible alternative to
    * `df.sample()` for training pipelines — membership depends only on
    * the key, so re-runs, retries, and different partitionings all pick
    * the same rows, and joins between sampled tables stay consistent.
    */
  def qHashSample(s: SparkSession, dir: String): DataFrame = {
    val bucket = graft.functions.PortableHash.hash64(col("doc_id").cast(StringType)) % 100
    Tables(s, dir, "documents")
      .where(bucket < 10)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  private val qHashSampleSql = {
    val bucket = s"${graft.functions.PortableHash.sql("CAST(doc_id AS STRING)")} % 100"
    s"""SELECT doc_id, lang, n_chars FROM documents
       |WHERE $bucket < 10 ORDER BY doc_id""".stripMargin
  }

  /** Deterministic train/val/test split with per-split counts. */
  def qTrainSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = graft.functions.PortableHash.hash64(col("doc_id").cast(StringType)) % 100
    Tables(s, dir, "documents")
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("split")
  }

  private val qTrainSplitSql = {
    val bucket = s"${graft.functions.PortableHash.sql("CAST(doc_id AS STRING)")} % 100"
    s"""SELECT CASE WHEN $bucket < 80 THEN 'train'
       |            WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM documents GROUP BY 1 ORDER BY split""".stripMargin
  }

  /** Incremental aggregation (materialized-view maintenance): fold a
    * new day's delta into yesterday's aggregate STATE instead of
    * recomputing from all history — count/sum are algebraic, so
    * state ⊎ delta-partials re-aggregated equals the full recompute
    * (which is exactly what the oracle runs). At 100 TB this turns a
    * daily full-history scan into a delta-sized one.
    */
  def qIncrAgg(s: SparkSession, dir: String): DataFrame = {
    val dec = col("value").cast(DecimalType(12, 2))
    val ev = Tables(s, dir, "events")
    val split = "2024-01-25"
    val state = ev.where(to_date(col("ts")) < lit(split))
      .groupBy("event_type").agg(count(lit(1)).as("pn"), sum(dec).as("psum"))
    val delta = ev.where(to_date(col("ts")) >= lit(split))
      .groupBy("event_type").agg(count(lit(1)).as("pn"), sum(dec).as("psum"))
    state.union(delta)
      .groupBy("event_type")
      .agg(sum("pn").as("n"), sum("psum").cast(DoubleType).as("sum_value"))
      .orderBy("event_type")
  }

  private val qIncrAggSql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Incremental JOIN maintenance — the delta-join identity behind
    * every streaming materialized view: with both sides split into a
    * materialized base and a new-arrivals delta,
    * L⋈R = (Lb⋈Rb) ∪ (ΔL⋈Rb) ∪ (Lb⋈ΔR) ∪ (ΔL⋈ΔR), so refreshing the
    * view costs only the delta terms (each a join of a SMALL relation
    * against a base that never re-shuffles — at 100 TB the base stays
    * bucketed by the join key and each refresh probes it with the
    * delta). The split is the deterministic portable-hash rule (~10%
    * delta per side). The query computes the full join and the
    * four-term incremental union and reports both with a consistency
    * verdict — row counts and DECIMAL-exact revenue must agree.
    */
  def qIncrJoin(s: SparkSession, dir: String): DataFrame = {
    val dec = col("o_totalprice").cast(DecimalType(12, 2))
    val ord = Tables(s, dir, "orders")
      .select(col("o_custkey"), dec.as("p"),
        (graft.functions.PortableHash.hash64(
          col("o_orderkey").cast(StringType), 31) % 10 === 0).as("dl"))
    val cust = Tables(s, dir, "customer")
      .select(col("c_custkey").as("o_custkey"),
        (graft.functions.PortableHash.hash64(
          col("c_custkey").cast(StringType), 37) % 10 === 0).as("dc"))
    // the four REAL incremental joins (what a view refresh executes);
    // the oracle partitions the one full join by the same flags — two
    // different plans whose counts and DECIMAL sums must coincide
    val (lb, ld) = (ord.where(!col("dl")), ord.where(col("dl")))
    val (rb, rd) = (cust.where(!col("dc")), cust.where(col("dc")))
    def agg(df: DataFrame, n: String, sm: String) =
      df.agg(count(lit(1)).as(n), coalesce(sum("p"), lit(0).cast(DecimalType(12, 2))).as(sm))
    val full = agg(ord.join(cust, Seq("o_custkey")), "full_rows", "full_sum")
    val mat = agg(lb.join(rb, Seq("o_custkey")), "mat_rows", "mat_sum")
    val delta = agg(
      ld.join(rb, Seq("o_custkey"))
        .unionByName(lb.join(rd, Seq("o_custkey")))
        .unionByName(ld.join(rd, Seq("o_custkey"))),
      "delta_rows", "delta_sum")
    full.crossJoin(mat).crossJoin(delta)
      .select(col("full_rows"),
        (col("mat_rows") + col("delta_rows")).as("incr_rows"),
        col("delta_rows"),
        col("full_sum").cast(DoubleType).as("full_value"),
        (col("mat_sum") + col("delta_sum")).cast(DoubleType).as("incr_value"),
        (col("full_rows") === col("mat_rows") + col("delta_rows") &&
          col("full_sum") === col("mat_sum") + col("delta_sum")).as("consistent"))
  }

  private val qIncrJoinSql = {
    val hl = graft.functions.PortableHash.sql("CAST(o_orderkey AS STRING)", 31)
    val hc = graft.functions.PortableHash.sql("CAST(c_custkey AS STRING)", 37)
    s"""WITH j AS (
       |  SELECT CAST(o_totalprice AS DECIMAL(12,2)) AS p,
       |    ($hl % 10 = 0) AS dl, ($hc % 10 = 0) AS dc
       |  FROM orders JOIN customer ON c_custkey = o_custkey),
       |f AS (SELECT COUNT(*) AS full_rows,
       |        coalesce(SUM(p), CAST(0 AS DECIMAL(12,2))) AS full_sum FROM j),
       |m AS (SELECT COUNT(*) AS mat_rows,
       |        coalesce(SUM(p), CAST(0 AS DECIMAL(12,2))) AS mat_sum
       |      FROM j WHERE NOT dl AND NOT dc),
       |d AS (SELECT COUNT(*) AS delta_rows,
       |        coalesce(SUM(p), CAST(0 AS DECIMAL(12,2))) AS delta_sum
       |      FROM j WHERE dl OR dc)
       |SELECT f.full_rows, m.mat_rows + d.delta_rows AS incr_rows, d.delta_rows,
       |  CAST(f.full_sum AS DOUBLE) AS full_value,
       |  CAST(m.mat_sum + d.delta_sum AS DOUBLE) AS incr_value,
       |  (f.full_rows = m.mat_rows + d.delta_rows
       |    AND f.full_sum = m.mat_sum + d.delta_sum) AS consistent
       |FROM f CROSS JOIN m CROSS JOIN d""".stripMargin
  }

  /** Column profiling (the data-quality pass before any pipeline run):
    * per-column row/null/distinct counts, numeric min/max. One narrow
    * scan, one aggregate row exploded to a row per column.
    */
  def qProfile(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val numeric = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val varchar = Seq("o_orderstatus", "o_orderpriority")
    val rows = numeric.map { c =>
      o.agg(lit(c).as("col_name"), count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1).otherwise(0)).cast(LongType).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast(DoubleType).as("min_d"),
        max(col(c)).cast(DoubleType).as("max_d"))
    } ++ varchar.map { c =>
      o.agg(lit(c).as("col_name"), count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1).otherwise(0)).cast(LongType).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        lit(null).cast(DoubleType).as("min_d"),
        lit(null).cast(DoubleType).as("max_d"))
    }
    rows.reduce(_ union _).orderBy("col_name")
  }

  private val qProfileSql = {
    val numeric = Seq("o_orderkey", "o_custkey", "o_totalprice").map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS DOUBLE) AS min_d, CAST(MAX($c) AS DOUBLE) AS max_d
         |FROM orders""".stripMargin
    }
    val varchar = Seq("o_orderstatus", "o_orderpriority").map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_d, CAST(NULL AS DOUBLE) AS max_d
         |FROM orders""".stripMargin
    }
    (numeric ++ varchar).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Z-order (Morton) layout key: interleave the low 10 bits of two
    * dimensions so rows close in BOTH dimensions sort near each other —
    * the multi-dimensional clustering that makes min/max data skipping
    * work on two filter columns at once. The sort itself is the
    * operator; at scale it feeds `write.sortBy`/repartitionByRange.
    */
  def qZorder(s: SparkSession, dir: String): DataFrame = {
    val x = col("event_id") % 1024
    val y = col("user_id") % 1024
    val z = (0 until 10).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), z.as("zcode"))
      .orderBy("zcode", "event_id")
      .limit(1000)
  }

  private val qZorderSql = {
    val terms = (0 until 10).map { i =>
      s"(((event_id % 1024) >> $i) & 1) * ${1L << (2 * i)} + (((user_id % 1024) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    s"""SELECT event_id, user_id, CAST($terms AS BIGINT) AS zcode
       |FROM events ORDER BY zcode, event_id LIMIT 1000""".stripMargin
  }

  /** Driver-facing salted-join query: lineitem⋈orders through
    * [[saltedJoin]] with a shuffle-hash hint (broadcast would bypass
    * the skew machinery being demonstrated), aggregated to priority
    * totals. The oracle is the PLAIN unsalted join — salting must be
    * invisible in the result, and the sums are exact decimals.
    */
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("okey"),
        col("l_extendedprice").cast(DecimalType(12, 2)).as("price"))
    val ord = Tables(s, dir, "orders")
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      .hint("shuffle_hash")
    saltedJoin(li, ord, "okey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("price").cast(DoubleType).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  private val qSaltedJoinSql =
    """SELECT o.o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Co-located BUCKETED join — the shuffle-elimination strategy for
    * repeated big⋈big joins at 100 TB: both sides are written
    * `bucketBy(N, key)` once, and every subsequent join on that key
    * reads bucket-aligned files with NO exchange on either side (the
    * write cost is paid once, the shuffle saving is per-query).
    * Here: orders ⋈ customer bucketed on the custkey, aggregated to
    * market-segment totals. The oracle is the plain join — bucketing
    * must be invisible in the result. PlanAuditSpec pins the
    * no-Exchange-below-the-join plan shape.
    */
  private val BucketCount = 8
  // per-JVM tag: the in-memory catalog dies with the session but the
  // warehouse directory doesn't — a fresh session must not trip over a
  // previous run's table location
  private lazy val jvmTag = ProcessHandle.current().pid().toString

  def qBucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val tag = s"g${math.abs(dir.hashCode)}_$jvmTag"
    val odersT = s"graft_bkt_orders_$tag"
    val custT = s"graft_bkt_customer_$tag"
    if (!s.catalog.tableExists(odersT)) {
      // clear any leftover location from a dead session with a recycled
      // pid — the managed-table CREATE refuses to reuse an existing dir.
      // java.io.File is deliberate here (unlike the load path, which
      // probes via FsUtil): this cleanup targets the LOCAL warehouse dir
      // of a demo session only, never a cluster URI
      val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath
      Seq(odersT, custT).map(new java.io.File(wh, _)).filter(_.exists()).foreach { d =>
        java.nio.file.Files.walk(d.toPath)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
      Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(BucketCount, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable(odersT)
      Tables(s, dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .write.bucketBy(BucketCount, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable(custT)
    }
    // merge hint: at harness scale Catalyst would broadcast the small
    // side and bypass the bucketing being demonstrated; at 100 TB both
    // sides exceed any broadcast threshold and SMJ is what runs anyway
    s.table(odersT).hint("merge")
      .join(s.table(custT), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DoubleType)
          .as("sum_price"))
      .orderBy("c_mktsegment")
  }

  private val qBucketedJoinSql =
    """SELECT c.c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------ q_skew_profile

  /** Join-key skew profiler — the diagnostic run BEFORE picking a
    * salted-join factor (q_salted_join applies what this recommends):
    * per-key frequencies of the event-type key, the top-10 heavy keys
    * with parts-per-million share, and the salt factor
    * ceil(max_cnt·D/N) that would level the heaviest key to the mean.
    * All integer arithmetic off one map-side-combinable aggregate; the
    * top-k and the global stats live on the key-domain relation.
    */
  def qSkewProfile(s: SparkSession, dir: String): DataFrame = {
    val freq = Tables(s, dir, "events")
      .groupBy(col("event_type").as("key")).agg(count(lit(1)).as("cnt"))
    val stats = freq.agg(sum("cnt").as("n"), count(lit(1)).as("d"),
      max("cnt").as("max_cnt"))
    freq.orderBy(desc("cnt"), asc("key")).limit(10)
      .crossJoin(broadcast(stats))
      .selectExpr("key", "cnt",
        "(cnt * 1000000) DIV n AS share_ppm",
        "(max_cnt * d + n - 1) DIV n AS rec_salt")
      .orderBy(desc("cnt"), asc("key"))
  }

  private val qSkewProfileSql =
    """WITH f AS (SELECT event_type AS key, COUNT(*) AS cnt FROM events GROUP BY 1),
      |s AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, COUNT(*) AS d,
      |             CAST(MAX(cnt) AS BIGINT) AS max_cnt FROM f),
      |top AS (SELECT key, cnt FROM f ORDER BY cnt DESC, key ASC LIMIT 10)
      |SELECT key, cnt, divide(cnt * 1000000, n) AS share_ppm,
      |  divide(max_cnt * d + n - 1, n) AS rec_salt
      |FROM top CROSS JOIN s ORDER BY cnt DESC, key ASC""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bucketed_join" -> (qBucketedJoin(_, _)),
    "q_salted_agg" -> (qSaltedAgg(_, _)),
    "q_salted_join" -> (qSaltedJoin(_, _)),
    "q_hash_sample" -> (qHashSample(_, _)),
    "q_train_split" -> (qTrainSplit(_, _)),
    "q_incr_agg" -> (qIncrAgg(_, _)),
    "q_incr_join" -> (qIncrJoin(_, _)),
    "q_profile" -> (qProfile(_, _)),
    "q_zorder" -> (qZorder(_, _)),
    "q_skew_profile" -> (qSkewProfile(_, _)))

  def oracles: Map[String, String] = Map(
    "q_bucketed_join" -> qBucketedJoinSql,
    "q_salted_agg" -> qSaltedSql,
    "q_salted_join" -> qSaltedJoinSql,
    "q_hash_sample" -> qHashSampleSql,
    "q_train_split" -> qTrainSplitSql,
    "q_incr_agg" -> qIncrAggSql,
    "q_incr_join" -> qIncrJoinSql,
    "q_profile" -> qProfileSql,
    "q_zorder" -> qZorderSql,
    "q_skew_profile" -> qSkewProfileSql)
}
