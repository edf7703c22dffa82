package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Fourth eval/stats wave: chi-square independence with Cramér's V,
  * Krippendorff's alpha (the agreement coefficient that generalizes
  * beyond fixed rater counts — here on the same 4-rater items as
  * [[PrefOps.qFleissKappa]], so the two coefficients are directly
  * comparable), Cochran's Q (the k-model extension of McNemar), and
  * maximal-marginal-relevance selection over embeddings (the
  * diversity-aware retrieval step RAG evaluation pipelines run).
  * Reference scope: none in the reference (an ETL loader).
  */
object EvalOps4 {

  // ------------------------------------------ q_chi2_independence

  /** Chi-square test of independence on the return-flag × line-status
    * contingency table, with Cramér's V effect size. The full grid
    * (including structurally absent cells, which contribute their
    * whole expectation) is the distinct-rows × distinct-cols cross
    * join — dimension-sized — left-joined to the observed counts; all
    * inputs to the statistic are exact integer counts, and the final
    * ≤ dozen-term double reduction is a SEQUENTIAL fold over the
    * VALUE-sorted term list — the order is defined by the summands
    * themselves (bit-identical doubles on both engines), so partition
    * order cannot perturb the sum AND the oracle spells the same fold
    * in shared dialect (`list_aggregate(list_sort(array_agg(term)),
    * 'sum')`), keeping the statement parity-pinned on spark.sql.
    */
  def qChi2Independence(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("o"))
    val rows = obs.groupBy("l_returnflag").agg(sum("o").as("rt"))
    val cols = obs.groupBy("l_linestatus").agg(sum("o").as("ct"))
    val tot = obs.agg(sum("o").as("n"),
      countDistinct("l_returnflag").as("r"),
      countDistinct("l_linestatus").as("c"))
    val e = (col("rt") * col("ct")).cast(DoubleType) / col("n")
    val od = coalesce(col("o"), lit(0L)).cast(DoubleType)
    val grid = rows.crossJoin(cols)
      .join(obs, Seq("l_returnflag", "l_linestatus"), "left")
      .crossJoin(broadcast(tot))
      .select(col("n"), col("r"), col("c"), (pow(od - e, 2) / e).as("term"))
    grid
      .groupBy("n", "r", "c")
      .agg(sort_array(collect_list(col("term"))).as("cells"))
      .select(col("n"), col("r"), col("c"),
        expr("aggregate(cells, CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
          .as("chi2"))
      .select(col("n"), col("r"), col("c"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        round(col("chi2"), 6).as("chi2"),
        round(sqrt(col("chi2") / (col("n") * least(col("r") - 1, col("c") - 1))), 6)
          .as("cramers_v"))
  }

  private val qChi2IndependenceSql =
    """WITH obs AS (
      |  SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS o
      |  FROM lineitem GROUP BY 1, 2),
      |rws AS (SELECT rf, SUM(o) AS rt FROM obs GROUP BY 1),
      |cls AS (SELECT ls, SUM(o) AS ct FROM obs GROUP BY 1),
      |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
      |  CAST(COUNT(DISTINCT rf) AS BIGINT) AS r,
      |  CAST(COUNT(DISTINCT ls) AS BIGINT) AS c FROM obs),
      |grid AS (
      |  SELECT t.n, t.r, t.c, rws.rf, cls.ls,
      |    pow(CAST(COALESCE(o.o, 0) AS DOUBLE)
      |        - CAST(rws.rt * cls.ct AS DOUBLE) / t.n, 2)
      |      / (CAST(rws.rt * cls.ct AS DOUBLE) / t.n) AS term
      |  FROM rws CROSS JOIN cls
      |  LEFT JOIN obs o ON o.rf = rws.rf AND o.ls = cls.ls
      |  CROSS JOIN tot t),
      |agg AS (
      |  SELECT n, r, c,
      |    list_aggregate(list_sort(array_agg(term)), 'sum') AS chi2
      |  FROM grid GROUP BY 1, 2, 3)
      |SELECT n, r, c, (r - 1) * (c - 1) AS dof, round(chi2, 6) AS chi2,
      |  round(sqrt(chi2 / (n * least(r - 1, c - 1))), 6) AS cramers_v
      |FROM agg""".stripMargin

  // ---------------------------------------------- q_krippendorff

  private val KaRaters = 4

  /** Krippendorff's alpha (nominal metric) over the 4-rater items:
    * observed disagreement from the within-item category counts,
    * expected disagreement from the pooled category totals with the
    * small-sample N−1 correction (Krippendorff, "Content Analysis",
    * §12 — the coincidence-matrix formulation). Every term is an
    * integer sum until the final two divisions, so the coefficient is
    * bit-identical across engines; two keyed aggregates, no windows.
    */
  def qKrippendorff(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables(s, dir, "lineitem")
      .groupBy("l_orderkey", "l_returnflag").agg(count(lit(1)).as("n"))
    val items = counts.groupBy("l_orderkey")
      .agg(sum("n").as("rtot"),
        sum(col("n") * (lit(KaRaters) - col("n"))).as("dis"))
      .where(col("rtot") === KaRaters)
    val doNum = items.agg(count(lit(1)).as("n_items"), sum("dis").as("do_num"))
    val marg = counts.join(items.select("l_orderkey"), "l_orderkey")
      .groupBy("l_returnflag").agg(sum("n").as("nc"))
    marg.crossJoin(broadcast(doNum))
      .agg(max("n_items").as("n_items"), max("do_num").as("dn"),
        sum(col("nc") * (col("n_items") * KaRaters - col("nc"))).as("de_num"))
      .select(col("n_items"),
        (col("dn").cast(DoubleType) /
          (col("n_items") * KaRaters * (KaRaters - 1)).cast(DoubleType)).as("d_o"),
        (col("de_num").cast(DoubleType) /
          ((col("n_items") * KaRaters).cast(DoubleType) *
            (col("n_items") * KaRaters - 1))).as("d_e"))
      .select(col("n_items"), round(col("d_o"), 6).as("d_o"),
        round(col("d_e"), 6).as("d_e"),
        round(lit(1.0) - col("d_o") / col("d_e"), 6).as("alpha"))
  }

  private val qKrippendorffSql =
    s"""WITH counts AS (
       |  SELECT l_orderkey, l_returnflag, COUNT(*) AS n
       |  FROM lineitem GROUP BY 1, 2),
       |items AS (
       |  SELECT l_orderkey, SUM(n * ($KaRaters - n)) AS dis
       |  FROM counts GROUP BY 1 HAVING SUM(n) = $KaRaters),
       |don AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       |  CAST(SUM(dis) AS BIGINT) AS dn FROM items),
       |marg AS (
       |  SELECT c.l_returnflag, CAST(SUM(c.n) AS BIGINT) AS nc
       |  FROM counts c JOIN items i ON i.l_orderkey = c.l_orderkey
       |  GROUP BY 1),
       |agg AS (
       |  SELECT MAX(d.n_items) AS n_items, MAX(d.dn) AS dn,
       |    SUM(m.nc * (d.n_items * $KaRaters - m.nc)) AS de_num
       |  FROM marg m CROSS JOIN don d)
       |SELECT n_items,
       |  round(CAST(dn AS DOUBLE)
       |    / (n_items * ${KaRaters * (KaRaters - 1)}), 6) AS d_o,
       |  round(CAST(de_num AS DOUBLE)
       |    / (CAST(n_items * $KaRaters AS DOUBLE) * (n_items * $KaRaters - 1)), 6) AS d_e,
       |  round(CAST(1 AS DOUBLE)
       |    - (CAST(dn AS DOUBLE) / (n_items * ${KaRaters * (KaRaters - 1)}))
       |      / (CAST(de_num AS DOUBLE)
       |         / (CAST(n_items * $KaRaters AS DOUBLE) * (n_items * $KaRaters - 1))), 6)
       |    AS alpha
       |FROM agg""".stripMargin

  // ------------------------------------------------- q_cochran_q

  /** Cochran's Q for THREE rule models scored on the same rows (the
    * k-treatment extension of [[PrefOps.qMcnemar]]): per-row
    * correctness bits, per-model totals, and the closed-form Q
    * statistic — integer arithmetic end to end until the final
    * division, one scan, one row out. dof = k−1 = 2; the 0.05
    * critical value is 5.991.
    */
  def qCochranQ(s: SparkSession, dir: String): DataFrame = {
    val truth = col("l_returnflag") === "R"
    val a = ((col("l_quantity") > 25) === truth).cast(LongType)
    val b = ((col("l_discount") > 0.05) === truth).cast(LongType)
    val c = ((col("l_tax") > 0.04) === truth).cast(LongType)
    val l = a + b + c
    val agg = Tables(s, dir, "lineitem")
      .agg(count(lit(1)).as("n"), sum(a).as("ga"), sum(b).as("gb"),
        sum(c).as("gc"), sum(l * l).as("sl2"))
    val sl = col("ga") + col("gb") + col("gc")
    val qNum = lit(2L) * (lit(3L) * (col("ga") * col("ga") + col("gb") * col("gb") +
      col("gc") * col("gc")) - sl * sl)
    val qDen = lit(3L) * sl - col("sl2")
    agg.select(col("n"), col("ga"), col("gb"), col("gc"),
      round(qNum.cast(DoubleType) / qDen.cast(DoubleType), 6).as("q"),
      (qNum.cast(DoubleType) / qDen.cast(DoubleType) > 5.991).as("significant"))
  }

  private val qCochranQSql =
    """WITH bits AS (
      |  SELECT
      |    CAST((l_quantity > 25) = (l_returnflag = 'R') AS BIGINT) AS a,
      |    CAST((l_discount > 0.05) = (l_returnflag = 'R') AS BIGINT) AS b,
      |    CAST((l_tax > 0.04) = (l_returnflag = 'R') AS BIGINT) AS c
      |  FROM lineitem),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(a) AS BIGINT) AS ga,
      |    CAST(SUM(b) AS BIGINT) AS gb, CAST(SUM(c) AS BIGINT) AS gc,
      |    CAST(SUM((a + b + c) * (a + b + c)) AS BIGINT) AS sl2
      |  FROM bits)
      |SELECT n, ga, gb, gc,
      |  round(CAST(2 * (3 * (ga * ga + gb * gb + gc * gc)
      |        - (ga + gb + gc) * (ga + gb + gc)) AS DOUBLE)
      |      / CAST(3 * (ga + gb + gc) - sl2 AS DOUBLE), 6) AS q,
      |  CAST(2 * (3 * (ga * ga + gb * gb + gc * gc)
      |      - (ga + gb + gc) * (ga + gb + gc)) AS DOUBLE)
      |    / CAST(3 * (ga + gb + gc) - sl2 AS DOUBLE) > 5.991 AS significant
      |FROM agg""".stripMargin

  // ------------------------------------------------ q_mmr_select

  private val MmrPool = 20
  private val MmrRounds = 3
  private val MmrLambda = 0.7

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein,
    * 1998): from the top-[[MmrPool]] candidates by query relevance,
    * greedily pick [[MmrRounds]] results maximizing
    * λ·rel − (1−λ)·max-similarity-to-selected. The greedy rounds are
    * unrolled (selection state is ≤ 3 broadcast rows); every
    * candidate×selected similarity runs the codegen'd dot kernel on a
    * pool-sized frame, so each round is one narrow broadcast pass —
    * at 100 TB only the initial top-k scan touches the corpus.
    */
  def qMmrSelect(s: SparkSession, dir: String): DataFrame = {
    val e = Similarity.withNorm(s, Tables(s, dir, "embeddings"))
    val q = e.where(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    // r16 (guide §2.4/§5): the greedy rounds below reference `pool`
    // from ~10 spots of the unrolled plan (each round's anti-join,
    // cross-join and re-join), and Spark shares no subplans without
    // materialization — the corpus-sized relevance scan + top-k ran
    // once per reference (68 parquet scans / 126 exchanges in the
    // before-plan). One eager localCheckpoint of the 20-row pool makes
    // every round a broadcast-scale pass over materialized rows: one
    // corpus pass total, plan falls to 2 scans / 5 exchanges.
    val pool = e.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        (expr("graft_dot_f(embedding, qe)") / (col("nrm") * col("qn"))).as("rel"))
      .orderBy(desc("rel"), asc("vec_id")).limit(MmrPool)
      .localCheckpoint()
    var sel = pool.orderBy(desc("rel"), asc("vec_id")).limit(1)
      .select(lit(1L).as("rank"), col("vec_id"), col("embedding"),
        col("nrm"), col("rel"), col("rel").as("mmr"))
    for (t <- 2 to MmrRounds) {
      val selNow = sel.select(col("vec_id").as("sid"),
        col("embedding").as("se"), col("nrm").as("sn"))
      val scored = pool
        .join(broadcast(sel.select("vec_id")), Seq("vec_id"), "left_anti")
        .crossJoin(broadcast(selNow))
        .select(col("vec_id"), col("rel"),
          (expr("graft_dot_f(embedding, se)") / (col("nrm") * col("sn"))).as("sim"))
        .groupBy("vec_id")
        .agg(max("rel").as("rel"), max("sim").as("msim"))
        .select(col("vec_id"), col("rel"),
          (lit(MmrLambda) * col("rel") - lit(1.0 - MmrLambda) * col("msim")).as("mmr"))
        .orderBy(desc("mmr"), asc("vec_id")).limit(1)
      // 1 row; materialized so the next round's three references to
      // `sel` (anti-join, similarity cross-join, union) don't re-run
      // this round's scoring chain (the ta_bpe_train `top` pattern)
      val pick = scored
        .join(pool.select("vec_id", "embedding", "nrm"), "vec_id")
        .select(lit(t.toLong).as("rank"), col("vec_id"), col("embedding"),
          col("nrm"), col("rel"), col("mmr"))
        .localCheckpoint()
      sel = sel.unionByName(pick)
    }
    sel.select(col("rank"), col("vec_id"), round(col("rel"), 6).as("relevance"),
      round(col("mmr"), 6).as("mmr"))
      .orderBy("rank")
  }

  private def dotSql(a: String, b: String) =
    s"list_aggregate(list_transform(generate_series(1, len($a)), i -> CAST(list_extract($a, i) AS DOUBLE) * CAST(list_extract($b, i) AS DOUBLE)), 'sum')"
  private def normSql(a: String) =
    s"sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"

  private val qMmrSelectSql =
    s"""WITH n AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       |q AS (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = 0),
       |pool AS (
       |  SELECT n.vec_id, n.embedding, n.nrm,
       |    ${dotSql("n.embedding", "q.qe")} / (n.nrm * q.qn) AS rel
       |  FROM n, q WHERE n.vec_id <> 0
       |  ORDER BY rel DESC, vec_id ASC LIMIT $MmrPool),
       |s1 AS (SELECT vec_id, embedding, nrm, rel, rel AS mmr FROM pool
       |       ORDER BY rel DESC, vec_id ASC LIMIT 1),
       |s2 AS (
       |  SELECT vec_id, embedding, nrm, rel,
       |    CAST($MmrLambda AS DOUBLE) * rel - CAST(${1.0 - MmrLambda} AS DOUBLE)
       |      * sim AS mmr
       |  FROM (
       |    SELECT p.vec_id, p.embedding, p.nrm, p.rel,
       |      ${dotSql("p.embedding", "s.embedding")} / (p.nrm * s.nrm) AS sim
       |    FROM pool p, s1 s
       |    WHERE p.vec_id NOT IN (SELECT vec_id FROM s1))
       |  ORDER BY mmr DESC, vec_id ASC LIMIT 1),
       |sel12 AS (SELECT vec_id, embedding, nrm FROM s1
       |          UNION ALL SELECT vec_id, embedding, nrm FROM s2),
       |s3 AS (
       |  SELECT vec_id, rel,
       |    CAST($MmrLambda AS DOUBLE) * rel - CAST(${1.0 - MmrLambda} AS DOUBLE)
       |      * msim AS mmr
       |  FROM (
       |    SELECT p.vec_id, p.rel,
       |      MAX(${dotSql("p.embedding", "s.embedding")} / (p.nrm * s.nrm)) AS msim
       |    FROM pool p CROSS JOIN sel12 s
       |    WHERE p.vec_id NOT IN (SELECT vec_id FROM sel12)
       |    GROUP BY p.vec_id, p.rel)
       |  ORDER BY mmr DESC, vec_id ASC LIMIT 1)
       |SELECT CAST(1 AS BIGINT) AS rank, vec_id, round(rel, 6) AS relevance,
       |  round(mmr, 6) AS mmr FROM s1
       |UNION ALL
       |SELECT CAST(2 AS BIGINT), vec_id, round(rel, 6), round(mmr, 6) FROM s2
       |UNION ALL
       |SELECT CAST(3 AS BIGINT), vec_id, round(rel, 6), round(mmr, 6) FROM s3
       |ORDER BY rank""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chi2_independence" -> (qChi2Independence(_, _)),
    "q_krippendorff" -> (qKrippendorff(_, _)),
    "q_cochran_q" -> (qCochranQ(_, _)),
    "q_mmr_select" -> (qMmrSelect(_, _)))

  def oracles: Map[String, String] = Map(
    "q_chi2_independence" -> qChi2IndependenceSql,
    "q_krippendorff" -> qKrippendorffSql,
    "q_cochran_q" -> qCochranQSql,
    "q_mmr_select" -> qMmrSelectSql)
}
