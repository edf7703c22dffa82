package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-shaped dedup: connected components over the verified near-dup
  * pair graph (the transitive-closure step every production dedup
  * pipeline runs after pairwise detection — "A≈B and B≈C" must collapse
  * A, B, C to ONE representative even when A≉C directly).
  *
  * The Spark side is iterative min-label propagation: each round every
  * node takes the min of its own label and its neighbors' labels; the
  * loop stops at a fixpoint (≤ graph-diameter rounds — near-dup
  * components are shallow in practice). Per round: one shuffle join +
  * one aggregate over the EDGE list only — corpus-scale rows never
  * enter the loop. At extreme component sizes the same loop upgrades to
  * the large-star/small-star variant (Kiveris et al., "Connected
  * Components in MapReduce", SOCC'14) without changing this contract.
  *
  * Oracle: DuckDB recursive CTE computing reachability min-label over
  * the identical pair chain — exact, since both sides see the same
  * deterministic edge list.
  */
object GraphOps {

  private val MaxIters = 20

  def ddComponents(s: SparkSession, dir: String): DataFrame = {
    val pairs = DedupOps.verifiedPairs(s, dir)
    // localCheckpoint (not cache): each round's plan would otherwise
    // embed the whole previous round's lineage — after k rounds the
    // plan tree is exponential in k. Checkpointing truncates lineage to
    // the materialized partitions; a cluster deployment would use
    // reliable checkpoint() against the cluster FS instead.
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("lbl", col("doc_id"))
      .localCheckpoint()
    // labels only ever decrease, so Σlbl is strictly monotone until the
    // fixpoint — an unchanged sum IS convergence (one cheap aggregate
    // per round instead of a join + count against the previous state)
    var prevSum = labels.agg(sum("lbl")).head().getLong(0)
    var converged = false
    var iter = 0
    while (!converged && iter < MaxIters) {
      val nbrMin = edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id")).agg(min("lbl").as("nlbl"))
      // every node in the graph has ≥1 edge, so the inner join is total
      val oneHop = labels.join(nbrMin, "doc_id")
        .select(col("doc_id"), least(col("lbl"), col("nlbl")).as("lbl1"))
      // pointer jumping: also adopt the label OF the current label
      // (lbl1 is always a node of the same component, so this is safe
      // and cuts rounds from O(diameter) to O(log diameter))
      val next = oneHop
        .join(labels.select(col("doc_id").as("p"), col("lbl").as("plbl")),
          col("lbl1") === col("p"))
        .select(col("doc_id"), least(col("lbl1"), col("plbl")).as("lbl"))
        .localCheckpoint()
      val s = next.agg(sum("lbl")).head().getLong(0)
      labels = next
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    labels.select(col("doc_id"), col("lbl").as("component")).orderBy("doc_id")
  }

  /** The RECURSIVE keyword is scoped to a NESTED subquery: DuckDB 1.0
    * silently changes UNION dedup semantics for every CTE in a
    * `WITH RECURSIVE` list (repro: `WITH RECURSIVE t AS (SELECT 1
    * UNION SELECT 1 UNION SELECT 1)` has 2 rows, plain WITH has 1),
    * which doubled the band-union candidate rows upstream and zeroed
    * the Jaccard denominator for exact-duplicate docs.
    */
  private val ddComponentsSql =
    s"""WITH ${DedupOps.pairsSqlChain},
       |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs)
       |SELECT doc AS doc_id, least(doc, min(peer)) AS component FROM (
       |  WITH RECURSIVE reach AS (
       |    SELECT a AS doc, b AS peer FROM edges
       |    UNION
       |    SELECT r.doc, e.b FROM reach r JOIN edges e ON r.peer = e.a AND e.b <> r.doc)
       |  SELECT doc, peer FROM reach)
       |GROUP BY doc ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_components" -> (ddComponents(_, _)))

  def oracles: Map[String, String] = Map(
    "dd_components" -> ddComponentsSql)
}
