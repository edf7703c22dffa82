package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene: the driver hashes whatever these maps say, so
  * drift between them is a silent correctness hole.
  */
class RegistrySpec extends AnyFunSuite {

  /** Queries intentionally shipped without a SQL oracle (driver falls
    * back to a rows-only check); each needs a reason here.
    */
  // Since round 5 every query carries an oracle — the last holdout
  // (q_approx_distinct_kmv) became expressible once the splitmix64
  // wrap-around arithmetic was emulated with DuckDB HUGEINTs.
  private val oracleFree = Map.empty[String, String]

  test("every query has an oracle or a documented exemption") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- oracleFree.keySet
    assert(missing.isEmpty, s"oracle-less queries without exemption: $missing")
  }

  test("every oracle corresponds to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("COVERAGE.md's documented query count matches the registry") {
    // the inventory doc is hand-synced and drifted twice (r10, r11);
    // this pins the headline "All N queries" number to the registry
    val text = scala.io.Source.fromFile("COVERAGE.md", "UTF-8").mkString
    val m = """All (\d+) queries""".r.findFirstMatchIn(text)
    assert(m.isDefined, "COVERAGE.md no longer states 'All N queries'")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"COVERAGE.md documents ${m.get.group(1)} queries but the registry " +
        s"has ${SparkEntry.queries.size} — update COVERAGE.md")
  }

  test("no module silently shadows another module's query name") {
    val all = Seq(
      operators.HfpPipeline.queries, operators.Analytics.queries,
      operators.Analytics2.queries, operators.Analytics3.queries,
      operators.Analytics4.queries, operators.Analytics5.queries,
      operators.Analytics6.queries, operators.Analytics7.queries,
      operators.Analytics8.queries,
      operators.CorpusOps.queries, operators.TextAnalysis.queries,
      operators.TextAnalysis2.queries, operators.TextAnalysis3.queries,
      operators.DedupOps.queries,
      operators.Similarity.queries, operators.Similarity2.queries,
      operators.Similarity3.queries, operators.Multimodal.queries,
      operators.AdvancedOps.queries, operators.ScaleOps.queries,
      operators.KMeansIvf.queries, operators.Pipelines.queries,
      operators.TypedOps.queries, operators.GraphOps.queries,
      operators.GraphOps2.queries,
      operators.TrainingOps.queries, operators.TrainingOps2.queries,
      operators.CorpusStats.queries, operators.TokenizerOps.queries,
      operators.CurationOps.queries, operators.CurationOps2.queries,
      operators.MiningOps.queries, operators.GeoOps.queries,
      operators.TimeSeriesOps.queries, operators.GovernanceOps.queries,
      operators.MlOps.queries, operators.MlOps2.queries,
      operators.EvalOps.queries, operators.TopicOps.queries,
      operators.CorpusPrepOps.queries, operators.CurationOps3.queries,
      operators.SpectralOps.queries, operators.FeatureOps.queries,
      operators.EvalOps2.queries, operators.LinkageOps.queries,
      operators.LayoutOps.queries, operators.DedupOps2.queries,
      operators.TrainingOps3.queries, operators.EvalOps3.queries,
      operators.PrefOps.queries, operators.EvalOps4.queries,
      operators.PackOps.queries, operators.ServingOps.queries,
      operators.ServingOps2.queries, operators.TraceOps.queries,
      operators.RewardOps.queries, operators.MoeOps.queries,
      operators.DistillOps.queries)
    val keys = all.flatMap(_.keys)
    val dupes = keys.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names across modules: $dupes")
    assert(keys.size == SparkEntry.queries.size)
  }
}
