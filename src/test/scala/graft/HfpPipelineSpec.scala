package graft

import org.apache.spark.sql.functions._
import graft.operators.HfpPipeline
import graft.sources.Tables

/** Pipeline invariants (SURVEY.md §5 strategy items 2-3). */
class HfpPipelineSpec extends SparkSuite {

  private lazy val events = Tables(sc, sfDir, "events")

  test("routing partitions are disjoint and exhaustive") {
    val routed = HfpPipeline.route(
      HfpPipeline.keyFilter(HfpPipeline.castLayer(HfpPipeline.rawStrings(events))))
    val n = routed.count()
    val byTable = routed.groupBy("target_table").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTable.keySet.subsetOf(Set("vehicleposition", "unsignedevent")))
    assert(byTable.values.sum == n)
  }

  test("anti-join output is disjoint from the build side") {
    val casted = HfpPipeline.keyFilter(
      HfpPipeline.castLayer(HfpPipeline.rawStrings(events)))
    val existing = HfpPipeline.existingKeys(events)
    val out = HfpPipeline.dedupAgainst(casted, existing)
    assert(out.join(existing, Seq("uuid"), "inner").count() == 0)
  }

  test("load-then-dedup is a fixpoint (idempotency)") {
    // running the pipeline against its own output keys yields nothing new
    val out = HfpPipeline.full(sc, sfDir)
    val keys = out.select("uuid")
    val again = HfpPipeline.dedupAgainst(
      HfpPipeline.route(HfpPipeline.keyFilter(
        HfpPipeline.castLayer(HfpPipeline.rawStrings(events)))),
      keys.union(HfpPipeline.existingKeys(events)))
    assert(again.count() == 0)
  }

  test("key filter drops exactly the empty/null uuids") {
    val casted = HfpPipeline.castLayer(HfpPipeline.rawStrings(events))
    val total = casted.count()
    val kept = HfpPipeline.keyFilter(casted).count()
    val dropped = casted.where(col("uuid").isNull || col("uuid") === "").count()
    assert(kept + dropped == total)
    assert(dropped > 0) // the % 97 slice exists
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(sc).count() > 0)
  }
}
