package graft

/** The façade delegates to the registry-backed operators — smoke every
  * namespace once so a rename in either layer fails loudly.
  */
class GraftFacadeSpec extends SparkSuite {
  test("façade entry points return non-empty frames") {
    assert(Graft.table(sc, sfDir, "nation").count() == 25)
    assert(Graft.pipeline.load(sc, sfDir).count() > 0)
    assert(Graft.text.qualityScores(sc, sfDir).count() == 500)
    assert(Graft.dedup.minhashPairs(sc, sfDir).count() > 0)
    assert(Graft.ann.bruteForce(sc, sfDir).count() == 10)
    assert(Graft.training.trainValTestSplit(sc, sfDir).count() == 3)
    assert(Graft.ops.profile(sc, sfDir).count() == 5)
    assert(Graft.mining.skyline(sc, sfDir).count() > 0)
    assert(Graft.ml.pcaTopDirection(sc, sfDir).count() == 64)
    assert(Graft.ml.featureQuantiles(sc, sfDir).count() == 64)
    assert(Graft.ml.bootstrapCi(sc, sfDir).count() == 5)
    assert(Graft.text.perplexityBuckets(sc, sfDir).count() > 0)
    assert(Graft.dedup.supershinglePairs(sc, sfDir).count() > 0)
    assert(Graft.dedup.entityResolve(sc, sfDir).count() > 0)
    assert(Graft.training.shardPlan(sc, sfDir).count() > 0)
    assert(Graft.training.curationFunnel(sc, sfDir).count() == 4)
    assert(Graft.ops.zoneMapReport(sc, sfDir).count() == 4)
    assert(Graft.ml.lDiversity(sc, sfDir).count() > 0)
    assert(Graft.ml.theilSen(sc, sfDir).count() == 5)
    assert(Graft.ml.meanReciprocalRank(sc, sfDir).count() > 0)
    assert(Graft.ml.giniConcentration(sc, sfDir).count() == 1)
    assert(Graft.ml.htEstimate(sc, sfDir).count() == 1)
  }
}
