package graft

/** Partitioning-invariance gate: a distributed query's RESULT must not
  * depend on how many shuffle partitions the session happens to run —
  * the property that separates data-derived arithmetic (bucket offsets
  * computed from counts, hash ranks, checkpointed fixpoints) from
  * accidental partition-derived logic (spark_partition_id offsets,
  * per-partition row numbering without offsets, non-commutative double
  * folds). The queries below are exactly the ones whose shapes COULD
  * get this wrong: the two-phase global ranks, the hash reservoir, the
  * epoch shuffle, the iterative component labels, and a quantized-sum
  * statistic.
  */
class PartitionInvarianceSpec extends SparkSuite {

  private val sensitive = Seq(
    "q_calibration",     // rnValueId bucket-offset rank
    "q_rfm",             // three rank passes incl. quantized-cents buckets
    "q_reservoir_sample", // GroupedTopK heap selection
    "q_global_shuffle",  // hash-bucket two-phase rank
    "q_psi")             // quantized-term distributed sum

  test("results are identical under different shuffle-partition counts") {
    val s = sc
    val orig = s.conf.get("spark.sql.shuffle.partitions")
    def runAll(n: String): Map[String, Seq[String]] = {
      s.conf.set("spark.sql.shuffle.partitions", n)
      sensitive.map { q =>
        q -> SparkEntry.queries(q)(s, sfDir).collect().map(_.toString).toSeq
      }.toMap
    }
    try {
      val a = runAll("3")
      val b = runAll("11")
      sensitive.foreach { q =>
        assert(a(q) == b(q), s"$q changed under a different partition count")
        assert(a(q).nonEmpty)
      }
    } finally s.conf.set("spark.sql.shuffle.partitions", orig)
  }
}
