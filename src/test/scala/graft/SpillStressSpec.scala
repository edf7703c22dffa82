package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Spill gate — the one 100 TB execution property plan shape cannot
  * show: when memory pressure forces the external sort / aggregate /
  * join paths to SPILL, results must not change. Every other scale
  * claim in this repo rests on exchanges, caps and banded joins being
  * the right plan; this suite pins that the same plans produce
  * hash-identical rows when their operators actually go external,
  * and that the spill path was genuinely exercised (nonzero spill
  * metrics — an assertion-free "ran under low memory" test would pass
  * vacuously if the constraint silently didn't bind).
  *
  * Mechanics: the reference rows come from a stock session; then the
  * shared session is REPLACED by one whose unified memory pool is
  * shrunk to 64 MB (`spark.testing.memory`, the hook Spark's own
  * execution tests use, with the 300 MB reservation zeroed) and whose
  * sorters force-spill every 10k elements
  * (`numElementsForceSpillThreshold` — guarantees the external path
  * even where 64 MB would suffice, so the gate cannot rot as data
  * sizes drift). Three shuffle-heavy registry queries at sf0.1 cover
  * the three external operators: a global sort (q_zorder), a
  * shuffle-join + aggregate chain (dd_ngram_jaccard), and a
  * full-corpus repartition (q_global_shuffle). Suites run sequentially
  * in the forked test JVM, so swapping the default session is safe —
  * later suites lazily getOrCreate a fresh stock one.
  */
class SpillStressSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.1"
  private val queryNames = Seq("q_zorder", "dd_ngram_jaccard", "q_global_shuffle")

  private def canonical(s: SparkSession, name: String): Seq[String] =
    SparkEntry.queries(name)(s, sfDir).collect().map(_.toString).toSeq

  test("external sort/aggregate/join spill under a 64 MB pool and stay row-identical") {
    // reference on a stock-memory session (the suite-shared config)
    val ref = {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
      try queryNames.map(n => n -> canonical(s, n)).toMap
      finally s.stop()
    }

    val constrained = SparkSession.builder()
      .master("local[4]")
      .config("spark.testing.memory", (64L * 1024 * 1024).toString)
      .config("spark.testing.reservedMemory", "0")
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "10000")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try {
      val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
      constrained.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null)
            spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      })
      queryNames.foreach { n =>
        val got = canonical(constrained, n)
        assert(got == ref(n),
          s"$n: rows under memory pressure diverge from the stock run " +
            s"(${got.size} vs ${ref(n).size} rows)")
      }
      // listener events post asynchronously (the bus drain API is
      // private[spark]); poll briefly before declaring zero spills
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spilled.get() == 0L && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(spilled.get() > 0L,
        "no operator spilled — the memory constraint did not bind, " +
          "so this gate proved nothing")
    } finally constrained.stop()
  }
}
