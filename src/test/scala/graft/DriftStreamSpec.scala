package graft

import org.apache.spark.sql.functions._
import graft.streaming.{DriftStream, EmbedStream, EventsStream}

/** Streaming drift monitor: the stream must flag exactly what the
  * batch computation flags under the shared fences, the self-corpus
  * must look mostly in-profile, and an actual distribution shift must
  * trip the flag.
  */
class DriftStreamSpec extends SparkSuite {

  test("stream flags match batch; self-corpus is calm; a shift trips the monitor") {
    val s = sc
    val (lo, hi) = DriftStream.fences(s, sfDir)
    assert(lo.length == 64 && hi.length == 64)
    assert(lo.zip(hi).forall { case (a, b) => a < b })

    // batch truth on the static corpus
    val corpus = s.read.parquet(s"$sfDir/embeddings.parquet")
    val batch = DriftStream.monitor(corpus, lo, hi).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap

    // the fences were FIT on this corpus: most of it must be in-profile
    val drifted = batch.values.count(_._2)
    assert(drifted.toDouble / batch.size < 0.05,
      s"$drifted/${batch.size} self-corpus vectors flagged")

    // stream execution is bit-identical
    val stream = EmbedStream.readEmbeddings(s, sfDir, "embeddings.parquet")
    assert(stream.isStreaming)
    val q = EventsStream.runToMemory(s,
      DriftStream.monitor(stream, lo, hi), "drift_test")
    try {
      val got = s.sql("SELECT vec_id, n_out, drifted FROM drift_test").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(got == batch, s"stream=${got.size} batch=${batch.size}")
    } finally q.stop()

    // a genuine distribution shift (scale every coordinate 10×) drifts
    val shifted = corpus.withColumn("embedding",
      transform(col("embedding"), x => x * lit(10.0f)))
    val tripped = DriftStream.monitor(shifted, lo, hi)
      .where(col("drifted")).count()
    assert(tripped > batch.size * 9 / 10, s"only $tripped shifted vectors flagged")
  }
}
