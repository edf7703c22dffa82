package graft

import graft.streaming.{EmbedStream, EventsStream}

/** Streaming ANN ingest probe: `probeCandidates` is built from
  * stream-safe deterministic operators only, so running the SAME
  * function over the corpus as a file stream and as a batch DataFrame
  * must produce identical candidate sets — cosine doubles included
  * (identical expression chains on both paths).
  */
class EmbedStreamSpec extends SparkSuite {

  test("stream and batch execution of the IVF probe are identical") {
    val s = sc
    val corpus = graft.sources.Tables(s, sfDir, "embeddings")
    val stream = EmbedStream.readEmbeddings(s, sfDir, "embeddings.parquet")
    assert(stream.isStreaming)
    val cands = EmbedStream.probeCandidates(s, stream, corpus)
    val q = EventsStream.runToMemory(s, cands, "embed_probe_test")
    try {
      val got = s.sql("SELECT * FROM embed_probe_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = EmbedStream.probeCandidates(s, corpus, corpus).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got.nonEmpty)
      assert(got == batch, s"stream=${got.size} batch=${batch.size}")
    } finally q.stop()
  }

  test("every probed cell is one of the query's nProbe nearest centroids") {
    import org.apache.spark.sql.functions._
    val s = sc
    val corpus = graft.sources.Tables(s, sfDir, "embeddings")
    // per query vector at most nProbe distinct cells appear
    val cellsPerQuery = EmbedStream.probeCandidates(s, corpus, corpus)
      .groupBy("new_vec").agg(countDistinct("cell").as("nc"))
      .agg(max("nc")).head().getLong(0)
    assert(cellsPerQuery <= 2)
  }
}
