package graft

import org.apache.spark.sql.functions._
import graft.streaming.{DocsStream, EventsStream}

/** Streaming near-dup ingest probe: streaming the corpus against its
  * own static band index must surface exactly the batch LSH candidate
  * pairs, symmetrized (each batch pair (a, b) appears as a probing both
  * directions), after the sink-side distinct.
  */
class DocsStreamSpec extends SparkSuite {

  test("stream-static band probe matches the batch LSH candidate set") {
    val s = sc
    val corpus = graft.sources.Tables(s, sfDir, "documents")
    val stream = DocsStream.readDocs(s, sfDir, "documents.parquet")
    assert(stream.isStreaming)
    val cands = DocsStream.nearDupCandidates(stream, corpus)
    val q = EventsStream.runToMemory(s, cands, "docs_probe_test")
    try {
      // sink-side exactly-once: the probe is stateless and may emit a
      // pair once per colliding band — DISTINCT here is the documented
      // foreachBatch-sink contract
      val got = s.sql(
        "SELECT DISTINCT new_doc, corpus_doc FROM docs_probe_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch truth: lshCandidates gives a < b pairs; the probe sees
      // both directions (a probing the index finds b, and vice versa)
      val batch = graft.operators.DedupOps
        .lshCandidates(graft.operators.DedupOps.shingleHashes(corpus))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sym = batch ++ batch.map { case (a, b) => (b, a) }
      assert(got == sym, s"stream=${got.size} batch-sym=${sym.size}")
    } finally q.stop()
  }
}
