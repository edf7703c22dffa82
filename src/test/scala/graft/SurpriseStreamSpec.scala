package graft

import org.apache.spark.sql.functions._
import graft.streaming.{DocsStream, EventsStream, SurpriseStream}

/** Streaming surprise router: scoring the corpus against its own bin
  * model must equal the batch computation row-for-row (shared
  * smoothing + quantization), and an unseen length bin must take the
  * zero-count fallback and flag.
  */
class SurpriseStreamSpec extends SparkSuite {

  test("stream scores equal the batch model on the self-corpus") {
    val s = sc
    val corpus = graft.sources.Tables(s, sfDir, "documents")
    val (model, unseenQ) = SurpriseStream.binSurprise(corpus)
    assert(model.nonEmpty && unseenQ >= model.values.max)

    // batch truth straight from the fitted map
    val want = corpus.select(col("doc_id"),
        (col("n_chars").cast("long") / 64L).cast("long").as("bin"))
      .collect()
      .map(r => r.getLong(0) -> model(r.getLong(1))).toMap

    val stream = DocsStream.readDocs(s, sfDir, "documents.parquet")
    val routed = SurpriseStream.route(stream, corpus)
    val q = EventsStream.runToMemory(s, routed, "surprise_route_test")
    try {
      val got = s.sql("SELECT doc_id, surprise_q, flagged FROM surprise_route_test")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(got.size == want.size)
      want.foreach { case (id, sq) =>
        assert(got(id)._1 == sq, s"doc $id")
        assert(got(id)._2 == (sq >= SurpriseStream.FlagQ))
      }
    } finally q.stop()
  }

  test("an empty reference corpus degrades to the always-flag sentinel") {
    val s = sc
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_chars")
    val (model, unseenQ) = SurpriseStream.binSurprise(empty)
    assert(model.isEmpty && unseenQ == Long.MaxValue)
    // route() stays alive and flags everything under the empty model
    val doc = Seq((1L, 500L)).toDF("doc_id", "n_chars")
    val r = SurpriseStream.route(doc, empty).head()
    assert(r.getAs[Long]("surprise_q") == Long.MaxValue)
    assert(r.getAs[Boolean]("flagged"))
  }

  test("an unseen bin takes the zero-count fallback and flags") {
    val s = sc
    import s.implicits._
    val corpus = graft.sources.Tables(s, sfDir, "documents")
    val (_, unseenQ) = SurpriseStream.binSurprise(corpus)
    val weird = Seq((999999L, 100000L)).toDF("doc_id", "n_chars")
    val r = SurpriseStream.route(weird, corpus).head()
    assert(r.getAs[Long]("surprise_q") == unseenQ)
    assert(r.getAs[Boolean]("flagged"))
  }
}
