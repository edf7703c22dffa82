package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.{DocsStream, EventsStream, QualityStream}

/** Streaming perplexity router: streaming the corpus against its own
  * compact model must land every document in exactly the stratum the
  * batch rank-bucketing assigns under the same model — threshold
  * comparison in flight ≡ rank cut at rest (ties share a bucket in
  * both constructions).
  */
class QualityStreamSpec extends SparkSuite {

  test("stream routing matches batch rank-bucketing under the shared model") {
    val s = sc
    val corpus = graft.sources.Tables(s, sfDir, "documents")
    val model = QualityStream.perplexityModel(corpus).cache()

    // batch truth: rank-bucket the static corpus's scores
    val av = QualityStream.scored(corpus, model)
    val hist = av.groupBy("avg_q").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum("c").over(Window.orderBy(col("avg_q").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val batch = av.join(cum.select("avg_q", "cum"), Seq("avg_q"))
      .crossJoin(broadcast(av.agg(count(lit(1)).as("nd"))))
      .selectExpr("doc_id",
        """CASE WHEN cum <= (nd + 2) DIV 3 THEN 'head'
          |     WHEN cum <= (2 * nd + 2) DIV 3 THEN 'middle'
          |     ELSE 'tail' END AS bucket""".stripMargin.replace("\n", " "))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val stream = DocsStream.readDocs(s, sfDir, "documents.parquet")
    assert(stream.isStreaming)
    val routed = QualityStream.route(stream, corpus)
    val q = EventsStream.runToMemory(s, routed, "quality_route_test")
    try {
      val got = s.sql("SELECT doc_id, bucket FROM quality_route_test")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got.size == batch.size, s"stream=${got.size} batch=${batch.size}")
      assert(got == batch)
      // all three strata are populated at this scale
      assert(got.values.toSet == Set("head", "middle", "tail"))
    } finally q.stop()
  }

  test("degenerate corpus (one tied score) routes to tail instead of crashing") {
    // All docs score identically → the head and middle rank cuts are
    // empty (the single score's cum already exceeds nd/3), the
    // threshold CASEs yield NULL, and the router must degrade exactly
    // like the batch bucketing: everything lands in 'tail'.
    val s = sc
    import s.implicits._
    val corpus = Seq((1L, "aa bb aa bb"), (2L, "aa bb aa bb"), (3L, "aa bb aa bb"))
      .toDF("doc_id", "text")
    val routed = QualityStream.route(corpus, corpus)
    val got = routed.collect().map(r => r.getAs[String]("bucket")).toSet
    assert(got == Set("tail"), got)
  }
}
