package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Behavioral check of the dd_ngram_jaccard df-cap (DedupOps.ShingleDfCap
  * = 128): the driver testdata's max shingle df is ~25, so the cap is
  * only ever exercised here — with a synthetic corpus where a
  * boilerplate shingle appears in 152 documents.
  */
class DfCapSpec extends SparkSuite {

  test("boilerplate shingles above the df cap cannot pair documents") {
    import spark.implicits._
    // 150 filler docs: the boilerplate shingle + one unique shingle each
    val fillers = (1 to 150).map(i =>
      (i.toLong, s"common boiler plate u${i}x"))
    // two docs that are PURE boilerplate: identical, but their only
    // shingle has df = 152 > cap — the uncapped query would report them
    // at jaccard 1.0, the capped one must not pair them at all
    val pure = Seq((500L, "common boiler plate"), (501L, "common boiler plate"))
    // one genuine near-dup pair via rare shingles (df = 2)
    val dup = Seq((1000L, "alpha beta gamma delta"), (1001L, "alpha beta gamma delta"))
    val docs = (fillers ++ pure ++ dup).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("synth"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("dfcap").toString
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")

    val rows = DedupOps.ddNgramJaccard(sc, dir).collect()
    assert(rows.length == 1, rows.mkString("; "))
    val r = rows.head
    assert(r.getLong(0) == 1000L && r.getLong(1) == 1001L)
    assert(r.getDouble(2) == 1.0)
  }
}
