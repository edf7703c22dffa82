package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.DedupOps

/** Streaming near-duplicate INGEST probe — the live twin of
  * `dd_incremental`: newly crawled documents arrive as a file stream,
  * each is shingled, minhash-signed and banded with EXACTLY the batch
  * pipeline's expressions (shared from [[DedupOps]], so batch and
  * stream cannot drift), then probed against the STATIC corpus's band
  * index via a stream-static equi-join. Output: (new doc, corpus doc)
  * candidate pairs.
  *
  * Scale notes: the static band index is built once per (re)start and
  * incrementally maintained out-of-band (the nightly batch job); the
  * stream side touches only each micro-batch's documents — per-batch
  * cost is O(batch shingles) + one hash join per band against a
  * bucket-partitioned index, the same shape `dd_incremental` argues
  * for at rest. No stream-stream join and no state store: candidate
  * generation is stateless given the index, so there is nothing to
  * watermark — dedup DECISIONS (keep/drop) happen downstream where the
  * exact-verify tier runs.
  */
object DocsStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a directory of documents parquet. */
  def readDocs(spark: SparkSession, dir: String, glob: String = "*.parquet"): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", glob)
      .parquet(dir)

  /** Candidate near-dup pairs (new_doc, corpus_doc) from probing the
    * static band index with the stream's banded signatures. The static
    * side is banded ONCE (cached DataFrame, broadcast into each
    * micro-batch's joins by size). A pair may surface once per
    * colliding band (multiplicity ≤ NumBands) — the probe is kept
    * STATELESS by design (a streaming dropDuplicates would hold
    * unbounded pair state with no event-time to expire it); the
    * exactly-once `distinct()` belongs in the foreachBatch sink, where
    * it is a plain bounded batch op per micro-batch.
    */
  /** Per-ROW minhash signatures: the batch pipeline explodes shingles
    * and aggregates `min` per doc — a stateful aggregation a stream
    * cannot run in append mode. Here the same permuted minima are
    * computed directly over the whole-document shingle-hash ARRAY
    * (`array_min(transform(...))`), which is value-identical to the
    * batch `groupBy(doc_id).agg(min(...))` (min over the same multiset)
    * and STATELESS — each document's signature derives from its own
    * row. Shingle-less docs (< 3 tokens) have no signature in the batch
    * relation, so they are filtered rather than signed with nulls.
    */
  private def rowSigs(docs: DataFrame): DataFrame = {
    val hs = call_function("graft_shingle_hashes", col("text"))
    val sigCols = DedupOps.perms.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("hs"),
        h => (h % DedupOps.MersenneP * a + b) % DedupOps.MersenneP)).as(s"sig$i")
    }
    docs.select(col("doc_id"), hs.as("hs"))
      .where(size(col("hs")) > 0)
      .select(col("doc_id") +: sigCols: _*)
  }

  def nearDupCandidates(stream: DataFrame, staticCorpus: DataFrame): DataFrame = {
    val staticBands = DedupOps.bandKeys(
      DedupOps.minhashSigs(DedupOps.shingleHashes(staticCorpus))).cache()
    val streamBands = DedupOps.bandKeys(rowSigs(stream))
    (0 until DedupOps.NumBands).map { b =>
      streamBands.select(col("doc_id").as("new_doc"), col(s"band$b").as("bk"))
        .join(staticBands.select(col("doc_id").as("corpus_doc"), col(s"band$b").as("bk")), "bk")
        .where(col("new_doc") =!= col("corpus_doc"))
        .select("new_doc", "corpus_doc")
    }.reduce(_ union _)
  }
}
