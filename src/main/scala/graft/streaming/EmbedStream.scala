package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Similarity

/** Streaming ANN INGEST probe — the live twin of `ann_ivf`: embedding
  * vectors arrive as a file stream and are routed to their nearest IVF
  * cells against the STATIC corpus index, emitting (new vector, corpus
  * candidate, cosine) pairs.
  *
  * The batch pipeline's cell assignment is a `groupBy(vec_id)` argmin —
  * a stateful aggregation a stream cannot run in append mode. Here the
  * nearest cells are computed PER ROW: the (tiny, broadcast) centroid
  * table is folded into a single array value, each arriving vector
  * scores every centroid inside its own row (`transform` +
  * `array_sort`, ties to the lowest centroid id — the exact tiebreak
  * of the batch argmin), and the top `nProbe` cells explode into
  * probe keys. Everything downstream is a stream-static equi-join on
  * the cell id against the batch-built inverted cell index — no state
  * store, no watermark; per-batch cost is
  * O(batch vectors · (|centroids| + probed-cell occupancy)).
  *
  * Because every operator here is stream-safe AND deterministic, the
  * same function runs on a batch DataFrame unchanged — the spec
  * asserts bit-identical output between the two execution modes.
  */
object EmbedStream {

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** File-source stream over a directory of embeddings parquet. */
  def readEmbeddings(spark: SparkSession, dir: String, glob: String = "*.parquet"): DataFrame =
    spark.readStream
      .schema(embSchema)
      .option("pathGlobFilter", glob)
      .parquet(dir)

  private def dot(a: Column, b: Column): Column =
    call_function("graft_dot_f", a, b)

  /** (new_vec, vec_id, cell, cosine) candidates: each arriving vector
    * against the members of its `nProbe` nearest static cells. Top-k
    * ranking per query is the foreachBatch sink's job (a bounded batch
    * sort per micro-batch), keeping the probe itself stateless.
    */
  def probeCandidates(spark: SparkSession, stream: DataFrame,
      staticCorpus: DataFrame, nProbe: Int = 2): DataFrame = {
    graft.functions.GraftExpressions.register(spark)
    val e = Similarity.withNorm(spark, staticCorpus)
    val centroids = e.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val cells = Similarity.assignCells(e, centroids)
      .select(col("vec_id"), col("embedding").as("me"), col("nrm").as("mn"), col("cell"))
    // the whole centroid table as ONE array value riding each row
    val centArr = centroids
      .agg(collect_list(struct(col("cid"), col("ce"), col("cn"))).as("cents"))
    val probes = stream
      .select(col("vec_id").as("new_vec"), col("embedding").as("qe"),
        sqrt(call_function("graft_norm_sq_f", col("embedding"))).as("qn"))
      .crossJoin(broadcast(centArr))
      .select(col("new_vec"), col("qe"), col("qn"),
        explode(slice(array_sort(transform(col("cents"), c =>
          struct((-(dot(col("qe"), c.getField("ce")) / (col("qn") * c.getField("cn"))))
            .as("nc"), c.getField("cid").as("cid")))), 1, nProbe)).as("p"))
      .select(col("new_vec"), col("qe"), col("qn"), col("p.cid").as("cell"))
    probes.join(cells, "cell")
      .where(col("new_vec") =!= col("vec_id"))
      .select(col("new_vec"), col("vec_id"), col("cell"),
        (dot(col("qe"), col("me")) / (col("qn") * col("mn"))).as("cosine"))
  }
}
