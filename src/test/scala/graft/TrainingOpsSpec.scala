package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Similarity, TrainingOps}
import graft.sources.Tables

/** Round-4 additions: substring-span dedup, train/test contamination,
  * deterministic epoch shuffle, MERGE upsert, IVF-PQ — semantics
  * properties (independent recomputation through a DIFFERENT
  * formulation where the operator involves hashing) plus plan gates on
  * the new argmin shape.
  */
class TrainingOpsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(sc, sfDir)

  // ---- dd_substring -----------------------------------------------------

  test("dd_substring dup counts match a hash-free string recomputation") {
    val docs = Tables(sc, sfDir, "documents")
    val toks = split(col("text"), " ")
    val wins = when(size(toks) < 10, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(0), size(toks) - 10),
        i => concat_ws(" ", slice(toks, i + 1, lit(10)))))
    val w = docs.select(col("doc_id"), explode(wins).as("win"))
    val wf = w.groupBy("win").agg(countDistinct("doc_id").as("ndocs"))
    val expect = w.join(wf, "win").groupBy("doc_id")
      .agg(sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_dup_s"))
    val got = run("dd_substring")
    val joined = got.join(expect, "doc_id")
      .where(col("n_dup") =!= col("n_dup_s")).count()
    assert(joined == 0, "hash-based and string-based dup counts diverge")
    assert(got.where(col("n_dup") > col("n_windows")).count() == 0)
  }

  test("dd_substring window count is tokens − W + 1") {
    val docs = Tables(sc, sfDir, "documents")
      .select(col("doc_id"), (size(split(col("text"), " ")) - 9).as("expect_w"))
    val bad = run("dd_substring").join(docs, "doc_id")
      .where(col("n_windows") =!= col("expect_w")).count()
    assert(bad == 0)
  }

  // ---- dd_span_removal --------------------------------------------------

  test("span removal is identity exactly on docs without duplicated windows") {
    val docs = Tables(sc, sfDir, "documents")
      .select(col("doc_id"), md5(col("text")).as("orig_hash"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    val joined = run("dd_span_removal")
      .join(run("dd_substring").select("doc_id", "n_dup"), "doc_id")
      .join(docs, "doc_id").cache()
    val badClean = joined.where(col("n_dup") === 0 &&
      (col("cleaned_hash") =!= col("orig_hash") || col("n_kept") =!= col("n_toks"))).count()
    assert(badClean == 0, "clean doc was modified")
    val badDup = joined.where(col("n_dup") > 0 && col("n_kept") >= col("n_toks")).count()
    assert(badDup == 0, "doc with duplicated spans lost no tokens")
    joined.unpersist()
  }

  // ---- ta_contamination -------------------------------------------------

  test("ta_contamination covers exactly the held-out docs and hits recompute") {
    val docs = Tables(sc, sfDir, "documents")
    val testIds = docs.where(col("source").isin("src8", "src9"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = run("ta_contamination").collect()
    assert(got.map(_.getLong(0)).toSet == testIds, "one row per held-out doc")
    // string-set recomputation of the overlap for every held-out doc
    val toks = split(col("text"), " ")
    val wins = when(size(toks) < 8, array().cast(ArrayType(StringType)))
      .otherwise(array_distinct(transform(sequence(lit(0), size(toks) - 8),
        i => concat_ws(" ", slice(toks, i + 1, lit(8))))))
    val w = docs.select(col("doc_id"), col("source"), explode(wins).as("win"))
    val train = w.where(!col("source").isin("src8", "src9")).select("win").distinct()
    val hits = w.where(col("source").isin("src8", "src9"))
      .join(train, Seq("win"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit_s"))
    val gotDf = run("ta_contamination")
    val diverged = gotDf.join(hits, Seq("doc_id"), "left")
      .where(coalesce(col("n_hit_s"), lit(0L)) =!= col("n_hit")).count()
    assert(diverged == 0, "hash-based and string-based hit counts diverge")
  }

  // ---- ta_bpe -----------------------------------------------------------

  test("BPE piece counts match an independent list-based merge implementation") {
    val merges = Seq("e" -> "r", "i" -> "n", "s" -> "t", "t" -> "a",
      "a" -> "r", "o" -> "r", "u" -> "e", "r" -> "o")
    def bpe(word: String): Long = {
      var pieces = word.map(_.toString).toVector
      for ((x, y) <- merges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < pieces.length) {
          if (i + 1 < pieces.length && pieces(i) == x && pieces(i + 1) == y) {
            out += (x + y); i += 2
          } else { out += pieces(i); i += 1 }
        }
        pieces = out.result()
      }
      pieces.length.toLong
    }
    val expect = Tables(sc, sfDir, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").map(bpe).sum).toMap
    val got = run("ta_bpe").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expect)
  }

  // ---- q_global_shuffle -------------------------------------------------

  test("global shuffle is a per-epoch permutation with full 64-doc shards") {
    val n = Tables(sc, sfDir, "documents").count()
    val df = run("q_global_shuffle").cache()
    val perEpoch = df.groupBy("epoch")
      .agg(count(lit(1)).as("n"), countDistinct("doc_id").as("nd")).collect()
    assert(perEpoch.length == 3)
    perEpoch.foreach { r =>
      assert(r.getLong(1) == n && r.getLong(2) == n, "not a permutation")
    }
    val shardSizes = df.groupBy("epoch", "shard").agg(count(lit(1)).as("sz"))
      .withColumn("mx", max("shard").over(Window.partitionBy("epoch")))
    assert(shardSizes.where(col("shard") < col("mx") && col("sz") =!= 64).count() == 0,
      "non-final shard not full")
    // epochs produce genuinely different orders
    val e0 = df.where(col("epoch") === 0).select("doc_id", "shard", "pos")
    val e1 = df.where(col("epoch") === 1).select("doc_id", "shard", "pos")
    assert(e0.except(e1).count() > 0, "epoch orders identical")
    df.unpersist()
  }

  // ---- q_merge_upsert ---------------------------------------------------

  test("merge actions partition the key space with the expected counts") {
    val orders = Tables(sc, sfDir, "orders")
    val nBase = orders.count()
    val nUpd = orders.where(col("o_orderkey") % 3 === 0).count()
    val nIns = orders.where(col("o_orderkey") % 7 === 0).count()
    val byAction = run("q_merge_upsert").groupBy("action")
      .agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byAction("update") == nUpd)
    assert(byAction("insert") == nIns)
    assert(byAction("keep") == nBase - nUpd)
  }

  // ---- ann_ivf_pq -------------------------------------------------------

  test("ann_ivf_pq re-ranked cosines are exact and descending") {
    graft.functions.GraftExpressions.register(sc)
    val got = run("ann_ivf_pq").collect()
    assert(got.length == 10)
    val cosines = got.map(_.getDouble(2))
    assert(cosines.sameElements(cosines.sorted.reverse), "not descending")
    // exactness: recompute each returned cosine brute-force
    val e = Tables(sc, sfDir, "embeddings")
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val ids = got.map(_.getLong(0))
    val exact = e.where(col("vec_id").isin(ids: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(expr("graft_dot_f(embedding, qe)") /
          (sqrt(expr("graft_norm_sq_f(embedding)")) * sqrt(expr("graft_norm_sq_f(qe)"))), 6)
          .as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach(r => assert(r.getDouble(2) == exact(r.getLong(0)), s"vec ${r.getLong(0)}"))
  }

  test("bloom-prefiltered dedup returns the exact anti-join rows and uses the sketch") {
    val exact = run("hfp_dedup_anti").collect().toSeq
    val bloom = run("hfp_dedup_bloom").collect().toSeq
    assert(bloom == exact, "sketch changed the result")
    val p = SparkEntry.queries("hfp_dedup_bloom")(sc, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), "bloom filter not in the plan")
  }

  test("PQ code assignment plans as an aggregate argmin, not a window") {
    val p = SparkEntry.queries("ann_pq")(sc, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "argmin regressed to a window sort")
  }
}
