package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Round-2 additions: generic vector kernels, the second analytics
  * wave, composed pipeline ops — semantics properties plus the plan
  * gates that keep the new perf-sensitive shapes from regressing.
  */
class Round2Spec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(sc, sfDir).queryExecution.executedPlan.toString

  // ---- kernels ----------------------------------------------------------

  test("generic DotProduct/L2NormSq are bit-identical to the HOF fold (float and double)") {
    graft.functions.GraftExpressions.register(sc)
    val df = Tables(sc, sfDir, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding"),
        transform(col("embedding"), x => x.cast(DoubleType) * 1.5).as("darr"))
    val foldFD = aggregate(zip_with(col("embedding"), col("darr"),
      (x, y) => x.cast(DoubleType) * y), lit(0.0), (acc, x) => acc + x)
    val foldNormD = aggregate(col("darr"), lit(0.0), (acc, x) => acc + x * x)
    val rows = df.select(
      expr("graft_dot(embedding, darr)").as("k_fd"), foldFD.as("f_fd"),
      expr("graft_norm_sq(darr)").as("k_nd"), foldNormD.as("f_nd"),
      expr("graft_dot(embedding, embedding)").as("k_ff"),
      expr("graft_norm_sq_f(embedding)").as("f_ff")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "float×double dot")
      assert(r.getDouble(2) == r.getDouble(3), "double norm")
      assert(r.getDouble(4) == r.getDouble(5), "float self-dot == float norm kernel")
    }
  }

  // ---- plan gates for the new perf-sensitive shapes ---------------------

  test("k-means assignment argmin is an aggregate, not a row_number window") {
    val p = plan("kmeans_train")
    assert(!p.contains("Window"), "argmin regressed to a window sort")
  }

  test("q6 pushes every predicate into the parquet scan") {
    val p = plan("q6_selective_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity), GreaterThanOrEqual(l_shipda"))
  }

  test("literal dim lookup joins via broadcast, and q18 has no cartesian") {
    assert(plan("q_values_lookup").contains("BroadcastHashJoin"))
    assert(!plan("q18_large_orders").contains("CartesianProduct"))
  }

  // ---- semantics properties --------------------------------------------

  test("cross join cardinality is |nation| × |region|") {
    val n = Tables(sc, sfDir, "nation").count()
    val r = Tables(sc, sfDir, "region").count()
    assert(SparkEntry.queries("q_cross_join")(sc, sfDir).count() == n * r)
  }

  test("full outer join covers the union of both sides' nation keys") {
    val out = SparkEntry.queries("q_full_outer_join")(sc, sfDir)
      .select("nationkey").collect().map(_.getInt(0)).toSet
    val sup = Tables(sc, sfDir, "supplier").select("s_nationkey")
      .collect().map(_.getInt(0)).toSet
    val cust = Tables(sc, sfDir, "customer").select("c_nationkey")
      .collect().map(_.getInt(0)).toSet
    assert(out == (sup ++ cust))
  }

  test("q18 single-pass formulation equals the naive join-then-reaggregate") {
    val fast = SparkEntry.queries("q18_large_orders")(sc, sfDir).collect()
    val li = Tables(sc, sfDir, "lineitem")
    val big = li.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).as("qty"))
      .filter(col("qty") > 150).select(col("l_orderkey").as("bk"))
    val naive = Tables(sc, sfDir, "customer")
      .join(Tables(sc, sfDir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(big, col("o_orderkey") === col("bk"), "left_semi")
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("c_name", "o_orderkey", "o_totalprice")
      .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).cast(DoubleType).as("total_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(20)
      .select("c_name", "o_orderkey", "o_totalprice", "total_qty").collect()
    assert(fast.sameElements(naive))
  }

  test("stratified sample is invariant to partitioning") {
    def ids(parts: Int): Set[Long] = {
      val docs = Tables(sc, sfDir, "documents").repartition(parts)
      docs.createOrReplaceTempView("strat_docs")
      val bucket = graft.functions.PortableHash.hash64(col("doc_id").cast(StringType), 7) % 100
      val rate = when(col("lang") === "en", 5).otherwise(20)
      docs.where(bucket < rate).select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(ids(1) == ids(7))
    // en stratum is sampled at a lower rate than the tail
    val out = SparkEntry.queries("q_stratified_sample")(sc, sfDir)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables(sc, sfDir, "documents").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en").toDouble / totals("en") < byLang("fr").toDouble / totals("fr"))
  }

  test("cosine-LSH candidate pairs agree on every hyperplane sign") {
    // pairs counted per bucket must equal C(bucket size, 2)
    val out = SparkEntry.queries("dd_cosine_lsh")(sc, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nPairs = r.getLong(r.fieldIndex("n_pairs"))
      assert(nPairs >= 1)
      val nClose = r.getLong(r.fieldIndex("n_close"))
      assert(nClose >= 0 && nClose <= nPairs)
    }
  }

  test("frame sampling strides by 10 and stays inside the payload") {
    val rows = SparkEntry.queries("mm_frame_sample")(sc, sfDir)
      .join(Tables(sc, sfDir, "documents").select("doc_id", "n_chars"), "doc_id")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val idx = r.getLong(r.fieldIndex("frame_idx"))
      assert(idx % 10 == 0 && idx < math.min(r.getLong(r.fieldIndex("n_chars")), 240L))
      val f = r.getLong(r.fieldIndex("frame_feature"))
      assert(f > 0 && f < 128, s"ASCII feature out of range: $f")
    }
  }

  test("ta_pipeline respects the quality threshold and groups all langs") {
    val out = SparkEntry.queries("ta_pipeline")(sc, sfDir).collect()
    assert(out.nonEmpty && out.length <= 5)
    out.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_docs"))
      // sum_q32 / n / 2^32 recovers the mean quality, which must be ≥ threshold
      val meanQ = r.getLong(r.fieldIndex("sum_q32")).toDouble / n / 4294967296.0
      assert(meanQ >= 0.33, s"mean quality $meanQ below filter threshold")
    }
  }
}
