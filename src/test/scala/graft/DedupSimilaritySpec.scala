package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, Similarity}

class DedupSimilaritySpec extends SparkSuite {

  test("exact dedup keeps the minimum doc_id per content hash") {
    val out = DedupOps.ddExact(sc, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_copies") >= 1))
  }

  test("minhash-LSH pairs are a subset of exhaustive n-gram pairs") {
    val lsh = DedupOps.ddMinhashLsh(sc, sfDir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = DedupOps.ddNgramJaccard(sc, sfDir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(full))
    // at threshold .5 with 16 perms / 4 bands, recall should be total
    // on the planted ~.9-jaccard near-dups
    assert(lsh == full)
  }

  test("jaccard values are in (0,1] and pairs ordered a<b") {
    val rows = DedupOps.ddNgramJaccard(sc, sfDir).collect()
    assert(rows.forall { r =>
      val j = r.getAs[Double]("jaccard")
      j > 0.0 && j <= 1.0 && r.getLong(0) < r.getLong(1)
    })
  }

  test("brute-force ANN: descending cosine, k rows, query excluded") {
    val rows = Similarity.annBrute(sc, sfDir).collect()
    assert(rows.length == 10)
    val sims = rows.map(_.getAs[Double]("cosine"))
    assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    assert(!rows.map(_.getAs[Long]("vec_id")).contains(0L))
  }

  test("IVF ANN returns plausible neighbors from probed cells only") {
    val ivf = Similarity.annIvf(sc, sfDir).collect()
    assert(ivf.length == 10)
    val cells = ivf.map(_.getAs[Long]("cell")).distinct
    assert(cells.length <= 2) // nProbe = 2
    // IVF top hit should appear in the exact top-k reasonably often;
    // with random cells we only assert overlap is possible, not exact —
    // but the scores themselves must match brute-force cosine for the
    // same ids
    val brute = Similarity.annBrute(sc, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    ivf.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      brute.get(id).foreach(c => assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-12))
    }
  }

  test("cosine kernel is bit-identical to the declarative HOF formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    val e = graft.sources.Tables(sc, sfDir, "embeddings").limit(60)
      .select(col("vec_id"), col("embedding"), DedupOps.norm(col("embedding")).as("nrm"))
    val l = e.select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
    val r = e.select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
    val declarative = l.crossJoin(r).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        (DedupOps.dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cosine"))
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    // kernel path with threshold -1 keeps every pair
    val kernel = {
      import spark.implicits._
      val ds = e.as[(Long, Array[Float], Double)]
      val side = spark.sparkContext.broadcast(ds.orderBy("vec_id").collect())
      ds.mapPartitions { it =>
        val all = side.value
        it.flatMap { case (a, ea, na) =>
          all.iterator.filter(_._1 > a).map { case (b, eb, nb) =>
            var acc = 0.0; var i = 0
            while (i < ea.length) { acc += ea(i).toDouble * eb(i).toDouble; i += 1 }
            (a, b, acc / (na * nb))
          }
        }
      }.collect().map(x => (x._1, x._2) -> x._3).toMap
    }
    assert(declarative.keySet == kernel.keySet)
    declarative.foreach { case (k, v) => assert(kernel(k) == v, s"pair $k") } // exact ==
  }

  test("simhash: hamming bounded and symmetric-free (a<b)") {
    val rows = DedupOps.ddSimhash(sc, sfDir).collect()
    assert(rows.forall { r =>
      r.getAs[Long]("hamming") <= 6 && r.getLong(0) < r.getLong(1)
    })
  }

  test("incremental dedup agrees with the full pass on cross-shard pairs") {
    val inc = DedupOps.ddIncremental(sc, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    inc.foreach { case (a, b) =>
      assert(a % 10 == 0 && b % 10 != 0, s"($a,$b) is not a new-vs-old pair")
    }
    val full = DedupOps.ddMinhashLsh(sc, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val crossFromFull = full.filter { case (a, b) =>
      (a % 10 == 0) != (b % 10 == 0)
    }.map { case (a, b) => if (a % 10 == 0) (a, b) else (b, a) }
    assert(inc == crossFromFull,
      s"incremental=${inc.size} fullCross=${crossFromFull.size}")
  }
}
