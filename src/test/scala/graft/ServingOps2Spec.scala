package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{ServingOps, ServingOps2}

/** Property gates for the round-12 serving wave: the KV prefix-reuse
  * audit against a hand-computed corpus, the draft-length curve against
  * its K = 8 anchor ([[ServingOps.qSpecDecodeAccept]] — same hash
  * stream, so the rows must match) plus its structural monotonicity,
  * and the router frontier against an independent re-derivation of the
  * routing, accuracy and dominance arithmetic.
  */
class ServingOps2Spec extends SparkSuite {

  test("q_kv_prefix_reuse: hand-computed block sharing, short docs, identical docs") {
    val s = sc
    def doc(id: Long, src: String, tokens: Seq[String]) =
      (id, tokens.mkString(" "), "en", src, tokens.mkString(" ").length.toLong)
    val shared = (1 to 32).map(i => s"c$i") // two full shared blocks
    val docs = s.createDataFrame(Seq(
      // s1: three docs share blocks 1-2, diverge in block 3
      doc(1, "s1", shared ++ (1 to 16).map(i => s"a$i")),
      doc(2, "s1", shared ++ (1 to 16).map(i => s"b$i")),
      doc(3, "s1", shared ++ (1 to 16).map(i => s"d$i")),
      // s2: two IDENTICAL 33-token docs (2 full blocks + uncached tail)
      doc(4, "s2", (1 to 33).map(i => s"e$i")),
      doc(5, "s2", (1 to 33).map(i => s"e$i")),
      // s3: one 10-token doc — no full block at all
      doc(6, "s3", (1 to 10).map(i => s"f$i"))))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("kv-reuse").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = ServingOps2.qKvPrefixReuse(s, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toMap
    // s1: 9 block instances, 5 distinct (2 shared + 3 divergent thirds)
    // s2: 4 instances, 2 distinct; s3: zero blocks, zero reuse
    assert(got == Map(
      "s1" -> ((3L, 9L, 5L, 0.444444, 64L)),
      "s2" -> ((2L, 4L, 2L, 0.5, 32L)),
      "s3" -> ((1L, 0L, 0L, 0.0, 0L))), s"got: $got")

    // the depth profile over the SAME corpus, global view: depths 1-2
    // see five prompts fanning into two distinct blocks (s1's shared
    // prefix + s2's), depth 3 is all-divergent
    val depth = ServingOps2.qKvDepthProfile(s, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(depth == Seq((1, 5L, 2L, 0.6), (2, 5L, 2L, 0.6), (3, 3L, 3L, 0.0)),
      s"depth profile: $depth")
  }

  test("q_cache_ttl_curve: hand-computed gaps, inclusive TTL boundary, monotone hit rate") {
    val s = sc
    // user 1 at t = 0 s, 30 s, 400 s, 4000 s → gaps 30 s / 370 s /
    // 3600 s; the last gap sits EXACTLY at the largest TTL (inclusive
    // hit). user 2 appears once (never a hit, still a request).
    val rows = Seq((1L, 0L), (2L, 30L), (3L, 400L), (4L, 4000L), (5L, -1L))
      .map { case (id, t) =>
        val uid = if (t < 0) 2L else 1L
        val at = if (t < 0) 0L else t
        (id, new java.sql.Timestamp(1704067200000L + at * 1000L), uid, "q",
          1.0, "{}")
      }
    val dir = java.nio.file.Files.createTempDirectory("cache-ttl").toString
    s.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = ServingOps2.qCacheTtlCurve(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((60L, 5L, 1L, 0.2), (300L, 5L, 1L, 0.2),
      (900L, 5L, 2L, 0.4), (3600L, 5L, 3L, 0.6)), s"curve: $got")

    // on the real corpus the curve must be monotone nondecreasing in
    // TTL (a longer validity window can only add hits)
    val real = ServingOps2.qCacheTtlCurve(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).map(_._2).toSeq
    assert(real == real.sorted,
      s"hit counts not monotone in TTL: ${real.mkString(",")}")
  }

  test("q_draft_length_curve: K = 8 equals q_spec_decode_accept; acceptance monotone in K") {
    val s = sc
    val curve = ServingOps2.qDraftLengthCurve(s, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // the K = 8 column rides the SAME "sd:<id>:<p>" hash stream as
    // q_spec_decode_accept, so those rows must agree exactly
    val anchor = ServingOps.qSpecDecodeAccept(s, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    anchor.foreach { case (tpe, want) =>
      assert(curve((tpe, 8)) == want,
        s"$tpe: K=8 curve row ${curve((tpe, 8))} != spec_decode anchor $want")
    }
    // a longer draft window can only extend the accepted prefix
    val byType = curve.groupBy(_._1._1)
    byType.foreach { case (tpe, rows) =>
      val accepted = rows.toSeq.sortBy(_._1._2).map(_._2._2)
      assert(accepted == accepted.sorted,
        s"$tpe: accepted_total not monotone in K: $accepted")
      rows.foreach { case ((_, k), (n, acc, tps)) =>
        assert(tps >= 1.0 && tps <= k + 1.0 && acc <= n * k,
          s"$tpe K=$k: tokens_per_step $tps / accepted $acc out of range")
      }
    }
  }

  test("q_router_frontier: routing, accuracy and dominance match an independent re-derivation") {
    val s = sc
    import graft.functions.PortableHash.hash64
    val got = ServingOps2.qRouterFrontier(s, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toMap
    assert(got.keySet == Set(500L, 600L, 700L, 800L, 900L))

    // independent re-derivation: score every event with the same
    // published rule, then fold the threshold sweep and the dominance
    // test in plain Scala over the collected (tiny) grid
    val scored = graft.sources.Tables(s, sfDir, "events")
      .select(
        (hash64(concat(lit("rt1:"), col("event_id").cast(StringType))) % 1000)
          .as("conf"),
        (hash64(concat(lit("rt2:"), col("event_id").cast(StringType))) % 1000)
          .as("b2"),
        (hash64(concat(lit("rt3:"), col("event_id").cast(StringType))) % 1000)
          .as("b3"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = scored.length.toLong
    val byThr = Seq(500L, 600L, 700L, 800L, 900L).map { thr =>
      val nSmall = scored.count(_._1 >= thr).toLong
      val nCorrect = scored.count { case (conf, b2, b3) =>
        if (conf >= thr) b2 * 1000 < 550000 + 400 * conf else b3 < 900
      }.toLong
      thr -> ((nSmall, nCorrect))
    }.toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    byThr.foreach { case (thr, (nSmall, nCorrect)) =>
      val dominated = byThr.exists { case (_, (bs, bc)) =>
        bs >= nSmall && bc >= nCorrect && (bs > nSmall || bc > nCorrect)
      }
      val want = (nSmall, r6(nSmall.toDouble / n), r6(nCorrect.toDouble / n),
        r6((nSmall + 8L * (n - nSmall)).toDouble / n), !dominated)
      assert(got(thr) == want, s"thr=$thr: got ${got(thr)} want $want")
    }
    // the sweep must leave a usable operating set, and routing volume
    // can only shrink as the threshold rises
    assert(got.values.exists(_._5), "empty Pareto frontier")
    val fracs = got.toSeq.sortBy(_._1).map(_._2._2)
    assert(fracs == fracs.sorted.reverse, s"frac_small not nonincreasing: $fracs")
  }
}
