package graft

import graft.operators.MoeOps

/** Property gates for the MoE routing wave: each query re-derived
  * independently in plain Scala from the raw sf0.001 events (hash
  * logits, first-match argmax, quantized probabilities, capacity
  * ceiling, ranking — the full path), plus the invariants the router
  * construction guarantees: per-layer top-1 mass conservation, a
  * near-1 auxiliary loss for a hash-uniform router, capacity drops
  * bounded by routed counts, and ~7/8 churn for independent
  * per-layer routing.
  */
class MoeOpsSpec extends SparkSuite {

  private val E = 8
  private val L = 4
  private val Q = 1L << 20

  private def h64(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def logits(l: Int, id: Long): Array[Long] =
    Array.tabulate(E)(e => h64(s"moe:$l:$e:$id") % 1000 + 1)

  private def top1(arr: Array[Long]): Int = arr.indexOf(arr.max)

  private lazy val tokens: Seq[(Long, Long)] = // (event_id, user_id)
    sc.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("q_moe_load_balance: exact re-derivation + mass conservation + near-uniform aux") {
    val got = MoeOps.qMoeLoadBalance(sc, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val want = (for (l <- 0 until L) yield {
      val rows = tokens.map { case (id, _) =>
        val arr = logits(l, id)
        (top1(arr), arr, arr.sum)
      }
      val n = rows.size.toLong
      val perE = (0 until E).map { e =>
        val nTop = rows.count(_._1 == e).toLong
        val sumPq = rows.map { case (_, arr, s) => arr(e) * Q / s }.sum
        (e, nTop, sumPq)
      }
      val aux = round6(perE.map { case (_, nTop, sumPq) =>
        nTop.toDouble * E / n * (sumPq.toDouble / n / Q)
      }.sorted.foldLeft(0.0)(_ + _))
      perE.map { case (e, nTop, sumPq) =>
        (l, e) -> (n, nTop, round6(nTop.toDouble / n),
          round6(sumPq.toDouble / n / Q), aux)
      }
    }).flatten.toMap
    assert(got == want, s"got $got\nwant $want")
    // every token is top-1 routed exactly once per layer
    for (l <- 0 until L)
      assert((0 until E).map(e => got((l, e))._2).sum == tokens.size)
    // a hash-uniform router should sit near the aux-loss optimum of 1
    got.values.foreach { case (_, _, _, _, aux) =>
      assert(aux > 0.9 && aux < 1.2, s"aux $aux") }
  }

  test("q_moe_capacity_drops: exact re-derivation + drop bounds") {
    val got = MoeOps.qMoeCapacityDrops(sc, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    val want = (for (l <- 0 until L) yield {
      val routed = tokens.map { case (id, u) =>
        val arr = logits(l, id)
        (u, top1(arr), arr.max, id)
      }
      val capOf = routed.groupBy(_._1).view
        .mapValues(rs => (rs.size.toLong * 125 + E * 100 - 1) / (E * 100)).toMap
      val dropped = routed.groupBy(r => (r._1, r._2)).toSeq.flatMap {
        case ((u, e), rs) =>
          rs.sortBy(r => (-r._3, r._4)).zipWithIndex
            .filter { case (_, i) => i + 1 > capOf(u) }
            .map { case (r, _) => (e, r._4) }
      }
      (0 until E).map { e =>
        val nR = routed.count(_._2 == e).toLong
        val nD = dropped.count(_._1 == e).toLong
        (l, e) -> (nR, nD, round6(nD.toDouble / nR))
      }
    }).flatten.toMap
    assert(got == want, s"got $got\nwant $want")
    got.values.foreach { case (nR, nD, frac) =>
      assert(nD >= 0 && nD <= nR && frac <= 1.0) }
    // capacity factor 1.25 over a hash-uniform router keeps drops rare
    val total = got.values.map(_._1).sum.toDouble
    assert(got.values.map(_._2).sum / total < 0.25)
  }

  test("q_moe_routing_churn: exact re-derivation + independence level") {
    val got = MoeOps.qMoeRoutingChurn(sc, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val paths = tokens.map { case (id, _) =>
      Array.tabulate(L)(l => top1(logits(l, id))) }
    val want = (0 until L - 1).map { lf =>
      val changed = paths.count(p => p(lf) != p(lf + 1)).toLong
      lf -> (paths.size.toLong, changed,
        round6(changed.toDouble / paths.size))
    }.toMap
    assert(got == want, s"got $got\nwant $want")
    // independent uniform top-1 over 8 experts changes with p ≈ 7/8
    got.values.foreach { case (_, _, frac) =>
      assert(frac > 0.8 && frac < 0.95, s"churn $frac") }
  }
}
