package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Geo invariants: cell accounting, and COMPLETENESS of the
  * cell-bucketed radius join against a brute-force sample — the
  * property the shared oracle cannot check (both engines run the same
  * bucketing, so a too-small neighborhood would hash-match anyway).
  */
class GeoOpsSpec extends SparkSuite {

  private def run(name: String) = SparkEntry.queries(name)(sc, sfDir)

  test("geo cells partition the events table") {
    val cells = run("hfp_geo_cells").collect()
    assert(cells.map(_.getLong(2)).sum == Tables(sc, sfDir, "events").count())
    cells.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 400, s"cx out of grid: $r")
      assert(r.getLong(1) >= 0 && r.getLong(1) < 500, s"cy out of grid: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 100000.0)
    }
  }

  test("radius join is complete: brute force over a sample finds no extra pair") {
    val got = run("q_spatial_join").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (a, b) => assert(a < b) }
    // brute-force all pairs involving a 1-in-20 sample of points; every
    // within-radius pair must appear in the bucketed result
    val pts = run("hfp_geo_cells") // just to keep plans warm; not used below
    val coords = {
      val h1 = graft.functions.PortableHash.hash64(col("event_id").cast("string"))
      val h2 = graft.functions.PortableHash.hash64(col("event_id").cast("string"), 7)
      Tables(sc, sfDir, "events").select(col("event_id"),
        (lit(60.0) + (h1 % 40000L).cast("double") * lit(1e-5)).as("lat"),
        (lit(24.5) + (h2 % 50000L).cast("double") * lit(1e-5)).as("lng"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    }
    def hav(a: (Long, Double, Double), b: (Long, Double, Double)): Double = {
      val dLat = math.toRadians(b._2 - a._2) / 2.0
      val dLng = math.toRadians(b._3 - a._3) / 2.0
      val x = math.sin(dLat) * math.sin(dLat) +
        math.cos(math.toRadians(a._2)) * math.cos(math.toRadians(b._2)) *
          (math.sin(dLng) * math.sin(dLng))
      2.0 * 6371000.0 * math.asin(math.sqrt(x))
    }
    val sample = coords.filter(_._1 % 20 == 0)
    for (p <- sample; q <- coords if p._1 != q._1) {
      val d = math.rint(hav(p, q) * 1e6) / 1e6
      if (d <= 50.0) {
        val key = if (p._1 < q._1) (p._1, q._1) else (q._1, p._1)
        assert(got.contains(key), s"missed pair $key at ${d}m")
      }
    }
  }
}
