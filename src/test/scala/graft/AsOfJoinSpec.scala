package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The native as-of operator: plan shape (merge exec, one exchange per
  * side, no Window) and agreement with the window-composition
  * formulation under different partition counts.
  */
class AsOfJoinSpec extends SparkSuite {

  test("native as-of join plans as AsOfJoinExec with per-side exchanges, no window") {
    val df = SparkEntry.queries("q_asof_native")(sc, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "))
    assert(!p.contains("Window"), "native path must not fall back to a window")
    // one hash exchange per side on the key (plus the presentation sort)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p.take(1200))
  }

  test("native as-of equals the window composition, at several parallelism levels") {
    val composed = SparkEntry.queries("q_asof_join")(sc, sfDir)
      .collect().map(_.toSeq)
    for (parts <- Seq("1", "7")) {
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val native = SparkEntry.queries("q_asof_native")(sc, sfDir)
          .collect().map(_.toSeq)
        assert(native.length == composed.length)
        native.zip(composed).zipWithIndex.foreach { case ((n, c), i) =>
          assert(n == c, s"row $i differs at parts=$parts: native=$n composed=$c")
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
  }

  test("left rows with no preceding right row get nulls") {
    val ev = Tables(sc, sfDir, "events")
    val probe = ev.select(col("event_id"), col("user_id"), col("ts"))
    val build = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"),
        col("event_id").as("p_id"))
    val joined = graft.plans.AsOfJoin(probe, build, sc,
      col("user_id"), unix_micros(col("ts")),
      col("p_user"), unix_micros(col("pts")), col("p_id"))
    // every user's first event before any purchase must produce null pts;
    // sanity: some nulls exist and no pts is after its event's ts
    val rows = joined.select(col("ts"), col("pts")).collect()
    assert(rows.exists(_.isNullAt(1)), "expected at least one unmatched left row")
    rows.filter(!_.isNullAt(1)).foreach { r =>
      assert(!r.getTimestamp(1).after(r.getTimestamp(0)), "pts must be <= ts")
    }
  }
}
