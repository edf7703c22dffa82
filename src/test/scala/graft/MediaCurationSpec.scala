package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps2, Multimodal}

/** Properties of the round-11 multimodal wave beyond the hash-exact
  * oracle: keyframe selection is a true per-scene argmax aligned with
  * the scene segmentation, the EXIF router is an exhaustive exclusive
  * priority CASE, and the cross-modal contamination report respects the
  * split convention and agrees with the joint-dedup pair relation it
  * composes.
  */
class MediaCurationSpec extends SparkSuite {

  test("mm_keyframes: exactly one keyframe per scene, aligned with mm_scene_split") {
    val kf = Multimodal.mmKeyframes(sc, sfDir).collect()
    val scenes = Multimodal.mmSceneSplit(sc, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> n_scenes
    val perDoc = kf.groupBy(_.getLong(0))
    // one keyframe per (doc, scene): counts match the segmentation
    perDoc.foreach { case (doc, rows) =>
      assert(rows.length.toLong == scenes(doc),
        s"doc $doc: ${rows.length} keyframes vs ${scenes(doc)} scenes")
      val sceneIds = rows.map(_.getLong(1)).sorted.toSeq
      assert(sceneIds == sceneIds.distinct, s"doc $doc: duplicate scene keyframes")
    }
    assert(kf.length.toLong == scenes.values.sum)
  }

  test("mm_keyframes: the pick maximizes distance from the scene mean, earliest on ties") {
    // recompute the winner independently per (doc, scene) from the raw
    // frame features (small corpus — the in-test oracle the integer
    // cross-multiplication argmax must reproduce)
    val s = sc
    val frames = graft.sources.Tables(s, sfDir, "documents")
      .select(col("doc_id"),
        explode(sequence(lit(0L), least(col("n_chars"), lit(240L)) - 1)).as("i"),
        col("text"))
      .select(col("doc_id"), col("i"),
        ascii(col("text").substr(col("i").cast("int") + 1, lit(1))).cast("long").as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val got = Multimodal.mmKeyframes(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4))).toMap
    frames.take(40).foreach { case (doc, rows) =>
      // rebuild scenes with the same cut rule
      val sorted = rows.sortBy(_._2)
      var scene = 0L
      var prev = Long.MinValue
      val tagged = sorted.map { case (_, i, f) =>
        if (prev != Long.MinValue && math.abs(f - prev) > 12L) scene += 1
        prev = f
        (scene, i, f)
      }
      tagged.groupBy(_._1).foreach { case (sid, fs) =>
        val n = fs.length.toLong
        val sum = fs.map(_._3).sum
        val winner = fs.minBy { case (_, i, f) => (-math.abs(f * n - sum), i) }
        assert(got((doc, sid)) == ((winner._2, winner._3)),
          s"doc $doc scene $sid: got ${got((doc, sid))}, want $winner")
      }
    }
  }

  test("mm_exif_quarantine: exhaustive exclusive priority routing") {
    val rows = Multimodal.mmExifQuarantine(sc, sfDir).collect()
    val docs = graft.sources.Tables(sc, sfDir, "documents").count()
    assert(rows.length.toLong == docs, "one route per asset, none dropped")
    rows.foreach { r =>
      val (w, h, o, route, quarantined) =
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getString(4), r.getBoolean(5))
      // recompute the priority CASE: first failing rule wins
      val want =
        if (w < 8 || h < 8) "q_too_small"
        else if (w > h * 4 || h > w * 4) "q_bad_aspect"
        else if (o > 8) "q_bad_orientation"
        else "ok"
      assert(route == want, s"doc ${r.getLong(0)}: route $route, want $want ($w x $h, o=$o)")
      assert(quarantined == (route != "ok"))
    }
    // the synthesis ranges make multiple routes observable even at the
    // smallest scale — a router whose rules never fire tests nothing
    assert(rows.map(_.getString(4)).distinct.length >= 2)
  }

  test("mm_cross_contam: split convention respected; pairs agree with mm_joint_dedup") {
    val contam = DedupOps2.mmCrossContam(sc, sfDir).collect()
    val jointPairs = DedupOps2.mmJointDedup(sc, sfDir).collect()
      .map(r => Set(r.getLong(0), r.getLong(1)))
    contam.foreach { r =>
      val (eval, n, minHam, train) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(eval % 10 == 0, s"non-eval doc $eval reported")
      assert(train % 10 != 0, s"train witness $train is an eval doc")
      assert(n >= 1 && minHam <= 6)
      // the same blocking + threshold underlies the joint-dedup pair
      // relation, so each (eval, witness) pair must appear there
      assert(jointPairs.contains(Set(eval, train)),
        s"contamination pair ($eval, $train) missing from the joint-dedup relation")
    }
  }
}
