package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Multimodal column handling: media (image/audio/video) modeled as
  * opaque `binary` columns plus typed metadata, with decode /
  * feature-extraction running as a typed `mapPartitions` stage.
  *
  * The Spark-side plumbing is real and tested — schema, partition-wise
  * batch iteration, typed Encoders — while the codec itself is a
  * deterministic STUB (`fakeDecode`): this container has no image/audio
  * libraries, and the seam where a JNI/FFI decoder (or a Python worker
  * via Arrow) plugs in is exactly the `decode` function below.
  *
  * Scale notes: binary payloads ride the columnar scan like any other
  * column (parquet keeps them contiguous); `mapPartitions` processes a
  * whole partition per task so a native decoder amortizes init once per
  * partition, not per row. Keep partitions sized by bytes
  * (`maxPartitionBytes`), not row count, when payloads are large —
  * and for genuinely huge media, store a pointer column (URI) plus
  * metadata instead of inlining bytes.
  */
object Multimodal {

  /** A media row: payload + metadata (the `documents` text is the
    * stand-in payload source).
    */
  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Extracted features: what a decode+featurize stage emits. */
  case class MediaFeatures(
    doc_id: Long, n_bytes: Long, checksum: Long,
    width: Int, height: Int, mean_intensity: Double)

  /** The decode stub: deterministic pseudo-features from the raw bytes.
    * A real implementation replaces ONLY this function (e.g. libjpeg
    * via JNI) — signature and call site stay identical.
    */
  private def fakeDecode(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    val w = 16 + (sum % 16).toInt
    val h = 16 + ((sum / 16) % 16).toInt
    MediaFeatures(r.doc_id, bytes.length.toLong, sum,
      w, h, sum.toDouble / math.max(bytes.length, 1))
  }

  /** Binary-column construction + per-payload metadata, fully
    * expressible relationally (has a DuckDB oracle).
    */
  def mmBinaryStats(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(to_binary(col("text"), lit("utf-8"))).cast(LongType).as("n_bytes"),
        sha2(to_binary(col("text"), lit("utf-8")), 256).as("sha256"),
        lit("text/plain").as("media_type"))
      .orderBy("doc_id")

  private val mmBinaryStatsSql =
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  sha256(text) AS sha256, 'text/plain' AS media_type
      |FROM documents ORDER BY doc_id""".stripMargin

  /** The typed decode pipeline: binary payloads → mapPartitions over
    * the stub codec → feature rows. Deterministic, so it still gets a
    * rows+schema check from the driver (no SQL oracle: the partition-
    * iterator stage is the point).
    */
  def mmDecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = Tables(s, dir, "documents")
      .select(col("doc_id"),
        to_binary(col("text"), lit("utf-8")).as("payload"),
        lit("text/plain").as("media_type"))
      .as[MediaRow]
    media
      .mapPartitions(rows => rows.map(fakeDecode))
      .toDF()
      .orderBy("doc_id")
  }

  /** Modality routing (the C5 pattern applied to media): assign each
    * payload a modality, route to per-modality groups, report count +
    * byte volume per target — the fan-out step before per-modality
    * decode fleets at 100 TB (each modality's files land in their own
    * partition/prefix, pruned by downstream readers).
    */
  def mmModalityRoute(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("modality",
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video"))
      .groupBy("modality")
      .agg(count(lit(1)).as("n_items"),
        sum(octet_length(to_binary(col("text"), lit("utf-8")))).cast(LongType).as("total_bytes"))
      .orderBy("modality")

  private val mmModalityRouteSql =
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
      |FROM documents GROUP BY 1 ORDER BY modality""".stripMargin

  /** ViT-style patch grid fan-out: each decoded image explodes into
    * its 8×8 patch tiles (edge tiles clipped), keyed by (row, col) in
    * the grid — the preprocessing fan-out in front of a vision encoder.
    * Demonstrates the scale-critical ordering: the EXPLOSION runs after
    * the narrow decode stage, so the wire and shuffle only ever carry
    * patch METADATA; real pixel slabs would stay columnar alongside
    * and be sliced by the consumer.
    */
  def mmPatchify(s: SparkSession, dir: String): DataFrame = {
    val P = 8
    mmDecodeFeatures(s, dir)
      .select(col("doc_id"), col("width"), col("height"))
      .withColumn("prow",
        explode(sequence(lit(0), expr(s"CAST((height + ${P - 1}) DIV $P AS INT) - 1"))))
      .withColumn("pcol",
        explode(sequence(lit(0), expr(s"CAST((width + ${P - 1}) DIV $P AS INT) - 1"))))
      .select(col("doc_id"),
        col("prow").cast(LongType).as("prow"), col("pcol").cast(LongType).as("pcol"),
        least(lit(P), col("width") - col("pcol") * P).cast(IntegerType).as("patch_w"),
        least(lit(P), col("height") - col("prow") * P).cast(IntegerType).as("patch_h"))
      .orderBy("doc_id", "prow", "pcol")
  }

  private val PhashBits = 16

  /** Perceptual-fingerprint near-dup over the binary payload — the
    * image-dedup shape (pHash): split the payload into 16 equal
    * segments, 1 bit per segment = "segment mean above payload mean",
    * collide fingerprints into buckets. The mean comparison uses
    * integer cross-multiplication (`sum_seg·n > sum_all·n_seg`) — no
    * float ever enters the fingerprint, so it is exact in any engine
    * and under any partitioning. One explode + two map-combining
    * aggregates; the bucket join replaces the quadratic pair scan
    * (hamming-radius probing adds the simhash-style band trick — same
    * machinery as dd_simhash).
    */
  /** Per-doc perceptual fingerprints (doc_id, phash) — the synthetic
    * image-modality hash (segment-mean thresholding over the decoded
    * byte stream, here the doc's char codes). Doc-sized and cached:
    * shared by [[mmPhashBuckets]] and [[DedupOps2]]'s cross-modal
    * joint dedup.
    */
  private[operators] def phashFingerprints(s: SparkSession, dir: String): DataFrame = {
    val chars = Tables(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(array_remove(split(col("text"), ""), "")).as(Seq("p", "ch")))
      .select(col("doc_id"), col("p"), ascii(col("ch")).cast(LongType).as("code"))
    val tot = chars.groupBy("doc_id")
      .agg(sum("code").as("s_all"), count(lit(1)).as("n_all"))
    val seg = chars.join(broadcast(tot), "doc_id")
      .select(col("doc_id"), col("s_all"), col("n_all"),
        floor(col("p") * PhashBits / col("n_all")).cast(LongType).as("seg"),
        col("code"))
      .groupBy("doc_id", "seg", "s_all", "n_all")
      .agg(sum("code").as("s_seg"), count(lit(1)).as("n_seg"))
    seg
      .select(col("doc_id"),
        when(col("s_seg") * col("n_all") > col("s_all") * col("n_seg"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(seg AS INT))")).otherwise(0L).as("b"))
      .groupBy("doc_id").agg(sum("b").as("phash"))
      .cache()
  }

  def mmPhashBuckets(s: SparkSession, dir: String): DataFrame = {
    val fp = phashFingerprints(s, dir)
    fp.groupBy("phash")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .where(col("n_docs") > 1)
      .orderBy(desc("n_docs"), asc("phash"))
  }

  /** CTE chain ending in `fp(doc_id, phash)` — the oracle twin of
    * [[phashFingerprints]], shared with [[DedupOps2]]'s joint dedup.
    */
  private[operators] val phashFpSqlChain: String =
    s"""chars AS (
       |  SELECT doc_id, i - 1 AS p, CAST(ord(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT) AS code
       |  FROM (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i FROM documents)),
       |tot AS (SELECT doc_id, CAST(SUM(code) AS BIGINT) AS s_all,
       |               COUNT(*) AS n_all FROM chars GROUP BY doc_id),
       |seg AS (
       |  SELECT c.doc_id, t.s_all, t.n_all,
       |    CAST(floor(c.p * $PhashBits / t.n_all) AS BIGINT) AS seg,
       |    CAST(SUM(c.code) AS BIGINT) AS s_seg, COUNT(*) AS n_seg
       |  FROM chars c JOIN tot t ON c.doc_id = t.doc_id
       |  GROUP BY 1, 2, 3, 4),
       |fp AS (
       |  SELECT doc_id, CAST(SUM(CASE WHEN s_seg * n_all > s_all * n_seg
       |    THEN (CAST(1 AS BIGINT) << CAST(seg AS INT)) ELSE 0 END) AS BIGINT) AS phash
       |  FROM seg GROUP BY doc_id)""".stripMargin

  private val mmPhashSql =
    s"""WITH $phashFpSqlChain
       |SELECT phash, COUNT(*) AS n_docs,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM fp GROUP BY phash HAVING COUNT(*) > 1
       |ORDER BY n_docs DESC, phash ASC""".stripMargin

  /** A resized image summary: the downsample stage's emission. */
  case class ResizedImage(doc_id: Long, new_w: Int, new_h: Int, px_sum: Long)

  /** 2× box-filter downsample — the resize stage of an image
    * preprocessing pipeline, as a typed `mapPartitions` kernel over the
    * decoded plane (same seam as [[fakeDecode]]: a real resampler —
    * libvips/Pillow-SIMD via FFI — replaces only the inner loop). The
    * stub pixel plane is deterministic integer arithmetic over the
    * payload checksum, px(x,y) = (checksum + 31x + 17y) mod 256, so the
    * whole kernel — synthesize, 2×2 box average with floor division,
    * sum — has an exact integer oracle. Narrow stage: one task per
    * partition, output is one metadata row per image; real pixel slabs
    * would stream through the same iterator without materializing.
    */
  def mmResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = Tables(s, dir, "documents")
      .select(col("doc_id"),
        to_binary(col("text"), lit("utf-8")).as("payload"),
        lit("text/plain").as("media_type"))
      .as[MediaRow]
    media.mapPartitions(rows => rows.map { r =>
      val f = fakeDecode(r)
      val nw = f.width / 2
      val nh = f.height / 2
      var sum = 0L
      var by = 0
      while (by < nh) {
        var bx = 0
        while (bx < nw) {
          def px(x: Int, y: Int): Long = (f.checksum + 31L * x + 17L * y) % 256L
          val box = px(2 * bx, 2 * by) + px(2 * bx + 1, 2 * by) +
            px(2 * bx, 2 * by + 1) + px(2 * bx + 1, 2 * by + 1)
          sum += box / 4
          bx += 1
        }
        by += 1
      }
      ResizedImage(r.doc_id, nw, nh, sum)
    }).toDF().orderBy("doc_id")
  }

  private val mmResizeSql =
    """WITH s AS (SELECT doc_id,
      |    CAST(list_aggregate(list_transform(regexp_split_to_array(text, ''), c -> ord(c)), 'sum') AS BIGINT) AS checksum
      |  FROM documents),
      |dims AS (SELECT doc_id, checksum,
      |    CAST(divide(16 + checksum % 16, 2) AS INT) AS new_w,
      |    CAST(divide(16 + divide(checksum, 16) % 16, 2) AS INT) AS new_h
      |  FROM s),
      |rows_y AS (SELECT doc_id, checksum, new_w, new_h,
      |    unnest(range(0, new_h)) AS by FROM dims),
      |cells AS (SELECT doc_id, checksum, new_w, new_h, by,
      |    unnest(range(0, new_w)) AS bx FROM rows_y),
      |boxes AS (SELECT doc_id, new_w, new_h,
      |    divide((checksum + 31 * (2 * bx) + 17 * (2 * by)) % 256
      |     + (checksum + 31 * (2 * bx + 1) + 17 * (2 * by)) % 256
      |     + (checksum + 31 * (2 * bx) + 17 * (2 * by + 1)) % 256
      |     + (checksum + 31 * (2 * bx + 1) + 17 * (2 * by + 1)) % 256, 4) AS avg
      |  FROM cells)
      |SELECT doc_id, new_w, new_h, CAST(SUM(avg) AS BIGINT) AS px_sum
      |FROM boxes GROUP BY doc_id, new_w, new_h ORDER BY doc_id""".stripMargin

  private val VadThreshold = 500L // energies are uniform over [0, 1000)

  /** Voice-activity segmentation over stub-decoded audio: each payload
    * fans out into its frame count (derived from the checksum, standing
    * in for duration/hop), per-frame energy is deterministic hash
    * arithmetic (the seam a real RMS-energy extractor replaces), frames
    * above [[VadThreshold]] are voiced, and maximal voiced runs
    * coalesce into segments via the islands trick — the running count
    * of UNVOICED frames is constant exactly across a voiced run, so it
    * is the segment key with no self-join and no iteration. Per-doc
    * output: frame/voiced/segment counts, longest segment, first voiced
    * frame. The frame fan-out happens after the narrow per-doc stage
    * (mm_patchify discipline) and the segmentation window partitions by
    * doc — embarrassingly parallel at 100 TB.
    */
  def mmAudioVad(s: SparkSession, dir: String): DataFrame = {
    val checksum = aggregate(
      transform(split(col("text"), ""), c => ascii(c).cast(LongType)),
      lit(0L), (acc, x) => acc + x)
    val byFrame = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("fi")
    val frames = Tables(s, dir, "documents")
      .select(col("doc_id"), checksum.as("cs"))
      .select(col("doc_id"), (lit(8) + col("cs") % 24).cast(IntegerType).as("nf"))
      .select(col("doc_id"), col("nf"),
        explode(sequence(lit(0), col("nf") - 1)).as("fi"))
      .withColumn("energy", graft.functions.PortableHash.hash64(
        concat(col("doc_id").cast(StringType), lit(":"), col("fi").cast(StringType))) % 1000L)
      .withColumn("voiced", col("energy") >= VadThreshold)
      .withColumn("seg_key",
        sum(when(col("voiced"), 0L).otherwise(1L)).over(byFrame))
    val segs = frames.where(col("voiced"))
      .groupBy("doc_id", "seg_key")
      .agg(count(lit(1)).as("seg_len"), min("fi").as("seg_start"))
    val perDoc = segs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        sum("seg_len").as("n_voiced"),
        max("seg_len").as("longest_segment"),
        min("seg_start").as("first_voiced"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), checksum.as("cs"))
      .select(col("doc_id"), (lit(8) + col("cs") % 24).cast(LongType).as("n_frames"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"),
        coalesce(col("n_voiced"), lit(0L)).as("n_voiced"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("longest_segment"), lit(0L)).as("longest_segment"),
        coalesce(col("first_voiced"), lit(-1L)).as("first_voiced"))
      .orderBy("doc_id")
  }

  private val mmAudioVadSql = {
    import graft.functions.{PortableHash => PH}
    val energy = PH.sql("CAST(doc_id AS STRING) || ':' || CAST(fi AS STRING)") + " % 1000"
    s"""WITH s AS (SELECT doc_id,
       |    CAST(list_aggregate(list_transform(regexp_split_to_array(text, ''), c -> ord(c)), 'sum') AS BIGINT) AS cs
       |  FROM documents),
       |nf AS (SELECT doc_id, CAST(8 + cs % 24 AS BIGINT) AS n_frames FROM s),
       |fr AS (SELECT doc_id, n_frames, unnest(range(0, n_frames)) AS fi FROM nf),
       |en AS (SELECT doc_id, fi, $energy AS energy FROM fr),
       |marked AS (SELECT doc_id, fi, energy >= $VadThreshold AS voiced,
       |    SUM(CASE WHEN energy >= $VadThreshold THEN 0 ELSE 1 END)
       |      OVER (PARTITION BY doc_id ORDER BY fi) AS seg_key
       |  FROM en),
       |segs AS (SELECT doc_id, seg_key, COUNT(*) AS seg_len, min(fi) AS seg_start
       |  FROM marked WHERE voiced GROUP BY doc_id, seg_key),
       |per_doc AS (SELECT doc_id, COUNT(*) AS n_segments,
       |    CAST(SUM(seg_len) AS BIGINT) AS n_voiced,
       |    max(seg_len) AS longest_segment, min(seg_start) AS first_voiced
       |  FROM segs GROUP BY doc_id)
       |SELECT nf.doc_id, nf.n_frames,
       |  coalesce(p.n_voiced, 0) AS n_voiced,
       |  coalesce(p.n_segments, 0) AS n_segments,
       |  coalesce(p.longest_segment, 0) AS longest_segment,
       |  coalesce(p.first_voiced, -1) AS first_voiced
       |FROM nf LEFT JOIN per_doc p ON nf.doc_id = p.doc_id
       |ORDER BY nf.doc_id""".stripMargin
  }

  private val SceneMaxFrames = 240L
  private val SceneCutDelta = 12L // |Δ feature| > this ⇒ new scene

  /** Shared frame → scene-id chain of [[mmSceneSplit]] and
    * [[mmKeyframes]]: per-frame features are the frame-sample synthesis
    * at stride 1, a cut falls wherever the feature jumps by more than
    * [[SceneCutDelta]], and the running cut count is the scene id.
    * Columns: (doc_id, frame_idx, f, scene); the window is per-doc —
    * videos parallelize across assets, never across one asset's frames.
    */
  private def sceneFrames(s: SparkSession, dir: String): DataFrame = {
    val byIdx = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        explode(sequence(lit(0L), least(col("n_chars"), lit(SceneMaxFrames)) - 1)).as("frame_idx"),
        col("text"))
      .select(col("doc_id"), col("frame_idx"),
        ascii(col("text").substr(col("frame_idx").cast(IntegerType) + 1, lit(1)))
          .cast(LongType).as("f"))
      .withColumn("prev", lag("f", 1).over(byIdx))
      .withColumn("cut",
        when(col("prev").isNotNull && abs(col("f") - col("prev")) > SceneCutDelta, 1L)
          .otherwise(0L))
      .withColumn("scene", sum("cut").over(byIdx))
  }

  /** Shot/scene segmentation over the video stand-in: per-frame
    * features are the mm_frame_sample synthesis at stride 1, a scene
    * cut falls wherever the feature jumps by more than
    * [[SceneCutDelta]] against the previous frame (the content-delta
    * heuristic real shot detectors threshold on histogram distance),
    * and the running cut count is the scene id — same islands shape as
    * mm_audio_vad, partitioned per doc. Output: per-video scene stats
    * (count, longest, first cut), the metadata a frame-sampler uses to
    * pick one keyframe per scene instead of a blind stride.
    */
  def mmSceneSplit(s: SparkSession, dir: String): DataFrame = {
    val cuts = sceneFrames(s, dir)
    val scenes = cuts.groupBy("doc_id", "scene")
      .agg(count(lit(1)).as("scene_len"), min("frame_idx").as("scene_start"))
    scenes.groupBy("doc_id")
      .agg(count(lit(1)).as("n_scenes"),
        sum("scene_len").as("n_frames"),
        max("scene_len").as("longest_scene"),
        min(when(col("scene_start") > 0, col("scene_start"))).as("first_cut"))
      .select(col("doc_id"), col("n_frames"), col("n_scenes"),
        col("longest_scene"), coalesce(col("first_cut"), lit(-1L)).as("first_cut"))
      .orderBy("doc_id")
  }

  private val mmSceneSplitSql =
    s"""WITH fr AS (
       |  SELECT doc_id, frame_idx,
       |    CAST(ord(substr(text, CAST(frame_idx AS INT) + 1, 1)) AS BIGINT) AS f
       |  FROM documents CROSS JOIN range(0, $SceneMaxFrames) r(frame_idx)
       |  WHERE frame_idx < least(n_chars, $SceneMaxFrames)),
       |cuts AS (
       |  SELECT doc_id, frame_idx, f,
       |    CASE WHEN lag(f) OVER w IS NOT NULL
       |              AND abs(f - lag(f) OVER w) > $SceneCutDelta
       |         THEN 1 ELSE 0 END AS cut
       |  FROM fr WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
       |sc AS (
       |  SELECT doc_id, frame_idx,
       |    SUM(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS scene
       |  FROM cuts),
       |scenes AS (
       |  SELECT doc_id, scene, COUNT(*) AS scene_len, min(frame_idx) AS scene_start
       |  FROM sc GROUP BY doc_id, scene)
       |SELECT doc_id, CAST(SUM(scene_len) AS BIGINT) AS n_frames,
       |  COUNT(*) AS n_scenes, max(scene_len) AS longest_scene,
       |  coalesce(min(CASE WHEN scene_start > 0 THEN scene_start END), -1) AS first_cut
       |FROM scenes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Keyframe selection over the scene segmentation: per scene, the
    * frame MOST REPRESENTATIVE of the scene is the one maximizing the
    * feature's distance from the scene mean — the "pick one frame per
    * shot" stage a video-training pipeline runs after [[mmSceneSplit]]
    * (a blind stride oversamples static scenes and misses short ones).
    * Distance uses the integer cross-multiplication trick
    * (|f·n − Σf| ∝ |f − mean|, no float division), ties break to the
    * earliest frame via an explicit two-key `row_number` — exact and
    * partitioning-invariant on any engine. Same per-asset windows as
    * the scene chain: wide across videos, never across one video's
    * frames; the per-scene aggregate and the rank share one shuffle key
    * family (doc_id), so the whole selection is two window passes and
    * one keyed aggregate over frame METADATA (pixels stay at the
    * decode seam).
    */
  def mmKeyframes(s: SparkSession, dir: String): DataFrame = {
    val sc = sceneFrames(s, dir)
    // per-scene stats as UNBOUNDED window aggregates instead of a
    // groupBy + join-back: HashPartitioning(doc_id) — already
    // established by the scene chain's lag/cumsum window — satisfies
    // ClusteredDistribution(doc_id, scene), so all three window passes
    // ride ONE exchange of the frame relation, where the join shape
    // shuffled the full 240·|docs| frame rows a second time (measured
    // 1.49 s → the window form at sf0.1; scene groups are short, so
    // WindowExec's per-group buffer stays tiny)
    val byScene = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id", "scene")
    // argmax as the map-side-combinable min(struct(...)) idiom (the
    // qSurvivorship pattern) instead of a rank window: the rank form
    // costs one more full sort of the frame relation; the struct-min
    // hash-aggregates on the already-satisfied (doc, scene) clustering
    // with NO sort and partial aggregation inside the window stage
    sc
      .withColumn("scene_len", count(lit(1)).over(byScene))
      .withColumn("fsum", sum("f").over(byScene))
      .groupBy("doc_id", "scene", "scene_len")
      .agg(min(struct(
        (-abs(col("f") * col("scene_len") - col("fsum"))).as("negscore"),
        col("frame_idx").as("ki"), col("f").as("kf"))).as("b"))
      .select(col("doc_id"), col("scene"), col("scene_len"),
        col("b.ki").as("keyframe_idx"), col("b.kf").as("kf_feature"))
      .orderBy("doc_id", "scene")
  }

  private val mmKeyframesSql =
    s"""WITH fr AS (
       |  SELECT doc_id, frame_idx,
       |    CAST(ord(substr(text, CAST(frame_idx AS INT) + 1, 1)) AS BIGINT) AS f
       |  FROM documents CROSS JOIN range(0, $SceneMaxFrames) r(frame_idx)
       |  WHERE frame_idx < least(n_chars, $SceneMaxFrames)),
       |cuts AS (
       |  SELECT doc_id, frame_idx, f,
       |    CASE WHEN lag(f) OVER w IS NOT NULL
       |              AND abs(f - lag(f) OVER w) > $SceneCutDelta
       |         THEN 1 ELSE 0 END AS cut
       |  FROM fr WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
       |sc AS (
       |  SELECT doc_id, frame_idx, f,
       |    SUM(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS scene
       |  FROM cuts),
       |stats AS (
       |  SELECT doc_id, scene, COUNT(*) AS scene_len,
       |    CAST(SUM(f) AS BIGINT) AS fsum
       |  FROM sc GROUP BY doc_id, scene),
       |scored AS (
       |  SELECT s.doc_id, s.scene, t.scene_len, s.frame_idx, s.f,
       |    row_number() OVER (PARTITION BY s.doc_id, s.scene
       |      ORDER BY abs(s.f * t.scene_len - t.fsum) DESC, s.frame_idx ASC) AS rk
       |  FROM sc s JOIN stats t ON t.doc_id = s.doc_id AND t.scene = s.scene)
       |SELECT doc_id, CAST(scene AS BIGINT) AS scene, scene_len,
       |  frame_idx AS keyframe_idx, f AS kf_feature
       |FROM scored WHERE rk = 1 ORDER BY doc_id, scene""".stripMargin

  // EXIF-style sanity bounds for the quarantine router
  private val ExifMinSide = 8      // below ⇒ too_small
  private val ExifMaxAspect = 4L   // w > 4h or h > 4w ⇒ bad_aspect
  private val ExifMaxOrientation = 8 // EXIF orientation is 1..8

  /** EXIF/dimension sanity filtering with quarantine routing — the C5
    * journey-type routing pattern applied to multimodal METADATA: every
    * asset is assigned exactly one route by a priority CASE (first
    * failing rule wins), bad assets land in named quarantine buckets a
    * downstream writer turns into per-route prefixes, and good assets
    * flow on. The synthetic EXIF block derives deterministically from
    * the payload checksum (the [[fakeDecode]] seam's relational twin):
    * wide-range dims so every rule observably fires, an orientation
    * field whose synthesis range (1..10) exceeds the EXIF-legal 1..8
    * exactly like real corrupt writers do. Pure integer column
    * arithmetic — whole-stage codegen, one scan, map-combining
    * aggregate for the checksum; no float anywhere.
    */
  def mmExifQuarantine(s: SparkSession, dir: String): DataFrame = {
    val cs = Tables(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_remove(split(col("text"), ""), "")).as("ch"))
      .select(col("doc_id"), ascii(col("ch")).cast(LongType).as("code"))
      .groupBy("doc_id").agg(sum("code").as("checksum"))
    val meta = cs.select(col("doc_id"),
      (col("checksum") % 4096).as("width"),
      (expr("checksum div 64") % 4096).as("height"),
      (col("checksum") % 10 + 1).cast(IntegerType).as("orientation"))
    meta
      .withColumn("route",
        when(col("width") < ExifMinSide || col("height") < ExifMinSide, "q_too_small")
          .when(col("width") > col("height") * ExifMaxAspect ||
            col("height") > col("width") * ExifMaxAspect, "q_bad_aspect")
          .when(col("orientation") > ExifMaxOrientation, "q_bad_orientation")
          .otherwise("ok"))
      .withColumn("quarantined", col("route") =!= "ok")
      .orderBy("doc_id")
  }

  private val mmExifQuarantineSql =
    s"""WITH cs AS (SELECT doc_id,
       |    CAST(list_aggregate(list_transform(regexp_split_to_array(text, ''), c -> ord(c)), 'sum') AS BIGINT) AS checksum
       |  FROM documents),
       |meta AS (SELECT doc_id,
       |    checksum % 4096 AS width,
       |    divide(checksum, 64) % 4096 AS height,
       |    CAST(checksum % 10 + 1 AS INT) AS orientation
       |  FROM cs),
       |routed AS (SELECT doc_id, width, height, orientation,
       |    CASE WHEN width < $ExifMinSide OR height < $ExifMinSide THEN 'q_too_small'
       |         WHEN width > height * $ExifMaxAspect
       |              OR height > width * $ExifMaxAspect THEN 'q_bad_aspect'
       |         WHEN orientation > $ExifMaxOrientation THEN 'q_bad_orientation'
       |         ELSE 'ok' END AS route
       |  FROM meta)
       |SELECT doc_id, width, height, orientation, route,
       |  route <> 'ok' AS quarantined
       |FROM routed ORDER BY doc_id""".stripMargin

  private val JitterEpochs = 3
  private val CropSize = 12 // stub dims are 16..31 — a 12² crop always fits

  /** Deterministic crop-and-flip augmentation parameters — the metadata
    * half of a training-time augmentation stage, computed relationally:
    * for each (image, epoch) the crop offsets and flip bit derive from
    * the portable 60-bit hash of (doc_id, epoch), so every re-run — and
    * every engine — schedules the identical augmentation for a given
    * sample/epoch (reproducible training, resumable mid-epoch). The
    * pixel work itself belongs to the decode seam ([[fakeDecode]]);
    * this stage is pure column arithmetic, stays in whole-stage
    * codegen, and fans out |docs|·epochs rows only AFTER the narrow
    * per-doc dims computation (the mm_patchify discipline).
    */
  def mmCropJitter(s: SparkSession, dir: String): DataFrame = {
    val checksum = aggregate(
      transform(split(col("text"), ""), c => ascii(c).cast(LongType)),
      lit(0L), (acc, x) => acc + x)
    val dims = Tables(s, dir, "documents")
      .select(col("doc_id"), checksum.as("cs"))
      .select(col("doc_id"),
        (lit(16) + col("cs") % 16).cast(IntegerType).as("w"),
        (lit(16) + expr("cs div 16") % 16).cast(IntegerType).as("h"))
    def h(tag: String) = graft.functions.PortableHash.hash64(
      concat(col("doc_id").cast(StringType), lit(":"),
        col("epoch").cast(StringType), lit(s":$tag")))
    dims
      .select(col("doc_id"), col("w"), col("h"),
        explode(sequence(lit(0), lit(JitterEpochs - 1))).as("epoch"))
      .select(col("doc_id"), col("epoch"),
        (h("x") % (col("w") - CropSize + 1)).cast(IntegerType).as("crop_x"),
        (h("y") % (col("h") - CropSize + 1)).cast(IntegerType).as("crop_y"),
        lit(CropSize).as("crop_w"), lit(CropSize).as("crop_h"),
        (h("f") % 2 === 0).as("flip"))
      .orderBy("doc_id", "epoch")
  }

  private val mmCropJitterSql = {
    import graft.functions.{PortableHash => PH}
    def h(tag: String) = PH.sql(
      s"CAST(doc_id AS STRING) || ':' || CAST(epoch AS STRING) || ':$tag'")
    s"""WITH s AS (SELECT doc_id,
       |    CAST(list_aggregate(list_transform(regexp_split_to_array(text, ''), c -> ord(c)), 'sum') AS BIGINT) AS cs
       |  FROM documents),
       |dims AS (SELECT doc_id,
       |    CAST(16 + cs % 16 AS INT) AS w,
       |    CAST(16 + divide(cs, 16) % 16 AS INT) AS h
       |  FROM s),
       |fan AS (SELECT doc_id, w, h, e.epoch
       |  FROM dims CROSS JOIN range(0, $JitterEpochs) e(epoch))
       |SELECT doc_id, epoch,
       |  CAST(${h("x")} % (w - $CropSize + 1) AS INT) AS crop_x,
       |  CAST(${h("y")} % (h - $CropSize + 1) AS INT) AS crop_y,
       |  $CropSize AS crop_w, $CropSize AS crop_h,
       |  ${h("f")} % 2 = 0 AS flip
       |FROM fan ORDER BY doc_id, epoch""".stripMargin
  }

  // ------------------------------------------- audio fingerprinting

  private val FpMaxDt = 6L // anchor→target pairing horizon (frames)
  private val FpTopK = 40

  /** Shazam-style constellation fingerprinting over the synthesized
    * frame energies (the same deterministic RMS-extractor seam as
    * [[mmAudioVad]]): landmark frames are local energy maxima
    * (strictly above both neighbors), each anchor pairs with the NEXT
    * landmark within [[FpMaxDt]] frames, and the (quantized-energy,
    * quantized-energy, Δt) triple hashes to the fingerprint. The
    * corpus rollup counts how often each fingerprint recurs and in
    * how many documents — the bucket join a recognition query would
    * probe. Everything is per-document windows + one hash aggregate;
    * the landmark relation is peaks-only, far smaller than frames.
    */
  def mmAudioFingerprint(s: SparkSession, dir: String): DataFrame = {
    val byFi = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("fi")
    val checksum = aggregate(
      transform(split(col("text"), ""), c => ascii(c).cast(LongType)),
      lit(0L), (acc, x) => acc + x)
    val frames = Tables(s, dir, "documents")
      .select(col("doc_id"), checksum.as("cs"))
      .select(col("doc_id"), (lit(8) + col("cs") % 24).cast(IntegerType).as("nf"))
      .select(col("doc_id"), explode(sequence(lit(0), col("nf") - 1)).as("fi"))
      .withColumn("energy", graft.functions.PortableHash.hash64(
        concat(col("doc_id").cast(StringType), lit(":"), col("fi").cast(StringType))) % 1000L)
    val peaks = frames
      .withColumn("prev", lag("energy", 1).over(byFi))
      .withColumn("next", lead("energy", 1).over(byFi))
      .where(col("prev").isNotNull && col("next").isNotNull &&
        col("energy") > col("prev") && col("energy") > col("next"))
    val pairs = peaks
      .withColumn("t_fi", lead("fi", 1).over(byFi))
      .withColumn("t_energy", lead("energy", 1).over(byFi))
      .where(col("t_fi").isNotNull && col("t_fi") - col("fi") <= FpMaxDt)
    val fps = pairs.select(col("doc_id"),
      graft.functions.PortableHash.hash64(concat(
        (col("energy") % 64).cast(StringType), lit(":"),
        (col("t_energy") % 64).cast(StringType), lit(":"),
        (col("t_fi") - col("fi")).cast(StringType))).as("fp"))
    fps.groupBy("fp")
      .agg(count(lit(1)).as("n_pairs"), countDistinct("doc_id").as("n_docs"))
      .orderBy(desc("n_pairs"), asc("fp"))
      .limit(FpTopK)
  }

  private val mmAudioFingerprintSql = {
    import graft.functions.{PortableHash => PH}
    val energy = PH.sql("CAST(doc_id AS STRING) || ':' || CAST(fi AS STRING)") + " % 1000"
    val fp = PH.sql("CAST(energy % 64 AS STRING) || ':' || CAST(t_energy % 64 AS STRING) || ':' || CAST(t_fi - fi AS STRING)")
    s"""WITH s AS (SELECT doc_id,
       |    CAST(list_aggregate(list_transform(regexp_split_to_array(text, ''), c -> ord(c)), 'sum') AS BIGINT) AS cs
       |  FROM documents),
       |nf AS (SELECT doc_id, CAST(8 + cs % 24 AS BIGINT) AS n_frames FROM s),
       |fr AS (SELECT doc_id, unnest(range(0, n_frames)) AS fi FROM nf),
       |en AS (SELECT doc_id, fi, $energy AS energy FROM fr),
       |nb AS (SELECT doc_id, fi, energy,
       |    lag(energy, 1) OVER w AS prev, lead(energy, 1) OVER w AS next
       |  FROM en WINDOW w AS (PARTITION BY doc_id ORDER BY fi)),
       |peaks AS (SELECT doc_id, fi, energy FROM nb
       |  WHERE prev IS NOT NULL AND next IS NOT NULL
       |    AND energy > prev AND energy > next),
       |pairs AS (SELECT doc_id, fi, energy,
       |    lead(fi, 1) OVER w AS t_fi, lead(energy, 1) OVER w AS t_energy
       |  FROM peaks WINDOW w AS (PARTITION BY doc_id ORDER BY fi)),
       |fps AS (SELECT doc_id, $fp AS fp FROM pairs
       |  WHERE t_fi IS NOT NULL AND t_fi - fi <= $FpMaxDt)
       |SELECT fp, COUNT(*) AS n_pairs, COUNT(DISTINCT doc_id) AS n_docs
       |FROM fps GROUP BY fp
       |ORDER BY n_pairs DESC, fp ASC LIMIT $FpTopK""".stripMargin
  }

  // ------------------------------------------------------------- mfcc

  private val MfccFrames = 16 // fixed analysis frames per clip
  private val MfccCoefs = 8   // DCT-II coefficients kept
  private val MfccQ = 1000000L // 1e-6-rounded terms → exact integer sums

  /** MFCC-style spectral features over the stub audio decode: each
    * clip's 16 deterministic frame energies pass through a DCT-II and
    * the first 8 coefficients are kept — the classic compact audio
    * descriptor (the mel filterbank + log of a real MFCC sit in the
    * same per-frame position; the stub keeps the transform REAL while
    * the decode is fake, like mm_resize/mm_decode_features). Shape:
    * explode 16 frames × 8 coefficients per clip, one
    * map-side-combinable groupBy — linear in clips, no windows, no
    * state; at 100 TB the per-clip fan-out is a constant 128 rows.
    *
    * Engine-exact via the trajectory pattern: each cosine term is
    * rounded at 1e-6 and quantized to an integer, so the per-
    * coefficient sum is order-independent; cos/π agree bit-for-bit
    * across engines on these arguments (the geo family's haversine
    * relies on the same).
    */
  def mmMfcc(s: SparkSession, dir: String): DataFrame = {
    val term = col("e") *
      cos(lit(math.Pi) * col("k") * (lit(2) * col("fi") + 1) / lit(2 * MfccFrames))
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(sequence(lit(0), lit(MfccFrames - 1))).as("fi"))
      .withColumn("e", (graft.functions.PortableHash.hash64(
        concat(col("doc_id").cast(StringType), lit(":"), col("fi").cast(StringType)))
        % 1000L).cast(DoubleType))
      .select(col("doc_id"), col("fi"), col("e"),
        explode(sequence(lit(0), lit(MfccCoefs - 1))).as("k"))
      .select(col("doc_id"), col("k"),
        floor(round(term, 6) * MfccQ + 0.5).cast(LongType).as("tq"))
      .groupBy("doc_id", "k")
      .agg(round(sum("tq").cast(DoubleType) / MfccQ, 6).as("coef"))
      .orderBy("doc_id", "k")
  }

  private val mmMfccSql = {
    import graft.functions.{PortableHash => PH}
    val energy = PH.sql("CAST(doc_id AS STRING) || ':' || CAST(fi AS STRING)") + " % 1000"
    val term = s"CAST(e AS DOUBLE) * cos(pi() * k * (2 * fi + 1) / ${2 * MfccFrames})"
    s"""WITH fr AS (
       |  SELECT doc_id, unnest(range(0, $MfccFrames)) AS fi FROM documents),
       |en AS (SELECT doc_id, fi, $energy AS e FROM fr),
       |terms AS (
       |  SELECT doc_id, k, CAST(floor(round($term, 6) * $MfccQ + 0.5) AS BIGINT) AS tq
       |  FROM en CROSS JOIN (SELECT unnest(range(0, $MfccCoefs)) AS k))
       |SELECT doc_id, k, round(CAST(SUM(tq) AS DOUBLE) / $MfccQ, 6) AS coef
       |FROM terms GROUP BY doc_id, k ORDER BY doc_id, k""".stripMargin
  }

  // ------------------------------------------------------ clip filter

  private val ClipDims = 64
  private val ClipTau = 0.05

  /** CLIP-score-style cross-modal alignment gating — the LAION recipe:
    * each document pairs with its media embedding (doc_id = vec_id),
    * a text-side embedding is produced (here a deterministic
    * hash-derived stub standing in for the text tower, like the mm_*
    * decode stubs), and pairs below a cosine-alignment threshold are
    * flagged for drop. The join is 1:1 on the shared id; the cosine
    * runs on the codegen'd `graft_dot`/`graft_norm_sq` kernels whose
    * sequential sums the oracle reproduces via ordered
    * `list_aggregate` (the ann_* exactness pattern) — no rounding
    * anywhere. Linear, shuffle-only-for-the-join; at 100 TB this is a
    * co-partitioned id join + a map stage.
    */
  def mmClipFilter(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExpressions.register(s)
    val textEmb = transform(sequence(lit(0), lit(ClipDims - 1)), d =>
      (graft.functions.PortableHash.hash64(
        concat(lit("t:"), col("doc_id").cast(StringType), lit(":"), d.cast(StringType)))
        % 2000L).cast(DoubleType) / 1000.0 - 1.0)
    val joined = Tables(s, dir, "documents").select(col("doc_id"))
      .join(Tables(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"),
          col("embedding").cast("array<double>").as("me")), "doc_id")
      .select(col("doc_id"), col("me"), textEmb.as("te"))
    joined.select(col("doc_id"),
        (call_function("graft_dot", col("te"), col("me")) /
          (sqrt(call_function("graft_norm_sq", col("te"))) *
            sqrt(call_function("graft_norm_sq", col("me"))))).as("align"))
      .select(col("doc_id"), col("align"), (col("align") >= ClipTau).as("kept"))
      .orderBy("doc_id")
  }

  private val mmClipFilterSql = {
    import graft.functions.{PortableHash => PH}
    val h = PH.sql("'t:' || CAST(doc_id AS STRING) || ':' || CAST(d AS STRING)")
    val dot = "list_aggregate(list_transform(generate_series(1, len(te)), i -> CAST(list_extract(te, i) AS DOUBLE) * CAST(list_extract(me, i) AS DOUBLE)), 'sum')"
    def norm(a: String) =
      s"sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    s"""WITH p AS (
       |  SELECT d.doc_id, e.embedding AS me FROM documents d
       |  JOIN embeddings e ON e.vec_id = d.doc_id),
       |t AS (
       |  SELECT doc_id, me,
       |    list_transform(range(0, $ClipDims), d ->
       |      CAST($h % 2000 AS DOUBLE) / 1000.0 - 1.0) AS te
       |  FROM p),
       |a AS (SELECT doc_id, $dot / (${norm("te")} * ${norm("me")}) AS align FROM t)
       |SELECT doc_id, align, align >= $ClipTau AS kept
       |FROM a ORDER BY doc_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_keyframes" -> (mmKeyframes(_, _)),
    "mm_exif_quarantine" -> (mmExifQuarantine(_, _)),
    "mm_mfcc" -> (mmMfcc(_, _)),
    "mm_clip_filter" -> (mmClipFilter(_, _)),
    "mm_audio_fingerprint" -> (mmAudioFingerprint(_, _)),
    "mm_audio_vad" -> (mmAudioVad(_, _)),
    "mm_scene_split" -> (mmSceneSplit(_, _)),
    "mm_crop_jitter" -> (mmCropJitter(_, _)),
    "mm_binary_stats" -> (mmBinaryStats(_, _)),
    "mm_decode_features" -> (mmDecodeFeatures(_, _)),
    "mm_modality_route" -> (mmModalityRoute(_, _)),
    "mm_phash_buckets" -> (mmPhashBuckets(_, _)),
    "mm_resize" -> (mmResize(_, _)),
    "mm_patchify" -> (mmPatchify(_, _)))

  /** Even the mapPartitions codec stage gets an exact oracle: the stub
    * features are deterministic arithmetic over the payload bytes, and
    * the corpus is ASCII, so `ord()` sums in DuckDB reproduce the byte
    * sums of the JVM loop exactly.
    */
  private val mmDecodeSql =
    """WITH s AS (SELECT doc_id,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    CAST(list_aggregate(list_transform(regexp_split_to_array(text, ''), c -> ord(c)), 'sum') AS BIGINT) AS checksum
      |  FROM documents)
      |SELECT doc_id, n_bytes, checksum,
      |  CAST(16 + checksum % 16 AS INT) AS width,
      |  CAST(16 + divide(checksum, 16) % 16 AS INT) AS height,
      |  CAST(checksum AS DOUBLE) / greatest(n_bytes, 1) AS mean_intensity
      |FROM s ORDER BY doc_id""".stripMargin

  private val mmPatchifySql =
    """WITH s AS (SELECT doc_id,
      |    CAST(list_aggregate(list_transform(regexp_split_to_array(text, ''), c -> ord(c)), 'sum') AS BIGINT) AS checksum
      |  FROM documents),
      |dims AS (SELECT doc_id,
      |    CAST(16 + checksum % 16 AS INT) AS width,
      |    CAST(16 + divide(checksum, 16) % 16 AS INT) AS height
      |  FROM s)
      |SELECT d.doc_id, r.prow, c.pcol,
      |  CAST(least(8, d.width - c.pcol * 8) AS INT) AS patch_w,
      |  CAST(least(8, d.height - r.prow * 8) AS INT) AS patch_h
      |FROM dims d
      |CROSS JOIN range(0, 4) r(prow)
      |CROSS JOIN range(0, 4) c(pcol)
      |WHERE r.prow <= divide(d.height + 7, 8) - 1
      |  AND c.pcol <= divide(d.width + 7, 8) - 1
      |ORDER BY doc_id, prow, pcol""".stripMargin

  def oracles: Map[String, String] = Map(
    "mm_keyframes" -> mmKeyframesSql,
    "mm_exif_quarantine" -> mmExifQuarantineSql,
    "mm_mfcc" -> mmMfccSql,
    "mm_clip_filter" -> mmClipFilterSql,
    "mm_audio_fingerprint" -> mmAudioFingerprintSql,
    "mm_audio_vad" -> mmAudioVadSql,
    "mm_scene_split" -> mmSceneSplitSql,
    "mm_crop_jitter" -> mmCropJitterSql,
    "mm_binary_stats" -> mmBinaryStatsSql,
    "mm_decode_features" -> mmDecodeSql,
    "mm_modality_route" -> mmModalityRouteSql,
    "mm_phash_buckets" -> mmPhashSql,
    "mm_resize" -> mmResizeSql,
    "mm_patchify" -> mmPatchifySql)
}
