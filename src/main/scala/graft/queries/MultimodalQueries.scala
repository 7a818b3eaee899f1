package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle-checked exercise of the multimodal pipeline
  * ([[graft.functions.Multimodal]]): documents are packed as opaque media
  * payloads, decoded per-partition with the deterministic fake decoder
  * (16-byte frames — the codec boundary is the brief-mandated stub), and
  * feature-extracted. Because the fake decode is `bytes.grouped(16)` and the
  * corpus is ASCII, every output column is independently derivable in SQL —
  * which is exactly what makes the PLUMBING verifiable: schema, batching,
  * per-partition decoder reuse, and frame math all face the DuckDB oracle.
  */
object MultimodalQueries {
  import graft.functions.Multimodal

  def m01MediaFeatures(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.packTextAsMedia(
      Tables.documents(s, d).selectExpr("doc_id", "text"), "text")
    Multimodal.extractFeatures(media, "doc_id", Multimodal.DeterministicFakeDecoder(16))
      .selectExpr("id AS doc_id", "n_bytes",
        "CAST(n_frames AS BIGINT) AS n_frames", "first_frame_md5")
  }

  /** Sampling stride for m02 (every 4th frame — the video-keyframe shape). */
  val SampleEvery = 4

  /** m02: frame SAMPLING through the decode path — every 4th fake-codec
    * frame exploded to its own row (id, frame_idx, bytes), fingerprinted.
    * Verifies the explode/stride plumbing the same way m01 verifies the
    * batch shape: the fake decoder's frames are byte slices, so the oracle
    * re-derives every sampled frame with substring arithmetic. */
  def m02FrameSample(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.packTextAsMedia(
      Tables.documents(s, d).selectExpr("doc_id", "text"), "text")
    Multimodal.sampleFrames(media, "doc_id",
        Multimodal.DeterministicFakeDecoder(16), every = SampleEvery)
      .selectExpr("id AS doc_id", "CAST(frame_idx AS BIGINT) AS frame_idx",
        "md5(frame) AS frame_md5", "CAST(length(frame) AS BIGINT) AS frame_len")
  }

  /** m03 image dimensions / sample count — small enough that the DuckDB
    * oracle can enumerate every pixel and sample, big enough to exercise
    * multi-block audio (8192 PCM bytes = 8 decoder blocks). */
  val M03Width = 16
  val M03Height = 12
  val M03Samples = 4096

  /** m03: REAL codecs end-to-end — for each document a closed-form RGB
    * image is encoded as a real PNG and a closed-form waveform as a real
    * WAV (JDK writers), then decoded back through [[Multimodal.RealDecoder]]
    * (`javax.imageio` / `javax.sound.sampled`) and reduced to integer
    * pixel/PCM statistics. PNG truecolor and WAV PCM are lossless, so the
    * oracle recomputes the same statistics from the closed form — proving
    * the real decode path, not a fake, byte-for-byte. */
  def m03MediaCodec(s: SparkSession, d: String): DataFrame =
    // id stream spread before the codec stage (see m06's note: the
    // single-split test corpus would serialize ImageIO onto one core;
    // the exchange moves only the id column)
    Multimodal.mediaCodecStats(
      Tables.documents(s, d).selectExpr("doc_id")
        .repartition(s.sparkContext.defaultParallelism), "doc_id",
      w = M03Width, h = M03Height, nSamples = M03Samples)

  /** m04: REAL image RESIZE — the multimodal op family's resize step over
    * real codec output (decode closed-form PNG via `javax.imageio`, 2×2
    * integer box-filter downsample, integer channel stats + an md5 over
    * every resized byte). The oracle recomputes each output pixel's
    * floor-average from the closed form, so the resize kernel is verified
    * pixel-exactly. Narrow end-to-end: one mapPartitions, zero shuffles. */
  def m04ImageResize(s: SparkSession, d: String): DataFrame =
    Multimodal.resizedImageStats(
      Tables.documents(s, d).selectExpr("doc_id")
        .repartition(s.sparkContext.defaultParallelism), "doc_id",
      w = M03Width, h = M03Height)

  /** m05: audio FEATURE EXTRACTION through the real codec — per decoder
    * block (512 samples), integer energy and zero-crossing counts from
    * `javax.sound.sampled` output, one row per frame. The oracle
    * recomputes every feature from the closed-form waveform (the WAV is
    * lossless PCM), so the whole decode → frame → feature path is
    * verified per frame, not just in aggregate. */
  def m05AudioFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.audioFrameFeatures(
      Tables.documents(s, d).selectExpr("doc_id")
        .repartition(s.sparkContext.defaultParallelism), "doc_id",
      nSamples = M03Samples)

  /** m06 frame-sequence dimensions + SAD cut threshold. Within-scene SAD
    * is ≈ W·H·(1+2+3) + modular-wrap noise (≲ ~1500); a scene jump moves
    * every channel by its scene coefficient (≈ 98+133+56 per pixel ≈
    * 27000 total) — 8000 sits an order of magnitude inside both margins,
    * and correctness never depends on the margin: engine and oracle apply
    * the identical rule to identical integers. */
  val M06Frames = 12
  val M06Width = 12
  val M06Height = 8
  val M06CutThreshold = 8000L

  /** m06: SCENE-CUT / KEYFRAME detection through the real codec — per
    * document a 12-frame closed-form sequence (scene jumps on a
    * deterministic schedule + small per-frame motion) is PNG-encoded,
    * decoded back via `javax.imageio`, and segmented by the classic SAD
    * shot-cut statistic over DECODED bytes only. The oracle re-derives
    * every pixel, SAD and cut from the closed form in SQL.
    *
    * The id stream is repartitioned BEFORE the codec stage: the test
    * corpus is one parquet file = one input split, which would serialize
    * 12 ImageIO round trips × every doc onto one core (measured 8 s at
    * sf0.1 → 0.6 s spread). The exchange moves ONLY the 8-byte id column;
    * the decode/detect kernel itself stays narrow — on a real media table
    * (many files/splits) even this id shuffle disappears. */
  def m06SceneCuts(s: SparkSession, d: String): DataFrame =
    Multimodal.sceneCutStats(
      Tables.documents(s, d).selectExpr("doc_id")
        .repartition(s.sparkContext.defaultParallelism), "doc_id",
      frames = M06Frames, w = M06Width, h = M06Height,
      threshold = M06CutThreshold)

  /** m07's Hamming radius over the 42-bit dHash. Bands 11+11+10+10 bits:
    * four DISJOINT blocks are a complete pigeonhole cover for ≤ 3 flips. */
  val PhashHammingMax = 3

  /** m07: IMAGE near-duplicate detection by perceptual hash — the
    * multimodal leg of the dedup family: dHash fingerprints from the REAL
    * decode path ([[Multimodal.imagePhash]]: PNG → box-resize → luminance
    * gradient signs), then d09's banded-Hamming machinery over DISTINCT
    * SIGNATURES ONLY (r7): collapse to (phash, count, min doc) FIRST,
    * band-join the distinct hashes (first-shared-band emission, verified
    * by codegen'd `bit_count`), and recover every per-image answer
    * arithmetically — n_near = (own-hash count − 1) + Σ near-hash counts,
    * rep = least(doc_id, own-hash min, near-hash min).
    *
    * Why distinct-first is the 100 TB shape (measured, r7 100× probe):
    * re-encode-heavy image stores saturate the signature space — the
    * 100× replica carries 500k images over only 220 distinct phashes, so
    * per-PAIR enumeration is Θ(n²/D) ≈ 3×10⁹ rows (it filled the
    * sandbox disk); the distinct form's join is Θ(D·candidates) with the
    * same exact output, and per-image work is one narrow groupBy + one
    * co-keyed join. With no saturation (D ≈ n) it degrades gracefully to
    * exactly the old cost minus the exact-duplicate pairs. Pixels are
    * still read exactly once. */
  def m07PhashNearDup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val sig = Multimodal.imagePhash(
        Tables.documents(s, d).selectExpr("doc_id")
          .repartition(s.sparkContext.defaultParallelism), "doc_id",
        w = M03Width, h = M03Height)
      .localCheckpoint(true)
    val groups = sig.groupBy("phash")
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("gmin"))
    val bands = groups.selectExpr("phash", "cnt", "gmin",
      """stack(4, 0L, phash & 2047,
        |         1L, shiftright(phash, 11) & 2047,
        |         2L, shiftright(phash, 22) & 1023,
        |         3L, shiftright(phash, 32) & 1023) AS (band, bkey)""".stripMargin)
    val a = bands.toDF("pha", "cnta", "mina", "band", "bkey")
    val b = bands.toDF("phb", "cntb", "minb", "band", "bkey")
    // unordered distinct-hash pairs, emitted from their FIRST shared band
    val pairs = a.join(b, Seq("band", "bkey"))
      .filter(col("pha") < col("phb"))
      .filter(expr(
        """(band < 1 OR (pha & 2047)                  != (phb & 2047)) AND
          |(band < 2 OR (shiftright(pha, 11) & 2047)  != (shiftright(phb, 11) & 2047)) AND
          |(band < 3 OR (shiftright(pha, 22) & 1023)  != (shiftright(phb, 22) & 1023))""".stripMargin))
      .filter(expr(s"bit_count(pha ^ phb) <= $PhashHammingMax"))
    // per distinct hash: total neighbor population + smallest neighbor doc
    val nbr = pairs.selectExpr("pha AS phash", "cntb AS ncnt", "minb AS nmin")
      .union(pairs.selectExpr("phb AS phash", "cnta AS ncnt", "mina AS nmin"))
      .groupBy("phash")
      .agg(sum(col("ncnt")).as("nbr_cnt"), min(col("nmin")).as("nbr_min"))
    sig.join(groups, Seq("phash"))
      .join(nbr, Seq("phash"), "left")
      .selectExpr("doc_id", "phash",
        "cnt - 1 + coalesce(nbr_cnt, 0L) AS n_near",
        // min over partners ∪ self: own-group min covers same-hash
        // partners (gmin == doc_id exactly when no smaller same-hash doc)
        "least(doc_id, gmin, coalesce(nbr_min, doc_id)) AS rep")
  }

  /** m08: corrupt-media QUARANTINE — the ingest-robustness pass: a
    * deterministic subset of payloads is injected with guaranteed-
    * undecodable corruption (truncation / zapped signature), and the
    * kernel must quarantine them as verdict rows instead of failing the
    * task, while healthy rows still produce exact pixel statistics.
    * Oracle: ok ⇔ doc_id % 7 ≠ 3; healthy stats from the m03 closed
    * form. See [[graft.functions.Multimodal.corruptMediaAudit]]. */
  def m08CorruptQuarantine(s: SparkSession, d: String): DataFrame =
    Multimodal.corruptMediaAudit(
      Tables.documents(s, d).selectExpr("doc_id")
        .repartition(s.sparkContext.defaultParallelism), "doc_id",
      w = M03Width, h = M03Height)

  /** m09: mean-square VAD threshold — active ⇔ frame energy ≥ Thr·n.
    * Samples are ~uniform(−2000, 2000) (mean square ≈ 1.33·10⁶), so the
    * threshold sits AT the bulk and splits frames ~44/56 — segmentation
    * has real structure instead of all-active audio. */
  val M09VadThreshold = 1330000L

  /** m09: VOICE-ACTIVITY DETECTION — the speech-data curation primitive
    * (keep utterances, cut silence/noise; decides what fraction of an
    * audio corpus is trainable): frames from the REAL WAV round-trip
    * ([[Multimodal.audioFrameFeatures]], the m05 kernel) are flagged
    * active by the integer mean-square rule energy ≥ [[M09VadThreshold]]·n
    * (no division), and maximal active RUNS become segments via the
    * gaps-and-islands identity (frame_idx − row_number over active frames
    * is constant within a run). Per document: frames, active count,
    * segment count, longest segment, first/last active frame (−1 when
    * silent). The oracle re-derives every sample from the closed form and
    * applies the identical rule — agreement proves codec round-trip,
    * framing, thresholding and segmentation together.
    *
    * Scale shape: decode is the m05 mapPartitions kernel (per-task SPI,
    * id-column repartition for split parallelism, zero data shuffle); the
    * islands windows partition by doc_id over ≤ 8 frame rows each, then
    * one partial-agged groupBy lands the per-doc report. */
  def m09VoiceActivity(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val frames = Multimodal.audioFrameFeatures(
      Tables.documents(s, d).selectExpr("doc_id")
        .repartition(s.sparkContext.defaultParallelism), "doc_id",
      nSamples = M03Samples)
    // the codec pass is the whole cost: pin its (small, frame-level)
    // output once so the report's two aggregate branches never re-decode
    val act = frames
      .withColumn("active", col("energy") >= col("n_samples") * lit(M09VadThreshold))
      .localCheckpoint(true)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val perDoc = act.filter(col("active"))
      .withColumn("isl", col("frame_idx") - row_number().over(w))
      .groupBy("doc_id", "isl").agg(
        count(lit(1)).as("seg_len"),
        min("frame_idx").as("f0"), max("frame_idx").as("f1"))
      .groupBy("doc_id").agg(
        sum("seg_len").as("n_active"),
        count(lit(1)).as("n_segments"),
        max("seg_len").as("longest_segment"),
        min("f0").as("first_active"),
        max("f1").as("last_active"))
    act.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
      .join(perDoc, Seq("doc_id"), "left")
      .selectExpr("doc_id", "n_frames",
        "coalesce(n_active, CAST(0 AS BIGINT)) AS n_active",
        "coalesce(n_segments, CAST(0 AS BIGINT)) AS n_segments",
        "coalesce(longest_segment, CAST(0 AS BIGINT)) AS longest_segment",
        "coalesce(first_active, CAST(-1 AS BIGINT)) AS first_active",
        "coalesce(last_active, CAST(-1 AS BIGINT)) AS last_active")
  }
}
