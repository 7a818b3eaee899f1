package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `BINARY` columns
  * with typed metadata, and the batch-shaped decode / feature-extract /
  * frame-sample operators a training-data pipeline runs over them.
  *
  * The Spark-side plumbing is real — schema, partition-sized batching,
  * per-partition decoder reuse, exploded frame output. The actual codec
  * call is stubbed behind [[MediaDecoder]] (no image/audio libraries exist
  * in this container); [[DeterministicFakeDecoder]] stands in so the
  * pipeline is testable end-to-end.
  *
  * Scale notes: decode is the canonical CPU-heavy narrow stage — it must run
  * `mapPartitions` (decoder instantiated once per task, not per row) and
  * never widen: a 100 TB media table decodes embarrassingly parallel with
  * zero shuffle; only the (small) feature rows move afterwards.
  */
object Multimodal {

  /** ImageIO's default stream cache backs every encode/decode with a TEMP
    * FILE on disk — at 60k codec calls per bench pass that is 60k file
    * create/write/delete cycles of pure overhead. Heap-backed streams are
    * strictly better for the small frames this engine handles; referenced
    * (once per JVM) from every codec entry point. */
  private lazy val imageIoNoDiskCache: Boolean = {
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

  /** Typed media column: payload + envelope metadata. */
  val mediaType: StructType = StructType(Seq(
    StructField("bytes", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** What a decoder yields per media payload: fixed-shape frame batches. */
  final case class DecodedFrames(nFrames: Int, frameBytes: Array[Array[Byte]])

  /** The codec boundary. [[RealDecoder]] binds the JDK's built-in codecs;
    * tests may inject [[DeterministicFakeDecoder]] for byte-predictable
    * frames. */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte], mime: String): DecodedFrames
  }

  /** Real codec integration: dispatches on the envelope mime to the JDK's
    * built-in decoders — `javax.imageio` for images (PNG/JPEG/GIF/BMP ship
    * in every JDK), `javax.sound.sampled` for audio (WAV/PCM). No external
    * libraries. */
  object RealDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte], mime: String): DecodedFrames =
      if (mime.startsWith("image/")) JdkImageDecoder.decode(bytes, mime)
      else if (mime.startsWith("audio/")) JdkAudioDecoder.decode(bytes, mime)
      else throw new IllegalArgumentException(
        s"unsupported media mime '$mime' (supported: image/* via javax.imageio, audio/* via javax.sound.sampled)")
  }

  /** `javax.imageio` decoder: one frame per scanline, each `width*3` bytes
    * of row-major RGB — a deterministic layout regardless of the source
    * format's color model (palette GIF, BGR BMP, RGBA PNG all normalize
    * through `getRGB`). Width recovers as `frame.length/3`, height as
    * `nFrames`. */
  object JdkImageDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte], mime: String): DecodedFrames = {
      imageIoNoDiskCache
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"javax.imageio cannot decode this payload (mime '$mime')")
      val w = img.getWidth
      val h = img.getHeight
      val rows = new Array[Array[Byte]](h)
      var y = 0
      while (y < h) {
        val row = new Array[Byte](w * 3)
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          row(x * 3) = ((p >> 16) & 0xFF).toByte
          row(x * 3 + 1) = ((p >> 8) & 0xFF).toByte
          row(x * 3 + 2) = (p & 0xFF).toByte
          x += 1
        }
        rows(y) = row
        y += 1
      }
      DecodedFrames(h, rows)
    }
  }

  /** `javax.sound.sampled` decoder: container-parsed PCM sliced into
    * fixed 1024-byte blocks (512 samples at 16-bit mono), last block
    * partial — the batch shape feature extraction wants. */
  object JdkAudioDecoder extends MediaDecoder {
    val BlockBytes = 1024
    def decode(bytes: Array[Byte], mime: String): DecodedFrames = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val pcm = in.readAllBytes()
        val blocks = pcm.grouped(BlockBytes).toArray
        DecodedFrames(blocks.length, blocks)
      } finally in.close()
    }
  }

  /** Deterministic stand-in: frames are consecutive `frameSize`-byte slices
    * — keeps every downstream operator (batching, explode, feature extract)
    * real and byte-reproducible. */
  final case class DeterministicFakeDecoder(frameSize: Int = 16) extends MediaDecoder {
    def decode(bytes: Array[Byte], mime: String): DecodedFrames = {
      val frames = bytes.grouped(frameSize).toArray
      DecodedFrames(frames.length, frames)
    }
  }

  /** Pack a text column as a fake media column (test/bench fixture): the
    * UTF-8 bytes become the payload with synthetic envelope metadata. */
  def packTextAsMedia(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", struct(
      col(textCol).cast("binary").as("bytes"),
      lit("application/x-graft-fake").as("mime"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      (length(col(textCol)) * 10L).as("duration_ms")))

  /** Decode + feature-extract: per-partition decoder reuse, one output row
    * per media row with frame stats and per-frame fingerprints. Typed
    * Dataset path — the encoder is codegen'd, vs createDataFrame(rdd)'s
    * per-row runtime Row conversion. */
  def extractFeatures(df: DataFrame, idCol: String, decoder: MediaDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media.bytes"), col("media.mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        val d = decoder // one decoder per task
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
        rows.map { case (id, bytes, mime) =>
          val decoded = d.decode(bytes, mime)
          val md5s = decoded.frameBytes.map(f => hex(md.digest(f)))
          (id, bytes.length.toLong, decoded.nFrames, md5s.headOption.orNull, md5s.toSeq)
        }
      }
      .toDF("id", "n_bytes", "n_frames", "first_frame_md5", "frame_md5s")
  }

  /** Frame resize over a frames table (`id, frame_idx, frame`): fixed
    * output dimension per frame. STUB semantics for the fake decoder —
    * truncate / zero-pad to `dim` bytes where a real implementation would
    * invoke the codec's scaler; the Spark shape (narrow mapPartitions, no
    * shuffle, binary in → binary out) is the real thing. */
  def resizeFrames(df: DataFrame, dim: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rdd = df.select(col("id"), col("frame_idx"), col("frame")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val f = r.getAs[Array[Byte]](2)
          Row(r.getLong(0), r.getInt(1), java.util.Arrays.copyOf(f, dim))
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic RGB test image for `id` — pixel (x,y) has
    * r=(id*7+x*3+y*5)%256, g=(id*11+x*13+y)%256, b=(x*y+id)%256 — encoded
    * as a REAL PNG via the JDK writer. PNG truecolor is lossless, so the
    * decoded channel sums equal the closed form the oracle computes. */
  private[graft] def m03Image(id: Long, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 7 + x * 3 + y * 5) % 256).toInt
        val g = ((id * 11 + x * 13 + y) % 256).toInt
        val b = ((x.toLong * y + id) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  private[graft] def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
    imageIoNoDiskCache
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(m03Image(id, w, h), "png", bos)
    bos.toByteArray
  }

  /** Deterministic 16-bit mono PCM for `id` — sample t is
    * ((id*31+t*17)%4001)-2000 — in a REAL WAV container via the JDK
    * writer. PCM is verbatim in WAV, so decoded sample sums equal the
    * closed form. */
  private[graft] def encodeWav(id: Long, n: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcmFor(id, n)), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** m03's engine side: build the closed-form PNG + WAV payload per id,
    * push the REAL bytes through the JDK codecs (per-task-bound SPI
    * instances — same plugins the [[RealDecoder]] facade dispatches to,
    * byte-compatible, spec-asserted; the facade's per-call provider
    * lookup serializes across cores), and emit integer statistics of the
    * decoded pixels/samples. All narrow — one mapPartitions, zero
    * shuffles; at 100 TB this is the same embarrassingly-parallel shape
    * as [[extractFeatures]]. */
  def mediaCodecStats(ids: DataFrame, idCol: String,
                      w: Int = 16, h: Int = 12, nSamples: Int = 4096): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        val png = new PngRoundTrip
        val wav = new WavRoundTrip
        val out = it.map { id =>
          val rows = png.decodeRows(png.encode(m03Image(id, w, h)))
          val width = rows.headOption.map(_.length / 3).getOrElse(0)
          var rSum = 0L; var gSum = 0L; var bSum = 0L
          rows.foreach { row =>
            var i = 0
            while (i < row.length) {
              rSum += row(i) & 0xFF; gSum += row(i + 1) & 0xFF; bSum += row(i + 2) & 0xFF
              i += 3
            }
          }
          val pcm = wav.decodePcm(wav.encode(pcmFor(id, nSamples), nSamples))
          var n = 0L; var sSum = 0L; var sAbs = 0L
          pcm.grouped(JdkAudioDecoder.BlockBytes).foreach { block =>
            var i = 0
            while (i + 1 < block.length) {
              // little-endian int16: the signed high byte shifts with sign extension
              val s = (block(i) & 0xFF) | (block(i + 1).toInt << 8)
              n += 1; sSum += s; sAbs += math.abs(s)
              i += 2
            }
          }
          (id, width.toLong, rows.length.toLong, rSum, gSum, bSum, n, sSum, sAbs)
        }
        closeOnDrain(out)(png.close())
      }
      .toDF("doc_id", "img_w", "img_h", "r_sum", "g_sum", "b_sum", "pcm_n", "pcm_sum", "pcm_abs")
  }

  /** m08 kernel: corrupt-media QUARANTINE audit — the robustness pass a
    * real ingest pipeline runs before any other media op: media payloads
    * at scale always contain undecodable bytes (truncated uploads, wrong
    * extensions, bit rot), and a decode kernel that lets one bad file
    * kill the task loses the whole partition. Per row: attempt the real
    * `javax.imageio` decode; success → verdict row with integer pixel
    * stats, ANY decode failure → a quarantine verdict (`ok = 0`,
    * zeroed stats) instead of a task failure. NonFatal-only catch: OOM
    * and interrupts still propagate (a quarantine pass must not eat
    * executor-death signals).
    *
    * Corruption is INJECTED deterministically from the id (the media
    * bytes here are generated, not stored): id ≡ 3 (mod 14) → payload
    * truncated to the 8-byte PNG signature; id ≡ 10 (mod 14) → signature
    * zeroed. Both are guaranteed-undecodable states (no IHDR / not a
    * PNG), so the oracle predicts every verdict in closed form:
    * ok ⇔ id % 7 ≠ 3. Scale shape: one mapPartitions, per-task codec
    * instance, zero shuffle — identical to m03. */
  def corruptMediaAudit(ids: DataFrame, idCol: String,
                        w: Int = 16, h: Int = 12): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        val png = new PngRoundTrip
        val out = it.map { id =>
          val good = png.encode(m03Image(id, w, h))
          val bytes =
            if (id % 14 == 3) java.util.Arrays.copyOf(good, math.min(good.length, 8))
            else if (id % 14 == 10) {
              val b = good.clone(); var i = 0; while (i < 8) { b(i) = 0; i += 1 }; b
            } else good
          try {
            val rows = png.decodeRows(bytes)
            val width = rows.headOption.map(_.length / 3).getOrElse(0)
            var rSum = 0L
            rows.foreach { row =>
              var i = 0
              while (i < row.length) { rSum += row(i) & 0xFF; i += 3 }
            }
            (id, 1L, "", width.toLong, rows.length.toLong, rSum)
          } catch {
            case scala.util.control.NonFatal(_) =>
              (id, 0L, "undecodable", 0L, 0L, 0L)
          }
        }
        closeOnDrain(out)(png.close())
      }
      .toDF("doc_id", "ok", "issue", "img_w", "img_h", "r_sum")
  }

  /** Run `cleanup` when the TASK completes (mapPartitions resource
    * idiom): the completion listener fires on success, early termination
    * (limit/take stops pulling the iterator) AND failure — a drain-only
    * hook would leak the per-task codec in the first two cases. Outside a
    * task (direct kernel tests) it falls back to cleanup-on-drain;
    * `cleanup` must be idempotent (both paths can fire). */
  private def closeOnDrain[A](it: Iterator[A])(cleanup: => Unit): Iterator[A] = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => cleanup)
    new Iterator[A] {
      def hasNext: Boolean = { val h = it.hasNext; if (!h) cleanup; h }
      def next(): A = it.next()
    }
  }

  /** 2×2 integer box-filter downsample of a decoded RGB image (scanline
    * frames of `width*3` bytes, [[JdkImageDecoder]]'s layout): each output
    * channel is the floor-average of the four covered input pixels. Integer
    * arithmetic end-to-end, so the result is bit-reproducible and
    * oracle-checkable — the real-codec counterpart of the fake-frame
    * [[resizeFrames]] stub. Odd trailing row/column is dropped (standard
    * pyramid-downsample convention). */
  private[graft] def boxDownsample2x(rows: Array[Array[Byte]]): Array[Array[Byte]] = {
    val h = rows.length
    val w = if (h == 0) 0 else rows(0).length / 3
    val oh = h / 2
    val ow = w / 2
    val out = new Array[Array[Byte]](oh)
    var y = 0
    while (y < oh) {
      val r0 = rows(2 * y)
      val r1 = rows(2 * y + 1)
      val o = new Array[Byte](ow * 3)
      var x = 0
      while (x < ow) {
        var c = 0
        while (c < 3) {
          val s = (r0(6 * x + c) & 0xFF) + (r0(6 * x + 3 + c) & 0xFF) +
            (r1(6 * x + c) & 0xFF) + (r1(6 * x + 3 + c) & 0xFF)
          o(3 * x + c) = (s / 4).toByte
          c += 1
        }
        x += 1
      }
      out(y) = o
      y += 1
    }
    out
  }

  /** m04's engine side: the REAL resize step of the multimodal family —
    * closed-form PNG per id, decoded through [[RealDecoder]] (`javax.imageio`),
    * then [[boxDownsample2x]] box-filtered to half resolution, reduced to
    * integer channel sums plus an md5 fingerprint over EVERY resized byte
    * (comma-joined unsigned values in (y, x, channel) order) so the oracle
    * verifies each output pixel exactly, not just in aggregate. Same
    * embarrassingly-parallel shape as [[mediaCodecStats]]: one
    * mapPartitions, zero shuffles at any corpus size. */
  def resizedImageStats(ids: DataFrame, idCol: String,
                        w: Int = 16, h: Int = 12): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        val png = new PngRoundTrip
        val out = it.map { id =>
          val rz = boxDownsample2x(png.decodeRows(png.encode(m03Image(id, w, h))))
          val oh = rz.length
          val ow = if (oh == 0) 0 else rz(0).length / 3
          var rSum = 0L; var gSum = 0L; var bSum = 0L
          rz.foreach { row =>
            var i = 0
            while (i < row.length) {
              rSum += row(i) & 0xFF; gSum += row(i + 1) & 0xFF; bSum += row(i + 2) & 0xFF
              i += 3
            }
          }
          val joined = rz.iterator.flatMap(_.iterator.map(b => (b & 0xFF).toString)).mkString(",")
          val md = java.security.MessageDigest.getInstance("MD5")
          val fp = md.digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (id, ow.toLong, oh.toLong, rSum, gSum, bSum, fp)
        }
        closeOnDrain(out)(png.close())
      }
      .toDF("doc_id", "out_w", "out_h", "r2_sum", "g2_sum", "b2_sum", "px_fp")
  }

  /** m05's engine side: audio FEATURE EXTRACTION over real WAV decode —
    * closed-form waveform per id through [[RealDecoder]]
    * (`javax.sound.sampled`), then per decoder block (1024 bytes = 512
    * 16-bit samples): sample count, integer energy (sum of squares) and
    * zero-crossing count (strict sign changes between consecutive samples
    * WITHIN the block) — the MFCC-pipeline front half in integer-exact
    * form, exploded one row per frame. Embarrassingly parallel: one
    * mapPartitions, zero shuffles at any corpus size. */
  def audioFrameFeatures(ids: DataFrame, idCol: String,
                         nSamples: Int = 4096): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        val wav = new WavRoundTrip // per-task-bound SPI (see its Scaladoc)
        it.flatMap { id =>
          val pcm = wav.decodePcm(wav.encode(pcmFor(id, nSamples), nSamples))
          pcm.grouped(JdkAudioDecoder.BlockBytes).zipWithIndex.map { case (block, fi) =>
            var i = 0; var n = 0L; var energy = 0L; var zc = 0L
            var prev = 0
            while (i + 1 < block.length) {
              val sVal = (block(i) & 0xFF) | (block(i + 1).toInt << 8)
              energy += sVal.toLong * sVal
              if (n > 0 && ((prev < 0 && sVal > 0) || (prev > 0 && sVal < 0))) zc += 1
              prev = sVal; n += 1; i += 2
            }
            (id, fi.toLong, n, energy, zc)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "n_samples", "energy", "zero_crossings")
  }

  /** Reusable PNG round-trip codec for frame-sequence workloads: one
    * `ImageWriter`/`ImageReader` pair per instance (one per TASK) instead
    * of `ImageIO.write/read`'s per-call service-provider lookup — the
    * per-frame fixed overhead dominates at 12 frames × every video (the
    * bench measured the lookup+dispose cycle at roughly half of m06's
    * runtime). NOT thread-safe; create per partition, `close()` when the
    * iterator drains. Byte-compatible with the one-shot
    * [[JdkImageDecoder]]/`ImageIO.write` path (same codec plugins
    * underneath) — asserted in MultimodalSpec. */
  private[graft] final class PngRoundTrip {
    imageIoNoDiskCache
    private val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    private val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(img)
      ios.close()
      bos.toByteArray
    }
    /** Decode to [[JdkImageDecoder]]'s scanline-frame layout. */
    def decodeRows(bytes: Array[Byte]): Array[Array[Byte]] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
      reader.setInput(iis)
      val img = reader.read(0)
      iis.close()
      val w = img.getWidth
      val h = img.getHeight
      val rows = new Array[Array[Byte]](h)
      var y = 0
      while (y < h) {
        val row = new Array[Byte](w * 3)
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          row(x * 3) = ((p >> 16) & 0xFF).toByte
          row(x * 3 + 1) = ((p >> 8) & 0xFF).toByte
          row(x * 3 + 2) = (p & 0xFF).toByte
          x += 1
        }
        rows(y) = row
        y += 1
      }
      rows
    }
    private var closed = false
    def close(): Unit = if (!closed) { closed = true; writer.dispose(); reader.dispose() }
  }

  /** Reusable WAV round-trip codec: binds the JDK's OWN WAV SPI
    * implementations (`javax.sound.sampled.spi.AudioFileReader/Writer`,
    * resolved via ServiceLoader — the same `WaveFileReader/Writer` the
    * `AudioSystem` facade dispatches to) ONCE per instance. The facade's
    * per-call provider lookup is effectively SERIALIZED process-wide
    * (measured: 4k encode+decode ops take the same wall time at 32
    * threads as at 1); the SPI-bound path runs the identical codec at
    * ~31 µs/op single-threaded and scales linearly with cores. NOT
    * thread-safe; create per partition. Byte-compatible with the facade
    * path — asserted in MultimodalSpec. */
  private[graft] final class WavRoundTrip {
    private val writer = {
      val it = java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
      var found: javax.sound.sampled.spi.AudioFileWriter = null
      while (found == null && it.hasNext) {
        val w = it.next()
        if (w.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE)) found = w
      }
      require(found != null, "no WAV AudioFileWriter SPI in this JDK")
      found
    }
    private var reader: javax.sound.sampled.spi.AudioFileReader = null
    /** 16-bit mono little-endian PCM at 8 kHz → a real WAV container. */
    def encode(pcm: Array[Byte], nSamples: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    /** WAV container → raw PCM payload (the reader SPI is resolved on the
      * first decode by probing, exactly how the facade picks it). */
    def decodePcm(bytes: Array[Byte]): Array[Byte] = {
      if (reader == null) {
        val it = java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
        while (reader == null && it.hasNext) {
          val r = it.next()
          try {
            r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)).close()
            reader = r
          } catch { case _: Exception => }
        }
        require(reader != null, "no AudioFileReader SPI accepts this payload")
      }
      val in = reader.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try in.readAllBytes() finally in.close()
    }
  }

  /** The closed-form 16-bit PCM for `id` — sample t is
    * ((id*31+t*17)%4001)-2000, little-endian. */
  private[graft] def pcmFor(id: Long, n: Int): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s = (((id * 31 + t.toLong * 17) % 4001) - 2000).toInt
      pcm(t * 2) = (s & 0xFF).toByte
      pcm(t * 2 + 1) = ((s >> 8) & 0xFF).toByte
      t += 1
    }
    pcm
  }

  /** The scene-frame pixel raster for (`id`, frame `f`, scene `s`) — see
    * [[encodeScenePng]] for the closed form. */
  private[graft] def sceneFrameImage(id: Long, f: Int, s: Int, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 7 + s * 97L + x * 3 + y * 5 + f) % 256).toInt
        val g = ((id * 11 + s * 131L + x * 13 + y + 2L * f) % 256).toInt
        val b = ((x.toLong * y + id + s * 53L + 3L * f) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Deterministic "video" frame for (`id`, frame `f`, scene `s`): pixel
    * (x,y) has r=(id*7+s*97+x*3+y*5+f)%256, g=(id*11+s*131+x*13+y+2f)%256,
    * b=(x*y+id+s*53+3f)%256 — the scene term jumps the whole image at a
    * scene boundary while the f terms supply small within-scene "motion";
    * encoded as a REAL PNG (lossless truecolor) via the JDK writer. */
  private[graft] def encodeScenePng(id: Long, f: Int, s: Int, w: Int, h: Int): Array[Byte] = {
    imageIoNoDiskCache
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(sceneFrameImage(id, f, s, w, h), "png", bos)
    bos.toByteArray
  }

  /** m06's engine side: SCENE-CUT / KEYFRAME detection over a decoded
    * frame sequence — the video-curation primitive (shot segmentation,
    * keyframe selection for captioning/embedding). Per id: `frames`
    * closed-form frames flow through REAL PNG encode → [[RealDecoder]]
    * decode (`javax.imageio`), and consecutive decoded frames are compared
    * by SAD (sum of absolute channel differences — the classic shot-cut
    * statistic); a frame whose SAD against its predecessor exceeds
    * `threshold` starts a new scene. Scene boundaries in the SYNTHESIZED
    * stream come from the closed-form schedule (f>0 ∧ (id·13+f·29)%7=0),
    * so the oracle can re-derive every pixel, every SAD and every cut —
    * but the DETECTOR sees only decoded bytes, exactly as it would on real
    * video.
    *
    * Scale shape: one mapPartitions, zero shuffles — each id's frame
    * window is processed locally with two frames resident (prev, cur), so
    * a 100 TB frame store splits by video and never widens; only the
    * per-video summary rows move. */
  def sceneCutStats(ids: DataFrame, idCol: String,
                    frames: Int = 12, w: Int = 12, h: Int = 8,
                    threshold: Long = 8000L): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        // one writer/reader pair per TASK (the per-call ImageIO service
        // lookup was ~half of this operator's runtime); byte-compatible
        // with the one-shot path, spec-asserted
        val codec = new PngRoundTrip
        val out = it.map { id =>
          var s = 0
          var prev: Array[Array[Byte]] = null
          var sadTotal = 0L
          val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
          var f = 0
          while (f < frames) {
            if (f > 0 && (id * 13 + f * 29L) % 7 == 0) s += 1
            val rows = codec.decodeRows(codec.encode(sceneFrameImage(id, f, s, w, h)))
            if (f > 0) {
              var sad = 0L
              var y = 0
              while (y < rows.length) {
                val cur = rows(y)
                val prv = prev(y)
                var i = 0
                while (i < cur.length) {
                  sad += math.abs((cur(i) & 0xFF) - (prv(i) & 0xFF))
                  i += 1
                }
                y += 1
              }
              sadTotal += sad
              if (sad > threshold) cuts += f
            }
            prev = rows
            f += 1
          }
          val fp = md.digest(cuts.mkString(",").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          (id, frames.toLong, cuts.length.toLong, fp, sadTotal)
        }
        closeOnDrain(out)(codec.close())
      }
      .toDF("doc_id", "n_frames", "n_cuts", "cuts_md5", "sad_total")
  }

  /** m07's engine side: the dHash PERCEPTUAL fingerprint over the real
    * decode path — decode the closed-form PNG (`javax.imageio` via the
    * per-task [[PngRoundTrip]]), 2×2 box-downsample ([[boxDownsample2x]],
    * m04's verified kernel), then the difference hash: cell luminance =
    * r+g+b, bit (X,Y) = gray(X,Y) > gray(X+1,Y), bit index Y·(ow−1)+X —
    * a (w/2−1)·(h/2) = 42-bit signature at the default geometry. dHash is
    * THE standard cheap image near-dup fingerprint (gradient signs
    * survive re-encode/resize/brightness shifts); downstream it plugs
    * into exactly the d09 banded-Hamming join. One narrow mapPartitions,
    * zero shuffles. */
  def imagePhash(ids: DataFrame, idCol: String, w: Int = 16, h: Int = 12): DataFrame = {
    // the signature is ONE Long; a larger geometry would silently wrap
    // bit indices mod 64 (Java shift semantics) and fold distinct
    // gradient bits together — fail loudly instead (m07's band masks are
    // likewise fixed to the 42-bit default)
    require((w / 2 - 1) * (h / 2) <= 64,
      s"dHash geometry (${w / 2 - 1}×${h / 2}) exceeds the 64-bit signature")
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        val png = new PngRoundTrip
        val out = it.map { id =>
          val rz = boxDownsample2x(png.decodeRows(png.encode(m03Image(id, w, h))))
          val oh = rz.length
          val ow = if (oh == 0) 0 else rz(0).length / 3
          def gray(x: Int, y: Int): Int = {
            val r = rz(y)
            (r(3 * x) & 0xFF) + (r(3 * x + 1) & 0xFF) + (r(3 * x + 2) & 0xFF)
          }
          var hash = 0L
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow - 1) {
              if (gray(x, y) > gray(x + 1, y))
                hash |= 1L << (y * (ow - 1) + x)
              x += 1
            }
            y += 1
          }
          (id, hash)
        }
        closeOnDrain(out)(png.close())
      }
      .toDF("doc_id", "phash")
  }

  /** Frame sampling: keep every `every`-th frame, exploded to one row per
    * sampled frame — the shape of video-frame extraction at scale. */
  def sampleFrames(df: DataFrame, idCol: String, decoder: MediaDecoder, every: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rdd = df.select(col(idCol).cast("long"), col("media.bytes"), col("media.mime")).rdd
      .mapPartitions { rows =>
        val d = decoder
        rows.flatMap { r =>
          val decoded = d.decode(r.getAs[Array[Byte]](1), r.getString(2))
          decoded.frameBytes.iterator.zipWithIndex
            .filter(_._2 % every == 0)
            .map { case (f, i) => Row(r.getLong(0), i, f) }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }
}
