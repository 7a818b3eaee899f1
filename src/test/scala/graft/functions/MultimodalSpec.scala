package graft.functions

import org.apache.spark.sql.functions._
import graft.testkit.SparkSpec

class MultimodalSpec extends SparkSpec {
  import Multimodal._

  private def mediaDF = {
    import spark.implicits._
    packTextAsMedia(
      Seq((1L, "hello world, this is a fake media payload"),
          (2L, "short"),
          (3L, "x" * 100)).toDF("id", "text"), "text")
  }

  test("media struct schema carries payload + typed metadata") {
    val df = mediaDF
    assert(df.schema("media").dataType == mediaType)
    val r = df.filter(col("id") === 2).select("media.bytes", "media.duration_ms").head()
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") == "short")
    assert(r.getLong(1) == 50L)
  }

  test("extractFeatures: per-row frame stats with deterministic decoder") {
    val feats = extractFeatures(mediaDF, "id", DeterministicFakeDecoder(16)).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(feats(2L).getAs[Int]("n_frames") == 1)
    assert(feats(3L).getAs[Int]("n_frames") == 7) // 100 bytes / 16 -> 7 frames
    assert(feats(1L).getAs[scala.collection.Seq[String]]("frame_md5s").nonEmpty)
    // deterministic: run twice, same fingerprints
    val again = extractFeatures(mediaDF, "id", DeterministicFakeDecoder(16)).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("first_frame_md5")).toMap
    assert(feats.forall { case (id, r) => r.getAs[String]("first_frame_md5") == again(id) })
  }

  test("sampleFrames: every k-th frame exploded with index") {
    val frames = sampleFrames(mediaDF.filter(col("id") === 3), "id", DeterministicFakeDecoder(16), every = 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2, 4, 6))
    assert(frames.head.getAs[Array[Byte]]("frame").forall(_ == 'x'.toByte))
  }

  test("resizeFrames: every frame lands at the target dim, prefix preserved") {
    val frames = sampleFrames(mediaDF, "id", DeterministicFakeDecoder(16), every = 1)
    val resized = resizeFrames(frames, dim = 8).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(_.getAs[Array[Byte]]("frame").length == 8))
    val r3 = resized.filter(r => r.getAs[Long]("id") == 3L && r.getAs[Int]("frame_idx") == 0).head
    assert(r3.getAs[Array[Byte]]("frame").forall(_ == 'x'.toByte))
    // zero-pad path: id=2 payload "short" (5 bytes) pads to 8
    val r2 = resized.filter(_.getAs[Long]("id") == 2L).head.getAs[Array[Byte]]("frame")
    assert(new String(r2.take(5), "UTF-8") == "short" && r2.drop(5).forall(_ == 0))
  }

  test("JdkImageDecoder: real PNG round-trips to exact closed-form pixels") {
    val (id, w, h) = (42L, 16, 12)
    val dec = RealDecoder.decode(Multimodal.encodePng(id, w, h), "image/png")
    assert(dec.nFrames == h)
    assert(dec.frameBytes.forall(_.length == w * 3))
    // spot-check every pixel against the closed form PNG encoding came from
    for (y <- 0 until h; x <- 0 until w) {
      val row = dec.frameBytes(y)
      assert((row(x * 3) & 0xFF) == ((id * 7 + x * 3 + y * 5) % 256).toInt, s"r($x,$y)")
      assert((row(x * 3 + 1) & 0xFF) == ((id * 11 + x * 13 + y) % 256).toInt, s"g($x,$y)")
      assert((row(x * 3 + 2) & 0xFF) == ((x.toLong * y + id) % 256).toInt, s"b($x,$y)")
    }
  }

  test("JdkAudioDecoder: real WAV round-trips to exact closed-form PCM") {
    val (id, n) = (7L, 4096)
    val dec = RealDecoder.decode(Multimodal.encodeWav(id, n), "audio/wav")
    assert(dec.nFrames == (n * 2 + JdkAudioDecoder.BlockBytes - 1) / JdkAudioDecoder.BlockBytes)
    val pcm = dec.frameBytes.flatten
    assert(pcm.length == n * 2)
    for (t <- 0 until n) {
      val s = (pcm(t * 2) & 0xFF) | (pcm(t * 2 + 1).toInt << 8)
      assert(s == (((id * 31 + t.toLong * 17) % 4001) - 2000).toInt, s"sample $t")
    }
  }

  test("RealDecoder rejects unsupported mimes with a clear error") {
    val e = intercept[IllegalArgumentException](RealDecoder.decode(Array[Byte](1), "video/mp4"))
    assert(e.getMessage.contains("video/mp4"))
  }

  test("mediaCodecStats: real decode path over a DataFrame, zero shuffles") {
    import spark.implicits._
    val out = Multimodal.mediaCodecStats(Seq(1L, 2L, 9L).toDF("doc_id"), "doc_id",
      w = 4, h = 3, nSamples = 100)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val r = out.collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    // closed-form reference for id=1, w=4, h=3, n=100
    val id = 1L
    var (rs, gs, bs) = (0L, 0L, 0L)
    for (y <- 0 until 3; x <- 0 until 4) {
      rs += (id * 7 + x * 3 + y * 5) % 256
      gs += (id * 11 + x * 13 + y) % 256
      bs += (x.toLong * y + id) % 256
    }
    var (ss, sa) = (0L, 0L)
    for (t <- 0 until 100) {
      val s = ((id * 31 + t.toLong * 17) % 4001) - 2000
      ss += s; sa += math.abs(s)
    }
    val row = r(1L)
    assert(row.getAs[Long]("img_w") == 4 && row.getAs[Long]("img_h") == 3)
    assert(row.getAs[Long]("r_sum") == rs && row.getAs[Long]("g_sum") == gs && row.getAs[Long]("b_sum") == bs)
    assert(row.getAs[Long]("pcm_n") == 100 && row.getAs[Long]("pcm_sum") == ss && row.getAs[Long]("pcm_abs") == sa)
  }

  test("audioFrameFeatures: real WAV decode to per-block energy/zero-crossings, zero shuffles") {
    import spark.implicits._
    val n = 1100 // 2 full blocks + 1 partial (76 samples)
    val out = Multimodal.audioFrameFeatures(Seq(3L).toDF("doc_id"), "doc_id", nSamples = n)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = out.collect().sortBy(_.getAs[Long]("frame_idx"))
    assert(rows.length == 3 && rows.map(_.getAs[Long]("n_samples")).toSeq == Seq(512L, 512L, 76L))
    // closed-form reference for block 1
    val id = 3L
    var energy = 0L; var zc = 0L; var prev = 0L
    for (t <- 512 until 1024) {
      val s = ((id * 31 + t.toLong * 17) % 4001) - 2000
      energy += s * s
      if (t > 512 && ((prev < 0 && s > 0) || (prev > 0 && s < 0))) zc += 1
      prev = s
    }
    assert(rows(1).getAs[Long]("energy") == energy && rows(1).getAs[Long]("zero_crossings") == zc)
  }

  test("boxDownsample2x: floor-average of each 2x2 block, odd edges dropped") {
    // 3x5 RGB image with distinct per-pixel values → expect 1x2 output
    val w = 5; val h = 3
    val rows = Array.tabulate(h) { y =>
      Array.tabulate(w * 3)(i => ((y * 100 + i) % 256).toByte)
    }
    val out = Multimodal.boxDownsample2x(rows)
    assert(out.length == 1 && out(0).length == 2 * 3)
    for (x <- 0 until 2; c <- 0 until 3) {
      val s = (rows(0)(6 * x + c) & 0xFF) + (rows(0)(6 * x + 3 + c) & 0xFF) +
        (rows(1)(6 * x + c) & 0xFF) + (rows(1)(6 * x + 3 + c) & 0xFF)
      assert((out(0)(3 * x + c) & 0xFF) == s / 4, s"channel ($x,$c)")
    }
  }

  test("resizedImageStats: real PNG decode + box resize matches closed form, zero shuffles") {
    import spark.implicits._
    val (w, h) = (6, 4)
    val out = Multimodal.resizedImageStats(Seq(5L).toDF("doc_id"), "doc_id", w = w, h = h)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val row = out.collect().head
    // closed-form reference: decode formula then 2x2 floor-average
    val id = 5L
    def px(x: Int, y: Int): (Long, Long, Long) =
      (((id * 7 + x * 3 + y * 5) % 256), ((id * 11 + x * 13 + y) % 256), ((x.toLong * y + id) % 256))
    var (rs, gs, bs) = (0L, 0L, 0L)
    val vals = for (y <- 0 until h / 2; x <- 0 until w / 2) yield {
      val ps = Seq(px(2 * x, 2 * y), px(2 * x + 1, 2 * y), px(2 * x, 2 * y + 1), px(2 * x + 1, 2 * y + 1))
      val r2 = ps.map(_._1).sum / 4; val g2 = ps.map(_._2).sum / 4; val b2 = ps.map(_._3).sum / 4
      rs += r2; gs += g2; bs += b2
      Seq(r2, g2, b2)
    }
    assert(row.getAs[Long]("out_w") == w / 2 && row.getAs[Long]("out_h") == h / 2)
    assert(row.getAs[Long]("r2_sum") == rs && row.getAs[Long]("g2_sum") == gs && row.getAs[Long]("b2_sum") == bs)
    val joined = vals.flatten.mkString(",")
    val md = java.security.MessageDigest.getInstance("MD5")
    val fp = md.digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getAs[String]("px_fp") == fp)
  }

  test("PngRoundTrip reusable codec is byte-equivalent to the one-shot ImageIO path") {
    val codec = new Multimodal.PngRoundTrip
    try {
      for (id <- Seq(0L, 7L, 123L); f <- 0 until 3) {
        val img = Multimodal.sceneFrameImage(id, f, f % 2, 12, 8)
        val viaOneShot = Multimodal.RealDecoder
          .decode(Multimodal.encodeScenePng(id, f, f % 2, 12, 8), "image/png").frameBytes
        val viaReused = codec.decodeRows(codec.encode(img))
        assert(viaReused.length == viaOneShot.length)
        viaReused.indices.foreach { y =>
          assert(java.util.Arrays.equals(viaReused(y), viaOneShot(y)), s"id=$id f=$f row $y")
        }
      }
    } finally codec.close()
  }

  test("WavRoundTrip SPI-bound codec is byte-equivalent to the AudioSystem facade path") {
    val codec = new Multimodal.WavRoundTrip
    for (id <- Seq(0L, 9L, 321L)) {
      val pcm = Multimodal.pcmFor(id, 777)
      val viaSpi = codec.encode(pcm, 777)
      val viaFacade = Multimodal.encodeWav(id, 777)
      assert(java.util.Arrays.equals(viaSpi, viaFacade), s"id=$id container bytes")
      assert(java.util.Arrays.equals(codec.decodePcm(viaFacade), pcm), s"id=$id pcm round trip")
    }
  }

  test("sceneCutStats: detector recovers exactly the scheduled scene boundaries, zero shuffles") {
    import spark.implicits._
    val frames = 12
    val out = Multimodal.sceneCutStats(Seq(3L, 8L).toDF("doc_id"), "doc_id",
      frames = frames, w = 12, h = 8, threshold = 8000L)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = out.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    Seq(3L, 8L).foreach { id =>
      // the detector works from DECODED bytes only; the schedule is the
      // ground truth it must rediscover through the PNG round trip
      val expected = (1 until frames).filter(f => (id * 13 + f * 29L) % 7 == 0)
      val r = rows(id)
      assert(r.getAs[Long]("n_cuts") == expected.size.toLong, s"id=$id")
      val md = java.security.MessageDigest.getInstance("MD5")
      val fp = md.digest(expected.mkString(",").getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("cuts_md5") == fp, s"id=$id cut positions")
      assert(r.getAs[Long]("n_frames") == frames.toLong)
      assert(r.getAs[Long]("sad_total") > 0L)
    }
  }
}
