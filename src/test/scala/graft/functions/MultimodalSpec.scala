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

  test("real decoder boundary is an explicit stub") {
    intercept[NotImplementedError](RealDecoder.decode(Array[Byte](1), "image/png"))
  }
}
