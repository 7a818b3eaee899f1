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

  /** Typed media column: payload + envelope metadata. */
  val mediaType: StructType = StructType(Seq(
    StructField("bytes", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** What a decoder yields per media payload: fixed-shape frame batches. */
  final case class DecodedFrames(nFrames: Int, frameBytes: Array[Array[Byte]])

  /** The codec boundary. A real implementation would call an image/audio
    * library here; none ships in this container, so production wiring is
    * intentionally unimplemented and tests inject
    * [[DeterministicFakeDecoder]]. */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte], mime: String): DecodedFrames
  }

  /** STUB (marked per task brief): real codec integration point. */
  object RealDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte], mime: String): DecodedFrames =
      ??? // real image/audio codecs are not available in this environment
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
