package graft.core

/** Mapping from original-stream byte offsets to [[Chunk]]s.
  *
  * Two encodings exist, chosen at write time by the transform finisher:
  *   - [[FixedSizeChunkIndex]] — size-preserving-per-chunk transforms
  *     (encryption adds a constant overhead): O(1) metadata, O(1) lookup.
  *   - [[VariableSizeChunkIndex]] — variable transforms (compression): the
  *     per-chunk transformed sizes are stored explicitly (delta-encoded in
  *     the manifest via [[ChunkSizesBinaryCodec]]).
  *
  * Semantics mirror
  * `core/src/main/java/io/aiven/kafka/tieredstorage/manifest/index/ChunkIndex.java:30-45`
  * and `AbstractChunkIndex.java:52-122`; lookup here is O(1)/O(log n) instead
  * of the reference's linear walk (`AbstractChunkIndex.java:75-107`).
  */
sealed trait ChunkIndex {
  def originalChunkSize: Int
  def originalFileSize: Int
  def chunkCount: Int

  /** Transformed size of chunk `i`. */
  protected def transformedChunkSizeAt(i: Int): Int

  private def originalChunkSizeAt(i: Int): Int =
    if (i == chunkCount - 1) originalFileSize - (chunkCount - 1) * originalChunkSize
    else originalChunkSize

  /** All chunks, materialized with running positions. An empty file yields the
    * single sentinel `Chunk(0,0,0,0,0)` (ref `AbstractChunkIndex.java:55-57`). */
  lazy val chunks: Vector[Chunk] =
    if (chunkCount == 0) Vector(Chunk(0, 0, 0, 0, 0))
    else {
      val b = Vector.newBuilder[Chunk]
      var op = 0
      var tp = 0
      var i = 0
      while (i < chunkCount) {
        val os = originalChunkSizeAt(i)
        val ts = transformedChunkSizeAt(i)
        b += Chunk(i, op, os, tp, ts)
        op += os
        tp += ts
        i += 1
      }
      b.result()
    }

  /** Chunk covering original offset, or None past EOF. */
  def findChunkForOriginalOffset(offset: Int): Option[Chunk] = {
    require(offset >= 0, s"Offset must be non-negative, $offset given")
    if (offset >= originalFileSize) None
    else Some(chunks(offset / originalChunkSize))
  }

  /** All chunks overlapping the requested original-coordinate range, in id
    * order (ref `AbstractChunkIndex.java:113-122`). */
  def chunksForRange(range: BytesRange): Vector[Chunk] =
    if (range.isEmpty || range.from >= originalFileSize || chunkCount == 0) Vector.empty
    else {
      val first = (range.from / originalChunkSize).toInt
      val last = (math.min(range.to, originalFileSize - 1L) / originalChunkSize).toInt
      chunks.slice(first, last + 1)
    }

  /** Total transformed object size. */
  def transformedFileSize: Long = {
    val lastChunk = chunks.last
    lastChunk.transformedPosition.toLong + lastChunk.transformedSize.toLong
  }
}

object ChunkIndex {
  private[core] def checkPositive(v: Int, name: String): Unit =
    require(v > 0, s"$name must be positive, $v given")
  private[core] def checkNonNegative(v: Int, name: String): Unit =
    require(v >= 0, s"$name must be non-negative, $v given")

  private[core] def chunkCountOf(originalChunkSize: Int, originalFileSize: Int): Int = {
    checkPositive(originalChunkSize, "Original chunk size")
    checkNonNegative(originalFileSize, "Original file size")
    if (originalFileSize % originalChunkSize == 0) originalFileSize / originalChunkSize
    else originalFileSize / originalChunkSize + 1
  }
}

/** Fixed-size transformed chunks (except the final one).
  * Ref `manifest/index/FixedSizeChunkIndex.java:45-93`. */
final case class FixedSizeChunkIndex(
    originalChunkSize: Int,
    originalFileSize: Int,
    transformedChunkSize: Int,
    finalTransformedChunkSize: Int
) extends ChunkIndex {
  import ChunkIndex._
  checkNonNegative(transformedChunkSize, "Transformed chunk size")
  checkNonNegative(finalTransformedChunkSize, "Final transformed chunk size")
  val chunkCount: Int = chunkCountOf(originalChunkSize, originalFileSize)
  protected def transformedChunkSizeAt(i: Int): Int =
    if (i == chunkCount - 1) finalTransformedChunkSize else transformedChunkSize
}

/** Variable-size transformed chunks (compression).
  * Ref `manifest/index/VariableSizeChunkIndex.java:49-71`. */
final case class VariableSizeChunkIndex(
    originalChunkSize: Int,
    originalFileSize: Int,
    transformedChunks: Vector[Int]
) extends ChunkIndex {
  import ChunkIndex._
  require(transformedChunks.nonEmpty, "transformedChunks cannot be empty")
  checkPositive(originalChunkSize, "Original chunk size")
  checkNonNegative(originalFileSize, "Original file size")
  val chunkCount: Int = transformedChunks.size
  def finalTransformedChunkSize: Int = transformedChunks.last
  protected def transformedChunkSizeAt(i: Int): Int = transformedChunks(i)
}

/** Incremental builders used by the transform finisher while draining chunks.
  * Ref `manifest/index/AbstractChunkIndexBuilder.java` + subclasses. */
sealed abstract class ChunkIndexBuilder {
  protected var finished = false
  protected def checkNotFinished(): Unit = require(!finished, "already finished")
  /** Record a non-final chunk's transformed size. */
  def addChunk(transformedSize: Int): Unit
  /** Record the final chunk's transformed size and seal. */
  def finish(finalTransformedSize: Int): ChunkIndex
}

final class FixedSizeChunkIndexBuilder(
    originalChunkSize: Int,
    originalFileSize: Int,
    transformedChunkSize: Int
) extends ChunkIndexBuilder {
  private val expectedNonFinal = math.max(ChunkIndex.chunkCountOf(originalChunkSize, originalFileSize) - 1, 0)
  private var seen = 0
  def addChunk(transformedSize: Int): Unit = {
    checkNotFinished()
    require(transformedSize == transformedChunkSize,
      s"fixed-size index requires uniform transformed size $transformedChunkSize, got $transformedSize")
    seen += 1
    require(seen <= expectedNonFinal, s"too many chunks: expected $expectedNonFinal non-final")
  }
  def finish(finalTransformedSize: Int): ChunkIndex = {
    checkNotFinished(); finished = true
    FixedSizeChunkIndex(originalChunkSize, originalFileSize, transformedChunkSize, finalTransformedSize)
  }
}

final class VariableSizeChunkIndexBuilder(
    originalChunkSize: Int,
    originalFileSize: Int
) extends ChunkIndexBuilder {
  private val sizes = Vector.newBuilder[Int]
  def addChunk(transformedSize: Int): Unit = {
    checkNotFinished()
    ChunkIndex.checkNonNegative(transformedSize, "Transformed chunk size")
    sizes += transformedSize
  }
  def finish(finalTransformedSize: Int): ChunkIndex = {
    checkNotFinished(); finished = true
    ChunkIndex.checkNonNegative(finalTransformedSize, "Final transformed chunk size")
    VariableSizeChunkIndex(originalChunkSize, originalFileSize, (sizes += finalTransformedSize).result())
  }
}
