package graft.core

/** Closed byte range `[from, to]` over a segment's original or transformed
  * coordinates. Empty ranges are modeled explicitly (`isEmpty`) rather than
  * with the reference's `to = -1` sentinel.
  *
  * Mirrors semantics of
  * `storage/core/src/main/java/io/aiven/kafka/tieredstorage/storage/BytesRange.java:26-112`.
  */
final case class BytesRange(from: Long, to: Long) {
  require(from >= 0, s"from cannot be negative, $from given")
  require(to >= from - 1, s"to cannot be less than from - 1, from=$from to=$to given")
  def isEmpty: Boolean = to < from
  def size: Long = if (isEmpty) 0L else to - from + 1
  def firstPosition: Long = from
  def lastPosition: Long = to
  def intersects(other: BytesRange): Boolean =
    !isEmpty && !other.isEmpty && from <= other.to && other.from <= to
}

object BytesRange {
  /** `[from, from + size)` as a closed range. */
  def ofFromPositionAndSize(from: Long, size: Long): BytesRange = {
    require(size >= 0, s"size cannot be negative, $size given")
    BytesRange(from, from + size - 1)
  }
  def empty(at: Long): BytesRange = BytesRange(at, at - 1)
}

/** A slice of a segment with dual coordinates: its position/size in the
  * original (untransformed) byte stream and in the transformed (compressed /
  * encrypted) object.
  *
  * Mirrors `core/src/main/java/io/aiven/kafka/tieredstorage/Chunk.java:21-40`.
  */
final case class Chunk(
    id: Int,
    originalPosition: Int,
    originalSize: Int,
    transformedPosition: Int,
    transformedSize: Int
) {
  /** Range of this chunk in the original stream (closed). */
  def range: BytesRange = BytesRange.ofFromPositionAndSize(originalPosition.toLong, originalSize.toLong)
  /** Range of this chunk in the transformed object (closed) — what a ranged
    * GET must request. */
  def transformedRange: BytesRange =
    BytesRange.ofFromPositionAndSize(transformedPosition.toLong, transformedSize.toLong)
}
