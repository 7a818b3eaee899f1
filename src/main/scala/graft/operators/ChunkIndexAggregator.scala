package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.core.{ChunkIndex, VariableSizeChunkIndex}

/** T4/T5 as a typed Spark `Aggregator` (SURVEY §2.2): fold per-chunk
  * transformed sizes into a sealed [[VariableSizeChunkIndex]] per segment.
  * This is the distributed form of the reference's `TransformFinisher`
  * drain (`TransformFinisher.java:47-199`): chunk rows arrive unordered
  * from parallel transform tasks; the merge-able buffer restores id order
  * at finish.
  *
  * Usage:
  * {{{
  *   chunkRows                                  // (segmentKey, chunkId, transformedSize)
  *     .groupByKey(_._1)
  *     .agg(new ChunkIndexAggregator(chunkSize, fileSizes).toColumn)
  * }}}
  */
final class ChunkIndexAggregator(originalChunkSize: Int, originalFileSize: Int)
    extends Aggregator[(Int, Int), List[(Int, Int)], VariableSizeChunkIndex] {

  override def zero: List[(Int, Int)] = Nil
  override def reduce(b: List[(Int, Int)], a: (Int, Int)): List[(Int, Int)] = a :: b
  override def merge(b1: List[(Int, Int)], b2: List[(Int, Int)]): List[(Int, Int)] = b1 ::: b2
  override def finish(b: List[(Int, Int)]): VariableSizeChunkIndex =
    VariableSizeChunkIndex(originalChunkSize, originalFileSize,
      b.sortBy(_._1).map(_._2).toVector)
  override def bufferEncoder: Encoder[List[(Int, Int)]] = Encoders.kryo[List[(Int, Int)]]
  override def outputEncoder: Encoder[VariableSizeChunkIndex] = Encoders.kryo[VariableSizeChunkIndex]
}

object ChunkIndexAggregator {
  /** Build one index per segment from unordered chunk rows. */
  def buildIndexes(
      chunks: Dataset[(String, Int, Int)], // (segmentKey, chunkId, transformedSize)
      originalChunkSize: Int,
      fileSizes: Map[String, Int]): Map[String, ChunkIndex] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.groupByKey(_._1)
      .mapGroups { (seg, it) =>
        val sizes = it.map(t => (t._2, t._3)).toList.sortBy(_._1).map(_._2).toVector
        (seg, VariableSizeChunkIndex(originalChunkSize, fileSizes(seg), sizes): ChunkIndex)
      }(Encoders.kryo[(String, ChunkIndex)])
      .collect().toMap
  }
}
