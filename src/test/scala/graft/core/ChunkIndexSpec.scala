package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.testkit.Props.forAllN

/** FIXTURES.md F2; mirrors `ChunkIndexBuilderCommonTest.java` +
  * `FixedSizeChunkIndexBuilderTest.java` + `AbstractChunkIndex` math. */
class ChunkIndexSpec extends AnyFunSuite {

  test("fixed index: exact multiple") {
    val idx = FixedSizeChunkIndex(100, 300, 110, 110)
    assert(idx.chunkCount == 3)
    assert(idx.chunks == Vector(
      Chunk(0, 0, 100, 0, 110), Chunk(1, 100, 100, 110, 110), Chunk(2, 200, 100, 220, 110)))
    assert(idx.transformedFileSize == 330)
  }

  test("fixed index: remainder final chunk") {
    val idx = FixedSizeChunkIndex(100, 250, 110, 80)
    assert(idx.chunkCount == 3)
    assert(idx.chunks(2) == Chunk(2, 200, 50, 220, 80))
  }

  test("empty file materializes the sentinel chunk") {
    val idx = FixedSizeChunkIndex(100, 0, 110, 0)
    assert(idx.chunkCount == 0)
    assert(idx.chunks == Vector(Chunk(0, 0, 0, 0, 0)))
    assert(idx.findChunkForOriginalOffset(0).isEmpty)
  }

  test("findChunkForOriginalOffset: boundaries") {
    val idx = FixedSizeChunkIndex(100, 250, 100, 50)
    assert(idx.findChunkForOriginalOffset(0).get.id == 0)
    assert(idx.findChunkForOriginalOffset(99).get.id == 0)
    assert(idx.findChunkForOriginalOffset(100).get.id == 1)
    assert(idx.findChunkForOriginalOffset(249).get.id == 2)
    assert(idx.findChunkForOriginalOffset(250).isEmpty)
    intercept[IllegalArgumentException](idx.findChunkForOriginalOffset(-1))
  }

  test("chunksForRange: covering set, clamped to EOF") {
    val idx = FixedSizeChunkIndex(100, 250, 100, 50)
    assert(idx.chunksForRange(BytesRange(0, 249)).map(_.id) == Vector(0, 1, 2))
    assert(idx.chunksForRange(BytesRange(50, 150)).map(_.id) == Vector(0, 1))
    assert(idx.chunksForRange(BytesRange(100, 100)).map(_.id) == Vector(1))
    assert(idx.chunksForRange(BytesRange(200, 10000)).map(_.id) == Vector(2))
    assert(idx.chunksForRange(BytesRange(250, 300)).isEmpty)
    assert(idx.chunksForRange(BytesRange.empty(10)).isEmpty)
  }

  test("variable index: transformed positions are running sums") {
    val idx = VariableSizeChunkIndex(100, 250, Vector(30, 20, 10))
    assert(idx.chunks == Vector(
      Chunk(0, 0, 100, 0, 30), Chunk(1, 100, 100, 30, 20), Chunk(2, 200, 50, 50, 10)))
    assert(idx.transformedFileSize == 60)
  }

  test("builders produce the same index as direct construction") {
    val fb = new FixedSizeChunkIndexBuilder(100, 250, 110)
    fb.addChunk(110); fb.addChunk(110)
    assert(fb.finish(80) == FixedSizeChunkIndex(100, 250, 110, 80))

    val vb = new VariableSizeChunkIndexBuilder(100, 250)
    vb.addChunk(30); vb.addChunk(20)
    assert(vb.finish(10) == VariableSizeChunkIndex(100, 250, Vector(30, 20, 10)))
  }

  test("invalid sizes rejected") {
    intercept[IllegalArgumentException](FixedSizeChunkIndex(0, 100, 10, 10))
    intercept[IllegalArgumentException](FixedSizeChunkIndex(10, -1, 10, 10))
    intercept[IllegalArgumentException](VariableSizeChunkIndex(10, 100, Vector.empty))
  }

  test("law: chunk sizes sum to file sizes; lookup agrees with linear scan") {
    val gen = for {
      chunkSize <- Gen.chooseNum(1, 5000)
      fileSize <- Gen.chooseNum(0, 100000)
    } yield (chunkSize, fileSize)
    forAllN(gen) { case (chunkSize, fileSize) =>
      val idx = FixedSizeChunkIndex(chunkSize, fileSize, chunkSize + 28, 0)
      if (fileSize > 0) {
        assert(idx.chunks.map(_.originalSize.toLong).sum == fileSize)
        val offsets = Seq(0, fileSize / 2, fileSize - 1)
        offsets.foreach { off =>
          val c = idx.findChunkForOriginalOffset(off).get
          assert(c.originalPosition <= off && off < c.originalPosition + c.originalSize)
          assert(idx.chunks.find(ch => ch.originalPosition <= off && off < ch.originalPosition + ch.originalSize).get == c)
        }
      }
    }
  }
}
