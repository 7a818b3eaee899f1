package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.testkit.Props.forAllN

/** FIXTURES.md F2; mirrors `ChunkSizesBinaryCodecTest.java:34-105`. */
class ChunkSizesBinaryCodecSpec extends AnyFunSuite {

  test("empty list encodes to count only") {
    val e = ChunkSizesBinaryCodec.encode(Nil)
    assert(e.length == 4)
    assert(ChunkSizesBinaryCodec.decode(e) == Vector.empty)
  }

  test("single value encodes as count + full value") {
    val e = ChunkSizesBinaryCodec.encode(Seq(12345))
    assert(e.length == 8)
    assert(ChunkSizesBinaryCodec.decode(e) == Vector(12345))
  }

  test("single Int.MaxValue") {
    assert(ChunkSizesBinaryCodec.decode(ChunkSizesBinaryCodec.encode(Seq(Int.MaxValue))) == Vector(Int.MaxValue))
  }

  test("negative values rejected") {
    intercept[IllegalArgumentException](ChunkSizesBinaryCodec.encode(Seq(-1)))
    intercept[IllegalArgumentException](ChunkSizesBinaryCodec.encode(Seq(10, -1, 5)))
  }

  test("width selection: 1/2/3/4 bytes per value") {
    // deltas <= 0xFF -> 1 byte/value; layout: 4+4+1+(n-1)*w+4
    def len(xs: Seq[Int]): Int = ChunkSizesBinaryCodec.encode(xs).length
    assert(len(Seq(1000000, 1000255, 1)) == 4 + 4 + 1 + 2 * 1 + 4)
    assert(len(Seq(1000000, 1000256, 1)) == 4 + 4 + 1 + 2 * 2 + 4)
    assert(len(Seq(1000000, 1000000 + 0x10000, 1)) == 4 + 4 + 1 + 2 * 3 + 4)
    assert(len(Seq(0, 0x1000000, 1)) == 4 + 4 + 1 + 2 * 4 + 4)
  }

  test("last value excluded from base/width computation") {
    // last value tiny; head values near 1e6 -> still 1 byte/value
    val xs = Seq(1000000, 1000010, 1000020, 3)
    assert(ChunkSizesBinaryCodec.encode(xs).length == 4 + 4 + 1 + 3 * 1 + 4)
    assert(ChunkSizesBinaryCodec.decode(ChunkSizesBinaryCodec.encode(xs)) == xs.toVector)
  }

  test("count 0 and count 1 payloads reject trailing junk (exact-length, r4 advice)") {
    val empty = ChunkSizesBinaryCodec.encode(Seq.empty)
    val single = ChunkSizesBinaryCodec.encode(Seq(42))
    assert(empty.length == 4 && single.length == 8)
    intercept[IllegalArgumentException](ChunkSizesBinaryCodec.decode(empty :+ 0.toByte))
    intercept[IllegalArgumentException](ChunkSizesBinaryCodec.decode(single :+ 0.toByte))
    intercept[IllegalArgumentException](ChunkSizesBinaryCodec.decode(single.take(7)))
    assert(ChunkSizesBinaryCodec.decode(empty) == Vector.empty)
    assert(ChunkSizesBinaryCodec.decode(single) == Vector(42))
  }

  test("round-trip law: decode(encode(xs)) == xs for non-negative xs") {
    val gen = Gen.listOf(Gen.chooseNum(0, Int.MaxValue))
    forAllN(gen) { xs => assert(ChunkSizesBinaryCodec.decode(ChunkSizesBinaryCodec.encode(xs)) == xs.toVector) }
  }

  test("round-trip law on realistic similar sizes") {
    val gen = for {
      base <- Gen.chooseNum(1024, 8 * 1024 * 1024)
      variability <- Gen.chooseNum(0, 4096)
      n <- Gen.chooseNum(1, 500)
      deltas <- Gen.listOfN(n, Gen.chooseNum(0, variability))
      last <- Gen.chooseNum(0, base)
    } yield deltas.map(base + _) :+ last
    forAllN(gen) { xs => assert(ChunkSizesBinaryCodec.decode(ChunkSizesBinaryCodec.encode(xs)) == xs.toVector) }
  }
}
