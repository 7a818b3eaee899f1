package graft.core.transform

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.testkit.Props

class Lz4Spec extends AnyFunSuite {

  private def roundTrip(src: Array[Byte]): Unit = {
    val c = Lz4.compress(src)
    assert(c.length <= Lz4.maxCompressedLength(src.length))
    val back = Lz4.decompress(c, 0, c.length, src.length)
    assert(java.util.Arrays.equals(back, src),
      s"round trip failed for ${src.length} bytes")
  }

  test("edge sizes: empty, 1, and everything below the 13-byte match floor") {
    (0 to 16).foreach(n => roundTrip(Array.tabulate(n)(_.toByte)))
  }

  test("constant runs compress hard and round trip (overlap-copy path)") {
    Seq(13, 100, 65535, 1 << 20).foreach { n =>
      val src = Array.fill(n)(7.toByte)
      val c = Lz4.compress(src)
      roundTrip(src)
      assert(c.length < n / 50 + 32, s"constant run of $n compressed to ${c.length}")
    }
  }

  test("long literal runs (>255 extension bytes) round trip") {
    val rnd = new java.util.Random(1)
    val src = new Array[Byte](300000) // incompressible -> one huge literal run
    rnd.nextBytes(src)
    roundTrip(src)
  }

  test("short-period patterns exercise offset < matchLen replication") {
    (1 to 8).foreach { period =>
      val src = Array.tabulate(10000)(i => (i % period).toByte)
      roundTrip(src)
    }
  }

  test("property: arbitrary byte arrays round trip") {
    val gen = for {
      n <- Gen.chooseNum(0, 5000)
      mode <- Gen.oneOf(0, 1, 2)
      bytes <- mode match {
        case 0 => Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte))
        case 1 => Gen.containerOfN[Array, Byte](n, Gen.oneOf(0.toByte, 1.toByte, 2.toByte)) // highly repetitive
        case 2 => Gen.const(Array.tabulate(n)(i => ((i * 31) ^ (i >> 3)).toByte))
      }
    } yield bytes
    Props.forAllN(gen, n = 200)(roundTrip)
  }

  test("half-random half-constant (the bench content shape)") {
    val rnd = new java.util.Random(42)
    val src = new Array[Byte](1 << 20)
    rnd.nextBytes(src)
    java.util.Arrays.fill(src, src.length / 2, src.length, 7.toByte)
    val c = Lz4.compress(src)
    roundTrip(src)
    assert(c.length < src.length, "half-constant content must shrink")
  }

  test("decodes handcrafted blocks from the published format spec") {
    // sequence 1: token 0x34 -> 3 literals 'abc', match offset 3 len 4+4=8
    // (replicates "abc" periodically); final sequence: 5 literals "hello"
    val block = Array[Byte](
      0x34.toByte, 'a', 'b', 'c', 0x03, 0x00, // "abc" + 8-byte overlap match
      0x50.toByte, 'h', 'e', 'l', 'l', 'o') // trailing literals
    val out = new String(Lz4.decompress(block, 0, block.length, 16), "UTF-8")
    assert(out == "abcabcabcab" + "hello", s"got '$out'")

    // 255-extension: 15+255+3 = 273 literals of 'x', then end
    val lits = Array.fill(273)('x'.toByte)
    val ext = Array[Byte](0xF0.toByte, 0xFF.toByte, 0x03) ++ lits
    val back = Lz4.decompress(ext, 0, ext.length, 273)
    assert(back.length == 273 && back.forall(_ == 'x'.toByte))
  }

  test("compressed output is itself spec-shaped (token walk terminates exactly)") {
    // walk the emitted sequences manually with an independent mini-parser
    val rnd = new java.util.Random(9)
    val src = new Array[Byte](20000)
    rnd.nextBytes(src)
    java.util.Arrays.fill(src, 5000, 15000, 3.toByte)
    val c = Lz4.compress(src)
    var s = 0
    var produced = 0
    while (s < c.length) {
      val token = c(s) & 0xFF; s += 1
      var lit = token >>> 4
      if (lit == 15) { var b = 0; while ({ b = c(s) & 0xFF; s += 1; b == 255 }) lit += 255; lit += b }
      s += lit; produced += lit
      if (s < c.length) {
        val off = (c(s) & 0xFF) | ((c(s + 1) & 0xFF) << 8); s += 2
        assert(off > 0 && off <= produced, s"offset $off beyond produced $produced")
        var ml = (token & 15) + 4
        if ((token & 15) == 15) { var b = 0; while ({ b = c(s) & 0xFF; s += 1; b == 255 }) ml += 255; ml += b }
        produced += ml
      }
    }
    assert(produced == src.length, s"token walk produced $produced of ${src.length}")
  }

  test("deflate stays readable through the codec tag") {
    val rnd = new java.util.Random(3)
    val src = new Array[Byte](50000)
    rnd.nextBytes(src)
    java.util.Arrays.fill(src, 0, 25000, 1.toByte)
    val viaDeflate = Transforms.compressDeflate(src)
    assert(java.util.Arrays.equals(Transforms.decompress(viaDeflate), src))
    val viaLz4 = Transforms.compress(src)
    assert(java.util.Arrays.equals(Transforms.decompress(viaLz4), src))
  }

  test("legacy 4-byte (pre-codec-tag) deflate chunks stay readable") {
    // Earlier builds wrote [int32 size][zlib stream] with no tag byte; the
    // zlib CMF byte (low nibble 8, e.g. 0x78) lands where the tag now
    // lives. decompress must route it through the legacy path.
    val rnd = new java.util.Random(9)
    val src = new Array[Byte](20000)
    rnd.nextBytes(src)
    java.util.Arrays.fill(src, 0, 10000, 2.toByte)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(src); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    out.write(java.nio.ByteBuffer.allocate(4).putInt(src.length).array())
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) { val n = deflater.deflate(buf); out.write(buf, 0, n) }
    deflater.end()
    val legacy = out.toByteArray
    assert((legacy(4) & 0x0F) == 8, "zlib CMF low nibble must be 8")
    assert(java.util.Arrays.equals(Transforms.decompress(legacy), src))
  }

  test("unknown codec tag fails with a clear message") {
    val bogus = java.nio.ByteBuffer.allocate(6).putInt(1).put(0x55.toByte).put(0.toByte).array()
    val e = intercept[IllegalArgumentException](Transforms.decompress(bogus))
    assert(e.getMessage.contains("unknown codec tag"))
  }
}
