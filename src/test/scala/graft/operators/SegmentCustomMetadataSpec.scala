package graft.operators

import scala.collection.immutable.TreeMap

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.Props.forAllN

/** Wire-format spec for the tagged-field custom-metadata serde: golden
  * bytes pinned against the reference's own test vector
  * (`SegmentCustomMetadataSerdeTest.java:41-52`: {0→100L, 2→"foo"}
  * serializes to exactly 11 bytes under Kafka's Struct machinery), plus a
  * ScalaCheck round-trip law and strict-decoder error cases. */
class SegmentCustomMetadataSpec extends AnyFunSuite {
  import SegmentCustomMetadata._

  test("golden bytes: reference test vector {remote_size=100, object_key='foo'}") {
    val bytes = serialize(TreeMap(RemoteSizeTag -> 100L, ObjectKeyTag -> "foo"))
    // KIP-482: count=2 | tag=0, size=2, varlong(zigzag(100)=200)=C8 01 |
    //          tag=2, size=4, compact_string(len+1=4, 'f','o','o')
    val expected = Array[Int](
      0x02,
      0x00, 0x02, 0xC8, 0x01,
      0x02, 0x04, 0x04, 'f', 'o', 'o').map(_.toByte)
    assert(bytes.toSeq == expected.toSeq,
      s"got ${bytes.map(b => f"${b & 0xff}%02x").mkString(" ")}")
    assert(bytes.length == 11) // the reference asserts exactly this size
    val back = deserialize(bytes)
    assert(back == TreeMap[Int, Any](RemoteSizeTag -> 100L, ObjectKeyTag -> "foo"))
  }

  test("empty map is zero bytes, zero bytes is empty map") {
    assert(serialize(TreeMap.empty).isEmpty)
    assert(deserialize(Array.emptyByteArray).isEmpty)
    assert(deserialize(null).isEmpty)
  }

  test("round-trip law over arbitrary field subsets") {
    val genFields: Gen[TreeMap[Int, Any]] = for {
      hasSize <- Gen.oneOf(true, false)
      size <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      hasPrefix <- Gen.oneOf(true, false)
      prefix <- Gen.asciiPrintableStr.map(_.take(64))
      hasKey <- Gen.oneOf(true, false)
      // non-ASCII exercises the UTF-8 leg of COMPACT_STRING
      key <- Gen.oneOf(Gen.asciiPrintableStr.map(_.take(64)),
        Gen.const("topic-δ/0/00000000000000000042-uuid.log"))
    } yield {
      var m = TreeMap.empty[Int, Any]
      if (hasSize) m += (RemoteSizeTag -> size)
      if (hasPrefix) m += (ObjectPrefixTag -> prefix)
      if (hasKey) m += (ObjectKeyTag -> key)
      m
    }
    forAllN(genFields) { m =>
      assert(deserialize(serialize(m)) == m)
    }
  }

  test("forUpload carries all three fields and round-trips") {
    val m = forUpload(123456789L, "tiered/", "t-uuid/3/00000000000000001000-s.log")
    val back = deserialize(serialize(m))
    assert(back(RemoteSizeTag) == 123456789L)
    assert(back(ObjectPrefixTag) == "tiered/")
    assert(back(ObjectKeyTag) == "t-uuid/3/00000000000000001000-s.log")
  }

  test("serializer rejects wrong types and unknown tags (reference: SchemaException)") {
    val e1 = intercept[IllegalArgumentException](
      serialize(TreeMap(RemoteSizeTag -> "foo")))
    assert(e1.getMessage.contains("remote_size"))
    val e2 = intercept[IllegalArgumentException](
      serialize(TreeMap(ObjectKeyTag -> 5L)))
    assert(e2.getMessage.contains("String"))
    val e3 = intercept[IllegalArgumentException](
      serialize(TreeMap(4 -> "foo"))) // values().length + 1, like the ref test
    assert(e3.getMessage.contains("unknown"))
  }

  test("strict decode: truncation, trailing bytes, out-of-order tags all throw") {
    val good = serialize(forUpload(100L, "p/", "k.log"))
    intercept[IllegalArgumentException](deserialize(good.dropRight(1)))
    intercept[IllegalArgumentException](deserialize(good :+ 0x00.toByte))
    // hand-built out-of-order: count=2, tag=2 then tag=0
    val str = Array[Int](0x04, 'f', 'o', 'o').map(_.toByte)
    val vl = Array[Int](0xC8, 0x01).map(_.toByte)
    val bad = Array[Byte](0x02, 0x02, str.length.toByte) ++ str ++
      Array[Byte](0x00, vl.length.toByte) ++ vl
    val e = intercept[IllegalArgumentException](deserialize(bad))
    assert(e.getMessage.contains("out of order"))
  }

  test("varlong edges: negative and extreme remote_size values") {
    Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue).foreach { v =>
      val m = TreeMap[Int, Any](RemoteSizeTag -> v)
      assert(deserialize(serialize(m)) == m, s"failed for $v")
    }
  }
}
