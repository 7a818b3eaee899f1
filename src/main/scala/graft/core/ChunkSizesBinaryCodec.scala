package graft.core

import java.nio.ByteBuffer

/** Compact binary encoding for lists of transformed chunk sizes, kept
  * byte-compatible with the reference so manifests are golden-file
  * comparable.
  *
  * Layout (big-endian):
  * {{{
  *   count: int32
  *   [count == 0] -> end
  *   [count == 1] -> lastValue: int32, end
  *   base: int32               // min of all but the last value
  *   bytesPerValue: int8       // max bytes needed for any (value - base)
  *   values[count-1]           // each in bytesPerValue bytes
  *   lastValue: int32          // encoded in full, it may be much smaller
  * }}}
  *
  * Ref `core/.../manifest/index/serde/ChunkSizesBinaryCodec.java:104-200`.
  */
object ChunkSizesBinaryCodec {

  private def bytesNeeded(v: Int): Int =
    if (v <= 0xFF) 1 else if (v <= 0xFFFF) 2 else if (v <= 0xFFFFFF) 3 else 4

  def encode(values: Seq[Int]): Array[Byte] = {
    val count = values.size
    if (count == 0) return ByteBuffer.allocate(4).putInt(0).array()
    val lastValue = values.last
    require(lastValue >= 0, "Values cannot be negative")
    if (count == 1) return ByteBuffer.allocate(8).putInt(1).putInt(lastValue).array()

    val head = values.view.take(count - 1)
    val base = head.min
    require(base >= 0, "Values cannot be negative")
    val bytesPerValue = head.map(v => bytesNeeded(v - base)).max

    val buf = ByteBuffer.allocate(4 + 4 + 1 + (count - 1) * bytesPerValue + 4)
    buf.putInt(count)
    buf.putInt(base)
    buf.put(bytesPerValue.toByte)
    val intBuf = ByteBuffer.allocate(4)
    val offset = 4 - bytesPerValue
    head.foreach { v =>
      intBuf.rewind()
      intBuf.putInt(v - base)
      buf.put(intBuf.array(), offset, bytesPerValue)
    }
    buf.putInt(lastValue)
    buf.array()
  }

  def decode(bytes: Array[Byte]): Vector[Int] = {
    // manifests arrive off the object store: corrupt/truncated payloads
    // must fail VALIDATION here (clear message, caught by the serving
    // path), not leak a raw BufferUnderflowException — found by the r4
    // manifest fuzz.
    require(bytes.length >= 4, s"chunk-sizes payload truncated: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes)
    val count = buf.getInt()
    require(count >= 0, s"negative chunk count $count")
    // the count==0/1 short forms enforce EXACT length like the general
    // branch below — trailing junk is corruption, not padding
    if (count == 0) {
      require(bytes.length == 4, s"chunk-sizes payload has ${bytes.length} bytes; count 0 needs exactly 4")
      return Vector.empty
    }
    if (count == 1) {
      require(bytes.length == 8, s"chunk-sizes payload has ${bytes.length} bytes; count 1 needs exactly 8")
      return Vector(buf.getInt())
    }
    val base = buf.getInt()
    require(buf.remaining() >= 1, "chunk-sizes payload truncated before width byte")
    val bytesPerValue = buf.get().toInt
    require(bytesPerValue >= 1 && bytesPerValue <= 4,
      s"invalid chunk-size width $bytesPerValue (expected 1..4)")
    require(buf.remaining().toLong == (count - 1).toLong * bytesPerValue + 4,
      s"chunk-sizes payload has ${buf.remaining()} bytes; " +
        s"count $count at width $bytesPerValue needs ${(count - 1).toLong * bytesPerValue + 4}")
    val valBuf = ByteBuffer.allocate(4)
    val offset = 4 - bytesPerValue
    val out = Vector.newBuilder[Int]
    var i = 0
    while (i < count - 1) {
      buf.get(valBuf.array(), offset, bytesPerValue)
      valBuf.rewind()
      out += valBuf.getInt() + base
      i += 1
    }
    out += buf.getInt()
    out.result()
  }
}
