package graft.records

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.zip.CRC32C

/** Kafka record-batch wire format v2 (magic 2), parse + write, implemented
  * from the public protocol specification. The reference leans on
  * `kafka-clients` for this (`iceberg/BatchEnumeration.java:92-118`,
  * `IcebergRemoteStorageManager.java:196-211`); we hand-roll it so the
  * engine has no broker dependency.
  *
  * Batch interiors support ALL FIVE codec ids of the public protocol —
  * none (0), gzip (1), snappy (2), lz4 (3), zstd (4) — via
  * [[BatchCompression]]; attribute bits are preserved verbatim so
  * regrouped batches re-serialize with their ORIGINAL producer codec
  * (matching `iceberg/BatchEnumeration.java:92-118`), byte-identically
  * for segments this codec wrote.
  */
object KafkaWireCodec {

  final case class Header(key: String, value: Array[Byte])

  final case class Record(
      offsetDelta: Int,
      timestampDelta: Long,
      key: Array[Byte], // null = absent
      value: Array[Byte], // null = absent
      headers: Vector[Header])

  final case class Batch(
      baseOffset: Long,
      partitionLeaderEpoch: Int,
      magic: Byte,
      attributes: Short,
      lastOffsetDelta: Int,
      baseTimestamp: Long,
      maxTimestamp: Long,
      producerId: Long,
      producerEpoch: Short,
      baseSequence: Int,
      records: Vector[Record],
      /** Byte position of this batch within its segment (the
        * `batch_byte_offset` of RowSchema). */
      byteOffset: Int) {
    def compressionType: Int = attributes & 0x07
    def timestampType: Int = (attributes >> 3) & 1
  }

  val HeaderSize = 61 // baseOffset..recordCount inclusive
  val CodecNone = BatchCompression.None
  val CodecGzip = BatchCompression.Gzip
  val CodecSnappy = BatchCompression.Snappy
  val CodecLz4 = BatchCompression.Lz4
  val CodecZstd = BatchCompression.Zstd

  /** The FIRST batch's compression codec id, validated the way the
    * reference's archival predicate validates it
    * (`SegmentCompressionChecker.java:37-53`: first batch + `ensureValid`,
    * i.e. magic/CRC) — WITHOUT parsing records or the rest of the segment,
    * so a multi-GiB segment costs one header read + one CRC pass of its
    * first batch. None when the payload isn't valid Kafka v2 wire (opaque
    * payloads fall back to the caller's content heuristic). */
  def firstBatchCompressionType(segment: Array[Byte]): Option[Int] = {
    if (segment.length < 12 + HeaderSize - 12) return None
    try {
      val buf = ByteBuffer.wrap(segment)
      buf.getLong() // baseOffset
      val batchLength = buf.getInt()
      if (batchLength < HeaderSize - 12 || 12 + batchLength > segment.length) return None
      buf.getInt() // partitionLeaderEpoch
      if (buf.get() != 2) return None // magic: v2 only
      val crc = buf.getInt()
      val crcStart = buf.position()
      val c = new CRC32C
      c.update(segment, crcStart, 12 + batchLength - crcStart)
      if (crc != c.getValue.toInt) return None
      Some(buf.getShort() & 0x07)
    } catch { case _: Exception => None }
  }

  /** Parse all batches of a segment (I1's outer loop). */
  def parseSegment(segment: Array[Byte]): Vector[Batch] = {
    val out = Vector.newBuilder[Batch]
    var pos = 0
    while (pos + 12 <= segment.length) {
      val buf = ByteBuffer.wrap(segment, pos, segment.length - pos)
      val baseOffset = buf.getLong()
      val batchLength = buf.getInt()
      val total = 12 + batchLength
      require(pos + total <= segment.length, s"truncated batch at $pos")
      out += parseBatch(segment, pos, baseOffset, batchLength)
      pos += total
    }
    out.result()
  }

  private def parseBatch(segment: Array[Byte], start: Int, baseOffset: Long, batchLength: Int): Batch = {
    val buf = ByteBuffer.wrap(segment, start + 12, batchLength)
    val partitionLeaderEpoch = buf.getInt()
    val magic = buf.get()
    require(magic == 2, s"unsupported magic $magic (only v2 batches)")
    val crc = buf.getInt()
    val crcStart = buf.position()
    val computed = {
      val c = new CRC32C
      c.update(segment, start + 12 + (crcStart - (start + 12)), batchLength - (crcStart - (start + 12)))
      c.getValue.toInt
    }
    require(crc == computed, f"CRC mismatch: stored 0x$crc%08x computed 0x$computed%08x")
    val attributes = buf.getShort()
    val lastOffsetDelta = buf.getInt()
    val baseTimestamp = buf.getLong()
    val maxTimestamp = buf.getLong()
    val producerId = buf.getLong()
    val producerEpoch = buf.getShort()
    val baseSequence = buf.getInt()
    val recordCount = buf.getInt()
    val payload = new Array[Byte](buf.remaining())
    buf.get(payload)
    val body = BatchCompression.decompress(attributes & 0x07, payload)
    val rbuf = ByteBuffer.wrap(body)
    val records = Vector.tabulate(recordCount)(_ => parseRecord(rbuf))
    Batch(baseOffset, partitionLeaderEpoch, magic, attributes, lastOffsetDelta,
      baseTimestamp, maxTimestamp, producerId, producerEpoch, baseSequence, records, start)
  }

  private def parseRecord(buf: ByteBuffer): Record = {
    val length = Varint.readVarint(buf)
    val end = buf.position() + length
    /* attributes (unused in v2) */ buf.get()
    val timestampDelta = Varint.readVarlong(buf)
    val offsetDelta = Varint.readVarint(buf)
    def readBytes(): Array[Byte] = {
      val len = Varint.readVarint(buf)
      if (len < 0) null
      else { val b = new Array[Byte](len); buf.get(b); b }
    }
    val key = readBytes()
    val value = readBytes()
    val headerCount = Varint.readVarint(buf)
    val headers = Vector.tabulate(headerCount) { _ =>
      val klen = Varint.readVarint(buf)
      val kb = new Array[Byte](klen); buf.get(kb)
      val v = readBytes()
      Header(new String(kb, "UTF-8"), v)
    }
    require(buf.position() == end, s"record length mismatch: at ${buf.position()}, expected $end")
    Record(offsetDelta, timestampDelta, key, value, headers)
  }

  /** Serialize one batch (I9): lengths and CRC recomputed; all other header
    * fields taken from the batch metadata so a parse→write round trip is
    * byte-identical for codec `none` (gzip re-deflation may differ in
    * stream bytes while decoding identically). */
  def writeBatch(b: Batch): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    b.records.foreach(r => writeRecord(r, body))
    val payload = BatchCompression.compress(b.attributes & 0x07, body.toByteArray)
    // attributes..recordCount (40 bytes) + payload, CRC computed over it
    val afterCrc = ByteBuffer.allocate(40 + payload.length)
    afterCrc.putShort(b.attributes)
    afterCrc.putInt(b.lastOffsetDelta)
    afterCrc.putLong(b.baseTimestamp)
    afterCrc.putLong(b.maxTimestamp)
    afterCrc.putLong(b.producerId)
    afterCrc.putShort(b.producerEpoch)
    afterCrc.putInt(b.baseSequence)
    afterCrc.putInt(b.records.size)
    afterCrc.put(payload)
    val crcBytes = afterCrc.array()
    val crc = new CRC32C
    crc.update(crcBytes)

    val batchLength = 4 + 1 + 4 + crcBytes.length // leaderEpoch + magic + crc + rest
    val out = ByteBuffer.allocate(12 + batchLength)
    out.putLong(b.baseOffset)
    out.putInt(batchLength)
    out.putInt(b.partitionLeaderEpoch)
    out.put(b.magic)
    out.putInt(crc.getValue.toInt)
    out.put(crcBytes)
    out.array()
  }

  private def writeRecord(r: Record, out: ByteArrayOutputStream): Unit = {
    val body = new ByteArrayOutputStream()
    body.write(0) // record attributes
    Varint.writeVarlong(r.timestampDelta, body)
    Varint.writeVarint(r.offsetDelta, body)
    def writeBytes(b: Array[Byte]): Unit =
      if (b == null) Varint.writeVarint(-1, body)
      else { Varint.writeVarint(b.length, body); body.write(b, 0, b.length) }
    writeBytes(r.key)
    writeBytes(r.value)
    Varint.writeVarint(r.headers.size, body)
    r.headers.foreach { h =>
      val kb = h.key.getBytes("UTF-8")
      Varint.writeVarint(kb.length, body)
      body.write(kb, 0, kb.length)
      writeBytes(h.value)
    }
    Varint.writeVarint(body.size(), out)
    body.writeTo(out)
  }

  /** Build a well-formed batch from records (test/fixture construction). */
  def buildBatch(
      baseOffset: Long,
      baseTimestamp: Long,
      records: Seq[(Array[Byte], Array[Byte], Seq[Header])],
      producerId: Long = -1L,
      producerEpoch: Short = -1,
      baseSequence: Int = -1,
      partitionLeaderEpoch: Int = 0,
      compression: Int = CodecNone,
      timestampDeltaPerRecord: Long = 1L): Batch = {
    val recs = records.zipWithIndex.map { case ((k, v, hs), i) =>
      Record(i, i * timestampDeltaPerRecord, k, v, hs.toVector)
    }.toVector
    val maxTs = baseTimestamp + (records.size - 1).max(0) * timestampDeltaPerRecord
    Batch(baseOffset, partitionLeaderEpoch, 2, compression.toShort,
      (records.size - 1).max(0), baseTimestamp, maxTs, producerId, producerEpoch,
      baseSequence, recs, 0)
  }

  def gzip(b: Array[Byte]): Array[Byte] = BatchCompression.compress(CodecGzip, b)

  def gunzip(b: Array[Byte]): Array[Byte] = BatchCompression.decompress(CodecGzip, b)
}
