package graft.operators

import graft.core._
import graft.core.transform._
import graft.sources.{ObjectKey, StorageBackend}

/** T10 + R9 — the Kafka index files' own transform pipeline
  * (`KafkaRemoteStorageManager.java:296-397` write, :486-576 read):
  *
  *   - each of the five indexes (offset, timestamp, producerSnapshot,
  *     leaderEpoch, transaction?) goes through the SAME pipeline as the log
  *     but with chunking disabled (one chunk per index) and — the
  *     reference's deliberate asymmetry — encryption WITHOUT compression
  *     (`transformIndex` :369-374);
  *   - the transformed indexes are concatenated into a single `.indexes`
  *     object; each one's `(position, size)` in that object is a running
  *     sum over the fixed index order (the T10 window);
  *   - fetch reads one index back with a single ranged GET at its recorded
  *     range, then decrypts (no decompression ever).
  */
object IndexTransform {

  /** The five index payloads of a segment (transaction optional). */
  final case class SegmentIndexData(
      offset: Array[Byte],
      timestamp: Array[Byte],
      producerSnapshot: Array[Byte],
      leaderEpoch: Array[Byte],
      transaction: Option[Array[Byte]])

  /** Transform + concatenate; returns the `.indexes` object body and the
    * recorded ranges. Encryption only — never compression. */
  def transform(data: SegmentIndexData, encryptionKey: Option[Array[Byte]], aad: Array[Byte]): (Array[Byte], SegmentIndexes) = {
    def one(payload: Array[Byte]): Array[Byte] =
      encryptionKey match {
        case Some(k) => Transforms.encrypt(payload, k, aad)
        case None => payload
      }
    val parts = Vector(
      "offset" -> one(data.offset),
      "timestamp" -> one(data.timestamp),
      "producerSnapshot" -> one(data.producerSnapshot),
      "leaderEpoch" -> one(data.leaderEpoch)) ++
      data.transaction.map(t => "transaction" -> one(t)).toVector
    // running-sum positions over the fixed order (the T10 window shape)
    var pos = 0
    val ranges = parts.map { case (name, bytes) =>
      val r = name -> SegmentIndex(pos, bytes.length)
      pos += bytes.length
      r
    }.toMap
    val body = new Array[Byte](pos)
    var off = 0
    parts.foreach { case (_, b) => System.arraycopy(b, 0, body, off, b.length); off += b.length }
    val si = SegmentIndexes(
      ranges("offset"), ranges("timestamp"), ranges("producerSnapshot"),
      ranges("leaderEpoch"), ranges.get("transaction"))
    (body, si)
  }

  /** Upload the `.indexes` object for a segment. */
  def upload(storage: StorageBackend, segKey: String, data: SegmentIndexData,
             encryptionKey: Option[Array[Byte]], aad: Array[Byte]): SegmentIndexes = {
    val (body, si) = transform(data, encryptionKey, aad)
    storage.uploadBytes(body, s"$segKey.${ObjectKey.Suffix.Indexes.value}")
    si
  }

  /** Fetch one index back: single ranged GET at the recorded range, decrypt
    * (indexes are never compressed — R9 asymmetry). */
  def fetch(storage: StorageBackend, segKey: String, indexes: SegmentIndexes,
            indexType: String, encryptionKey: Option[Array[Byte]], aad: Array[Byte]): Option[Array[Byte]] =
    indexes(indexType).map { idx =>
      val raw = storage.fetchRangeBytes(s"$segKey.${ObjectKey.Suffix.Indexes.value}", idx.range)
      encryptionKey match {
        case Some(k) => Transforms.decrypt(raw, k, aad)
        case None => raw
      }
    }
}
