package graft.records

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import com.fasterxml.jackson.databind.ObjectMapper

/** From-scratch implementation of the Apache Iceberg PUFFIN file format
  * (public spec: iceberg.apache.org/puffin-spec — "Puffin file format"),
  * the binary sidecar the reference writes its per-segment statistics
  * into (`iceberg/manifest/SegmentManifestWriter.java:41-98` via
  * `org.apache.iceberg.puffin.PuffinWriter`; no Iceberg runtime offline,
  * so the byte layout is produced directly):
  *
  * {{{
  *   Magic Blob₁ Blob₂ ... Blobₙ Footer
  *   Footer = Magic FooterPayload FooterPayloadSize(i32 LE) Flags(4B) Magic
  *   Magic  = 0x50 0x46 0x41 0x31  ("PFA1")
  * }}}
  *
  * FooterPayload is the FileMetadata JSON (`{"blobs":[...],
  * "properties":{...}}`; blob entries carry `type`, `fields`,
  * `snapshot-id`, `sequence-number`, `offset`, `length` — the spec's
  * field names). Flags are all zero = uncompressed footer; blob payloads
  * are written uncompressed (`compression-codec` absent), which a
  * spec-compliant reader (including Iceberg's) accepts.
  */
object Puffin {
  val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte)

  final case class Blob(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      data: Array[Byte])

  final case class BlobMetadata(
      blobType: String,
      fields: Seq[Int],
      snapshotId: Long,
      sequenceNumber: Long,
      offset: Long,
      length: Long)

  final case class FileMetadata(blobs: Vector[BlobMetadata], properties: Map[String, String])

  private val mapper = new ObjectMapper()

  def write(blobs: Seq[Blob], createdBy: String): Array[Byte] = {
    val seen = scala.collection.mutable.Set.empty[String]
    blobs.foreach { b =>
      require(seen.add(b.blobType), s"${b.blobType} blob already written")
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val metas = blobs.map { b =>
      val offset = out.size().toLong
      out.write(b.data)
      BlobMetadata(b.blobType, b.fields, b.snapshotId, b.sequenceNumber, offset, b.data.length.toLong)
    }
    // footer
    out.write(Magic)
    val payloadNode = mapper.createObjectNode()
    val blobsArr = payloadNode.putArray("blobs")
    metas.foreach { m =>
      val n = blobsArr.addObject()
      n.put("type", m.blobType)
      val f = n.putArray("fields")
      m.fields.foreach(f.add)
      n.put("snapshot-id", m.snapshotId)
      n.put("sequence-number", m.sequenceNumber)
      n.put("offset", m.offset)
      n.put("length", m.length)
    }
    payloadNode.putObject("properties").put("created-by", createdBy)
    val payload = mapper.writeValueAsBytes(payloadNode)
    out.write(payload)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(payload.length).array())
    out.write(Array[Byte](0, 0, 0, 0)) // flags: footer uncompressed
    out.write(Magic)
    out.toByteArray
  }

  def readMetadata(file: Array[Byte]): FileMetadata = {
    def magicAt(pos: Int): Boolean =
      pos >= 0 && pos + 4 <= file.length && java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(file, pos, pos + 4), Magic)
    require(magicAt(0), "not a puffin file (no leading magic)")
    require(magicAt(file.length - 4), "corrupt puffin footer (no trailing magic)")
    val flags = java.util.Arrays.copyOfRange(file, file.length - 8, file.length - 4)
    require(flags.forall(_ == 0), "compressed puffin footers not supported")
    val payloadSize = ByteBuffer.wrap(file, file.length - 12, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt()
    val payloadStart = file.length - 12 - payloadSize
    require(magicAt(payloadStart - 4), "corrupt puffin footer (no footer magic)")
    val root = mapper.readTree(new String(file, payloadStart, payloadSize, StandardCharsets.UTF_8))
    val blobs = Vector.newBuilder[BlobMetadata]
    require(root.has("blobs") && root.get("blobs").isArray,
      "corrupt puffin footer (no blobs array)")
    root.get("blobs").forEach { b =>
      val fields = Vector.newBuilder[Int]
      if (b.has("fields")) b.get("fields").forEach(f => fields += f.asInt())
      blobs += BlobMetadata(
        b.get("type").asText(), fields.result(),
        if (b.has("snapshot-id")) b.get("snapshot-id").asLong() else 0L,
        if (b.has("sequence-number")) b.get("sequence-number").asLong() else 0L,
        b.get("offset").asLong(), b.get("length").asLong())
    }
    val props = scala.collection.mutable.Map.empty[String, String]
    if (root.has("properties") && !root.get("properties").isNull)
      root.get("properties").properties().forEach(e => props(e.getKey) = e.getValue.asText())
    FileMetadata(blobs.result(), props.toMap)
  }

  /** Blob extraction with explicit bounds checks — offsets come from the
    * parsed (untrusted) footer JSON, and a silent `.toInt` wrap on a
    * corrupt 2^32-scale offset would slice the wrong bytes instead of
    * failing loudly like every other corrupt-file path here. */
  def readBlob(file: Array[Byte], meta: BlobMetadata): Array[Byte] = {
    require(meta.offset >= 0 && meta.length >= 0 &&
      meta.offset + meta.length <= file.length,
      s"corrupt puffin blob range [${meta.offset}, +${meta.length}) in ${file.length}-byte file")
    java.util.Arrays.copyOfRange(file, meta.offset.toInt, (meta.offset + meta.length).toInt)
  }
}

/** The reference's segment-statistics puffin layout: one blob per Kafka
  * index plus the data-file list (`iceberg/manifest/BlobTypes.java`,
  * `DataFileMetadata.java`). Blob type strings are kept IDENTICAL so a
  * reader of reference-written statistics files and of ours share code. */
object SegmentManifestPuffin {
  val OffsetIndex = "aiven-tiered-storage-offset-index"
  val TimestampIndex = "aiven-tiered-storage-timestamp-index"
  val ProducerSnapshotIndex = "aiven-tiered-storage-producer-snapshot-index"
  val TransactionIndex = "aiven-tiered-storage-transaction-index"
  val LeaderEpochIndex = "aiven-tiered-storage-leader-epoch-index"
  val FileList = "aiven-tiered-storage-file-list"

  val CreatedBy = "graft spark tiered-storage engine"

  private val mapper = new ObjectMapper()

  /** `DataFileMetadata` JSON entries (field names mirror
    * `DataFileMetadata.java:31-45`: location, keySchemaId, valueSchemaId,
    * startOffset, startByteOffset). */
  def fileListJson(files: Seq[(String, Option[Int], Option[Int], Long, Long)]): Array[Byte] = {
    val arr = mapper.createArrayNode()
    files.foreach { case (location, keyId, valueId, startOffset, startByteOffset) =>
      val n = arr.addObject()
      n.put("location", location)
      keyId match { case Some(k) => n.put("keySchemaId", k); case None => n.putNull("keySchemaId") }
      valueId match { case Some(v) => n.put("valueSchemaId", v); case None => n.putNull("valueSchemaId") }
      n.put("startOffset", startOffset)
      n.put("startByteOffset", startByteOffset)
    }
    mapper.writeValueAsBytes(arr)
  }

  def write(
      snapshotId: Long,
      sequenceNumber: Long,
      fileList: Array[Byte],
      indexes: Map[String, Array[Byte]] = Map.empty): Array[Byte] = {
    val blobs = indexes.toSeq.sortBy(_._1).map { case (t, d) =>
      Puffin.Blob(t, Seq.empty, snapshotId, sequenceNumber, d)
    } :+ Puffin.Blob(FileList, Seq.empty, snapshotId, sequenceNumber, fileList)
    Puffin.write(blobs, CreatedBy)
  }
}
