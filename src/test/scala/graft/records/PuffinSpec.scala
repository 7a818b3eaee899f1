package graft.records

import org.scalatest.funsuite.AnyFunSuite

/** S11 — the puffin binary sidecar, validated against the PUBLIC Apache
  * Iceberg Puffin spec invariants (magic at head, before-footer-payload,
  * and tail; little-endian payload size; zero flags; absolute blob
  * offsets), plus the reference's blob-type layout
  * (`iceberg/manifest/BlobTypes.java`, `SegmentManifestWriter.java`). */
class PuffinSpec extends AnyFunSuite {

  private val blobA = Puffin.Blob(SegmentManifestPuffin.OffsetIndex, Seq.empty, 7L, 1L,
    Array.tabulate[Byte](64)(i => i.toByte))
  private val blobB = Puffin.Blob(SegmentManifestPuffin.FileList, Seq(1, 2), 7L, 1L,
    """[{"location":"data/s.parquet"}]""".getBytes("UTF-8"))

  test("write/read round trip: metadata, offsets, payload bytes") {
    val file = Puffin.write(Seq(blobA, blobB), "spec")
    val meta = Puffin.readMetadata(file)
    assert(meta.blobs.map(_.blobType) ==
      Vector(SegmentManifestPuffin.OffsetIndex, SegmentManifestPuffin.FileList))
    assert(meta.properties("created-by") == "spec")
    val a = meta.blobs(0)
    assert(a.snapshotId == 7L && a.sequenceNumber == 1L && a.length == 64)
    assert(Puffin.readBlob(file, a).toSeq == blobA.data.toSeq)
    assert(Puffin.readBlob(file, meta.blobs(1)).toSeq == blobB.data.toSeq)
    assert(meta.blobs(1).fields == Vector(1, 2))
  }

  test("spec invariants: magic at head and both footer positions, LE size, zero flags") {
    val file = Puffin.write(Seq(blobA), "spec")
    val magic = Seq[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"
    assert(file.take(4).toSeq == magic, "leading magic")
    assert(file.takeRight(4).toSeq == magic, "trailing magic")
    assert(file.slice(file.length - 8, file.length - 4).toSeq == Seq[Byte](0, 0, 0, 0), "flags")
    val size = java.nio.ByteBuffer.wrap(file, file.length - 12, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
    assert(file.slice(file.length - 12 - size - 4, file.length - 12 - size).toSeq == magic,
      "footer-start magic")
    // first blob payload begins right after the leading magic
    assert(Puffin.readMetadata(file).blobs.head.offset == 4)
  }

  test("duplicate blob type rejected (SegmentManifestWriter.java:85-88 contract)") {
    val e = intercept[IllegalArgumentException](Puffin.write(Seq(blobA, blobA), "spec"))
    assert(e.getMessage.contains("already written"))
  }

  test("corrupt files fail loudly") {
    val file = Puffin.write(Seq(blobA), "spec")
    intercept[IllegalArgumentException](Puffin.readMetadata(file.drop(1)))
    val clipped = file.dropRight(1)
    intercept[IllegalArgumentException](Puffin.readMetadata(clipped))
  }

  test("no-blob corner: file-list-only statistics still parse") {
    val file = SegmentManifestPuffin.write(1L, 0L, SegmentManifestPuffin.fileListJson(Seq.empty))
    val meta = Puffin.readMetadata(file)
    assert(meta.blobs.map(_.blobType) == Vector(SegmentManifestPuffin.FileList))
  }

  test("segment statistics layout: indexes + file-list, reference blob-type strings") {
    val file = SegmentManifestPuffin.write(
      snapshotId = 100L, sequenceNumber = 3L,
      fileList = SegmentManifestPuffin.fileListJson(
        Seq(("data/seg.parquet", Some(1), None, 100L, 0L))),
      indexes = Map(
        SegmentManifestPuffin.OffsetIndex -> Array[Byte](1, 2),
        SegmentManifestPuffin.TimestampIndex -> Array[Byte](3, 4)))
    val meta = Puffin.readMetadata(file)
    assert(meta.blobs.map(_.blobType).toSet == Set(
      SegmentManifestPuffin.OffsetIndex, SegmentManifestPuffin.TimestampIndex,
      SegmentManifestPuffin.FileList))
    val fl = meta.blobs.find(_.blobType == SegmentManifestPuffin.FileList).get
    val json = new String(Puffin.readBlob(file, fl), "UTF-8")
    assert(json.contains(""""location":"data/seg.parquet""""))
    assert(json.contains(""""keySchemaId":1"""))
    assert(json.contains(""""valueSchemaId":null"""))
    assert(json.contains(""""startOffset":100"""))
  }
}

/** appendSegment writes the puffin sidecar before the commit point; it
  * reads back with the segment's file-list metadata. */
class PuffinTableSidecarSpec extends graft.testkit.SparkSpec {
  test("record table appends carry a readable puffin statistics sidecar") {
    val tableDir = java.nio.file.Files.createTempDirectory("graft-puffin-table").toString
    val table = new RecordTable(tableDir)
    val out = new java.io.ByteArrayOutputStream()
    out.write(KafkaWireCodec.writeBatch(KafkaWireCodec.buildBatch(10L, 30L,
      (0 until 4).map(i => (s"k$i".getBytes, s"v$i".getBytes, Seq.empty)))))
    table.appendSegment(spark, "seg-a", SegmentToRows.fromSegmentBytes(spark, Seq((0, out.toByteArray))))
    val (meta, bytes) = table.readPuffin("seg-a").getOrElse(fail("puffin sidecar missing"))
    assert(meta.properties("created-by") == SegmentManifestPuffin.CreatedBy)
    val fl = meta.blobs.find(_.blobType == SegmentManifestPuffin.FileList).get
    assert(fl.snapshotId == 10L)
    val json = new String(Puffin.readBlob(bytes, fl), "UTF-8")
    assert(json.contains(""""location":"data/seg-a.parquet""""))
    assert(json.contains(""""startOffset":10"""))
    assert(table.readPuffin("nope").isEmpty)
  }
}
