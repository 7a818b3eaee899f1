package graft.records

import java.nio.file.Files
import graft.core.BytesRange
import graft.operators.{SegmentJobConfig, SegmentUploadJob}
import graft.records.FormatSelector.{KafkaFormat, RecordsFormat}
import graft.sources.FileSystemStorage
import graft.testkit.SparkSpec

/** R11 proper — mixed-format fleets served byte-identically through
  * [[FormatSelector]], with per-segment fallback by manifest presence
  * (mirrors `InternalRemoteStorageManagerSelector.java:67-91`). */
class FormatSelectorSpec extends SparkSpec {

  private def wireSegment(base: Long, n: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(KafkaWireCodec.writeBatch(KafkaWireCodec.buildBatch(base, base * 7,
      (0 until n).map(i => (s"key-${base + i}".getBytes, s"value-${base + i}".getBytes, Seq.empty)))))
    out.write(KafkaWireCodec.writeBatch(KafkaWireCodec.buildBatch(base + n, base * 7 + n,
      (0 until n).map(i => (s"key-${base + n + i}".getBytes, s"v2-${base + n + i}".getBytes, Seq.empty)))))
    out.toByteArray
  }

  private def fixture(): (SegmentJobConfig, RecordTable, Array[Byte], Array[Byte]) = {
    val store = Files.createTempDirectory("graft-selector-store").toString
    val tableDir = Files.createTempDirectory("graft-selector-table").toString
    val cfg = SegmentJobConfig.withGeneratedKeys(store).copy(chunkSize = 256)
    val segA = wireSegment(0L, 6) // tiered via the kafka path
    val segB = wireSegment(100L, 5) // exploded into the record table
    assert(SegmentUploadJob.uploadOne(FileSystemStorage(store), cfg.ring, None, cfg, "segA", segA).success)
    val table = new RecordTable(tableDir)
    table.appendSegment(spark, "segB", SegmentToRows.fromSegmentBytes(spark, Seq((0, segB))))
    (cfg, table, segA, segB)
  }

  test("mixed fleet: kafka-primary serves tiered segment directly, falls back to records") {
    val (cfg, table, segA, segB) = fixture()
    val gotA = FormatSelector.fetchRange(spark, KafkaFormat, cfg, table, "segA",
      BytesRange(0, segA.length - 1L))
    assert(java.util.Arrays.equals(gotA, segA), "kafka-format segment must be byte-identical")
    val gotB = FormatSelector.fetchRange(spark, KafkaFormat, cfg, table, "segB",
      BytesRange(0, segB.length - 1L))
    assert(java.util.Arrays.equals(gotB, segB),
      "records-format segment must be byte-identical through the fallback")
  }

  test("records-primary reverses the precedence, same bytes") {
    val (cfg, table, segA, segB) = fixture()
    val gotB = FormatSelector.fetchRange(spark, RecordsFormat, cfg, table, "segB",
      BytesRange(0, segB.length - 1L))
    assert(java.util.Arrays.equals(gotB, segB))
    val gotA = FormatSelector.fetchRange(spark, RecordsFormat, cfg, table, "segA",
      BytesRange(0, segA.length - 1L))
    assert(java.util.Arrays.equals(gotA, segA))
  }

  test("sub-ranges route identically (clamped, closed range)") {
    val (cfg, table, segA, segB) = fixture()
    val rA = FormatSelector.fetchRange(spark, KafkaFormat, cfg, table, "segA", BytesRange(10, 49))
    assert(java.util.Arrays.equals(rA, java.util.Arrays.copyOfRange(segA, 10, 50)))
    val rB = FormatSelector.fetchRange(spark, KafkaFormat, cfg, table, "segB", BytesRange(10, 49))
    assert(java.util.Arrays.equals(rB, java.util.Arrays.copyOfRange(segB, 10, 50)))
    // to beyond EOF clamps on both routes
    val clampB = FormatSelector.fetchRange(spark, KafkaFormat, cfg, table, "segB",
      BytesRange(segB.length - 5L, segB.length + 100L))
    assert(java.util.Arrays.equals(clampB, java.util.Arrays.copyOfRange(segB, segB.length - 5, segB.length)))
  }

  test("per-segment records fetch scans ONLY that segment's data file") {
    // Point fetches must not list the whole table: with several segments in
    // the table, the scan behind one segment's fetch reads exactly that
    // segment's data file (readSegment), not the full manifest file list.
    val (_, table, _, _) = fixture()
    val segC = wireSegment(200L, 4)
    table.appendSegment(spark, "segC", SegmentToRows.fromSegmentBytes(spark, Seq((0, segC))))
    val metaB = table.listManifests().find(_.segment == "segB").get
    val files = table.readSegment(spark, metaB).inputFiles
    assert(files.length == 1 && files.head.endsWith(metaB.file),
      s"expected only ${metaB.file}, got ${files.mkString(",")}")
    // and the pruned route still serves byte-identical content
    val gotC = {
      val cfg2 = SegmentJobConfig.withGeneratedKeys(
        Files.createTempDirectory("graft-selector-none").toString)
      FormatSelector.fetchRange(spark, RecordsFormat, cfg2, table, "segC",
        BytesRange(0, segC.length - 1L))
    }
    assert(java.util.Arrays.equals(gotC, segC))
  }

  test("segment in neither format raises not-found carrying the primary miss") {
    val (cfg, table, _, _) = fixture()
    val e = intercept[FormatSelector.RemoteResourceNotFound] {
      FormatSelector.fetchRange(spark, KafkaFormat, cfg, table, "segZ", BytesRange(0, 10))
    }
    assert(e.primaryMiss.format == KafkaFormat)
  }
}
