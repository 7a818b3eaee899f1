package graft.records

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.testkit.SparkSpec
import KafkaWireCodec._

/** Small-file compaction: per-segment appends become one bin-packed file,
  * reads stay identical, the manifest-list swap is the commit point, and
  * retired files are GC'd. */
class CompactionSpec extends SparkSpec {

  private def kb(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def segment(fromOffset: Long, records: Int): Array[Byte] = {
    val rnd = new java.util.Random(fromOffset)
    val out = new java.io.ByteArrayOutputStream()
    var off = fromOffset
    while (off - fromOffset < records) {
      val v = new Array[Byte](50); rnd.nextBytes(v)
      out.write(writeBatch(buildBatch(off, 1700000000000L + off * 5,
        Seq((kb(s"k-$off"), v, Seq.empty)),
        producerId = 9L, producerEpoch = 1, baseSequence = off.toInt)))
      off += 1
    }
    out.toByteArray
  }

  private def buildTable(nSegments: Int, recsPer: Int): (RecordTable, String) = {
    val dir = Files.createTempDirectory("graft-compact").toString
    val table = new RecordTable(dir)
    (0 until nSegments).foreach { i =>
      val from = i.toLong * recsPer
      val rows = SegmentToRows.fromSegmentBytes(spark, Seq((0, segment(from, recsPer))))
      table.appendSegment(spark, f"seg-$from%05d", rows)
    }
    (table, dir)
  }

  test("compact merges small files; reads are row-identical; old files GC'd") {
    val (table, dir) = buildTable(6, 10)
    val before = table.read(spark).select(col("kafka.offset"), col("key_raw"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).sortBy(_._1).toSeq
    assert(table.listManifests().size == 6)

    val newMetas = table.compact(spark, targetBytes = 1L << 30)
    assert(newMetas.size == 1)
    assert(newMetas.head.rowCount == 60 && newMetas.head.minOffset == 0 && newMetas.head.maxOffset == 59)
    assert(table.listManifests().size == 1)

    val after = table.read(spark).select(col("kafka.offset"), col("key_raw"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).sortBy(_._1).toSeq
    assert(after == before, "compaction must not change table contents")

    // old data files + manifests physically gone; exactly one data file left
    val dataFiles = Files.list(Paths.get(dir, "data")).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    dataFiles.forEachRemaining(p => names += p.getFileName.toString)
    assert(names.toList == List("compact-0-59.parquet"), names.toList.toString)
  }

  test("second compact is a no-op; appends after compaction still commit") {
    val (table, _) = buildTable(4, 5)
    assert(table.compact(spark, targetBytes = 1L << 30).size == 1)
    assert(table.compact(spark, targetBytes = 1L << 30).isEmpty, "single file -> nothing to do")

    val rows = SegmentToRows.fromSegmentBytes(spark, Seq((0, segment(20, 5))))
    table.appendSegment(spark, "seg-00020", rows)
    assert(table.listManifests().size == 2)
    assert(table.read(spark).count() == 25)
    // pruning still works across compacted + fresh files
    val pruned = table.read(spark, startOffset = 20)
    val files = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.length == 1 && files.head.contains("seg-00020"))
  }

  test("compaction maintains the puffin-sidecar invariant: new metas get sidecars, retired ones GC'd") {
    val (table, _) = buildTable(nSegments = 4, recsPer = 20)
    val before = table.listManifests()
    before.foreach(m => assert(table.readPuffin(m.segment).isDefined, s"${m.segment} sidecar pre-compact"))
    val newMetas = table.compact(spark, targetBytes = 1L << 20)
    assert(newMetas.nonEmpty)
    newMetas.foreach { m =>
      val (meta, _) = table.readPuffin(m.segment).getOrElse(fail(s"${m.segment} has no sidecar"))
      assert(meta.blobs.exists(_.blobType == SegmentManifestPuffin.FileList))
    }
    before.foreach(m => assert(table.readPuffin(m.segment).isEmpty,
      s"retired ${m.segment} sidecar must be GC'd"))
  }

  test("target size splits into multiple packed files") {
    val (table, dir) = buildTable(6, 10)
    val firstSize = Files.size(Paths.get(dir).resolve(table.listManifests().head.file))
    val metas = table.compact(spark, targetBytes = firstSize * 3)
    assert(metas.size >= 2, s"expected multiple packed files, got ${metas.size}")
    assert(table.read(spark).count() == 60, "every row survives, compacted or not")
  }
}
