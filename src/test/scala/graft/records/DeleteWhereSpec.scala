package graft.records

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.testkit.SparkSpec
import KafkaWireCodec._

/** Copy-on-write row-level delete: file-pruned rewrites, single-rename
  * atomic publish, whole-file retirement, SQL NULL semantics. */
class DeleteWhereSpec extends SparkSpec {

  private def kb(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** Three 20-record segments: offsets 0..19 / 20..39 / 40..59. */
  private def makeTable(): (RecordTable, String) = {
    val dir = Files.createTempDirectory("graft-del").toString
    val table = new RecordTable(dir)
    (0 until 3).foreach { s =>
      val base = s * 20L
      val out = new java.io.ByteArrayOutputStream()
      val recs = (0 until 20).map(i => (kb(s"k${base + i}"), kb(s"v${base + i}"), Seq.empty[Header]))
      out.write(writeBatch(buildBatch(base, 1700000000000L + base, recs)))
      table.appendSegment(spark, f"seg-$base%03d",
        SegmentToRows.fromSegmentBytes(spark, Seq((0, out.toByteArray))))
    }
    (table, dir)
  }

  test("selective delete rewrites only the touched file; untouched files keep identity") {
    val (table, _) = makeTable()
    val before = table.listManifests().map(m => m.segment -> m.file).toMap
    val n = table.deleteWhere(spark, col("kafka.offset").between(25L, 29L))
    assert(n == 5L)
    val after = table.listManifests()
    // segment 0 and 2 files untouched (same identity), segment 1 rewritten
    assert(after.map(_.file).contains(before("seg-000")) && after.map(_.file).contains(before("seg-040")))
    assert(!after.map(_.file).contains(before("seg-020")))
    val offs = table.read(spark).select("kafka.offset").collect().map(_.getLong(0)).toSet
    assert(offs == ((0L until 60L).toSet -- (25L to 29L)))
    // rewritten manifest stats reflect the remaining rows
    val m1 = after.find(_.segment.startsWith("seg-020")).get
    assert(m1.minOffset == 20L && m1.maxOffset == 39L && m1.rowCount == 15L)
  }

  test("a file whose every row matches is retired with no replacement") {
    val (table, _) = makeTable()
    val n = table.deleteWhere(spark, col("kafka.offset") >= 40L)
    assert(n == 20L)
    val after = table.listManifests()
    assert(after.length == 2 && !after.exists(_.segment.contains("seg-040")))
    assert(table.read(spark).count() == 40L)
  }

  test("NULL-predicate rows are kept (SQL DELETE semantics); no-match delete is a no-op commit") {
    val (table, _) = makeTable()
    val versionsBefore = table.snapshots().size
    // predicate NULL for every row (null literal comparison) → deletes nothing
    assert(table.deleteWhere(spark, lit(null).cast("boolean")) == 0L)
    assert(table.snapshots().size == versionsBefore, "no-op delete must not commit a snapshot")
    assert(table.read(spark).count() == 60L)
  }

  test("delete then regroup still yields valid wire batches for remaining rows") {
    val (table, _) = makeTable()
    table.deleteWhere(spark, col("kafka.offset") < 20L)
    val wire = BatchReserializer.toWireBatches(spark, table.read(spark)).collect()
    assert(wire.length == 2)
    val reparsed = wire.flatMap(r => parseSegment(r.getAs[Array[Byte]](1))).flatMap(b => b.records)
    assert(reparsed.length == 40)
  }
}
