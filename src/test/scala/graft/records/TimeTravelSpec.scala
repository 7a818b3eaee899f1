package graft.records

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.testkit.SparkSpec
import KafkaWireCodec._

/** Snapshot history + time travel (the Iceberg snapshot-log twin): every
  * commit appends a snapshot, readAsOf reconstructs any committed state,
  * compaction expires snapshots pinned to retired files. */
class TimeTravelSpec extends SparkSpec {

  private def kb(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def segment(fromOffset: Long, nRecords: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var off = fromOffset
    while (off - fromOffset < nRecords) {
      val n = math.min(5, fromOffset + nRecords - off).toInt
      val recs = (0 until n).map(i => (kb(s"k${off + i}"), kb(s"v${off + i}"), Seq.empty[Header]))
      out.write(writeBatch(buildBatch(off, 1700000000000L + off, recs)))
      off += n
    }
    out.toByteArray
  }

  test("readAsOf reconstructs every committed state; latest equals read()") {
    val dir = Files.createTempDirectory("graft-tt").toString
    val table = new RecordTable(dir)
    val metas = Seq(0L, 20L, 40L).map { base =>
      table.appendSegment(spark, s"seg-$base",
        SegmentToRows.fromSegmentBytes(spark, Seq((0, segment(base, 20)))))
    }
    val snaps = table.snapshots()
    assert(snaps.map(_.version) == Vector(1L, 2L, 3L))
    assert(snaps.map(_.manifests.length) == Vector(1, 2, 3))

    // v1 = only the first segment
    val v1 = table.readAsOf(spark, 1)
    assert(v1.count() == 20 &&
      v1.agg(max(col("kafka.offset"))).head().getLong(0) == metas.head.maxOffset)
    // v2 = first two
    assert(table.readAsOf(spark, 2).count() == 40)
    // latest snapshot ≡ current read
    val cur = table.read(spark).select("kafka.offset").collect().map(_.getLong(0)).sorted
    val v3 = table.readAsOf(spark, 3).select("kafka.offset").collect().map(_.getLong(0)).sorted
    assert(v3.sameElements(cur))
    // pruning composes with time travel
    assert(table.readAsOf(spark, 2, startOffset = 20).count() == 20)

    // unknown version is an explicit error
    val e = intercept[IllegalArgumentException](table.readAsOf(spark, 99))
    assert(e.getMessage.contains("no snapshot 99"))
  }

  test("readChanges returns exactly the rows appended between two snapshots") {
    val dir = Files.createTempDirectory("graft-tt3").toString
    val table = new RecordTable(dir)
    Seq(0L, 20L, 40L).foreach { base =>
      table.appendSegment(spark, s"seg-$base",
        SegmentToRows.fromSegmentBytes(spark, Seq((0, segment(base, 20)))))
    }
    // delta v1→v3 = segments 2 and 3
    val delta = table.readChanges(spark, 1, 3)
    val offs = delta.select("kafka.offset").collect().map(_.getLong(0)).sorted
    assert(offs.head == 20 && offs.last == 59 && offs.length == 40)
    // from-the-beginning delta = full table; empty delta for v == v
    assert(table.readChanges(spark, 0, 3).count() == 60)
    assert(table.readChanges(spark, 2, 2).count() == 0)
    val e = intercept[IllegalArgumentException](table.readChanges(spark, 1, 9))
    assert(e.getMessage.contains("no snapshot 9"))
  }

  test("rollback restores an old state as a NEW commit; data files untouched") {
    val dir = Files.createTempDirectory("graft-tt4").toString
    val table = new RecordTable(dir)
    Seq(0L, 20L, 40L).foreach { base =>
      table.appendSegment(spark, s"seg-$base",
        SegmentToRows.fromSegmentBytes(spark, Seq((0, segment(base, 20)))))
    }
    assert(table.read(spark).count() == 60)
    table.rollback(1)
    // current state = snapshot 1's 20 rows; history gained version 4
    assert(table.read(spark).count() == 20)
    assert(table.snapshots().map(_.version) == Vector(1L, 2L, 3L, 4L))
    assert(table.snapshots().last.manifests == table.snapshots().head.manifests)
    // every snapshot carries its committed schema (time travel reads it)
    assert(table.snapshots().forall(_.schema.isDefined))
    // roll FORWARD again (rollback of the rollback)
    table.rollback(3)
    assert(table.read(spark).count() == 60)
    // appends after rollback keep committing on top
    table.appendSegment(spark, "seg-60",
      SegmentToRows.fromSegmentBytes(spark, Seq((0, segment(60, 10)))))
    assert(table.read(spark).count() == 70)
    val e = intercept[IllegalArgumentException](table.rollback(42))
    assert(e.getMessage.contains("no snapshot 42"))
    // incremental reads across a rollback are refused, not silently wrong:
    // v2 = {seg-0, seg-20} but v4 (the rollback commit) = {seg-0} — B gone
    val e2 = intercept[IllegalStateException](table.readChanges(spark, 2, 4))
    assert(e2.getMessage.contains("not append-only"))
    // while spans with no removals still diff fine (v1 -> v6)
    assert(table.readChanges(spark, 1, 6).count() == 50)
  }

  test("compaction expires snapshots pinned to retired files; post-compact snapshot readable") {
    val dir = Files.createTempDirectory("graft-tt2").toString
    val table = new RecordTable(dir)
    Seq(0L, 20L, 40L).foreach { base =>
      table.appendSegment(spark, s"seg-$base",
        SegmentToRows.fromSegmentBytes(spark, Seq((0, segment(base, 20)))))
    }
    val compacted = table.compact(spark, targetBytes = 1L << 20)
    assert(compacted.nonEmpty)
    val left = table.snapshots()
    // pre-compaction snapshots referenced now-GC'd manifests → expired;
    // the compaction commit's own snapshot remains and reads fine
    assert(left.nonEmpty && left.forall(_.version >= 4))
    val latest = table.readAsOf(spark, left.last.version)
    assert(latest.count() == 60)
    assert(table.read(spark).count() == 60)
  }
}
