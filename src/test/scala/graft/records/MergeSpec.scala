package graft.records

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.testkit.{SparkSpec, WireData}
import KafkaWireCodec._

/** Copy-on-write MERGE (upsert): matched keys leave their files via
  * rewrite, update rows land as one new file, a single rename publishes
  * both; untouched files keep identity; duplicate update keys rejected. */
class MergeSpec extends SparkSpec {

  private def kb(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** Three 20-record segments: offsets 0..19 / 20..39 / 40..59; keys
    * k0..k59, values v0..v59. */
  private def makeTable(): RecordTable = makeTableWithDir()._1

  private def makeTableWithDir(): (RecordTable, String) = {
    val dir = Files.createTempDirectory("graft-merge").toString
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

  /** Update rows at fresh offsets 100.. re-keying k25, k27 (new values)
    * plus a brand-new key k900. */
  private def updateRows() = {
    val out = new java.io.ByteArrayOutputStream()
    val recs = Seq(
      (kb("k25"), kb("v25-new"), Seq.empty[Header]),
      (kb("k27"), kb("v27-new"), Seq.empty[Header]),
      (kb("k900"), kb("v900"), Seq.empty[Header]))
    out.write(writeBatch(buildBatch(100L, 1700000001000L, recs)))
    SegmentToRows.fromSegmentBytes(spark, Seq((0, out.toByteArray)))
  }

  test("merge replaces matched keys, inserts the rest, in ONE visible commit") {
    val table = makeTable()
    val before = table.listManifests().map(m => m.segment -> m.file).toMap
    val (replaced, inserted) =
      table.merge(spark, updateRows(), "CAST(key_raw AS STRING)", "merge-001")
    assert(replaced == 2L && inserted == 3L)

    val after = table.listManifests()
    // only the file holding k25/k27 (seg-020) was rewritten
    assert(after.map(_.file).contains(before("seg-000")))
    assert(after.map(_.file).contains(before("seg-040")))
    assert(!after.map(_.file).contains(before("seg-020")))
    assert(after.exists(_.segment == "merge-001"))

    // table state: 60 - 2 replaced + 3 update rows
    val rows = table.read(spark)
      .selectExpr("CAST(key_raw AS STRING) AS k", "CAST(value_raw AS STRING) AS v")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(table.read(spark).count() == 61L)
    assert(rows("k25") == "v25-new" && rows("k27") == "v27-new" && rows("k900") == "v900")
    assert(rows("k26") == "v26") // neighbors in the rewritten file survive
    // exactly ONE row per merged key — the point of upsert
    val kCounts = table.read(spark).groupBy(expr("CAST(key_raw AS STRING)")).count()
      .filter(col("count") > 1).count()
    assert(kCounts == 0L)
  }

  test("a file whose every row matches is retired with no replacement") {
    val table = makeTable()
    // update ALL of segment 2's keys (offsets 40..59) at fresh offsets
    val out = new java.io.ByteArrayOutputStream()
    val recs = (0 until 20).map(i => (kb(s"k${40 + i}"), kb(s"V${40 + i}"), Seq.empty[Header]))
    out.write(writeBatch(buildBatch(200L, 1700000002000L, recs)))
    val upd = SegmentToRows.fromSegmentBytes(spark, Seq((0, out.toByteArray)))
    val (replaced, inserted) = table.merge(spark, upd, "CAST(key_raw AS STRING)", "merge-002")
    assert(replaced == 20L && inserted == 20L)
    val after = table.listManifests()
    assert(!after.exists(_.segment.startsWith("seg-040")), "fully-matched file retired")
    assert(table.read(spark).count() == 60L)
    val v = table.read(spark).filter(expr("CAST(key_raw AS STRING) = 'k45'"))
      .selectExpr("CAST(value_raw AS STRING)").head().getString(0)
    assert(v == "V45")
  }

  test("duplicate merge keys in the updates are rejected") {
    val table = makeTable()
    val out = new java.io.ByteArrayOutputStream()
    val recs = Seq(
      (kb("k1"), kb("a"), Seq.empty[Header]),
      (kb("k1"), kb("b"), Seq.empty[Header]))
    out.write(writeBatch(buildBatch(300L, 1700000003000L, recs)))
    val upd = SegmentToRows.fromSegmentBytes(spark, Seq((0, out.toByteArray)))
    intercept[IllegalArgumentException](
      table.merge(spark, upd, "CAST(key_raw AS STRING)", "merge-003"))
    assert(table.read(spark).count() == 60L, "failed merge changes nothing")
  }

  test("crash before the list rename is invisible: orphan data/manifest files don't serve") {
    val (table, dir) = makeTableWithDir()
    // simulate a merge that died after staging its rewrite + insert but
    // BEFORE the _manifests.json rename (the single commit point): data
    // file + manifest json exist, list doesn't reference them
    val orphan = java.nio.file.Paths.get(dir, "data", "crashed-merge.parquet")
    val donor = table.listManifests().head
    java.nio.file.Files.copy(java.nio.file.Paths.get(dir).resolve(donor.file), orphan)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "manifests", "crashed-merge.json"),
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, "manifests", s"${donor.segment}.json"))
        .replace(donor.segment, "crashed-merge"))
    // readers see exactly the committed 60 rows; the orphan never serves
    assert(table.read(spark).count() == 60L)
    assert(!table.listManifests().exists(_.segment == "crashed-merge"))
    // and a subsequent REAL merge over the same table commits cleanly
    val (replaced, inserted) =
      table.merge(spark, updateRows(), "CAST(key_raw AS STRING)", "merge-after-crash")
    assert(replaced == 2L && inserted == 3L)
    assert(table.read(spark).count() == 61L)
  }

  test("NULL is one merge key: a null-keyed update replaces the null-keyed row") {
    val table = makeTable()
    // seed a null-keyed record (Kafka allows keyless produces)
    val out0 = new java.io.ByteArrayOutputStream()
    out0.write(writeBatch(buildBatch(500L, 1700000005000L,
      Seq((null, kb("unkeyed-v1"), Seq.empty[Header])))))
    table.appendSegment(spark, "nullseed",
      SegmentToRows.fromSegmentBytes(spark, Seq((0, out0.toByteArray))))
    assert(table.read(spark).count() == 61L)
    // merge another null-keyed record: must REPLACE, not duplicate
    val out1 = new java.io.ByteArrayOutputStream()
    out1.write(writeBatch(buildBatch(600L, 1700000006000L,
      Seq((null, kb("unkeyed-v2"), Seq.empty[Header])))))
    val (replaced, inserted) = table.merge(spark,
      SegmentToRows.fromSegmentBytes(spark, Seq((0, out1.toByteArray))),
      "CAST(key_raw AS STRING)", "merge-null")
    assert(replaced == 1L && inserted == 1L)
    assert(table.read(spark).count() == 61L)
    val v = table.read(spark).filter(col("key_raw").isNull)
      .selectExpr("CAST(value_raw AS STRING)").collect().map(_.getString(0)).toSeq
    assert(v == Seq("unkeyed-v2"))
    // two null-keyed updates in ONE merge are duplicates of the same key
    val out2 = new java.io.ByteArrayOutputStream()
    out2.write(writeBatch(buildBatch(700L, 1700000007000L,
      Seq((null, kb("x"), Seq.empty[Header]), (null, kb("y"), Seq.empty[Header])))))
    intercept[IllegalArgumentException](table.merge(spark,
      SegmentToRows.fromSegmentBytes(spark, Seq((0, out2.toByteArray))),
      "CAST(key_raw AS STRING)", "merge-null2"))
  }

  test("insert-only merge (no matched keys) behaves as an append") {
    val table = makeTable()
    val out = new java.io.ByteArrayOutputStream()
    out.write(writeBatch(buildBatch(400L, 1700000004000L,
      Seq((kb("fresh"), kb("x"), Seq.empty[Header])))))
    val upd = SegmentToRows.fromSegmentBytes(spark, Seq((0, out.toByteArray)))
    val before = table.listManifests().map(_.file).toSet
    val (replaced, inserted) = table.merge(spark, upd, "CAST(key_raw AS STRING)", "merge-004")
    assert(replaced == 0L && inserted == 1L)
    assert(table.listManifests().map(_.file).toSet -- before ==
      Set("data/merge-004.parquet"))
    assert(table.read(spark).count() == 61L)
  }
}
