package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.records._
import graft.records.KafkaWireCodec._

/** Usage example / smoke CLI for the TABLE-FORMAT surface of RecordTable —
  * the full lifecycle a lakehouse table sees, end-to-end on one store:
  * append (snapshot commits) → copy-on-write MERGE (upsert) → deleteWhere
  * (COW row delete) → time travel (`readAsOf`) + incremental reads
  * (`readChanges`) → compaction (with snapshot expiry). Asserts the state
  * after every step, so it doubles as a living spec of the commit
  * protocol's reader-visible guarantees. */
object TableFormatDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.FastLocalDir.configure(SparkSession.builder())
      .master("local[4]")
      .appName("table-format-demo")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def kb(s: String) = s.getBytes("UTF-8")

    val dir = java.nio.file.Files.createTempDirectory("graft-table-demo").toString
    val table = new RecordTable(dir)

    def rowsOf(base: Long, recs: Seq[(String, String)]) = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(writeBatch(buildBatch(base, 1700000000000L + base,
        recs.map { case (k, v) => (kb(k), kb(v), Seq.empty[Header]) })))
      SegmentToRows.fromSegmentBytes(spark, Seq((0, out.toByteArray)))
    }
    def state(): Map[String, String] = table.read(spark)
      .selectExpr("CAST(key_raw AS STRING) AS k", "CAST(value_raw AS STRING) AS v")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    // 1. two appended segments = two snapshots
    table.appendSegment(spark, "seg-a", rowsOf(0L, Seq("a" -> "1", "b" -> "1")))
    table.appendSegment(spark, "seg-b", rowsOf(10L, Seq("c" -> "1", "d" -> "1")))
    val vAfterAppends = table.snapshots().size
    assert(state() == Map("a" -> "1", "b" -> "1", "c" -> "1", "d" -> "1"))
    println(s"[demo] appends committed, snapshot version $vAfterAppends")

    // 2. time travel across the append history: version 1 predates seg-b
    val v1 = table.readAsOf(spark, vAfterAppends - 1)
      .selectExpr("CAST(key_raw AS STRING) AS k").collect().map(_.getString(0)).toSet
    assert(v1 == Set("a", "b"), s"v1 = $v1")
    println(s"[demo] readAsOf(${vAfterAppends - 1}): ${v1.mkString(",")} (pre-seg-b)")

    // 3. incremental read: exactly seg-b arrived between the versions
    val changes = table.readChanges(spark, vAfterAppends - 1, vAfterAppends)
      .selectExpr("CAST(key_raw AS STRING) AS k").collect().map(_.getString(0)).toSet
    assert(changes == Set("c", "d"), s"changes = $changes")
    println(s"[demo] readChanges: ${changes.mkString(",")}")

    // 4. COW merge: replace b, insert e — one atomic publish
    val (replaced, inserted) =
      table.merge(spark, rowsOf(100L, Seq("b" -> "2", "e" -> "1")), "CAST(key_raw AS STRING)", "merge-1")
    assert(replaced == 1L && inserted == 2L)
    assert(state() == Map("a" -> "1", "b" -> "2", "c" -> "1", "d" -> "1", "e" -> "1"))
    println(s"[demo] merge: replaced=$replaced inserted=$inserted")

    // 5. COW delete: drop c. COW rewrites RETIRE files, which expires the
    // snapshots that referenced them — time travel reaches back only as
    // far as live files allow (the Iceberg expire_snapshots contract).
    val deleted = table.deleteWhere(spark, expr("CAST(key_raw AS STRING) = 'c'"))
    assert(deleted == 1L && !state().contains("c"))
    println(s"[demo] deleteWhere: $deleted row; oldest live snapshot = " +
      table.snapshots().size)

    // 6. compaction bin-packs the small files; state is unchanged
    val before = state()
    table.compact(spark, targetBytes = 1L << 20)
    assert(state() == before)
    assert(table.listManifests().size == 1,
      "the 3 small files (seg-a rewrite, seg-b delete-rewrite, merge-1) should pack into 1")
    println(s"[demo] compacted to ${table.listManifests().size} file; state intact")

    println("[demo] table-format lifecycle OK")
    spark.stop()
  }
}
