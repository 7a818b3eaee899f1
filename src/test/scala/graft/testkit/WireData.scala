package graft.testkit

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.records.KafkaWireCodec._
import graft.records.SegmentToRows

/** Shared builder for record-layer specs: (key, value) pairs → one Kafka
  * v2 wire batch at `base` → RowSchema rows (the appendSegment/merge
  * input contract). One definition instead of a copy per suite. */
object WireData {
  def kb(s: String): Array[Byte] = s.getBytes("UTF-8")

  def recordRows(spark: SparkSession, base: Long, recs: Seq[(String, String)]): DataFrame = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(writeBatch(buildBatch(base, 1700000000000L + base,
      recs.map { case (k, v) => (kb(k), kb(v), Seq.empty[Header]) })))
    SegmentToRows.fromSegmentBytes(spark, Seq((0, out.toByteArray)))
  }
}
