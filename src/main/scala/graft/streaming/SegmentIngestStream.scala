package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{SegmentJobConfig, SegmentUploadJob}

/** SURVEY §2.6 streaming semantics — the broker-event-driven tier-out as a
  * Structured Streaming pipeline: a file source of segment files →
  * `foreachBatch` performing the per-segment atomic 3-object commit.
  *
  * Delivery semantics mirror the reference: at-least-once per segment with
  * idempotent-atomic commits (manifest-last + compensating delete), so
  * replays after failure converge. Rate limiting = `maxFilesPerTrigger`
  * (the streaming face of the reference's upload rate limit, T8).
  */
object SegmentIngestStream {

  def start(
      spark: SparkSession,
      watchDir: String,
      checkpointDir: String,
      cfg: SegmentJobConfig,
      maxFilesPerTrigger: Int = 16,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val stream = spark.readStream
      .format("binaryFile")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(watchDir)
      .select(col("path"), col("content"))
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val results = SegmentUploadJob.uploadDF(batch.sparkSession, batch, cfg)
        val failed = results.filter(!col("success")).count()
        if (failed > 0)
          throw new IllegalStateException(s"batch $batchId: $failed segment uploads failed (will retry)")
        ()
      }
      .start()
  }
}
