package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.records.{RecordTable, SegmentToRows}

/** The record-layer write path (SURVEY §3.3) as a stream: watch a directory
  * of Kafka `.log` segment files, explode each into RowSchema rows, append
  * to the topic's [[RecordTable]] — per-segment atomic (manifest-rename
  * commit inside `appendSegment`), so at-least-once delivery from the file
  * source converges to exactly-once table state on replay (a re-appended
  * segment overwrites its own data file + manifest idempotently).
  */
object TopicIngestStream {

  def start(
      spark: SparkSession,
      watchDir: String,
      checkpointDir: String,
      tableDir: String,
      partition: Int = 0,
      maxFilesPerTrigger: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .format("binaryFile")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "*.log")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(watchDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val table = new RecordTable(tableDir)
        // ONLY paths reach the driver (strings — bounded by
        // maxFilesPerTrigger). Segment BYTES are read, wire-parsed and
        // written to parquet executor-side per segment
        // (SegmentToRows.fromSegmentFile opens the exact path inside the
        // append job — no glob expansion, no content column); at the
        // reference's GiB segment sizes the old collect() of `content`
        // was a driver OOM. The per-segment append loop stays serial on
        // purpose: appendSegment's read-merge-commit of schema + manifest
        // list is the single-writer commit point (SURVEY §7 hard
        // point 3) — the heavy work inside each iteration (parse +
        // parquet write) is already a distributed job, the serial part is
        // two file renames.
        batch.select("path").collect().map(_.getString(0)).sorted.foreach { path =>
          val segName = path.substring(path.lastIndexOf('/') + 1).stripSuffix(".log")
          val rows = SegmentToRows.fromSegmentFile(batch.sparkSession, path, partition)
          table.appendSegment(batch.sparkSession, segName, rows)
        }
        ()
      }
      .start()
  }
}
