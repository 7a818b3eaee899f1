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
        // segments are few per micro-batch; parse each on the driver-side
        // loop but explode/append through Spark (appendSegment is a job)
        batch.select("path", "content").collect().foreach { row =>
          val path = row.getString(0)
          val segName = path.substring(path.lastIndexOf('/') + 1).stripSuffix(".log")
          val rows = SegmentToRows.fromSegmentBytes(batch.sparkSession,
            Seq((partition, row.getAs[Array[Byte]](1))))
          table.appendSegment(batch.sparkSession, segName, rows)
        }
        ()
      }
      .start()
  }
}
