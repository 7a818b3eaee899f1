package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.records._

/** Usage example / smoke CLI for the record layer (SURVEY §3.3): build Kafka
  * v2 segments (registry-framed Avro values), explode to RowSchema rows,
  * append to a RecordTable, read back with file pruning + pushdown, decode
  * values via the local schema registry, regroup + re-serialize and assert
  * byte-identity with the original segments.
  */
object RecordPipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.FastLocalDir.configure(SparkSession.builder())
      .master("local[4]")
      .appName("record-pipeline-demo")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Local schema registry with one value schema.
    val regDir = java.nio.file.Files.createTempDirectory("graft-reg").toString
    val registry = SchemaRegistry(regDir)
    registry.register(1,
      """{"type":"record","name":"evt","fields":[
        |{"name":"user","type":"string"},{"name":"score","type":"long"}]}""".stripMargin)

    // Build two producer-style segments whose values are registry-framed.
    import KafkaWireCodec._
    import org.apache.spark.sql.Row
    def segment(from: Long, count: Int): (Array[Byte], Long) = {
      val out = new java.io.ByteArrayOutputStream()
      var off = from
      while (off < from + count) {
        val n = (off % 5 + 1).toInt
        val recs = (0 until n).map { i =>
          val value = registry.encode(1, Row(s"user-${(off + i) % 7}", (off + i) * 10))
          (s"key-${off + i}".getBytes, value, Seq.empty[Header])
        }
        out.write(writeBatch(buildBatch(off, 1700000000000L + off, recs,
          producerId = 3L, producerEpoch = 1, baseSequence = off.toInt)))
        off += n
      }
      (out.toByteArray, off)
    }
    val (seg1, next) = segment(0, 40)
    val (seg2, end) = segment(next, 40)
    println(s"segments: 2, records: $end, bytes: ${seg1.length + seg2.length}")

    // Explode + append.
    val tableDir = java.nio.file.Files.createTempDirectory("graft-topic").toString
    val table = new RecordTable(tableDir)
    val m1 = table.appendSegment(spark, "seg-a", SegmentToRows.fromSegmentBytes(spark, Seq((0, seg1))))
    val m2 = table.appendSegment(spark, "seg-b", SegmentToRows.fromSegmentBytes(spark, Seq((0, seg2))))
    println(s"manifests: seg-a offsets [${m1.minOffset},${m1.maxOffset}], seg-b [${m2.minOffset},${m2.maxOffset}]")

    // Pruned read: start inside segment 2 → only its file is scanned.
    val pruned = table.read(spark, startOffset = m2.minOffset)
    val files = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    println(s"pruned read from ${m2.minOffset}: rows=${pruned.count()}, files=${files.length} (${files.map(_.split('/').last).mkString})")

    // Registry decode as a typed SQL view: value_raw → (user, score).
    val reg = registry
    val decodeUdf = udf((v: Array[Byte]) =>
      reg.decode(v).map { case (_, r) => (r.asInstanceOf[Row].getString(0), r.asInstanceOf[Row].getLong(1)) })
    val typed = table.read(spark)
      .withColumn("decoded", decodeUdf(col("value_raw")))
      .selectExpr("kafka.offset AS offset", "decoded._1 AS user", "decoded._2 AS score")
    typed.createOrReplaceTempView("topic_demo")
    val top = spark.sql(
      "SELECT user, count(*) AS n, sum(score) AS total FROM topic_demo GROUP BY user ORDER BY total DESC LIMIT 3")
    println("spark.sql over decoded topic:")
    top.collect().foreach(r => println(s"  ${r.getString(0)} n=${r.getLong(1)} total=${r.getLong(2)}"))

    // Streaming read of the topic table: each data file a micro-batch.
    {
      import org.apache.spark.sql.streaming.Trigger
      val q = table.readStream(spark, maxFilesPerTrigger = 1)
        .writeStream.format("memory").queryName("topic_stream")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val n = spark.sql("SELECT count(*) FROM topic_stream").head().getLong(0)
      println(s"streaming read: $n rows over ${q.recentProgress.length} micro-batches")
    }

    // Re-serialize and compare byte-for-byte.
    val rebuilt = BatchReserializer.toWireBatches(spark, table.read(spark))
      .orderBy(col("base_offset")).collect().flatMap(_.getAs[Array[Byte]]("wire_bytes"))
    val original = seg1 ++ seg2
    println(s"re-serialized byte-identical: ${java.util.Arrays.equals(rebuilt, original)} (${rebuilt.length} bytes)")

    // Probe: corrupt one stored CRC byte → parse must reject.
    val tampered = original.clone()
    tampered(40) = (tampered(40) ^ 0x1).toByte
    val rejected = scala.util.Try(KafkaWireCodec.parseSegment(tampered)).isFailure
    println(s"tampered segment rejected: $rejected")
    spark.stop()
  }
}
