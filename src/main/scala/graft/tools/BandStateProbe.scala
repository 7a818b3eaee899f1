package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Replica-scale state probe for the bandStats and skyline streaming twins
  * (r11, VERDICT r10 "What's wrong" #4: their scale contracts were pinned
  * only at unit scale — the r9 funnel lesson is that state growth hides
  * until measured at scale, so give them the FUNNELSTATE treatment).
  *
  * Unlike the funnel probe (whose state is ordinary parquet tables), these
  * twins keep state in the streaming STATE STORE, so the probe drives the
  * real `flatMapGroupsWithState` queries over a time-ordered multi-file
  * source and then reads the store itself through Spark's `statestore`
  * data source — the measured rows are exactly what a 1000-executor
  * cluster would hold per task, not a simulation.
  *
  * Reported and asserted:
  *  - bandStats, first micro-batch snapshot: bucket count == the distinct
  *    buckets the first file's events route to (state SPREADS across the
  *    time axis from the first trigger — never one key);
  *  - bandStats, final snapshot: every bucket's buffer ≤ its own + the
  *    previous bucket's resident population (the two-window bound), and
  *    expired buckets were reclaimed by the event-time timeout (final
  *    bucket count < total distinct hours once the stream spans > ~4 h);
  *  - skyline, final snapshot: exactly ONE state key whose frontier size
  *    equals batch x08's row count (merge state is O(frontier), and the
  *    local Pareto pre-filter bounds what reaches it).
  *
  * Usage: runMain graft.tools.BandStateProbe <sfDir> [label]
  * Prints one JSON line per run (snapshot.sh appends legs into
  * BANDSTATE.json).
  */
object BandStateProbe {
  /** Pin each append batch's part files to a strictly increasing mtime
    * (ADVICE r11): FileStreamSource orders discovery by modification
    * timestamp, and a coarse-filesystem tie between the appends can feed
    * files out of event-time order — the watermark then advances early,
    * older-hour rows are dropped as late, and the probe's `require`s abort
    * the whole snapshot. Files written by earlier calls already sit at
    * base+j (j < i); anything newer than the base band is from THIS call. */
  private val MtimeBaseMs = 1600000000000L
  private def stampPartMtimes(dir: String, batch: Int): Unit = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .filter(_.lastModified() > MtimeBaseMs + 100000L)
      .foreach(f => require(f.setLastModified(MtimeBaseMs + batch * 1000L),
        s"cannot set mtime on $f"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val label = if (args.length > 1) args(1)
      else java.nio.file.Paths.get(sfDir).getFileName.toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.FastLocalDir.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val w = 3600L * 1000000

    // ---- bandStats leg -------------------------------------------------
    val events = graft.queries.Tables.events(spark, sfDir)
    val nEvents = events.count()
    val src = java.nio.file.Files.createTempDirectory("bandstate-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bandstate-ckpt").toString
    // three time-ordered files -> three micro-batches (the spec's split
    // shape): the watermark advances between triggers, so the final
    // snapshot shows the event-time timeout actually reclaiming buckets
    val us = events.selectExpr("unix_micros(ts) AS us").as[Long]
    val Array(c1, c2) = us.stat.approxQuantile("us", Array(1.0 / 3, 2.0 / 3), 0.0).map(_.toLong)
    Seq((Long.MinValue, c1), (c1, c2), (c2, Long.MaxValue)).zipWithIndex.foreach {
      case ((lo, hi), i) =>
        events.filter(expr(s"unix_micros(ts) >= ${lo}L AND unix_micros(ts) < ${hi}L"))
          .coalesce(1).write.mode("append").parquet(src)
        stampPartMtimes(src, i)
    }
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val t0 = System.nanoTime()
    val q = graft.streaming.EventStreams.bandStats(spark, stream).writeStream
      .format("noop")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(600000)
    q.stop()
    val bandSec = (System.nanoTime() - t0) / 1e9

    // state-store reads: key.value = bucket; the buffer array lives inside
    // the value struct (field name depends on the state format version —
    // locate it by walking the schema for the `buf` array)
    def bufSizes(batchId: Long): Map[Long, Long] = {
      val reader = spark.read.format("statestore").option("path", ckpt)
      val df = (if (batchId >= 0) reader.option("batchId", batchId) else reader).load()
      val valuePath = {
        def find(st: org.apache.spark.sql.types.StructType, prefix: String): Option[String] =
          st.fields.collectFirst {
            case f if f.name == "buf" => s"$prefix${f.name}"
            case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] &&
              find(f.dataType.asInstanceOf[org.apache.spark.sql.types.StructType],
                s"$prefix${f.name}.").isDefined =>
              find(f.dataType.asInstanceOf[org.apache.spark.sql.types.StructType],
                s"$prefix${f.name}.").get
          }
        find(df.schema("value").dataType.asInstanceOf[org.apache.spark.sql.types.StructType],
          "value.").getOrElse(sys.error(s"no buf field under value: ${df.schema.treeString}"))
      }
      df.selectExpr("key.value AS bucket", s"size($valuePath) AS n")
        .filter(col("n") >= 0) // a timed-out-but-present row decodes to null buf
        .as[(Long, Long)].collect().toMap
    }
    val firstBatch = bufSizes(0L)
    val finalState = bufSizes(-1L)

    // expected spread + two-window bound from the batch table
    val residents = us.map(u => Math.floorDiv(u, w)).groupByKey(identity)
      .count().collect().toMap
    val firstFileBuckets = spark.read.parquet(src)
      .selectExpr("unix_micros(ts) AS us").as[Long]
      .filter(u => u < c1)
      .flatMap(u => graft.streaming.EventStreams.bandStatsRoutes(u, w).map(_._1))
      .distinct().count()
    require(firstBatch.size == firstFileBuckets,
      s"first-batch state must spread across all ${firstFileBuckets} routed buckets, got ${firstBatch.size}")
    val hours = residents.size
    val violations = finalState.filter { case (b, n) =>
      n > residents.getOrElse(b, 0L) + residents.getOrElse(b - 1, 0L)
    }
    require(violations.isEmpty,
      s"buckets over the two-window bound: ${violations.take(5)}")
    val ttlReclaimed = finalState.size < hours
    require(hours <= 6 || ttlReclaimed,
      s"event-time timeout reclaimed nothing: ${finalState.size} live buckets for $hours hours")

    // ---- skyline leg ----------------------------------------------------
    val docs = graft.queries.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val skySrc = java.nio.file.Files.createTempDirectory("skystate-src").toString
    val skyCkpt = java.nio.file.Files.createTempDirectory("skystate-ckpt").toString
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(skySrc)
    stampPartMtimes(skySrc, 0)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(skySrc)
    stampPartMtimes(skySrc, 1)
    val skySchema = spark.read.parquet(skySrc).schema
    val skyStream = spark.readStream.schema(skySchema)
      .option("maxFilesPerTrigger", 1).parquet(skySrc)
    val t1 = System.nanoTime()
    val sq = graft.streaming.EventStreams.skylineFrontier(spark, skyStream).writeStream
      .format("noop")
      .option("checkpointLocation", skyCkpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    sq.awaitTermination(600000)
    sq.stop()
    val skySec = (System.nanoTime() - t1) / 1e9
    val skyState = spark.read.format("statestore").option("path", skyCkpt).load()
    val skyKeys = skyState.count()
    val frontierRows = {
      def find(st: org.apache.spark.sql.types.StructType, prefix: String): Option[String] =
        st.fields.collectFirst {
          case f if f.name == "pts" => s"$prefix${f.name}"
          case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] &&
            find(f.dataType.asInstanceOf[org.apache.spark.sql.types.StructType],
              s"$prefix${f.name}.").isDefined =>
            find(f.dataType.asInstanceOf[org.apache.spark.sql.types.StructType],
              s"$prefix${f.name}.").get
        }
      val path = find(skyState.schema("value").dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType], "value.")
        .getOrElse(sys.error(s"no pts field: ${skyState.schema.treeString}"))
      skyState.selectExpr(s"size($path) AS n").as[Long].collect().max
    }
    val batchFrontier = graft.queries.TextQueries.x08ParetoSkyline(spark, sfDir).count()
    require(skyKeys == 1L, s"skyline merge must hold exactly one state key, got $skyKeys")
    require(frontierRows == batchFrontier,
      s"skyline state ($frontierRows pts) must equal the batch x08 frontier ($batchFrontier)")

    // wall-times are labeled non-comparable (VERDICT r11 "What's wrong"
    // #3): fixed streaming-trigger overhead dominates, so legs at
    // different scales invert (21.7 s at sf0.1 vs 14.2 s at 10×) — the
    // state-SHAPE fields are the contract, the times are run bookkeeping
    println(s"""{"label":"$label","events":$nEvents,"docs":$nDocs,""" +
      s""""wall_sec_noncomparable":{"note":"trigger overhead dominates; not comparable across legs",""" +
      s""""band":${f"$bandSec%.2f"},"sky":${f"$skySec%.2f"}},""" +
      s""""band":{"hours_in_data":$hours,"buckets_first_batch":${firstBatch.size},""" +
      s""""buckets_final":${finalState.size},"ttl_reclaimed":$ttlReclaimed,""" +
      s""""max_buf_rows":${if (finalState.isEmpty) 0 else finalState.values.max},""" +
      s""""max_two_window_bound":${
        if (finalState.isEmpty) 0
        else finalState.keys.map(b => residents.getOrElse(b, 0L) + residents.getOrElse(b - 1, 0L)).max}},""" +
      s""""skyline":{"state_keys":$skyKeys,"frontier_rows":$frontierRows,""" +
      s""""batch_frontier_rows":$batchFrontier}}""")

    Seq(src, ckpt, skySrc, skyCkpt).foreach(p =>
      graft.streaming.EventStreams.deleteTreePublic(java.nio.file.Paths.get(p)))
    spark.stop()
  }
}
