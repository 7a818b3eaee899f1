package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{RetentionJob, SegmentJobConfig, SegmentFetchJob, Metrics, SegmentUploadJob}
import graft.sources.FileSystemStorage
import graft.core.BytesRange
import graft.testkit.SparkSpec

/** Streaming ingest (foreachBatch atomic tier-out), windowed streaming agg,
  * retention/orphan GC, and observed metrics. */
class StreamingSpec extends SparkSpec {

  test("segment ingest stream tiers out files; replays are idempotent") {
    val watch = Files.createTempDirectory("graft-watch").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val store = Files.createTempDirectory("graft-stream-store").toString
    val cfg = SegmentJobConfig.withGeneratedKeys(store).copy(chunkSize = 4096)

    val payloads = (0 until 3).map { i =>
      val b = new Array[Byte](20000 + i * 1000)
      new java.util.Random(i).nextBytes(b)
      Files.write(java.nio.file.Paths.get(watch, f"seg$i%02d.bin"), b)
      b
    }

    val q = SegmentIngestStream.start(spark, watch, ckpt, cfg, maxFilesPerTrigger = 2,
      trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    val storage = FileSystemStorage(store)
    assert(storage.listKeys("").count(_.endsWith(".rsm-manifest")) == 3)

    // fetch one range back through the serving path
    val segKey = storage.listKeys("").find(_.endsWith(".log")).get.stripSuffix(".log")
    val idx = segKey.takeRight(6).filter(_.isDigit).toInt // segNN
    val got = SegmentFetchJob.fetchRange(cfg, segKey, BytesRange(100, 299))
    assert(java.util.Arrays.equals(got, java.util.Arrays.copyOfRange(payloads(idx), 100, 300)))

    // restart over the same checkpoint: no new work, still 3 manifests
    val q2 = SegmentIngestStream.start(spark, watch, ckpt, cfg, trigger = Trigger.AvailableNow())
    q2.awaitTermination(60000)
    assert(storage.listKeys("").count(_.endsWith(".rsm-manifest")) == 3)
  }

  test("watermarked windowed aggregation over an event stream") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-events-src").toString
    graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val agg = EventStreams.hourlyCounts(stream)
    val q = agg.writeStream
      .format("memory").queryName("hourly")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.sql("SELECT * FROM hourly").collect()
    assert(rows.nonEmpty)
    // spot-check against the batch twin
    val batch = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(rows.map(_.getAs[Long]("n")).sum == batch.agg(sum("n")).head().getLong(0))
  }

  test("sliding windows: streaming overlapping-window counts equal the batch aggregate") {
    val src = Files.createTempDirectory("graft-slide-src").toString
    graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = EventStreams.slidingCounts(stream).writeStream
      .format("memory").queryName("sliding")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql(
      "SELECT CAST(wstart AS LONG) AS s, event_type, n FROM sliding")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStreams.slidingCounts(
        graft.queries.Tables.events(spark, "/root/testdata/sf0.001"))
      .selectExpr("CAST(wstart AS LONG) AS s", "event_type", "n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    // every event lands in exactly width/slide = 4 windows
    val total = graft.queries.Tables.events(spark, "/root/testdata/sf0.001").count()
    assert(streamed.toSeq.map(_._3).sum == 4 * total)
  }

  test("trailing RANGE window: stateful streaming twin equals batch w03 bit-for-bit") {
    import spark.implicits._
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    // two time-ordered files -> two micro-batches: the second batch's
    // frames reach back into state carried from the first
    val src = Files.createTempDirectory("graft-trail-src").toString
    val cut = events.selectExpr("percentile_approx(ts, 0.5) AS m").head().getTimestamp(0)
    events.filter(col("ts") <= cut).coalesce(1).write.mode("append").parquet(src)
    events.filter(col("ts") > cut).coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = EventStreams.trailingCounts(spark, stream).writeStream
      .format("memory").queryName("trail")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT event_id, n_1h, v_1h FROM trail")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.queries.RelationalQueries
      .w03TrailingWindow(spark, "/root/testdata/sf0.001")
      .select("event_id", "n_1h", "v_1h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("band stats twin: incremental i05 equals the batch decomposition across a batch split") {
    import spark.implicits._
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    // two time-ordered files -> two micro-batches: second-batch errors
    // reach back into window state carried from the first
    val src = Files.createTempDirectory("graft-bandstats-src").toString
    val cut = events.selectExpr("percentile_approx(ts, 0.5) AS m").head().getTimestamp(0)
    events.filter(col("ts") <= cut).coalesce(1).write.mode("append").parquet(src)
    events.filter(col("ts") > cut).coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = EventStreams.bandStats(spark, stream).writeStream
      .format("memory").queryName("bandstats")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql(
        "SELECT event_id, n_window, sum_cents, min_cents, max_cents, avg_cents FROM bandstats")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    // the batch i05 runs the forced BandAggPushdown decomposition — this
    // pin therefore also gates the REWRITE against an independent
    // incremental computation
    val batch = graft.queries.RelationalQueries
      .i05BandStats(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("band stats twin: state spreads across time-band buckets, never one key (FUNNELSTATE-style)") {
    import spark.implicits._
    // routing contract (pure): every event lands in exactly two groups —
    // resident in its own hour bucket, emit-masked carry in the successor
    val w = 3600L * 1000000
    assert(EventStreams.bandStatsRoutes(0L, w) == Seq((0L, true), (1L, false)))
    assert(EventStreams.bandStatsRoutes(w - 1, w) == Seq((0L, true), (1L, false)))
    assert(EventStreams.bandStatsRoutes(w, w) == Seq((1L, true), (2L, false)))
    assert(EventStreams.bandStatsRoutes(-1L, w) == Seq((-1L, true), (0L, false)))
    // state-spread over the real table: the r9 shape routed ALL rows to
    // one key; the sharded key space must grow with the time axis and no
    // bucket may hold more than two windows' population
    val us = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("unix_micros(ts) AS us").as[Long].collect()
    val byBucket = us.flatMap(EventStreams.bandStatsRoutes(_, w)).groupBy(_._1)
    val residentsPerBucket = us.groupBy(u => Math.floorDiv(u, w)).view.mapValues(_.length)
    val maxTwoWindows = residentsPerBucket.values.max * 2
    assert(byBucket.size >= 24, s"expected the time axis to spread state, got ${byBucket.size} buckets")
    assert(byBucket.values.map(_.length).max <= maxTwoWindows,
      "a bucket's group rows must stay within two window populations")
  }

  test("skyline local pre-filter: dominated rows never cross the shuffle, frontier preserved") {
    val rnd = new scala.util.Random(7)
    val pts = Vector.tabulate(500) { i =>
      (i.toLong, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong)
    }
    val local = EventStreams.skylineLocalFrontier(pts)
    assert(local.toSet.subsetOf(pts.toSet))
    // no survivor is dominated by ANY input point (local fold is complete
    // within the partition)
    assert(local.forall(p => !pts.exists(q => EventStreams.skylineDominates(q, p))))
    // every globally non-dominated point survives (pre-filter never eats
    // a frontier row)
    val global = pts.filter(p => !pts.exists(q => EventStreams.skylineDominates(q, p)))
    assert(global.toSet.subsetOf(local.toSet))
    // and the filter actually shrinks the shuffle: 500 random rows in a
    // 100^3 grid collapse to a small frontier
    assert(local.size < pts.size / 4, s"expected a real reduction, got ${local.size}/${pts.size}")
    // split across "partitions": union of local frontiers still contains
    // the global frontier (the merge key sees only survivors)
    val (a, b) = pts.splitAt(250)
    val merged = EventStreams.skylineLocalFrontier(a) ++ EventStreams.skylineLocalFrontier(b)
    assert(global.toSet.subsetOf(merged.toSet))
  }

  test("anomaly twin: streamed rolling z-score flags equal batch w09 across a batch split") {
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    // two time-ordered files -> two micro-batches: second-batch frames
    // reach back into the ≤16-row buffers carried from the first
    val src = Files.createTempDirectory("graft-anom-src").toString
    val cut = events.selectExpr("percentile_approx(ts, 0.5) AS m").head().getTimestamp(0)
    events.filter(col("ts") <= cut).coalesce(1).write.mode("append").parquet(src)
    events.filter(col("ts") > cut).coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = EventStreams.anomalyFlags(spark, stream).writeStream
      .format("memory").queryName("anom")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT event_id, user_id, us, v, dev2, bound FROM anom")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val batch = graft.queries.RelationalQueries
      .w09Anomaly(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("sliding-distinct twin: accumulated deltas equal batch w10 across an OUT-OF-ORDER split") {
    import spark.implicits._
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    // split by event_id PARITY, not time: the second batch inserts days
    // BETWEEN days already in state, forcing the neighbor-retraction path
    val src = Files.createTempDirectory("graft-slide-src").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1).write.mode("append").parquet(src)
    events.filter(col("event_id") % 2 === 1).coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = EventStreams.slidingDistinctDeltas(spark, stream).writeStream
      .format("memory").queryName("slide")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val deltas = spark.sql("SELECT ws, du, de FROM slide")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = graft.queries.RelationalQueries
      .w10SlidingDistinct(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    // prefix-sum the delta stream on the batch spine (clip at summation)
    val got = batch.map(_._1).map { ws =>
      (ws,
        deltas.filter(_._1 <= ws).map(_._2).sum,
        deltas.filter(_._1 <= ws).map(_._3).sum)
    }
    assert(got == batch && batch.nonEmpty,
      s"accumulated deltas must replay the batch windows")
  }

  test("DSIR serving twin: stream scored with the frozen model equals batch t16") {
    import spark.implicits._
    val dd = "/root/testdata/sf0.001"
    val model = graft.queries.TextQueries.dsirBucketScores(spark, dd)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.queries.Tables.documents(spark, dd)
    val src = Files.createTempDirectory("graft-dsir-src").toString
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(src)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = EventStreams.dsirServe(stream, model)
      .select("doc_id", "n_grams", "dsir_score").writeStream
      .format("memory").queryName("dsir")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT * FROM dsir").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.queries.TextQueries.t16DsirWeights(spark, dd).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("skyline twin: the latest streamed frontier equals batch x08") {
    import spark.implicits._
    val dd = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, dd)
    val src = Files.createTempDirectory("graft-sky-src").toString
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(src)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = EventStreams.skylineFrontier(spark, stream).writeStream
      .format("memory").queryName("sky")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val all = spark.sql("SELECT * FROM sky").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val lastSeq = all.map(_._1).max
    val streamed = all.filter(_._1 == lastSeq).map(_._2).toSet
    val batch = graft.queries.TextQueries.x08ParetoSkyline(spark, dd).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("attribution twin: streamed credits equal batch w11 across a time split") {
    import spark.implicits._
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    // time-ordered split (the twin's documented ordering contract):
    // second-batch purchases reach back into pending touches carried
    // from the first batch
    val src = Files.createTempDirectory("graft-attr-src").toString
    val cut = events.selectExpr("percentile_approx(ts, 0.5) AS m").head().getTimestamp(0)
    events.filter(col("ts") <= cut).coalesce(1).write.mode("append").parquet(src)
    events.filter(col("ts") > cut).coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = EventStreams.attribution(spark, stream).writeStream
      .format("memory").queryName("attr")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT * FROM attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6))).toSet
    val batch = graft.queries.RelationalQueries
      .w11Attribution(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("OHLC twin: latest streamed bars equal batch ts08 across an out-of-order split") {
    import spark.implicits._
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    // parity split: the second batch lands events BEFORE stored firsts and
    // AFTER stored lasts inside already-open bars
    val src = Files.createTempDirectory("graft-ohlc-src").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1).write.mode("append").parquet(src)
    events.filter(col("event_id") % 2 === 1).coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = EventStreams.ohlcBars(spark, stream).writeStream
      .format("memory").queryName("ohlc")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // memory sink preserves batch order: last emission per key wins
    val streamed = spark.sql("SELECT * FROM ohlc").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .foldLeft(Map.empty[(Long, Long), (Long, Long, Long, Long, Long, Long)])(_ + _)
    val batch = graft.queries.TimeSeriesQueries
      .ts08OhlcBars(spark, "/root/testdata/sf0.001").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    assert(streamed == batch && batch.nonEmpty)
  }

  test("trailing RANGE twin: equal-timestamp peers all share the full peer frame") {
    // RANGE frames include ALL equal-timestamp peers for every peer row —
    // the first of two same-microsecond events must emit n/sum that
    // INCLUDE its peer (one-row-at-a-time processing gets this wrong; the
    // corpus has no duplicate per-user timestamps, so only this synthetic
    // case exercises it).
    import spark.implicits._
    val t0 = 1700000000000000L // us
    val src = Files.createTempDirectory("graft-trail-peers").toString
    Seq(
      (1L, 10L, t0, 1.11), (1L, 11L, t0, 2.22), // peers at t0
      (1L, 12L, t0 + 1800L * 1000000, 3.33), // inside the 1h frame
      (1L, 13L, t0 + 7200L * 1000000, 4.44) // outside: fresh frame
    ).toDF("user_id", "event_id", "us", "value")
      .selectExpr("user_id", "event_id", "timestamp_micros(us) AS ts", "value")
      .coalesce(1).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = EventStreams.trailingCounts(spark, stream).writeStream
      .format("memory").queryName("trail_peers")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT event_id, n_1h, v_1h FROM trail_peers")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((10L, 2L, 3.33), (11L, 2L, 3.33), (12L, 3L, 6.66), (13L, 1L, 4.44)))
  }

  test("funnel stages: streamed advances equal the batch w08 stage times across a batch split") {
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    val src = Files.createTempDirectory("graft-funnel-src").toString
    val cut = events.selectExpr("percentile_approx(ts, 0.5) AS m").head().getTimestamp(0)
    events.filter(col("ts") <= cut).coalesce(1).write.mode("append").parquet(src)
    events.filter(col("ts") > cut).coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = EventStreams.funnelStages(spark, stream).writeStream
      .format("memory").queryName("funnel")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT user_id, stage, us FROM funnel")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch reference: w08's cascaded min-after-previous per user
    val steps = graft.queries.RelationalQueries.FunnelSteps
    val byUser = events.selectExpr("user_id", "unix_micros(ts) AS us", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
    val batch = byUser.toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      var stage = 0
      var stageUs = Long.MinValue
      sorted.flatMap { case (_, us, tpe) =>
        if (stage < steps.length && tpe == steps(stage) && (stage == 0 || us > stageUs)) {
          stage += 1; stageUs = us
          Some((uid, stage.toLong, us))
        } else None
      }
    }.toSet
    assert(streamed == batch && streamed.nonEmpty)
    // cross-check the aggregate view against the registered batch query
    val w08 = graft.queries.RelationalQueries.w08Funnel(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val counts = streamed.groupBy(_._2).map { case (st, rs) => st -> rs.size.toLong }
    (1 to 3).foreach { st =>
      assert(counts.getOrElse(st.toLong, 0L) == w08(st.toLong),
        s"stage $st count diverges from batch w08")
    }
  }

  test("SCD2 dimension maintenance: streamed closed versions equal the batch lead() build") {
    // the CDC twin of w05's dimension construction: user_id's event_type
    // history is the "slowly changing attribute"; the stream must emit
    // exactly the CLOSED versions the batch lead() formulation computes
    // (open current versions live in state), across a micro-batch split
    import org.apache.spark.sql.expressions.Window
    val events = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    val src = Files.createTempDirectory("graft-scd2-src").toString
    val cut = events.selectExpr("percentile_approx(ts, 0.5) AS m").head().getTimestamp(0)
    events.filter(col("ts") <= cut).coalesce(1).write.mode("append").parquet(src)
    events.filter(col("ts") > cut).coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .selectExpr("user_id AS key", "unix_micros(ts) AS us", "event_type AS attr")
    val q = EventStreams.scd2Versions(spark, stream).writeStream
      .format("memory").queryName("scd2")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT key, attr, valid_from, valid_to FROM scd2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // batch reference: per key in (us, attr) order, collapse consecutive
    // duplicate attrs (CDC no-ops), close each version at the next change
    val w = Window.partitionBy(col("key")).orderBy(col("us"), col("attr"))
    val changes = events
      .selectExpr("user_id AS key", "unix_micros(ts) AS us", "event_type AS attr")
      .withColumn("prev", lag(col("attr"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("attr"))
    val w2 = Window.partitionBy(col("key")).orderBy(col("us"), col("attr"))
    val batch = changes
      .withColumn("valid_to", lead(col("us"), 1).over(w2))
      .filter(col("valid_to").isNotNull)
      .select(col("key"), col("attr"), col("us").as("valid_from"), col("valid_to"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("session windows: streaming sessionization equals the batch aggregate") {
    val src = Files.createTempDirectory("graft-sess-src").toString
    graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = EventStreams.sessionCounts(stream).writeStream
      .format("memory").queryName("sessions")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql(
      "SELECT user_id, CAST(sess_start AS LONG) AS s, n_events FROM sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the SAME session_window aggregate as a batch query — equality by
    // construction pins session boundaries, not just totals
    val batch = EventStreams.sessionCounts(
        graft.queries.Tables.events(spark, "/root/testdata/sf0.001"))
      .selectExpr("user_id", "CAST(sess_start AS LONG) AS s", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming upsert (CDC apply): per-batch merge keeps one latest row per key") {
    import graft.records._
    def rowsOf(base: Long, recs: Seq[(String, String)]) =
      graft.testkit.WireData.recordRows(spark, base, recs)
    val tableDir = Files.createTempDirectory("graft-upsert-table").toString
    val table = new RecordTable(tableDir)
    // seed the table so the first CDC batch both replaces and inserts
    table.appendSegment(spark, "seed",
      rowsOf(0L, Seq("a" -> "v0", "b" -> "v0")))

    val srcDir = Files.createTempDirectory("graft-upsert-src").toString
    // batch content: a updated twice IN ONE BATCH (offset order decides),
    // c is brand new
    rowsOf(100L, Seq("a" -> "stale", "a" -> "fresh", "c" -> "new"))
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val ckpt = Files.createTempDirectory("graft-upsert-ckpt").toString
    val q = UpsertStream.start(spark, stream, table, "CAST(key_raw AS STRING)", ckpt)
    q.awaitTermination(120000)

    val state = table.read(spark)
      .selectExpr("CAST(key_raw AS STRING) AS k", "CAST(value_raw AS STRING) AS v")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(state == Map("a" -> "fresh", "b" -> "v0", "c" -> "new"), s"got $state")

    // a second stream over the SAME source + a fresh checkpoint replays the
    // batch — merge converges to the identical state (no duplicates)
    val ckpt2 = Files.createTempDirectory("graft-upsert-ckpt2").toString
    val q2 = UpsertStream.start(spark,
      spark.readStream.schema(schema).parquet(srcDir), table,
      "CAST(key_raw AS STRING)", ckpt2)
    q2.awaitTermination(120000)
    assert(table.read(spark).count() == 3L)
  }

  test("streaming read of the records table sees appended segments") {
    import graft.records._
    import org.apache.spark.sql.streaming.Trigger
    val tableDir = Files.createTempDirectory("graft-stream-table").toString
    val table = new RecordTable(tableDir)
    val out = new java.io.ByteArrayOutputStream()
    out.write(KafkaWireCodec.writeBatch(KafkaWireCodec.buildBatch(0L, 5L,
      (0 until 8).map(i => (s"k$i".getBytes, s"v$i".getBytes, Seq.empty)))))
    table.appendSegment(spark, "s0", SegmentToRows.fromSegmentBytes(spark, Seq((0, out.toByteArray))))
    val q = table.readStream(spark, maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("topic_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.sql("SELECT count(*) FROM topic_stream").head().getLong(0) == 8)
  }

  test("retention deletes selected segments in batches; orphan GC cleans aborted uploads") {
    val store = Files.createTempDirectory("graft-ret-store").toString
    val cfg = SegmentJobConfig.withGeneratedKeys(store).copy(chunkSize = 4096)
    val storage = FileSystemStorage(store)
    (0 until 4).foreach { i =>
      val b = new Array[Byte](5000); new java.util.Random(i).nextBytes(b)
      assert(SegmentUploadJob.uploadOne(storage, cfg.ring, None, cfg, f"seg-$i%02d", b).success)
    }
    // orphan: a log with no manifest
    storage.uploadBytes(Array[Byte](1, 2), "seg-orphan.log")

    val gc = RetentionJob.gcOrphans(cfg)
    assert(gc.orphansDeleted == 1)
    assert(!storage.exists("seg-orphan.log"))

    val rep = RetentionJob.deleteSegments(cfg, key => key < "seg-02")
    assert(rep.segmentsDeleted == 2 && rep.objectsDeleted == 4) // log+manifest per segment
    assert(storage.listKeys("").count(_.endsWith(".log")) == 2)
  }

  test("topic ingest stream: .log segments land in the record table; replay idempotent") {
    import graft.records._
    val watch = Files.createTempDirectory("graft-topic-watch").toString
    val ckpt = Files.createTempDirectory("graft-topic-ckpt").toString
    val tableDir = Files.createTempDirectory("graft-topic-table").toString
    // seg-005 is producer-compressed (lz4): the streaming ingest path must
    // parse compressed interiors like the batch path does
    def segment(base: Long, codec: Int = KafkaWireCodec.CodecNone): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(KafkaWireCodec.writeBatch(KafkaWireCodec.buildBatch(base, base * 3,
        (0 until 5).map(i => (s"k${base + i}".getBytes, s"v${base + i}".getBytes, Seq.empty)),
        compression = codec)))
      out.toByteArray
    }
    Files.write(java.nio.file.Paths.get(watch, "seg-000.log"), segment(0))
    Files.write(java.nio.file.Paths.get(watch, "seg-005.log"),
      segment(5, KafkaWireCodec.CodecLz4))
    Files.write(java.nio.file.Paths.get(watch, "ignored.txt"), Array[Byte](1)) // glob-filtered

    val q = TopicIngestStream.start(spark, watch, ckpt, tableDir)
    q.awaitTermination(120000)
    val table = new RecordTable(tableDir)
    assert(table.listManifests().map(_.segment).sorted == Vector("seg-000", "seg-005"))
    assert(table.read(spark).count() == 10)
    // the compressed segment's rows decoded and kept their codec id
    val codecs = table.read(spark)
      .selectExpr("kafka.batch_compression_type").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(codecs == Seq(KafkaWireCodec.CodecNone, KafkaWireCodec.CodecLz4))
    // replay: same checkpoint, no duplicates
    val q2 = TopicIngestStream.start(spark, watch, ckpt, tableDir)
    q2.awaitTermination(60000)
    assert(table.read(spark).count() == 10)
  }

  test("topic ingest keeps segment bytes off the driver: no driver action returns a binary column") {
    import graft.records._
    val watch = Files.createTempDirectory("graft-nobyte-watch").toString
    val ckpt = Files.createTempDirectory("graft-nobyte-ckpt").toString
    val tableDir = Files.createTempDirectory("graft-nobyte-table").toString
    (0 until 3).foreach { i =>
      val out = new java.io.ByteArrayOutputStream()
      out.write(KafkaWireCodec.writeBatch(KafkaWireCodec.buildBatch(i * 5L, i * 15L,
        (0 until 5).map(j => (s"k$i-$j".getBytes, s"v$i-$j".getBytes, Seq.empty)))))
      Files.write(java.nio.file.Paths.get(watch, f"seg-$i%03d.log"), out.toByteArray)
    }
    // every driver-returning action (collect/head/count/...) during ingest is
    // recorded with its output schema: segment `content` must never be in one
    val actions = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        actions.add(funcName + "[" +
          qe.analyzed.output.map(a => a.name + ":" + a.dataType.simpleString).mkString(",") + "]")
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val q = TopicIngestStream.start(spark, watch, ckpt, tableDir)
      q.awaitTermination(120000)
      assert(new RecordTable(tableDir).read(spark).count() == 15)
      val deadline = System.currentTimeMillis + 10000
      while (!actions.toArray.exists(_.toString.contains("path:string")) &&
        System.currentTimeMillis < deadline) Thread.sleep(50)
      val snap = actions.toArray.map(_.toString)
      assert(snap.exists(_.contains("path:string")), s"expected the paths-only collect, saw: ${snap.mkString("; ")}")
      val withBinary = snap.filter(_.contains(":binary"))
      assert(withBinary.isEmpty,
        s"driver-returning action carried binary column(s): ${withBinary.mkString("; ")}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("segments with glob metacharacters in the file name ingest fine (exact-path read)") {
    import graft.records._
    val watch = Files.createTempDirectory("graft-glob-watch").toString
    val out = new java.io.ByteArrayOutputStream()
    out.write(KafkaWireCodec.writeBatch(KafkaWireCodec.buildBatch(0L, 1L,
      (0 until 3).map(i => (s"k$i".getBytes, s"v$i".getBytes, Seq.empty)))))
    // '[', ']' and spaces are glob/URI traps for load(); legal file names
    val tricky = java.nio.file.Paths.get(watch, "seg [0].log")
    Files.write(tricky, out.toByteArray)
    val rows = SegmentToRows.fromSegmentFile(spark, tricky.toUri.toString)
    assert(rows.count() == 3)
  }

  test("streaming dedup: duplicate fingerprints dropped across micro-batches, state bounded by watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "ts_s")
      .selectExpr("doc_id", "text", "CAST(ts_s AS TIMESTAMP) AS ts")
    val deduped = EventStreams.dedupByFingerprint(docs, watermarkDelay = "10 seconds")
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    input.addData((1L, "alpha", 100L), (2L, "beta", 101L), (3L, "alpha", 102L))
    q.processAllAvailable()
    input.addData((4L, "alpha", 103L), (5L, "gamma", 104L)) // dup within watermark
    q.processAllAvailable()
    q.stop()
    val kept = spark.sql("SELECT doc_id FROM dedup").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(2L) && kept.contains(5L))
    assert(!kept.contains(3L) && !kept.contains(4L),
      s"duplicate 'alpha' docs must be dropped within the watermark, got $kept")
  }

  test("streaming clean gate: quality + language + dedup legs filter across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, String, Long)]
    val docs = input.toDF().toDF("doc_id", "lang", "text", "ts_s")
      .selectExpr("doc_id", "lang", "text", "CAST(ts_s AS TIMESTAMP) AS ts")
    // thresholds scaled down for hand-sized docs: ≥4 tokens, ttr ≥ 0.5
    val gated = EventStreams.cleanGate(docs, minTokens = 4L, minTtr = 0.5,
      watermarkDelay = "10 seconds")
    val q = gated.writeStream.format("memory").queryName("cleaned")
      .outputMode("append").start()
    val good = "the quick value is that big"       // en stopword hits, 6 distinct
    input.addData(
      (1L, "en", good, 100L),                      // passes all gates
      (2L, "en", "a b", 101L),                     // fails minTokens
      (3L, "en", "x x x x x x", 102L),             // fails ttr (1 distinct / 6)
      (4L, "de", "the quick value is that big", 103L)) // lang mismatch (en-pred)
    q.processAllAvailable()
    input.addData(
      (5L, "en", good, 104L),                      // dup of doc 1 within watermark
      (6L, "en", "it is the small table here", 105L)) // passes
    q.processAllAvailable()
    q.stop()
    val kept = spark.sql("SELECT doc_id FROM cleaned").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 6L), s"got $kept")
    // the gate's signal columns carry the batch t02/t03 values
    val row = spark.sql("SELECT n_tokens, ttr FROM cleaned WHERE doc_id = 1").head
    assert(row.getLong(0) == 6L && row.getDouble(1) == 1.0)
  }

  test("flatMapGroupsWithState packing: bins accumulate per-language across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "lang", "n_tokens")
    val packed = EventStreams.packBins(spark, docs, budget = 100L)
    val q = packed.writeStream.format("memory").queryName("packed")
      .outputMode("append").start()
    input.addData((1L, "en", 60L), (2L, "en", 60L), (3L, "de", 30L))
    q.processAllAvailable()
    input.addData((4L, "en", 90L), (5L, "de", 80L))
    q.processAllAvailable()
    q.stop()
    val bins = spark.sql("SELECT doc_id, bin_id FROM packed").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // en: doc1 starts at 0 -> bin 0; doc2 at 60 -> bin 0; doc4 at 120 -> bin 1
    assert(bins(1L) == 0L && bins(2L) == 0L && bins(4L) == 1L)
    // de: doc3 at 0 -> bin 0; doc5 at 30 (state carried across batches) -> bin 0
    assert(bins(3L) == 0L && bins(5L) == 0L)
    // matches the batch x02 arithmetic on the same ordered stream
    var pos = 0L
    val expectEn = Seq((1L, 60L), (2L, 60L), (4L, 90L)).map { case (id, n) =>
      val b = pos / 100L; pos += n; id -> b
    }.toMap
    expectEn.foreach { case (id, b) => assert(bins(id) == b) }
  }

  test("stream-static ANN serving: query stream joins the LSH index, best-per-query emitted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    // stream three corpus vectors back as queries: each must find a
    // same-bucket neighbor, and scoring must match the batch index
    val corpus = graft.queries.SimilarityQueries.lshIndex(spark, d)
      .select("vec_id", "v", "bucket").collect()
    val byId = corpus.map(r => r.getLong(0) -> (r.getSeq[Double](1), r.getLong(2))).toMap
    val input = MemoryStream[(Long, Seq[Double])]
    val queries = input.toDF().toDF("query_id", "q")
    val served = EventStreams.annServe(queries, spark, d)
    val q = served.writeStream.format("memory").queryName("ann")
      .outputMode("update").start()
    input.addData((9001L, byId(20L)._1), (9002L, byId(21L)._1))
    q.processAllAvailable()
    input.addData((9003L, byId(22L)._1))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT query_id, neighbor_id, cosine FROM ann").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(9001L, 9002L, 9003L))
    // a vector identical to corpus vector k must score cosine 1 with k
    // (k is its own best match; bucket contains it by construction)
    Seq(9001L -> 20L, 9002L -> 21L, 9003L -> 22L).foreach { case (qid, vid) =>
      val (nbr, cos) = got(qid)
      assert(math.abs(cos - 1.0) < 1e-12 && byId(nbr)._2 == byId(vid)._2,
        s"query $qid: neighbor $nbr cos $cos")
    }
  }

  test("stream-stream interval join: errors match prior same-user events, cross-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String, Long)]
    val events = input.toDF().toDF("user_id", "event_id", "event_type", "secs")
      .selectExpr("user_id", "event_id", "event_type",
        "CAST(secs AS TIMESTAMP) AS ts")
    // 5-min delay: the error at t=250 arrives a batch after the stream
    // clock reached 300 — within delay, so not dropped as late (the two
    // legs share one upstream watermark)
    val joined = EventStreams.errorContextJoin(events, window = "10 minutes",
      watermarkDelay = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("errctx")
      .outputMode("append").start()
    // batch 1: two prior views for user 1; user 2 noise
    input.addData((1L, 10L, "view", 100L), (1L, 11L, "view", 200L), (2L, 20L, "view", 300L))
    q.processAllAvailable()
    // batch 2: the error arrives later — join state from batch 1 must still match
    input.addData((1L, 12L, "error", 250L), (2L, 21L, "error", 1300L))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.sql("SELECT error_id, prior_id FROM errctx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // user 1's error at 250 reaches back to views at 100 and 200;
    // user 2's error at 1300 is > 10 min after its view at 300 → no match;
    // the error row itself (a_ts < e_ts strict) never self-joins
    assert(pairs == Set((12L, 10L), (12L, 11L)), s"got $pairs")
  }

  test("stream-stream LEFT OUTER join: unmatched errors emit nulls after the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String, Long)]
    val events = input.toDF().toDF("user_id", "event_id", "event_type", "secs")
      .selectExpr("user_id", "event_id", "event_type",
        "CAST(secs AS TIMESTAMP) AS ts")
    val joined = EventStreams.errorContextJoin(events, window = "10 minutes",
      joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("errctx_outer")
      .outputMode("append").start()
    // user 1: error WITH prior activity; user 2: error with NO activity in window
    input.addData((1L, 10L, "view", 100L), (1L, 11L, "error", 250L), (2L, 21L, "error", 300L))
    q.processAllAvailable()
    // the unmatched row may not emit yet: the watermark must first pass
    // error_ts + window so no late activity can still match. Advance it.
    input.addData((3L, 90L, "view", 5000L))
    q.processAllAvailable()
    input.addData((3L, 91L, "view", 9000L)) // second advance flushes outer state
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT error_id, prior_id FROM errctx_outer").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // matched pair for user 1, null-padded row for user 2 — exactly once
    assert(rows == Set((11L, 10L), (21L, -1L)), s"got $rows")
  }

  test("streaming per-key top-k: bounded state refreshed across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long)]
    val events = input.toDF().toDF("user_id", "event_id", "value")
    val topk = EventStreams.topEventsPerUser(spark, events, k = 2)
    val q = topk.writeStream.format("memory").queryName("topk")
      .outputMode("update").start()
    input.addData((1L, 10L, 50L), (1L, 11L, 90L), (1L, 12L, 70L))
    q.processAllAvailable()
    input.addData((1L, 13L, 80L), (2L, 20L, 5L))
    q.processAllAvailable()
    q.stop()
    // latest update per user wins (update mode emits one row per batch)
    val rows = spark.sql("SELECT user_id, top_ids FROM topk").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    // user 1 after batch 2: values 90 (id 11), 80 (id 13) — 70/50 evicted
    assert(rows.filter(_._1 == 1L).last._2 == Seq(11L, 13L))
    assert(rows.filter(_._1 == 2L).last._2 == Seq(20L))
  }

  test("mapGroupsWithState user sessions accumulate per-key state across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String)]
    val events = input.toDF().toDF("user_id", "ts_s", "event_type")
      .selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type")
    val updates = EventStreams.userSessions(spark, events, idleTimeoutMs = 0L)
    val q = updates.writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    input.addData((1L, 100L, "a"), (1L, 101L, "b"), (2L, 100L, "a"))
    q.processAllAvailable()
    input.addData((1L, 102L, "c"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    q.stop()
    assert(rows(1L) == 3L, s"user 1 should have 3 events across batches, got $rows")
    assert(rows(2L) == 1L)
  }

  test("stream-static series serving: query stream joins the PAA index, exact re-rank") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    // stream two corpus series back as queries: each sits in its own word
    // bucket, so its best match is itself at distance 0
    val corpus = graft.queries.TimeSeriesQueries.paaIndex(spark, d)
      .select("user_id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val ids = corpus.keySet.toSeq.sorted.take(2)
    val input = MemoryStream[(Long, Seq[Double])]
    val queries = input.toDF().toDF("query_id", "qv")
    val served = EventStreams.seriesServe(queries, spark, d)
    val q = served.writeStream.format("memory").queryName("seriesserve")
      .outputMode("update").start()
    input.addData((9001L, corpus(ids(0))))
    q.processAllAvailable()
    input.addData((9002L, corpus(ids(1))))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT query_id, neighbor_id, dist FROM seriesserve").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(9001L, 9002L))
    assert(got(9001L) == (ids(0), 0.0), got(9001L).toString)
    assert(got(9002L) == (ids(1), 0.0), got(9002L).toString)
  }

  test("streaming scene cuts: pinned equal to the batch m06 kernel across batch slicing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.functions.Multimodal
    val (frames, w, h, threshold) = (12, 12, 8, 8000L)
    // decoded closed-form frames (the real-PNG round trip batch m06 runs),
    // flattened scanlines — the payload a live decode stage would emit
    def decodedFrames(id: Long): Seq[(Long, Int, Array[Byte])] = {
      var s = 0
      (0 until frames).map { f =>
        if (f > 0 && (id * 13 + f * 29L) % 7 == 0) s += 1
        val dec = Multimodal.RealDecoder.decode(
          Multimodal.encodeScenePng(id, f, s, w, h), "image/png")
        (id, f, dec.frameBytes.flatten.toArray)
      }
    }
    val input = MemoryStream[(Long, Int, Array[Byte])]
    val df = input.toDF().toDF("video_id", "frame_idx", "frame")
    val cuts = EventStreams.sceneCuts(spark, df, threshold)
    val q = cuts.writeStream.format("memory").queryName("scenecuts")
      .outputMode("append").start()
    // split each video MID-SEQUENCE across micro-batches: state (prev
    // frame + counters) must carry over
    val v3 = decodedFrames(3L)
    val v8 = decodedFrames(8L)
    input.addData(v3.take(5) ++ v8.take(7): _*)
    q.processAllAvailable()
    input.addData(v3.drop(5) ++ v8.drop(7): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT video_id, frame_idx, is_cut, sad FROM scenecuts").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getBoolean(2), r.getLong(3))).toMap
    assert(got.size == 2 * frames)
    // batch twin: the m06 kernel over the same ids
    val batch = Multimodal.sceneCutStats(Seq(3L, 8L).toDF("doc_id"), "doc_id",
      frames = frames, w = w, h = h, threshold = threshold).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    Seq(3L, 8L).foreach { id =>
      val streamCuts = (1 until frames).filter(f => got((id, f))._1)
      assert(streamCuts.size.toLong == batch(id).getAs[Long]("n_cuts"), s"id=$id")
      val md = java.security.MessageDigest.getInstance("MD5")
      val fp = md.digest(streamCuts.mkString(",").getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(fp == batch(id).getAs[String]("cuts_md5"), s"id=$id cut positions")
      val sadTotal = (1 until frames).map(f => got((id, f))._2).sum
      assert(sadTotal == batch(id).getAs[Long]("sad_total"), s"id=$id sad_total")
    }
  }

  test("streaming triplet mining: latest emission per anchor equals batch s12 across a split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    // every corpus vector is a candidate (the stream twin of s12's scan);
    // self-pairs are excluded inside the operator, exactly as in batch
    val rows = graft.queries.Tables.embeddings(spark, d)
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2)))
    val (first, second) = rows.sortBy(_._1).splitAt(rows.length / 2)

    val input = MemoryStream[(Long, Long, Seq[Float])]
    val cands = input.toDF().toDF("vec_id", "label", "embedding")
    val q = EventStreams.tripletMine(spark, cands, d)
      .writeStream.format("memory").queryName("triplets").outputMode("update").start()
    input.addData(first.toSeq: _*)
    q.processAllAvailable()
    input.addData(second.toSeq: _*)
    q.processAllAvailable()
    q.stop()

    val emitted = spark.sql("SELECT * FROM triplets").collect()
    val latest = emitted.zipWithIndex.groupBy(_._1.getLong(0))
      .map { case (aid, rs) => aid -> rs.maxBy(_._2)._1 }
    val batch = graft.queries.SimilarityQueries.s12TripletMining(spark, d)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(latest.keySet == batch.keySet, "anchor sets diverged")
    latest.foreach { case (aid, r) =>
      val b = batch(aid)
      assert(r.getLong(1) == b.getLong(1), s"anchor $aid label")
      assert(r.getLong(2) == b.getLong(2) && r.getDouble(3) == b.getDouble(3),
        s"anchor $aid positive diverged: stream=(${r.getLong(2)}, ${r.getDouble(3)}) batch=(${b.getLong(2)}, ${b.getDouble(3)})")
      assert(r.getLong(4) == b.getLong(4) && r.getDouble(5) == b.getDouble(5),
        s"anchor $aid negative diverged")
      assert(r.getDouble(6) == b.getDouble(6), s"anchor $aid margin diverged")
    }
  }

  test("streaming per-source quota: latest keeper set equals the batch d14 cut across a split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    // the same scored projection the batch query uses
    val scored = graft.queries.Tables.documents(spark, d)
      .selectExpr("doc_id", "source",
        "CAST(size(array_distinct(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' '))) AS BIGINT) AS n_distinct")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (first, second) = scored.sortBy(_._1).splitAt(scored.length / 2)

    val input = MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "source", "n_distinct")
    val k = graft.queries.TextQueries.SourceQuota
    val q = EventStreams.sourceQuota(spark, docs, k)
      .writeStream.format("memory").queryName("quota").outputMode("update").start()
    input.addData(first.toSeq: _*)
    q.processAllAvailable()
    input.addData(second.toSeq: _*)
    q.processAllAvailable()
    q.stop()

    // latest emission per source (memory sink appends every update)
    val emitted = spark.sql("SELECT * FROM quota").collect()
      .map(r => r.getString(0) -> (r.getSeq[Long](1), r.getSeq[Long](2)))
    val latest = emitted.zipWithIndex.groupBy(_._1._1)
      .map { case (src, rows) => src -> rows.maxBy(_._2)._1._2 }
    val batch = graft.queries.TextQueries.d14SourceQuota(spark, d).collect()
      .groupBy(_.getString(1))
      .map { case (src, rows) =>
        val sorted = rows.sortBy(_.getLong(3)) // rnk
        src -> (sorted.map(_.getLong(0)).toSeq, sorted.map(_.getLong(2)).toSeq)
      }
    assert(latest.keySet == batch.keySet)
    latest.foreach { case (src, (ids, ns)) =>
      assert((ids, ns) == batch(src), s"source $src keeper set diverged: stream=($ids) batch=(${batch(src)})")
    }
  }

  test("streaming curation funnel: latest five-stage counts equal batch p03 across splits; state tables stay 1-row-per-key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.Tables.documents(spark, d)
      .selectExpr("doc_id", "lang", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    // three uneven splits, shuffled WITHIN each: component merges must
    // cross micro-batch boundaries and demote earlier keepers
    val sorted = rows.sortBy(_._1)
    val splits = Seq(sorted.take(rows.length / 3),
      sorted.slice(rows.length / 3, rows.length / 2),
      sorted.drop(rows.length / 2))
    val stateDir = Files.createTempDirectory("funnel-state").toString

    // per-key cardinality of every state table at version v: the funnel's
    // scale contract is 1 row per band / per colliding doc / per source —
    // state spreads across executors instead of pooling in one task
    def assertStateShape(v: Long, prefixDocs: Long): Long = {
      def maxPerKey(table: String, key: String): Long = {
        val df = spark.read.parquet(s"$stateDir/$table/v=$v")
        if (df.isEmpty) 0L
        else df.groupBy(key).count().agg(max("count")).head().getLong(0)
      }
      Seq("anchors" -> "band", "collide" -> "doc_id",
          "stars" -> "node", "counters" -> "src").foreach { case (t, k) =>
        val m = maxPerKey(t, k)
        assert(m <= 1L, s"$t holds $m rows for one $k at v=$v — state must be 1-row-per-key")
      }
      val collide = spark.read.parquet(s"$stateDir/collide/v=$v").count()
      assert(collide < prefixDocs,
        s"collide table ($collide) must stay below the corpus seen so far ($prefixDocs)")
      collide
    }

    val input = MemoryStream[(Long, String, String, String)]
    val docs = input.toDF().toDF("doc_id", "lang", "source", "text")
    val q = EventStreams.curationFunnel(spark, docs, stateDir)
    var seen = 0L
    val collideSizes = splits.zipWithIndex.map { case (part, i) =>
      // last trigger runs the component merge through the DISTRIBUTED
      // large-star/small-star operator (conf-forced), proving the stream
      // path exercises the same scale operator as the batch d07 family
      if (i == splits.size - 1)
        spark.conf.set(graft.operators.ConnectedComponents.MaxDriverEdgesKey, "0")
      input.addData(part.toSeq: _*)
      q.processAllAvailable()
      seen += part.length
      assertStateShape(i.toLong, seen)
    }
    spark.conf.unset(graft.operators.ConnectedComponents.MaxDriverEdgesKey)
    q.stop()
    // per-key state stayed flat (≤1) while docs tripled; the colliding-doc
    // table grew with collisions, not with the corpus
    assert(collideSizes.last < sorted.length,
      "colliding docs must remain a strict subset of the corpus")

    val funnel = spark.read.parquet(s"$stateDir/funnel").collect()
    assert(funnel.length == 5 * splits.size, "five rows per trigger")
    val lastBatch = funnel.map(_.getAs[Long]("batch_id")).max
    val latest = funnel.filter(_.getAs[Long]("batch_id") == lastBatch)
      .map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_docs")).toMap
    val batch = graft.queries.TextQueries.p03CurationFunnel(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(latest == batch, s"funnel diverged: stream=$latest batch=$batch")
    // the intermediate (first-trigger) emission is exact for its prefix:
    // raw equals the prefix size, and counts are internally monotone
    // down-funnel within every trigger
    val first = funnel.filter(_.getAs[Long]("batch_id") == 0L)
      .map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(first(1L) == (rows.length / 3).toLong)
    (1L to 4L).foreach(i => assert(first(i) >= first(i + 1), s"stage $i < ${i + 1}"))
  }

  test("streaming scrub: per-arrival verdicts equal the batch ScrubJob on the same store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{ScrubJob, SegmentJobConfig, SegmentUploadJob}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // a small store: two healthy segments, one with a flipped ciphertext
    // bit (GCM tag failure → detransform-failed), one missing log object
    val store = java.nio.file.Files.createTempDirectory("graft-scrub-stream").toString
    val cfg = SegmentJobConfig.withGeneratedKeys(store).copy(chunkSize = 4096)
    val rnd = new java.util.Random(7)
    val keys = (0 until 4).map { i =>
      val payload = new Array[Byte](16000 + i * 1000)
      rnd.nextBytes(payload)
      val key = f"sseg-$i%02d"
      SegmentUploadJob.uploadOne(graft.sources.FileSystemStorage(store), cfg.ring, None, cfg, key, payload)
      key
    }
    val log1 = java.nio.file.Paths.get(store, "sseg-01.log")
    val bytes = java.nio.file.Files.readAllBytes(log1)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x40).toByte
    java.nio.file.Files.write(log1, bytes)
    java.nio.file.Files.delete(java.nio.file.Paths.get(store, "sseg-03.log"))

    val input = MemoryStream[String]
    val arrivals = input.toDF().toDF("segment_key")
    val q = ScrubJob.stream(spark, cfg, arrivals)
      .writeStream.format("memory").queryName("scrubstream")
      .outputMode("append").start()
    input.addData(keys(0), keys(1))   // first micro-batch
    q.processAllAvailable()
    input.addData(keys(2), keys(3))   // second micro-batch
    q.processAllAvailable()
    q.stop()

    val streamed = spark.sql("SELECT * FROM scrubstream").collect()
      .map(r => r.getAs[String]("segment_key") ->
        (r.getAs[Boolean]("ok"), r.getAs[String]("issue"),
          r.getAs[Int]("chunks"), r.getAs[Long]("bytes_checked"))).toMap
    val batch = ScrubJob.run(spark, cfg).collect()
      .map(r => r.getAs[String]("segment_key") ->
        (r.getAs[Boolean]("ok"), r.getAs[String]("issue"),
          r.getAs[Int]("chunks"), r.getAs[Long]("bytes_checked"))).toMap
    assert(streamed == batch,
      s"streaming verdicts must equal the batch scrub:\nstream=$streamed\nbatch=$batch")
    assert(!streamed("sseg-01")._1 && streamed("sseg-01")._2.startsWith("detransform-failed"))
    assert(streamed("sseg-03")._2 == "log-missing")
    assert(streamed("sseg-00")._1 && streamed("sseg-02")._1)
  }

  test("observed metrics: segment-copy sensors flow to the listener") {
    val collector = Metrics.register(spark)
    val in = Files.createTempDirectory("graft-obs-in").toString
    val store = Files.createTempDirectory("graft-obs-store").toString
    val b = new Array[Byte](10000); new java.util.Random(1).nextBytes(b)
    Files.write(java.nio.file.Paths.get(in, "s.bin"), b)
    val cfg = SegmentJobConfig.withGeneratedKeys(store)
    Metrics.observeUpload(SegmentUploadJob.run(spark, in, cfg)).collect()
    val deadline = System.currentTimeMillis + 10000
    while (!collector.seen.contains("segment-copy") && System.currentTimeMillis < deadline) Thread.sleep(50)
    val m = collector.seen("segment-copy")
    assert(m("segments") == 1L)
    assert(m("bytes-in") == 10000L)
    assert(m("errors") == 0L)
  }
}
