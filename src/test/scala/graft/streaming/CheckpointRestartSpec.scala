package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.testkit.SparkSpec

/** Checkpoint-RESTART recovery for the stateful twins (r11, VERDICT r10
  * task 3): the split tests prove batch-equality across micro-batch
  * boundaries inside ONE query run, but never exercised the state-store
  * round-trip of the case-class states — stop a `flatMapGroupsWithState`
  * query after batch k, restart a NEW query on the same checkpoint, feed
  * the remainder, and pin the combined output to the batch answer. This is
  * the path a real cluster takes on every executor loss, upgrade, or
  * planned restart: if `TrailState`/`BandStatsState` (incl. the carry
  * entries)/`FrontierState` (incl. the seq counter) don't survive
  * encode→checkpoint→decode, only a restart test can see it.
  *
  * Each test writes a time-ordered (or id-ordered) part 1, runs leg 1 with
  * `Trigger.AvailableNow()` to completion, STOPS the query, appends part 2,
  * and starts a fresh query object on the same checkpoint — so leg 2's
  * frames can only be right if they reach back into RESTORED state. The
  * sink is the parquet FILE sink (the memory sink refuses checkpoint
  * recovery — it is not fault-tolerant), so leg attribution reads the
  * output directory after each leg. */
class CheckpointRestartSpec extends SparkSpec {

  private val dd = "/root/testdata/sf0.001"

  /** Time-ordered two-file layout: part 1 on disk now, part 2 returned as
    * a thunk the test invokes between the two legs. */
  private def timeSplitSource(events: DataFrame, src: String): () => Unit = {
    val cut = events.selectExpr("percentile_approx(ts, 0.5) AS m").head().getTimestamp(0)
    events.filter(col("ts") <= cut).coalesce(1).write.mode("append").parquet(src)
    () => events.filter(col("ts") > cut).coalesce(1).write.mode("append").parquet(src)
  }

  private def runLeg(out: DataFrame, ckpt: String, sink: String): Unit = {
    val q = out.writeStream
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.stop()
  }

  test("bandStats restart: leg-2 frames reach back into RESTORED buffers (incl. carries)") {
    val events = graft.queries.Tables.events(spark, dd)
    val src = Files.createTempDirectory("ckres-band-src").toString
    val ckpt = Files.createTempDirectory("ckres-band-ckpt").toString
    val sink = Files.createTempDirectory("ckres-band-out").toString
    val writePart2 = timeSplitSource(events, src)
    val schema = spark.read.parquet(src).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    runLeg(EventStreams.bandStats(spark, stream()).toDF(), ckpt, sink)
    val leg1Rows = spark.read.parquet(sink).count()
    writePart2()
    runLeg(EventStreams.bandStats(spark, stream()).toDF(), ckpt, sink)

    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5))
    val all = spark.read.parquet(sink)
      .select("event_id", "n_window", "sum_cents", "min_cents", "max_cents", "avg_cents")
      .collect()
    assert(leg1Rows > 0 && all.length > leg1Rows,
      s"both legs must emit (leg1=$leg1Rows, total=${all.length})")
    val streamed = all.map(key).toSet
    val batch = graft.queries.RelationalQueries.i05BandStats(spark, dd)
      .collect().map(key).toSet
    assert(streamed == batch && batch.nonEmpty,
      s"restart diverged from batch: ${streamed.size} streamed vs ${batch.size} batch rows")
  }

  test("trailingCounts restart: TrailState buffers survive the state-store round-trip") {
    val events = graft.queries.Tables.events(spark, dd)
    val src = Files.createTempDirectory("ckres-trail-src").toString
    val ckpt = Files.createTempDirectory("ckres-trail-ckpt").toString
    val sink = Files.createTempDirectory("ckres-trail-out").toString
    val writePart2 = timeSplitSource(events, src)
    val schema = spark.read.parquet(src).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    runLeg(EventStreams.trailingCounts(spark, stream()).toDF(), ckpt, sink)
    val leg1Rows = spark.read.parquet(sink).count()
    writePart2()
    runLeg(EventStreams.trailingCounts(spark, stream()).toDF(), ckpt, sink)

    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val all = spark.read.parquet(sink).select("event_id", "n_1h", "v_1h").collect()
    assert(leg1Rows > 0 && all.length > leg1Rows,
      s"both legs must emit (leg1=$leg1Rows, total=${all.length})")
    val streamed = all.map(key).toSet
    val batch = graft.queries.RelationalQueries.w03TrailingWindow(spark, dd)
      .select("event_id", "n_1h", "v_1h").collect().map(key).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("skylineFrontier restart: FrontierState (points AND seq counter) resumes, latest emission equals batch x08") {
    val docs = graft.queries.Tables.documents(spark, dd)
    val src = Files.createTempDirectory("ckres-sky-src").toString
    val ckpt = Files.createTempDirectory("ckres-sky-ckpt").toString
    val sink = Files.createTempDirectory("ckres-sky-out").toString
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    def rows() = spark.read.parquet(sink).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))

    runLeg(EventStreams.skylineFrontier(spark, stream()).toDF(), ckpt, sink)
    val leg1 = rows()
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(src)
    runLeg(EventStreams.skylineFrontier(spark, stream()).toDF(), ckpt, sink)
    val leg2 = rows().diff(leg1)
    assert(leg1.nonEmpty && leg2.nonEmpty, "both legs must emit (restart produced an empty leg)")

    // the seq counter is part of FrontierState: a restart that lost state
    // would restart it at 1, colliding with leg 1's numbering
    assert(leg2.map(_._1).min > leg1.map(_._1).max,
      "restored seq counter must continue past leg 1, not restart at 1")
    // leg 2's latest frontier folds leg-1 points it never saw — only
    // restored state can supply them
    val lastSeq = leg2.map(_._1).max
    val streamed = leg2.filter(_._1 == lastSeq).map(_._2).toSet
    val batch = graft.queries.TextQueries.x08ParetoSkyline(spark, dd).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("curationFunnel restart: versioned state tables + checkpoint resume, final funnel equals batch p03") {
    val docs = graft.queries.Tables.documents(spark, dd)
      .selectExpr("doc_id", "lang", "source", "text")
    val src = Files.createTempDirectory("ckres-funnel-src").toString
    val stateDir = Files.createTempDirectory("ckres-funnel-state").toString
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    val q1 = EventStreams.curationFunnel(spark, stream(), stateDir)
    q1.processAllAvailable()
    q1.stop()
    val funnelAfterLeg1 = spark.read.parquet(s"$stateDir/funnel").collect()
    val lastB1 = funnelAfterLeg1.map(_.getAs[Long]("batch_id")).max

    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(src)
    val q2 = EventStreams.curationFunnel(spark, stream(), stateDir)
    q2.processAllAvailable()
    q2.stop()

    val funnel = spark.read.parquet(s"$stateDir/funnel").collect()
    val lastB2 = funnel.map(_.getAs[Long]("batch_id")).max
    assert(lastB2 > lastB1, "restart must continue the checkpoint's batch numbering")
    val latest = funnel.filter(_.getAs[Long]("batch_id") == lastB2)
      .map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_docs")).toMap
    val batch = graft.queries.TextQueries.p03CurationFunnel(spark, dd)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(latest == batch, s"funnel diverged after restart: stream=$latest batch=$batch")
  }
}
