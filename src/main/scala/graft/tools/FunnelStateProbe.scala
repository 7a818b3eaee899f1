package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Replica-scale state probe for the streaming curation funnel (r9,
  * VERDICT r8 task 3's "Done" evidence): drives
  * [[graft.streaming.EventStreams.curationFunnelBatch]] over a corpus in
  * three uneven chunks (the spec's split shape) and reports, per state
  * table, the MAX ROWS PER KEY (the funnel's scale contract: 1) and the
  * table cardinality after the final trigger. Run it at two scales
  * (sf0.1 and the /tmp/sf1 10x replica) and the per-key maximum stays
  * flat at 1 while docs grow 10x — state spreads across keys (bands /
  * colliding docs / sources), never pooling in one task.
  *
  * Usage: runMain graft.tools.FunnelStateProbe <sfDir> [label]
  * Prints one JSON line per run (append legs into FUNNELSTATE.json).
  */
object FunnelStateProbe {
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

    val stateDir = java.nio.file.Files.createTempDirectory("funnel-probe").toString
    val docs = graft.queries.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "lang", "source", "text")
      .localCheckpoint(true)
    val n = docs.count()
    // Three uneven chunks by doc_id RANK — cut at the exact 1/3 and 1/2
    // quantiles of the actual id distribution (relativeError=0 ⇒ exact).
    // NOT value arithmetic on n: replica doc_ids sit in 1e8-spaced copy
    // blocks, so (0, n/3, n/2) ranges would select only the original
    // copy's ids and silently probe a tenth of the corpus (the r9 bug:
    // both FUNNELSTATE legs reported identical state cardinalities).
    // approxQuantile returns an EMPTY array on an empty/all-null column —
    // degrade to degenerate cuts instead of a MatchError (an empty sfDir
    // would otherwise kill the probe mid-snapshot and leave malformed
    // FUNNELSTATE.json behind).
    val qs = docs.stat.approxQuantile("doc_id", Array(1.0 / 3, 0.5), 0.0)
    val cuts = if (qs.length < 2) Seq((0L, 0L), (0L, 0L), (0L, 1L)) else {
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      Seq((Long.MinValue, qs(0).toLong), (qs(0).toLong, qs(1).toLong),
        (qs(1).toLong, maxId + 1))
    }
    val t0 = System.nanoTime()
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      val chunk = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
      graft.streaming.EventStreams.curationFunnelBatch(spark, chunk, i.toLong, stateDir)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val v = cuts.size - 1L
    def shape(table: String, key: String): (Long, Long) = {
      val df = spark.read.parquet(s"$stateDir/$table/v=$v")
      if (df.isEmpty) (0L, 0L)
      else {
        val r = df.groupBy(key).count().agg(max("count"), count(lit(1))).head()
        (r.getLong(0), r.getLong(1))
      }
    }
    val tables = Seq("anchors" -> "band", "collide" -> "doc_id",
      "stars" -> "node", "counters" -> "src")
    val parts = tables.map { case (t, k) =>
      val (mx, card) = shape(t, k)
      s""""$t":{"max_rows_per_key":$mx,"rows":$card}"""
    }
    val funnel = spark.read.parquet(s"$stateDir/funnel")
    val lastBatch = funnel.agg(max("batch_id")).head().getLong(0)
    val stages = funnel.filter(col("batch_id") === lastBatch)
      .orderBy("stage").collect()
      .map(r => s""""${r.getAs[String]("stage_name")}":${r.getAs[Long]("n_docs")}""")
    println(s"""{"label":"$label","docs":$n,"sec":${f"$sec%.2f"},""" +
      parts.mkString("", ",", ",") + s""""funnel":{${stages.mkString(",")}}}""")
    graft.streaming.EventStreams.deleteTreePublic(java.nio.file.Paths.get(stateDir))
    spark.stop()
  }
}
