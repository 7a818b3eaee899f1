package graft.tools

import org.apache.spark.sql.SparkSession

/** Iteration harness for optimization work: times a named subset of
  * `SparkEntry.queries` through the same noop sink as the real bench, with
  * more passes so per-query minima converge — NOT a round artifact, just
  * the measure/fix/re-measure loop of the optimization guide §1.
  *
  * Usage: `sbt "runMain graft.tools.QuickBench q01 d04 t16 ..."`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_PASSES (default 6).
  */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "6").toInt
    val spark = graft.core.FastLocalDir.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }
    // one warmup pass over the selection (JIT/codegen/footers)
    sel.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"warmup ERR: ${e.getMessage}") }
    }
    val results = sel.map { case (name, fn) =>
      val ts = (1 to passes).map { _ =>
        // same discipline as Bench (r13): every timed pass computes from
        // the parquet inputs — session caches dropped first
        graft.queries.TextQueries.clearSessionCaches(spark)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${ts.min}%6.2f  passes=${ts.map(t => f"$t%.2f").mkString(",")}")
      name -> ts.min
    }
    println(f"TOTAL(min) ${results.map(_._2).sum}%8.2f over ${results.size} queries")
    spark.stop()
  }
}
