package graft.tools

import org.apache.spark.sql.SparkSession

/** Timed probe of named SparkEntry queries against an arbitrary sf dir:
  * `runMain graft.tools.ScaleProbe <dir> <query>...` — min of 2 passes
  * after a warmup, one JSON line. Used with [[ScaleUp]] to measure runtime
  * growth of the heavy-tail queries at 10× the bench scale factor.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleProbe <sfDir> <query>...")
    val dir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.FastLocalDir.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = names.map { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      def pass(): Double = {
        // same discipline as Bench (r13): every timed pass computes from
        // the parquet inputs — session caches dropped first
        graft.queries.TextQueries.clearSessionCaches(spark)
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // SPARK_GRAFT_PROBE_PASSES=1 → one timed pass, no per-query warmup:
      // the full-coverage 100× BENCH leg (every query measured once) would
      // otherwise triple its multi-hour wall time for precision the
      // ratio-statistics don't need (r8, VERDICT r7 task 2)
      val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "3").toInt
      val best =
        if (passes <= 1) pass()
        else { pass(); (2 to passes).map(_ => pass()).min }
      System.err.println(f"[probe] $name $best%.2f s")
      name -> best
    }
    val q = results.map { case (k, v) =>
      s""""$k":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))}"""
    }.mkString("{", ",", "}")
    println(s"""{"sf_dir":"$dir","queries":$q}""")
    spark.stop()
  }
}
