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
    val spark = SparkSession.builder()
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
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      pass() // warmup
      val best = math.min(pass(), pass())
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
