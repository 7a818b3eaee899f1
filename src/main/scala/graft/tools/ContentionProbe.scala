package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs ONLY the bench's contention sensors (no queries) and prints one
  * JSON line — the validation harness for the r10 contention gate
  * (VERDICT r9 "What's wrong" #1: the absolute CPU canary recorded a
  * machine BEST during a run whose shuffle path was 10–63× degraded by
  * memory/scratch-state pressure, so the gate needs a sensor on the path
  * that actually fails).
  *
  * Demonstration protocol (CONTENTIONGATE.json):
  *  1. idle leg — all sensors green;
  *  2. hog leg — a second process holds most of physical RAM while this
  *     probe runs: the CPU canary (single-thread memory streaming over a
  *     10 MiB working set) stays green, while mem_pressure and/or the
  *     shuffle canary trip — proving the new sensors see exactly the
  *     failure mode the old gate was blind to.
  *
  * Reads the same BENCH_CANARY.json stored bests as the bench; never
  * writes them (a poisoned probe must not lower the bar).
  */
object ContentionProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.FastLocalDir.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stored(key: String): Double =
      try {
        val s = java.nio.file.Files.readString(java.nio.file.Paths.get("BENCH_CANARY.json"))
        (""""""" + java.util.regex.Pattern.quote(key) + """"\s*:\s*([0-9.]+)""").r
          .findFirstMatchIn(s).map(_.group(1).toDouble).getOrElse(0.0)
      } catch { case _: Throwable => 0.0 }

    val memTotal = graft.Bench.meminfoMb("MemTotal")
    val memAvail = graft.Bench.meminfoMb("MemAvailable")
    val cpuBest = stored("best_mbps")
    val cpuNow = graft.Bench.canaryMbps()
    // The stored shuffle best was recorded inside a Bench run whose JVM had
    // a full query-suite warmup behind it; a fresh probe JVM shuffles ~2x
    // slower until codegen/shuffle machinery compiles. Discard a full
    // canary call as warmup so the measured one runs at bench-equivalent
    // warmth (otherwise an IDLE probe false-trips the 50% bar).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val shufBest = stored(s"shuffle_best_krps_cpus$cpus")
    graft.Bench.shuffleCanaryKrps(spark) // warmup, discarded
    val shufNow = graft.Bench.shuffleCanaryKrps(spark)

    val cpuTrip = graft.Bench.canaryTrips(cpuNow, cpuBest)
    val shufTrip = graft.Bench.shuffleCanaryTrips(shufNow, shufBest)
    val memTrip = graft.Bench.memPressure(memAvail, memTotal)
    def f1(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    println(s"""{"mem_total_mb":$memTotal,"mem_avail_mb":$memAvail,""" +
      s""""cpu_canary_mbps":${f1(cpuNow)},"cpu_canary_best_mbps":${f1(cpuBest)},""" +
      s""""shuffle_krps":${f1(shufNow)},"shuffle_best_krps":${f1(shufBest)},""" +
      s""""cpu_canary_trip":$cpuTrip,"shuffle_trip":$shufTrip,"mem_pressure_trip":$memTrip,""" +
      s""""contended":${cpuTrip || shufTrip || memTrip}}""")
    spark.stop()
  }
}
