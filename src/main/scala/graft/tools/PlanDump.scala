package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for every `SparkEntry.queries` entry into
  * one file per query — the per-round plan evidence the optimization
  * deliverables ask for (`plans/rN/<query>_{before,after}.txt`).
  *
  * Usage: `sbt "runMain graft.tools.PlanDump [sfDir] [outDir] [suffix] [names...]"`
  * e.g.  `sbt "runMain graft.tools.PlanDump /root/testdata/sf0.1 plans/r12 before"`
  * With explicit query names only those are dumped (for the `after` pass).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = java.nio.file.Paths.get(args.lift(1).getOrElse("plans/r12"))
    val suffix = args.lift(2).getOrElse("before")
    val only = args.drop(3).toSet
    java.nio.file.Files.createDirectories(outDir)
    val spark = graft.core.FastLocalDir.configure(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name) || only.exists(name.startsWith)) {
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
          println(s"dumped $name")
        } catch {
          case e: Throwable => println(s"ERR $name: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
