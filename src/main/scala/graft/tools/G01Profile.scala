package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for g01 pagerank (r11, VERDICT r10 task 7): GraphGate
  * times the whole query once per JVM, which at the 100× replica swings
  * ±40% between runs — too noisy to see where the superstep rework lands.
  * This tool re-runs g01's exact structure with a wall-clock per phase
  * (pair derivation, edge+degree build, supersteps, final materialize) so
  * the "engine constant vs the in-memory kernel" can be attributed to a
  * phase instead of guessed.
  *
  * Usage: runMain graft.tools.G01Profile <sfDir> [reps]
  */
object G01Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.FastLocalDir.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.TextQueries

    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val phases = (1 to reps).map { rep =>
      val (tPairs, pairs) = t(TextQueries.d03MinHashPairs(spark, dir).localCheckpoint(true))
      val (tEdges, edgesDeg) = t {
        val edges = pairs.selectExpr("a AS src", "b AS dst")
          .union(pairs.selectExpr("b AS src", "a AS dst"))
          .repartition(n, col("src"))
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        edges.join(deg, "src").sortWithinPartitions("src").localCheckpoint(true)
      }
      val (tDocs, docIds) = t(graft.queries.Tables.documents(spark, dir).select("doc_id")
        .repartition(n, col("doc_id")).sortWithinPartitions("doc_id").localCheckpoint(true))
      var ranks = docIds.selectExpr("doc_id", s"CAST(${TextQueries.PrScale} AS BIGINT) AS r")
      val stepSecs = (1 to TextQueries.PrIters).map { i =>
        val (sec, next) = t {
          val contrib = edgesDeg
            .join(ranks.withColumnRenamed("doc_id", "src"), "src")
            .selectExpr("dst", "r div deg AS c")
            .groupBy("dst").agg(sum(col("c")).as("in_sum"))
          val updated = docIds.join(contrib, col("doc_id") === col("dst"), "left")
            .selectExpr("doc_id",
              s"CAST((15 * ${TextQueries.PrScale}) div 100 + (85 * coalesce(in_sum, CAST(0 AS BIGINT))) div 100 AS BIGINT) AS r")
          if (i % 2 == 0) updated.localCheckpoint(true) else updated
        }
        ranks = next
        sec
      }
      val (tFinal, rows) = t(ranks.write.format("noop").mode("overwrite").save())
      val line = f"""{"rep":$rep,"pairs":$tPairs%.2f,"edges":$tEdges%.2f,"docs":$tDocs%.2f,""" +
        s""""steps":[${stepSecs.map(s => f"$s%.2f").mkString(",")}],""" +
        f""""final":$tFinal%.2f}"""
      System.err.println(s"[g01profile] $line")
      line
    }
    println(s"""{"sf_dir":"$dir","reps":${phases.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
