package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import graft.testkit.SparkSpec

/** The two-level binned prefix sum (r10, VERDICT r9 "What's wrong" #3):
  * row-identical to the flat single-partition window it replaces, and the
  * queries that adopted it carry NO unpartitioned window in their plans.
  */
class SpinePrefixSpec extends SparkSpec {

  test("two-level cumsum is row-identical to the flat unpartitioned window") {
    import spark.implicits._
    // spine spanning several blocks, including a negative-key region and
    // block-boundary keys (1023/1024), values both signs
    val rnd = new scala.util.Random(11)
    val spine = (-1500L to 4000L).map(k => (k, rnd.nextInt(100) - 30L, rnd.nextInt(50).toLong))
    val df = spine.toDF("h", "a", "b")
    val twoLevel = SpinePrefix.cumsum(df, "h", Seq("a" -> "ca", "b" -> "cb"))
      .select("h", "a", "b", "ca", "cb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val w = Window.orderBy(col("h")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flat = df.select(col("h"), col("a"), col("b"),
        sum("a").over(w).as("ca"), sum("b").over(w).as("cb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(twoLevel.toSeq == flat.toSeq && flat.nonEmpty)
  }

  test("i03/w10/t11/x04 plans carry no unpartitioned window") {
    val d = "/root/testdata/sf0.001"
    val plans = Seq(
      "i03" -> graft.queries.RelationalQueries.i03ActiveHours(spark, d),
      "w10" -> graft.queries.RelationalQueries.w10SlidingDistinct(spark, d),
      "t11" -> graft.queries.TextQueries.t11MergePairs(spark, d),
      "x04" -> graft.queries.TextQueries.x04Curriculum(spark, d))
    plans.foreach { case (name, df) =>
      val empty = df.queryExecution.optimizedPlan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
      assert(empty.isEmpty, s"$name still has ${empty.size} unpartitioned window(s)")
      // and the per-block windows that remain are all partitioned
      val all = df.queryExecution.optimizedPlan.collect { case w: LogicalWindow => w }
      assert(all.forall(_.partitionSpec.nonEmpty))
    }
  }
}
