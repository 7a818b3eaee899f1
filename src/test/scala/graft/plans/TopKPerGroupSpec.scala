package graft.plans

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** TopKPerGroup: custom logical node + strategy + exec. Results must equal
  * the window-function formulation; the plan must carry the partial/final
  * exec pair with one exchange between them. */
class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  // total order (value desc, then id via distinct values) for determinism:
  // values are unique per (g, id) by construction
  private def data = (0L until 2000L)
    .map(i => (i % 7, i, (i * 2654435761L) % 100003))
    .toDF("g", "id", "value")

  private def windowed(k: Int) = {
    import org.apache.spark.sql.expressions.Window
    data.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("value").desc, col("id"))))
      .filter(col("rn") <= k).drop("rn")
  }

  test("per-group top-k equals the window formulation, full schema preserved") {
    val got = TopKPerGroup(data, Seq("g"), "value", k = 5, desc = true)
    assert(got.columns.toSeq == Seq("g", "id", "value"))
    val exp = windowed(5).collect().map(_.toString).sorted.toSeq
    assert(got.collect().map(_.toString).sorted.toSeq == exp)
  }

  test("plan: partial + final execs with exactly one exchange between them") {
    val df = TopKPerGroup(data, Seq("g"), "value", k = 3, desc = true)
    df.collect()
    // AQE's toString appends the Initial Plan; audit the final tree only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("GraftTopKPartial") && p.contains("GraftTopKFinal"), p.take(2000))
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1,
      "partial topk must bound the exchange to groups×k rows:\n" + p.take(2000))
  }

  test("k larger than any group returns every row; empty grouping = global top-k") {
    val all = TopKPerGroup(data, Seq("g"), "value", k = 100000, desc = true)
    assert(all.count() == 2000)
    val global = TopKPerGroup(data, Seq.empty, "value", k = 4, desc = true)
      .select("value").as[Long].collect().toSet
    val expTop = data.orderBy(col("value").desc).limit(4)
      .select("value").as[Long].collect().toSet
    assert(global == expTop)
  }

  test("ascending order and unknown column error") {
    val asc = TopKPerGroup(data, Seq("g"), "value", k = 1)
      .select("g", "value").as[(Long, Long)].collect().toMap
    val exp = data.groupBy("g").agg(min("value")).as[(Long, Long)].collect().toMap
    assert(asc == exp)
    val e = intercept[IllegalArgumentException](TopKPerGroup(data, Seq("nope"), "value", 1))
    assert(e.getMessage.contains("nope"))
  }
}
