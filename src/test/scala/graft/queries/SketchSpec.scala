package graft.queries

import graft.testkit.SparkSpec

/** Accuracy gate for the sketch aggregations (a01): HLL++ distinct counts
  * and approximate percentiles have no cross-engine oracle, so correctness
  * is bounded-error vs the exact values computed in the same query. */
class SketchSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("a01: HLL distinct within 5% of exact; percentiles within the value range") {
    val rows = RelationalQueries.a01SketchesRaw(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: approx $approx vs exact $exact")
      val p50 = r.getAs[Double]("p50_value")
      val p95 = r.getAs[Double]("p95_value")
      assert(p50 <= p95, s"p50 $p50 must not exceed p95 $p95")
    }
  }

  test("a01: deterministic across runs (sketches are content-addressed, not sampled)") {
    val a = RelationalQueries.a01SketchesRaw(spark, d).collect().map(_.toString).sorted.toSeq
    val b = RelationalQueries.a01SketchesRaw(spark, d).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("a01 gated output: every in-bounds flag is 1 (the oracle's claim holds)") {
    val rows = RelationalQueries.a01Sketches(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("users_in_bounds") == 1L, r.toString)
      assert(r.getAs[Long]("p50_rank_ok") == 1L, r.toString)
      assert(r.getAs[Long]("p95_rank_ok") == 1L, r.toString)
    }
  }
}
