package graft.operators

import org.apache.spark.sql.functions._
import graft.testkit.SparkSpec

class TopKSpec extends SparkSpec {

  // total order: value desc, event_id asc as the unique tiebreaker
  private implicit val ord: Ordering[(String, Double, Long)] =
    Ordering.by[(String, Double, Long), (Double, Long)](t => (-t._2, t._3))

  test("matches the window row_number top-k on real events") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .as[(String, Double, Long)]

    val viaAgg = ev.groupByKey(_._1)
      .agg(TopK.aggregator[(String, Double, Long)](5).toColumn)
      .collect().toMap

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id"))
    val viaWindow = graft.queries.Tables.events(spark, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("r", row_number().over(w)).filter(col("r") <= 5)
      .as[(String, Double, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(t => (t._1, t._2, t._3)).toSeq).toMap

    assert(viaAgg.keySet == viaWindow.keySet)
    viaAgg.foreach { case (k, topk) =>
      assert(topk == viaWindow(k), s"group $k: $topk vs ${viaWindow(k)}")
    }
  }

  test("property: agrees with sort-and-take on random input; merge-order-proof") {
    import org.scalacheck.Gen
    val gen = Gen.listOfN(200, for {
      g <- Gen.oneOf("a", "b"); v <- Gen.chooseNum(0.0, 10.0); id <- Gen.chooseNum(0L, 10000L)
    } yield (g, v, id))
    graft.testkit.Props.forAllN(gen, n = 20) { rows =>
      import spark.implicits._
      val distinctIds = rows.distinctBy(_._3) // unique tiebreaker
      val ds = spark.createDataset(distinctIds).repartition(7) // force multi-partial merges
      val got = ds.groupByKey(_._1)
        .agg(TopK.aggregator[(String, Double, Long)](3).toColumn)
        .collect().toMap
      val want = distinctIds.groupBy(_._1).view.mapValues(_.sorted(ord).take(3).toSeq).toMap
      assert(got.view.mapValues(_.toList).toMap == want.view.mapValues(_.toList).toMap)
    }
  }

  test("plan: partial aggregation bounds what the exchange moves") {
    import spark.implicits._
    val ds = spark.range(1000).map(i => (s"g${i % 4}", i.toDouble, i.toLong))
    val agg = ds.groupByKey(_._1).agg(TopK.aggregator[(String, Double, Long)](3).toColumn)
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p.take(1500))
    assert(p.contains("partial"), "expected map-side partial aggregation:\n" + p.take(1500))
  }
}
