package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.testkit.{Props, SparkSpec}

/** The Misra-Gries aggregate's two guarantees must hold for EVERY stream
  * and EVERY partitioning (the merge path is the part Spark exercises that
  * a single-threaded MG never does): with k counters over n items,
  * estimate e(x) ∈ [c(x) − n/(k+1), c(x)], and every x with
  * c(x) > n/(k+1) is present in the summary. */
class MisraGriesSpec extends SparkSpec {

  private def sketch(items: Seq[String], k: Int, partitions: Int): Map[String, Long] = {
    GraftFunctions.register(spark)
    import spark.implicits._
    val row = items.toDF("item")
      .repartition(partitions)
      .agg(expr(s"mg_sketch(item, $k)").as("sk"))
      .collect()(0)
    row.getMap[String, Long](0).toMap
  }

  private def checkBounds(items: Seq[String], k: Int, partitions: Int): Unit = {
    val sk = sketch(items, k, partitions)
    assert(sk.size <= k, s"summary must hold at most $k counters, got ${sk.size}")
    val exact = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    val n = items.size.toLong
    val budget = n / (k + 1) // floor — the bound is c - n/(k+1) ≤ e ≤ c
    exact.foreach { case (item, c) =>
      val e = sk.getOrElse(item, 0L)
      assert(e <= c, s"$item: estimate $e exceeds true count $c")
      assert(e >= c - budget, s"$item: estimate $e below ${c - budget} (c=$c, n=$n, k=$k)")
      if (c * (k + 1) > n)
        assert(sk.contains(item), s"guaranteed heavy hitter $item (c=$c > n/${k + 1}) absent")
    }
    // nothing fabricated: every counter key was in the stream
    sk.keys.foreach(key => assert(exact.contains(key), s"summary invented item $key"))
  }

  test("skewed stream: heavy hitter present, all estimates in bounds, every partitioning") {
    val items = (1 to 600).map(i => if (i % 3 == 0) "hot" else s"cold${i % 37}")
    Seq(1, 3, 8, 32).foreach(p => checkBounds(items, k = 4, partitions = p))
  }

  test("uniform stream (no guaranteed hitters): bounds still hold") {
    val items = (1 to 500).map(i => s"u${i % 25}")
    checkBounds(items, k = 6, partitions = 7)
  }

  test("distinct ≤ k: sketch is exact") {
    val items = (1 to 300).map(i => s"t${i % 5}")
    val sk = sketch(items, k = 8, partitions = 5)
    assert(sk == items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong })
  }

  test("property: random Zipf-ish streams × random partitionings stay in bounds") {
    val gen = for {
      n <- Gen.choose(50, 400)
      zipf <- Gen.choose(1, 4)
      parts <- Gen.choose(1, 9)
      k <- Gen.choose(2, 7)
      items <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.const("a")), (4, Gen.const("b")),
        (2 * zipf, Gen.choose(0, 10).map(i => s"m$i")),
        (1, Gen.choose(0, 50).map(i => s"r$i"))))
    } yield (items, k, parts)
    Props.forAllN(gen, n = 12) { case (items, k, parts) =>
      checkBounds(items, k, parts)
    }
  }

  test("streaming aggregation: the sketch's bounds hold across micro-batches (state-store merge path)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    GraftFunctions.register(spark)
    val k = 4
    val items = (1 to 900).map(i => if (i % 3 == 0) "hot" else s"cold${i % 29}")
    val input = MemoryStream[String]
    val agg = input.toDF().toDF("item")
      .agg(expr(s"mg_sketch(item, $k)").as("sk"), count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("mgstream")
      .outputMode("complete").start()
    items.grouped(250).foreach { batch =>
      input.addData(batch: _*)
      q.processAllAvailable()
    }
    q.stop()
    val row = spark.sql("SELECT sk, n FROM mgstream").collect()(0)
    val sk = row.getMap[String, Long](0).toMap
    val n = row.getLong(1)
    assert(n == items.size.toLong)
    assert(sk.size <= k)
    // the streamed sketch accumulated across FOUR micro-batches through
    // the state store; the merge-tree-independent guarantees must survive
    val exact = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    val budget = n / (k + 1)
    exact.foreach { case (item, c) =>
      val e = sk.getOrElse(item, 0L)
      assert(e <= c && e >= c - budget, s"$item: e=$e c=$c budget=$budget")
      if (c * (k + 1) > n) assert(sk.contains(item), s"heavy hitter $item absent")
    }
  }

  test("a06 gate: both streams' guarantee flags are 1 and exact counts match SQL") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.TextQueries.a06HeavyHitters(spark, d).collect()
    assert(rows.nonEmpty, "a06 must find at least one guaranteed heavy hitter")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("present_ok")) == 1L, r.toString)
      assert(r.getLong(r.fieldIndex("est_ok")) == 1L, r.toString)
    }
    // the lang stream's guaranteed hitter at this SF is 'en' (~44% > 1/3)
    assert(rows.exists(r => r.getString(0) == "lang" && r.getString(1) == "en"))
  }
}
