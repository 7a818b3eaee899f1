package graft.queries

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** b01 / x03 / q21 — the round-3 additions: keyword scoring, epoch
  * shuffle, bloom semi-join. Each test verifies the registered query
  * against an independent formulation (Scala recomputation or the naive
  * single-pass plan the distributed decomposition must equal). */
class SearchShuffleBloomSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("b01: bm25 matches an exact driver-side recomputation (bit-for-bit)") {
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(t: String): Array[String] =
      t.toLowerCase(java.util.Locale.ROOT).trim.replaceAll("\\s+", " ").split(" ", -1)
    val terms = TextQueries.Bm25Terms
    val tf = docs.map { case (id, t) =>
      val ts = toks(t)
      id -> (ts.length.toLong, terms.map(q => ts.count(_ == q).toLong))
    }
    val n = tf.size.toLong
    val sumDl = tf.values.map(_._1).sum
    val dfs = terms.indices.map(i => tf.values.count(_._2(i) > 0).toLong)
    // the EXACT operation sequence of bm25TermSql, in Scala doubles
    val nD = n.toDouble; val avgdl = sumDl.toDouble / nD
    def score(dl: Double, tfs: Seq[Long]): Double =
      terms.indices.map { i =>
        val tfi = tfs(i).toDouble; val dfi = dfs(i).toDouble
        (((nD - dfi) + 0.5) / (dfi + 0.5)) *
          ((tfi * 2.2) / (tfi + (1.2 * (0.25 + ((0.75 * dl) / avgdl)))))
      }.reduceLeft(_ + _)
    val got = TextQueries.b01Bm25(spark, d).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val (dl, tfs) = tf(id)
      assert(r.getDouble(1) == score(dl.toDouble, tfs),
        s"doc $id: got ${r.getDouble(1)}, want ${score(dl.toDouble, tfs)}")
      terms.indices.foreach(i => assert(r.getLong(2 + i) == tfs(i)))
    }
    // scoring sanity: a doc with more query-term hits than another of the
    // same length scores higher (monotone tf saturation)
    assert(got.map(_.getDouble(1)).exists(_ > 0))
  }

  test("x03: two-level rank equals the global per-shard window") {
    val got = TextQueries.x03ShuffleShards(spark, d)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    import org.apache.spark.sql.expressions.Window
    val expect = Tables.documents(spark, d)
      .selectExpr("doc_id", "md5(CAST(doc_id AS STRING)) AS rk")
      .selectExpr("doc_id", "rk",
        s"CAST((instr('0123456789abcdef', substr(rk, 1, 1)) - 1) % ${TextQueries.ShuffleShards} AS BIGINT) AS shard")
      .withColumn("pos",
        row_number().over(Window.partitionBy("shard").orderBy(col("rk"), col("doc_id"))).cast("long"))
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    // every shard's positions are a contiguous 1..n permutation
    got.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).toVector.sorted
      assert(ps == (1L to ps.length.toLong).toVector, s"shard $shard not a permutation")
    }
  }

  test("q21: bloom-prefiltered join result is identical to the plain join") {
    val got = RelationalQueries.q21BloomJoin(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val o = Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT")
    val plain = Tables.lineitem(spark, d)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(month(col("o_orderdate")).cast("long").as("mth"))
      .agg(
        Tables.out6(sum(Tables.dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("revenue"),
        count(lit(1)).as("n_items"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == plain)
  }

  test("t11: merge-pair top-k matches a driver-side recomputation") {
    val texts = Tables.documents(spark, d).select("text").collect().map(_.getString(0))
    val counts = new scala.collection.mutable.HashMap[String, Long]
    texts.foreach { t =>
      val toks = t.toLowerCase(java.util.Locale.ROOT).trim.replaceAll("\\s+", " ").split(" ", -1)
      toks.sliding(2).filter(_.length == 2).foreach { p =>
        val k = p.mkString(" "); counts.update(k, counts.getOrElse(k, 0L) + 1L)
      }
    }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(TextQueries.MergePairK).zipWithIndex
      .map { case ((p, n), i) => (p, n, i + 1L) }.toSet
    val got = TextQueries.t11MergePairs(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("q22: pivot equals conditional aggregation, zeros for missing combos") {
    val got = RelationalQueries.q22Pivot(spark, d).collect()
      .map(r => r.getLong(0) -> (1 to 5).map(r.getLong).toVector).toMap
    val aggs = RelationalQueries.PivotEventTypes.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    val expect = Tables.events(spark, d)
      .groupBy(month(col("ts")).cast("long").as("mth"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 5).map(r.getLong).toVector).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("a02: top-k heavy keys match the window formulation; shares consistent") {
    val got = RelationalQueries.a02KeySkew(spark, d).collect()
    assert(got.length == RelationalQueries.SkewTopN)
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.lineitem(spark, d).groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
    val expect = counts
      .withColumn("rnk", row_number().over(Window.orderBy(col("cnt").desc, col("l_orderkey").asc)))
      .filter(col("rnk") <= RelationalQueries.SkewTopN)
      .select("l_orderkey", "cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
    val total = counts.agg(sum("cnt")).head.getLong(0)
    got.foreach(r => assert(r.getDouble(2) == r.getLong(1).toDouble / total.toDouble))
  }

  test("s08: recall evaluation emits one row per answered query; hits are 0/1") {
    val rows = SimilarityQueries.s08AnnRecall(spark, d).collect()
    // queries alone in their LSH bucket get NO answer from s03 and hence no
    // evaluation row (recall is undefined when the index returns nothing)
    val answered = SimilarityQueries.s03AnnLsh(spark, d).collect().map(_.getLong(0)).toSet
    assert(rows.length == answered.size && rows.map(_.getLong(0)).toSet == answered)
    assert(rows.nonEmpty && rows.length <= SimilarityQueries.QueryCount)
    rows.foreach { r =>
      val hit = r.getLong(2)
      assert(hit == 0L || hit == 1L)
      if (hit == 0L) assert(r.getDouble(3) > 0.0, "a miss must give up some cosine")
    }
    // cross-check hit against the two source queries directly
    val brute = SimilarityQueries.s01AnnTopK(spark, d).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val lsh = SimilarityQueries.s03AnnLsh(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val expectHit = brute(r.getLong(0)).contains(lsh(r.getLong(0)))
      assert((r.getLong(2) == 1L) == expectHit)
    }
  }

  test("q21: the probe-side bloom filter is visible in the plan") {
    val p = RelationalQueries.q21BloomJoin(spark, d)
      .queryExecution.executedPlan.toString
    // the codegen'd bloom pre-filter must sit on the lineitem scan side
    // (r4: Spark's BloomFilterMightContain expression, not a Scala UDF)
    assert(p.contains("might_contain"), p.take(2000))
  }
}
