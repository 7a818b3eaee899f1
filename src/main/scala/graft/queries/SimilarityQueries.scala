package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * Determinism: dot products are computed over `ARRAY<DOUBLE>` with a
  * sequential left-fold (`aggregate`), which is bit-identical to DuckDB's
  * `list_dot_product` on `DOUBLE[]` (verified empirically) — float→double
  * casts are exact and IEEE ops are deterministic given identical operand
  * order. Ranking ties break on vec_id.
  *
  * Scale path: s01 brute force is the O(n·q) baseline (fine when the query
  * set is small and broadcast). s03 is the LSH-bucketed variant: an 8-bit
  * sign bucket from anchor hyperplanes turns all-pairs search into a
  * per-bucket equi-join — the shape that survives 100 TB (bucket count
  * scales with data, candidates stay bounded).
  */
object SimilarityQueries {
  import Tables._

  val QueryCount = 10
  val TopK = 3
  val NearDupThreshold = 0.45
  val AnchorFrom = 100
  val AnchorCount = 8

  /** vec_id, v (double array), nrm (L2 norm). Dot products go through the
    * codegen'd [[graft.plans.VecDot]] expression — the HOF formulation
    * (`aggregate(zip_with(...))`) is bit-identical but evaluates interpreted
    * lambdas per row; same fold order, same results, compiled loop. */
  private def normed(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    embeddings(s, d).selectExpr(
      "vec_id",
      "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .selectExpr("vec_id", "v", "sqrt(vec_dot(v, v)) AS nrm")
  }

  private val dotExpr = "vec_dot(qv, v)"

  /** s01: brute-force cosine top-k for a broadcast query set. */
  def s01AnnTopK(s: SparkSession, d: String): DataFrame = {
    val all = normed(s, d)
    val queries = broadcast(
      all.filter(col("vec_id") < QueryCount).selectExpr("vec_id AS query_id", "v AS qv", "nrm AS qnrm"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    queries.crossJoin(all)
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id", s"$dotExpr / (qnrm * nrm) AS cosine")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .selectExpr("query_id", "vec_id AS neighbor_id", "rnk", "cosine")
  }

  /** Sequential dot product — the same left-to-right IEEE op order as the
    * SQL `aggregate` fold and DuckDB's `list_dot_product`, so results stay
    * bit-identical while running as a primitive JVM loop. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** s02: embedding-cosine near-duplicate pairs above threshold (the
    * embedding leg of the dedup family).
    *
    * Physical plan: all vectors broadcast (n·dim doubles — MBs for any
    * reasonable near-dup batch), pairs enumerated per-partition with a
    * primitive-array kernel — no shuffle, no codegen-unfriendly HOF lambda
    * in the O(n^2) hot loop. Brute force is the exact baseline; the
    * LSH-bucketed plan (s03) is the shape that scales past it.
    */
  def s02EmbedNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vecs = embeddings(s, d)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .as[(Long, Array[Double])]
    val all = vecs.collect().sortBy(_._1)
    val ids = all.map(_._1)
    val arrs = all.map(_._2)
    val norms = arrs.map(a => math.sqrt(dot(a, a)))
    val bc = s.sparkContext.broadcast((ids, arrs, norms))
    val threshold = NearDupThreshold
    vecs.mapPartitions { rows =>
      val (ids, arrs, norms) = bc.value
      rows.flatMap { case (aid, av) =>
        val an = math.sqrt(dot(av, av))
        ids.indices.iterator.flatMap { j =>
          if (ids(j) <= aid) Iterator.empty
          else {
            val c = dot(av, arrs(j)) / (an * norms(j))
            if (c >= threshold) Iterator.single((aid, ids(j), c)) else Iterator.empty
          }
        }
      }
    }.toDF("a", "b", "cosine")
  }

  /** s04: IVF-style ANN — each vector is assigned to the CELL of its
    * nearest anchor (argmax cosine over the 8 anchors, the "coarse
    * quantizer"); search touches only the query's cell. The other classic
    * scale path next to LSH (s03): cells partition the corpus, so a query
    * probes 1/k of the data. */
  def s04AnnIvf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = normed(s, d)
    val anchors = broadcast(
      all.filter(col("vec_id") >= AnchorFrom && col("vec_id") < AnchorFrom + AnchorCount)
        .selectExpr(s"vec_id - $AnchorFrom AS anchor_id", "v AS av", "nrm AS anrm"))
    val wCell = Window.partitionBy(col("vec_id")).orderBy(col("acos").desc, col("anchor_id"))
    val celled = all.crossJoin(anchors)
      .selectExpr("vec_id", "v", "nrm", "anchor_id",
        "vec_dot(v, av) / (nrm * anrm) AS acos")
      .withColumn("rk", row_number().over(wCell))
      .filter(col("rk") === 1)
      .selectExpr("vec_id", "v", "nrm", "anchor_id AS cell")
    val q = celled.filter(col("vec_id") < QueryCount)
      .selectExpr("vec_id AS query_id", "v AS qv", "nrm AS qnrm", "cell")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    q.join(celled.selectExpr("vec_id", "v", "nrm", "cell"), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "cell", "vec_id", s"$dotExpr / (qnrm * nrm) AS cosine")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .selectExpr("query_id", "cell", "vec_id AS neighbor_id", "cosine")
  }

  /** s03: LSH-bucketed ANN — bucket = sign bits of dot products with 8
    * anchor vectors; candidates share the bucket; top-1 within bucket. */
  def s03AnnLsh(s: SparkSession, d: String): DataFrame = {
    val all = normed(s, d)
    val anchors = broadcast(
      all.filter(col("vec_id") >= AnchorFrom && col("vec_id") < AnchorFrom + AnchorCount)
        .selectExpr(s"vec_id - $AnchorFrom AS anchor_id", "v AS av"))
    val bucketed = all.crossJoin(anchors)
      .selectExpr("vec_id", "v", "nrm", "anchor_id",
        "vec_dot(v, av) AS adot")
      .groupBy("vec_id")
      .agg(
        first(col("v")).as("v"), first(col("nrm")).as("nrm"),
        sum(expr("CASE WHEN adot > 0 THEN CAST(pow(2, anchor_id) AS BIGINT) ELSE 0 END")).as("bucket"))
    val q = bucketed.filter(col("vec_id") < QueryCount)
      .selectExpr("vec_id AS query_id", "v AS qv", "nrm AS qnrm", "bucket")
    val c = bucketed.selectExpr("vec_id", "v", "nrm", "bucket")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    q.join(c, "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "bucket", "vec_id", s"$dotExpr / (qnrm * nrm) AS cosine")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .selectExpr("query_id", "bucket", "vec_id AS neighbor_id", "cosine")
  }
}
