package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * Determinism: dot products are computed over `ARRAY<DOUBLE>` with a
  * sequential left-fold (the codegen'd [[graft.plans.VecDot]]), which is
  * bit-identical to DuckDB's `list_dot_product` on `DOUBLE[]` (verified
  * empirically) — float→double casts are exact and IEEE ops are
  * deterministic given identical operand order. Ranking ties break on
  * vec_id.
  *
  * Scale shape of each query:
  *  - s01 brute force is the O(n·q) baseline (fine when the query set is
  *    small and broadcast; the corpus is only scanned, never shuffled).
  *  - s02 exact near-dup is intrinsically all-pairs; it runs as a
  *    block-pair join (every unordered block pair is one task holding
  *    2·n/B vectors) — the standard distributed exact formulation: no
  *    driver materialization, memory per task bounded by the block size,
  *    O(n²/B²) work per task across B(B+1)/2 tasks.
  *  - s03/s04 are the sublinear paths: bucket (LSH sign bits) / cell
  *    (IVF argmax) are computed NARROWLY per row against the broadcast
  *    anchor set — the corpus is never shuffled to be assigned; only the
  *    (small) per-bucket candidate lists move.
  */
object SimilarityQueries {
  import Tables._

  val QueryCount = 10
  val TopK = 3
  val NearDupThreshold = 0.45
  val AnchorFrom = 100
  val AnchorCount = 8

  /** Minimum block count for the s02 exact all-pairs join. Per task memory
    * is 2·(n/B)·dim·8 bytes; [[nearDupBlocks]] raises B with the corpus so
    * one task's two blocks always fit (B(B+1)/2 evenly-sized tasks; 8 →
    * 36 tasks at test SFs). */
  val NearDupBlocks = 8

  /** Vectors one block may hold — the per-task memory budget (2 blocks ×
    * 2000 × dim·8 B ≈ 2 MB at dim 64). Exact for ANY B (same rule as
    * [[graft.queries.TextQueries.jaccardBlocks]], implemented in r4). */
  val NearDupBlockVecs = 2000L

  def nearDupBlocks(corpusSize: Long): Int =
    math.max(NearDupBlocks,
      ((corpusSize + NearDupBlockVecs - 1) / NearDupBlockVecs).toInt)

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

  /** The anchor set as ONE row (`anchors: array<struct<aid,v,nrm>>`, sorted
    * by anchor id) — broadcast to every task so bucket/cell assignment is a
    * narrow projection. Anchor count is a fixed constant (8), so this is
    * bounded regardless of corpus size. */
  private def anchorsRow(s: SparkSession, d: String): DataFrame =
    anchorsRowK(s, d, AnchorCount)

  /** Anchor row with a CALLER-CHOSEN count (d13's adaptive quantizer);
    * still one broadcast row — K ≤ √n keeps it small at any corpus size
    * (√(10¹²) anchors × a few hundred bytes ≪ a broadcast threshold). */
  private def anchorsRowK(s: SparkSession, d: String, k: Int): DataFrame =
    normed(s, d)
      .filter(col("vec_id") >= AnchorFrom && col("vec_id") < AnchorFrom + k)
      .selectExpr(s"CAST(vec_id - $AnchorFrom AS BIGINT) AS aid", "v", "nrm")
      .groupBy()
      .agg(sort_array(collect_list(struct(col("aid"), col("v"), col("nrm")))).as("anchors"))

  /** d13's quantizer size: K = max(8, ⌈√n⌉) — the SemDeDup paper's K ∝ √n
    * sizing, so per-cell pair work is Σ|cell|² ≈ n^1.5/… instead of n²/8.
    * MUST match the oracle's `greatest(8, ceil(sqrt(count(*))))`. */
  def semanticCells(n: Long): Int =
    math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)

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
    * bit-identical while running as a primitive JVM loop. (dot(a,b) is also
    * bit-equal to dot(b,a): per-element products commute exactly and the
    * accumulation order is the element order either way.) */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** s02: embedding-cosine near-duplicate pairs above threshold (the
    * embedding leg of the dedup family) — EXACT all-pairs, distributed.
    *
    * Physical plan: each vector is assigned block `vec_id % B` and
    * replicated to the B unordered block pairs containing its block; one
    * `flatMapGroups` task per block pair enumerates pairs with a primitive
    * dot-product kernel. Nothing is collected to the driver, each task
    * holds at most 2·n/B vectors, and every unordered vector pair is
    * examined in exactly one task. Exact near-dup is intrinsically O(n²);
    * raising B spreads that work without replicating it (replication factor
    * is B, work per task n²/B²). The sublinear approximate path is s03. */
  def s02EmbedNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val b = nearDupBlocks(embeddings(s, d).count())
    val threshold = NearDupThreshold
    val vecs = embeddings(s, d)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .as[(Long, Array[Double])]
    vecs
      .flatMap { case (id, v) =>
        val blk = (id % b).toInt
        (0 until b).iterator.map { o =>
          val lo = math.min(blk, o)
          val hi = math.max(blk, o)
          (lo * b + hi, blk, id, v)
        }
      }
      .groupByKey(_._1)
      .flatMapGroups { (gk: Int, it: Iterator[(Int, Int, Long, Array[Double])]) =>
        val i = gk / b
        val j = gk % b
        val left = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
        val right = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
        it.foreach { case (_, blk, id, v) =>
          val entry = (id, v, math.sqrt(dot(v, v)))
          if (blk == i) left += entry else right += entry
        }
        def pairs(a: (Long, Array[Double], Double), c: (Long, Array[Double], Double)) = {
          val cos = dot(a._2, c._2) / (a._3 * c._3)
          if (cos >= threshold) {
            if (a._1 < c._1) Iterator.single((a._1, c._1, cos))
            else Iterator.single((c._1, a._1, cos))
          } else Iterator.empty
        }
        if (i == j)
          left.indices.iterator.flatMap { x =>
            (x + 1 until left.length).iterator.flatMap(y => pairs(left(x), left(y)))
          }
        else
          left.iterator.flatMap(a => right.iterator.flatMap(c => pairs(a, c)))
      }
      .toDF("a", "b", "cosine")
  }

  /** LSH bucket = 8 sign bits vs the broadcast anchors — one narrow
    * projection per row, 8 codegen'd vec_dot calls, zero shuffle. */
  private def bucketExprFor(vcol: String): String =
    (0 until AnchorCount)
      .map(k => s"(CASE WHEN vec_dot($vcol, anchors[$k].v) > 0 THEN CAST(${1L << k} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")

  private def bucketExpr: String = bucketExprFor("v")

  /** The static LSH index of the corpus — (vec_id, v, nrm, bucket) — the
    * lookup side of online ANN serving
    * ([[graft.streaming.EventStreams.annServe]]); same narrow sign-bit
    * assignment as s03 (the corpus is never shuffled to be indexed). */
  def lshIndex(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    normed(s, d).crossJoin(broadcast(anchorsRow(s, d)))
      .selectExpr("vec_id", "v", "nrm", s"$bucketExpr AS bucket")
  }

  /** Assign incoming query vectors (query_id, q) their LSH bucket + norm —
    * the query-side projection of the same index; works on streams (the
    * 1-row anchor frame is a broadcast crossJoin, stateless). */
  def lshAssignQueries(queries: DataFrame, s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    queries.crossJoin(broadcast(anchorsRow(s, d)))
      .selectExpr("query_id", "q", "sqrt(vec_dot(q, q)) AS qnrm",
        s"${bucketExprFor("q")} AS bucket")
  }

  /** IVF cell = argmax cosine over the broadcast anchors (first index on
    * ties — same as `row_number ... ORDER BY acos DESC, anchor_id`). */
  private def cellExprs: (String, String) = {
    val scores = (0 until AnchorCount)
      .map(k => s"vec_dot(v, anchors[$k].v) / (nrm * anchors[$k].nrm)")
      .mkString("array(", ", ", ")")
    (scores, "CAST(array_position(acells, array_max(acells)) - 1 AS BIGINT)")
  }

  /** s04: IVF-style ANN — each vector is assigned to the CELL of its
    * nearest anchor (argmax cosine over the 8 anchors, the "coarse
    * quantizer"); search touches only the query's cell. Cell assignment is
    * a narrow projection against the broadcast single-row anchor set — the
    * corpus is never shuffled to be quantized (the crossJoin is a
    * BroadcastNestedLoopJoin with ONE row on the build side). */
  def s04AnnIvf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (scores, cell) = cellExprs
    val celled = normed(s, d).crossJoin(broadcast(anchorsRow(s, d)))
      .selectExpr("vec_id", "v", "nrm", s"$scores AS acells")
      .selectExpr("vec_id", "v", "nrm", s"$cell AS cell")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    broadcast(celled.filter(col("vec_id") < QueryCount)
      .selectExpr("vec_id AS query_id", "v AS qv", "nrm AS qnrm", "cell"))
      .join(celled.selectExpr("vec_id", "v", "nrm", "cell"), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "cell", "vec_id", s"$dotExpr / (qnrm * nrm) AS cosine")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .selectExpr("query_id", "cell", "vec_id AS neighbor_id", "cosine")
  }

  /** s08: ANN RECALL EVALUATION — the measurement step every approximate
    * index needs before it replaces the exact search: for each query, did
    * s03's LSH-bucketed top-1 land inside the brute-force top-[[TopK]]
    * (hit), and how much cosine similarity did the approximation give up
    * (cos_gap = brute best − lsh best; 0.0 when the bucket contained the
    * true nearest neighbor)? This is how bands/probes get tuned: raise
    * anchors until recall at the target k stops paying for the extra
    * candidate work.
    *
    * Scale shape: the brute leg is evaluated over the (constant-sized,
    * broadcast) query SAMPLE only — the standard practice: recall is
    * estimated on a sample because the exact search is exactly what the
    * index exists to avoid. Both legs reuse the registered queries
    * verbatim, so the evaluation measures precisely what users run; the
    * join keys on query_id (tiny). A query alone in its bucket gets no
    * s03 answer and hence no evaluation row — recall is undefined when
    * the index returns nothing (both engines agree by inner join).
    * Exactness: both cosines come from the same codegen'd fold, the gap
    * is one correctly-rounded subtraction. */
  def s08AnnRecall(s: SparkSession, d: String): DataFrame = {
    val bs = s01AnnTopK(s, d).groupBy("query_id").agg(
      sort_array(collect_list(col("neighbor_id"))).as("brute_ids"),
      max(when(col("rnk") === 1, col("cosine"))).as("best_cos"))
    val lsh = s03AnnLsh(s, d).select(col("query_id"),
      col("neighbor_id").as("lsh_neighbor"), col("cosine").as("lsh_cos"))
    bs.join(lsh, "query_id")
      .selectExpr("query_id", "lsh_neighbor",
        "CAST(CASE WHEN array_contains(brute_ids, lsh_neighbor) THEN 1 ELSE 0 END AS BIGINT) AS hit",
        "best_cos - lsh_cos AS cos_gap")
  }

  /** s05: int8 embedding quantization — the storage/bandwidth compression
    * step of a 100 TB embedding store (fp32 → uint8 per-vector affine
    * quantization: q_i = round((v_i − min) / (max − min) · 255), 4×
    * smaller before any codec). Pure narrow projection, zero shuffle; the
    * quantized codes are fingerprinted (md5 of the comma-joined codes) so
    * the oracle verifies every code exactly, plus the max absolute
    * reconstruction error per vector as the quality metric (identical
    * IEEE sequences both engines; round() is half-away-from-zero for the
    * non-negative scaled values in both). Constant vectors (max == min)
    * quantize to all-zero codes by definition. */
  /** k-means parameters (s06): K centroids seeded from the first K vectors
    * (deterministic), symmetric integer quantization at QScale, two
    * assignment rounds around one centroid update — the IVF/PQ codebook
    * TRAINING step that s04's cell search consumes. */
  val KMeansK = 8
  val KMeansQScale = 128

  /** s06: quantized k-means (spherical codebook training) with EXACT
    * integer arithmetic end-to-end, so the oracle matches bit-for-bit:
    * vectors are quantized to integer-valued doubles (round(x·128)), all
    * distances are squared-L2 built from [[graft.plans.VecDot]] dot
    * products of integer-valued doubles (exact below 2^53), and the
    * centroid update floors the per-dimension mean — no
    * floating-point-accumulation ambiguity anywhere, under ANY row or
    * partition order on either engine.
    *
    * Scale shape (the classic distributed Lloyd's): centroids are K·dim
    * driver-side constants — assignment is a NARROW projection against
    * literal centroid arrays (corpus never shuffles); the update shuffles
    * only (cluster, dim) partial sums — K·dim·partitions rows with partial
    * aggregation, independent of corpus size; the two driver collects are
    * K·dim = 512 values each, bounded by model size, not data size (the
    * same bound every distributed k-means — e.g. Spark MLlib's — accepts).
    * Empty clusters keep their previous centroid. */
  def s06KMeans(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    import s.implicits._
    val q = embeddings(s, d).selectExpr(
      "vec_id",
      s"transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(CAST(round(x * $KMeansQScale) AS INT) AS DOUBLE)) AS q")

    def arrSql(c: Array[Double]) =
      s"array(${c.map(v => s"CAST(${v.toLong} AS DOUBLE)").mkString(",")})"

    /** cluster + squared-L2 distance columns for the given centroids:
      * dist_k = q·q + c_k·c_k − 2·q·c_k, argmin with first-wins tie-break
      * (= lowest cluster id, matching the oracle's min(k)). */
    def assign(cents: Array[Array[Double]]): DataFrame = {
      val distSqls = cents.map { c =>
        val cc = c.map(v => v * v).sum.toLong
        s"(vec_dot(q, q) + CAST($cc AS DOUBLE) - 2 * vec_dot(q, ${arrSql(c)}))"
      }
      q.selectExpr("vec_id", "q", s"array(${distSqls.mkString(",")}) AS dists")
        .selectExpr("vec_id", "q",
          "CAST(array_position(dists, array_min(dists)) - 1 AS BIGINT) AS cluster",
          "array_min(dists) AS dist")
    }

    // deterministic init: quantized vectors of vec_id 0..K-1, id order
    var cents: Array[Array[Double]] = q.filter(col("vec_id") < KMeansK)
      .orderBy("vec_id").select("q").as[Seq[Double]].collect().map(_.toArray)
    val dim = cents(0).length

    // one centroid update from the first assignment (floored per-dim mean;
    // only (cluster, dim) partial sums shuffle — bounded by model size)
    val sums = assign(cents)
      .selectExpr("cluster", "posexplode(q) AS (pos, val)")
      .groupBy("cluster", "pos")
      .agg(sum("val").as("s"), count(lit(1)).as("n"))
      .collect()
    val next = Array.tabulate(KMeansK)(k => cents(k).clone())
    sums.foreach { r =>
      val k = r.getLong(0).toInt
      next(k)(r.getInt(1)) = math.floor(r.getDouble(2) / r.getLong(3))
    }
    cents = next

    // second assignment against the updated codebook → cluster census
    assign(cents)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        sum("dist").cast("long").as("inertia"))
  }

  /** PQ geometry (s07): 64 dims → 4 subspaces × 16 dims, 4 codes per
    * subspace seeded from the first 4 vectors' subvectors. */
  val PqSubspaces = 4
  val PqSubDim = 16
  val PqCodes = 4

  /** s07: PRODUCT-QUANTIZATION encode — each vector becomes
    * [[PqSubspaces]] small codes (argmin centroid per subspace) plus the
    * exact integer reconstruction error. With s05 (scalar quantization)
    * and s06 (codebook training) this completes the embedding-compression
    * family: PQ is how a 100 TB vector store fits RAM (64 floats → 4
    * bytes here; real deployments use 8–16 subspaces × 256 codes — same
    * shape, bigger literals). Same exactness contract as s06: integer-
    * valued doubles end-to-end, so argmin and error match the oracle
    * bit-for-bit under any partitioning.
    *
    * Scale shape: codebooks are model-size constants (subvectors of the
    * first [[PqCodes]] vectors, quantized) — encoding is ONE narrow
    * projection against literal centroid arrays; nothing shuffles. */
  def s07PqEncode(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    import s.implicits._
    val q = embeddings(s, d).selectExpr(
      "vec_id",
      s"transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(CAST(round(x * $KMeansQScale) AS INT) AS DOUBLE)) AS q")
    // codebooks: PqCodes × PqSubspaces subvectors, driver-side constants
    val seeds: Array[Array[Double]] = q.filter(col("vec_id") < PqCodes)
      .orderBy("vec_id").select("q").as[Seq[Double]].collect().map(_.toArray)
    def arrSql(c: Array[Double]) =
      s"array(${c.map(v => s"CAST(${v.toLong} AS DOUBLE)").mkString(",")})"
    val distCols = (0 until PqSubspaces).map { m =>
      val off = m * PqSubDim
      val dists = (0 until PqCodes).map { kc =>
        val c = seeds(kc).slice(off, off + PqSubDim)
        val cc = c.map(v => v * v).sum.toLong
        s"(vec_dot(sub$m, sub$m) + CAST($cc AS DOUBLE) - 2 * vec_dot(sub$m, ${arrSql(c)}))"
      }
      s"array(${dists.mkString(",")}) AS dists$m"
    }
    q.selectExpr(Seq("vec_id") ++
        (0 until PqSubspaces).map(m => s"slice(q, ${m * PqSubDim + 1}, $PqSubDim) AS sub$m"): _*)
      .selectExpr(Seq("vec_id") ++ distCols: _*)
      .selectExpr(Seq("vec_id") ++
        (0 until PqSubspaces).map(m =>
          s"CAST(array_position(dists$m, array_min(dists$m)) - 1 AS BIGINT) AS code$m") :+
        s"CAST(${(0 until PqSubspaces).map(m => s"array_min(dists$m)").mkString(" + ")} AS BIGINT) AS recon_err": _*)
  }

  def s05Quantize(s: SparkSession, d: String): DataFrame = {
    embeddings(s, d)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .selectExpr("vec_id", "v",
        "array_min(v) AS mn", "array_max(v) AS mx")
      .selectExpr("vec_id", "v", "mn", "mx",
        "CASE WHEN mx = mn THEN transform(v, x -> 0) " +
          "ELSE transform(v, x -> CAST(round((x - mn) / (mx - mn) * 255) AS INT)) END AS q")
      .selectExpr(
        "vec_id", "mn", "mx",
        "md5(CAST(array_join(q, ',') AS BINARY)) AS q_md5",
        // 255.0 would parse as a DECIMAL literal in Spark (decimal division
        // rounds to scale and diverges from the oracle's double division in
        // the 7th digit) — force the double with a D suffix
        "CASE WHEN mx = mn THEN CAST(0 AS DOUBLE) " +
          "ELSE array_max(zip_with(q, v, (a, b) -> abs(a / 255.0D * (mx - mn) + mn - b))) END AS max_err")
  }

  /** s03: LSH-bucketed ANN — bucket = sign bits of dot products with 8
    * anchor vectors; candidates share the bucket; top-1 within bucket.
    * Bucket assignment is a narrow projection (no corpus shuffle); the
    * tiny query side is broadcast into the bucket equi-join, so the only
    * exchange left is the per-query candidate window. */
  /** s09: MULTI-PROBE LSH ANN — s03 with the standard recall fix: each
    * query probes its own bucket PLUS the [[AnchorCount]] buckets at
    * Hamming distance 1 (one sign bit flipped — the nearest-boundary
    * buckets where a true neighbor most likely hides), then exact cosine
    * re-ranks the union. Multi-probe buys recall without adding anchors:
    * candidate volume grows ~9× while bucket count (and index size) stays
    * fixed — cheaper than halving bucket bits for the same recall
    * (Lv et al., VLDB'07 "Multi-Probe LSH").
    *
    * Scale: the probe explosion happens on the (broadcast, sample-sized)
    * QUERY side only — 9 rows per query; the corpus keeps its one bucket
    * per row. The final argmax is an AGGREGATE of (cosine, -vec_id)
    * structs (q23's partial-aggregable shape) — no per-query sort window,
    * so the exchange moves one row per (query, partition). `n_cand`
    * exposes the probe width the tuner pays. */
  def s09AnnMultiprobe(s: SparkSession, d: String): DataFrame = {
    val bucketed = normed(s, d).crossJoin(broadcast(anchorsRow(s, d)))
      .selectExpr("vec_id", "v", "nrm", s"($bucketExpr) AS bucket")
    val probeList = ("bucket" +: (0 until AnchorCount)
      .map(k => s"CAST(bucket ^ ${1L << k} AS BIGINT)")).mkString("array(", ", ", ")")
    val q = broadcast(bucketed.filter(col("vec_id") < QueryCount)
      .selectExpr("vec_id AS query_id", "v AS qv", "nrm AS qnrm",
        s"explode($probeList) AS probe"))
    q.join(bucketed.selectExpr("vec_id", "v", "nrm", "bucket"),
        col("probe") === col("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id", s"$dotExpr / (qnrm * nrm) AS cosine")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_cand"),
        max(struct(col("cosine"), (-col("vec_id")).as("negid"))).as("m"))
      .selectExpr("query_id", "CAST(-m.negid AS BIGINT) AS neighbor_id",
        "m.cosine AS cosine", "n_cand")
  }

  /** Cosine floor for s10 range search — 0.3 yields a non-trivial result
    * band at every test SF (0.4 leaves sf0.001 empty). */
  val RangeTau = 0.3

  /** s10: RANGE (radius) search — every corpus vector within cosine ≥
    * [[RangeTau]] of each broadcast query: the "all matches above a
    * similarity floor" API (retrieval dedup gates, near-dup cluster
    * seeding, RAG recall floors) that top-k ANN (s01/s03/s04) cannot
    * answer, because k is unknown a priori. Unlike s01 there is no
    * ranking, hence no window and NO shuffle at all: broadcast query row ×
    * corpus scan → narrow filter, one codegen span over the scan —
    * embarrassingly parallel at any corpus size; the only data movement is
    * the fixed-size query-set broadcast. The threshold compare is exact
    * cross-engine because the [[graft.plans.VecDot]] fold is bit-identical
    * to DuckDB's `list_dot_product` (see object Scaladoc). */
  /** s11: IVF-PQ with ADC scoring — the full architecture of a
    * RAM-resident billion-vector ANN index (FAISS's IVFPQ): a coarse
    * quantizer routes each vector to its nearest anchor CELL (s04's IVF),
    * the vector's RESIDUAL from that cell centroid is product-quantized
    * to [[PqSubspaces]] codes (s07's PQ, applied where real systems apply
    * it — on residuals, which are smaller and quantize better), and a
    * query scores candidates WITHOUT reconstructing them: one
    * [[PqCodes]]-entry lookup table per subspace (distance from the
    * query's residual subvector to each codebook centroid), then the
    * approximate distance of a candidate is just [[PqSubspaces]] table
    * lookups summed — Asymmetric Distance Computation (Jégou et al.,
    * PAMI 2011). Top-1 per query by (adc ASC, vec_id ASC).
    *
    * Exactness: everything runs on [[KMeansQScale]]-quantized
    * integer-valued doubles (s06/s07's convention), so cells, codes,
    * tables, and ADC sums are all exact integers — the oracle matches
    * bit-for-bit under any partitioning.
    *
    * Scale shape: anchors and codebooks are model-size driver constants
    * (8 + 4 short vectors — the s07-adjudicated pattern); cell assignment,
    * residual, and PQ encode are ONE narrow projection against literal
    * arrays (zero joins, corpus never shuffled); queries carry their ADC
    * tables into a broadcast-hash join on cell; the only exchange is the
    * final per-query argmin, partial-agg'd to one row per (query,
    * partition). At 100 TB the corpus is scanned once, narrow. */
  def s11IvfPqAdc(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    import s.implicits._
    val qExpr =
      s"transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(CAST(round(x * $KMeansQScale) AS INT) AS DOUBLE)) AS qd"
    val q = embeddings(s, d).selectExpr("vec_id", qExpr)

    // model constants: 8 quantized anchors (cell centroids) + 4 seed
    // vectors whose residuals become the PQ codebooks — all bounded.
    // ONE collect job for both bounded sets (r12; previously two scans).
    val modelVecs: Array[(Long, Array[Double])] =
      q.filter(s"vec_id < $PqCodes OR (vec_id >= $AnchorFrom AND vec_id < ${AnchorFrom + AnchorCount})")
        .orderBy("vec_id").as[(Long, Seq[Double])]
        .collect().map { case (id, v) => (id, v.toArray) }
    val anchors: Array[Array[Double]] =
      modelVecs.filter { case (id, _) => id >= AnchorFrom && id < AnchorFrom + AnchorCount }.map(_._2)
    val seedQd: Array[Array[Double]] = modelVecs.filter(_._1 < PqCodes).map(_._2)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); acc += t * t; i += 1 }
      acc
    }
    // seed residuals (the PQ codebooks), via each seed's own cell
    val seedResid: Array[Array[Double]] = seedQd.map { sv =>
      val cell = anchors.indices.minBy(k => (l2(sv, anchors(k)), k))
      sv.indices.map(i => sv(i) - anchors(cell)(i)).toArray
    }

    def arrSql(c: Array[Double]) =
      s"array(${c.map(v => s"CAST(${v.toLong} AS DOUBLE)").mkString(",")})"
    // cell = argmin_k ||qd - anchor_k||^2 (expanded: qq + aa - 2*q.a)
    val aDists = anchors.zipWithIndex.map { case (a, k) =>
      val aa = a.map(v => v * v).sum.toLong
      s"(vec_dot(qd, qd) + CAST($aa AS DOUBLE) - 2 * vec_dot(qd, ${arrSql(a)}))"
    }
    val anchorsLit = s"array(${anchors.map(arrSql).mkString(",")})"
    val celled = q
      .selectExpr("vec_id", "qd", s"array(${aDists.mkString(",")}) AS adists")
      .selectExpr("vec_id", "qd",
        "CAST(array_position(adists, array_min(adists)) - 1 AS BIGINT) AS cell")
      .selectExpr("vec_id", "cell",
        s"zip_with(qd, element_at($anchorsLit, CAST(cell + 1 AS INT)), (x, a) -> x - a) AS r")
    // per-subspace code (corpus) and ADC lookup table (queries) share the
    // same literal-codebook distance arrays
    val distCols = (0 until PqSubspaces).map { m =>
      val off = m * PqSubDim
      val dists = (0 until PqCodes).map { kc =>
        val c = seedResid(kc).slice(off, off + PqSubDim)
        val cc = c.map(v => v * v).sum.toLong
        s"(vec_dot(sub$m, sub$m) + CAST($cc AS DOUBLE) - 2 * vec_dot(sub$m, ${arrSql(c)}))"
      }
      s"array(${dists.mkString(",")}) AS dists$m"
    }
    val subSliced = celled.selectExpr(Seq("vec_id", "cell") ++
      (0 until PqSubspaces).map(m => s"slice(r, ${m * PqSubDim + 1}, $PqSubDim) AS sub$m"): _*)
      .selectExpr(Seq("vec_id", "cell") ++ distCols: _*)
    val corpus = subSliced.selectExpr(Seq("vec_id", "cell") ++
      (0 until PqSubspaces).map(m =>
        s"CAST(array_position(dists$m, array_min(dists$m)) AS INT) AS code$m"): _*)
    val queries = subSliced.filter(col("vec_id") < QueryCount)
      .selectExpr(Seq("vec_id AS query_id", "cell AS qcell") ++
        (0 until PqSubspaces).map(m => s"dists$m AS table$m"): _*)
    val adcExpr = (0 until PqSubspaces)
      .map(m => s"element_at(table$m, code$m)").mkString(" + ")
    broadcast(queries)
      .join(corpus, col("qcell") === col("cell") && col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "cell", "vec_id", s"CAST($adcExpr AS BIGINT) AS adc")
      .groupBy("query_id")
      .agg(min(struct(col("adc"), col("vec_id"), col("cell"))).as("best"))
      .selectExpr("query_id", "best.cell AS cell",
        "best.vec_id AS neighbor_id", "best.adc AS adc_dist")
  }

  def s10RangeSearch(s: SparkSession, d: String): DataFrame = {
    val all = normed(s, d)
    val queries = broadcast(
      all.filter(col("vec_id") < QueryCount)
        .selectExpr("vec_id AS query_id", "v AS qv", "nrm AS qnrm"))
    queries.crossJoin(all)
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id AS neighbor_id",
        s"$dotExpr / (qnrm * nrm) AS cosine")
      .filter(col("cosine") >= RangeTau)
  }

  /** d13: SEMANTIC dedup — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embedding space with a coarse quantizer, then drop
    * near-duplicates WITHIN each cluster only — the trick that turns
    * O(n²) embedding dedup into Σ|cell|², because semantic duplicates
    * land in the same cell by construction (they are near the same
    * centroid). Cell assignment reuses s04's IVF argmax against the
    * broadcast anchor row (narrow — the corpus is never shuffled to be
    * assigned); the within-cell pair scan is a self-equi-join ON THE CELL
    * KEY, so Catalyst hash-joins per cell and only same-cell pairs are
    * ever scored (codegen'd `vec_dot`). Keeper rule is the deterministic
    * greedy form: drop a vector iff a SMALLER-id same-cell vector sits
    * within cosine ≥ [[NearDupThreshold]]; `rep` records the smallest
    * such pruner (self when kept) — the pair set alone defines the
    * output, so it is engine-reproducible.
    *
    * Scale shape: K = [[semanticCells]] = max(8, ⌈√n⌉) anchors — the
    * paper's K ∝ √n sizing MEASURED, not just claimed (r7: the fixed
    * 8-anchor toy constant measured 345× at the 100× replica — Σ|cell|²
    * with K frozen is n²/8; adaptive K keeps cells ~√n wide, measured
    * 209 s → 9 s at /tmp/sf10). Cell scoring is a `transform` lambda over
    * the broadcast anchor array, so the codegen size is CONSTANT in K —
    * the expanded per-anchor column form would hit method limits at
    * production K. The join key then has K values and the shuffle
    * spreads. No driver state, no global pair explosion — the exact
    * counterpart (s02) stays the documented-quadratic baseline, d13 is
    * the production path. */
  def d13SemanticDedup(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    val k = semanticCells(Tables.embeddings(s, d).count())
    val scores = "transform(anchors, a -> vec_dot(v, a.v) / (nrm * a.nrm))"
    val cell = "CAST(array_position(acells, array_max(acells)) - 1 AS BIGINT)"
    // pin ONE evaluation of the assigned corpus: it feeds the pair scan
    // twice and the final join once (the "persist the clustered corpus"
    // step of the real pipeline — same reason a01/d03 checkpoint)
    val celled = normed(s, d).crossJoin(broadcast(anchorsRowK(s, d, k)))
      .selectExpr("vec_id", "v", "nrm", s"$scores AS acells")
      .selectExpr("vec_id", "v", "nrm", s"$cell AS cell")
      .localCheckpoint(true)
    val probe = celled.selectExpr("vec_id AS a_id", "v AS av", "nrm AS anrm", "cell")
    val build = celled.selectExpr("vec_id AS b_id", "v AS bv", "nrm AS bnrm", "cell AS b_cell")
    val pruned = probe
      .join(build, col("cell") === col("b_cell") && col("b_id") < col("a_id"))
      .filter(expr(s"vec_dot(av, bv) / (anrm * bnrm) >= $NearDupThreshold"))
      .groupBy(col("a_id")).agg(min(col("b_id")).as("pruned_by"))
    celled.join(pruned, col("vec_id") === col("a_id"), "left")
      .selectExpr("vec_id", "cell",
        "coalesce(pruned_by, vec_id) AS rep",
        "CAST(CASE WHEN pruned_by IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep")
  }

  /** p02: CROSS-MODAL curation — the composition a multimodal corpus
    * actually ships through: the TEXT quality gate (t02 thresholds, the
    * p01 bar) ∩ the EMBEDDING-space semantic keepers (d13's SemDeDup
    * greedy survivors), joined on the shared document id. This is the
    * step where a modality-specific signal (embedding near-duplication)
    * prunes documents whose TEXT looks fine — exactly what SemDeDup adds
    * over pure text dedup.
    *
    * Scale shape: both legs keep their own locked plans (d13's cell
    * equi-join, t02's narrow projection); the final join co-keys on
    * doc_id and moves only (id, cell) + three quality columns — at 100 TB
    * the keeper set is the small side and broadcasts. */
  def p02SemanticCuration(s: SparkSession, d: String): DataFrame = {
    val keepers = d13SemanticDedup(s, d)
      .filter(col("keep") === 1L)
      .selectExpr("vec_id AS doc_id", "cell")
    val quality = TextQueries.t02Quality(s, d)
      .filter(col("n_tokens") >= TextQueries.CleanMinTokens &&
        col("ttr") >= TextQueries.CleanMinTtr)
      .select("doc_id", "n_tokens", "ttr")
    keepers.join(quality, "doc_id")
      .select(col("doc_id"), col("cell"), col("n_tokens"), col("ttr"))
  }

  /** Anchor set size for s12 (the fine-tuning batch being mined). */
  val TripletAnchorCount = 16

  /** s12: HARD-NEGATIVE TRIPLET MINING — for each anchor vector, the
    * closest SAME-label vector (positive) and the closest DIFFERENT-label
    * vector (the hard negative — the impostor the embedding model most
    * confuses), plus the triplet margin. This is the batch-construction
    * step of contrastive / metric-learning training (FaceNet triplets,
    * DPR in-batch negatives, SimCSE hard negatives): random negatives are
    * trivially separable and teach nothing — training signal comes from
    * mining the closest impostors.
    *
    * Scale shape: the anchor set broadcasts; the corpus is scanned ONCE,
    * narrowly — each (anchor, candidate) cosine feeds a per-anchor
    * lexicographic-struct max, conditional on label parity, that Spark
    * partial-aggregates map-side. The exchange carries at most
    * |anchors| pre-reduced rows per partition and the corpus is never
    * shuffled (no window over the candidate relation — contrast s01).
    * Ties break deterministically (cosine DESC, vec_id ASC) via the
    * struct's negated-id field; cosines are the pinned `vec_dot` fold, so
    * the margin subtraction is bit-identical across engines. */
  def s12TripletMining(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    val all = embeddings(s, d).selectExpr(
        "vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .selectExpr("vec_id", "label", "v", "sqrt(vec_dot(v, v)) AS nrm")
    val anchors = broadcast(all.filter(col("vec_id") < TripletAnchorCount)
      .selectExpr("vec_id AS anchor_id", "label AS albl", "v AS qv", "nrm AS qnrm"))
    anchors.crossJoin(all)
      .filter(col("vec_id") =!= col("anchor_id"))
      .selectExpr("anchor_id", "albl", "label", "vec_id",
        s"$dotExpr / (qnrm * nrm) AS c")
      .groupBy(col("anchor_id"), col("albl"))
      .agg(
        max(expr("CASE WHEN label = albl THEN named_struct('c', c, 'ni', -vec_id, 'id', vec_id) END")).as("bp"),
        max(expr("CASE WHEN label <> albl THEN named_struct('c', c, 'ni', -vec_id, 'id', vec_id) END")).as("bn"))
      .selectExpr("anchor_id", "CAST(albl AS BIGINT) AS label",
        "bp.id AS pos_id", "bp.c AS pos_cos",
        "bn.id AS neg_id", "bn.c AS neg_cos",
        "bp.c - bn.c AS margin")
  }

  def s03AnnLsh(s: SparkSession, d: String): DataFrame = {
    val bucketed = normed(s, d).crossJoin(broadcast(anchorsRow(s, d)))
      .selectExpr("vec_id", "v", "nrm", s"($bucketExpr) AS bucket")
    val q = broadcast(bucketed.filter(col("vec_id") < QueryCount)
      .selectExpr("vec_id AS query_id", "v AS qv", "nrm AS qnrm", "bucket"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    q.join(bucketed.selectExpr("vec_id", "v", "nrm", "bucket"), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "bucket", "vec_id", s"$dotExpr / (qnrm * nrm) AS cosine")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .selectExpr("query_id", "bucket", "vec_id AS neighbor_id", "cosine")
  }

  /** s13 shape: queries, candidate-pool size, and picks per query. */
  val MmrQueries = 4
  val MmrCand = 24
  val MmrK = 5

  /** s13: Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98) — pick [[MmrK]] results per query that are RELEVANT but not
    * redundant: after seeding with the most-relevant candidate, each round
    * adds argmax of λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s). With
    * λ = ½ the argmax order is rank-equivalent to the integer score
    * rel − max-sim, so every comparison is exact long arithmetic over
    * ×1000-scaled embeddings (dot products ≤ 64·530² ≈ 1.8·10⁷ — also
    * double-exact, which is what lets the DuckDB oracle mirror it). Ties
    * break to the smaller cand_id; the whole selection is a total order.
    *
    * Scale shape: the corpus is scanned ONCE to score rel against the
    * broadcast query set, and [[graft.plans.TopKPerGroup]] bounds the
    * shuffle to MmrCand rows per query (per-partition heaps, same operator
    * as q20/d14 — no corpus-sized window partition). The greedy loop then
    * runs [[MmrK]] rounds over the CACHED candidate pool: each round joins
    * candidates to the ≤ MmrQueries·MmrK broadcast selected rows, takes a
    * distributed struct-max argmax per query, and collects exactly
    * MmrQueries rows — driver state is the selected set (a model
    * constant), never the pool, so the same loop runs unchanged when the
    * pool is millions of rows per query on a cluster. */
  def s13MmrRerank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val iv = embeddings(s, d).selectExpr("vec_id",
      "transform(embedding, e -> CAST(round(e * 1000) AS BIGINT)) AS q")
    val qs = broadcast(iv.filter(col("vec_id") < MmrQueries)
      .selectExpr("vec_id AS query_id", "q AS qv"))
    val idot = "aggregate(zip_with(qv, cv, (a, b) -> a * b), " +
      "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    val cand = graft.plans.TopKPerGroup(
        qs.crossJoin(iv.selectExpr("vec_id AS cand_id", "q AS cv"))
          .filter(col("cand_id") =!= col("query_id"))
          .selectExpr("query_id", "cand_id", "cv", s"$idot AS rel"),
        Seq("query_id"), Seq("rel" -> true, "cand_id" -> false), k = MmrCand)
      .persist()
    try {
      // selected rows: (query_id, pick, cand_id, rel, score, cv)
      // r12 (guide §1.2 per-task/driver overhead): each greedy round used
      // to run TWO jobs — the argmax, then a broadcast-join + collect to
      // fetch the picked row's (rel, cv). The argmax struct now CARRIES
      // rel and cv as trailing fields: (score, -cand_id) is already a
      // total order within a query group (cand_id is unique), so the
      // trailing fields can never influence which row wins — they just
      // ride along. One job per round, 11 → 6 for MmrK=5, same picks.
      var sel = Vector.empty[(Long, Long, Long, Long, Long, Seq[Long])]
      def argmaxCollect(scored: DataFrame): Array[(Long, Long, Long, Long, Seq[Long])] =
        scored
          .groupBy(col("query_id"))
          .agg(max(struct(col("score").as("s"), (-col("cand_id")).as("ni"),
            col("cand_id").as("id"), col("rel").as("r"), col("cv").as("v"))).as("m"))
          .selectExpr("query_id", "m.id AS cand_id", "m.r AS rel",
            "m.s AS score", "m.v AS cv")
          .as[(Long, Long, Long, Long, Seq[Long])]
          .collect()
      for (pick <- 1 to MmrK) {
        val picked =
          if (pick == 1)
            argmaxCollect(cand.selectExpr("query_id", "cand_id", "rel",
              "rel AS score", "cv"))
          else {
            val selDf = sel.toDF(
              "query_id", "pick", "sel_id", "srel", "sscore", "sv")
            val selPairs = broadcast(selDf
              .select(col("query_id").as("sq"), col("sel_id")))
            val selVecs = broadcast(selDf.select(col("query_id"), col("sv")))
            val sim = "aggregate(zip_with(cv, sv, (a, b) -> a * b), " +
              "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            argmaxCollect(cand
              .join(selPairs, col("query_id") === col("sq") &&
                col("cand_id") === col("sel_id"), "left_anti")
              .join(selVecs, Seq("query_id"))
              .selectExpr("query_id", "cand_id", "rel", "cv", s"$sim AS sim")
              .groupBy(col("query_id"), col("cand_id"), col("rel"), col("cv"))
              .agg(max(col("sim")).as("msim"))
              .selectExpr("query_id", "cand_id", "rel", "cv",
                "rel - msim AS score"))
          }
        sel = sel ++ picked.map { case (q, c, r, sc, v) => (q, pick.toLong, c, r, sc, v) }
      }
      sel.map { case (q, p, c, r, sc, _) => (q, p, c, r, sc) }
        .toDF("query_id", "pick", "cand_id", "rel", "score")
    } finally { cand.unpersist() }
  }
}
