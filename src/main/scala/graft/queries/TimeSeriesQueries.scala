package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series similarity over the per-user event-value sequences — the
  * missing modality next to text (d/t), embeddings (s) and media (m):
  * "find users whose metric trace looks like this one" powers anomaly
  * triage, cohort discovery and trajectory search (cf. EDBT'19 streaming
  * TS similarity; REPOSE ICDE'21 distributed trajectory top-k).
  *
  * Series construction is shared: each user's `value`s ordered by
  * (ts, event_id), truncated to the first [[SeriesLen]] points, users with
  * fewer points excluded. All distances are squared Euclidean computed as
  * dot(a,a) + dot(b,b) − 2·dot(a,b) through the codegen'd
  * [[graft.plans.VecDot]] fold — the identical operation order DuckDB's
  * `list_dot_product` uses, so every double is bit-reproducible.
  *
  * Scale shapes:
  *  - ts01 is the exact-search baseline: the query set is a broadcast
  *    constant (5 rows), the corpus of series is scanned once and never
  *    shuffled after its one groupBy; the top-1 is an AGGREGATE argmax
  *    (q23 shape), not a sort.
  *  - ts02 is the index path: a PAA word (4 segment means, bucket width
  *    [[PaaBucket]]) is a narrow projection per series; candidates are
  *    pairs sharing the word — an equi-join on the word key, the SAX-style
  *    analogue of d03's LSH band join. Word granularity (segments ×
  *    bucket width) tunes candidate volume exactly like band steepness;
  *    exact distances are attached to every candidate in the same pass.
  */
object TimeSeriesQueries {
  import Tables._

  val SeriesLen = 16
  val TsQueryUsers = 5
  val PaaSegments = 4
  val PaaSegLen: Int = SeriesLen / PaaSegments
  val PaaBucket = 25

  /** (user_id, v: array<double> of the first [[SeriesLen]] values in
    * (ts, event_id) order) for users with at least [[SeriesLen]] events. */
  private def series(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    events(s, d)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("seq"))
      .filter(size(col("seq")) >= SeriesLen)
      .selectExpr("user_id",
        s"slice(transform(seq, x -> x.value), 1, $SeriesLen) AS v")
  }

  private val distExpr =
    "vec_dot(qv, qv) + vec_dot(v, v) - 2 * vec_dot(qv, v)"

  /** ts01: exact nearest-neighbor series search — for each broadcast query
    * user (user_id < [[TsQueryUsers]]), the single closest OTHER user by
    * squared Euclidean distance over the aligned series, ties to the
    * smaller user_id via the aggregate-argmax struct ordering. */
  def ts01SeriesKnn(s: SparkSession, d: String): DataFrame = {
    val all = series(s, d)
    val queries = broadcast(
      all.filter(col("user_id") < TsQueryUsers)
        .selectExpr("user_id AS query_id", "v AS qv"))
    queries.crossJoin(all)
      .filter(col("user_id") =!= col("query_id"))
      .selectExpr("query_id", "user_id", s"$distExpr AS dist")
      .groupBy("query_id")
      .agg(min(struct(col("dist"), col("user_id"))).as("best"))
      .selectExpr("query_id", "best.user_id AS neighbor_id", "best.dist AS dist")
  }

  /** The PAA word: per segment, mean of [[PaaSegLen]] consecutive values
    * (division by 4 is exact in binary floating point), floored into
    * [[PaaBucket]]-wide buckets. Spelled as EXPLICIT element additions so
    * the fold order is pinned identically in Spark and the oracle. */
  private def paaWordExprsOn(vcol: String): Seq[String] =
    (0 until PaaSegments).map { seg =>
      val terms = (1 to PaaSegLen)
        .map(i => s"element_at($vcol, ${seg * PaaSegLen + i})")
        .mkString(" + ")
      s"CAST(floor(($terms) / $PaaSegLen / $PaaBucket) AS BIGINT) AS b$seg"
    }

  private def paaWordExprs: Seq[String] = paaWordExprsOn("v")

  /** The static PAA word index of the per-user series corpus — the lookup
    * side of online series serving ([[graft.streaming.EventStreams.seriesServe]]);
    * same narrow word projection ts02 candidates use. */
  def paaIndex(s: SparkSession, d: String): DataFrame =
    series(s, d).selectExpr(Seq("user_id", "v") ++ paaWordExprs: _*)

  /** Assign incoming query series (query_id, qv: array<double> of
    * [[SeriesLen]] points) their PAA word — stateless, streams fine. */
  def paaAssignQueries(queries: DataFrame, s: SparkSession): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    queries.selectExpr(Seq("query_id", "qv") ++ paaWordExprsOn("qv"): _*)
  }

  val MotifSeriesLen = 48
  val MotifLen = 8

  /** ts03: MOTIF discovery — the matrix-profile primitive (UCR/Keogh
    * family): within each user's OWN series, the closest pair of
    * non-overlapping [[MotifLen]]-windows (repeated behavior = recurring
    * load pattern, periodic job, replayed session). For each user with ≥
    * [[MotifSeriesLen]] points: all window pairs (i, j) with j − i ≥
    * [[MotifLen]] are scored by squared Euclidean distance (same
    * three-dot-product fold as ts01), min by (dist, i, j).
    *
    * Scale shape: after the one series groupBy, the all-pairs scan is
    * PER-USER LOCAL — a narrow `mapPartitions` kernel with O(w²·m) work
    * per user and zero additional exchanges; a billion users parallelize
    * perfectly because no window ever crosses a user boundary. (The full
    * matrix-profile's O(w²)→O(w·log w) FFT refinements drop in per-task
    * without changing the plan.) */
  def ts03Motif(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = MotifLen
    events(s, d)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("seq"))
      .filter(size(col("seq")) >= MotifSeriesLen)
      .selectExpr("user_id",
        s"slice(transform(seq, x -> x.value), 1, $MotifSeriesLen) AS v")
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        it.map { case (uid, v) =>
          val w = v.length - m + 1
          var bestDist = Double.MaxValue
          var bestI = -1
          var bestJ = -1
          var i = 0
          while (i < w) {
            var j = i + m // non-overlapping only
            while (j < w) {
              // dist = dot(a,a) + dot(b,b) - 2*dot(a,b), each a sequential
              // fold over the window — the exact op order the oracle runs
              var aa = 0.0; var bb = 0.0; var ab = 0.0
              var t = 0
              while (t < m) {
                val a = v(i + t); val b = v(j + t)
                aa += a * a; bb += b * b; ab += a * b
                t += 1
              }
              val dist = aa + bb - 2 * ab
              if (dist < bestDist) { bestDist = dist; bestI = i; bestJ = j }
              j += 1
            }
            i += 1
          }
          (uid, bestI.toLong, bestJ.toLong, bestDist)
        }
      }
      .toDF("user_id", "i", "j", "dist")
  }

  val AcfMaxLag = 12

  /** ts04: SEASONALITY detection by autocovariance — per user, the
    * dominant lag in 1..[[AcfMaxLag]] of their [[MotifSeriesLen]]-point
    * series (periodic workload / retry-storm cadence / weekly-cycle
    * detection). INTEGER-EXACT in the house style: values quantize to
    * cents (`round(value·100)` — deterministic, same double op both
    * engines), and the mean-centered covariance is computed scale-free as
    * cov(L) = Σ_t (n·v[t] − S)(n·v[t+L] − S) with S = Σv (n² times the
    * usual estimator — argmax-invariant, and every intermediate fits a
    * Long with 10⁴× headroom). Integer sums are order-independent, so no
    * fold-order pinning is needed anywhere. Dominant lag = argmax cov,
    * ties to the smaller lag.
    *
    * Scale shape: identical to ts03 — after the one series groupBy the
    * lag scan is per-user local (O(w·maxLag) per user), a narrow
    * mapPartitions kernel, zero further exchanges. */
  def ts04Seasonality(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n = MotifSeriesLen
    val maxLag = AcfMaxLag
    events(s, d)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("seq"))
      .filter(size(col("seq")) >= n)
      .selectExpr("user_id",
        s"slice(transform(seq, x -> CAST(round(x.value * 100) AS BIGINT)), 1, $n) AS v")
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        it.map { case (uid, v) =>
          var sv = 0L
          var i = 0
          while (i < v.length) { sv += v(i); i += 1 }
          var bestLag = 0
          var bestCov = Long.MinValue
          var lag = 1
          while (lag <= maxLag) {
            var cov = 0L
            var t = 0
            while (t < v.length - lag) {
              cov += (v.length * v(t) - sv) * (v.length * v(t + lag) - sv)
              t += 1
            }
            if (cov > bestCov) { bestCov = cov; bestLag = lag }
            lag += 1
          }
          (uid, bestLag.toLong, bestCov)
        }
      }
      .toDF("user_id", "best_lag", "best_cov")
  }

  /** ts05: CHANGE-POINT detection — the classic CUSUM statistic
    * (Page 1954), integer-exact on cent-quantized values: for each user's
    * [[MotifSeriesLen]]-point series, the split k ∈ [1, n−1] maximizing
    * |C(k)| with C(k) = n·prefix(k) − k·total — the division-free form of
    * "how far does the first k-segment's mean drift from the global
    * mean", the level-shift detector behind deploy-regression and
    * drift alarms. All integer (|C| ≤ n²·max|v| with 10⁴× Long headroom),
    * so argmax ties (|C| desc, k asc) are exact on both engines with no
    * fold-order pinning.
    *
    * Scale shape: same as ts03/ts04 — one series groupBy, then a
    * per-user-local O(n) prefix scan, zero further exchanges. */
  def ts05ChangePoint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n = MotifSeriesLen
    events(s, d)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("seq"))
      .filter(size(col("seq")) >= n)
      .selectExpr("user_id",
        s"slice(transform(seq, x -> CAST(round(x.value * 100) AS BIGINT)), 1, $n) AS v")
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        it.map { case (uid, v) =>
          var total = 0L
          var i = 0
          while (i < v.length) { total += v(i); i += 1 }
          var prefix = 0L
          var bestK = 0
          var bestAbs = -1L
          var bestSign = 0L
          var k = 1
          while (k < v.length) {
            prefix += v(k - 1)
            val c = v.length * prefix - k * total
            val abs = math.abs(c)
            if (abs > bestAbs) {
              bestAbs = abs; bestK = k; bestSign = java.lang.Long.signum(c)
            }
            k += 1
          }
          (uid, bestK.toLong, bestAbs, bestSign)
        }
      }
      .toDF("user_id", "split_k", "cusum_abs", "shift_sign")
  }

  /** ts02: PAA-bucketed candidate pairs — the index path of series
    * search: users sharing the full 4-symbol PAA word are candidates
    * (equi-join on the word), each attached with its exact distance. */
  def ts02PaaCandidates(s: SparkSession, d: String): DataFrame = {
    val worded = series(s, d)
      .selectExpr(Seq("user_id", "v") ++ paaWordExprs: _*)
    val left = worded.selectExpr(
      Seq("user_id AS a", "v AS qv") ++ (0 until PaaSegments).map(i => s"b$i"): _*)
    val right = worded.selectExpr(
      Seq("user_id AS b", "v") ++ (0 until PaaSegments).map(i => s"b$i AS rb$i"): _*)
    val cond = (0 until PaaSegments)
      .map(i => col(s"b$i") === col(s"rb$i"))
      .reduce(_ && _) && col("a") < col("b")
    left.join(right, cond)
      .selectExpr("a", "b",
        (0 until PaaSegments).map(i => s"b$i").mkString("concat_ws(',', ", ", ", ") AS word"),
        s"$distExpr AS dist")
  }

  /** ts06 lag search radius (points). */
  val XcorrMaxLag = 4

  /** ts06: LEAD-LAG ALIGNMENT — for every candidate series pair (ts02's
    * PAA-word join, the bounded candidate set), the integer lag in
    * ±[[XcorrMaxLag]] maximizing the sliding inner product of the aligned
    * overlaps: "does user B's trace follow user A's, and by how many
    * steps?" — the cross-correlation primitive behind cascade/contagion
    * detection and metric root-cause ordering (which signal moves first).
    * Ties break to the smaller |lag|, then the smaller lag — a total
    * order, so the argmax is deterministic.
    *
    * Scale shape: candidates come from the word EQUI-join (never all
    * pairs); the ±4 lag fan-out is a 9-row explode per candidate and each
    * score is one [[graft.plans.VecDot]] fold over ≤ [[SeriesLen]] points
    * — per-pair local arithmetic, no further shuffle beyond the candidate
    * join and the (a, b)-keyed argmax partials. Doubles are safe: the
    * fold order is pinned to DuckDB's `list_dot_product` exactly as in
    * ts01. */
  def ts06LeadLag(s: SparkSession, d: String): DataFrame = {
    val worded = series(s, d).selectExpr(Seq("user_id", "v") ++ paaWordExprs: _*)
    val left = worded.selectExpr(
      Seq("user_id AS a", "v AS av") ++ (0 until PaaSegments).map(i => s"b$i"): _*)
    val right = worded.selectExpr(
      Seq("user_id AS b", "v AS bv") ++ (0 until PaaSegments).map(i => s"b$i AS rb$i"): _*)
    val cond = (0 until PaaSegments)
      .map(i => col(s"b$i") === col(s"rb$i"))
      .reduce(_ && _) && col("a") < col("b")
    left.join(right, cond)
      .select(col("a"), col("b"), col("av"), col("bv"))
      .selectExpr("a", "b", "av", "bv",
        s"explode(sequence(${-XcorrMaxLag}, $XcorrMaxLag)) AS lag")
      .selectExpr("a", "b", "lag",
        s"""vec_dot(slice(av, 1 + greatest(lag, 0), $SeriesLen - abs(lag)),
           |        slice(bv, 1 + greatest(-lag, 0), $SeriesLen - abs(lag))) AS score""".stripMargin,
        s"CAST($SeriesLen - abs(lag) AS BIGINT) AS overlap")
      .groupBy(col("a"), col("b"))
      .agg(max(struct(col("score"),
        (-abs(col("lag"))).as("nal"), (-col("lag")).as("nl"),
        col("overlap").as("ov"))).as("best"))
      .selectExpr("a", "b", "CAST(-best.nl AS BIGINT) AS best_lag",
        "best.score AS best_score", "best.ov AS overlap")
  }

  /** ts07 bucket width: interior points are grouped in runs of this many
    * (ts, event_id)-ordered points; one survivor per bucket. */
  val DownsampleBucket = 8

  /** ts07: visually-faithful series downsampling — the largest-triangle
    * (one-bucket) reduction behind dashboard rendering and long-retention
    * metric rollup (Steinarsson's LTTB thesis, 2013, simplified to fixed
    * neighbors so selection has no sequential dependence). Per user, events
    * in (ts, event_id) order are bucketed [[DownsampleBucket]] at a time;
    * each interior point's salience is twice the area of the triangle it
    * forms with its immediate neighbors — |(xₚ−xₙ)(y−yₚ) − (xₚ−x)(yₙ−yₚ)|
    * — and only the per-bucket argmax survives, plus both endpoints. Axes
    * are integers (seconds since the user's first event; value scaled
    * ×100), so areas are exact longs and the (area DESC, idx) tie-break is
    * a total order both engines agree on bit-for-bit.
    *
    * Scale shape: three window passes over the SAME (user_id, ts,
    * event_id) sort order — Catalyst plans one exchange + one sort and
    * reuses them; the bucket argmax partitions by (user_id, bucket), a
    * strict refinement of the same hash key, so no second shuffle of the
    * events is needed beyond the window exchange. Per-user state in any
    * task is one window frame (3 rows of lag/lead), not the series — users
    * with millions of events stream through. Output is ~n/8 rows; nothing
    * is collected. */
  /** ts08: OHLC resample bars — the metric-rollup primitive behind every
    * monitoring dashboard and financial tick store: per (user, hour),
    * open/high/low/close plus count and exact sum of the cent-scaled
    * value. Open/close are argmin/argmax by event time realized as
    * lexicographic struct min/max over (us, event_id, v) — (us, event_id)
    * is a unique prefix so the payload never tie-breaks, and the DuckDB
    * oracle mirrors the same struct min/max discipline. All longs; no
    * window at all.
    *
    * Scale shape: a pure two-phase aggregate — partial min/max/sum/count
    * per task, ONE exchange carrying ≤ |users × hours| pre-reduced rows,
    * final merge. The canonical "roll 100 TB of raw ticks into bars"
    * plan: no window partitions, no sort, constant state per group. */
  def ts08OhlcBars(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "CAST(round(value * 100) AS BIGINT) AS v")
      .withColumn("hour", expr("us div 3600000000"))
      .groupBy(col("user_id"), col("hour"))
      .agg(
        min(struct(col("us"), col("event_id").as("e"), col("v"))).as("fst"),
        max(struct(col("us"), col("event_id").as("e"), col("v"))).as("lst"),
        max(col("v")).as("high"),
        min(col("v")).as("low"),
        count(lit(1)).as("n_events"),
        sum(col("v")).as("v_sum"))
      .selectExpr("user_id", "hour", "fst.v AS open", "high", "low",
        "lst.v AS close", "n_events", "v_sum")

  /** ts09 EWMA depth: the trailing frame length; α = ½ per step. */
  val EwmaDepth = 16

  /** ts09: EWMA METRIC SMOOTHING — the exponentially-weighted moving
    * average every metrics stack layers under its raw series (α-decay
    * favors recent points; the w03/w09 trailing windows weight uniformly).
    * α = ½ makes every weight an exact power of two, so the smoothed value
    * is computed as an INTEGER fraction: num = Σₖ v₍ₜ₋ₖ₎·2^(15−k) over the
    * present lags (cent-scaled longs — order-free integer addition, no
    * float accumulation anywhere), den = Σₖ 2^(15−k) over the same lags,
    * and `ewma_cents` is the ONE correctly-rounded double division
    * num/den — bit-identical across engines and partitionings, the b01
    * no-transcendentals discipline applied to exponential decay. Partial
    * heads (fewer than [[EwmaDepth]] events yet) renormalize over the
    * present weights, which is exactly the standard "adjusted" EWMA.
    *
    * Scale shape: ONE window exchange hash-partitioned by user_id; the
    * [[EwmaDepth]] lag columns share a single frame buffer (≤ 16 rows of
    * state per open frame), and every expression after the lags is
    * codegen'd long arithmetic. Same cost envelope as w09 — scan the
    * metric stream once. */
  def ts09EwmaSmooth(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val base = events(s, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("ts"), expr("CAST(round(value * 100) AS BIGINT)").as("v"))
    val withLags = (1 until EwmaDepth).foldLeft(base) { (df, k) =>
      df.withColumn(s"l$k", lag(col("v"), k).over(w))
    }
    val num = (s"v * ${1L << (EwmaDepth - 1)}" +:
      (1 until EwmaDepth).map(k =>
        s"coalesce(l$k * ${1L << (EwmaDepth - 1 - k)}, 0L)")).mkString(" + ")
    val den = (s"${1L << (EwmaDepth - 1)}L" +:
      (1 until EwmaDepth).map(k =>
        s"IF(l$k IS NULL, 0L, ${1L << (EwmaDepth - 1 - k)}L)")).mkString(" + ")
    withLags
      .withColumn("ewma_num", expr(num))
      .withColumn("ewma_den", expr(den))
      .selectExpr("event_id", "user_id", "us", "v", "ewma_num", "ewma_den",
        "CAST(ewma_num AS DOUBLE) / CAST(ewma_den AS DOUBLE) AS ewma_cents")
  }

  def ts07Downsample(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val u = Window.partitionBy(col("user_id"))
    val marked = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("y"),
        unix_micros(col("ts")).as("us"))
      .withColumn("idx", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(u))
      .withColumn("x", expr("(us - min(us) OVER (PARTITION BY user_id)) div 1000000"))
      .withColumn("xp", lag(col("x"), 1).over(w))
      .withColumn("yp", lag(col("y"), 1).over(w))
      .withColumn("xn", lead(col("x"), 1).over(w))
      .withColumn("yn", lead(col("y"), 1).over(w))
      .withColumn("interior", col("idx") > 1 && col("idx") < col("n"))
      .withColumn("area2",
        expr("abs((xp - xn) * (y - yp) - (xp - x) * (yn - yp))"))
      .withColumn("bucket",
        when(col("interior"), expr(s"(idx - 2) div $DownsampleBucket"))
          .otherwise(lit(-1L)))
    val bw = Window.partitionBy(col("user_id"), col("bucket"))
      .orderBy(col("area2").desc, col("idx"))
    marked
      .withColumn("rn", row_number().over(bw))
      .filter(col("idx") === 1 || col("idx") === col("n") ||
        (col("interior") && col("rn") === 1))
      .select(col("user_id"), col("idx"), col("x").as("x_s"), col("y").as("v100"),
        when(col("interior"), col("area2")).otherwise(lit(0L)).as("area2"))
  }
}
