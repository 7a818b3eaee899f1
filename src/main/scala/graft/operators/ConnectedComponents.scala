package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the
  * large-star/small-star algorithm (Kiveris et al., "Connected Components
  * in MapReduce and Beyond"): alternating rounds of
  *
  *   large-star: attach every neighbor LARGER than u to the minimum of
  *               u's neighborhood (incl. u);
  *   small-star: attach u and its smaller neighbors to that minimum;
  *
  * converging (in rounds logarithmic in component diameter) to star graphs
  * rooted at each component's minimum node id.
  *
  * This is the scale path behind [[graft.queries.TextQueries.d07DedupClusters]]:
  * d07 collects the (small) LSH candidate edge set and union-finds on the
  * driver, which is optimal while edges fit there; when they don't, this
  * operator runs the SAME computation as alternating self-joins with no
  * driver materialization. Both produce identical (node, min-id) labels —
  * asserted against each other in ConnectedComponentsSpec.
  */
object ConnectedComponents {

  /** Session conf overriding the driver/distributed crossover threshold
    * (same key the d07 batch family reads — one knob for every CC
    * consumer). Unset → the caller's threshold. */
  val MaxDriverEdgesKey = "spark.graft.cc.maxDriverEdges"

  /** Crossover wrapper: union-find on the driver while the edge set fits
    * ([[maxDriverEdges]], overridable via [[MaxDriverEdgesKey]] — optimal
    * at small candidate counts, one linear pass), self-actuating to the
    * distributed [[labels]] beyond it (CCGATE.json proves the two
    * multiset-identical at 10x/100x replica scale). Returns (node, rep)
    * for every node appearing in `edges` — identical contract to
    * [[labels]]. The driver path materializes only edge NODES, never any
    * corpus-sized relation. */
  def labelsAuto(s: SparkSession, edges: DataFrame, maxDriverEdges: Long): DataFrame = {
    import s.implicits._
    val eff = s.conf.get(MaxDriverEdgesKey, "") match {
      case ""  => maxDriverEdges
      case v   => v.toLong
    }
    val pairs = edges.selectExpr("CAST(x AS BIGINT) AS x", "CAST(y AS BIGINT) AS y")
    if (pairs.count() > eff) return labels(pairs)
    val es = pairs.as[(Long, Long)].collect()
    val parent = new scala.collection.mutable.HashMap[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      // min-id root keeps "rep = min node id in component" exact
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    parent.keys.toSeq.map(k => (k, find(k))).toDF("node", "rep")
  }

  /** `edges`: two integral columns (x, y), undirected, self-loops ignored.
    * Returns (node BIGINT, rep BIGINT) for every node appearing in `edges`,
    * rep = minimum node id of its component. Deterministic: all steps are
    * min-aggregations. */
  def labels(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // canonical pair form (hi > lo); localCheckpoint each round — iterative
    // self-joins otherwise nest the full lineage per round
    var e = edges.selectExpr("CAST(x AS BIGINT) AS x", "CAST(y AS BIGINT) AS y")
      .where(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("hi"), least(col("x"), col("y")).as("lo"))
      .distinct()
      .localCheckpoint(true)

    // Cheap per-round fixed-point detection: (count, hash checksum) in ONE
    // aggregate job. Differing stats prove the round changed the edge set
    // (skip the expensive check); matching stats trigger ONE exceptAll for
    // exact set equality — both sets are distinct, so equal counts plus
    // next⊆e implies e⊆next, making the second exceptAll of the old
    // two-per-round formulation redundant. Exactness is preserved: checksum
    // equality alone is never trusted.
    def stats(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(hash(col("hi"), col("lo")).cast("long"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var eStats = stats(e)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star over the symmetric neighborhood view
      val sym = e.select(col("hi").as("a"), col("lo").as("b"))
        .union(e.select(col("lo").as("a"), col("hi").as("b")))
      val mins = sym.groupBy(col("a")).agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      val large = sym.join(mins, "a").where(col("b") > col("a"))
        .select(greatest(col("b"), col("m")).as("hi"), least(col("b"), col("m")).as("lo"))
        .where(col("hi") =!= col("lo"))
        .distinct()
        .localCheckpoint(true)

      // small-star on the canonical (hi -> lo) orientation
      val mins2 = large.groupBy(col("hi")).agg(min(col("lo")).as("mn"))
      val attached = large.join(mins2, "hi")
        .where(col("lo") =!= col("mn"))
        .select(col("lo").as("hi"), col("mn").as("lo"))
      val next = attached.union(mins2.select(col("hi"), col("mn").as("lo")))
        .distinct()
        .localCheckpoint(true)

      val nextStats = stats(next)
      converged = nextStats == eStats && next.exceptAll(e).isEmpty
      e = next
      eStats = nextStats
      iter += 1
    }

    // Silent non-convergence would return interior edges as labels — wrong
    // component reps with no signal (the d07 path promises exact labels).
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter rounds " +
          "(raise maxIter; rounds needed grow with log of component diameter)")

    // converged: e is (node -> component min) stars; roots label themselves
    e.select(col("hi").as("node"), col("lo").as("rep"))
      .union(e.select(col("lo").as("node"), col("lo").as("rep")))
      .distinct()
  }
}
