package graft.tools

import scala.collection.mutable

/** Single-threaded in-memory REFERENCE implementations of the g-family
  * graph algorithms, independent of the distributed join/aggregate plans
  * in [[graft.queries.TextQueries]] — the second engine of the
  * GraphGate cross-check (the CCGATE playbook: where the DuckDB oracle's
  * recursive/unrolled CTE is intractable at replica scale, gate by two
  * independent implementations agreeing instead).
  *
  * Everything here is exact integer arithmetic over an explicit edge
  * list, written as plain loops over primitive-indexed arrays — no Spark,
  * no SQL, no shared code with the distributed operators beyond the
  * algorithm CONTRACTS documented on the queries (fixed-point scale and
  * iteration count for PageRank, (deg,id) orientation for triangles,
  * k and round bound for k-core, superstep count and (cnt DESC, label
  * ASC) tie rule for LPA).
  */
object GraphRef {

  /** g01's edge set, re-derived in memory from collected (doc_id, band0,
    * band1) signature rows: ANY-band buckets (the d03 shape), distinct
    * undirected a<b pairs. Shared by GraphGate and GraphRefSpec so the
    * spec pins the SAME derivation the replica-scale gate runs. */
  def halfSigEdges(sig: Array[(Long, String, String)]): Array[(Long, Long)] = {
    val buckets = mutable.HashMap.empty[String, mutable.ArrayBuffer[Long]]
    sig.foreach { case (id, b0, b1) =>
      buckets.getOrElseUpdate(b0, mutable.ArrayBuffer.empty) += id
      buckets.getOrElseUpdate(b1, mutable.ArrayBuffer.empty) += id
    }
    val pairs = mutable.HashSet.empty[(Long, Long)]
    buckets.valuesIterator.foreach { ds =>
      val u = ds.distinct.sorted // a doc whose two bands collide appears twice
      var i = 0
      while (i < u.length) {
        var j = i + 1
        while (j < u.length) { pairs += ((u(i), u(j))); j += 1 }
        i += 1
      }
    }
    pairs.toArray
  }

  /** g02/g03/g04's edge set: BOTH-bands buckets (the full-signature
    * template graph); each doc has exactly one composite key, so pairs
    * are unique by construction. */
  def fullSigEdges(sig: Array[(Long, String, String)]): Array[(Long, Long)] = {
    val buckets = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Long]]
    sig.foreach { case (id, b0, b1) =>
      buckets.getOrElseUpdate((b0, b1), mutable.ArrayBuffer.empty) += id
    }
    val pairs = mutable.ArrayBuffer.empty[(Long, Long)]
    buckets.valuesIterator.foreach { ds =>
      val u = ds.sorted
      var i = 0
      while (i < u.length) {
        var j = i + 1
        while (j < u.length) { pairs += ((u(i), u(j))); j += 1 }
        i += 1
      }
    }
    pairs.toArray
  }

  /** Dense node indexer: doc_id -> [0, n). */
  final class Idx(ids: Array[Long]) {
    val n: Int = ids.length
    private val m = new java.util.HashMap[Long, Integer](n * 2)
    ids.zipWithIndex.foreach { case (id, i) => m.put(id, i) }
    def apply(id: Long): Int = m.get(id)
    def id(i: Int): Long = ids(i)
  }

  /** g01: damped integer-fixed-point PageRank, `iters` rounds at `scale`.
    * `nodes` = every document (isolated docs keep the 15% base term);
    * `edges` = DIRECTED pairs (both orientations of each candidate pair).
    * Mirrors the contract: contrib = r div deg, update =
    * (15·S) div 100 + (85·Σ) div 100, all BIGINT floor division. */
  def pageRank(nodes: Array[Long], edges: Array[(Long, Long)],
               scale: Long, iters: Int): Array[(Long, Long)] = {
    val idx = new Idx(nodes)
    val src = edges.map(e => idx(e._1))
    val dst = edges.map(e => idx(e._2))
    val deg = new Array[Long](idx.n)
    src.foreach(s => deg(s) += 1)
    var r = Array.fill(idx.n)(scale)
    var it = 0
    while (it < iters) {
      val in = new Array[Long](idx.n)
      var i = 0
      while (i < src.length) {
        in(dst(i)) += r(src(i)) / deg(src(i)) // deg>0: src has an out-edge
        i += 1
      }
      val base = (15L * scale) / 100L
      r = in.map(s => base + (85L * s) / 100L)
      it += 1
    }
    nodes.indices.map(i => (nodes(i), r(i))).toArray
  }

  /** g02: per-node triangle participation over UNDIRECTED distinct edges
    * (a<b). Orientation by (deg, id) — the Cohen / Schank-Wagner wedge
    * bound the distributed plan uses; the triangle SET is
    * orientation-invariant, which this second implementation re-proves. */
  def triangles(edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val deg = mutable.HashMap.empty[Long, Long]
    edges.foreach { case (a, b) =>
      deg(a) = deg.getOrElse(a, 0L) + 1
      deg(b) = deg.getOrElse(b, 0L) + 1
    }
    def lt(a: Long, b: Long): Boolean = {
      val da = deg(a); val db = deg(b)
      da < db || (da == db && a < b)
    }
    // out-adjacency under the orientation, plus a closing-edge lookup
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    val edgeSet = mutable.HashSet.empty[(Long, Long)]
    edges.foreach { case (a, b) =>
      val (x, y) = if (lt(a, b)) (a, b) else (b, a)
      adj.getOrElseUpdate(x, mutable.ArrayBuffer.empty) += y
      edgeSet += ((x, y))
    }
    val count = mutable.HashMap.empty[Long, Long]
    adj.foreach { case (x, outs) =>
      val sorted = outs.sortWith(lt)
      var i = 0
      while (i < sorted.length) {
        var j = i + 1
        while (j < sorted.length) {
          val y = sorted(i); val z = sorted(j)
          if (edgeSet.contains((y, z))) {
            count(x) = count.getOrElse(x, 0L) + 1
            count(y) = count.getOrElse(y, 0L) + 1
            count(z) = count.getOrElse(z, 0L) + 1
          }
          j += 1
        }
        i += 1
      }
    }
    count.toArray.sorted
  }

  /** g03: k-core fixpoint by repeated peeling; returns (doc_id,
    * in-core degree) for the surviving nodes. Exact mirror of the
    * contract: peel while any alive node has in-core degree < k. */
  def kCore(edges: Array[(Long, Long)], k: Long): Array[(Long, Long)] = {
    // directed both ways, like the engine's union
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
    }
    var alive = adj.keySet.to(mutable.HashSet)
    var changed = true
    while (changed) {
      val degs = alive.iterator.map { n =>
        n -> adj(n).count(alive.contains)
      }.toMap
      val keep = degs.collect { case (n, d) if d >= k => n }.to(mutable.HashSet)
      changed = keep.size != alive.size
      alive = keep
    }
    alive.iterator.map(n => (n, adj(n).count(alive.contains).toLong)).toArray.sorted
  }

  /** g04: synchronous LPA for exactly `rounds` supersteps over the
    * undirected edge set; ties (count DESC, label ASC). Returns
    * (doc_id, community, comm_size). */
  def labelProp(edges: Array[(Long, Long)], rounds: Int): Array[(Long, Long, Long)] = {
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
    }
    var lab: Map[Long, Long] = adj.keysIterator.map(n => n -> n).toMap
    var it = 0
    while (it < rounds) {
      lab = adj.iterator.map { case (n, ns) =>
        val cnt = mutable.HashMap.empty[Long, Long]
        ns.foreach { m => val l = lab(m); cnt(l) = cnt.getOrElse(l, 0L) + 1 }
        val best = cnt.minBy { case (l, c) => (-c, l) }._1
        n -> best
      }.toMap
      it += 1
    }
    val size = lab.values.groupBy(identity).map { case (l, g) => l -> g.size.toLong }
    lab.iterator.map { case (n, l) => (n, l, size(l)) }.toArray.sorted
  }
}
