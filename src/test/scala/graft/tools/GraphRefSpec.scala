package graft.tools

import graft.queries.{Tables, TextQueries}
import graft.testkit.SparkSpec

/** Pins the GraphGate reference kernels to the engine at sf0.001 — the
  * same engine-vs-in-memory comparison the replica-scale gate runs, kept
  * in the suite so a drift in either implementation (or in the gate's
  * edge re-derivation) fails fast long before a GRAPHGATE regeneration. */
class GraphRefSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val sig = TextQueries.d02MinHashSig(spark, dir)
    .selectExpr("doc_id", "band0", "band1")
    .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  // The gate's own derivations (hoisted into GraphRef), NOT a re-implementation:
  // a drift in the code GraphGate actually runs must fail here.
  private lazy val halfEdges: Array[(Long, Long)] = GraphRef.halfSigEdges(sig)
  private lazy val fullEdges: Array[(Long, Long)] = GraphRef.fullSigEdges(sig)

  test("in-memory half-signature edge derivation matches d03") {
    val d03 = TextQueries.d03MinHashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(halfEdges.sorted.toSeq == d03)
  }

  test("g01 pagerank: engine == GraphRef") {
    val docIds = Tables.documents(spark, dir).select("doc_id").collect().map(_.getLong(0))
    val eng = TextQueries.g01PageRank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val directed = halfEdges ++ halfEdges.map(e => (e._2, e._1))
    val ref = GraphRef.pageRank(docIds, directed, TextQueries.PrScale, TextQueries.PrIters)
      .sorted.toSeq
    assert(eng == ref)
  }

  test("g02 triangles: engine == GraphRef") {
    val eng = TextQueries.g02Triangles(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(eng == GraphRef.triangles(fullEdges).toSeq)
  }

  test("g03 kcore: engine == GraphRef") {
    val eng = TextQueries.g03KCore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(eng == GraphRef.kCore(fullEdges, TextQueries.CoreK).toSeq)
  }

  test("g04 label prop: engine == GraphRef") {
    val eng = TextQueries.g04LabelProp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(eng == GraphRef.labelProp(fullEdges, TextQueries.LpaRounds).toSeq)
  }

  test("GraphRef kernels on a hand-checked toy graph") {
    // path 1-2-3 plus triangle 4-5-6
    val edges = Array((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    assert(GraphRef.triangles(edges).toSeq ==
      Seq((4L, 1L), (5L, 1L), (6L, 1L)))
    // 2-core = the triangle, each with in-core degree 2
    assert(GraphRef.kCore(edges, 2).toSeq == Seq((4L, 2L), (5L, 2L), (6L, 2L)))
    // LPA after enough rounds: triangle converges to min label 4; the path
    // oscillates deterministically — just assert sizes partition the nodes
    val lpa = GraphRef.labelProp(edges, 4)
    assert(lpa.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(lpa.filter(t => t._1 >= 4L).forall(_._2 == 4L))
    // pagerank: all of a symmetric triangle's ranks are equal, and a node
    // with no in-edges keeps only the base term after the first round
    val tri = Array((4L, 5L), (5L, 4L), (5L, 6L), (6L, 5L), (4L, 6L), (6L, 4L))
    val pr = GraphRef.pageRank(Array(4L, 5L, 6L), tri, 1000000L, 3).toMap
    assert(pr(4L) == pr(5L) && pr(5L) == pr(6L))
  }
}
