package graft.operators

import graft.core.VariableSizeChunkIndex
import graft.testkit.SparkSpec

class ChunkIndexAggregatorSpec extends SparkSpec {

  test("typed Aggregator folds unordered chunk rows into a sealed index") {
    import spark.implicits._
    // chunks of one segment, deliberately shuffled
    val rows = Seq((2, 10), (0, 30), (1, 20)).map { case (id, sz) => ("seg", id, sz) }
    val ds = spark.createDataset(rows).repartition(3)
    val result = ds.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new ChunkIndexAggregator(100, 250).toColumn.name("idx"))
      .collect().toMap
    assert(result("seg") == VariableSizeChunkIndex(100, 250, Vector(30, 20, 10)))
  }

  test("buildIndexes: one index per segment, order restored") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1, 20), ("a", 0, 30), ("b", 0, 99),
      ("a", 2, 10))
    val idx = ChunkIndexAggregator.buildIndexes(
      spark.createDataset(rows).repartition(4), 100, Map("a" -> 250, "b" -> 80))
    assert(idx("a").chunks.map(_.transformedSize) == Vector(30, 20, 10))
    assert(idx("b").chunkCount == 1 && idx("b").originalFileSize == 80)
  }
}
