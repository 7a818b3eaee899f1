package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension stack for per-group top-k: custom logical node
  * → [[SparkStrategy]] → physical [[SparkPlan]] — the (c) escalation path
  * of SURVEY §4 taken all the way (expressions: BitsetExpressions;
  * optimizer rule: RangeBinJoin; this file: planner strategy + exec).
  *
  * WHY an operator: the built-in formulations of "k best rows per group"
  * either fully sort (`row_number() OVER (PARTITION BY g ORDER BY o)` →
  * per-group sort of EVERY row) or need the rows packed into structs
  * (`graft.operators.TopK` Aggregator). This operator keeps rows unpacked
  * and moves only O(groups × k) of them through the exchange: a bounded
  * per-group heap runs BEFORE the shuffle (the top-k analogue of partial
  * aggregation), then once more after it.
  *
  * Planning shape: the strategy emits partial-exec → final-exec; the final
  * exec declares `ClusteredDistribution(grouping)`, so EnsureRequirements
  * inserts the hash exchange between them — exactly how partial/final
  * aggregates plan, reusing Spark's own distribution machinery instead of
  * hand-rolling a shuffle.
  *
  * Correctness: per-partition top-k then per-group top-k over the union of
  * partials equals global top-k (the heap keeps every row that could
  * survive the final). Ties beyond position k are broken by the caller's
  * ordering; pass a TOTAL order (e.g. value DESC, id ASC) for fully
  * deterministic output, same as any SQL top-k.
  */
final case class TopKPerGroupPlan(
    grouping: Seq[Expression], ordering: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Planner strategy: TopKPerGroupPlan → partial TopKExec → (exchange via
  * EnsureRequirements) → final TopKExec. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKExec(g, o, k, partial = false,
        TopKExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Bounded per-group heap over a partition's rows. Memory is O(groups in
  * partition × k rows); the partial instance accepts any distribution, the
  * final one requires co-location by the grouping keys. */
final case class TopKExec(
    grouping: Seq[Expression], ordering: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def nodeName: String = if (partial) "GraftTopKPartial" else "GraftTopKFinal"

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numGroups" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of groups"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (grouping.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(grouping) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numGroups = longMetric("numGroups")
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(grouping, child.output)
      val ord = RowOrdering.create(ordering, child.output)
      // max-heap in sort order: head = worst retained row, evicted when a
      // better (sort-earlier) row arrives with the heap full
      val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        // probe with the projection's transient row; copy the key only on
        // first insert (one allocation per group, not per input row)
        val key = groupProj(row)
        val heap = heaps.getOrElse(key, {
          val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), h)
          h
        })
        if (heap.size < k) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      numGroups += heaps.size
      heaps.valuesIterator.flatMap { h => numOutputRows += h.size; h.iterator }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Public API: `TopKPerGroup(df, Seq("g"), "value", k = 3, desc = true)` —
  * the k best rows per group, full row schema preserved. */
object TopKPerGroup {
  def apply(df: DataFrame, groupCols: Seq[String], orderCol: String, k: Int,
            desc: Boolean = false): DataFrame =
    apply(df, groupCols, Seq(orderCol -> desc), k)

  /** Multi-column order: `(column, descending)` pairs — pass a TOTAL order
    * (unique tiebreak column last) for deterministic output. */
  def apply(df: DataFrame, groupCols: Seq[String],
            orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    GraftFunctions.register(spark) // installs TopKStrategy (idempotent)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(_.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderCols.map { case (c, d) =>
      SortOrder(attr(c), if (d) Descending else Ascending)
    }
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      TopKPerGroupPlan(groupCols.map(attr), order, k, analyzed))
  }
}
