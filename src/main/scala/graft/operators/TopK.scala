package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group top-k WITHOUT sorting whole groups.
  *
  * The window formulation (`row_number().over(partitionBy(g).orderBy(o))`,
  * used by t05 where group count is tiny) sorts every partition end-to-end;
  * this typed Aggregator keeps a k-bounded, sorted buffer instead — map-side
  * partial aggregation reduces each task's contribution to at most k rows
  * per group, so the exchange moves O(groups x k) rows regardless of input
  * size: the shape that survives top-k over 100 TB.
  *
  * Determinism requires a TOTAL ordering (break ties with a unique column);
  * merge order then cannot affect the result.
  */
object TopK {

  def aggregator[V](k: Int)(
      implicit ord: Ordering[V], seqEnc: Encoder[Seq[V]]): Aggregator[V, Seq[V], Seq[V]] =
    new Aggregator[V, Seq[V], Seq[V]] {
      override def zero: Seq[V] = Vector.empty

      // top-k = the first k rows of the ord-ascending sort; buffer
      // invariant: ord-ascending, length <= k
      private def insert(b: Seq[V], v: V): Seq[V] =
        if (b.length >= k && ord.gteq(v, b.last)) b
        else {
          val (hi, lo) = b.span(x => ord.lteq(x, v))
          ((hi :+ v) ++ lo).take(k)
        }

      override def reduce(b: Seq[V], a: V): Seq[V] = insert(b, a)
      override def merge(x: Seq[V], y: Seq[V]): Seq[V] = y.foldLeft(x)(insert)
      override def finish(r: Seq[V]): Seq[V] = r
      override def bufferEncoder: Encoder[Seq[V]] = seqEnc
      override def outputEncoder: Encoder[Seq[V]] = seqEnc
    }
}
