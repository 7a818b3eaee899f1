package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary as a native Catalyst
  * `TypedImperativeAggregate` — the mergeable frequent-items sketch
  * (Misra & Gries 1982; distributed merge per Agarwal et al.,
  * "Mergeable Summaries", PODS'12).
  *
  * `mg_sketch(item, k)` maintains at most `k` (item, count) counters:
  *
  *  - '''update''': present → +1; room → insert at 1; full → decrement
  *    every counter by 1, dropping zeros (the classic MG step).
  *  - '''merge''' (partial-aggregation combine): sum counter maps, then
  *    subtract the (k+1)-th largest count from every counter and drop
  *    non-positives — the PODS'12 reduction that keeps the summary at k
  *    counters while preserving the error bound '''under any merge
  *    tree''', which is exactly what Spark's partial/final aggregation
  *    needs: the bound holds for every partitioning of the input.
  *
  * Guarantees (n = stream length): for every item x with true count c(x),
  * the sketch estimate e(x) (0 if absent) satisfies
  * `c(x) − n/(k+1) ≤ e(x) ≤ c(x)`; hence every x with
  * `c(x) > n/(k+1)` is PRESENT in the summary. The a06 query gates on
  * precisely these two facts — they are merge-order-independent, so the
  * result is deterministic under any partitioning even though the exact
  * counter values are not.
  *
  * Scale shape: the sketch is a fixed k-counter map regardless of input
  * size — partial aggregation reduces each partition to ≤ k counters
  * map-side, the exchange moves O(k) bytes per partition, and the final
  * merge is driver-free. This is the operator that answers "top talkers"
  * over a 100 TB key stream with a constant-size shuffle.
  *
  * No reference counterpart (the reference has no sketch operators); this
  * extends the engine's a-family (a01 approx sketches) with a
  * deterministic-by-bound frequent-items primitive.
  */
case class MisraGriesSketch(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (StringType, IntegerType) if kExpr.foldable =>
        val kv = kExpr.eval(InternalRow.empty)
        if (kv == null || kv.asInstanceOf[Number].intValue() < 1)
          TypeCheckResult.TypeCheckFailure("mg_sketch k must be a positive integer literal")
        else TypeCheckResult.TypeCheckSuccess
      case (ct, kt) =>
        TypeCheckResult.TypeCheckFailure(
          s"mg_sketch expects (string, foldable int), got ($ct, $kt)")
    }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty[String, Long]

  override def update(
      buf: scala.collection.mutable.HashMap[String, Long],
      input: InternalRow): scala.collection.mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String].toString
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < k => buf.update(key, 1L)
      case None =>
        // full and unseen: decrement all, drop zeros (each survivor "pays"
        // one of the k+1 distinct arrivals — the n/(k+1) error budget).
        // Snapshot keys first: mutating a mutable.HashMap mid-iteration is
        // undefined; the snapshot is ≤ k entries, allocation-trivial.
        val keys = buf.keysIterator.toArray
        var i = 0
        while (i < keys.length) {
          val c = buf(keys(i))
          if (c == 1L) buf.remove(keys(i)) else buf.update(keys(i), c - 1)
          i += 1
        }
    }
    buf
  }

  override def merge(
      buf: scala.collection.mutable.HashMap[String, Long],
      other: scala.collection.mutable.HashMap[String, Long]): scala.collection.mutable.HashMap[String, Long] = {
    other.iterator.foreach { case (ik, ic) =>
      buf.update(ik, buf.getOrElse(ik, 0L) + ic)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from all; ≤ 0 drops out.
      // This is the PODS'12 mergeable reduction: ≤ k survivors, error
      // grows by exactly the subtracted value, total stays ≤ n/(k+1).
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val kth = counts(counts.length - (k + 1)) // (k+1)-th largest
      val keys = buf.keysIterator.toArray
      var i = 0
      while (i < keys.length) {
        val c = buf(keys(i))
        if (c - kth <= 0L) buf.remove(keys(i)) else buf.update(keys(i), c - kth)
        i += 1
      }
    }
    buf
  }

  override def eval(buf: scala.collection.mutable.HashMap[String, Long]): Any = {
    // stable key order (not semantically required — map lookup downstream —
    // but keeps plans/explain output reproducible)
    val sorted = buf.toArray.sortBy(_._1)
    ArrayBasedMapData(
      sorted.map(e => UTF8String.fromString(e._1): Any),
      sorted.map(_._2: Any))
  }

  override def serialize(buf: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.iterator.foreach { case (ik, ic) =>
      val b = ik.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(ic)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "mg_sketch"
}
