package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level binned prefix sum over a dense integer spine — the running
  * total over a timeline relation (one row per hour/day) WITHOUT the
  * single-partition `Window.orderBy` that Spark warns about (`WindowExec:
  * No Partition Defined`) and that serializes the whole spine through one
  * task as retention grows.
  *
  * Decomposition (the ScaleGate recomputation's binning taken to its
  * conclusion): spine keys are binned into [[SpinePrefix.BlockSize]]-key
  * blocks; the within-block running sum is a window PARTITIONED by block
  * (parallel, bounded per-task state); the cross-block offset of each
  * block is the sum of every EARLIER block's total, computed by a
  * triangular broadcast join over the block-total table — a relation of
  * span/[[SpinePrefix.BlockSize]] rows, so the quadratic pair count is
  * (span/1024)²/2: ~4 000 pairs for a decade of hours. No unpartitioned
  * window exists anywhere in the resulting plan; every stage is either
  * data-parallel or metadata-sized.
  *
  * cum(k) = blockOffset(block(k)) + withinBlockCum(k) — exact in any
  * integer arithmetic, so the rewrite is hash-identical to the flat
  * window (a spec pins this row-for-row).
  */
object SpinePrefix {
  /** Keys per block. 1024 keeps per-task window state ≤ 1024 rows and the
    * block table ≤ span/1024 (86 blocks for ten years of hours). */
  val BlockSize = 1024L

  /** Adds one INCLUSIVE running-sum column per `(valueCol, outName)` pair
    * to `df`, ordered by the dense integer `key` column. All original
    * columns are preserved. Keys must be unique (a spine — one row per
    * key); values are summed in long arithmetic. */
  def cumsum(df: DataFrame, key: String, sums: Seq[(String, String)]): DataFrame = {
    // exact integer floor-div (pmod is always non-negative), no doubles
    val blk = df.withColumn("_blk",
      expr(s"($key - pmod($key, ${BlockSize}L)) div ${BlockSize}L"))
    val wIn = Window.partitionBy(col("_blk")).orderBy(col(key))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(blk) { case (acc, (v, out)) =>
      acc.withColumn(s"_loc_$out", sum(col(v)).over(wIn))
    }
    val blkTot = blk.groupBy(col("_blk"))
      .agg(sums.head match { case (v, out) => sum(col(v)).as(s"_tot_$out") },
        sums.tail.map { case (v, out) => sum(col(v)).as(s"_tot_$out") }: _*)
    // exclusive cross-block offsets: triangular join over the tiny block
    // table (strictly-earlier blocks), null-safe to 0 for the first block
    val blkPre = blkTot.as("a")
      .join(blkTot.as("b"), col("b._blk") < col("a._blk"), "left")
      .groupBy(col("a._blk").as("_blk"))
      .agg(sums.head match { case (_, out) =>
        coalesce(sum(col(s"b._tot_$out")), lit(0L)).as(s"_pre_$out") },
        sums.tail.map { case (_, out) =>
          coalesce(sum(col(s"b._tot_$out")), lit(0L)).as(s"_pre_$out") }: _*)
    val joined = local.join(broadcast(blkPre), Seq("_blk"))
    val withCums = sums.foldLeft(joined) { case (acc, (_, out)) =>
      acc.withColumn(out, col(s"_pre_$out") + col(s"_loc_$out"))
    }
    withCums.drop("_blk" +: sums.flatMap { case (_, out) => Seq(s"_loc_$out", s"_pre_$out") }: _*)
  }
}
