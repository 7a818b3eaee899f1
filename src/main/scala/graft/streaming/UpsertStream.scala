package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.records.RecordTable

/** Streaming UPSERT into the records table — CDC apply: each micro-batch
  * of keyed record rows MERGES into the table (matched keys replaced,
  * new keys inserted) through [[RecordTable.merge]]'s copy-on-write
  * commit. The batch is first collapsed to its latest row per key
  * (kafka.offset order — q23's argmax), which is the "last write wins"
  * contract a changelog needs and what satisfies merge's distinct-key
  * precondition.
  *
  * Exactly-once shape: the checkpoint makes batch ids stable across
  * restarts; a replayed batch re-merges the same rows, whose keys match
  * the previously-merged rows and replace them — replays CONVERGE BY
  * STATE (merge never overwrites a live data file in place; re-used
  * segment names land on fresh `~N` paths behind the same atomic
  * commit). */
object UpsertStream {

  def start(spark: SparkSession, updates: DataFrame, table: RecordTable,
            keyExpr: String, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, table, keyExpr, batchId)
      }
      .start()

  /** One CDC batch: latest-per-key collapse, then the COW merge. Exposed
    * for direct use (and testing) — foreachBatch calls exactly this. */
  def applyBatch(spark: SparkSession, batch: DataFrame, table: RecordTable,
                 keyExpr: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val w = Window.partitionBy(expr(keyExpr))
      .orderBy(col("kafka.offset").desc)
    val latest = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    table.merge(spark, latest, keyExpr, f"cdc-$batchId%09d")
    ()
  }
}
