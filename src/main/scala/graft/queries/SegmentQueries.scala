package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The chunk-index math of SURVEY.md §2 (T4/T5, R1/R2) expressed as pure
  * relational arithmetic over the `documents` table, so the DuckDB oracle can
  * verify it: each document's `n_chars` plays the original file size, with
  * the engine's chunk grid and encryption overhead applied arithmetically.
  *
  * This is exactly how the Spark segment layer plans fetches at scale: chunk
  * metadata as *rows*, range selection as a prunable filter — never a
  * driver-side loop.
  */
object SegmentQueries {
  import Tables._

  /** Reference-recommended 4 MiB, scaled to the documents table (48-553 chars) so multi-chunk layouts actually occur. */
  val ChunkSize = 64
  /** AES-GCM per-chunk overhead: 12-byte IV + 16-byte tag (T3). */
  val EncOverhead = 28

  /** FixedSizeChunkIndex arithmetic (`FixedSizeChunkIndex.java:45-93`):
    * chunk count (ceil), final chunk size, total transformed size under
    * encryption's constant per-chunk overhead. */
  def q12ChunkIndex(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        col("n_chars"),
        expr(s"CASE WHEN n_chars = 0 THEN 0 ELSE (n_chars + ${ChunkSize - 1}) div $ChunkSize END")
          .as("chunk_count"))
      .select(
        col("doc_id"), col("n_chars"), col("chunk_count"),
        expr(s"CASE WHEN chunk_count = 0 THEN 0 ELSE n_chars - (chunk_count - 1) * $ChunkSize END")
          .as("final_chunk_size"),
        expr(s"CASE WHEN chunk_count = 0 THEN 0 ELSE (chunk_count - 1) * ${ChunkSize + EncOverhead} " +
          s"+ (n_chars - (chunk_count - 1) * $ChunkSize) + $EncOverhead END")
          .as("transformed_size"))

  /** `chunksForRange` (`AbstractChunkIndex.java:113-122`) as a relational
    * plan: explode each document's chunk grid, keep chunks overlapping the
    * requested original-byte range — the range predicate is what partition/
    * file pruning keys on at 100 TB. */
  def q13ChunksForRange(s: SparkSession, d: String): DataFrame = {
    val from = 100L
    val to = 300L // closed range [100, 300]
    documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        expr(s"CASE WHEN n_chars = 0 THEN 0 ELSE (n_chars + ${ChunkSize - 1}) div $ChunkSize END")
          .as("chunk_count"))
      .filter(col("chunk_count") > 0)
      .select(col("doc_id"), col("n_chars"), col("chunk_count"),
        explode(sequence(lit(0L), col("chunk_count") - 1)).as("chunk_id"))
      .select(
        col("doc_id"), col("chunk_id"),
        (col("chunk_id") * ChunkSize).as("orig_pos"),
        when(col("chunk_id") === col("chunk_count") - 1,
          col("n_chars") - (col("chunk_count") - 1) * ChunkSize)
          .otherwise(lit(ChunkSize.toLong)).as("orig_size"),
        (col("chunk_id") * (ChunkSize + EncOverhead)).as("trans_pos"))
      .filter(col("orig_pos") <= to && col("orig_pos") + col("orig_size") > from)
  }

  /** r01: the per-segment FORMAT SELECTOR's decision table (R11,
    * `InternalRemoteStorageManagerSelector.java:67-91`) as a relational
    * plan — a precedence union: each segment is served by the primary
    * format when its manifest exists there, else by the fallback. Modeled
    * over `documents` (doc ≙ segment; membership predicates ≙ manifest
    * presence in each store): FULL OUTER join + coalesce precedence, the
    * exact shape a catalog-reconciliation query runs at fleet scale. The
    * byte-level selector itself is [[graft.records.FormatSelector]]
    * (spec-asserted on mixed fleets); this query oracle-checks the routing
    * algebra. */
  def r01FormatRoute(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).selectExpr("doc_id", "CAST(n_chars AS BIGINT) AS n_chars")
    val k = docs.filter("doc_id % 3 != 0")
      .selectExpr("doc_id AS kid", "'kafka' AS kfmt", "n_chars AS kn")
    val r = docs.filter("doc_id % 2 = 0")
      .selectExpr("doc_id AS rid", "'records' AS rfmt", "n_chars AS rn")
    k.join(r, col("kid") === col("rid"), "full_outer")
      .selectExpr(
        "coalesce(kid, rid) AS segment_id",
        "coalesce(kfmt, rfmt) AS route",
        "coalesce(kn, rn) AS n_chars")
  }
}
