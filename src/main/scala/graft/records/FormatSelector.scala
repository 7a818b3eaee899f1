package graft.records

import org.apache.spark.sql.SparkSession
import graft.core.BytesRange
import graft.operators.{SegmentFetchJob, SegmentJobConfig}
import graft.sources.{ObjectKey, StorageBackends}

/** R11 proper — per-segment FORMAT routing with fallback, mirroring the
  * reference's `InternalRemoteStorageManagerSelector.java:33-104`: a fetch
  * tries the primary format's path first and, on manifest-not-found for
  * that segment, falls back to the other; only when BOTH formats miss does
  * it raise not-found (carrying the primary's miss, like the reference).
  *
  * The two formats here are the engine's two storage representations:
  *  - KAFKA: transformed chunks + `.rsm-manifest` served by
  *    [[graft.operators.SegmentFetchJob]] (the tiered-segment path);
  *  - RECORDS: the segment exploded into the [[RecordTable]] (the
  *    iceberg-like analytic path), reconstructed back to byte-identical
  *    wire bytes via [[BatchReserializer]] on fetch.
  *
  * A mixed fleet (some segments tiered, some in the table) is served
  * through one call — per-segment routing is by manifest PRESENCE, not
  * global config, exactly the reference's semantics.
  */
object FormatSelector {

  sealed trait SegmentFormat
  case object KafkaFormat extends SegmentFormat
  case object RecordsFormat extends SegmentFormat

  final case class SegmentManifestNotFound(format: SegmentFormat, segment: String)
      extends RuntimeException(s"$format manifest for segment $segment not found")
  final case class RemoteResourceNotFound(segment: String, primaryMiss: SegmentManifestNotFound)
      extends RuntimeException(s"segment $segment not found in any format", primaryMiss)

  /** Fetch original bytes `[range.from, range.to]` of `segment`, routing by
    * manifest presence with `primary`-first precedence. */
  def fetchRange(
      spark: SparkSession,
      primary: SegmentFormat,
      kafkaCfg: SegmentJobConfig,
      table: RecordTable,
      segment: String,
      range: BytesRange): Array[Byte] = {
    val order = primary match {
      case KafkaFormat => Seq(KafkaFormat, RecordsFormat)
      case RecordsFormat => Seq(RecordsFormat, KafkaFormat)
    }
    def via(f: SegmentFormat): Array[Byte] = f match {
      case KafkaFormat => fetchKafka(kafkaCfg, segment, range)
      case RecordsFormat => fetchRecords(spark, table, segment, range)
    }
    try via(order.head)
    catch {
      case first: SegmentManifestNotFound =>
        try via(order.last)
        catch { case _: SegmentManifestNotFound => throw RemoteResourceNotFound(segment, first) }
    }
  }

  private def fetchKafka(cfg: SegmentJobConfig, segment: String, range: BytesRange): Array[Byte] = {
    val storage = StorageBackends.forRoot(cfg.storageRoot)
    if (!storage.exists(s"$segment.${ObjectKey.Suffix.Manifest.value}"))
      throw SegmentManifestNotFound(KafkaFormat, segment)
    SegmentFetchJob.fetchRange(cfg, segment, range)
  }

  /** Records-path fetch: locate the segment's data file via the table
    * manifest list, regroup rows into their original batches, re-serialize
    * to wire bytes (CRC recomputed — byte-identical, asserted in
    * RecordTableSpec), then slice the clamped range. One segment's bytes
    * are the unit of serving (same contract as the kafka path, which also
    * returns the materialized range). */
  private def fetchRecords(
      spark: SparkSession, table: RecordTable, segment: String, range: BytesRange): Array[Byte] = {
    val meta = table.listManifests().find(_.segment == segment)
      .getOrElse(throw SegmentManifestNotFound(RecordsFormat, segment))
    // short-circuit BEFORE any Spark work: the kafka route returns empty
    // via chunksForRange without a fetch, this route must match
    if (range.isEmpty) return Array.emptyByteArray
    // scan ONLY this segment's data file (the manifest names it) — a
    // whole-table read() here would list every data file per point fetch
    val rows = table.readSegment(spark, meta)
      .filter(org.apache.spark.sql.functions.col("kafka.offset").between(meta.minOffset, meta.maxOffset))
    val wire = BatchReserializer.toWireBatches(spark, rows)
      .orderBy("base_offset")
      .select("wire_bytes")
      .collect()
    val out = new java.io.ByteArrayOutputStream()
    wire.foreach(r => out.write(r.getAs[Array[Byte]](0)))
    val all = out.toByteArray
    // Long-domain bounds check FIRST — a from beyond Int range must not
    // wrap through toInt (4294967300L.toInt == 4: silently wrong bytes)
    if (range.from >= all.length.toLong) return Array.emptyByteArray
    val from = range.from.toInt
    val to = math.min(range.to, all.length - 1L).toInt
    java.util.Arrays.copyOfRange(all, from, to + 1)
  }
}
