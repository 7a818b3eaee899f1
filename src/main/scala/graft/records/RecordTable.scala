package graft.records

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import com.fasterxml.jackson.databind.ObjectMapper

/** Per-segment data-file metadata recorded in the table manifest — including
  * `start_byte_offset`, which powers the file-level pruning the reference
  * left as a TODO (`IcebergRemoteStorageManager.java:385`,
  * `DataFileMetadata.java:30-46`). */
final case class DataFileMeta(
    file: String,
    segment: String,
    minOffset: Long,
    maxOffset: Long,
    startByteOffset: Int,
    endByteOffset: Int,
    rowCount: Long)

/** The per-topic analytic table (reference "Iceberg mode", SURVEY §2.5/§3.3)
  * re-expressed Spark-first: plain Parquet data files + a JSON manifest per
  * segment (file list + offset/byte ranges) + a versioned table schema with
  * widening evolution.
  *
  * Layout: `table/data/<segment>.parquet`, `table/manifests/<segment>.json`,
  * `table/_schema.json`. Appends are per-segment atomic: data file first,
  * manifest rename-committed last (a reader only sees a segment once its
  * manifest exists) — the same commit point as the reference's Iceberg
  * transaction (`IcebergRemoteStorageManager.java:113-151`).
  *
  * Scale: the manifest list is tiny (one JSON per segment); data files are
  * the bulk. Reads pass the manifest-pruned file list to one parquet scan,
  * so Catalyst still sees a single relation (pushdown + pruning intact).
  */
final class RecordTable(tableDir: String) {
  private val mapper = new ObjectMapper()
  private def dataDir = Paths.get(tableDir, "data")
  private def manifestDir = Paths.get(tableDir, "manifests")
  private def schemaPath = Paths.get(tableDir, "_schema.json")
  private def listPath = Paths.get(tableDir, "_manifests.json")

  // --- snapshot (manifest list) --------------------------------------------

  /** Active manifest names (without .json). The `_manifests.json` rename is
    * the table's snapshot-commit point (one atomic swap can retire N
    * manifests and introduce 1 — what compaction needs); tables written
    * before the list file existed fall back to a manifest-dir scan. */
  private def activeNames: Vector[String] =
    if (Files.exists(listPath)) {
      val n = mapper.readTree(Files.readString(listPath))
      (0 until n.size()).map(n.get(_).asText()).toVector
    } else if (Files.exists(manifestDir)) {
      Files.list(manifestDir).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json")).toVector
    } else Vector.empty

  private def commitList(names: Vector[String]): Unit = {
    val arr = mapper.createArrayNode()
    names.foreach(arr.add)
    val tmp = Files.createTempFile(Paths.get(tableDir), ".manifests-", ".tmp")
    Files.writeString(tmp, mapper.writeValueAsString(arr))
    Files.move(tmp, listPath, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    recordSnapshot(names)
  }

  // --- snapshot history / time travel --------------------------------------

  private def snapshotsDir = Paths.get(tableDir, "_snapshots")

  /** Snapshot file names, sorted = version order (zero-padded). Stream
    * closed eagerly (`Files.list` holds a directory FD until closed). */
  private def snapshotFiles(): Vector[String] =
    if (!Files.exists(snapshotsDir)) Vector.empty
    else scala.util.Using.resource(Files.list(snapshotsDir)) { s =>
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".json")).toVector.sorted
    }

  /** Append the committed manifest list to the snapshot history — the
    * Iceberg snapshot-log twin (`metadata.json` snapshot list) that makes
    * `readAsOf` possible. Written AFTER the `_manifests.json` rename: the
    * current table state never depends on the history (a crash between the
    * two loses one history entry, never table consistency). The schema AT
    * COMMIT TIME is recorded too, so time travel reproduces the columns of
    * that version, not today's. Next version comes from the (zero-padded)
    * file names alone — no per-commit parse of the whole history. */
  private def recordSnapshot(names: Vector[String]): Unit = {
    Files.createDirectories(snapshotsDir)
    val v = snapshotFiles().lastOption
      .map(f => f.stripSuffix(".json").toLong + 1).getOrElse(1L)
    val n = mapper.createObjectNode()
    n.put("version", v)
    n.put("ts", System.currentTimeMillis())
    currentSchema.foreach(sc => n.put("schema", sc.json))
    val arr = n.putArray("manifests")
    names.foreach(arr.add)
    val tmp = Files.createTempFile(snapshotsDir, ".snap-", ".tmp")
    Files.writeString(tmp, mapper.writeValueAsString(n))
    Files.move(tmp, snapshotsDir.resolve(f"$v%012d.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Committed snapshots, oldest first (empty for pre-history tables). */
  def snapshots(): Vector[RecordTable.SnapshotInfo] =
    snapshotFiles().map { f =>
      val n = mapper.readTree(Files.readString(snapshotsDir.resolve(f)))
      val ms = (0 until n.get("manifests").size())
        .map(n.get("manifests").get(_).asText()).toVector
      val schema = Option(n.get("schema"))
        .map(j => DataType.fromJson(j.asText()).asInstanceOf[StructType])
      RecordTable.SnapshotInfo(n.get("version").asLong(), n.get("ts").asLong(), ms, schema)
    }

  /** Time-travel scan: the table as of snapshot `version` (same pruning and
    * pushdown as [[read]]), with the SCHEMA that was committed at that
    * version — columns added later do not bleed into historical reads.
    * Snapshots referencing data files since retired by [[compact]] are
    * expired from the history; asking for one fails with the missing-file
    * list rather than a partial result. */
  def readAsOf(spark: SparkSession, version: Long, startOffset: Long = Long.MinValue): DataFrame = {
    val snap = snapshots().find(_.version == version)
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot $version (have: ${snapshots().map(_.version).mkString(", ")})"))
    val missing = snap.manifests.filterNot(n => Files.exists(manifestDir.resolve(s"$n.json")))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"snapshot $version references retired segments: ${missing.mkString(", ")}")
    val files = snap.manifests
      .map(n => metaFromJson(Files.readString(manifestDir.resolve(s"$n.json"))))
      .sortBy(_.minOffset)
      .filter(_.maxOffset >= startOffset)
      .map(m => Paths.get(tableDir).resolve(m.file).toString)
    val schema = snap.schema.orElse(currentSchema).getOrElse(RowSchema.rawSchema)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(files: _*)
        .filter(col("kafka.offset") >= startOffset)
  }

  /** Incremental scan: rows APPENDED between two snapshots — the manifests
    * present in `toVersion` but not in `fromVersion` (append-only tables:
    * compaction rewrites, never changes, rows, and expires the snapshots
    * it invalidates, so a surviving version pair is always diffable).
    * `fromVersion = 0` means "from the beginning". This is the
    * incremental-processing primitive (Iceberg's incremental read /
    * Delta's CDF for the append-only case): downstream jobs checkpoint a
    * version and each run processes only the delta.
    *
    * A [[rollback]] between the two versions breaks append-only: segments
    * present at `fromVersion` may be GONE at `toVersion`, and an
    * added-manifests diff would silently omit the removals — so that case
    * throws instead of returning a wrong delta (re-baseline the consumer
    * from a full read). */
  def readChanges(spark: SparkSession, fromVersion: Long, toVersion: Long): DataFrame = {
    val history = snapshots()
    def manifestsOf(v: Long): Vector[String] =
      if (v == 0) Vector.empty
      else history.find(_.version == v).map(_.manifests)
        .getOrElse(throw new IllegalArgumentException(
          s"no snapshot $v (have: ${history.map(_.version).mkString(", ")})"))
    val from = manifestsOf(fromVersion).toSet
    val to = manifestsOf(toVersion)
    val removed = from -- to
    if (removed.nonEmpty)
      throw new IllegalStateException(
        s"snapshots $fromVersion..$toVersion are not append-only (a rollback removed: " +
          s"${removed.mkString(", ")}); incremental read is undefined — re-baseline from read()")
    val added = to.filterNot(from)
    val missing = added.filterNot(n => Files.exists(manifestDir.resolve(s"$n.json")))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"snapshot $toVersion references retired segments: ${missing.mkString(", ")}")
    val files = added
      .map(n => metaFromJson(Files.readString(manifestDir.resolve(s"$n.json"))))
      .sortBy(_.minOffset)
      .map(m => Paths.get(tableDir).resolve(m.file).toString)
    val schema = currentSchema.getOrElse(RowSchema.rawSchema)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }

  /** Roll the CURRENT table state back to snapshot `version` (Iceberg's
    * rollback_to_snapshot): one `_manifests.json` commit whose list is the
    * old snapshot's — data files are never touched, so rollback is instant
    * and itself versioned (a new history entry, so rollback can be rolled
    * back). Fails if the target snapshot references compaction-retired
    * segments. Pure metadata — no Spark session involved. */
  def rollback(version: Long): Unit = {
    val snap = snapshots().find(_.version == version)
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot $version (have: ${snapshots().map(_.version).mkString(", ")})"))
    val missing = snap.manifests.filterNot(n => Files.exists(manifestDir.resolve(s"$n.json")))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"snapshot $version references retired segments: ${missing.mkString(", ")}")
    commitList(snap.manifests)
  }

  /** Drop history entries that reference retired manifests — the
    * `expire_snapshots` maintenance twin, run automatically after
    * [[compact]] (data files are GC'd there, so those snapshots could
    * never be read again anyway). */
  def expireUnreadableSnapshots(): Vector[Long] =
    snapshots()
      .filter(_.manifests.exists(n => !Files.exists(manifestDir.resolve(s"$n.json"))))
      .map { s =>
        Files.deleteIfExists(snapshotsDir.resolve(f"${s.version}%012d.json"))
        s.version
      }

  // --- schema evolution (I5) ----------------------------------------------

  def currentSchema: Option[StructType] =
    if (Files.exists(schemaPath)) Some(DataType.fromJson(Files.readString(schemaPath)).asInstanceOf[StructType])
    else None

  /** Widening merge mirroring `SchemaUtils.java:79-130`: add new nullable
    * columns, widen int→long and float→double, never narrow. */
  def mergeSchemas(table: StructType, incoming: StructType): StructType = {
    val existing = table.fields.map(f => f.name -> f).toMap
    val merged = table.fields.map { tf =>
      incoming.fields.find(_.name == tf.name) match {
        case Some(inf) => StructField(tf.name, widen(tf.dataType, inf.dataType), tf.nullable || inf.nullable)
        case None => tf
      }
    } ++ incoming.fields.filterNot(f => existing.contains(f.name))
      .map(f => f.copy(nullable = true)) // added columns are optional
    StructType(merged)
  }

  private def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (IntegerType, LongType) | (LongType, IntegerType) => LongType
    case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
    case (sa: StructType, sb: StructType) => mergeSchemas(sa, sb)
    case (ArrayType(ea, n1), ArrayType(eb, n2)) => ArrayType(widen(ea, eb), n1 || n2)
    case (x, y) => throw new IllegalArgumentException(s"incompatible schema change: $x vs $y")
  }

  private def commitSchema(s: StructType): Unit = {
    Files.createDirectories(Paths.get(tableDir))
    val tmp = Files.createTempFile(Paths.get(tableDir), ".schema-", ".tmp")
    Files.writeString(tmp, s.json)
    Files.move(tmp, schemaPath, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  // --- append (S9/I3) -------------------------------------------------------

  /** Append one segment's records. `rows` must contain the RowSchema `kafka`
    * struct column. Single-writer-per-table discipline (SURVEY §7 hard
    * point 3) makes the schema read-merge-commit race-free. */
  def appendSegment(spark: SparkSession, segmentName: String, rows: DataFrame): DataFileMeta = {
    val newSchema = currentSchema match {
      case Some(t) => mergeSchemas(t, rows.schema)
      case None => rows.schema
    }
    val aligned = alignTo(rows, newSchema)
    commitSchema(newSchema)
    // allowReplace: re-appending the SAME segment name is the idempotent
    // replay path (TopicIngestStream) — identical content replaces itself
    val meta = publishDataFile(aligned, segmentName, allowReplace = true)
    commitList((activeNames :+ meta.segment).distinct)
    meta
  }

  /** Stage `df` and publish `data/<name>.parquet` + puffin sidecar +
    * `manifests/<name>.json` — everything EXCEPT the `_manifests.json`
    * visibility flip, which the CALLER performs (per-op, so multi-file
    * operations stay all-or-nothing behind one rename).
    *
    * `allowReplace = false` guarantees the data file written is a FRESH
    * path: a base name that collides with any existing data file (live or
    * staged earlier in the same operation) gets a `~N` suffix. That is
    * what keeps copy-on-write legs from mutating committed state before
    * their commit point — a half-done rewrite must never have overwritten
    * a file the current manifest list still references. (Name generations
    * derived from the snapshot count are NOT unique: snapshot expiry
    * makes the count non-monotonic.) */
  private def publishDataFile(df: DataFrame, base: String, allowReplace: Boolean): DataFileMeta = {
    Files.createDirectories(dataDir)
    Files.createDirectories(manifestDir)
    var name = base
    if (!allowReplace) {
      var i = 1
      while (Files.exists(dataDir.resolve(s"$name.parquet"))) { name = s"$base~$i"; i += 1 }
    }
    val staging = Files.createTempDirectory(Paths.get(tableDir), s".stage-$name-")
    df.coalesce(1).sortWithinPartitions(col("kafka.offset"))
      .write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).iterator().asScala.find(_.toString.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("no parquet output"))
    Files.move(part, dataDir.resolve(s"$name.parquet"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    Files.walk(staging).iterator().asScala.toVector.reverse.foreach(Files.deleteIfExists(_))
    val stats = df.agg(
      min(col("kafka.offset")), max(col("kafka.offset")),
      min(col("kafka.batch_byte_offset")), max(col("kafka.batch_byte_offset")),
      count(lit(1))).head()
    val meta = DataFileMeta(s"data/$name.parquet", name,
      stats.getLong(0), stats.getLong(1), stats.getInt(2), stats.getInt(3), stats.getLong(4))
    writePuffinSidecar(meta)
    val tmp = Files.createTempFile(manifestDir, s".m-$name-", ".tmp")
    Files.writeString(tmp, metaToJson(meta))
    Files.move(tmp, manifestDir.resolve(s"$name.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    meta
  }

  /** Puffin statistics sidecar (S11): the binary twin of the JSON
    * manifest, in the reference's layout (file-list blob; snapshot id =
    * min offset, its natural monotonic stand-in here). Written BEFORE the
    * commit point so a visible segment always has its sidecar — on append
    * AND on compaction (compacted metas get fresh sidecars, retired ones
    * are GC'd with their manifests). */
  private def writePuffinSidecar(meta: DataFileMeta): Unit = {
    val puffin = SegmentManifestPuffin.write(
      snapshotId = meta.minOffset, sequenceNumber = meta.rowCount,
      fileList = SegmentManifestPuffin.fileListJson(
        Seq((meta.file, None, None, meta.minOffset, meta.startByteOffset.toLong))))
    val ptmp = Files.createTempFile(manifestDir, s".p-${meta.segment}-", ".tmp")
    Files.write(ptmp, puffin)
    Files.move(ptmp, manifestDir.resolve(s"${meta.segment}.puffin"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read a segment's puffin statistics sidecar (S11/I11). */
  def readPuffin(segmentName: String): Option[(Puffin.FileMetadata, Array[Byte])] = {
    val p = manifestDir.resolve(s"$segmentName.puffin")
    if (!Files.exists(p)) None
    else {
      val bytes = Files.readAllBytes(p)
      Some((Puffin.readMetadata(bytes), bytes))
    }
  }

  // --- compaction (small-file maintenance) ---------------------------------

  /** Bin-pack small adjacent data files into ~`targetBytes` files — the
    * maintenance job any per-segment-append table needs at scale (one file
    * per Kafka segment = millions of small parquet files at 100 TB; scan
    * cost is dominated by file open/footer overhead, not bytes).
    *
    * Commit protocol: each group writes its merged data file + manifest,
    * then ONE `_manifests.json` rename atomically retires the N old
    * manifests and introduces the new one; old files are GC'd after the
    * swap. Readers planned before the swap keep their (still-existing at
    * plan time) file handles; single-writer discipline covers concurrent
    * appends. NB: `readStream` consumes the raw data dir and would see
    * compacted rows again — compact batch tables, not live stream sources.
    *
    * Returns the new metas (empty = nothing worth compacting). */
  def compact(spark: SparkSession, targetBytes: Long = 128L << 20, minFiles: Int = 2): Vector[DataFileMeta] = {
    val metas = listManifests()
    val sized = metas.map(m => m -> Files.size(Paths.get(tableDir).resolve(m.file)))
    // greedy: consecutive (offset-ordered) runs of small files up to target
    val groups = Vector.newBuilder[Vector[DataFileMeta]]
    var cur = Vector.empty[DataFileMeta]
    var curBytes = 0L
    sized.foreach { case (m, sz) =>
      if (sz >= targetBytes) { if (cur.nonEmpty) { groups += cur; cur = Vector.empty; curBytes = 0 } }
      else if (curBytes + sz > targetBytes && cur.nonEmpty) {
        groups += cur; cur = Vector(m); curBytes = sz
      } else { cur = cur :+ m; curBytes += sz }
    }
    if (cur.nonEmpty) groups += cur
    val todo = groups.result().filter(_.length >= minFiles)

    val out = todo.map { group =>
      val schema = currentSchema.getOrElse(RowSchema.rawSchema)
      val files = group.map(m => Paths.get(tableDir).resolve(m.file).toString)
      val merged = spark.read.schema(schema).parquet(files: _*)
        .coalesce(1).sortWithinPartitions(col("kafka.offset"))
      val name = s"compact-${group.head.minOffset}-${group.last.maxOffset}"
      val staging = Files.createTempDirectory(Paths.get(tableDir), s".stage-$name-")
      merged.write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).iterator().asScala.find(_.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException("no parquet output"))
      Files.move(part, dataDir.resolve(s"$name.parquet"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      Files.walk(staging).iterator().asScala.toVector.reverse.foreach(Files.deleteIfExists(_))

      val meta = DataFileMeta(s"data/$name.parquet", name,
        group.map(_.minOffset).min, group.map(_.maxOffset).max,
        group.map(_.startByteOffset).min, group.map(_.endByteOffset).max,
        group.map(_.rowCount).sum)
      writePuffinSidecar(meta)
      val tmp = Files.createTempFile(manifestDir, s".m-$name-", ".tmp")
      Files.writeString(tmp, metaToJson(meta))
      Files.move(tmp, manifestDir.resolve(s"$name.json"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

      // THE commit: one rename swaps the group for its replacement
      val retired = group.map(_.segment).toSet
      commitList(activeNames.filterNot(retired) :+ name)
      // GC retired files (post-commit; safe under single-writer)
      group.foreach { m =>
        Files.deleteIfExists(manifestDir.resolve(s"${m.segment}.json"))
        Files.deleteIfExists(manifestDir.resolve(s"${m.segment}.puffin"))
        Files.deleteIfExists(Paths.get(tableDir).resolve(m.file))
      }
      meta
    }
    // compaction retires data files → snapshots pinned to them are dead;
    // expire them (the Iceberg expire_snapshots twin)
    if (out.nonEmpty) expireUnreadableSnapshots()
    out
  }

  /** Row-level DELETE, copy-on-write (the Iceberg COW `delete from` twin;
    * the reference's table is append-only — this goes beyond it, the way
    * a records table needs for GDPR-style erasure and bad-batch repair).
    *
    * Plan: only data files that CONTAIN a matching row are rewritten
    * (file-level pruning first — untouched files keep their identity, so
    * at 100 TB a selective delete rewrites a handful of files, not the
    * table); a file whose every row matches is simply retired with no
    * replacement. ONE `_manifests.json` rename publishes the whole delete
    * — readers see all of it or none of it. DELETE semantics are SQL's:
    * rows where the predicate is TRUE go, NULL-predicate rows stay.
    * Returns the number of rows deleted. Snapshots that referenced the
    * retired files are expired post-commit (expire_snapshots), like
    * compaction. */
  def deleteWhere(spark: SparkSession, predicate: Column): Long = {
    val schema = currentSchema.getOrElse(RowSchema.rawSchema)
    val isMatch = coalesce(predicate, lit(false))
    var names = activeNames
    var deleted = 0L
    val retired = Vector.newBuilder[DataFileMeta]
    val gen = snapshotFiles().size + 1 // disambiguates repeated deletes
    listManifests().foreach { m =>
      val df = spark.read.schema(schema).parquet(Paths.get(tableDir).resolve(m.file).toString)
      val nMatch = df.filter(isMatch).count()
      if (nMatch > 0L) {
        deleted += nMatch
        retired += m
        if (nMatch == m.rowCount) {
          names = names.filterNot(_ == m.segment) // whole file dies
        } else {
          val meta = publishDataFile(df.filter(!isMatch), s"${m.segment}-del$gen",
            allowReplace = false)
          names = names.map(n => if (n == m.segment) meta.segment else n)
        }
      }
    }
    if (deleted > 0L) {
      commitList(names) // the single all-or-nothing visibility point
      retired.result().foreach { m =>
        Files.deleteIfExists(manifestDir.resolve(s"${m.segment}.json"))
        Files.deleteIfExists(manifestDir.resolve(s"${m.segment}.puffin"))
        Files.deleteIfExists(Paths.get(tableDir).resolve(m.file))
      }
      expireUnreadableSnapshots()
    }
    deleted
  }

  /** MERGE (upsert) by key — the copy-on-write MERGE INTO of the table
    * formats (Iceberg v1 COW: rewrite touched files, add the new file),
    * with delete-matched + insert semantics: every data file holding a
    * matched key is rewritten WITHOUT those rows, and all update rows land
    * as one new data file. ONE `_manifests.json` rename publishes the
    * rewrites and the insert together — readers see the whole merge or
    * none of it. This is log-compaction-as-a-write: q23's latest-per-key
    * READ becomes unnecessary for keys that have been merged.
    *
    * `keyExpr` is any SQL expression valid on both the table and
    * `updates` (e.g. "key_raw", "kafka.offset"). `updates` must carry the
    * RowSchema `kafka` struct (appendSegment's contract) and distinct
    * merge keys — duplicates are rejected, because "which update wins" has
    * no order on an unordered DataFrame. Files with no matched key keep
    * their identity (never rewritten). Returns (replaced, inserted).
    *
    * Scale: the update-key set rides a broadcast semi/anti join per
    * touched file — MERGE assumes updates ≪ table (the upsert shape); the
    * table itself is never shuffled, and untouched files are never read
    * past their match probe. */
  def merge(spark: SparkSession, updates: DataFrame, keyExpr: String,
            segmentName: String): (Long, Long) = {
    val newSchema = currentSchema match {
      case Some(t) => mergeSchemas(t, updates.schema)
      case None => updates.schema
    }
    // one materialization feeds the dup check, the per-file probes, and
    // the final insert write
    val aligned = alignTo(updates, newSchema).localCheckpoint(true)
    val inserted = aligned.count()
    // NULL is ONE key value throughout: the dup check groups nulls
    // together and the probes below join null-safely (<=>), so a
    // null-keyed update replaces the (single) null-keyed row like any
    // other key — no silent duplication, no spurious rejection
    val dupKeys = aligned.groupBy(expr(keyExpr)).count().filter(col("count") > 1).count()
    require(dupKeys == 0L, s"updates carry $dupKeys duplicate merge keys")
    val keys = broadcast(aligned.select(expr(keyExpr).as("__mk")))

    Files.createDirectories(dataDir)
    Files.createDirectories(manifestDir)
    var names = activeNames
    var replaced = 0L
    val retired = Vector.newBuilder[DataFileMeta]
    val gen = snapshotFiles().size + 1
    listManifests().foreach { m =>
      val df = spark.read.schema(newSchema).parquet(Paths.get(tableDir).resolve(m.file).toString)
      val nMatch = df.join(keys, expr(keyExpr) <=> col("__mk"), "left_semi").count()
      if (nMatch > 0L) {
        replaced += nMatch
        retired += m
        if (nMatch == m.rowCount) {
          names = names.filterNot(_ == m.segment)
        } else {
          val meta = publishDataFile(
            df.join(keys, expr(keyExpr) <=> col("__mk"), "left_anti"),
            s"${m.segment}-m$gen", allowReplace = false)
          names = names.map(n => if (n == m.segment) meta.segment else n)
        }
      }
    }

    // insert leg: the update rows as one new data file, published by the
    // SAME commitList as the rewrites. allowReplace = false: a replayed
    // batch may reuse the segment name while the old file is still LIVE
    // (or only partially retired) — writing a fresh path keeps committed
    // state untouched until the rename; replays converge by state, not
    // by file name
    if (inserted > 0L) {
      commitSchema(newSchema)
      val meta = publishDataFile(aligned, segmentName, allowReplace = false)
      names = (names :+ meta.segment).distinct
    }

    if (replaced > 0L || inserted > 0L) {
      commitList(names) // the single all-or-nothing visibility point
      // GC only names that left the table — defensive guard against any
      // retired name that is (or became) live again in this commit
      val live = names.toSet
      retired.result().filterNot(m => live.contains(m.segment)).foreach { m =>
        Files.deleteIfExists(manifestDir.resolve(s"${m.segment}.json"))
        Files.deleteIfExists(manifestDir.resolve(s"${m.segment}.puffin"))
        Files.deleteIfExists(Paths.get(tableDir).resolve(m.file))
      }
      expireUnreadableSnapshots()
    }
    (replaced, inserted)
  }

  /** Project/cast `rows` to the table schema: missing columns become nulls,
    * widened columns cast up. */
  private def alignTo(rows: DataFrame, schema: StructType): DataFrame = {
    val cols = schema.fields.map { f =>
      if (rows.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    rows.select(cols.toIndexedSeq: _*)
  }

  def listManifests(): Vector[DataFileMeta] =
    activeNames
      .map(n => metaFromJson(Files.readString(manifestDir.resolve(s"$n.json"))))
      .sortBy(_.minOffset)

  // accessors for the Iceberg metadata exporter (IcebergExport)
  private[records] def manifestExists(name: String): Boolean =
    Files.exists(manifestDir.resolve(s"$name.json"))
  private[records] def manifestMeta(name: String): DataFileMeta =
    metaFromJson(Files.readString(manifestDir.resolve(s"$name.json")))

  // --- read (S10/I7/I10) ----------------------------------------------------

  /** Scan the table from `startOffset`, with BOTH pruning levels:
    *   - file-level: manifests whose maxOffset < startOffset are never read
    *     (the reference's TODO, implemented);
    *   - row-group level: the offset predicate is pushed into the parquet
    *     scan by Catalyst.
    * Ordering authority is the manifest file list (I7): callers needing
    * byte-identical batch order sort by `kafka.offset`. */
  def read(spark: SparkSession, startOffset: Long = Long.MinValue): DataFrame = {
    val files = listManifests()
      .filter(_.maxOffset >= startOffset)
      .map(m => Paths.get(tableDir).resolve(m.file).toString)
    val schema = currentSchema.getOrElse(RowSchema.rawSchema)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(files: _*)
        .filter(col("kafka.offset") >= startOffset)
  }

  /** Scan exactly ONE segment's data file (the point-fetch serving path):
    * the manifest entry already names the file, so a per-segment fetch must
    * not list the table or open any other footer — at 10⁵ segments a
    * whole-table `read()` per point fetch is a driver listing storm. */
  def readSegment(spark: SparkSession, meta: DataFileMeta): DataFrame = {
    val schema = currentSchema.getOrElse(RowSchema.rawSchema)
    spark.read.schema(schema)
      .parquet(Paths.get(tableDir).resolve(meta.file).toString)
  }

  /** Streaming reads of the records table (SURVEY §7 step 7): new segment
    * data files become micro-batches; `maxFilesPerTrigger` is the read-side
    * rate limit (the streaming twin of the upload limiter). */
  def readStream(spark: SparkSession, maxFilesPerTrigger: Int = 16): DataFrame = {
    val schema = currentSchema.getOrElse(RowSchema.rawSchema)
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dataDir.toString)
  }

  private def metaToJson(m: DataFileMeta): String = {
    val n = mapper.createObjectNode()
    n.put("file", m.file); n.put("segment", m.segment)
    n.put("minOffset", m.minOffset); n.put("maxOffset", m.maxOffset)
    n.put("startByteOffset", m.startByteOffset); n.put("endByteOffset", m.endByteOffset)
    n.put("rowCount", m.rowCount)
    mapper.writeValueAsString(n)
  }

  private def metaFromJson(j: String): DataFileMeta = {
    val n = mapper.readTree(j)
    DataFileMeta(n.get("file").asText(), n.get("segment").asText(),
      n.get("minOffset").asLong(), n.get("maxOffset").asLong(),
      n.get("startByteOffset").asInt(), n.get("endByteOffset").asInt(), n.get("rowCount").asLong())
  }
}

/** I8 + I9 — regroup rows into their original batches and re-serialize to
  * Kafka wire bytes: `groupBy(batch identity).agg(sort_array(collect_list))`
  * then a per-group serializer — the distributed form of
  * `RecordBatchGrouper.java:42-75` + `BatchEnumeration.java:46-235`.
  */
object BatchReserializer {

  def toWireBatches(spark: SparkSession, rows: DataFrame): DataFrame = {
    import spark.implicits._
    val grouped = rows
      .select(col("kafka"), col("headers"), col("key_raw"), col("value_raw"))
      .groupBy(
        col("kafka.batch_base_offset").as("base_offset"),
        col("kafka.batch_producer_id").as("producer_id"),
        col("kafka.batch_base_sequence").as("base_sequence"))
      .agg(sort_array(collect_list(struct(
        col("kafka.offset").as("offset"),
        col("kafka.timestamp").as("timestamp"),
        col("kafka"), col("headers"), col("key_raw"), col("value_raw")))).as("members"))
    grouped.map { row =>
      val members = row.getSeq[org.apache.spark.sql.Row](3).map { m =>
        BatchAssembly.Member(
          offset = m.getAs[Long]("offset"),
          timestamp = m.getAs[Long]("timestamp"),
          kafka = m.getStruct(2),
          headers = Option(m.getSeq[org.apache.spark.sql.Row](3)).getOrElse(Seq.empty),
          key = m.getAs[Array[Byte]]("key_raw"),
          value = m.getAs[Array[Byte]]("value_raw"))
      }
      val baseOffset = row.getLong(0)
      val batch = BatchAssembly.assemble(baseOffset, row.getLong(1), row.getInt(2), members)
      (baseOffset, KafkaWireCodec.writeBatch(batch))
    }.toDF("base_offset", "wire_bytes")
  }
}

/** The shared I8 batch-rebuild core: one batch's member rows (the 13-field
  * kafka struct + headers + raw key/value) back into a wire
  * [[KafkaWireCodec.Batch]] with its ORIGINAL attributes. Used by
  * [[BatchReserializer]] (DataFrame regroup) and the `graft-segments`
  * DSv2 writer (per-task row buffers) so the two serving paths cannot
  * drift. */
object BatchAssembly {

  final case class Member(
      offset: Long,
      timestamp: Long,
      kafka: org.apache.spark.sql.Row,
      headers: Seq[org.apache.spark.sql.Row],
      key: Array[Byte],
      value: Array[Byte])

  /** `members` may arrive in any order; offset order is restored here.
    *
    * Base timestamp: rows carry `timestamp = base + delta` but not base
    * itself — the minimum member timestamp equals base when deltas are
    * non-negative and the first record has delta 0 (true for
    * producer-built batches). */
  def assemble(baseOffset: Long, producerId: Long, baseSequence: Int,
               members0: Seq[Member]): KafkaWireCodec.Batch = {
    val members = members0.sortBy(_.offset)
    val k0 = members.head.kafka
    val baseTs = members.iterator.map(_.timestamp).min
    KafkaWireCodec.Batch(
      baseOffset = baseOffset,
      partitionLeaderEpoch = k0.getAs[Int]("batch_partition_leader_epoch"),
      magic = k0.getAs[Int]("batch_magic").toByte,
      attributes = ((k0.getAs[Int]("batch_compression_type") & 0x07)
        | (k0.getAs[Int]("batch_timestamp_type") << 3)).toShort,
      lastOffsetDelta = (members.last.offset - baseOffset).toInt,
      baseTimestamp = baseTs,
      maxTimestamp = k0.getAs[Long]("batch_max_timestamp"),
      producerId = producerId,
      producerEpoch = k0.getAs[Int]("batch_producer_epoch").toShort,
      baseSequence = baseSequence,
      records = members.iterator.map { m =>
        KafkaWireCodec.Record(
          offsetDelta = (m.offset - baseOffset).toInt,
          timestampDelta = m.timestamp - baseTs,
          key = m.key,
          value = m.value,
          headers = m.headers
            .map(h => KafkaWireCodec.Header(h.getString(0), h.getAs[Array[Byte]](1))).toVector)
      }.toVector,
      byteOffset = 0)
  }
}

object RecordTable {
  /** One committed table state: which manifests (and which schema) were
    * active at `version`. The snapshot-log entry of our Iceberg-twin
    * commit protocol (reference txn:
    * `IcebergRemoteStorageManager.java:113-151`). `schema` is None only
    * for history written before schemas were recorded. */
  final case class SnapshotInfo(version: Long, tsMillis: Long,
      manifests: Vector[String], schema: Option[StructType] = None)
}
