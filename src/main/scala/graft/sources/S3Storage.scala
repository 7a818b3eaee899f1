package graft.sources

import java.io.InputStream
import graft.core.BytesRange

/** The minimal S3 wire surface the backend needs — a 1:1 mirror of the SDK
  * calls the reference's S3 backend makes (`storage/s3/.../S3Storage.java`:
  * get/put/deleteObjects, `S3UploadOutputStream.java`: create/upload-part/
  * complete/abort multipart). Production would bind this to a real SDK
  * client; offline, [[graft.sources]]' tests bind an in-memory fake that
  * enforces S3's protocol rules (1000-key delete limit, `bytes=a-b` ranged
  * GET with 416 past-EOF, clamped end positions, part assembly by part
  * number). Keeping the protocol logic HERE — and the wire client dumb —
  * is what makes the S6 contract testable without network. */
trait S3Api {
  def putObject(key: String, data: Array[Byte]): Unit
  def createMultipartUpload(key: String): String
  /** Returns the part's ETag. Part numbers start at 1 (S3 protocol). */
  def uploadPart(key: String, uploadId: String, partNumber: Int, data: Array[Byte]): String
  def completeMultipartUpload(key: String, uploadId: String, parts: Seq[(Int, String)]): Unit
  def abortMultipartUpload(key: String, uploadId: String): Unit
  /** `range` is an HTTP `bytes=a-b` header value, or None for the whole
    * object. Throws [[S3HttpError]] 404 / 416. */
  def getObject(key: String, range: Option[String]): InputStream
  /** Object size; throws [[S3HttpError]] 404. */
  def headObject(key: String): Long
  /** Batch delete — callers must respect the 1000-key protocol limit;
    * missing keys succeed silently (S3 semantics). */
  def deleteObjects(keys: Seq[String]): Unit
  def listKeys(prefix: String): Vector[String]
}

/** An AWS service error, by HTTP status (the only part of the SDK error
  * model the backend branches on — `S3Storage.java:127-134,151-158`). */
final class S3HttpError(val statusCode: Int, msg: String) extends RuntimeException(msg)

/** S3 storage backend — the reference's S3 semantics
  * (`storage/s3/.../S3Storage.java:45-168`) re-expressed over [[S3Api]]:
  *
  *   - uploads buffer `partSize` bytes; content that fits in ONE buffer is
  *     a single PutObject, anything larger becomes a multipart transaction
  *     (created lazily at the first full buffer, exactly like
  *     `S3UploadOutputStream.java:52-128`), completed on close and ABORTED
  *     on failure so no orphaned parts accrue storage;
  *   - ranged fetch sends `bytes=from-to` (closed range,
  *     `S3Storage.java:168`), mapping 404 → [[ObjectKeyNotFound]] and
  *     416 → [[InvalidRange]];
  *   - batch delete splits into ≤1000-key DeleteObjects requests
  *     (`S3Storage.java:46,93-96`).
  *
  * Thread-safe per call; one upload stream is single-writer (as in the
  * reference: "Do not reuse").
  */
final class S3Storage(api: S3Api, partSize: Int = StorageBackend.MultipartPartSize)
    extends StorageBackend {
  require(partSize > 0, "partSize must be positive")

  override def upload(in: InputStream, key: String): Long = {
    val buf = new Array[Byte](partSize)
    var uploadId: String = null
    val etags = Vector.newBuilder[(Int, String)]
    var partNumber = 1
    var total = 0L
    def fillBuffer(): Int = {
      var off = 0
      var n = 0
      while (off < partSize && { n = in.read(buf, off, partSize - off); n != -1 }) off += n
      off
    }
    try {
      var filled = fillBuffer()
      var more = filled == partSize
      if (!more) {
        // whole object fits in one part buffer -> single PutObject
        api.putObject(key, java.util.Arrays.copyOf(buf, filled))
        return filled.toLong
      }
      while (more) {
        if (uploadId == null) uploadId = api.createMultipartUpload(key)
        etags += partNumber -> api.uploadPart(key, uploadId, partNumber, java.util.Arrays.copyOf(buf, filled))
        partNumber += 1
        total += filled
        filled = fillBuffer()
        more = filled == partSize
      }
      if (filled > 0) {
        etags += partNumber -> api.uploadPart(key, uploadId, partNumber, java.util.Arrays.copyOf(buf, filled))
        total += filled
      }
      api.completeMultipartUpload(key, uploadId, etags.result())
      total
    } catch {
      case e: Throwable =>
        if (uploadId != null) api.abortMultipartUpload(key, uploadId)
        throw e
    }
  }

  override def fetch(key: String): InputStream =
    try api.getObject(key, None)
    catch { case e: S3HttpError if e.statusCode == 404 => throw ObjectKeyNotFound(key) }

  override def fetchRange(key: String, range: BytesRange): InputStream = {
    if (range.isEmpty) return InputStream.nullInputStream()
    try api.getObject(key, Some(s"bytes=${range.from}-${range.to}"))
    catch {
      case e: S3HttpError if e.statusCode == 404 => throw ObjectKeyNotFound(key)
      case e: S3HttpError if e.statusCode == 416 =>
        throw InvalidRange(key, range, try api.headObject(key) catch { case _: S3HttpError => -1L })
    }
  }

  override def delete(key: String): Unit = api.deleteObjects(Seq(key))

  override def deleteAll(keys: Iterable[String]): Unit =
    keys.iterator.grouped(StorageBackend.DeleteBatchSize)
      .foreach(batch => api.deleteObjects(batch.toSeq))

  override def exists(key: String): Boolean =
    try { api.headObject(key); true }
    catch { case e: S3HttpError if e.statusCode == 404 => false }

  override def size(key: String): Long =
    try api.headObject(key)
    catch { case e: S3HttpError if e.statusCode == 404 => throw ObjectKeyNotFound(key) }

  override def listKeys(prefix: String): Vector[String] = api.listKeys(prefix)
}
