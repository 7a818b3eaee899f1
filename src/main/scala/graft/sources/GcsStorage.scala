package graft.sources

import java.io.InputStream
import graft.core.BytesRange

/** The GCS wire surface the backend needs — the JSON-API resumable-upload
  * session protocol plus object read/metadata/delete, mirroring what the
  * reference's client library performs under
  * `storage/gcs/.../GcsStorage.java:88-99` (`storage.createFrom(blobInfo,
  * stream, resumableUploadChunkSize)`) and `:104-160` (ranged reader,
  * 404 mapping, client-side range validation). Production binds the SDK;
  * tests bind an in-memory fake that ENFORCES the protocol rules
  * (sequential offsets, 256 KiB-multiple non-final chunks, finalization
  * with the total size). */
trait GcsApi {
  /** Begin a resumable upload; returns the session id. */
  def startResumableUpload(key: String): String
  /** PUT one chunk at `offset`. `total` is Some(size) on the FINAL chunk
    * (finalizes the object) and None otherwise; non-final chunks must be a
    * multiple of 256 KiB and offsets must be contiguous (GCS rules). */
  def putChunk(session: String, offset: Long, data: Array[Byte], total: Option[Long]): Unit
  /** Object size; throws [[S3HttpError]]-style [[GcsHttpError]] 404. */
  def sizeOf(key: String): Long
  /** Read `len` bytes from `from`. Caller validates the range client-side
    * (the reference checks `range.firstPosition >= blob.getSize` itself —
    * `GcsStorage.java:139-142`). */
  def read(key: String, from: Long, len: Long): InputStream
  def delete(key: String): Boolean
  def listKeys(prefix: String): Vector[String]
}

final class GcsHttpError(val statusCode: Int, msg: String) extends RuntimeException(msg)

object GcsStorage {
  /** GCS protocol rule: every non-final resumable chunk is a multiple of
    * 256 KiB. */
  val ChunkQuantum: Int = 256 * 1024
}

/** GCS storage backend — the reference's semantics re-expressed over
  * [[GcsApi]]: resumable chunked upload (chunk size config, quantum
  * enforced), ranged fetch with CLIENT-side range validation (GCS reads
  * don't 416 — the reference checks against blob size first), 404 →
  * [[ObjectKeyNotFound]], single-object deletes (no batch protocol; the
  * trait's default batches the loop). */
final class GcsStorage(api: GcsApi, chunkSize: Int = 4 * GcsStorage.ChunkQuantum)
    extends StorageBackend {
  require(chunkSize > 0 && chunkSize % GcsStorage.ChunkQuantum == 0,
    s"chunkSize must be a positive multiple of ${GcsStorage.ChunkQuantum}")

  override def upload(in: InputStream, key: String): Long = {
    val session = api.startResumableUpload(key)
    // double-buffered peek: two chunk buffers SWAPPED each iteration — no
    // per-chunk allocation and no re-copy of every byte on the hot path
    var buf = new Array[Byte](chunkSize)
    var next = new Array[Byte](chunkSize)
    var offset = 0L
    var filled = fill(in, buf)
    var more = filled == chunkSize
    while (more) {
      // can't know yet whether this is the final chunk: peek one more fill
      val nextFilled = fill(in, next)
      if (nextFilled == 0) {
        api.putChunk(session, offset, java.util.Arrays.copyOf(buf, filled), Some(offset + filled))
        return offset + filled
      }
      api.putChunk(session, offset, java.util.Arrays.copyOf(buf, filled), None)
      offset += filled
      val t = buf; buf = next; next = t
      filled = nextFilled
      more = filled == chunkSize
    }
    api.putChunk(session, offset, java.util.Arrays.copyOf(buf, filled), Some(offset + filled))
    offset + filled
  }

  private def fill(in: InputStream, buf: Array[Byte]): Int = {
    var off = 0
    var n = 0
    while (off < buf.length && { n = in.read(buf, off, buf.length - off); n != -1 }) off += n
    off
  }

  override def fetch(key: String): InputStream = {
    val size = sizeOr404(key)
    api.read(key, 0L, size)
  }

  override def fetchRange(key: String, range: BytesRange): InputStream = {
    if (range.isEmpty) return InputStream.nullInputStream()
    val size = sizeOr404(key)
    // client-side validation, as the reference does (GcsStorage.java:139-142)
    if (range.from >= size) throw InvalidRange(key, range, size)
    val len = math.min(range.to, size - 1) - range.from + 1
    api.read(key, range.from, len)
  }

  private def sizeOr404(key: String): Long =
    try api.sizeOf(key)
    catch { case e: GcsHttpError if e.statusCode == 404 => throw ObjectKeyNotFound(key) }

  override def delete(key: String): Unit = { api.delete(key); () }
  override def exists(key: String): Boolean =
    try { api.sizeOf(key); true } catch { case e: GcsHttpError if e.statusCode == 404 => false }
  override def size(key: String): Long = sizeOr404(key)
  override def listKeys(prefix: String): Vector[String] = api.listKeys(prefix)
}
