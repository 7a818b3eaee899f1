package graft.sources

import java.io.InputStream
import java.nio.charset.StandardCharsets
import java.util.Base64
import graft.core.BytesRange

/** The Azure Blob wire surface the backend needs — the block-blob protocol
  * (stage blocks + commit block list) the reference's client performs
  * under `storage/azure/.../AzureBlobStorage.java:103-170`
  * (`ParallelTransferOptions.setBlockSizeLong` +
  * `setMaxSingleUploadSizeLong(blockSize)` — the comment there explains
  * block upload is FORCED so sub-256 MiB objects aren't buffered in
  * memory), plus ranged reads and single-blob deletes. Tests bind an
  * in-memory fake enforcing the protocol (equal-length base64 block ids,
  * commit-from-staged, uncommitted blocks invisible). */
trait AzureApi {
  /** Stage one block of an uncommitted blob. `blockId` is base64; all ids
    * of one blob must decode to equal lengths (Azure rule). */
  def stageBlock(key: String, blockId: String, data: Array[Byte]): Unit
  /** Atomically commit the listed staged blocks as the blob's content (in
    * list order). Replaces any existing blob. */
  def commitBlockList(key: String, blockIds: Seq[String]): Unit
  /** Read `len` bytes from `from`; throws [[AzureHttpError]] 404/416. */
  def read(key: String, from: Long, len: Long): InputStream
  def sizeOf(key: String): Long
  def delete(key: String): Unit
  def listKeys(prefix: String): Vector[String]
}

final class AzureHttpError(val statusCode: Int, msg: String) extends RuntimeException(msg)

/** Azure Blob storage backend over [[AzureApi]]: uploads ALWAYS go through
  * staged blocks + one atomic commit (fixed-width block ids, block size
  * configurable — the reference forces the same via
  * maxSingleUploadSize=blockSize), ranged fetch maps 404 →
  * [[ObjectKeyNotFound]] and 416 → [[InvalidRange]]. */
final class AzureBlobStorage(api: AzureApi, blockSize: Int = StorageBackend.MultipartPartSize)
    extends StorageBackend {
  require(blockSize > 0, "blockSize must be positive")

  private def blockId(n: Int): String =
    Base64.getEncoder.encodeToString(f"block-$n%08d".getBytes(StandardCharsets.UTF_8))

  override def upload(in: InputStream, key: String): Long = {
    val buf = new Array[Byte](blockSize)
    val ids = Vector.newBuilder[String]
    var n = 0
    var total = 0L
    var filled = fill(in, buf)
    // zero-byte objects commit an empty block list (valid: empty blob)
    while (filled > 0) {
      val id = blockId(n)
      api.stageBlock(key, id, java.util.Arrays.copyOf(buf, filled))
      ids += id
      total += filled
      n += 1
      filled = fill(in, buf)
    }
    api.commitBlockList(key, ids.result())
    total
  }

  private def fill(in: InputStream, buf: Array[Byte]): Int = {
    var off = 0
    var n = 0
    while (off < buf.length && { n = in.read(buf, off, buf.length - off); n != -1 }) off += n
    off
  }

  override def fetch(key: String): InputStream = {
    val size = sizeOr404(key)
    if (size == 0) InputStream.nullInputStream() else readMapped(key, 0L, size)
  }

  override def fetchRange(key: String, range: BytesRange): InputStream = {
    if (range.isEmpty) return InputStream.nullInputStream()
    val size = sizeOr404(key)
    if (range.from >= size) throw InvalidRange(key, range, size)
    readMapped(key, range.from, math.min(range.to, size - 1) - range.from + 1)
  }

  private def readMapped(key: String, from: Long, len: Long): InputStream =
    try api.read(key, from, len)
    catch {
      case e: AzureHttpError if e.statusCode == 404 => throw ObjectKeyNotFound(key)
      case e: AzureHttpError if e.statusCode == 416 =>
        throw InvalidRange(key, BytesRange(from, from + len - 1), sizeOr404(key))
    }

  private def sizeOr404(key: String): Long =
    try api.sizeOf(key)
    catch { case e: AzureHttpError if e.statusCode == 404 => throw ObjectKeyNotFound(key) }

  override def delete(key: String): Unit =
    try api.delete(key)
    catch { case e: AzureHttpError if e.statusCode == 404 => () } // delete of missing: no-op

  override def exists(key: String): Boolean =
    try { api.sizeOf(key); true } catch { case e: AzureHttpError if e.statusCode == 404 => false }
  override def size(key: String): Long = sizeOr404(key)
  override def listKeys(prefix: String): Vector[String] = api.listKeys(prefix)
}
