package graft.sources

import java.io.InputStream
import graft.core.BytesRange

final case class ObjectKeyNotFound(key: String) extends RuntimeException(s"Object $key does not exist")
final case class InvalidRange(key: String, range: BytesRange, size: Long)
    extends RuntimeException(s"Invalid range $range for object $key of size $size")

/** Storage backend contract: the union of the reference's `ObjectUploader`,
  * `ObjectFetcher` (full + ranged), and `ObjectDeleter` (single + batch) —
  * `storage/core/src/main/java/io/aiven/kafka/tieredstorage/storage/` (ObjectUploader.java:21-28,
  * ObjectFetcher.java:21-38, ObjectDeleter.java:21-37).
  *
  * Implementations must be thread-safe: Spark executors call these
  * concurrently from many tasks.
  */
trait StorageBackend {
  /** Streaming PUT; returns uploaded byte count. */
  def upload(in: InputStream, key: String): Long
  def uploadBytes(bytes: Array[Byte], key: String): Long =
    upload(new java.io.ByteArrayInputStream(bytes), key)

  /** GET whole object. */
  def fetch(key: String): InputStream
  def fetchBytes(key: String): Array[Byte] = {
    val in = fetch(key)
    try in.readAllBytes() finally in.close()
  }

  /** GET byte range (closed `[from, to]`, clamped semantics are the
    * caller's). Empty range => empty stream. */
  def fetchRange(key: String, range: BytesRange): InputStream
  def fetchRangeBytes(key: String, range: BytesRange): Array[Byte] = {
    val in = fetchRange(key, range)
    try in.readAllBytes() finally in.close()
  }

  /** DELETE one key; deleting a missing key is a no-op. */
  def delete(key: String): Unit

  /** Batch delete. Backends with a protocol limit split internally (S3:
    * 1000/request — `storage/s3/.../S3Storage.java:46,93-96`). */
  def deleteAll(keys: Iterable[String]): Unit =
    keys.iterator.grouped(StorageBackend.DeleteBatchSize).foreach(_.foreach(delete))

  def exists(key: String): Boolean
  def size(key: String): Long
  def listKeys(prefix: String): Vector[String]
}

object StorageBackend {
  /** Kept from the S3 protocol so the maintenance jobs batch identically. */
  val DeleteBatchSize = 1000
  /** S3 multipart minimum part size, kept as the write-buffer size so an
    * `s3a://`-style backend drops in (`S3UploadOutputStream.java:52-76`). */
  val MultipartPartSize: Int = 5 * 1024 * 1024
}
