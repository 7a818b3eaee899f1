package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.BytesRange
import scala.collection.concurrent.TrieMap

/** In-memory GCS fake enforcing the resumable-upload protocol: contiguous
  * offsets, non-final chunks a multiple of 256 KiB, finalization with the
  * declared total, objects invisible until finalized. */
final class InMemoryGcs extends GcsApi {
  val objects = TrieMap.empty[String, Array[Byte]]
  private val sessions = TrieMap.empty[String, (String, java.io.ByteArrayOutputStream)]
  private val idGen = new java.util.concurrent.atomic.AtomicInteger()
  @volatile var sessionsStarted = 0
  @volatile var chunksPut = 0
  var chunkSizes: List[Int] = Nil

  override def startResumableUpload(key: String): String = synchronized {
    sessionsStarted += 1
    val id = s"session-${idGen.incrementAndGet()}"
    sessions(id) = (key, new java.io.ByteArrayOutputStream())
    id
  }

  override def putChunk(session: String, offset: Long, data: Array[Byte], total: Option[Long]): Unit =
    synchronized {
      val (key, acc) = sessions.getOrElse(session, throw new GcsHttpError(404, s"no session $session"))
      if (offset != acc.size())
        throw new GcsHttpError(400, s"offset $offset != received ${acc.size()} (chunks must be contiguous)")
      total match {
        case None =>
          if (data.length % GcsStorage.ChunkQuantum != 0)
            throw new GcsHttpError(400,
              s"non-final chunk of ${data.length} bytes is not a multiple of ${GcsStorage.ChunkQuantum}")
        case Some(t) =>
          if (offset + data.length != t)
            throw new GcsHttpError(400, s"final chunk ends at ${offset + data.length}, declared total $t")
      }
      chunksPut += 1
      chunkSizes ::= data.length
      acc.write(data)
      if (total.isDefined) {
        objects(key) = acc.toByteArray
        sessions.remove(session)
      }
    }

  override def sizeOf(key: String): Long = synchronized {
    objects.getOrElse(key, throw new GcsHttpError(404, s"No such object: $key")).length.toLong
  }

  override def read(key: String, from: Long, len: Long): InputStream = synchronized {
    val data = objects.getOrElse(key, throw new GcsHttpError(404, s"No such object: $key"))
    new ByteArrayInputStream(java.util.Arrays.copyOfRange(data, from.toInt, (from + len).toInt))
  }

  override def delete(key: String): Boolean = synchronized { objects.remove(key).isDefined }
  override def listKeys(prefix: String): Vector[String] = synchronized {
    objects.keys.filter(_.startsWith(prefix)).toVector.sorted
  }
  def pendingSessions: Int = sessions.size
}

/** In-memory Azure fake enforcing the block-blob protocol: equal-length
  * base64 block ids, commit only from staged blocks, staged-but-uncommitted
  * blocks invisible, commit replaces atomically. */
final class InMemoryAzure extends AzureApi {
  val blobs = TrieMap.empty[String, Array[Byte]]
  private val staged = TrieMap.empty[String, TrieMap[String, Array[Byte]]]
  @volatile var blocksStaged = 0
  @volatile var commits = 0
  var committedListSizes: List[Int] = Nil

  override def stageBlock(key: String, blockId: String, data: Array[Byte]): Unit = synchronized {
    java.util.Base64.getDecoder.decode(blockId) // must be valid base64
    val forKey = staged.getOrElseUpdate(key, TrieMap.empty)
    forKey.keys.headOption.foreach { existing =>
      if (existing.length != blockId.length)
        throw new AzureHttpError(400, "all block ids of a blob must have equal length")
    }
    blocksStaged += 1
    forKey(blockId) = data.clone()
  }

  override def commitBlockList(key: String, blockIds: Seq[String]): Unit = synchronized {
    val forKey = staged.getOrElse(key, TrieMap.empty)
    val out = new java.io.ByteArrayOutputStream()
    blockIds.foreach { id =>
      out.write(forKey.getOrElse(id, throw new AzureHttpError(400, s"block $id not staged")))
    }
    commits += 1
    committedListSizes ::= blockIds.size
    blobs(key) = out.toByteArray
    staged.remove(key)
  }

  override def read(key: String, from: Long, len: Long): InputStream = synchronized {
    val data = blobs.getOrElse(key, throw new AzureHttpError(404, s"BlobNotFound: $key"))
    if (from >= data.length && data.length > 0) throw new AzureHttpError(416, "InvalidRange")
    val end = math.min(from + len, data.length.toLong).toInt
    new ByteArrayInputStream(java.util.Arrays.copyOfRange(data, from.toInt, end))
  }

  override def sizeOf(key: String): Long = synchronized {
    blobs.getOrElse(key, throw new AzureHttpError(404, s"BlobNotFound: $key")).length.toLong
  }
  override def delete(key: String): Unit = synchronized {
    if (blobs.remove(key).isEmpty) throw new AzureHttpError(404, s"BlobNotFound: $key")
  }
  override def listKeys(prefix: String): Vector[String] = synchronized {
    blobs.keys.filter(_.startsWith(prefix)).toVector.sorted
  }
  def stagedBlobs: Int = staged.size
}

/** S7 — GCS through the shared contract + resumable-protocol specifics. */
class GcsStorageSpec extends AnyFunSuite with StorageContract {
  private val chunk = GcsStorage.ChunkQuantum // 256 KiB upload chunks for tests

  override def backendName: String = "GcsStorage(in-memory)"
  override def withBackend(f: StorageBackend => Unit): Unit =
    f(new GcsStorage(new InMemoryGcs, chunk))

  private def fresh(): (InMemoryGcs, GcsStorage) = {
    val api = new InMemoryGcs
    (api, new GcsStorage(api, chunk))
  }

  test("small upload is one finalized chunk; large ones are quantum-aligned then final") {
    val (api, s) = fresh()
    s.uploadBytes(Array.fill[Byte](1000)(1), "small")
    assert(api.sessionsStarted == 1 && api.chunksPut == 1)
    val data = Array.tabulate[Byte](2 * chunk + 777)(i => (i % 251).toByte)
    s.uploadBytes(data, "big")
    // 2 full 256KiB chunks + the 777-byte finalizer, all offsets contiguous
    assert(api.chunkSizes.take(3).reverse == List(chunk, chunk, 777))
    assert(s.fetchBytes("big").toSeq == data.toSeq)
    assert(api.pendingSessions == 0)
  }

  test("exactly-chunk-size upload finalizes with one chunk (total declared)") {
    val (api, s) = fresh()
    s.uploadBytes(Array.fill[Byte](chunk)(3), "exact")
    assert(s.size("exact") == chunk)
    assert(api.pendingSessions == 0)
  }

  test("invalid chunk size is rejected at construction") {
    intercept[IllegalArgumentException](new GcsStorage(new InMemoryGcs, 1000))
  }
}

/** S8 — Azure Blob through the shared contract + block-blob specifics. */
class AzureBlobStorageSpec extends AnyFunSuite with StorageContract {
  private val block = 1024

  override def backendName: String = "AzureBlobStorage(in-memory)"
  override def withBackend(f: StorageBackend => Unit): Unit =
    f(new AzureBlobStorage(new InMemoryAzure, block))

  private def fresh(): (InMemoryAzure, AzureBlobStorage) = {
    val api = new InMemoryAzure
    (api, new AzureBlobStorage(api, block))
  }

  test("uploads always stage blocks + one atomic commit (no single-shot path)") {
    val (api, s) = fresh()
    val data = Array.tabulate[Byte](3 * block + 17)(i => (i % 251).toByte)
    s.uploadBytes(data, "blob")
    assert(api.blocksStaged == 4 && api.commits == 1)
    assert(api.committedListSizes.head == 4)
    assert(s.fetchBytes("blob").toSeq == data.toSeq)
    assert(api.stagedBlobs == 0, "commit consumes the staged set")
  }

  test("zero-byte upload commits an empty block list (valid empty blob)") {
    val (api, s) = fresh()
    s.uploadBytes(Array.emptyByteArray, "empty")
    assert(api.commits == 1 && api.committedListSizes.head == 0)
    assert(s.size("empty") == 0)
    assert(s.fetchBytes("empty").isEmpty)
  }

  test("overwrite replaces atomically through a fresh block list") {
    val (api, s) = fresh()
    s.uploadBytes(Array.fill[Byte](2 * block)(1), "k")
    s.uploadBytes(Array.fill[Byte](10)(2), "k")
    assert(s.fetchBytes("k").toSeq == Seq.fill(10)(2.toByte))
    assert(api.commits == 2)
  }
}
