package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.core.security.AesEncryptionProvider
import graft.sources.FileSystemStorage
import IndexTransform._

/** T10/R9: five indexes, one chunk each, running-sum positions, encrypted
  * but NEVER compressed; round trip through the `.indexes` object. */
class IndexTransformSpec extends AnyFunSuite {

  private def data(withTxn: Boolean) = SegmentIndexData(
    offset = Array.tabulate[Byte](100)(_.toByte),
    timestamp = Array.tabulate[Byte](80)(i => (i * 2).toByte),
    producerSnapshot = Array.tabulate[Byte](64)(i => (i + 1).toByte),
    leaderEpoch = Array.tabulate[Byte](12)(i => (i * 3).toByte),
    transaction = if (withTxn) Some(Array.tabulate[Byte](24)(_.toByte)) else None)

  test("plain: positions are running sums in fixed order, sizes exact") {
    val (body, si) = transform(data(withTxn = true), None, Array.emptyByteArray)
    assert(si.offset == graft.core.SegmentIndex(0, 100))
    assert(si.timestamp == graft.core.SegmentIndex(100, 80))
    assert(si.producerSnapshot == graft.core.SegmentIndex(180, 64))
    assert(si.leaderEpoch == graft.core.SegmentIndex(244, 12))
    assert(si.transaction.contains(graft.core.SegmentIndex(256, 24)))
    assert(body.length == 280)
  }

  test("encrypted: constant AES-GCM overhead per index, no compression ever") {
    val k = AesEncryptionProvider.createDataKeyAndAAD()
    val (body, si) = transform(data(withTxn = false), Some(k.dataKey), k.aad)
    val overhead = graft.core.transform.Transforms.encryptionOverhead
    assert(si.offset.size == 100 + overhead)
    assert(si.timestamp.position == si.offset.size)
    assert(si.transaction.isEmpty)
    assert(body.length == (100 + 80 + 64 + 12) + 4 * overhead)
  }

  test("upload + ranged fetch + decrypt round-trips each index") {
    val store = Files.createTempDirectory("idx-store").toString
    val storage = FileSystemStorage(store)
    val k = AesEncryptionProvider.createDataKeyAndAAD()
    val d = data(withTxn = true)
    val si = upload(storage, "seg-1", d, Some(k.dataKey), k.aad)
    assert(fetch(storage, "seg-1", si, "offset", Some(k.dataKey), k.aad).get.toSeq == d.offset.toSeq)
    assert(fetch(storage, "seg-1", si, "leaderEpoch", Some(k.dataKey), k.aad).get.toSeq == d.leaderEpoch.toSeq)
    assert(fetch(storage, "seg-1", si, "transaction", Some(k.dataKey), k.aad).get.toSeq == d.transaction.get.toSeq)
  }

  test("segment upload job carries indexes into the manifest; failure deletes .indexes too") {
    val store = Files.createTempDirectory("idx-store2").toString
    val storage = FileSystemStorage(store)
    val cfg = SegmentJobConfig.withGeneratedKeys(store).copy(chunkSize = 4096)
    val payload = new Array[Byte](10000)
    new java.util.Random(5).nextBytes(payload)
    val r = SegmentUploadJob.uploadOne(storage, cfg.ring, None, cfg, "seg-ix", payload, Some(data(withTxn = false)))
    assert(r.success)
    val m = SegmentFetchJob.loadManifest(storage, "seg-ix")
    assert(m.segmentIndexes.isDefined)
    assert(m.segmentIndexes.get.offset.size == 100 + graft.core.transform.Transforms.encryptionOverhead)
    assert(storage.exists("seg-ix.indexes"))
    // failure path removes all three objects: fail at the COMMIT POINT
    // (manifest PUT), i.e. AFTER .log and .indexes landed — a stronger
    // probe than the r5 chunkSize=-1 trigger, which config validation now
    // rejects at construction before any object exists
    val failing = new graft.sources.StorageBackend {
      override def upload(in: java.io.InputStream, key: String): Long =
        if (key.endsWith(".rsm-manifest"))
          throw new java.io.IOException("injected manifest-upload failure")
        else storage.upload(in, key)
      override def fetch(key: String) = storage.fetch(key)
      override def fetchRange(key: String, range: graft.core.BytesRange) =
        storage.fetchRange(key, range)
      override def delete(key: String): Unit = storage.delete(key)
      override def exists(key: String) = storage.exists(key)
      override def size(key: String) = storage.size(key)
      override def listKeys(prefix: String) = storage.listKeys(prefix)
    }
    val bad = SegmentUploadJob.uploadOne(failing, cfg.ring, None, cfg,
      "seg-bad", payload, Some(data(withTxn = false)))
    assert(!bad.success)
    assert(storage.listKeys("").forall(!_.startsWith("seg-bad")),
      s"compensating delete left: ${storage.listKeys("").filter(_.startsWith("seg-bad"))}")
  }
}
