package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.core.BytesRange

/** The StorageBackend CONTRACT (S1–S4) as a shared suite — every backend
  * must pass the identical behavioral checks: upload/fetch round trips,
  * closed-range fetch with EOF clamp + past-EOF error, missing-key
  * semantics, overwrite, >1000-key batch delete, prefix listing. Mirrors
  * the reference's per-backend `*StorageTest` grids
  * (`storage/filesystem/.../FileSystemStorageTest.java`,
  * `storage/s3/.../S3StorageTest.java`). */
trait StorageContract { this: AnyFunSuite =>

  /** Provide a fresh backend per test. */
  def withBackend(f: StorageBackend => Unit): Unit
  def backendName: String

  private val chunk = 1024
  private val sizes = Seq(0, 1, chunk - 1, chunk, chunk + 1, 3 * chunk + 17)

  test(s"$backendName: upload/fetch round trip across sizes; upload returns byte count") {
    withBackend { s =>
      sizes.foreach { n =>
        val data = Array.tabulate[Byte](n)(i => (i % 251).toByte)
        assert(s.uploadBytes(data, s"t/obj-$n") == n)
        assert(s.fetchBytes(s"t/obj-$n").toSeq == data.toSeq)
        assert(s.size(s"t/obj-$n") == n)
        assert(s.exists(s"t/obj-$n"))
      }
    }
  }

  test(s"$backendName: ranged fetch (start, mid, border, last byte, EOF clamp)") {
    withBackend { s =>
      val data = Array.tabulate[Byte](3 * chunk + 17)(i => (i % 251).toByte)
      s.uploadBytes(data, "obj")
      def range(from: Long, to: Long): Seq[Byte] = s.fetchRangeBytes("obj", BytesRange(from, to)).toSeq
      assert(range(0, 9) == data.slice(0, 10).toSeq)
      assert(range(500, 1500) == data.slice(500, 1501).toSeq)
      assert(range(chunk - 1, chunk) == data.slice(chunk - 1, chunk + 1).toSeq)
      assert(range(data.length - 1, data.length - 1) == Seq(data.last))
      assert(range(data.length - 5, data.length + 100) == data.takeRight(5).toSeq)
    }
  }

  test(s"$backendName: range past EOF errors; empty range is an empty stream") {
    withBackend { s =>
      s.uploadBytes(Array[Byte](1, 2, 3), "obj")
      intercept[InvalidRange](s.fetchRange("obj", BytesRange(3, 10)))
      assert(s.fetchRangeBytes("obj", BytesRange.empty(1)).isEmpty)
    }
  }

  test(s"$backendName: missing key — fetch/size error, exists false, delete no-op") {
    withBackend { s =>
      intercept[ObjectKeyNotFound](s.fetch("nope"))
      intercept[ObjectKeyNotFound](s.size("nope"))
      assert(!s.exists("nope"))
      s.delete("nope")
    }
  }

  test(s"$backendName: overwrite replaces content") {
    withBackend { s =>
      s.uploadBytes(Array[Byte](1, 1, 1), "k")
      s.uploadBytes(Array[Byte](2, 2), "k")
      assert(s.fetchBytes("k").toSeq == Seq[Byte](2, 2))
    }
  }

  test(s"$backendName: batched delete removes >1000 keys") {
    withBackend { s =>
      val keys = (0 until 1005).map(i => s"bulk/k$i")
      keys.foreach(k => s.uploadBytes(Array[Byte](1), k))
      s.deleteAll(keys)
      assert(s.listKeys("bulk/").isEmpty)
    }
  }

  test(s"$backendName: listKeys by prefix, sorted") {
    withBackend { s =>
      s.uploadBytes(Array[Byte](1), "t1/p0/seg1.log")
      s.uploadBytes(Array[Byte](1), "t1/p0/seg1.rsm-manifest")
      s.uploadBytes(Array[Byte](1), "t2/p0/seg9.log")
      assert(s.listKeys("t1/") == Vector("t1/p0/seg1.log", "t1/p0/seg1.rsm-manifest"))
    }
  }
}
