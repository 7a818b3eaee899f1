package graft.core

import org.scalatest.funsuite.AnyFunSuite

class FastLocalDirSpec extends AnyFunSuite {
  test("explicit empty override forces Spark's default (None)") {
    assert(FastLocalDir.pickFrom(Some("")).isEmpty)
  }

  test("explicit dir override is trusted verbatim, no probe") {
    assert(FastLocalDir.pickFrom(Some("/nonexistent/scratch"))
      .contains("/nonexistent/scratch"))
  }

  test("unset override probes the memory-backed fs; a hit is writable") {
    FastLocalDir.pickFrom(None).foreach { d =>
      val p = java.nio.file.Paths.get(d)
      assert(java.nio.file.Files.isDirectory(p) && java.nio.file.Files.isWritable(p))
      assert(d.startsWith("/dev/shm/"))
    }
  }
}
