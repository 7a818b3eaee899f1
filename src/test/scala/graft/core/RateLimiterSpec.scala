package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** T8 semantics: token bucket, greedy refill, refunds, config floor —
  * mirrors `RateLimitedInputStreamTest` behaviors with a fake clock. */
class RateLimiterSpec extends AnyFunSuite {

  test("burst up to capacity passes without waiting; refill is continuous") {
    var now = 0L
    val rl = new RateLimiter(1000000L, () => now) // 1 MB/s
    val t0 = System.nanoTime()
    rl.acquire(1000000L) // full bucket available instantly
    assert((System.nanoTime() - t0) / 1e9 < 0.5)
    now += 500000000L // +0.5s -> 500KB refilled
    val t1 = System.nanoTime()
    rl.acquire(500000L)
    assert((System.nanoTime() - t1) / 1e9 < 0.5)
  }

  test("refund returns budget") {
    var now = 0L
    val rl = new RateLimiter(1000000L, () => now)
    rl.acquire(1000000L)
    rl.refund(400000L)
    val t0 = System.nanoTime()
    rl.acquire(400000L)
    assert((System.nanoTime() - t0) / 1e9 < 0.5)
  }

  test("rate below the floor is rejected; config range constants kept") {
    intercept[IllegalArgumentException](new RateLimiter(100L))
    assert(RateLimiter.MinRate == 16384L)
    assert(RateLimiter.MinConfigRate == 1048576L && RateLimiter.MaxConfigRate == 1000000000L)
  }

  test("rate-limited stream refunds on short reads") {
    var now = 0L
    val rl = new RateLimiter(1000000L, () => now)
    val in = new java.io.ByteArrayInputStream(new Array[Byte](100))
    val limited = new RateLimitedInputStream(in, rl)
    val buf = new Array[Byte](1000)
    assert(limited.read(buf, 0, 1000) == 100) // asked 1000, got 100 -> 900 refunded
    val t0 = System.nanoTime()
    rl.acquire(999900L - 1000L) // most of the bucket should still be there
    assert((System.nanoTime() - t0) / 1e9 < 0.5)
  }
}
