package graft.core

/** Token-bucket byte-rate limiter, greedy refill per second, mirroring the
  * semantics of `transform/RateLimitedInputStream.java:33-86` (bucket4j-based
  * in the reference): capacity = rate bytes, refilled continuously; callers
  * `acquire(n)` before moving n bytes and may `refund(n)` unused tokens.
  *
  * Used by segment writers (`foreachPartition`) and as the pacing primitive
  * behind streaming `maxFilesPerTrigger`-style throttling. Thread-safe.
  */
final class RateLimiter(bytesPerSecond: Long, nanoTime: () => Long = System.nanoTime) {
  require(bytesPerSecond >= RateLimiter.MinRate,
    s"rate must be >= ${RateLimiter.MinRate} B/s, $bytesPerSecond given")

  private var available: Double = bytesPerSecond.toDouble
  private var lastRefill: Long = nanoTime()

  private def refill(): Unit = {
    val now = nanoTime()
    val elapsed = (now - lastRefill) / 1e9
    if (elapsed > 0) {
      available = math.min(bytesPerSecond.toDouble, available + elapsed * bytesPerSecond)
      lastRefill = now
    }
  }

  /** Block until `n` bytes of budget are available, then consume them. */
  def acquire(n: Long): Unit = {
    var remaining = n.toDouble
    while (remaining > 0) {
      val wait = synchronized {
        refill()
        if (available > 0) {
          val take = math.min(available, remaining)
          available -= take
          remaining -= take
          0L
        } else {
          // nanos until one chunk of budget exists
          math.max(((math.min(remaining, bytesPerSecond.toDouble) - available) / bytesPerSecond * 1e9).toLong, 1000000L)
        }
      }
      if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
    }
  }

  /** Return unused tokens (the reference refunds when a read returns fewer
    * bytes than requested, `RateLimitedInputStream.java:72-80`). */
  def refund(n: Long): Unit = synchronized {
    available = math.min(bytesPerSecond.toDouble, available + n)
  }
}

object RateLimiter {
  /** Floor kept from the reference (JDK>=21 value), ref
    * `RateLimitedInputStream.java:36-46`. */
  val MinRate = 16384L
  /** Config validity range kept from `RemoteStorageManagerConfig.java:240`. */
  val MinConfigRate = 1048576L
  val MaxConfigRate = 1000000000L
}

/** InputStream wrapper applying a [[RateLimiter]] per read. */
final class RateLimitedInputStream(in: java.io.InputStream, limiter: RateLimiter)
    extends java.io.FilterInputStream(in) {
  override def read(): Int = {
    limiter.acquire(1)
    val b = in.read()
    if (b == -1) limiter.refund(1)
    b
  }
  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    limiter.acquire(len)
    val n = in.read(buf, off, len)
    if (n < len) limiter.refund(if (n == -1) len else len - n)
    n
  }
}
