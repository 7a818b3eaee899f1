package graft.core.transform

/** Pure-Scala LZ4 *block* codec (the public LZ4 block format: token byte
  * with literal/match-length nibbles + 255-extensions, 16-bit little-endian
  * match offsets, 64 KiB window, minimum match 4, last-5-bytes-literal /
  * no-match-in-last-12 end rules).
  *
  * Why it exists: the reference compresses chunks with zstd-jni
  * (`CompressionChunkEnumeration.java:26-63`), which is not resolvable in
  * this offline build; zlib's Deflater caps the write path near ~80 MB/s
  * regardless of level. An LZ4-fast compressor is a few hundred lines,
  * sits at several hundred MB/s in the JVM, and decompresses at GB/s —
  * the right speed class for a throughput-bound tiering path.
  *
  * Validated by round-trip property tests (random, compressible, and
  * pathological inputs); no interop fixtures are claimed offline.
  */
object Lz4 {
  private final val MinMatch = 4
  private final val HashLog = 16
  private final val MaxDistance = 0xFFFF

  /** Worst-case compressed size for `n` input bytes (incompressible data
    * costs 1 token + extensions per 255-literal run). */
  def maxCompressedLength(n: Int): Int = n + n / 255 + 16

  // NB: manual byte composition, NOT a byteArrayViewVarHandle — Scala emits
  // VarHandle.get as the generic (boxing) invoker, which measured 2x SLOWER
  // than these four loads under JIT.
  private def read32(a: Array[Byte], i: Int): Int =
    (a(i) & 0xFF) | ((a(i + 1) & 0xFF) << 8) | ((a(i + 2) & 0xFF) << 16) | ((a(i + 3) & 0xFF) << 24)

  /** Per-thread scratch reuse (r8, VERDICT r7 task 7): the 256 KiB hash
    * table and the worst-case output buffer were allocated PER CALL — at
    * 100 KiB chunks that is ~3.5 bytes of allocation per payload byte
    * (2.6 GB of table garbage alone for a 1 GiB content), which turned
    * the 10 240-chunk transform point GC-bound (360 MB/s vs ~600 at large
    * chunks). Pooled per thread: the table refills with -1 per call (the
    * cost the allocator paid anyway as zeroing) and the dst scratch grows
    * to the largest chunk seen; the exact-size result is still copied out
    * fresh, so no caller ever observes shared state. Thread-safe by
    * ThreadLocal; output bytes identical. */
  private val tablePool: ThreadLocal[Array[Int]] =
    ThreadLocal.withInitial(() => new Array[Int](1 << HashLog))
  private val dstPool: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](0))

  def compress(src: Array[Byte]): Array[Byte] = {
    val n = src.length
    val needed = maxCompressedLength(n)
    var dst = dstPool.get()
    if (dst.length < needed) {
      dst = new Array[Byte](needed)
      dstPool.set(dst)
    }
    var d = 0

    def writeLen(extra: Int): Unit = {
      var e = extra
      while (e >= 255) { dst(d) = -1; d += 1; e -= 255 }
      dst(d) = e.toByte; d += 1
    }
    def emit(anchor: Int, litEnd: Int, offset: Int, matchLen: Int): Unit = {
      val lit = litEnd - anchor
      val litNib = math.min(lit, 15)
      val matNib = if (matchLen < 0) 0 else math.min(matchLen - MinMatch, 15)
      dst(d) = ((litNib << 4) | matNib).toByte; d += 1
      if (litNib == 15) writeLen(lit - 15)
      System.arraycopy(src, anchor, dst, d, lit); d += lit
      if (matchLen >= 0) {
        dst(d) = (offset & 0xFF).toByte; dst(d + 1) = ((offset >>> 8) & 0xFF).toByte; d += 2
        if (matNib == 15) writeLen(matchLen - MinMatch - 15)
      }
    }

    if (n < 13) { emit(0, n, 0, -1); return java.util.Arrays.copyOf(dst, d) }

    val table = tablePool.get()
    java.util.Arrays.fill(table, -1)
    def hash(v: Int): Int = (v * 0x9E3779B1) >>> (32 - HashLog)

    val mfLimit = n - 12 // no match may START at/after here
    val matchLimit = n - 5 // last 5 bytes stay literals
    var anchor = 0
    var i = 0
    // skip-acceleration (as in LZ4 fast): every 64 consecutive misses the
    // step grows by one, so incompressible regions are skimmed instead of
    // probed byte-by-byte — they cost literals either way
    var misses = 1 << 6
    while (i < mfLimit) {
      val v = read32(src, i)
      val h = hash(v)
      val ref = table(h)
      table(h) = i
      if (ref >= 0 && i - ref <= MaxDistance && read32(src, ref) == v) {
        var mlen = MinMatch
        while (i + mlen < matchLimit && src(ref + mlen) == src(i + mlen)) mlen += 1
        emit(anchor, i, i - ref, mlen)
        i += mlen
        anchor = i
        misses = 1 << 6
      } else {
        i += (misses >> 6)
        misses += 1
      }
    }
    emit(anchor, n, 0, -1)
    java.util.Arrays.copyOf(dst, d)
  }

  /** Decompress `src[off until end)` into exactly `dstLen` bytes. */
  def decompress(src: Array[Byte], off: Int, end: Int, dstLen: Int): Array[Byte] = {
    val dst = new Array[Byte](dstLen)
    var s = off
    var d = 0
    while (s < end) {
      val token = src(s) & 0xFF; s += 1
      var lit = token >>> 4
      if (lit == 15) {
        var b = 0
        while ({ b = src(s) & 0xFF; s += 1; b == 255 }) lit += 255
        lit += b
      }
      if (lit > 0) { System.arraycopy(src, s, dst, d, lit); s += lit; d += lit }
      if (s < end) {
        val offset = (src(s) & 0xFF) | ((src(s + 1) & 0xFF) << 8); s += 2
        require(offset > 0 && offset <= d, s"corrupt LZ4 stream: offset $offset at dst pos $d")
        var mlen = (token & 15) + MinMatch
        if ((token & 15) == 15) {
          var b = 0
          while ({ b = src(s) & 0xFF; s += 1; b == 255 }) mlen += 255
          mlen += b
        }
        if (offset >= mlen) {
          // non-overlapping: single block copy
          System.arraycopy(dst, d - offset, dst, d, mlen)
          d += mlen
        } else {
          // overlapping match replicates the last `offset` bytes — copy in
          // doubling runs (offset, 2*offset, ...) instead of byte-by-byte
          var m = d - offset
          var remaining = mlen
          var run = offset
          while (remaining > 0) {
            val n0 = math.min(run, remaining)
            System.arraycopy(dst, m, dst, d, n0)
            d += n0
            remaining -= n0
            run += n0 // the replicated region has grown; next copy can double
          }
        }
      }
    }
    require(d == dstLen, s"corrupt LZ4 stream: produced $d of $dstLen bytes")
    dst
  }
}
