package graft.core.transform

import java.io.{ByteArrayOutputStream, InputStream}
import java.nio.ByteBuffer
import java.util.zip.{Deflater, Inflater}
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}
import java.security.SecureRandom

/** Write-path / read-path chunk transforms, as idiomatic Scala `Iterator`
  * pipelines (the reference composes Java `Enumeration` decorators —
  * `core/.../transform/..ChunkEnumeration.java`). Each stage is a pure
  * per-chunk map, which is exactly what makes the Spark layer a set of
  * narrow `mapPartitions` stages with no shuffle.
  */
object Transforms {

  /** Chunking scan: split a stream into `chunkSize`-byte arrays; `chunkSize
    * == 0` disables chunking (whole stream = one chunk). Ref
    * `BaseTransformChunkEnumeration.java:29-98`. */
  def chunked(in: InputStream, chunkSize: Int): Iterator[Array[Byte]] = {
    require(chunkSize >= 0, s"chunkSize must be non-negative, $chunkSize given")
    if (chunkSize == 0) {
      val all = in.readAllBytes()
      if (all.isEmpty) Iterator.empty else Iterator.single(all)
    } else
      new Iterator[Array[Byte]] {
        private var nextChunk: Array[Byte] = null
        private var eof = false
        private def advance(): Unit = if (nextChunk == null && !eof) {
          val buf = new Array[Byte](chunkSize)
          var off = 0
          var n = 0
          while (off < chunkSize && { n = in.read(buf, off, chunkSize - off); n != -1 }) off += n
          if (off == 0) eof = true
          else nextChunk = if (off == chunkSize) buf else java.util.Arrays.copyOf(buf, off)
        }
        def hasNext: Boolean = { advance(); nextChunk != null }
        def next(): Array[Byte] = {
          advance()
          if (nextChunk == null) throw new NoSuchElementException
          val c = nextChunk; nextChunk = null; c
        }
      }
  }

  /** Split a whole in-memory segment into chunks (Spark-side path, where the
    * payload is already a `BinaryType` column value). */
  def chunkedBytes(bytes: Array[Byte], chunkSize: Int): Iterator[Array[Byte]] = {
    // Fail fast: Array.grouped(n <= 0) silently loops forever emitting empty
    // slices (pos never advances past the end) — a negative chunk size once
    // allocated its way to OutOfMemoryError before surfacing as an error.
    require(chunkSize >= 0, s"chunkSize must be non-negative, $chunkSize given")
    if (chunkSize == 0 || chunkSize >= bytes.length) {
      if (bytes.isEmpty) Iterator.empty else Iterator.single(bytes)
    } else bytes.grouped(chunkSize)
  }

  // --- Compression (T2 / R7) ------------------------------------------------
  // The reference uses zstd-jni (`CompressionChunkEnumeration.java:26-63`).
  // zstd is not resolvable offline; the codec is pluggable with the same
  // contract: per-chunk independent compression, self-describing content
  // size (int32 prefix, the way zstd embeds it via
  // `Zstd.getFrameContentSize`), plus a codec tag byte. Default codec is
  // the in-repo LZ4 block implementation ([[Lz4]]) — zlib caps the write
  // path near ~80 MB/s at any level, the wrong speed class for a
  // throughput-bound, rate-limited tiering path; Deflate stays readable
  // and selectable for ratio-sensitive cold data.

  private final val CodecDeflate: Byte = 0
  private final val CodecLz4: Byte = 1

  def compress(chunk: Array[Byte]): Array[Byte] = {
    val packed = Lz4.compress(chunk)
    val out = new Array[Byte](5 + packed.length)
    ByteBuffer.wrap(out).putInt(chunk.length).put(CodecLz4)
    System.arraycopy(packed, 0, out, 5, packed.length)
    out
  }

  def compressDeflate(chunk: Array[Byte], level: Int = Deflater.BEST_SPEED): Array[Byte] = {
    val deflater = new Deflater(level)
    try {
      deflater.setInput(chunk)
      deflater.finish()
      val out = new ByteArrayOutputStream(math.max(chunk.length / 2, 64))
      out.write(ByteBuffer.allocate(5).putInt(chunk.length).put(CodecDeflate).array())
      val buf = new Array[Byte](8192)
      while (!deflater.finished()) {
        val n = deflater.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally deflater.end()
  }

  def decompress(chunk: Array[Byte]): Array[Byte] = {
    val contentSize = ByteBuffer.wrap(chunk, 0, 4).getInt()
    chunk(4) match {
      case CodecLz4 => Lz4.decompress(chunk, 5, chunk.length, contentSize)
      case CodecDeflate => inflate(chunk, 5, contentSize)
      // Legacy layout (pre-codec-tag builds): 4-byte size prefix, zlib
      // stream starting AT offset 4 — its first byte is the CMF header,
      // whose low nibble is always 8 (deflate), never colliding with tags
      // 0/1. Segments persisted by earlier builds stay readable instead of
      // failing with "unknown codec tag 120". New segments also carry the
      // codec in the manifest (`compression_codec`), making the format
      // self-describing going forward.
      case cmf if (cmf & 0x0F) == 8 => inflate(chunk, 4, contentSize)
      case other => throw new IllegalArgumentException(
        s"unknown codec tag $other (not LZ4=1, Deflate=0, or a legacy zlib header)")
    }
  }

  private def inflate(chunk: Array[Byte], from: Int, contentSize: Int): Array[Byte] = {
    val inflater = new Inflater()
    try {
      inflater.setInput(chunk, from, chunk.length - from)
      val out = new Array[Byte](contentSize)
      var off = 0
      while (off < contentSize && !inflater.finished()) {
        off += inflater.inflate(out, off, contentSize - off)
      }
      require(off == contentSize, s"decompressed $off bytes, expected $contentSize")
      out
    } finally inflater.end()
  }

  // --- Encryption (T3 / R6) -------------------------------------------------
  // AES-256-GCM, fresh IV per chunk, output = IV || ciphertext || tag.
  // Ref `EncryptionChunkEnumeration.java:30-85` (IV prepend :73-75).

  val GcmIvLength = 12
  val GcmTagLengthBits = 128
  val GcmTagLength: Int = GcmTagLengthBits / 8
  private val random = new SecureRandom()

  /** Cipher instances are reused per thread and re-`init`ed per chunk —
    * `Cipher.getInstance` (provider lookup) costs ~ms and dominates at small
    * chunk sizes; re-initialization with a fresh IV is cheap and preserves
    * the reference's fresh-IV-per-chunk semantics
    * (`EncryptionChunkEnumeration.java:66-75` allocates per chunk; SURVEY §7
    * hard point 6 licenses this pooling). Cipher objects are not
    * thread-safe; ThreadLocal keeps them task-private on executors. */
  private val cipherPool: ThreadLocal[Cipher] =
    ThreadLocal.withInitial(() => Cipher.getInstance("AES/GCM/NoPadding"))

  /** Constant per-chunk size overhead of encryption — what makes the
    * encrypted index still [[graft.core.FixedSizeChunkIndex]]-able
    * (ref `EncryptionChunkEnumeration.java:81-84`). */
  def encryptionOverhead: Int = GcmIvLength + GcmTagLength

  /** Per-thread, in-process PRNG for IVs: the shared NativePRNG pays a
    * synchronized syscall per nextBytes, which dominates small-chunk
    * encryption. GCM requires IV *uniqueness* per key; SHA1PRNG seeded once
    * from system entropy provides it without the per-call cost. */
  private val ivRandom: ThreadLocal[SecureRandom] = ThreadLocal.withInitial { () =>
    val r = SecureRandom.getInstance("SHA1PRNG")
    r.setSeed(random.generateSeed(32))
    r
  }

  def encrypt(chunk: Array[Byte], key: Array[Byte], aad: Array[Byte]): Array[Byte] = {
    val iv = new Array[Byte](GcmIvLength)
    ivRandom.get().nextBytes(iv)
    encryptWithIv(chunk, key, aad, iv)
  }

  private[graft] def encryptWithIv(
      chunk: Array[Byte], key: Array[Byte], aad: Array[Byte], iv: Array[Byte]): Array[Byte] = {
    val cipher = cipherPool.get()
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"), new GCMParameterSpec(GcmTagLengthBits, iv))
    if (aad.nonEmpty) cipher.updateAAD(aad)
    val ct = cipher.doFinal(chunk)
    val out = new Array[Byte](iv.length + ct.length)
    System.arraycopy(iv, 0, out, 0, iv.length)
    System.arraycopy(ct, 0, out, iv.length, ct.length)
    out
  }

  def decrypt(chunk: Array[Byte], key: Array[Byte], aad: Array[Byte]): Array[Byte] = {
    val cipher = cipherPool.get()
    cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(GcmTagLengthBits, chunk, 0, GcmIvLength))
    if (aad.nonEmpty) cipher.updateAAD(aad)
    cipher.doFinal(chunk, GcmIvLength, chunk.length - GcmIvLength)
  }
}
