package graft.core.transform

import java.io.{ByteArrayOutputStream, InputStream}
import java.nio.ByteBuffer
import java.util.zip.{Deflater, Inflater}
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}
import java.security.SecureRandom

import com.github.luben.zstd.{Zstd, ZstdCompressCtx}

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
  // The reference uses zstd-jni (`CompressionChunkEnumeration.java:26-63`);
  // the same zstd-jni ships with Spark's jars, so "zstd" below is WIRE-
  // COMPATIBLE with reference-written chunks: a raw zstd frame, content size
  // embedded in the frame header (no graft prefix), discriminated on read by
  // the zstd magic number. The in-repo codecs (LZ4 block, Deflate) keep the
  // graft layout: int32 content-size prefix + codec tag byte. Default codec
  // is LZ4 — zlib caps the write path near ~80 MB/s at any level, the wrong
  // speed class for a throughput-bound, rate-limited tiering path; Deflate
  // stays readable and selectable for ratio-sensitive cold data; zstd is
  // selectable for interop and near-LZ4 speed at better ratios.

  private final val CodecDeflate: Byte = 0
  private final val CodecLz4: Byte = 1

  /** Manifest codec names (`SegmentManifest.compressionCodec`). */
  final val CodecNameLz4 = "lz4"
  final val CodecNameDeflate = "deflate"
  final val CodecNameZstd = "zstd"

  /** First 4 bytes of every zstd frame (RFC 8878 §3.1.1, little-endian magic
    * 0xFD2FB528). A graft-prefixed chunk starting with these bytes would
    * declare a 0x28B52FFD-byte (651 MiB) content size — far beyond any real
    * chunk; [[compress]]/[[compressDeflate]] still reject that one aliasing
    * size outright so the discrimination is exact, not probabilistic. */
  private final val ZstdMagicAliasSize = 0x28B52FFD
  private def isZstdFrame(c: Array[Byte]): Boolean =
    c.length >= 4 && c(0) == 0x28.toByte && c(1) == 0xB5.toByte &&
      c(2) == 0x2F.toByte && c(3) == 0xFD.toByte

  private def requireUnambiguousSize(n: Int): Unit =
    require(n != ZstdMagicAliasSize,
      s"chunk content size $n aliases the zstd frame magic; " +
        "use the zstd codec (or a different chunk size) for this payload")

  /** Dispatch by manifest codec name (write path). The read path needs no
    * codec argument: [[decompress]] is self-describing via tag byte / zstd
    * magic. */
  def compressWith(chunk: Array[Byte], codec: String): Array[Byte] = codec match {
    case CodecNameLz4 => compress(chunk)
    case CodecNameZstd => compressZstd(chunk)
    case CodecNameDeflate => compressDeflate(chunk)
    case other => throw new IllegalArgumentException(
      s"unknown compression codec '$other' (expected $CodecNameLz4, $CodecNameZstd or $CodecNameDeflate)")
  }

  /** Per-thread context reuse — same rationale as [[cipherPool]]: the context
    * allocates window + workspace buffers once; `compress` emits one complete
    * frame per call, so reuse across chunks is safe and keeps small-chunk
    * throughput off the allocator. The reference allocates per chunk
    * (`CompressionChunkEnumeration.java:52`) — output bytes are identical. */
  private val zstdCtxPool: ThreadLocal[ZstdCompressCtx] = ThreadLocal.withInitial { () =>
    val ctx = new ZstdCompressCtx()
    // Embed the content size in the frame header so the read side can
    // allocate exactly (ref `CompressionChunkEnumeration.java:60`).
    ctx.setContentSize(true)
    ctx
  }

  /** Raw zstd frame, byte-compatible with the reference's write path
    * (`CompressionChunkEnumeration.java:50-63`): pledged source size +
    * embedded content size, default compression level. */
  def compressZstd(chunk: Array[Byte]): Array[Byte] = {
    val ctx = zstdCtxPool.get()
    ctx.setPledgedSrcSize(chunk.length.toLong)
    ctx.compress(chunk)
  }

  def compress(chunk: Array[Byte]): Array[Byte] = {
    requireUnambiguousSize(chunk.length)
    val packed = Lz4.compress(chunk)
    val out = new Array[Byte](5 + packed.length)
    ByteBuffer.wrap(out).putInt(chunk.length).put(CodecLz4)
    System.arraycopy(packed, 0, out, 5, packed.length)
    out
  }

  def compressDeflate(chunk: Array[Byte], level: Int = Deflater.BEST_SPEED): Array[Byte] = {
    requireUnambiguousSize(chunk.length)
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
    if (isZstdFrame(chunk)) {
      // Reference-written (or our zstd-codec) chunk: content size from the
      // frame header, exact-size one-shot decompress — the same read the
      // reference does (`DecompressionChunkEnumeration.java:42-46`).
      val declared = Zstd.decompressedSize(chunk)
      require(declared >= 0 && declared <= Int.MaxValue,
        s"invalid zstd decompressed size: $declared")
      return Zstd.decompress(chunk, declared.toInt)
    }
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
