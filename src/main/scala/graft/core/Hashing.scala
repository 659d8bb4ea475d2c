package graft.core

/** From-scratch 64-bit hash kernels used by every sketch.
  *
  * Implemented from the published algorithm specifications (xxHash by Yann
  * Collet, spec at github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md;
  * MurmurHash3 x64-128 by Austin Appleby, public domain). NOT copied from
  * the reference crate — the reference (`/root/reference/src/lib.rs:176`)
  * uses Rust-private ahash/SipHash; any two independent 64-bit hashes
  * preserve the Kirsch–Mitzenmacher guarantee (reference doc
  * `/root/reference/src/lib.rs:21-32`), so we standardize on
  * xxHash64 + Murmur3_128(low64), cross-checked in tests against Spark's
  * own `xxhash64` expression and Guava's murmur3_128.
  *
  * All reads are little-endian over `Array[Byte]`.
  */
object Hashing {

  // ---------------------------------------------------------------- xxHash64
  private final val P1 = 0x9E3779B185EBCA87L
  private final val P2 = 0xC2B2AE3D27D4EB4FL
  private final val P3 = 0x165667B19E3779F9L
  private final val P4 = 0x85EBCA77C2B2AE63L
  private final val P5 = 0x27D4EB2F165667C5L

  @inline private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  @inline private def readLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def readIntLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  @inline private def xxRound(acc: Long, input: Long): Long =
    rotl(acc + input * P2, 31) * P1

  @inline private def xxMerge(h: Long, v: Long): Long =
    (h ^ xxRound(0L, v)) * P1 + P4

  /** xxHash64 over a byte slice. Matches the reference XXH64 vectors and
    * Spark's `xxhash64(...)` (which uses seed 42). */
  def xxHash64(bytes: Array[Byte], seed: Long): Long = {
    val len = bytes.length
    var i = 0
    var h: Long = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = len - 32
      while (i <= limit) {
        v1 = xxRound(v1, readLongLE(bytes, i))
        v2 = xxRound(v2, readLongLE(bytes, i + 8))
        v3 = xxRound(v3, readLongLE(bytes, i + 16))
        v4 = xxRound(v4, readLongLE(bytes, i + 24))
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = xxMerge(h, v1); h = xxMerge(h, v2); h = xxMerge(h, v3); h = xxMerge(h, v4)
    } else {
      h = seed + P5
    }
    h += len
    while (i + 8 <= len) {
      h ^= xxRound(0L, readLongLE(bytes, i))
      h = rotl(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h ^= readIntLE(bytes, i) * P1
      h = rotl(h, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h ^= (bytes(i) & 0xffL) * P5
      h = rotl(h, 11) * P1
      i += 1
    }
    avalanche64(h)
  }

  @inline private def avalanche64(x: Long): Long = {
    var h = x
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  /** xxHash64 of a single long value (8 LE bytes), without materializing an
    * array — the hot path for hash-of-hash and seeded index derivation. */
  def xxHash64Long(value: Long, seed: Long): Long = {
    var h = seed + P5 + 8L
    h ^= xxRound(0L, value)
    h = rotl(h, 27) * P1 + P4
    avalanche64(h)
  }

  // ------------------------------------------------- MurmurHash3 x64 128-bit
  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  /** Murmur3 64-bit finalizer (avalanche) — public for callers that need
    * to whiten a weak structured hash (e.g. a polynomial rolling hash)
    * before using it in min-selection or bucketing. */
  @inline def fmix64(v: Long): Long = {
    var k = v
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** MurmurHash3 x64 128-bit; returns (h1, h2). Matches Guava murmur3_128. */
  def murmur3_128(bytes: Array[Byte], seed: Long): (Long, Long) = {
    val len = bytes.length
    var h1 = seed
    var h2 = seed
    val nblocks = len / 16
    var b = 0
    while (b < nblocks) {
      var k1 = readLongLE(bytes, b * 16)
      var k2 = readLongLE(bytes, b * 16 + 8)
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      b += 1
    }
    // tail
    val t = nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    if (rem > 8) {
      var j = rem - 1
      while (j >= 8) { k2 = (k2 << 8) | (bytes(t + j) & 0xffL); j -= 1 }
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 = (k1 << 8) | (bytes(t + j) & 0xffL); j -= 1 }
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
    }
    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  /** Low 64 bits of murmur3_128 — the second independent hash of the default
    * (KM) filter configuration. */
  def murmur3_64(bytes: Array[Byte], seed: Long): Long = murmur3_128(bytes, seed)._1

  /** murmur3_128 low64 of a single long value (8 LE bytes) without
    * materializing an array — equals murmur3_64(longBytes(v), seed).
    * (The 8-byte input is the tail-only case: k1 = v.) */
  def murmur3_64Long(value: Long, seed: Long): Long = {
    var h1 = seed
    var h2 = seed
    var k1 = value
    k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
    h1 ^= 8L; h2 ^= 8L
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2
    h1
  }

  // ---------------------------------------------------------------- FNV-1a
  /** FNV-1a 64-bit (Fowler–Noll–Vo, public-domain spec at
    * www.isthe.com/chongo/tech/comp/fnv) — the compat/simplicity hash of
    * the hasher matrix, mirroring the reference sweep's fnv::FnvHasher
    * (/root/reference/tests/integration.rs:57). The seed folds into the
    * offset basis; seed 0 is canonical FNV-1a. */
  def fnv1a64(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** FNV-1a of a single long value (8 LE bytes) without materializing an
    * array — equals fnv1a64(longBytes(v), seed); the chained-fold twin
    * used by the native row-hash path for FNV-based pairs. */
  def fnv1a64Long(value: Long, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < 8) {
      h ^= (value >>> (8 * i)) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Canonical UTF-8 byte encoding of a string key. */
  @inline def utf8(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
}
