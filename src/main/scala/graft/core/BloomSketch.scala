package graft.core

/** Common contract of the two Bloom variants — the reference's
  * `BloomFilter` trait (`/root/reference/src/lib.rs:180–234`): insert +
  * contains, never false-negative, plus the union/intersect/estimator
  * surface both reference impls share. Mutable by design: instances are
  * Spark aggregation buffers (one per partition), mutated single-threaded
  * per task exactly like the reference's `&mut self`.
  */
sealed trait BloomSketch extends Serializable {
  def config: BloomConfig
  def bits: BitArray

  /** Variant tag for codec + merge-compatibility (a KM filter and a seeded
    * filter are never mergeable, mirroring the reference's distinct types). */
  def variant: Byte

  /** Hash-pair id for codec + merge-compatibility (KM filters built with
    * different injected pairs are different filter types in the
    * reference's type system — km_bloom_filter.rs:46–48 — so merging
    * them must be rejected here too). Seeded variant: always 0. */
  def hasherId: Byte = 0

  def insert(bytes: Array[Byte]): Unit
  def mightContain(bytes: Array[Byte]): Boolean

  @inline final def insert(s: String): Unit = insert(Hashing.utf8(s))
  @inline final def mightContain(s: String): Boolean = mightContain(Hashing.utf8(s))
  @inline final def insertLong(v: Long): Unit = insert(longBytes(v))
  @inline final def mightContainLong(v: Long): Boolean = mightContain(longBytes(v))

  @inline protected final def longBytes(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  /** Whether the hash-pair OBJECTS match — only consulted for custom
    * (unregistered) pairs, which all share id -1: two different custom
    * pairs would pass the id check and union into a silently corrupt
    * filter (the reference forbids this statically via type parameters).
    * Registered pairs are fully identified by their id. */
  protected def sameHashers(other: BloomSketch): Boolean = true

  protected final def requireCompatible(other: BloomSketch): Unit = {
    require(variant == other.variant,
      s"cannot merge different Bloom variants ($variant vs ${other.variant})")
    require(hasherId == other.hasherId,
      s"cannot merge KM filters built with different hash pairs " +
        s"($hasherId vs ${other.hasherId})")
    require(hasherId >= 0 || sameHashers(other),
      "cannot merge KM filters built with different CUSTOM hash pairs — " +
        "custom pairs share id -1, so only the identical pair instance is " +
        "provably the same pair; register the pair in KMHashPair for a " +
        "stable identity")
    // Same panic condition as reference union/intersect
    // (km_bloom_filter.rs:185–187, 254–256; seeded_bloom_filter.rs:129–131).
    require(config.eqConfiguration(other.config),
      "unable to union/intersect filters with different configurations " +
        s"(k=${config.numberOfHashers},bph=${config.bitsPerHasher}) vs " +
        s"(k=${other.config.numberOfHashers},bph=${other.config.bitsPerHasher})")
  }

  /** In-place union (reference km_bloom_filter.rs:184–194; kernel
    * bitset.rs:66–82). Associative + commutative ⇒ legal as Spark's
    * partial/final aggregation merge in any tree order. */
  final def unionInPlace(other: BloomSketch): this.type = {
    requireCompatible(other)
    bits.orInPlace(other.bits)
    this
  }

  /** In-place intersect (reference km_bloom_filter.rs:253–263; kernel
    * bitset.rs:84–100). Query-side set op, NOT the aggregation merge.
    * Reference-documented caveat (km_bloom_filter.rs:196–204): estimators
    * on the result may over-estimate vs a freshly-built filter. */
  final def intersectInPlace(other: BloomSketch): this.type = {
    requireCompatible(other)
    bits.andInPlace(other.bits)
    this
  }

  /** n* = −bph·ln(1 − ones/m) — reference lib.rs:254–261. */
  final def approximateElementCount: Double =
    BloomConfig.approximateElementCount(config.numberOfHashers, config.bitsPerHasher, bits.countOnes)

  /** (1 − e^(−nEst/bph))^k — reference lib.rs:267–274. */
  final def approximateCurrentFpp: Double =
    BloomConfig.approximateFpp(config.numberOfHashers, config.bitsPerHasher, bits.countOnes)

  def copySketch(): BloomSketch

  /** Diagnostics (reference Debug impls dump the raw bit vector,
    * km_bloom_filter.rs:293–301 — at 10^9 bits we summarize instead). */
  override def toString: String =
    s"${getClass.getSimpleName}(k=${config.numberOfHashers}, bph=${config.bitsPerHasher}, " +
      s"ones=${bits.countOnes}, n*=${approximateElementCount.formatted("%.1f")}, " +
      s"fpp*=${approximateCurrentFpp.formatted("%.2e")})"

  override def equals(o: Any): Boolean = o match {
    case b: BloomSketch =>
      b.variant == variant && b.hasherId == hasherId &&
        b.config.eqConfiguration(config) && b.bits == bits
    case _ => false
  }
  override def hashCode: Int = (bits.hashCode * 31 + variant) * 31 + hasherId
}

/** Kirsch–Mitzenmacher double-hashing Bloom filter — the reference's
  * `KMBloomFilter<H1, H2>` (`/root/reference/src/km_bloom_filter.rs`)
  * with the hash pair INJECTED (see [[KMHashPair]]); the default
  * (xxHash64, Murmur3-128 low64) stands in for the crate's
  * (ahash, SipHash) `DefaultBloomFilter` alias (lib.rs:176).
  *
  * Index derivation (km_bloom_filter.rs:287–290): for hasher i,
  *   g_i = h1 + i·h2   with wrapping u64 arithmetic,
  *   index = i·bph + (g_i mod_unsigned bph)
  * — hasher i's bits live in its own disjoint segment.
  */
final class KMBloomSketch(val config: BloomConfig, val bits: BitArray,
    val hashers: KMHashPair = KMHashPair.XxMurmur) extends BloomSketch {
  override def variant: Byte = BloomVariant.KM
  override def hasherId: Byte = hashers.id
  override protected def sameHashers(other: BloomSketch): Boolean = other match {
    case k: KMBloomSketch => hashers eq k.hashers
    case _ => false
  }

  private[this] val k = config.numberOfHashers
  private[this] val bph = config.bitsPerHasher

  /** Two independent base hashes — reference `generate_hashes`
    * (km_bloom_filter.rs:272–285): full value hashed by each algorithm
    * with a fresh, identically-seeded state per call. */
  @inline def baseHashes(bytes: Array[Byte]): (Long, Long) =
    (hashers.h1(bytes), hashers.h2(bytes))

  /** Insert by precomputed base hashes (hot path for the Spark layer,
    * which hashes once per row upstream). */
  def insertHashes(h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < k) {
      // wrapping add/mul on u64 == native Long overflow in Scala
      val g = h1 + i.toLong * h2
      bits.set(i.toLong * bph + java.lang.Long.remainderUnsigned(g, bph))
      i += 1
    }
  }

  def mightContainHashes(h1: Long, h2: Long): Boolean = {
    var i = 0
    while (i < k) {
      val g = h1 + i.toLong * h2
      // short-circuit on first unset bit (km_bloom_filter.rs:326–333)
      if (!bits.get(i.toLong * bph + java.lang.Long.remainderUnsigned(g, bph))) return false
      i += 1
    }
    true
  }

  override def insert(bytes: Array[Byte]): Unit = {
    val (h1, h2) = baseHashes(bytes)
    insertHashes(h1, h2)
  }

  override def mightContain(bytes: Array[Byte]): Boolean = {
    val (h1, h2) = baseHashes(bytes)
    mightContainHashes(h1, h2)
  }

  override def copySketch(): KMBloomSketch = new KMBloomSketch(config, bits.copy(), hashers)
}

object KMBloomSketch {
  /** Reference `KMBloomFilter::new` (km_bloom_filter.rs:92–105). */
  def apply(capacity: Long, fpp: Double): KMBloomSketch = apply(BloomConfig(capacity, fpp))
  def apply(config: BloomConfig): KMBloomSketch =
    new KMBloomSketch(config, BitArray(config.totalBits))
  /** Construct with an injected hash pair — `KMBloomFilter::<H1,H2>::new`. */
  def apply(capacity: Long, fpp: Double, hashers: KMHashPair): KMBloomSketch =
    apply(BloomConfig(capacity, fpp), hashers)
  def apply(config: BloomConfig, hashers: KMHashPair): KMBloomSketch =
    new KMBloomSketch(config, BitArray(config.totalBits), hashers)
}

/** Per-index seeded Bloom filter — the reference's `SeededBloomFilter`
  * (`/root/reference/src/seeded_bloom_filter.rs`): hasher i is the same
  * algorithm seeded with i (reference: `AHasher::new_with_keys(i,i)`,
  * seeded_bloom_filter.rs:209; here: xxHash64(seed=i)).
  * Index (seeded_bloom_filter.rs:205–212): i·bph + (hash_i mod bph).
  */
final class SeededBloomSketch(val config: BloomConfig, val bits: BitArray) extends BloomSketch {
  override def variant: Byte = BloomVariant.Seeded

  private[this] val k = config.numberOfHashers
  private[this] val bph = config.bitsPerHasher

  override def insert(bytes: Array[Byte]): Unit = {
    var i = 0
    while (i < k) {
      val h = Hashing.xxHash64(bytes, i.toLong)
      bits.set(i.toLong * bph + java.lang.Long.remainderUnsigned(h, bph))
      i += 1
    }
  }

  override def mightContain(bytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < k) {
      val h = Hashing.xxHash64(bytes, i.toLong)
      if (!bits.get(i.toLong * bph + java.lang.Long.remainderUnsigned(h, bph))) return false
      i += 1
    }
    true
  }

  override def copySketch(): SeededBloomSketch = new SeededBloomSketch(config, bits.copy())
}

object SeededBloomSketch {
  /** Reference `SeededBloomFilter::new` (seeded_bloom_filter.rs:46–58). */
  def apply(capacity: Long, fpp: Double): SeededBloomSketch = apply(BloomConfig(capacity, fpp))
  def apply(config: BloomConfig): SeededBloomSketch =
    new SeededBloomSketch(config, BitArray(config.totalBits))
}

object BloomVariant {
  val KM: Byte = 0
  val Seeded: Byte = 1
}
