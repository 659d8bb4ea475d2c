package graft.core

/** One seeded 64-bit hash primitive — the building block of a
  * [[KMHashPair]]. Carries both the byte-slice and the single-long form
  * (the long form is the chained-fold hot path of the native row hasher,
  * which folds primitive column values without materializing bytes) plus
  * the static method name in [[Hashing]] for whole-stage codegen: the
  * generated probe code calls `Hashing.<javaName>(byte[], long)` /
  * `Hashing.<javaName>Long(long, long)` directly.
  */
sealed abstract class HashAlgo(val javaName: String) extends Serializable {
  def apply(b: Array[Byte], seed: Long): Long
  def hashLong(v: Long, seed: Long): Long
}

object HashAlgo {
  case object Xx extends HashAlgo("xxHash64") {
    override def apply(b: Array[Byte], seed: Long): Long = Hashing.xxHash64(b, seed)
    override def hashLong(v: Long, seed: Long): Long = Hashing.xxHash64Long(v, seed)
  }
  case object Murmur extends HashAlgo("murmur3_64") {
    override def apply(b: Array[Byte], seed: Long): Long = Hashing.murmur3_64(b, seed)
    override def hashLong(v: Long, seed: Long): Long = Hashing.murmur3_64Long(v, seed)
  }
  case object Fnv extends HashAlgo("fnv1a64") {
    override def apply(b: Array[Byte], seed: Long): Long = Hashing.fnv1a64(b, seed)
    override def hashLong(v: Long, seed: Long): Long = Hashing.fnv1a64Long(v, seed)
  }
}

/** Injectable 64-bit hash pair for the KM filter — the Spark-side
  * analogue of the reference's `KMBloomFilter<H1, H2>` type parameters
  * (/root/reference/src/km_bloom_filter.rs:46–48), whose integration
  * suite sweeps hasher combinations with per-pair FPR margins
  * (/root/reference/tests/integration.rs:39–146).
  *
  * A registered pair carries a stable byte id so sketch blobs round-trip
  * the codec (Spark aggregation buffers must survive the shuffle) and so
  * merge guards can reject cross-pair unions — the reference forbids
  * those statically, because filters with different type parameters are
  * different types; here the id check is the dynamic equivalent.
  *
  * [[KMHashPair.custom]] injects ANY two `(Array[Byte], Long) => Long`
  * functions for kernel-level use (FPR experiments, driver-side probes);
  * custom pairs have no stable id and are rejected by the codec — give a
  * pair an id here to use it in distributed aggregation.
  */
sealed abstract class KMHashPair(val id: Byte, val name: String) extends Serializable {
  def h1(bytes: Array[Byte]): Long
  def h2(bytes: Array[Byte]): Long
  override def toString: String = name
}

/** A REGISTERED pair: two seeded primitives + their initial seeds.
  * This is the shape the native Catalyst path can run — the chained
  * row-hash fold starts at (seed1, seed2) and folds every key column
  * through (algo1, algo2), and the probe codegen emits the primitives'
  * static calls by name. The default pair's (Xx, 0, Murmur, 0) chain is
  * bit-identical to the pre-injection hardwired RowHasher, so existing
  * RowHash blobs stay probe-compatible. */
sealed abstract class RegisteredKMHashPair(id: Byte, name: String,
    val algo1: HashAlgo, val seed1: Long, val algo2: HashAlgo, val seed2: Long)
  extends KMHashPair(id, name) {
  final override def h1(b: Array[Byte]): Long = algo1(b, seed1)
  final override def h2(b: Array[Byte]): Long = algo2(b, seed2)
}

object KMHashPair {

  /** Default pair: xxHash64 + Murmur3-128 low64 — stands in for the
    * crate's (ahash, SipHash) DefaultBloomFilter alias (lib.rs:176);
    * both are public specs, see graft.core.Hashing. */
  case object XxMurmur extends RegisteredKMHashPair(0, "xx64+murmur3_64",
    HashAlgo.Xx, 0L, HashAlgo.Murmur, 0L)

  /** xxHash64 + FNV-1a — the "fast + compat" pair (reference sweep's
    * <DefaultHasher, fnv::FnvHasher> analogue, integration.rs:57). */
  case object XxFnv extends RegisteredKMHashPair(1, "xx64+fnv1a64",
    HashAlgo.Xx, 0L, HashAlgo.Fnv, 0L)

  /** FNV-1a + Murmur3 — FNV as the base hash (the harder direction:
    * h1 places the first probe bit directly). */
  case object FnvMurmur extends RegisteredKMHashPair(2, "fnv1a64+murmur3_64",
    HashAlgo.Fnv, 0L, HashAlgo.Murmur, 0L)

  /** One algorithm, two seeds — the reference sweep's same-hasher-twice
    * rows (e.g. <ahash, ahash> via distinct keys); independence comes
    * from the seed, not the algorithm. */
  case object XxXx extends RegisteredKMHashPair(3, "xx64(0)+xx64(seeded)",
    HashAlgo.Xx, 0L, HashAlgo.Xx, 0x9E3779B97F4A7C15L)

  val registered: Seq[RegisteredKMHashPair] = Seq(XxMurmur, XxFnv, FnvMurmur, XxXx)

  def byId(id: Byte): RegisteredKMHashPair =
    registered.find(_.id == id).getOrElse(
      throw new IllegalArgumentException(s"unknown KM hash pair id $id"))

  /** Inject an arbitrary pair (kernel-level genericity; not encodable). */
  def custom(f1: Array[Byte] => Long, f2: Array[Byte] => Long,
      label: String = "custom"): KMHashPair =
    new KMHashPair(-1, label) {
      override def h1(b: Array[Byte]): Long = f1(b)
      override def h2(b: Array[Byte]): Long = f2(b)
    }
}
