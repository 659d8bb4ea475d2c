package graft.core

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

object KMHashPair {

  /** Default pair: xxHash64 + Murmur3-128 low64 — stands in for the
    * crate's (ahash, SipHash) DefaultBloomFilter alias (lib.rs:176);
    * both are public specs, see graft.core.Hashing. */
  case object XxMurmur extends KMHashPair(0, "xx64+murmur3_64") {
    override def h1(b: Array[Byte]): Long = Hashing.xxHash64(b, 0L)
    override def h2(b: Array[Byte]): Long = Hashing.murmur3_64(b, 0L)
  }

  /** xxHash64 + FNV-1a — the "fast + compat" pair (reference sweep's
    * <DefaultHasher, fnv::FnvHasher> analogue, integration.rs:57). */
  case object XxFnv extends KMHashPair(1, "xx64+fnv1a64") {
    override def h1(b: Array[Byte]): Long = Hashing.xxHash64(b, 0L)
    override def h2(b: Array[Byte]): Long = Hashing.fnv1a64(b, 0L)
  }

  /** FNV-1a + Murmur3 — FNV as the base hash (the harder direction:
    * h1 places the first probe bit directly). */
  case object FnvMurmur extends KMHashPair(2, "fnv1a64+murmur3_64") {
    override def h1(b: Array[Byte]): Long = Hashing.fnv1a64(b, 0L)
    override def h2(b: Array[Byte]): Long = Hashing.murmur3_64(b, 0L)
  }

  /** One algorithm, two seeds — the reference sweep's same-hasher-twice
    * rows (e.g. <ahash, ahash> via distinct keys); independence comes
    * from the seed, not the algorithm. */
  case object XxXx extends KMHashPair(3, "xx64(0)+xx64(seeded)") {
    private final val Seed2 = 0x9E3779B97F4A7C15L
    override def h1(b: Array[Byte]): Long = Hashing.xxHash64(b, 0L)
    override def h2(b: Array[Byte]): Long = Hashing.xxHash64(b, Seed2)
  }

  val registered: Seq[KMHashPair] = Seq(XxMurmur, XxFnv, FnvMurmur, XxXx)

  def byId(id: Byte): KMHashPair =
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
