package graft.core

/** Theta (KMV — k'th-minimum-value) sketch: distinct-count under SET
  * ALGEBRA.
  *
  * The reference gives Bloom filters union AND intersection
  * (`/root/reference/src/km_bloom_filter.rs:184–263`,
  * `/root/reference/src/bitset.rs:66–100`) — set algebra over
  * MEMBERSHIP. HLL extends the family with cardinality but supports
  * union only. The theta sketch closes the gap: mergeable distinct
  * counts that also survive intersection and difference, i.e. the
  * cardinality analogue of the reference's `union`/`intersect` pair
  * (same query-side composition shape: build per partition, merge
  * across the shuffle, intersect/difference at query time).
  *
  * Model (Bar-Yossef et al. 2002 KMV; Dasgupta/Lang/Rhodes "theta"
  * framing as in the Apache DataSketches papers): each key is hashed to
  * a uniform u64; the sketch retains the k smallest DISTINCT hash
  * values strictly below a threshold θ (as u64). While fewer than k
  * values have been seen, θ = 2^64 ("exact mode") and the estimate is
  * the exact retained count. On overflow the largest retained value is
  * evicted and becomes θ, so the state is always (entries < θ, |entries|
  * ≤ k). Estimate = |entries| / (θ/2^64). Relative standard error
  * ≈ 1/√(k−1) in estimation mode.
  *
  * Union keeps the k smallest distinct values below min(θa, θb) —
  * associative, commutative, and MERGE-ORDER-INDEPENDENT in state: the
  * final entries are the k smallest distinct hashes of the whole input
  * and the final θ is the (k+1)-th smallest (the last value evicted is
  * the smallest ever evicted, regardless of merge order). Intersection
  * and difference are query-side ops on finished sketches: restrict
  * both entry sets to θc = min(θa, θb), intersect/subtract, estimate
  * |S|/θc — results carry their own θ and compose further.
  *
  * Exact mode caveat: θ = 2^64 is represented as the u64 max value
  * (inclusive-exclusive corner at probability 2^-64 per key — ignored,
  * as with any 64-bit-hash sketch).
  */
final class ThetaSketch private (
    val k: Int,
    /** exclusive retention threshold as u64; ExactTheta = exact mode */
    private var thetaU: Long,
    private val entries: java.util.TreeSet[java.lang.Long]) {

  import ThetaSketch._

  def this(k: Int) = {
    this(k, ThetaSketch.ExactTheta, ThetaSketch.emptySet())
    require(k >= 2, "theta sketch k must be >= 2")
  }

  /** Insert a pre-hashed key (uniform u64, e.g. Hashing.xxHash64). */
  def updateHash(h: Long): this.type = {
    if (ltU(h, thetaU) && entries.add(h) && entries.size > k) {
      val evicted = entries.pollLast() // unsigned max = current largest
      thetaU = evicted
    }
    this
  }

  def update(bytes: Array[Byte]): this.type = updateHash(Hashing.xxHash64(bytes, 0L))

  /** Union merge (Spark partial/final aggregation path). */
  def mergeInPlace(other: ThetaSketch): this.type = {
    require(other.k == k,
      s"unable to union/intersect theta sketches with different configurations (k=$k vs k=${other.k})")
    if (ltU(other.thetaU, thetaU)) {
      thetaU = other.thetaU
      // drop own entries no longer below the tightened threshold
      val it = entries.tailSet(java.lang.Long.valueOf(thetaU), true).iterator()
      while (it.hasNext) { it.next(); it.remove() }
    }
    val oi = other.entries.iterator()
    while (oi.hasNext) updateHash(oi.next())
    this
  }

  def retained: Int = entries.size
  def theta: Double = u64ToUnit(thetaU)
  def isEstimation: Boolean = thetaU != ExactTheta

  /** Distinct-count estimate: exact below k, |entries|/θ above. */
  def estimate: Double =
    if (!isEstimation) entries.size.toDouble else entries.size / theta

  /** RSE ≈ 1/√(k−1) in estimation mode (0 in exact mode). */
  def relativeStandardError: Double =
    if (!isEstimation) 0.0 else 1.0 / math.sqrt(k - 1.0)

  /** A ∩ B (query-side, reference intersect shape km_bloom_filter.rs:253–263):
    * both entry sets restricted to θc = min(θa, θb). */
  def intersect(other: ThetaSketch): ThetaSketch = {
    require(other.k == k,
      s"unable to union/intersect theta sketches with different configurations (k=$k vs k=${other.k})")
    val tc = minU(thetaU, other.thetaU)
    val out = emptySet()
    val it = entries.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (ltU(h, tc) && other.entries.contains(h)) out.add(h)
    }
    new ThetaSketch(k, tc, out)
  }

  /** A \ B (set difference — beyond the reference's union/intersect pair,
    * impossible for Bloom bit-state, natural here). */
  def difference(other: ThetaSketch): ThetaSketch = {
    require(other.k == k,
      s"unable to union/intersect theta sketches with different configurations (k=$k vs k=${other.k})")
    val tc = minU(thetaU, other.thetaU)
    val out = emptySet()
    val it = entries.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (ltU(h, tc) && !other.entries.contains(h)) out.add(h)
    }
    new ThetaSketch(k, tc, out)
  }

  /** Sorted (unsigned) retained hashes — codec / test surface. */
  def entriesArray: Array[Long] = {
    val out = new Array[Long](entries.size)
    val it = entries.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def thetaLong: Long = thetaU

  override def toString: String =
    f"ThetaSketch(k=$k, retained=${entries.size}, theta=$theta%.6f, est=$estimate%.1f)"

  override def equals(o: Any): Boolean = o match {
    case t: ThetaSketch => t.k == k && t.thetaU == thetaU && t.entries.equals(entries)
    case _ => false
  }
  override def hashCode: Int = (k, thetaU, entries).hashCode
}

object ThetaSketch {
  /** θ sentinel for exact mode: u64 max as an exclusive bound. */
  final val ExactTheta: Long = -1L

  final val DefaultK = 4096

  def apply(k: Int = DefaultK): ThetaSketch = new ThetaSketch(k)

  /** Rehydrate from codec state. The documented invariants (≤ k entries,
    * every entry unsigned-< thetaU) are ENFORCED, not assumed: a corrupt
    * or forged blob must fail fast here, like the codec's magic/type/
    * version checks, instead of silently skewing downstream estimates. */
  def fromState(k: Int, thetaU: Long, sorted: Array[Long]): ThetaSketch = {
    require(sorted.length <= k,
      s"corrupt theta state: ${sorted.length} entries exceed k=$k")
    val s = emptySet()
    var i = 0
    while (i < sorted.length) {
      require(thetaU == ExactTheta || ltU(sorted(i), thetaU),
        s"corrupt theta state: entry ${sorted(i)} not below theta $thetaU")
      s.add(sorted(i))
      i += 1
    }
    new ThetaSketch(k, thetaU, s)
  }

  private def emptySet(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](new java.util.Comparator[java.lang.Long] {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    })

  @inline private def ltU(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0
  @inline private def minU(a: Long, b: Long): Long = if (ltU(a, b)) a else b

  @inline private[core] def u64ToUnit(u: Long): Double =
    if (u == ExactTheta) 1.0
    else (u.toDouble + (if (u < 0) 1.8446744073709552e19 else 0.0)) / 1.8446744073709552e19
}
