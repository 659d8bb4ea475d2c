package graft.core

/** Bottom-k distinct sample: a DETERMINISTIC, mergeable uniform sample
  * of the distinct keys in a stream — the eval/holdout-split primitive a
  * training-data pipeline needs ("sample 10k conversations, the same 10k
  * on every run and every cluster size").
  *
  * Same k-minimum-values skeleton as [[ThetaSketch]] (keep the k
  * smallest distinct xxHash64 values), but each retained hash carries
  * its ORIGINAL key bytes, so the finished sketch yields the sampled
  * keys themselves, not just a cardinality. Because the hash is a
  * uniform permutation of the key space, the bottom-k hashes are a
  * uniform random sample of the distinct keys — with no RNG, no seed
  * plumbing, and exact reproducibility across partitionings, cluster
  * sizes, and reruns (merge keeps the k globally-smallest: union of
  * bottom-k sets ⊇ global bottom-k, so merge order cannot change the
  * result — same argument as ThetaSketch state-identity).
  *
  * The reference has no sampling (its only collection op is the insert
  * loop, lib.rs:202); this extends the same mergeable-binary-state
  * pattern (km_bloom_filter.rs:184–194) to sample selection.
  */
final class BottomKSketch private (
    val k: Int,
    private val entries: java.util.TreeMap[java.lang.Long, Array[Byte]]) {

  import BottomKSketch._

  def this(k: Int) = {
    this(k, BottomKSketch.emptyMap())
    require(k >= 1, "bottom-k sample size must be >= 1")
  }

  /** Insert a key by its canonical bytes; hash = xxHash64(bytes, 0). */
  def update(keyBytes: Array[Byte]): this.type =
    updateHashed(Hashing.xxHash64(keyBytes, 0L), keyBytes)

  /** Insert with a precomputed hash (the hash MUST be a pure function of
    * the bytes — the merge dedupes by hash). The key bytes are copied on
    * retention so later caller-side buffer reuse cannot corrupt the
    * sketch's determinism/bit-identity contract. */
  def updateHashed(h: Long, keyBytes: Array[Byte]): this.type = {
    if (entries.size < k) {
      if (!entries.containsKey(h)) entries.put(h, keyBytes.clone())
    } else if (java.lang.Long.compareUnsigned(h, entries.lastKey()) < 0 &&
        !entries.containsKey(h)) {
      entries.put(h, keyBytes.clone())
      entries.pollLastEntry()
    }
    this
  }

  def mergeInPlace(other: BottomKSketch): this.type = {
    require(other.k == k,
      s"unable to merge bottom-k samples with different configurations (k=$k vs k=${other.k})")
    val it = other.entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      updateHashed(e.getKey, e.getValue)
    }
    this
  }

  def size: Int = entries.size

  /** The sampled keys, in hash (i.e. uniformly shuffled) order.
    * Defensive copies — mutating the result cannot reach sketch state. */
  def sample: Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](entries.size)
    val it = entries.values().iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().clone(); i += 1 }
    out
  }

  /** (hash, key) pairs in unsigned-hash order — codec surface. */
  private[core] def entriesSeq: Seq[(Long, Array[Byte])] = {
    val b = Seq.newBuilder[(Long, Array[Byte])]
    val it = entries.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); b += ((e.getKey.longValue, e.getValue)) }
    b.result()
  }

  override def toString: String = s"BottomKSketch(k=$k, size=${entries.size})"

  override def equals(o: Any): Boolean = o match {
    case b: BottomKSketch =>
      b.k == k && b.entries.size == entries.size &&
        entriesSeq.zip(b.entriesSeq).forall { case ((h1, k1), (h2, k2)) =>
          h1 == h2 && java.util.Arrays.equals(k1, k2)
        }
    case _ => false
  }
  override def hashCode: Int = (k, entriesSeq.map(_._1)).hashCode
}

object BottomKSketch {
  final val DefaultK = 1024

  def apply(k: Int = DefaultK): BottomKSketch = new BottomKSketch(k)

  private[core] def fromEntries(k: Int, es: Seq[(Long, Array[Byte])]): BottomKSketch = {
    // enforce the codec invariant (≤ k retained entries) — a corrupt blob
    // fails fast instead of silently oversampling
    require(es.size <= k, s"corrupt bottom-k state: ${es.size} entries exceed k=$k")
    val m = emptyMap()
    es.foreach { case (h, kb) => m.put(h, kb) }
    new BottomKSketch(k, m)
  }

  private def emptyMap(): java.util.TreeMap[java.lang.Long, Array[Byte]] =
    new java.util.TreeMap[java.lang.Long, Array[Byte]](
      new java.util.Comparator[java.lang.Long] {
        override def compare(a: java.lang.Long, b: java.lang.Long): Int =
          java.lang.Long.compareUnsigned(a, b)
      })
}
