package graft.core

/** Weighted bottom-k distinct sample: a DETERMINISTIC, mergeable
  * weight-proportional sample of the distinct keys in a stream — the
  * training-mix primitive ("sample 100k documents with probability
  * proportional to quality score, the same 100k on every run and every
  * cluster size").
  *
  * Algorithm A-ES (Efraimidis & Spirakis, "Weighted random sampling
  * with a reservoir", IPL 2006): give each key a RACE KEY
  * r = -ln(u)/w with u uniform in (0,1], and keep the k smallest — the
  * selection is a weighted sample without replacement (inclusion
  * probability ≈ k·wᵢ/Σw for k ≪ n). The twist that makes it a SKETCH
  * rather than a sampler: u is not drawn from an RNG, it is the key's
  * own xxHash64 mapped to (0,1] — so the race key is a pure function of
  * (key bytes, weight), which gives the same three properties the
  * unweighted [[BottomKSketch]] gets from raw hash order:
  *
  *  - deterministic across reruns, partitionings, and cluster sizes
  *    (no seed plumbing, StrictMath.log for bit-identical transforms
  *    on every JVM);
  *  - mergeable with order-independence: the union of two bottom-k
  *    sets is a superset of the global bottom-k, so keeping the k
  *    smallest of a merge equals the bulk build bit for bit;
  *  - map-side combinable: each partition ships at most k entries,
  *    so a grouped weighted sample never shuffles the corpus — the
  *    property that makes "weighted training mix over 100 TB" one
  *    partial-aggregate pass.
  *
  * CONTRACT: the weight must be a pure function of the key (the same
  * key arriving with two different weights would race twice — the
  * merge dedupes entries by (race bits, key hash), which coincide
  * exactly when the weight does). Weights must be finite and > 0.
  *
  * The reference has no sampling (its only collection op is the insert
  * loop, lib.rs:202); like [[BottomKSketch]] this extends its
  * mergeable-binary-state pattern (km_bloom_filter.rs:184–194) to
  * selection, adding the published A-ES race-key transform.
  */
final class WeightedBottomKSketch private (
    val k: Int,
    private val entries: java.util.TreeMap[WeightedBottomKSketch.RaceKey, Array[Byte]]) {

  import WeightedBottomKSketch._

  def this(k: Int) = {
    this(k, WeightedBottomKSketch.emptyMap())
    require(k >= 1, "weighted bottom-k sample size must be >= 1")
  }

  /** Insert a key by its canonical bytes with its weight. */
  def update(keyBytes: Array[Byte], weight: Double): this.type = {
    require(java.lang.Double.isFinite(weight) && weight > 0.0,
      s"weighted sample weights must be finite and > 0, got $weight")
    val h = Hashing.xxHash64(keyBytes, 0L)
    insert(new RaceKey(raceOf(h, weight), h), keyBytes)
  }

  /** Codec/merge entry point: race and hash already computed — the pair
    * MUST be a pure function of (bytes, weight). Bytes are copied on
    * retention so caller-side buffer reuse cannot corrupt state. */
  private[core] def insert(rk: RaceKey, keyBytes: Array[Byte]): this.type = {
    if (entries.size < k) {
      if (!entries.containsKey(rk)) entries.put(rk, keyBytes.clone())
    } else if (rk.compareTo(entries.lastKey()) < 0 && !entries.containsKey(rk)) {
      entries.put(rk, keyBytes.clone())
      entries.pollLastEntry()
    }
    this
  }

  def mergeInPlace(other: WeightedBottomKSketch): this.type = {
    require(other.k == k,
      s"unable to merge weighted bottom-k samples with different configurations (k=$k vs k=${other.k})")
    val it = other.entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(e.getKey, e.getValue)
    }
    this
  }

  def size: Int = entries.size

  /** The sampled keys, in race order (i.e. weighted-selection order —
    * the first element is the strongest pick). Defensive copies. */
  def sample: Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](entries.size)
    val it = entries.values().iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().clone(); i += 1 }
    out
  }

  /** (race, keyHash, keyBytes) in race order — codec surface. */
  private[core] def entriesSeq: Seq[(Double, Long, Array[Byte])] = {
    val b = Seq.newBuilder[(Double, Long, Array[Byte])]
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b += ((e.getKey.race, e.getKey.hash, e.getValue))
    }
    b.result()
  }

  override def toString: String = s"WeightedBottomKSketch(k=$k, size=${entries.size})"

  override def equals(o: Any): Boolean = o match {
    case b: WeightedBottomKSketch =>
      b.k == k && b.entries.size == entries.size &&
        entriesSeq.zip(b.entriesSeq).forall { case ((r1, h1, k1), (r2, h2, k2)) =>
          r1 == r2 && h1 == h2 && java.util.Arrays.equals(k1, k2)
        }
    case _ => false
  }
  override def hashCode: Int = (k, entriesSeq.map(_._2)).hashCode
}

object WeightedBottomKSketch {
  final val DefaultK = 1024

  def apply(k: Int = DefaultK): WeightedBottomKSketch = new WeightedBottomKSketch(k)

  /** A-ES race key of a (key hash, weight) pair. u = ((h >>> 11) + 1) ·
    * 2⁻⁵³ ∈ (0, 1] uses the hash's top 53 bits, so u is never 0 (no
    * infinite race) and r = -ln(u)/w ∈ [0, ∞). StrictMath, not Math:
    * the race must be BIT-IDENTICAL on every JVM/architecture in the
    * cluster or merge determinism dies. */
  def raceOf(keyHash: Long, weight: Double): Double = {
    val u = ((keyHash >>> 11) + 1).toDouble * 1.1102230246251565e-16 // 2^-53
    -StrictMath.log(u) / weight
  }

  /** Race order: ascending race, ties (different keys, coincidentally
    * equal races) broken by unsigned key hash so the order — and with it
    * the canonical encoding — never depends on insertion order. */
  private[core] final class RaceKey(val race: Double, val hash: Long)
      extends Comparable[RaceKey] {
    override def compareTo(o: RaceKey): Int = {
      val c = java.lang.Double.compare(race, o.race)
      if (c != 0) c else java.lang.Long.compareUnsigned(hash, o.hash)
    }
    override def equals(o: Any): Boolean = o match {
      case r: RaceKey => r.race == race && r.hash == hash
      case _ => false
    }
    override def hashCode: Int = java.lang.Long.hashCode(hash)
  }

  private[core] def fromEntries(k: Int,
      es: Seq[(Double, Long, Array[Byte])]): WeightedBottomKSketch = {
    // same floor the public constructor enforces: a k=0 blob would pass
    // the size check below and then crash update() on an empty TreeMap
    require(k >= 1, s"corrupt weighted bottom-k state: k=$k")
    require(es.size <= k, s"corrupt weighted bottom-k state: ${es.size} entries exceed k=$k")
    val m = emptyMap()
    es.foreach { case (r, h, kb) =>
      require(java.lang.Double.isFinite(r) && r >= 0.0,
        s"corrupt weighted bottom-k state: race $r")
      m.put(new RaceKey(r, h), kb)
    }
    new WeightedBottomKSketch(k, m)
  }

  private def emptyMap(): java.util.TreeMap[RaceKey, Array[Byte]] =
    new java.util.TreeMap[RaceKey, Array[Byte]]()
}
