package graft.core

import scala.collection.mutable

/** Misra–Gries frequent-items summary (Misra & Gries 1982), the
  * DETERMINISTIC heavy-hitter sketch: at most `k` (key, counter)
  * entries, with the guarantees
  *
  *   - undercount only:  est(x) ≤ f(x)                     (one-sided)
  *   - bounded error:    f(x) − est(x) ≤ decrementTotal ≤ N/(k+1)
  *   - total recall:     every x with f(x) > N/(k+1) is PRESENT
  *
  * where N is the processed weight. Complements CMS (q08/q28): CMS
  * overcounts and answers point queries for ANY key but cannot
  * enumerate the heavy hitters without a candidate set; Misra–Gries
  * carries the keys themselves, so `SELECT heavy hitters FROM corpus`
  * needs no second pass. No randomness anywhere — every bound is a
  * theorem, not a probability.
  *
  * MERGEABLE (Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable
  * Summaries", PODS 2012, §3.1): merge = add counters pointwise, then
  * subtract the (k+1)-largest counter from all and drop the
  * non-positive — the combined summary keeps the N_total/(k+1) bound,
  * which is exactly what Spark's partial/final aggregation needs. The
  * SET of surviving keys may depend on the merge tree (like t-digest's
  * centroids); the bounds hold under every tree, so Spark gates are
  * bound-level, not bit-level. `decrementTotal` is carried in the
  * state so the REALIZED error bound (usually far below N/(k+1)) is
  * queryable per sketch.
  *
  * Same mergeable-binary-state pattern as the reference's Bloom union
  * (/root/reference/src/bitset.rs:66–82), with counted keys instead of
  * bits. Keys are arbitrary byte strings (callers pass UTF-8).
  */
final class MGSketch private (
    val k: Int,
    private val counts: mutable.LinkedHashMap[MGSketch.Key, Long],
    private var decremented: Long,
    private var n: Long) extends Serializable {
  require(k >= 1, s"Misra-Gries k must be >= 1, got $k")

  import MGSketch.Key

  def processedCount: Long = n

  /** Total decremented per surviving key — the sketch's REALIZED error
    * bound: f(x) − est(x) ≤ decrementTotal for every x (≤ N/(k+1)). */
  def decrementTotal: Long = decremented

  def update(keyBytes: Array[Byte], weight: Long = 1L): Unit = {
    require(weight > 0, s"Misra-Gries weights must be positive, got $weight")
    n += weight
    val key = new Key(keyBytes)
    counts.get(key) match {
      case Some(c) => counts.update(key, c + weight)
      case None =>
        // weighted form of the classic decrement-all (equivalent to the
        // unit-weight algorithm run `weight` times): while the map is
        // full, subtract d = min(remaining weight, smallest counter)
        // from every counter (evicting zeros); once space exists the
        // remaining weight inserts
        var w = weight
        while (w > 0) {
          if (counts.size < k) {
            counts.update(key, counts.getOrElse(key, 0L) + w)
            w = 0
          } else {
            val minC = counts.valuesIterator.min
            val d = math.min(w, minC)
            decremented += d
            counts.mapValuesInPlace((_, c) => c - d)
            counts.filterInPlace((_, c) => c > 0)
            w -= d
          }
        }
    }
  }

  def update(s: String): Unit = update(Hashing.utf8(s))

  /** Estimated count (≤ true count); 0 for absent keys. */
  def estimate(keyBytes: Array[Byte]): Long = counts.getOrElse(new Key(keyBytes), 0L)
  def estimate(s: String): Long = estimate(Hashing.utf8(s))

  /** Surviving (key, estimate) entries, sorted (count desc, key asc). */
  def entries: Seq[(Array[Byte], Long)] =
    counts.toSeq.sortBy { case (key, c) => (-c, key) }.map { case (key, c) => (key.bytes, c) }

  /** Entries in unsigned-lexicographic KEY order (the codec layout —
    * one sort, not entries' count order re-sorted). */
  def entriesByKey: Seq[(Array[Byte], Long)] =
    counts.toSeq.sortBy(_._1).map { case (key, c) => (key.bytes, c) }

  /** Mergeable-summaries merge (PODS 2012 §3.1): pointwise add, then
    * subtract the (k+1)-largest counter and drop non-positive. */
  def mergeInPlace(other: MGSketch): this.type = {
    require(other.k == k, s"cannot merge Misra-Gries of different k ($k vs ${other.k})")
    other.counts.foreach { case (key, c) =>
      counts.update(key, counts.getOrElse(key, 0L) + c)
    }
    n += other.n
    decremented += other.decremented
    if (counts.size > k) {
      val sorted = counts.valuesIterator.toArray.sortBy(-_)
      val sub = sorted(k) // the (k+1)-th largest
      decremented += sub
      counts.mapValuesInPlace((_, c) => c - sub)
      counts.filterInPlace((_, c) => c > 0)
    }
    this
  }

  def copySketch(): MGSketch = new MGSketch(k, counts.clone(), decremented, n)

  override def equals(o: Any): Boolean = o match {
    case m: MGSketch => m.k == k && m.n == n && m.decremented == decremented &&
      m.counts.size == counts.size &&
      counts.forall { case (key, c) => m.counts.get(key).contains(c) }
    case _ => false
  }
  override def hashCode: Int = (k, n, counts.size).hashCode()

  override def toString: String =
    s"MGSketch(k=$k, entries=${counts.size}, n=$n, errBound<=$decremented)"
}

object MGSketch {
  val DefaultK = 64

  def apply(k: Int = DefaultK): MGSketch =
    new MGSketch(k, mutable.LinkedHashMap.empty, 0L, 0L)

  def fromEntries(k: Int, entries: Seq[(Array[Byte], Long)],
      decremented: Long, n: Long): MGSketch = {
    require(entries.size <= k, s"${entries.size} entries exceed k=$k")
    require(entries.forall(_._2 > 0), "Misra-Gries counters must be positive")
    val m = mutable.LinkedHashMap.empty[Key, Long]
    entries.foreach { case (b, c) =>
      require(m.put(new Key(b), c).isEmpty, "duplicate key in Misra-Gries entries")
    }
    new MGSketch(k, m, decremented, n)
  }

  /** Byte-string key with value equality + unsigned-lexicographic order
    * (for the deterministic entries ordering and codec layout). */
  final class Key(val bytes: Array[Byte]) extends Serializable {
    override def equals(o: Any): Boolean = o match {
      case k: Key => java.util.Arrays.equals(k.bytes, bytes)
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(bytes)
  }

  implicit val keyOrdering: Ordering[Key] = (a: Key, b: Key) =>
    java.util.Arrays.compareUnsigned(a.bytes, b.bytes)
}
