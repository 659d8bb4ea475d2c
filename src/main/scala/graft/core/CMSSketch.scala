package graft.core

/** Count–min sketch (Cormode & Muthukrishnan 2005) for heavy-hitter
  * frequencies. Extension mandated by the driver's north rule (no CMS in
  * the reference crate); same mergeable-state pattern as reference Bloom
  * union (`/root/reference/src/bitset.rs:66–82`) — here merge is cell-wise
  * addition (commutative + associative, NOT idempotent: counts add).
  *
  * Sizing from the published bound: for error ≤ ε·N with probability
  * ≥ 1−δ, depth d = ceil(ln 1/δ), width w = ceil(e/ε).
  * estimate(x) = min_i counters[i][h_i(x) mod w]; always ≥ true count.
  *
  * Counters are one flat Array[Long] (row-major d×w) — single allocation,
  * cache-friendly merge loop.
  */
final class CMSSketch(
    val depth: Int,
    val width: Int,
    val counters: Array[Long],
    private[core] var total: Long) extends Serializable {
  require(depth > 0 && width > 0, s"CMS depth/width must be positive ($depth x $width)")
  require(counters.length == depth * width, "CMS counter array size != depth*width")

  def totalCount: Long = total

  /** Row i uses an independent hash: xxHash64 re-seeded with i over the
    * item's base hash (hash-of-hash avoids rehashing the full bytes d times). */
  def updateHash(itemHash: Long, count: Long = 1L): Unit = {
    var i = 0
    while (i < depth) {
      val h = Hashing.xxHash64Long(itemHash, i.toLong)
      val j = java.lang.Long.remainderUnsigned(h, width.toLong).toInt
      counters(i * width + j) += count
      i += 1
    }
    total += count
  }

  def update(bytes: Array[Byte], count: Long = 1L): Unit =
    updateHash(Hashing.xxHash64(bytes, 0L), count)
  def update(s: String): Unit = update(Hashing.utf8(s))

  def estimateHash(itemHash: Long): Long = {
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val h = Hashing.xxHash64Long(itemHash, i.toLong)
      val j = java.lang.Long.remainderUnsigned(h, width.toLong).toInt
      val c = counters(i * width + j)
      if (c < min) min = c
      i += 1
    }
    min
  }

  def estimate(bytes: Array[Byte]): Long = estimateHash(Hashing.xxHash64(bytes, 0L))
  def estimate(s: String): Long = estimate(Hashing.utf8(s))

  /** Cell-wise addition — any merge tree yields identical state. */
  def mergeInPlace(other: CMSSketch): this.type = {
    require(other.depth == depth && other.width == width,
      s"cannot merge CMS of different shape ($depth x $width vs ${other.depth} x ${other.width})")
    var i = 0
    while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
    total += other.total
    this
  }

  def copySketch(): CMSSketch = new CMSSketch(depth, width, counters.clone(), total)

  override def equals(o: Any): Boolean = o match {
    case c: CMSSketch =>
      c.depth == depth && c.width == width && c.total == total &&
        java.util.Arrays.equals(c.counters, counters)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(counters) * 31 + depth

  override def toString: String = s"CMSSketch(d=$depth, w=$width, N=$total)"
}

object CMSSketch {
  /** Sizing from (ε, δ): d = ceil(ln 1/δ), w = ceil(e/ε). */
  def apply(eps: Double, delta: Double): CMSSketch = {
    require(eps > 0 && eps < 1, s"eps must be in (0,1), got $eps")
    require(delta > 0 && delta < 1, s"delta must be in (0,1), got $delta")
    val d = math.ceil(math.log(1.0 / delta)).toInt
    val w = math.ceil(math.E / eps).toInt
    new CMSSketch(d, w, new Array[Long](d * w), 0L)
  }
}
