package graft.core

import java.util.Arrays
import scala.collection.mutable.ArrayBuffer

/** KLL quantile sketch over doubles (Karnin, Lang, Liberty, FOCS 2016;
  * see also KLL± VLDB 2021, `/root/repo/PAPERS.md:5`). North-rule
  * extension — uniform ε rank error, unlike t-digest's tail-weighted
  * error.
  *
  * Structure: a stack of level buffers; an item at level i carries weight
  * 2^i. Level capacities decay geometrically (factor c = 2/3) from k at
  * the top. When full, the lowest over-capacity level is sorted and
  * compacted: every other item (offset chosen by a DETERMINISTIC
  * pseudo-coin derived from the compaction counter via xxHash64 — the
  * reference's fixed-seed StdRng discipline,
  * `/root/reference/tests/integration.rs:200–210`, carried over so
  * `sbt -batch test` is reproducible) is promoted to level i+1.
  *
  * Merge: concatenate level-wise, then compact until within capacity.
  * Rank error ε ≈ 2.296/k^0.9 at 2/3 confidence (paper constant); tests
  * gate at 3× against exact ranks.
  */
final class KLLSketch(val k: Int) extends Serializable {
  require(k >= 8, s"KLL k must be >= 8, got $k")

  private val C = 2.0 / 3.0
  private val MinLevelCap = 8

  private var levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
  private var n: Long = 0L
  private var compactions: Long = 0L
  var minValue: Double = Double.PositiveInfinity
  var maxValue: Double = Double.NegativeInfinity

  def count: Long = n

  private def levelCap(level: Int, numLevels: Int): Int = {
    val depth = numLevels - 1 - level
    math.max(MinLevelCap, math.ceil(k * math.pow(C, depth)).toInt)
  }

  private def totalCap: Int = {
    var s = 0
    var i = 0
    while (i < levels.length) { s += levelCap(i, levels.length); i += 1 }
    s
  }

  private def totalItems: Int = {
    var s = 0
    var i = 0
    while (i < levels.length) { s += levels(i).length; i += 1 }
    s
  }

  def update(x: Double): Unit = {
    if (x.isNaN) return
    levels(0) += x
    n += 1
    if (x < minValue) minValue = x
    if (x > maxValue) maxValue = x
    if (totalItems > totalCap) compactOnce()
  }

  /** Sort + halve the lowest over-capacity level, promoting survivors. */
  private def compactOnce(): Unit = {
    var lvl = 0
    while (lvl < levels.length && levels(lvl).length <= levelCap(lvl, levels.length)) lvl += 1
    if (lvl == levels.length) lvl = 0 // fallback: compact level 0
    val buf = levels(lvl)
    if (buf.length < 2) return
    val arr = buf.toArray
    Arrays.sort(arr)
    // If the length is odd, set ONE item aside (it stays at this level,
    // weight unchanged) and halve the even remainder — promoting floor(L/2)
    // items at double weight conserves total weight exactly.
    val odd = arr.length % 2 == 1
    // deterministic pseudo-coin: promote odd- or even-ranked survivors
    val offset = (if (odd) 1 else 0) +
      (Hashing.xxHash64Long(compactions, 0x9E3779B9L) & 1L).toInt
    compactions += 1
    if (lvl + 1 == levels.length) levels += ArrayBuffer.empty[Double]
    val promote = levels(lvl + 1)
    var i = offset
    while (i < arr.length) { promote += arr(i); i += 2 }
    buf.clear()
    if (odd) buf += arr(0)
  }

  /** Level-wise concatenation + compaction — associative within the
    * published rank-error bound (asserted property-style in tests). */
  def mergeInPlace(other: KLLSketch): this.type = {
    require(other.k == k, s"cannot merge KLL sketches with different k ($k vs ${other.k})")
    while (levels.length < other.levels.length) levels += ArrayBuffer.empty[Double]
    var i = 0
    while (i < other.levels.length) {
      levels(i) ++= other.levels(i)
      i += 1
    }
    n += other.n
    if (other.minValue < minValue) minValue = other.minValue
    if (other.maxValue > maxValue) maxValue = other.maxValue
    var guard = 0
    while (totalItems > totalCap && guard < 64) { compactOnce(); guard += 1 }
    this
  }

  /** All (item, weight) pairs, weight = 2^level. */
  private def weighted: Array[(Double, Long)] = {
    val out = new ArrayBuffer[(Double, Long)](totalItems)
    var lvl = 0
    while (lvl < levels.length) {
      val w = 1L << lvl
      levels(lvl).foreach(v => out += ((v, w)))
      lvl += 1
    }
    out.toArray
  }

  /** Quantile: sort weighted items, walk cumulative weight to q·n. */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    if (n == 0) return Double.NaN
    if (q == 0.0) return minValue
    if (q == 1.0) return maxValue
    val items = weighted.sortBy(_._1)
    val target = q * n
    var cum = 0.0
    var i = 0
    while (i < items.length) {
      cum += items(i)._2
      if (cum >= target) return items(i)._1
      i += 1
    }
    maxValue
  }

  /** Estimated rank (fraction of items ≤ x). */
  def rank(x: Double): Double = {
    if (n == 0) return Double.NaN
    var cum = 0L
    val items = weighted
    var i = 0
    while (i < items.length) {
      if (items(i)._1 <= x) cum += items(i)._2
      i += 1
    }
    cum.toDouble / n
  }

  /** Published normalized rank error at 2/3 confidence. */
  def normalizedRankError: Double = 2.296 / math.pow(k.toDouble, 0.9)

  def levelsSnapshot: Array[Array[Double]] = levels.map(_.toArray).toArray

  def copySketch(): KLLSketch = {
    val c = new KLLSketch(k)
    c.levels = levels.map(_.clone())
    c.n = n; c.compactions = compactions
    c.minValue = minValue; c.maxValue = maxValue
    c
  }

  override def toString: String =
    s"KLLSketch(k=$k, n=$n, levels=${levels.length}, retained=$totalItems)"
}

object KLLSketch {
  val DefaultK = 200

  def apply(k: Int = DefaultK): KLLSketch = new KLLSketch(k)

  def fromLevels(k: Int, count: Long, minV: Double, maxV: Double,
      levelArrays: Array[Array[Double]]): KLLSketch = {
    val s = new KLLSketch(k)
    s.levels = ArrayBuffer.from(levelArrays.map(a => ArrayBuffer.from(a)))
    if (s.levels.isEmpty) s.levels += ArrayBuffer.empty[Double]
    s.n = count
    s.minValue = minV
    s.maxValue = maxV
    s
  }
}
