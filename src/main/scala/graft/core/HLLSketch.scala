package graft.core

/** HyperLogLog cardinality sketch (Flajolet et al. 2007), 64-bit-hash
  * variant: no large-range correction needed, linear counting below the
  * small-range threshold. Extension mandated by the driver's north rule —
  * the reference crate has no HLL; it generalizes the reference's
  * mergeable-binary-state pattern (union = register-wise max, commutative
  * + idempotent, exactly as Bloom union is bitwise OR,
  * `/root/reference/src/bitset.rs:66–82`).
  *
  * Published bound: relative standard error ≈ 1.04/√m with m = 2^p
  * registers.
  *
  * State: m byte registers (values ≤ 64−p+1 < 127 fit a byte; a 6-bit
  * packing would save 25% but costs read-modify-write shifts in the hot
  * update loop — at p=14 the dense array is 16 KiB, negligible vs shuffle
  * framing).
  */
final class HLLSketch(val p: Int, val registers: Array[Byte]) extends Serializable {
  require(p >= 4 && p <= 18, s"HLL precision must be in [4,18], got $p")
  require(registers.length == (1 << p), "register array size != 2^p")

  private[this] val m = 1 << p

  /** Update from a 64-bit hash of the item: register index = top p bits,
    * rank = leading zeros of the remaining (64−p)-bit suffix + 1. */
  def updateHash(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val suffix = h << p
    val rank = (if (suffix == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(suffix)) + 1
    if (rank > registers(idx)) registers(idx) = rank.toByte
  }

  def update(bytes: Array[Byte]): Unit = updateHash(Hashing.xxHash64(bytes, 0L))
  def update(s: String): Unit = update(Hashing.utf8(s))

  /** Register-wise max — commutative, associative, idempotent ⇒ any merge
    * tree yields bit-identical state (the property ScalaCheck asserts). */
  def mergeInPlace(other: HLLSketch): this.type = {
    require(other.p == p, s"cannot merge HLL sketches of different precision ($p vs ${other.p})")
    var i = 0
    while (i < m) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
    this
  }

  /** Cardinality estimate with small-range (linear counting) correction. */
  def estimate: Double = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = registers(i)
      sum += java.lang.Double.longBitsToDouble((1023L - r) << 52) // 2^-r exactly
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha =
      if (m == 16) 0.673
      else if (m == 32) 0.697
      else if (m == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m.toDouble * m.toDouble / sum
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }

  /** 1.04/√m — the bound tests gate against (±3σ). */
  def relativeStandardError: Double = 1.04 / math.sqrt(m.toDouble)

  def copySketch(): HLLSketch = new HLLSketch(p, registers.clone())

  override def equals(o: Any): Boolean = o match {
    case h: HLLSketch => h.p == p && java.util.Arrays.equals(h.registers, registers)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(registers) * 31 + p

  override def toString: String = f"HLLSketch(p=$p, estimate=$estimate%.1f)"
}

object HLLSketch {
  val DefaultP = 14 // rse ≈ 0.81%

  def apply(p: Int = DefaultP): HLLSketch = new HLLSketch(p, new Array[Byte](1 << p))
}
