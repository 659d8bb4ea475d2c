package graft.core

/** Word-packed bit array — the kernel under every Bloom variant.
  *
  * Semantics reproduce `/root/reference/src/bitset.rs` (new/len 9–24,
  * set/get 26–55, count_ones/zeros 57–64, union 66–82, intersect 84–100)
  * but upgraded from byte packing to `Array[Long]` words: 8× fewer ops for
  * union / intersect / popcount, and the serialized form stays 8-byte
  * aligned for the codec. Bit layout is LSB-first within each word (the
  * reference is LSB-first within each byte, bitset.rs:34–35); layout parity
  * is not required — the contract is semantic, not bit-image.
  */
final class BitArray private (val words: Array[Long], val numBits: Long) extends Serializable {

  @inline private def check(index: Long): Unit =
    if (index < 0 || index >= numBits)
      throw new IndexOutOfBoundsException(
        s"bit index $index out of range for BitArray of length $numBits")

  /** Set bit `index` to `value` (reference bitset.rs:26–42; supports
    * clearing even though Bloom filters only ever set). */
  def set(index: Long, value: Boolean = true): Unit = {
    check(index)
    val w = (index >>> 6).toInt
    val mask = 1L << (index & 63)
    if (value) words(w) |= mask else words(w) &= ~mask
  }

  /** Get bit `index` (reference bitset.rs:44–55). */
  def get(index: Long): Boolean = {
    check(index)
    (words((index >>> 6).toInt) & (1L << (index & 63))) != 0L
  }

  /** Popcount (reference bitset.rs:57–59). Padded tail bits are never set
    * (set() bounds-checks), so summing whole words is exact. */
  def countOnes: Long = {
    var s = 0L
    var i = 0
    while (i < words.length) { s += java.lang.Long.bitCount(words(i)); i += 1 }
    s
  }

  /** Zeros = logical length − ones (reference bitset.rs:61–64). */
  def countZeros: Long = numBits - countOnes

  /** In-place word-wise OR — reference `Bitset::union` (bitset.rs:66–82)
    * made mutating for zero-copy partial-aggregation merges. */
  def orInPlace(other: BitArray): this.type = {
    require(other.numBits == numBits,
      s"BitArray length mismatch: $numBits vs ${other.numBits}")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  /** In-place word-wise AND — reference `Bitset::intersect` (bitset.rs:84–100). */
  def andInPlace(other: BitArray): this.type = {
    require(other.numBits == numBits,
      s"BitArray length mismatch: $numBits vs ${other.numBits}")
    var i = 0
    while (i < words.length) { words(i) &= other.words(i); i += 1 }
    this
  }

  def union(other: BitArray): BitArray = copy().orInPlace(other)
  def intersect(other: BitArray): BitArray = copy().andInPlace(other)

  def copy(): BitArray = new BitArray(words.clone(), numBits)

  override def equals(o: Any): Boolean = o match {
    case b: BitArray => b.numBits == numBits && java.util.Arrays.equals(b.words, words)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(words) * 31 + numBits.hashCode

  override def toString: String =
    s"BitArray(bits=$numBits, ones=$countOnes)"
}

object BitArray {
  /** Zero-filled array of `numBits` logical bits, rounded up to whole
    * 64-bit words (reference rounds to whole bytes, bitset.rs:10–14). */
  def apply(numBits: Long): BitArray = {
    require(numBits > 0, s"numBits must be positive, got $numBits")
    val nWords = ((numBits + 63) >>> 6).toInt
    require(nWords.toLong * 64 >= numBits, s"numBits $numBits too large")
    new BitArray(new Array[Long](nWords), numBits)
  }

  def fromWords(words: Array[Long], numBits: Long): BitArray = {
    require(((numBits + 63) >>> 6).toInt == words.length,
      s"word count ${words.length} does not match numBits $numBits")
    new BitArray(words, numBits)
  }
}
