package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference bitset unit suite
  * (/root/reference/src/bitset.rs:110–384) onto the Long-word BitArray. */
class BitArraySpec extends AnyFunSuite {

  test("sizing rounds up to whole words; logical length preserved") {
    // reference: byte rounding, bitset.rs:115–130; ours: word rounding
    for (n <- Seq(1L, 7L, 8L, 9L, 63L, 64L, 65L, 1000L)) {
      val b = BitArray(n)
      assert(b.numBits === n)
      assert(b.words.length === ((n + 63) / 64).toInt)
      assert(b.countOnes === 0L)
      assert(b.countZeros === n)
    }
  }

  test("zero or negative length is rejected") {
    intercept[IllegalArgumentException](BitArray(0L))
    intercept[IllegalArgumentException](BitArray(-5L))
  }

  test("set/get single-bit isolation (bitset.rs:133–149)") {
    val b = BitArray(130)
    b.set(77)
    for (i <- 0L until 130L)
      assert(b.get(i) === (i == 77L), s"bit $i")
  }

  test("out-of-bounds set/get throws (bitset.rs:152–161)") {
    val b = BitArray(64)
    intercept[IndexOutOfBoundsException](b.set(64))
    intercept[IndexOutOfBoundsException](b.get(64))
    intercept[IndexOutOfBoundsException](b.set(-1))
    intercept[IndexOutOfBoundsException](b.get(-1))
  }

  test("set then clear (bitset.rs:164–188)") {
    val b = BitArray(100)
    b.set(42, value = true)
    assert(b.get(42))
    b.set(42, value = false)
    assert(!b.get(42))
    assert(b.countOnes === 0L)
  }

  test("popcount stepwise over every bit (bitset.rs:191–295)") {
    val n = 150L
    val b = BitArray(n)
    for (i <- 0L until n) {
      assert(b.countOnes === i)
      assert(b.countZeros === n - i)
      b.set(i)
    }
    assert(b.countOnes === n)
    assert(b.countZeros === 0L)
  }

  test("union truth table (bitset.rs:298–339)") {
    val a = BitArray(8)
    val b = BitArray(8)
    // a = 1100, b = 1010 → union 1110
    a.set(0); a.set(1)
    b.set(0); b.set(2)
    val u = a.union(b)
    assert(u.get(0) && u.get(1) && u.get(2) && !u.get(3))
    // inputs untouched
    assert(!a.get(2) && !b.get(1))
  }

  test("intersect truth table (bitset.rs:342–383)") {
    val a = BitArray(8)
    val b = BitArray(8)
    a.set(0); a.set(1)
    b.set(0); b.set(2)
    val x = a.intersect(b)
    assert(x.get(0) && !x.get(1) && !x.get(2) && !x.get(3))
  }

  test("union/intersect require equal lengths") {
    intercept[IllegalArgumentException](BitArray(8).union(BitArray(16)))
    intercept[IllegalArgumentException](BitArray(8).intersect(BitArray(16)))
  }

  test("padded tail bits can never be set, so word popcount is exact") {
    val b = BitArray(65) // two words, 63 pad bits
    b.set(64)
    assert(b.countOnes === 1L)
    intercept[IndexOutOfBoundsException](b.set(65))
  }
}
