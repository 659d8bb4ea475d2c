package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Cross-checks the from-scratch hash kernels against independent
  * implementations that ship in the image: Spark's own XXH64 (the engine
  * behind the `xxhash64` SQL function) and Guava's murmur3_128. These are
  * ORACLES only — production code never calls them. Randomized cases use
  * fixed seeds (the reference's fixed-seed StdRng discipline,
  * /root/reference/tests/integration.rs:200–210). */
class HashingSpec extends AnyFunSuite {

  private def sparkXx(bytes: Array[Byte], seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, seed)

  test("xxHash64 matches Spark's XXH64 on assorted lengths and seeds") {
    val inputs = Seq(
      "", "a", "ab", "abc", "abcd", "abcde", "12345678", "123456789",
      "the quick brown fox jumps over the lazy dog",
      "x" * 31, "x" * 32, "x" * 33, "y" * 63, "y" * 64, "z" * 1000,
      "conv-00042|17", "éü中文")
    val seeds = Seq(0L, 42L, -1L, Long.MaxValue, 0x9E3779B185EBCA87L)
    for (s <- inputs; seed <- seeds) {
      val b = s.getBytes(UTF_8)
      assert(Hashing.xxHash64(b, seed) === sparkXx(b, seed), s"input='$s' seed=$seed")
    }
  }

  test("xxHash64 matches Spark's XXH64 on random byte arrays (property-style)") {
    val rnd = new scala.util.Random(0xb7b7b7b7L)
    for (_ <- 1 to 2000) {
      val bytes = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(bytes)
      val seed = rnd.nextLong()
      assert(Hashing.xxHash64(bytes, seed) === sparkXx(bytes, seed))
    }
  }

  test("xxHash64Long is identical to xxHash64 over the value's 8 LE bytes") {
    val rnd = new scala.util.Random(0x3f3f3f3fL)
    for (_ <- 1 to 2000) {
      val v = rnd.nextLong()
      val seed = rnd.nextLong()
      val b = new Array[Byte](8)
      var i = 0
      while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
      assert(Hashing.xxHash64Long(v, seed) === Hashing.xxHash64(b, seed))
    }
  }

  test("murmur3_128 matches Guava on assorted inputs and random arrays") {
    val fixed = Seq(
      "", "a", "ab", "abcdefgh", "abcdefghi", "0123456789abcdef",
      "0123456789abcdef0", "the quick brown fox", "p" * 100, "q" * 1024)
      .map(_.getBytes(UTF_8))
    val rnd = new scala.util.Random(0x5ca1ab1eL)
    val random = (1 to 2000).map { _ =>
      val b = new Array[Byte](rnd.nextInt(100))
      rnd.nextBytes(b)
      b
    }
    for (b <- fixed ++ random) {
      val (h1, h2) = Hashing.murmur3_128(b, 0L)
      val g = com.google.common.hash.Hashing.murmur3_128(0).hashBytes(b).asBytes()
      val bb = java.nio.ByteBuffer.wrap(g).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      assert(h1 === bb.getLong(0), s"h1 mismatch len=${b.length}")
      assert(h2 === bb.getLong(8), s"h2 mismatch len=${b.length}")
    }
  }

  test("murmur3_64Long is identical to murmur3_64 over the value's 8 LE bytes") {
    val rnd = new scala.util.Random(0xce11L)
    for (_ <- 1 to 2000) {
      val v = rnd.nextLong()
      val seed = rnd.nextLong()
      val b = new Array[Byte](8)
      var i = 0
      while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
      assert(Hashing.murmur3_64Long(v, seed) === Hashing.murmur3_64(b, seed))
    }
  }

  test("hash pair (xxHash64, murmur3_64) is independent enough to differ") {
    val b = "conv-1|3".getBytes(UTF_8)
    assert(Hashing.xxHash64(b, 0L) !== Hashing.murmur3_64(b, 0L))
  }

  test("fnv1a64 matches the published FNV-1a test vectors (seed 0 = canonical)") {
    // vectors from the public FNV reference (isthe.com/chongo/tech/comp/fnv)
    def f(s: String): Long = Hashing.fnv1a64(s.getBytes(UTF_8), 0L)
    assert(f("") === 0xcbf29ce484222325L) // the offset basis itself
    assert(f("a") === 0xaf63dc4c8601ec8cL)
    assert(f("foobar") === 0x85944171f73967e8L)
    // seed folds into the offset basis: seed 0 must be canonical, other
    // seeds must change the output
    assert(Hashing.fnv1a64("key".getBytes(UTF_8), 1L)
      !== Hashing.fnv1a64("key".getBytes(UTF_8), 0L))
  }
}
