package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Theta (KMV) kernel: exactness below k, the 1/√(k−1) error bound in
  * estimation mode, merge-order STATE identity, set-op estimates, config
  * guard, codec round-trip. All inputs seeded/deterministic. */
class ThetaSketchSpec extends AnyFunSuite {

  private def hashOf(i: Long): Long = Hashing.xxHash64Long(i, 0L)

  private def build(k: Int, ids: Range): ThetaSketch = {
    val s = ThetaSketch(k)
    ids.foreach(i => s.updateHash(hashOf(i.toLong)))
    s
  }

  test("exact mode below k: estimate is the exact distinct count, re-insert is a no-op") {
    val s = ThetaSketch(64)
    (0 until 50).foreach(i => s.updateHash(hashOf(i.toLong)))
    (0 until 50).foreach(i => s.updateHash(hashOf(i.toLong))) // dups
    assert(!s.isEstimation)
    assert(s.estimate === 50.0)
    assert(s.relativeStandardError === 0.0)
  }

  test("estimation mode: error within 4/sqrt(k-1) of truth across scales") {
    val k = 1024
    for (n <- Seq(10000, 100000, 1000000)) {
      val s = build(k, 0 until n)
      assert(s.isEstimation && s.retained <= k)
      val rse = 1.0 / math.sqrt(k - 1.0)
      assert(math.abs(s.estimate - n) <= 4 * rse * n,
        s"n=$n est=${s.estimate} (bound ${4 * rse * n})")
    }
  }

  test("merge: state-identical to bulk build under any merge order") {
    val k = 256
    val n = 20000
    val bulk = build(k, 0 until n)
    val r = new scala.util.Random(31)
    for (_ <- 1 to 5) {
      // random partition of [0, n) into 8 slices, merged in random order
      val ids = r.shuffle((0 until n).toList)
      val parts = ids.grouped(n / 8 + 1).map { chunk =>
        val p = ThetaSketch(k)
        chunk.foreach(i => p.updateHash(hashOf(i.toLong)))
        p
      }.toList
      val merged = r.shuffle(parts).reduce((a, b) => a.mergeInPlace(b))
      assert(merged === bulk, "merge tree produced different state than bulk insertion")
      assert(merged.thetaLong === bulk.thetaLong)
    }
  }

  test("config mismatch throws (reference km_bloom_filter.rs:185-187 semantics)") {
    val a = ThetaSketch(128)
    val b = ThetaSketch(256)
    val e = intercept[IllegalArgumentException](a.mergeInPlace(b))
    assert(e.getMessage.contains("different configurations"))
    intercept[IllegalArgumentException](a.intersect(b))
    intercept[IllegalArgumentException](a.difference(b))
  }

  test("intersection and difference estimates within bound on overlapping sets") {
    val k = 4096
    // A = [0, 60k), B = [40k, 100k): |A∩B| = 20k, |A\B| = 40k, |B\A| = 40k
    val a = build(k, 0 until 60000)
    val b = build(k, 40000 until 100000)
    val inter = a.intersect(b)
    val diffAB = a.difference(b)
    val diffBA = b.difference(a)
    // set-op error scales with the UNION size at theta-c, not the result
    // size: |S| is a binomial sample of the result at rate θc ≈ k/|A∪B|
    val slack = 5 * math.sqrt(100000.0 / k) * math.sqrt(100000.0)
    assert(math.abs(inter.estimate - 20000) <= slack, s"∩ est ${inter.estimate}")
    assert(math.abs(diffAB.estimate - 40000) <= slack, s"A∖B est ${diffAB.estimate}")
    assert(math.abs(diffBA.estimate - 40000) <= slack, s"B∖A est ${diffBA.estimate}")
    // inclusion–exclusion closes: |A∩B| + |A\B| = |A|
    assert(math.abs(inter.estimate + diffAB.estimate - a.estimate) <= slack)
    // disjoint sets intersect to ~0
    val c = build(k, 200000 until 260000)
    assert(a.intersect(c).estimate <= slack)
    // set ops compose: (A∩B)∖A = ∅
    assert(inter.difference(a).estimate === 0.0)
  }

  test("exact-mode set ops are exact") {
    val a = build(1024, 0 until 600)
    val b = build(1024, 400 until 1000)
    assert(a.intersect(b).estimate === 200.0)
    assert(a.difference(b).estimate === 400.0)
    val u = build(1024, 0 until 600).mergeInPlace(build(1024, 400 until 1000))
    assert(u.estimate === 1000.0)
  }

  test("codec round-trip preserves state; merge across codec == direct merge") {
    for (ids <- Seq(0 until 100, 0 until 50000)) { // exact + estimation mode
      val s = build(512, ids)
      val rt = SketchCodec.decodeTheta(SketchCodec.encodeTheta(s))
      assert(rt === s)
      assert(rt.estimate === s.estimate)
    }
    val a = build(512, 0 until 30000)
    val b = build(512, 15000 until 45000)
    val viaCodec = SketchCodec.decodeTheta(SketchCodec.encodeTheta(a))
      .mergeInPlace(SketchCodec.decodeTheta(SketchCodec.encodeTheta(b)))
    assert(viaCodec === build(512, 0 until 30000).mergeInPlace(build(512, 15000 until 45000)))
    assert(SketchCodec.typeOf(SketchCodec.encodeTheta(a)) === SketchCodec.TypeId.Theta)
  }
}
