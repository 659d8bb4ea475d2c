package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Bottom-k distinct sample kernel: determinism, merge-order state
  * identity, uniformity, dedup, codec round-trip. */
class BottomKSketchSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = Hashing.utf8(s)

  private def build(k: Int, ids: Range): BottomKSketch = {
    val s = BottomKSketch(k)
    ids.foreach(i => s.update(bytes(s"key-$i")))
    s
  }

  test("below k: retains every distinct key exactly once (dups are no-ops)") {
    val s = BottomKSketch(100)
    (0 until 60).foreach(i => s.update(bytes(s"key-$i")))
    (0 until 60).foreach(i => s.update(bytes(s"key-$i")))
    assert(s.size === 60)
    assert(s.sample.map(new String(_)).toSet === (0 until 60).map(i => s"key-$i").toSet)
  }

  test("above k: exactly k sampled, all sampled keys are real inputs, deterministic") {
    val s = build(128, 0 until 10000)
    assert(s.size === 128)
    val sampled = s.sample.map(new String(_))
    val universe = (0 until 10000).map(i => s"key-$i").toSet
    assert(sampled.forall(universe.contains))
    assert(build(128, 0 until 10000) === s) // rerun → identical sample
  }

  test("merge: state-identical to bulk build under any merge order / partitioning") {
    val k = 64
    val n = 5000
    val bulk = build(k, 0 until n)
    val r = new scala.util.Random(37)
    for (_ <- 1 to 5) {
      val parts = r.shuffle((0 until n).toList).grouped(n / 7 + 1).map { chunk =>
        val p = BottomKSketch(k)
        chunk.foreach(i => p.update(bytes(s"key-$i")))
        p
      }.toList
      val merged = r.shuffle(parts).reduce((a, b) => a.mergeInPlace(b))
      assert(merged === bulk, "merge tree changed the sample")
    }
    intercept[IllegalArgumentException](BottomKSketch(64).mergeInPlace(BottomKSketch(128)))
  }

  test("uniformity: sampled fraction of a known subpopulation tracks its true share") {
    // universe 20000 keys, 30% in class A (by construction, not by hash)
    val k = 2048
    val s = BottomKSketch(k)
    val labels = (0 until 20000).map(i => i % 10 < 3)
    (0 until 20000).foreach(i => s.update(bytes(s"key-$i")))
    val sampledA = s.sample.map(new String(_))
      .count(x => labels(x.stripPrefix("key-").toInt))
    val pHat = sampledA.toDouble / k
    // 5 sigma binomial band around 0.30
    val sigma = math.sqrt(0.3 * 0.7 / k)
    assert(math.abs(pHat - 0.3) <= 5 * sigma, s"sampled share $pHat vs 0.30 ± ${5 * sigma}")
  }

  test("codec round-trip preserves state; merge across codec == direct merge") {
    for (ids <- Seq(0 until 50, 0 until 5000)) {
      val s = build(256, ids)
      val rt = SketchCodec.decodeBottomK(SketchCodec.encodeBottomK(s))
      assert(rt === s)
    }
    val viaCodec = SketchCodec.decodeBottomK(SketchCodec.encodeBottomK(build(256, 0 until 3000)))
      .mergeInPlace(SketchCodec.decodeBottomK(SketchCodec.encodeBottomK(build(256, 2000 until 6000))))
    assert(viaCodec === build(256, 0 until 3000).mergeInPlace(build(256, 2000 until 6000)))
    assert(SketchCodec.typeOf(SketchCodec.encodeBottomK(viaCodec)) === SketchCodec.TypeId.BottomK)
  }
}
