package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Bound + merge-order-independence suite for the north-rule sketch family
  * (HLL / CMS / t-digest / KLL). Exact answers computed in-test are the
  * oracle; DataSketches (jar in image) cross-checks KLL. All randomness is
  * fixed-seed. */
class SketchFamilySpec extends AnyFunSuite {

  // ------------------------------------------------------------------- HLL
  test("HLL estimate within ±3·(1.04/√m) of exact distinct count") {
    for (exact <- Seq(100, 10000, 500000)) {
      val h = HLLSketch()
      (0 until exact).foreach(i => h.update(s"conv-$i"))
      val err = math.abs(h.estimate - exact) / exact
      val bound = 3 * h.relativeStandardError
      assert(err <= bound, s"HLL err $err > $bound at n=$exact (est=${h.estimate})")
    }
  }

  test("HLL duplicates do not inflate the estimate (idempotent updates)") {
    val h = HLLSketch()
    (0 until 1000).foreach(i => h.update(s"k$i"))
    val e1 = h.estimate
    (0 until 1000).foreach(i => h.update(s"k$i"))
    assert(h.estimate === e1)
  }

  test("HLL merge is state-identical under any merge tree and ≡ bulk update") {
    val parts = (0 until 10).map { s =>
      val h = HLLSketch()
      (0 until 5000).foreach(i => h.update(s"item-${s * 5000 + i}"))
      h
    }
    val bulk = HLLSketch()
    (0 until 50000).foreach(i => bulk.update(s"item-$i"))
    val l = parts.map(_.copySketch()).reduceLeft((a, b) => a.mergeInPlace(b))
    val shuffled = new scala.util.Random(11L).shuffle(parts.toList)
    val r = shuffled.map(_.copySketch()).reduceRight((a, b) => b.mergeInPlace(a))
    assert(l === r, "HLL merge order changed state")
    assert(l === bulk, "HLL merge != bulk update")
  }

  test("HLL precision mismatch merge throws") {
    intercept[IllegalArgumentException](HLLSketch(12).mergeInPlace(HLLSketch(14)))
  }

  // ------------------------------------------------------------------- CMS
  test("CMS estimate ≥ true count and ≤ true + εN with prob ≥ 1−δ") {
    val eps = 0.001
    val delta = 0.01
    val c = CMSSketch(eps, delta)
    // zipf-ish synthetic frequencies, fixed
    val freqs = (0 until 200).map(i => s"tool-$i" -> (100000 / (i + 1))).toMap
    freqs.foreach { case (k, f) => (0 until f).foreach(_ => c.update(k)) }
    val n = c.totalCount
    assert(n === freqs.values.map(_.toLong).sum)
    var violations = 0
    freqs.foreach { case (k, f) =>
      val est = c.estimate(k)
      assert(est >= f, s"CMS under-estimated $k: $est < $f (impossible)")
      if (est > f + eps * n) violations += 1
    }
    assert(violations <= math.max(1, (delta * freqs.size).toInt),
      s"CMS ε-bound violated for $violations of ${freqs.size} keys")
  }

  test("CMS merge ≡ bulk, state-identical, any order") {
    val parts = (0 until 6).map { s =>
      val c = CMSSketch(0.01, 0.01)
      (0 until 10000).foreach(i => c.update(s"k${(s * 31 + i) % 50}"))
      c
    }
    val bulk = CMSSketch(0.01, 0.01)
    (0 until 6).foreach(s => (0 until 10000).foreach(i => bulk.update(s"k${(s * 31 + i) % 50}")))
    val l = parts.map(_.copySketch()).reduceLeft((a, b) => a.mergeInPlace(b))
    val shuffled = new scala.util.Random(13L).shuffle(parts.toList)
    val r = shuffled.map(_.copySketch()).reduceRight((a, b) => b.mergeInPlace(a))
    assert(l === r)
    assert(l === bulk)
    assert(l.totalCount === 60000L)
  }

  test("CMS shape mismatch merge throws; sizing formula d=ceil(ln 1/δ), w=ceil(e/ε)") {
    intercept[IllegalArgumentException](CMSSketch(0.01, 0.01).mergeInPlace(CMSSketch(0.001, 0.01)))
    val c = CMSSketch(0.001, 0.01)
    assert(c.depth === math.ceil(math.log(100.0)).toInt)
    assert(c.width === math.ceil(math.E / 0.001).toInt)
  }

  // --------------------------------------------------------------- t-digest
  private def exactQuantile(sorted: Array[Double], q: Double): Double =
    sorted(math.min(sorted.length - 1, math.max(0, math.ceil(q * sorted.length).toInt - 1)))

  private def rankOf(sorted: Array[Double], x: Double): Double = {
    // fraction of items <= x
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (sorted(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo.toDouble / sorted.length
  }

  test("t-digest quantiles within rank error vs exact, lognormal data") {
    val rnd = new scala.util.Random(0xd1ce5eedL)
    val n = 100000
    val data = Array.fill(n)(math.exp(rnd.nextGaussian() * 1.5))
    val td = TDigestSketch()
    data.foreach(td.update)
    val sorted = data.sorted
    for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.95, 0.99)) {
      val est = td.quantile(q)
      val rankErr = math.abs(rankOf(sorted, est) - q)
      // published error ~ q(1-q)/δ; gate generously at 10x + floor
      val bound = math.max(0.005, 10 * q * (1 - q) / td.compression)
      assert(rankErr <= bound, s"t-digest q=$q rankErr=$rankErr > $bound")
    }
    assert(td.quantile(0.0) === sorted.head)
    assert(td.quantile(1.0) === sorted.last)
  }

  test("t-digest merge: estimates within bound under shuffled merge trees") {
    val rnd = new scala.util.Random(0xfeedbeefL)
    val n = 80000
    val data = Array.fill(n)(rnd.nextDouble() * 1000)
    val sorted = data.sorted
    val parts = data.grouped(n / 8).map { chunk =>
      val t = TDigestSketch()
      chunk.foreach(t.update)
      t
    }.toList
    for (seed <- Seq(1L, 2L, 3L)) {
      val order = new scala.util.Random(seed).shuffle(parts)
      val merged = order.map(_.copySketch()).reduceLeft((a, b) => a.mergeInPlace(b))
      for (q <- Seq(0.5, 0.95, 0.99)) {
        val rankErr = math.abs(rankOf(sorted, merged.quantile(q)) - q)
        assert(rankErr <= 0.02, s"merged t-digest q=$q rankErr=$rankErr (seed $seed)")
      }
      assert(merged.count === n.toDouble)
    }
  }

  // -------------------------------------------------------------------- KLL
  test("KLL quantiles within normalized rank error vs exact") {
    val rnd = new scala.util.Random(0x5eedL)
    val n = 100000
    val data = Array.fill(n)(rnd.nextGaussian() * 50 + 200)
    val k = KLLSketch()
    data.foreach(k.update)
    val sorted = data.sorted
    val eps = 3 * k.normalizedRankError // 3x the 2/3-confidence bound
    for (q <- Seq(0.05, 0.25, 0.5, 0.75, 0.95, 0.99)) {
      val est = k.quantile(q)
      val rankErr = math.abs(rankOf(sorted, est) - q)
      assert(rankErr <= eps, s"KLL q=$q rankErr=$rankErr > $eps")
    }
    assert(k.quantile(0.0) === sorted.head)
    assert(k.quantile(1.0) === sorted.last)
    assert(k.count === n.toLong)
  }

  test("KLL tracks DataSketches KllDoublesSketch within combined bound (oracle)") {
    val rnd = new scala.util.Random(0xacc01adeL)
    val n = 50000
    val data = Array.fill(n)(rnd.nextDouble() * 10000)
    val ours = KLLSketch()
    val theirs = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
    data.foreach { v => ours.update(v); theirs.update(v) }
    val sorted = data.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val ourRank = rankOf(sorted, ours.quantile(q))
      val theirRank = rankOf(sorted, theirs.getQuantile(q))
      assert(math.abs(ourRank - q) <= math.abs(theirRank - q) + 3 * ours.normalizedRankError,
        s"our KLL drifts: q=$q us=$ourRank datasketches=$theirRank")
    }
  }

  test("KLL merge: estimates within bound under shuffled merge trees; k mismatch throws") {
    val rnd = new scala.util.Random(0x12345L)
    val n = 60000
    val data = Array.fill(n)(rnd.nextDouble())
    val sorted = data.sorted
    val parts = data.grouped(n / 6).map { chunk =>
      val s = KLLSketch()
      chunk.foreach(s.update)
      s
    }.toList
    for (seed <- Seq(5L, 6L)) {
      val order = new scala.util.Random(seed).shuffle(parts)
      val merged = order.map(_.copySketch()).reduceLeft((a, b) => a.mergeInPlace(b))
      assert(merged.count === n.toLong)
      for (q <- Seq(0.5, 0.9)) {
        val rankErr = math.abs(rankOf(sorted, merged.quantile(q)) - q)
        assert(rankErr <= 4 * merged.normalizedRankError,
          s"merged KLL q=$q rankErr=$rankErr (seed $seed)")
      }
    }
    intercept[IllegalArgumentException](KLLSketch(100).mergeInPlace(KLLSketch(200)))
  }

  // ------------------------------------------------------------------ codec
  test("codec round-trips every sketch type losslessly") {
    val bloom = KMBloomSketch(5000L, 0.01)
    (0 until 3000).foreach(i => bloom.insertLong(i.toLong))
    val b2 = SketchCodec.decodeBloom(SketchCodec.encodeBloom(bloom))
    assert(b2 === bloom)
    assert(b2.isInstanceOf[KMBloomSketch])
    (0 until 3000).foreach(i => assert(b2.mightContainLong(i.toLong)))

    val seeded = SeededBloomSketch(500L, 0.01)
    seeded.insert("x")
    val s2 = SketchCodec.decodeBloom(SketchCodec.encodeBloom(seeded))
    assert(s2.isInstanceOf[SeededBloomSketch] && s2 === seeded)

    val hll = HLLSketch()
    (0 until 10000).foreach(i => hll.update(s"v$i"))
    val h2 = SketchCodec.decodeHll(SketchCodec.encodeHll(hll))
    assert(h2 === hll)

    val cms = CMSSketch(0.01, 0.01)
    (0 until 1000).foreach(i => cms.update(s"t${i % 7}"))
    val c2 = SketchCodec.decodeCms(SketchCodec.encodeCms(cms))
    assert(c2 === cms)

    val td = TDigestSketch()
    (0 until 10000).foreach(i => td.update(i.toDouble))
    val t2 = SketchCodec.decodeTDigest(SketchCodec.encodeTDigest(td))
    assert(t2.quantile(0.5) === td.quantile(0.5))
    assert(t2.minValue === td.minValue && t2.maxValue === td.maxValue)

    val kll = KLLSketch()
    (0 until 10000).foreach(i => kll.update(i.toDouble))
    val k2 = SketchCodec.decodeKll(SketchCodec.encodeKll(kll))
    assert(k2.count === kll.count)
    assert(k2.quantile(0.5) === kll.quantile(0.5))

    // type sniffing + mismatch rejection
    assert(SketchCodec.typeOf(SketchCodec.encodeHll(hll)) === SketchCodec.TypeId.Hll)
    intercept[IllegalArgumentException](SketchCodec.decodeBloom(SketchCodec.encodeHll(hll)))
  }
}
