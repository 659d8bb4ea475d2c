package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Counting Bloom filter — the deletion surface neither reference variant
  * offers (insert-only by design; lib.rs:180–234). Pins the Fan et al.
  * "Summary Cache" contract: never a false negative under
  * remove-only-inserted, sticky saturation, merge order-independence,
  * and BIT-EXACT collapse to the KM filter over the surviving multiset. */
class CountingBloomSpec extends AnyFunSuite {

  private def keys(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix-$i")

  test("insert/contains: zero false negatives; FPR within configured bound") {
    val n = 20000
    val cbf = CountingBloomSketch(n.toLong, 0.001)
    keys("in", n).foreach(cbf.insert)
    assert(keys("in", n).forall(cbf.mightContain), "no false negatives, ever")
    val fp = keys("out", n).count(cbf.mightContain)
    // generous margin over p=0.001 (the reference's own FPR gates allow
    // relative margins per hash pair; integration.rs:157–166)
    assert(fp.toDouble / n < 0.003, s"FPR ${fp.toDouble / n} exceeds margin")
  }

  test("remove: fully-removed unshared element no longer reported (beyond FPR); survivors always reported") {
    val n = 10000
    val cbf = CountingBloomSketch(n.toLong, 0.001)
    val kept = keys("keep", n / 2)
    val gone = keys("gone", n / 2)
    (kept ++ gone).foreach(cbf.insert)
    gone.foreach(cbf.remove)
    assert(kept.forall(cbf.mightContain),
      "removing other elements must never create a false negative")
    // a removed element may still collide into kept cells — but only at
    // FPR rates, not systematically
    val stillThere = gone.count(cbf.mightContain)
    assert(stillThere.toDouble / gone.size < 0.003,
      s"removed elements still reported at ${stillThere.toDouble / gone.size}")
  }

  test("remove of a double-inserted element removes ONE multiplicity") {
    val cbf = CountingBloomSketch(1000L, 0.001)
    cbf.insert("x"); cbf.insert("x")
    cbf.remove("x")
    assert(cbf.mightContain("x"), "one copy must survive")
    cbf.remove("x")
    assert(!cbf.mightContain("x"))
  }

  test("saturated cells are sticky: overflow degrades FPR, never correctness") {
    val cbf = CountingBloomSketch(1000L, 0.001)
    for (_ <- 0 until 300) cbf.insert("hot") // saturates its cells at 255
    cbf.insert("x") // may or may not share cells; insert then remove hot 300×
    for (_ <- 0 until 300) cbf.remove("hot")
    assert(cbf.mightContain("hot"),
      "saturated cells never decrement — a saturated element is permanently present")
  }

  test("merge: per-cell saturating add, order-independent state") {
    val parts = (0 until 8).map { p =>
      val c = CountingBloomSketch(4000L, 0.01)
      keys(s"p$p", 500).foreach(c.insert)
      c
    }
    val leftFold = parts.map(_.copySketch()).reduceLeft(_.mergeInPlace(_))
    val shuffled = scala.util.Random.shuffle(parts.toList)
      .map(_.copySketch()).reduceLeft(_.mergeInPlace(_))
    // pairwise tree
    def tree(xs: Seq[CountingBloomSketch]): CountingBloomSketch =
      if (xs.size == 1) xs.head
      else tree(xs.grouped(2).map {
        case Seq(a, b) => a.mergeInPlace(b)
        case Seq(a) => a
      }.toSeq)
    val treeMerged = tree(parts.map(_.copySketch()))
    assert(leftFold === shuffled && leftFold === treeMerged,
      "merge must be associative + commutative (any Spark merge tree)")
    assert((0 until 8).flatMap(p => keys(s"p$p", 500)).forall(leftFold.mightContain))
  }

  test("merge/subtract reject mismatched configs and hash pairs") {
    val a = CountingBloomSketch(1000L, 0.001)
    val b = CountingBloomSketch(9999L, 0.001)
    intercept[IllegalArgumentException](a.mergeInPlace(b))
    intercept[IllegalArgumentException](a.subtractInPlace(b))
    val c = CountingBloomSketch(1000L, 0.001, KMHashPair.XxFnv)
    intercept[IllegalArgumentException](a.mergeInPlace(c))
  }

  test("collapse is BIT-EXACT to a KM filter over the surviving multiset") {
    val n = 5000
    val cbf = CountingBloomSketch(n.toLong, 0.001)
    val kept = keys("keep", n / 2)
    val gone = keys("gone", n / 2)
    (kept ++ gone).foreach(cbf.insert)
    gone.foreach(cbf.remove)
    val direct = KMBloomSketch(n.toLong, 0.001)
    kept.foreach(direct.insert)
    assert(cbf.collapse() === direct,
      "insert-then-exact-cancel must collapse to the filter over the survivors")
    // estimators agree with the collapsed occupancy
    assert(cbf.approximateElementCount === direct.approximateElementCount)
  }

  test("signed-aggregation identity: (plus − minus) equals sequential insert/remove") {
    val n = 2000
    val seq = CountingBloomSketch(n.toLong, 0.01)
    val plus = CountingBloomSketch(n.toLong, 0.01)
    val minus = CountingBloomSketch(n.toLong, 0.01)
    val kept = keys("k", n / 2)
    val gone = keys("g", n / 2)
    (kept ++ gone).foreach { s => seq.insert(s); plus.insert(s) }
    gone.foreach { s => seq.remove(s); minus.insert(s) }
    assert(plus.subtractInPlace(minus) === seq,
      "two-filter signed aggregation must equal the sequential mutation")
  }

  test("codec: canonical roundtrip, sparse for light fill, dense at design fill") {
    // light fill → sparse layout, strictly smaller than cells
    val light = CountingBloomSketch(100000L, 0.001)
    keys("a", 50).foreach(light.insert)
    val lightBlob = SketchCodec.encodeCountingBloom(light)
    assert(SketchCodec.decodeCountingBloom(lightBlob) === light)
    assert(lightBlob.length < light.cells.length / 5,
      s"lightly-filled blob (${lightBlob.length} B) must compress well below " +
        s"dense (${light.cells.length} B)")
    // design fill → dense layout still roundtrips
    val full = CountingBloomSketch(2000L, 0.01)
    keys("b", 2000).foreach(full.insert)
    val fullBlob = SketchCodec.encodeCountingBloom(full)
    assert(SketchCodec.decodeCountingBloom(fullBlob) === full)
    // canonical: state → bytes is a pure function (same state, same bytes)
    val again = SketchCodec.encodeCountingBloom(
      SketchCodec.decodeCountingBloom(fullBlob))
    assert(java.util.Arrays.equals(again, fullBlob))
    // describe never throws
    assert(SketchCodec.describe(lightBlob).contains("CountingBloomSketch"))
  }

  test("oversized single filter is rejected toward sharding") {
    val e = intercept[IllegalArgumentException](
      CountingBloomSketch(200000000L, 0.001))
    assert(e.getMessage.contains("shard"))
  }
}
