package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries heavy hitters: the DETERMINISTIC guarantees (no
  * probabilities anywhere, so every gate is exact):
  *   - undercount only: est(x) ≤ f(x);
  *   - error: f(x) − est(x) ≤ decrementTotal ≤ N/(k+1);
  *   - recall: every x with f(x) > N/(k+1) is present;
  *   - mergeable (PODS 2012): the same bounds hold for any merge tree
  *     with N = total weight.
  */
class MGSketchSpec extends AnyFunSuite {

  /** Zipf-ish deterministic stream: key i appears ~C/(i+1) times. */
  private def zipfStream(nKeys: Int, scale: Int): Seq[String] = {
    val items = for {
      i <- 0 until nKeys
      _ <- 0 until math.max(1, scale / (i + 1))
    } yield s"key-$i"
    // deterministic interleave (adversarial-ish: heavy keys spread out)
    new scala.util.Random(42L).shuffle(items)
  }

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def checkBounds(s: MGSketch, exact: Map[String, Long]): Unit = {
    val n = exact.values.sum
    assert(s.processedCount === n)
    assert(s.decrementTotal <= n / (s.k + 1),
      s"decrementTotal ${s.decrementTotal} exceeds N/(k+1) = ${n / (s.k + 1)}")
    exact.foreach { case (key, f) =>
      val est = s.estimate(key)
      assert(est <= f, s"$key overcounted: est $est > true $f")
      assert(f - est <= s.decrementTotal, s"$key error ${f - est} > bound ${s.decrementTotal}")
      if (f > n / (s.k + 1))
        assert(est > 0, s"heavy key $key (f=$f > ${n / (s.k + 1)}) missing")
    }
    // no phantom keys
    s.entries.foreach { case (kb, est) =>
      val key = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      assert(exact.contains(key) && est <= exact(key))
    }
  }

  test("exact recovery when k >= distinct keys") {
    val xs = zipfStream(20, 200)
    val s = MGSketch(32)
    xs.foreach(s.update)
    val exact = exactCounts(xs)
    assert(s.decrementTotal === 0L)
    exact.foreach { case (k, f) => assert(s.estimate(k) === f) }
    assert(s.entries.size === exact.size)
  }

  test("bounds hold with k far below the distinct count") {
    for (k <- Seq(4, 8, 16)) {
      val xs = zipfStream(500, 2000)
      val s = MGSketch(k)
      xs.foreach(s.update)
      checkBounds(s, exactCounts(xs))
    }
  }

  test("weighted update is equivalent to repeated unit updates") {
    val keys = (0 until 50).map(i => s"w-$i")
    val weights = keys.zipWithIndex.map { case (k, i) => k -> (1L + (i * 7) % 23) }.toMap
    val unit = MGSketch(8)
    val weighted = MGSketch(8)
    // identical arrival order
    keys.foreach { k =>
      (0L until weights(k)).foreach(_ => unit.update(Hashing.utf8(k), 1L))
      weighted.update(Hashing.utf8(k), weights(k))
    }
    assert(unit === weighted,
      "weighted fold must produce the identical state to unit-weight arrivals")
  }

  test("merge under shuffled trees keeps every bound (mergeable summaries)") {
    val xs = zipfStream(300, 3000)
    val exact = exactCounts(xs)
    val parts = xs.grouped(math.max(1, xs.size / 7)).toList
    val rnd = new scala.util.Random(7L)
    for (_ <- 0 until 3) {
      val sketches = rnd.shuffle(parts).map { p =>
        val s = MGSketch(16)
        p.foreach(s.update)
        s
      }
      val merged = sketches.reduceLeft((a, b) => a.mergeInPlace(b))
      checkBounds(merged, exact)
    }
  }

  test("codec round-trip is lossless and canonical for a given state") {
    val xs = zipfStream(100, 500)
    val s = MGSketch(12)
    xs.foreach(s.update)
    val blob = SketchCodec.encodeMg(s)
    assert(SketchCodec.typeOf(blob) === SketchCodec.TypeId.Mg)
    val back = SketchCodec.decodeMg(blob)
    assert(back === s)
    assert(java.util.Arrays.equals(SketchCodec.encodeMg(back), blob),
      "re-encode of the decoded state must be byte-identical")
    assert(SketchCodec.describe(blob).contains("MGSketch"))
  }

  test("config mismatch and invalid states are rejected") {
    val a = MGSketch(8)
    val b = MGSketch(16)
    a.update("x"); b.update("y")
    intercept[IllegalArgumentException](a.mergeInPlace(b))
    intercept[IllegalArgumentException](MGSketch(0))
    intercept[IllegalArgumentException](
      MGSketch.fromEntries(1, Seq(Array[Byte](1) -> 1L, Array[Byte](2) -> 1L), 0L, 2L))
    intercept[IllegalArgumentException](
      MGSketch.fromEntries(4, Seq(Array[Byte](1) -> 0L), 0L, 1L))
    intercept[IllegalArgumentException](
      MGSketch.fromEntries(4,
        Seq(Array[Byte](1) -> 1L, Array[Byte](1) -> 2L), 0L, 3L))
    intercept[IllegalArgumentException](a.update(Hashing.utf8("z"), 0L))
  }
}
