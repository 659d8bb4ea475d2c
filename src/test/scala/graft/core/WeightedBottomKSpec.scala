package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Weighted bottom-k (A-ES race keys over the key's own hash). Pins:
  *   1. merge over ANY partitioning ≡ bulk build, bit-identical through
  *      the codec (the map-side-combine contract);
  *   2. the selection IS the k smallest race keys (exact, recomputed
  *      from first principles here);
  *   3. weight-proportional inclusion at k ≪ n (9:1 weights → ~9:1
  *      inclusion, loose deterministic bound);
  *   4. weight contract enforced (non-finite / non-positive throws);
  *   5. codec round-trip + describe + k-mismatch merge rejection.
  */
class WeightedBottomKSpec extends AnyFunSuite {

  private def keyBytes(i: Int): Array[Byte] =
    s"doc-$i".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** deterministic weight, a pure function of the key: 9.0 for i ≡ 0
    * (mod 2), 1.0 otherwise */
  private def weightOf(i: Int): Double = if (i % 2 == 0) 9.0 else 1.0

  test("merge over any partitioning is bit-identical to the bulk build") {
    val n = 5000
    val bulk = WeightedBottomKSketch(256)
    (0 until n).foreach(i => bulk.update(keyBytes(i), weightOf(i)))

    for (parts <- Seq(2, 7, 32)) {
      val shards = (0 until parts).map(_ => WeightedBottomKSketch(256))
      (0 until n).foreach(i => shards(i % parts).update(keyBytes(i), weightOf(i)))
      // fold in a scrambled order to exercise merge-order independence
      val merged = shards.sortBy(_.hashCode).reduce((a, b) => a.mergeInPlace(b))
      assert(merged == bulk, s"merge at $parts shards diverged from bulk")
      assert(java.util.Arrays.equals(
        SketchCodec.encodeWeightedBottomK(merged),
        SketchCodec.encodeWeightedBottomK(bulk)),
        s"codec bytes at $parts shards diverged from bulk")
    }
  }

  test("selection is exactly the k smallest race keys") {
    val n = 2000
    val k = 100
    val s = WeightedBottomKSketch(k)
    (0 until n).foreach(i => s.update(keyBytes(i), weightOf(i)))
    val expected = (0 until n).map { i =>
      val h = Hashing.xxHash64(keyBytes(i), 0L)
      (WeightedBottomKSketch.raceOf(h, weightOf(i)), i)
    }.sorted.take(k).map(e => new String(keyBytes(e._2))).toSet
    val got = s.sample.map(new String(_)).toSet
    assert(got == expected)
  }

  test("inclusion tracks weight (9:1 weights, k << n)") {
    val n = 5000
    val k = 500
    val s = WeightedBottomKSketch(k)
    (0 until n).foreach(i => s.update(keyBytes(i), weightOf(i)))
    val heavy = s.sample.map(new String(_)).count(_.stripPrefix("doc-").toInt % 2 == 0)
    // E[heavy] ≈ k·0.9 = 450 (A-ES without replacement; exact value for
    // THIS fixed hash assignment is deterministic) — require the share to
    // be decisively weighted, far above the uniform 50%.
    assert(heavy >= 400, s"heavy inclusion $heavy of $k — weights not honored")
  }

  test("weights must be finite and > 0") {
    val s = WeightedBottomKSketch(8)
    intercept[IllegalArgumentException](s.update(keyBytes(1), 0.0))
    intercept[IllegalArgumentException](s.update(keyBytes(1), -1.0))
    intercept[IllegalArgumentException](s.update(keyBytes(1), Double.NaN))
    intercept[IllegalArgumentException](s.update(keyBytes(1), Double.PositiveInfinity))
    assert(s.size == 0)
  }

  test("codec round-trip, describe, and k-mismatch rejection") {
    val s = WeightedBottomKSketch(32)
    (0 until 100).foreach(i => s.update(keyBytes(i), weightOf(i)))
    val blob = SketchCodec.encodeWeightedBottomK(s)
    val back = SketchCodec.decodeWeightedBottomK(blob)
    assert(back == s)
    assert(SketchCodec.typeOf(blob) == SketchCodec.TypeId.WeightedBottomK)
    assert(SketchCodec.describe(blob).contains("WeightedBottomKSketch"))
    val other = WeightedBottomKSketch(16)
    other.update(keyBytes(1), 1.0)
    val e = intercept[IllegalArgumentException](s.mergeInPlace(other))
    assert(e.getMessage.contains("different configurations"))
  }

  test("duplicate keys dedupe; sample order is race order") {
    val s = WeightedBottomKSketch(16)
    (0 until 10).foreach(i => s.update(keyBytes(i), weightOf(i)))
    (0 until 10).foreach(i => s.update(keyBytes(i), weightOf(i))) // again
    assert(s.size == 10)
    val races = s.sample.map { kb =>
      val i = new String(kb).stripPrefix("doc-").toInt
      WeightedBottomKSketch.raceOf(Hashing.xxHash64(kb, 0L), weightOf(i))
    }
    assert(races.sameElements(races.sorted))
  }
}
