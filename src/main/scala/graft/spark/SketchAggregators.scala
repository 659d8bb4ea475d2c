package graft.spark

import graft.core._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable sketch aggregators — the Spark-native re-expression of the
  * reference's insert/union lifecycle (`/root/reference/src/
  * km_bloom_filter.rs:308–318` insert, 184–194 union):
  * Spark's partial aggregation (per-partition `reduce`) IS the reference's
  * insert loop; the shuffle-crossing `merge` IS the reference's union.
  * Buffers are the core sketch objects held in ObjectHashAggregate's
  * object buffer (kryo-encoded only when a buffer actually crosses the
  * wire), outputs are codec bytes in a BinaryType column.
  *
  * Input convention: a canonical key encoding as Array[Byte]
  * (see functions.sketchKey) so one aggregator serves any column tuple.
  */
class BloomAggregator(capacity: Long, fpp: Double, seeded: Boolean = false,
    hashers: KMHashPair = KMHashPair.XxMurmur)
    extends Aggregator[Array[Byte], BloomSketch, Array[Byte]] {
  override def zero: BloomSketch =
    if (seeded) SeededBloomSketch(capacity, fpp)
    else KMBloomSketch(capacity, fpp, hashers)
  override def reduce(b: BloomSketch, key: Array[Byte]): BloomSketch = {
    if (key != null) b.insert(key)
    b
  }
  override def merge(a: BloomSketch, b: BloomSketch): BloomSketch = a.unionInPlace(b)
  override def finish(b: BloomSketch): Array[Byte] = SketchCodec.encodeBloom(b)
  override def bufferEncoder: Encoder[BloomSketch] = Encoders.kryo[BloomSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

class HllAggregator(p: Int = HLLSketch.DefaultP)
    extends Aggregator[Array[Byte], HLLSketch, Array[Byte]] {
  override def zero: HLLSketch = HLLSketch(p)
  override def reduce(b: HLLSketch, key: Array[Byte]): HLLSketch = {
    if (key != null) b.update(key)
    b
  }
  override def merge(a: HLLSketch, b: HLLSketch): HLLSketch = a.mergeInPlace(b)
  override def finish(b: HLLSketch): Array[Byte] = SketchCodec.encodeHll(b)
  override def bufferEncoder: Encoder[HLLSketch] = Encoders.kryo[HLLSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

class CmsAggregator(eps: Double, delta: Double)
    extends Aggregator[Array[Byte], CMSSketch, Array[Byte]] {
  override def zero: CMSSketch = CMSSketch(eps, delta)
  override def reduce(b: CMSSketch, key: Array[Byte]): CMSSketch = {
    if (key != null) b.update(key)
    b
  }
  override def merge(a: CMSSketch, b: CMSSketch): CMSSketch = a.mergeInPlace(b)
  override def finish(b: CMSSketch): Array[Byte] = SketchCodec.encodeCms(b)
  override def bufferEncoder: Encoder[CMSSketch] = Encoders.kryo[CMSSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

class TDigestAggregator(compression: Double = TDigestSketch.DefaultCompression)
    extends Aggregator[java.lang.Double, TDigestSketch, Array[Byte]] {
  override def zero: TDigestSketch = TDigestSketch(compression)
  override def reduce(b: TDigestSketch, v: java.lang.Double): TDigestSketch = {
    if (v != null) b.update(v.doubleValue())
    b
  }
  override def merge(a: TDigestSketch, b: TDigestSketch): TDigestSketch = a.mergeInPlace(b)
  override def finish(b: TDigestSketch): Array[Byte] = SketchCodec.encodeTDigest(b)
  override def bufferEncoder: Encoder[TDigestSketch] = Encoders.kryo[TDigestSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

class KllAggregator(k: Int = KLLSketch.DefaultK)
    extends Aggregator[java.lang.Double, KLLSketch, Array[Byte]] {
  override def zero: KLLSketch = KLLSketch(k)
  override def reduce(b: KLLSketch, v: java.lang.Double): KLLSketch = {
    if (v != null) b.update(v.doubleValue())
    b
  }
  override def merge(a: KLLSketch, b: KLLSketch): KLLSketch = a.mergeInPlace(b)
  override def finish(b: KLLSketch): Array[Byte] = SketchCodec.encodeKll(b)
  override def bufferEncoder: Encoder[KLLSketch] = Encoders.kryo[KLLSketch]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Counting-Bloom aggregation over a SIGNED stream: rows are
  * (key, multiplicity) with multiplicity > 0 for inserts and < 0 for
  * retractions (the CDC/upsert-feed shape). Inserts and retractions
  * accumulate into two separate counting filters — each a commutative
  * monoid under saturating per-cell add, so partial/final merges are
  * legal in any tree order and a retraction seen BEFORE its insert
  * (routine across partitions) can never floor a cell — and the net
  * filter is computed once at finish via floored subtraction
  * (CountingBloomSketch.subtractInPlace). Exact (and collapse-to-bit
  * filter bit-exact) whenever no cell accumulates 255 hits on either
  * side. */
class CbfAggregator(capacity: Long, fpp: Double,
    hashers: KMHashPair = KMHashPair.XxMurmur)
    extends Aggregator[(Array[Byte], Long), (CountingBloomSketch, CountingBloomSketch), Array[Byte]] {
  override def zero: (CountingBloomSketch, CountingBloomSketch) =
    (CountingBloomSketch(capacity, fpp, hashers), CountingBloomSketch(capacity, fpp, hashers))
  override def reduce(b: (CountingBloomSketch, CountingBloomSketch),
      row: (Array[Byte], Long)): (CountingBloomSketch, CountingBloomSketch) = {
    val (key, mult) = row
    if (key != null && mult != 0L) {
      val target = if (mult > 0L) b._1 else b._2
      // hash the key ONCE — repeated insert(key) would re-run both base
      // hashes per multiplicity step. The loop is also capped at 255:
      // cells saturate there, so iteration n>255 is a provable no-op
      // (any touched cell is already 255 either way), and the cap makes
      // a pathological multiplicity (10^12, or Long.MinValue whose abs
      // is negative) finite instead of a hang.
      val h1 = target.hashers.h1(key)
      val h2 = target.hashers.h2(key)
      var i = 0L
      val n = math.min(255L, if (mult > 0L) mult else -math.max(mult, -255L))
      while (i < n) { target.insertHashes(h1, h2); i += 1 }
    }
    b
  }
  override def merge(a: (CountingBloomSketch, CountingBloomSketch),
      b: (CountingBloomSketch, CountingBloomSketch)): (CountingBloomSketch, CountingBloomSketch) =
    (a._1.mergeInPlace(b._1), a._2.mergeInPlace(b._2))
  override def finish(b: (CountingBloomSketch, CountingBloomSketch)): Array[Byte] =
    SketchCodec.encodeCountingBloom(b._1.subtractInPlace(b._2))
  override def bufferEncoder: Encoder[(CountingBloomSketch, CountingBloomSketch)] =
    Encoders.kryo[(CountingBloomSketch, CountingBloomSketch)]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
