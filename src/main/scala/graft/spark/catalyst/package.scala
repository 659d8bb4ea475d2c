package graft.spark

import graft.core.{HLLSketch, KLLSketch, TDigestSketch}
import org.apache.spark.sql.{Column, GraftSqlBridge => B}

/** Column API over the native Catalyst sketch expressions. */
package object catalyst {

  /** Build a KM Bloom sketch over the raw key columns (no canonical-string
    * materialization — values are hashed straight from the InternalRow). */
  def bloomAggNative(capacity: Long, fpp: Double)(keys: Column*): Column =
    B.aggColumn(BloomSketchAgg(keys.map(B.expression(_)), capacity, fpp))

  /** Probe a row-hash Bloom sketch column for the raw key columns. */
  def bloomMightContainNative(sketch: Column, keys: Column*): Column =
    B.column(BloomMightContain(B.expression(sketch), keys.map(B.expression(_))))

  def hllAggNative(keys: Column*): Column =
    B.aggColumn(HllSketchAgg(keys.map(B.expression(_))))

  def hllAggNativeP(p: Int)(keys: Column*): Column =
    B.aggColumn(HllSketchAgg(keys.map(B.expression(_)), p))

  /** Theta (KMV) sketch over the raw key columns: distinct counts that
    * survive union, intersection, and difference (see functions.theta*). */
  def thetaAggNative(keys: Column*): Column =
    B.aggColumn(ThetaSketchAgg(keys.map(B.expression(_))))

  def thetaAggNativeK(k: Int)(keys: Column*): Column =
    B.aggColumn(ThetaSketchAgg(keys.map(B.expression(_)), k))

  def cmsAggNative(eps: Double, delta: Double)(keys: Column*): Column =
    B.aggColumn(CmsSketchAgg(keys.map(B.expression(_)), eps, delta))

  def cmsEstimateNative(sketch: Column, keys: Column*): Column =
    B.column(CmsEstimate(B.expression(sketch), keys.map(B.expression(_))))

  def tdigestAggNative(value: Column,
      compression: Double = TDigestSketch.DefaultCompression): Column =
    B.aggColumn(TDigestSketchAgg(B.expression(value), compression))

  def kllAggNative(value: Column, k: Int = KLLSketch.DefaultK): Column =
    B.aggColumn(KllSketchAgg(B.expression(value), k))

  /** Deterministic bottom-k uniform sample of a string/binary column's
    * distinct values (merge-order-independent; same sample at any
    * parallelism — the eval-split primitive). */
  def bottomKSampleAgg(k: Int)(key: Column): Column =
    B.aggColumn(BottomKSampleAgg(B.expression(key), k))

  /** Fold a column of sketch blobs into one blob (hierarchical rollup /
    * two-stage salted aggregation / incremental union). Works for every
    * sketch type in the codec. */
  def sketchMergeAgg(blob: Column): Column =
    B.aggColumn(SketchMergeAgg(B.expression(blob)))

  /** Skew salt: a deterministic bucket in [0, buckets) derived from the
    * salt columns. Standard two-stage pattern:
    *   df.groupBy($"hotKey", saltBucket(buckets, $"row_discriminator"))
    *     .agg(hllAggNative(...).as("s"))
    *     .groupBy($"hotKey").agg(sketchMergeAgg($"s"))
    * Stage 1 spreads a hot key across `buckets` reducers; stage 2 merges
    * tiny blobs. */
  def saltBucket(buckets: Int, cols: Column*): Column =
    org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.xxhash64(cols: _*),
      org.apache.spark.sql.functions.lit(buckets.toLong))
}
