package graft.core

/** Sizing math + merge-compatibility contract for Bloom sketches.
  *
  * The formulas are the reference's, exactly
  * (`/root/reference/src/lib.rs:239–249`,
  * `/root/reference/src/km_bloom_filter.rs:92–105`):
  *   m   = ceil(−n·ln p / ln²2)          (optimal_bit_count)
  *   k   = round((m/n)·ln 2)             (optimal_number_of_hashers)
  *   bph = ceil(m / k)                   (bits per hasher, partitioned)
  * Total allocated bits = k · bph; hasher i owns the disjoint segment
  * [i·bph, (i+1)·bph). Construction requires capacity > 0 (the reference
  * panics, km_bloom_filter.rs:93–95 — we throw IllegalArgumentException).
  *
  * Two sketches are merge-compatible iff (k, bph) are equal
  * (`eq_configuration`, km_bloom_filter.rs:267–270).
  */
final case class BloomConfig(capacity: Long, fpp: Double) {
  require(capacity > 0, s"desired_capacity must be > 0, got $capacity")
  require(fpp > 0.0 && fpp < 1.0, s"false-positive probability must be in (0,1), got $fpp")

  /** m = ceil(−n·ln p / ln²2) — reference lib.rs:239–242. */
  val optimalBitCount: Long = {
    val ln2 = math.log(2.0)
    math.ceil(-(capacity.toDouble) * math.log(fpp) / (ln2 * ln2)).toLong
  }

  /** k = round((m/n)·ln 2) — reference lib.rs:247–249. */
  val numberOfHashers: Int = {
    val k = math.round((optimalBitCount.toDouble / capacity.toDouble) * math.log(2.0))
    math.max(1L, k).toInt
  }

  /** bits per hasher = ceil(m / k) — reference km_bloom_filter.rs:96–100. */
  val bitsPerHasher: Long =
    (optimalBitCount + numberOfHashers - 1) / numberOfHashers

  /** Total allocated bits = k · ceil(m/k). */
  val totalBits: Long = numberOfHashers.toLong * bitsPerHasher

  /** Merge precondition — reference `eq_configuration`
    * (km_bloom_filter.rs:267–270): same k AND same bits-per-hasher. */
  def eqConfiguration(other: BloomConfig): Boolean =
    numberOfHashers == other.numberOfHashers && bitsPerHasher == other.bitsPerHasher
}

object BloomConfig {
  /** Estimators shared by both filter variants (reference lib.rs:254–274).
    * nEst = −bph · ln(1 − ones/(k·bph));  fppEst = (1 − e^(−nEst/bph))^k. */
  def approximateElementCount(k: Int, bitsPerHasher: Long, ones: Long): Double = {
    val m = k.toDouble * bitsPerHasher.toDouble
    -bitsPerHasher.toDouble * math.log(1.0 - ones.toDouble / m)
  }

  def approximateFpp(k: Int, bitsPerHasher: Long, ones: Long): Double = {
    val nStar = approximateElementCount(k, bitsPerHasher, ones)
    math.pow(1.0 - math.exp(-nStar / bitsPerHasher.toDouble), k.toDouble)
  }
}
