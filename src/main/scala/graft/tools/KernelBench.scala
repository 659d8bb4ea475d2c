package graft.tools
import graft.core._
/** Single-threaded kernel throughput (reference-equivalent ceiling:
  * the crate is single-threaded by construction). */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = 20000000
    val bloom = KMBloomSketch(n.toLong, 0.001)
    val hll = HLLSketch()
    val cms = CMSSketch(0.001, 0.01)
    // warm-up
    (0 until 2000000).foreach(i => bloom.insertHashes(i.toLong * 0x9E3779B9L, i.toLong))
    for (round <- 1 to 2) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        // same per-row work as the Spark build: hash the key, feed 3 sketches
        val h1 = Hashing.xxHash64Long(i.toLong, 0L)
        val h2 = Hashing.murmur3_64Long(i.toLong, 0L)
        bloom.insertHashes(h1, h2)
        hll.updateHash(h1)
        cms.updateHash(h1)
        i += 1
      }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"single-thread 3-sketch build: $n rows in $s%.2f s = ${n / s}%.0f rows/s (round $round)")
    }
  }
}
