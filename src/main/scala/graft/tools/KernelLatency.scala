package graft.tools

import graft.core._

/** Port of the reference's measurement harness SHAPE
  * (/root/reference/tests/benchmark.rs:6–104): per-element insert and
  * probe latency over DefaultBloomFilter (KM) and SeededBloomFilter at
  * doubling element counts 2·2^i, p = 0.001. Prints timings like the
  * reference (whose benchmarks are all #[ignore]d and publish no
  * numbers), but additionally HARD-FAILS on any false negative — a
  * timing sweep over a broken filter would be worse than no sweep. */
object KernelLatency {
  def main(args: Array[String]): Unit = {
    val maxExp = args.headOption.map(_.toInt).getOrElse(21) // 2·2^21 ≈ 4.2M
    println("variant,n,insert_ns_per_elem,probe_ns_per_elem")
    for (variant <- Seq("km", "seeded")) {
      var i = 6 // small counts are all JIT noise
      while (i <= maxExp) {
        val n = 2L << i
        val (insNs, probeNs) = variant match {
          case "km" =>
            val f = KMBloomSketch(n, 0.001)
            val t0 = System.nanoTime()
            var j = 0L
            while (j < n) { f.insert(java.lang.Long.toString(j)); j += 1 }
            val t1 = System.nanoTime()
            var hits = 0L
            j = 0
            while (j < n) { if (f.mightContain(java.lang.Long.toString(j))) hits += 1; j += 1 }
            val t2 = System.nanoTime()
            require(hits == n, "false negative in latency sweep")
            ((t1 - t0).toDouble / n, (t2 - t1).toDouble / n)
          case _ =>
            val f = SeededBloomSketch(n, 0.001)
            val t0 = System.nanoTime()
            var j = 0L
            while (j < n) { f.insert(java.lang.Long.toString(j)); j += 1 }
            val t1 = System.nanoTime()
            var hits = 0L
            j = 0
            while (j < n) { if (f.mightContain(java.lang.Long.toString(j))) hits += 1; j += 1 }
            val t2 = System.nanoTime()
            require(hits == n, "false negative in latency sweep")
            ((t1 - t0).toDouble / n, (t2 - t1).toDouble / n)
        }
        println(f"$variant,$n,$insNs%.1f,$probeNs%.1f")
        i += 3
      }
    }
  }
}
