package graft.tools

import graft.core._

/** CLI smoke drive of the core kernels through their public API — the
  * same build → serialize → merge → probe → estimate path Spark's
  * partial/final aggregation takes. Run: `sbt "runMain graft.tools.KernelSmoke"`. */
object KernelSmoke {
  def main(args: Array[String]): Unit = {
    val cfg = BloomConfig(100000L, 0.001)
    println(s"sizing: m=${cfg.optimalBitCount} k=${cfg.numberOfHashers} bph=${cfg.bitsPerHasher}")
    val partA = KMBloomSketch(cfg)
    val partB = KMBloomSketch(cfg)
    (0 until 50000).foreach(i => partA.insert(s"conv-$i|0"))
    (50000 until 100000).foreach(i => partB.insert(s"conv-$i|0"))
    val merged = SketchCodec.decodeBloom(SketchCodec.encodeBloom(partA))
      .unionInPlace(SketchCodec.decodeBloom(SketchCodec.encodeBloom(partB)))
    println(s"merged: $merged")
    println(s"probe inserted conv-777|0 -> ${merged.mightContain("conv-777|0")} (expect true)")
    println(s"probe missing  conv-777|9 -> ${merged.mightContain("conv-777|9")} (expect false w.h.p.)")
    println(f"estimated n=${merged.approximateElementCount}%.0f fpp=${merged.approximateCurrentFpp}%.2e")
    try {
      merged.unionInPlace(KMBloomSketch(5000L, 0.001))
      println("ERROR: config mismatch NOT rejected")
    } catch {
      case e: IllegalArgumentException => println(s"mismatch rejected: ${e.getMessage.take(100)}")
    }
    val h = HLLSketch()
    (0 until 30000).foreach(i => h.update(s"c${i % 12345}"))
    println(f"HLL distinct est=${h.estimate}%.0f (true 12345)")
    val c = CMSSketch(0.001, 0.01)
    (0 until 9000).foreach(i => c.update(if (i % 3 == 0) "grep" else s"tool$i"))
    println(s"CMS grep count est=${c.estimate("grep")} (true 3000)")
    val t = TDigestSketch()
    val kl = KLLSketch()
    (1 to 100000).foreach { i => t.update(i.toDouble); kl.update(i.toDouble) }
    println(f"tdigest p99=${t.quantile(0.99)}%.0f kll p99=${kl.quantile(0.99)}%.0f (true 99000)")
    // injected hash pairs: build+probe each registered pair through the
    // codec (the KMBloomFilter<H1,H2> surface)
    for (pair <- KMHashPair.registered) {
      val f = KMBloomSketch(10000L, 0.001, pair)
      (0 until 10000).foreach(i => f.insert(s"k$i"))
      val back = SketchCodec.decodeBloom(SketchCodec.encodeBloom(f))
      val fn = (0 until 10000).count(i => !back.mightContain(s"k$i"))
      val fp = (10000 until 20000).count(i => back.mightContain(s"k$i"))
      println(s"pair ${pair.name}: fn=$fn (expect 0) fp=$fp/10000 (expect ~10)")
    }
    val mg = MGSketch(8)
    (0 until 9000).foreach(i => mg.update(if (i % 3 == 0) "grep" else s"tool${i % 40}"))
    println(s"MG grep est=${mg.estimate("grep")} (true 3000, undercount<=${mg.decrementTotal})")
    val ta = ThetaSketch()
    val tb = ThetaSketch()
    (0 until 60000).foreach(i => ta.updateHash(Hashing.xxHash64Long(i.toLong, 0L)))
    (40000 until 100000).foreach(i => tb.updateHash(Hashing.xxHash64Long(i.toLong, 0L)))
    println(f"theta |A∪B|=${SketchCodec.decodeTheta(SketchCodec.encodeTheta(ta)).mergeInPlace(tb).estimate}%.0f (true 100000) " +
      f"|A∩B|=${ta.intersect(tb).estimate}%.0f (true 20000) |A∖B|=${ta.difference(tb).estimate}%.0f (true 40000)")
    // sparse Bloom codec (round 5): the windowed-streaming-state shape —
    // capacity-100k filter per (window, tool) state row, a few hundred
    // inserts each. Dense ships the full m bits regardless of fill.
    for (fill <- Seq(100, 500, 5000)) {
      val sb = KMBloomSketch(100000L, 0.001)
      (0 until fill).foreach(i => sb.insert(s"conv-$i"))
      val blob = SketchCodec.encodeBloom(sb)
      val dense = 6L + 3 + 16 + 4 + 8 + 8L * sb.bits.words.length
      val back = SketchCodec.decodeBloom(blob)
      require(back.bits == sb.bits, "sparse Bloom roundtrip")
      println(f"sparse Bloom cap=100k fill=$fill%5d: v${blob(5)} ${blob.length}%7d B " +
        f"vs dense $dense%7d B (${dense.toDouble / blob.length}%6.1f x smaller)")
    }
    // weighted bottom-k (round 5): A-ES race keys, 9:1 weights → ~9:1
    // inclusion at k ≪ n; selection deterministic (no RNG)
    val wbk = WeightedBottomKSketch(500)
    (0 until 5000).foreach(i => wbk.update(s"doc-$i".getBytes("UTF-8"),
      if (i % 2 == 0) 9.0 else 1.0))
    val wHeavy = SketchCodec.decodeWeightedBottomK(SketchCodec.encodeWeightedBottomK(wbk))
      .sample.count(kb => new String(kb).stripPrefix("doc-").toInt % 2 == 0)
    println(s"weighted bottom-k k=500 of n=5000, weights 9:1 -> heavy share $wHeavy/500 (expect ~450, uniform would be ~250)")
  }
}
