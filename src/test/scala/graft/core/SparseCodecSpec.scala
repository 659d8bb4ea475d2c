package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** Sparse HLL/CMS blob encodings — the shuffle/checkpoint size fix for
  * grouped sketch tables at high group cardinality (a 100-distinct group
  * must not ship a 16 KiB dense HLL register file or a ~109 KiB CMS grid
  * through every partial-agg exchange). Pins:
  *   1. lossless round-trip through the sparse layout;
  *   2. CANONICAL encoding — the dense/sparse choice is a function of
  *      logical state only, so any merge tree yields byte-identical
  *      blobs (what q33's bit-identity gate and the state-identity
  *      suites rely on);
  *   3. the size win itself, and that sparse is only chosen when
  *      strictly smaller;
  *   4. old dense (v1) blobs still decode — rolling-upgrade readers;
  *   5. describe() renders sparse blobs.
  */
class SparseCodecSpec extends AnyFunSuite {

  private def hllOf(ids: Range): HLLSketch = {
    val h = HLLSketch()
    ids.foreach(i => h.updateHash(Hashing.xxHash64Long(i.toLong, 99L)))
    h
  }

  private def cmsOf(ids: Range): CMSSketch = {
    val c = CMSSketch(0.01, 0.01)
    ids.foreach(i => c.updateHash(Hashing.xxHash64Long(i.toLong, 99L), 1L + (i % 5)))
    c
  }

  test("sparse HLL round-trips losslessly and keeps the estimate") {
    for (n <- Seq(1, 10, 100, 1000)) {
      val s = hllOf(0 until n)
      val blob = SketchCodec.encodeHll(s)
      assert(blob(5) === 3, s"n=$n should encode sparse")
      val back = SketchCodec.decodeHll(blob)
      assert(back === s, s"n=$n round-trip")
      assert(back.estimate === s.estimate)
    }
    // far past the threshold: dense, still lossless
    val big = hllOf(0 until 200000)
    val blob = SketchCodec.encodeHll(big)
    assert(blob(5) === 1)
    assert(SketchCodec.decodeHll(blob) === big)
  }

  test("sparse CMS round-trips losslessly with counts and total") {
    // (0.01, 0.01) is a d=5 × w=272 grid — 1000 distinct items already
    // saturate it, so only genuinely small groups encode sparse
    for (n <- Seq(1, 10, 100)) {
      val s = cmsOf(0 until n)
      val blob = SketchCodec.encodeCms(s)
      assert(blob(5) === 3, s"n=$n should encode sparse")
      val back = SketchCodec.decodeCms(blob)
      assert(back === s, s"n=$n round-trip")
      assert(back.totalCount === s.totalCount)
      assert(back.estimateHash(Hashing.xxHash64Long(3L, 99L)) ===
        s.estimateHash(Hashing.xxHash64Long(3L, 99L)))
    }
    for (n <- Seq(1000, 20000)) { // grid mostly/fully occupied → dense
      val big = cmsOf(0 until n)
      val blob = SketchCodec.encodeCms(big)
      assert(blob(5) === 1, s"n=$n should encode dense")
      assert(SketchCodec.decodeCms(blob) === big)
    }
  }

  test("encoding is canonical: any merge tree yields byte-identical blobs") {
    // three parts whose pairwise merges straddle the sparse/dense
    // threshold in different intermediate states — the FINAL state is
    // equal, so the bytes must be too
    val parts = Seq(0 until 1500, 1500 until 3000, 1000 until 2000)
    def mergeHll(order: Seq[Int]): Array[Byte] = {
      val acc = hllOf(parts(order.head))
      order.tail.foreach(i => acc.mergeInPlace(hllOf(parts(i))))
      SketchCodec.encodeHll(acc)
    }
    val o1 = mergeHll(Seq(0, 1, 2))
    val o2 = mergeHll(Seq(2, 0, 1))
    val o3 = mergeHll(Seq(1, 2, 0))
    assert(java.util.Arrays.equals(o1, o2) && java.util.Arrays.equals(o2, o3))

    // CMS merge ADDS counts, so different part sets would differ — use
    // permutations of the same parts (disjoint id ranges)
    val cparts = Seq(0 until 300, 300 until 600, 600 until 900)
    def mergeCms(order: Seq[Int]): Array[Byte] = {
      val acc = cmsOf(cparts(order.head))
      order.tail.foreach(i => acc.mergeInPlace(cmsOf(cparts(i))))
      SketchCodec.encodeCms(acc)
    }
    val c1 = mergeCms(Seq(0, 1, 2))
    val c2 = mergeCms(Seq(2, 0, 1))
    assert(java.util.Arrays.equals(c1, c2))
  }

  test("sparse is chosen exactly when strictly smaller, and wins big on small groups") {
    // HLL: a 100-distinct group is ~16 KiB dense; sparse must be < 1 KiB
    val small = SketchCodec.encodeHll(hllOf(0 until 100))
    assert(small.length < 1024, s"100-distinct HLL blob is ${small.length} B")
    val dense = SketchCodec.encodeHll(hllOf(0 until 200000))
    assert(dense.length === 6 + 4 + (1 << HLLSketch.DefaultP))
    // sparse blob is always strictly smaller than the dense layout would be
    for (n <- Seq(1, 50, 500, 3000)) {
      val blob = SketchCodec.encodeHll(hllOf(0 until n))
      if (blob(5) == 3) assert(blob.length < 6 + 4 + (1 << HLLSketch.DefaultP))
    }
    // CMS at production width (ε=0.001 ⇒ w=2719, d=5 ⇒ ~109 KB dense):
    // a 100-distinct group must encode at least 10× smaller
    val c = new CMSSketch(5, 2719, new Array[Long](5 * 2719), 0L)
    (0 until 100).foreach(i => c.updateHash(Hashing.xxHash64Long(i.toLong, 99L), 1L))
    val cblob = SketchCodec.encodeCms(c)
    val cdense = 6 + 1 + 4 + 4 + 8 + 8 * c.counters.length
    assert(cblob.length < cdense / 10,
      s"100-distinct CMS blob is ${cblob.length} B vs $cdense dense")
    assert(SketchCodec.decodeCms(cblob) === c)
  }

  test("property: random merge trees over random partitions encode identically") {
    // the canonical-encoding claim, property-style: split an id range
    // into random parts, merge them in a random binary tree, encode —
    // every tree of the same parts must yield the same bytes, and the
    // result must equal the bulk build
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 25) {
      val n = 1 + rnd.nextInt(6000) // spans sparse AND dense regimes
      val nParts = 2 + rnd.nextInt(6)
      val cuts = (Seq(0, n) ++ Seq.fill(nParts - 1)(rnd.nextInt(n + 1))).sorted
      val parts = cuts.zip(cuts.tail).map { case (a, b) => a until b }
      def mergeTree(ps: Seq[Range]): HLLSketch =
        if (ps.size == 1) hllOf(ps.head)
        else {
          val split = 1 + rnd.nextInt(ps.size - 1)
          mergeTree(ps.take(split)).mergeInPlace(mergeTree(ps.drop(split)))
        }
      val t1 = SketchCodec.encodeHll(mergeTree(rnd.shuffle(parts)))
      val t2 = SketchCodec.encodeHll(mergeTree(rnd.shuffle(parts)))
      val bulk = SketchCodec.encodeHll(hllOf(0 until n))
      assert(java.util.Arrays.equals(t1, t2) && java.util.Arrays.equals(t1, bulk),
        s"trial $trial (n=$n, parts=${parts.map(_.length)}) produced diverging bytes")

      // CMS twin (its merge ADDS counts, so the parts are disjoint by
      // construction here and any tree over them sums to the bulk state)
      def mergeCmsTree(ps: Seq[Range]): CMSSketch =
        if (ps.size == 1) cmsOf(ps.head)
        else {
          val split = 1 + rnd.nextInt(ps.size - 1)
          mergeCmsTree(ps.take(split)).mergeInPlace(mergeCmsTree(ps.drop(split)))
        }
      val c1 = SketchCodec.encodeCms(mergeCmsTree(rnd.shuffle(parts)))
      val c2 = SketchCodec.encodeCms(mergeCmsTree(rnd.shuffle(parts)))
      val cBulk = SketchCodec.encodeCms(cmsOf(0 until n))
      assert(java.util.Arrays.equals(c1, c2) && java.util.Arrays.equals(c1, cBulk),
        s"trial $trial CMS (n=$n) produced diverging bytes")
    }
  }

  test("old dense (v1 AND v2) HLL/CMS blobs of ANY occupancy still decode") {
    // synthesize what earlier writers actually emitted for a SMALL
    // sketch: the dense layout stamped v1 (first build) and — crucially
    // — stamped v2 by the build that versioned EVERY type 2 while still
    // writing dense payloads. v2 must decode as DENSE; treating it as
    // sparse would silently misread every HLL/CMS blob that build
    // persisted (checkpoints, sketch-table columns). That is why the
    // sparse layout is v3.
    for (version <- Seq(1.toByte, 2.toByte)) {
      val s = hllOf(0 until 10)
      val bb = ByteBuffer.allocate(6 + 4 + s.registers.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('G'.toByte).put('S'.toByte).put('K'.toByte).put('1'.toByte)
      bb.put(SketchCodec.TypeId.Hll).put(version)
      bb.putInt(s.p).put(s.registers)
      assert(SketchCodec.decodeHll(bb.array()) === s, s"dense HLL v$version")

      val c = cmsOf(0 until 10)
      val cb = ByteBuffer.allocate(6 + 1 + 4 + 4 + 8 + 8 * c.counters.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      cb.put('G'.toByte).put('S'.toByte).put('K'.toByte).put('1'.toByte)
      cb.put(SketchCodec.TypeId.Cms).put(version)
      cb.put(SketchCodec.KeyMode.Bytes).putInt(c.depth).putInt(c.width).putLong(c.totalCount)
      c.counters.foreach(cb.putLong)
      assert(SketchCodec.decodeCms(cb.array()) === c, s"dense CMS v$version")
    }
    // and the OTHER ambiguous-v2 world: a build briefly wrote the SPARSE
    // layout stamped v2 — blob length disambiguates (sparse is only
    // chosen when strictly smaller than dense), so restamping a v3
    // sparse blob as v2 must still decode as sparse
    val sp = hllOf(0 until 10)
    val v2sparse = SketchCodec.encodeHll(sp).clone()
    assert(v2sparse(5) === 3)
    v2sparse(5) = 2
    assert(SketchCodec.decodeHll(v2sparse) === sp, "sparse-layout v2 HLL")
    val cs = cmsOf(0 until 10)
    val v2sparseC = SketchCodec.encodeCms(cs).clone()
    assert(v2sparseC(5) === 3)
    v2sparseC(5) = 2
    assert(SketchCodec.decodeCms(v2sparseC) === cs, "sparse-layout v2 CMS")
  }

  // ---------------------------------------------------- sparse Bloom (r5)
  private def bloomOf(capacity: Long, ids: Range): BloomSketch = {
    val s = KMBloomSketch(capacity, 0.001)
    ids.foreach(i => s.insert(s"key-$i".getBytes("UTF-8")))
    s
  }

  test("sparse Bloom round-trips losslessly at every fill level, probes intact") {
    for (n <- Seq(0, 1, 10, 500, 5000)) {
      val s = bloomOf(100000, 0 until n)
      val blob = SketchCodec.encodeBloom(s)
      assert(blob(5) === 4, s"n=$n of capacity 100k should encode sparse v4")
      val back = SketchCodec.decodeBloom(blob)
      assert(back.bits === s.bits && back.config === s.config, s"n=$n round-trip")
      // zero FN survives the codec
      (0 until n).foreach(i =>
        assert(back.mightContain(s"key-$i".getBytes("UTF-8")), s"FN after roundtrip: $i"))
    }
    // a v3-stamped sparse Bloom (early round-5 builds) still decodes:
    // Bloom never emitted v3 dense, so the byte is unambiguous
    val v3blob = SketchCodec.encodeBloom(bloomOf(100000, 0 until 100)).clone()
    v3blob(5) = 3
    assert(SketchCodec.decodeBloom(v3blob).bits === bloomOf(100000, 0 until 100).bits)
    // filled to capacity: dense (v2), still lossless
    val full = bloomOf(3000, 0 until 3000)
    val blob = SketchCodec.encodeBloom(full)
    assert(blob(5) === 2, "full filter should stay dense v2")
    assert(SketchCodec.decodeBloom(blob).bits === full.bits)
    // keyMode byte survives at its fixed offset in BOTH layouts
    assert(SketchCodec.bloomKeyMode(SketchCodec.encodeBloom(
      bloomOf(100000, 0 until 10), SketchCodec.KeyMode.RowHash)) === SketchCodec.KeyMode.RowHash)
    assert(SketchCodec.bloomKeyMode(SketchCodec.encodeBloom(
      full, SketchCodec.KeyMode.RowHash)) === SketchCodec.KeyMode.RowHash)
  }

  test("sparse Bloom is canonical across merge trees and >=5x smaller when light") {
    // the windowed-streaming-state shape: capacity 100k, a few hundred
    // inserts — dense is ~175 KiB; the sparse blob must be >= 5x smaller
    val light = bloomOf(100000, 0 until 500)
    val blob = SketchCodec.encodeBloom(light)
    val denseSize = 6 + 3 + 16 + 4 + 8 + 8 * light.bits.words.length
    assert(blob.length.toLong * 5 <= denseSize,
      s"500-insert capacity-100k blob is ${blob.length} B vs $denseSize dense")
    // canonical: shard-union in any order == bulk build, byte-identical
    def shard(r: Range): BloomSketch = bloomOf(100000, r)
    val orders = Seq(Seq(0 until 200, 200 until 350, 350 until 500),
      Seq(350 until 500, 0 until 200, 200 until 350))
    val blobs = orders.map { parts =>
      val acc = shard(parts.head)
      parts.tail.foreach(p => acc.unionInPlace(shard(p)))
      SketchCodec.encodeBloom(acc)
    }
    assert(java.util.Arrays.equals(blobs(0), blobs(1)))
    assert(java.util.Arrays.equals(blobs(0), blob), "shard union != bulk bytes")
  }

  test("word-RLE layout: clustered occupancy round-trips (and beats the offset list)") {
    // hashed fills are offset-list territory; RLE is for CLUSTERED bit
    // state (e.g. an intersect of correlated filters). Craft one: 100
    // solid words then tens of thousands of zero words.
    val cfg = BloomConfig(100000, 0.001)
    val bits = BitArray(cfg.totalBits)
    (0L until 6400L).foreach(bits.set(_))
    val s = new KMBloomSketch(cfg, bits, KMHashPair.XxMurmur)
    val blob = SketchCodec.encodeBloom(s)
    assert(blob(5) === 4)
    // layout byte: 6 (header) + variant+keyMode+hasherId (3) + cap (8) +
    // fpp (8) + numBits (8) = offset 33
    assert(blob(33) === 1, s"clustered filter should pick the RLE layout, got ${blob(33)}")
    assert(blob.length < 1200, s"RLE blob is ${blob.length} B") // ~100 words + varints
    val back = SketchCodec.decodeBloom(blob)
    assert(back.bits === s.bits)
  }

  test("describe renders sparse blobs; corrupt sparse blobs fail loudly") {
    val h = hllOf(0 until 50)
    assert(SketchCodec.describe(SketchCodec.encodeHll(h)).contains("HLLSketch"))
    val c = cmsOf(0 until 50)
    assert(SketchCodec.describe(SketchCodec.encodeCms(c)).contains("CMSSketch"))
    // out-of-order sparse entries = corrupt
    val blob = SketchCodec.encodeHll(h)
    // payload starts at 6: p(4) count(4) packed... — swap first two entries
    val bad = blob.clone()
    val t = bad.slice(14, 18)
    Array.copy(bad, 18, bad, 14, 4)
    Array.copy(t, 0, bad, 18, 4)
    intercept[IllegalArgumentException](SketchCodec.decodeHll(bad))
  }
}
