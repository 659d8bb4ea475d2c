package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing fingerprints (SIGMOD 2003): kernel properties — rolling-hash
  * correctness, the detection guarantee, density, tie handling — plus the
  * Spark candidate join's coverage and hot-fingerprint cap. */
class WinnowingSpec extends AnyFunSuite {

  import Winnowing._

  private def randAlnum(n: Int, r: scala.util.Random): String = {
    val cs = "abcdefghijklmnopqrstuvwxyz0123456789"
    (0 until n).map(_ => cs(r.nextInt(cs.length))).mkString
  }

  test("normalize keeps ASCII alphanumerics only, case-folds by +32") {
    assert(new String(normalize("Hello, World! 42")) === "helloworld42")
    assert(new String(normalize("  \t\n!@#$ ")) === "")
    assert(new String(normalize("Ünïcödé-ABC")) === "ncdabc") // non-ASCII dropped
  }

  test("rolling k-gram hashes equal direct per-position recomputation") {
    val r = new scala.util.Random(7)
    for (k <- Seq(1, 4, 8)) {
      val cs = randAlnum(200, r).toCharArray
      val rolled = kgramHashes(cs, k)
      assert(rolled.length === cs.length - k + 1)
      for (i <- rolled.indices) {
        val direct = kgramHashes(java.util.Arrays.copyOfRange(cs, i, i + k), k)
        assert(rolled(i) === direct(0), s"k=$k pos=$i")
      }
    }
  }

  test("winnow: every window contributes; rightmost min on ties; dedup by position") {
    // strictly decreasing hashes: every full window selects its right edge
    assert(winnow(Array(9L, 7L, 5L, 3L, 1L), 2).toSet === Set(7L, 5L, 3L, 1L))
    // constant hashes: rightmost-on-ties reselects a NEW position each
    // window, so every position from w-1 on is selected — but all share
    // one value, so the fingerprint set is a single hash
    assert(winnow(Array.fill(10)(42L), 4).toSeq === Seq(42L))
    // shorter than w: single overall minimum
    assert(winnow(Array(5L, 3L, 8L), 8).toSeq === Seq(3L))
    assert(winnow(Array.emptyLongArray, 4).length === 0)
    // unsigned comparison: -1L is u64 max, never the minimum vs small positives
    assert(winnow(Array(-1L, 4L), 2).toSeq === Seq(4L))
  }

  test("winnow worst case: strictly decreasing hashes select EVERY window (density 1/1)") {
    // regression: the selection buffer must size for one NEW position per
    // window, not the 2/(w+1) expected density
    val n = 100
    val dec = Array.tabulate(n)(i => (n - i).toLong)
    val out = winnow(dec, 4)
    assert(out.length === n - 4 + 1) // every full window selects its right edge
    assert(out.toSet === (1L to (n - 3).toLong).toSet)
  }

  test("determinism: identical text yields identical fingerprint sets") {
    val t = randAlnum(500, new scala.util.Random(11))
    assert(fingerprints(t).toSeq === fingerprints(new String(t.toCharArray)).toSeq)
    assert(fingerprints("").length === 0)
    assert(fingerprints("short").length === 0) // < k normalized chars
  }

  test("guarantee: docs sharing a run of >= w+k-1 normalized chars share a fingerprint") {
    val r = new scala.util.Random(13)
    val k = 8; val w = 8
    for (trial <- 1 to 200) {
      val shared = randAlnum(w + k - 1 + r.nextInt(20), r)
      val a = randAlnum(r.nextInt(300), r) + shared + randAlnum(r.nextInt(300), r)
      val b = randAlnum(r.nextInt(300), r) + shared + randAlnum(r.nextInt(300), r)
      val fa = fingerprints(a, k, w).toSet
      val fb = fingerprints(b, k, w).toSet
      assert(fa.intersect(fb).nonEmpty, s"trial $trial: shared run of ${shared.length} undetected")
    }
  }

  test("density converges to ~2/(w+1) on random text") {
    val r = new scala.util.Random(17)
    val w = 8; val k = 8
    val text = randAlnum(200000, r)
    val nf = fingerprints(text, k, w).length.toDouble
    val ng = kgramCount(text, k).toDouble
    val density = nf / ng
    assert(density > 2.0 / (w + 1) * 0.8 && density < 2.0 / (w + 1) * 1.2,
      s"density $density vs expected ${2.0 / (w + 1)}")
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-winnow-test")
    .getOrCreate()

  test("candidates covers planted near-dups; guaranteedPairs agrees with winnow coverage") {
    import spark.implicits._
    val r = new scala.util.Random(19)
    def words(n: Int) = (0 until n).map(_ => randAlnum(3 + r.nextInt(6), r)).mkString(" ")
    val sharedSpan = words(30)
    val docs = Seq(
      (1L, words(50) + " " + sharedSpan),
      (2L, sharedSpan + " " + words(40)),
      (3L, words(60)),
      (4L, words(60))
    ).toDF("doc_id", "text")
    val cand = candidates(docs).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(cand.contains((1L, 2L)))
    val guaranteed = guaranteedPairs(docs).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(guaranteed.contains((1L, 2L)))
    // theorem: guaranteed ⊆ candidates (with no df cap)
    val candAll = candidates(docs, maxDf = Long.MaxValue)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(guaranteed.subsetOf(candAll))
  }

  test("dfCapStats surfaces what the hot-fingerprint cap drops") {
    import spark.implicits._
    val r = new scala.util.Random(23)
    def words(n: Int) = (0 until n).map(_ => randAlnum(3 + r.nextInt(6), r)).mkString(" ")
    // boilerplate span shared by ALL 6 docs (its fingerprints have df=6);
    // a rare span shared by exactly docs 1 and 2
    val boiler = words(30)
    val rare = words(30)
    val docs = (
      Seq((1L, boiler + " " + rare + " " + words(10)),
          (2L, rare + " " + boiler + " " + words(10))) ++
      (3L to 6L).map(i => (i, boiler + " " + words(20)))
    ).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"), fingerprintsUdf()(col("text")).as("fps"))
    // cap at df<=2: boilerplate fingerprints (df=6) are dropped
    val stats = dfCapStats(fps, maxDf = 2).head
    assert(stats.getLong(0) > 0, "the boilerplate fingerprints must register as hot")
    assert(stats.getAs[Long]("n_hot_incidences") === 6 * stats.getLong(0),
      "every hot fingerprint here is shared by exactly the 6 docs")
    // each hot fp with df=6 suppresses C(6,2)=15 pair slots
    assert(stats.getAs[Long]("n_dropped_pair_slots") === stats.getLong(0) * 15)
    // DISTINCT affected docs — the incidence sum counts a doc once per
    // hot fp it touches; the doc count must say 6, not 6·n_hot_fps
    assert(stats.getAs[Long]("n_docs_touching_hot") === 6L)
    // the capped candidate set still finds (1,2) via the rare span, and
    // loses the boilerplate-only pairs the stats account for
    val capped = candidatesFromFps(fps, maxDf = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(capped === Set((1L, 2L)))
    // no cap ⇒ no drops reported, all 15 pairs appear
    val uncapped = dfCapStats(fps, maxDf = Long.MaxValue).head
    assert(uncapped.getLong(0) === 0L &&
      uncapped.getAs[Long]("n_dropped_pair_slots") === 0L &&
      uncapped.getAs[Long]("n_docs_touching_hot") === 0L)
    assert(candidatesFromFps(fps, maxDf = Long.MaxValue).count() === 15L)
  }

  test("degenerate corpus: all-short docs yield empty fingerprints and zero candidates") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, ""), (4L, "!!!???")).toDF("doc_id", "text")
    assert(candidates(docs).count() === 0L)
    assert(guaranteedPairs(docs).count() === 0L)
    val ng = docs.select(kgramCountCol(col("text")).as("ng")).collect().map(_.getInt(0))
    assert(ng.forall(_ === 0))
  }

  test("kgramCountCol (codegen'd) equals the kernel kgramCount") {
    import spark.implicits._
    val r = new scala.util.Random(29)
    val texts = (1 to 50).map(_ => (0 until r.nextInt(6)).map(_ =>
      randAlnum(1 + r.nextInt(12), r) + "!? ").mkString) :+ "" :+ "Ünïcödé, and MORE."
    val df = texts.toDF("text")
    val got = df.select(kgramCountCol(col("text")).as("ng")).collect().map(_.getInt(0))
    val want = texts.map(t => kgramCount(t))
    assert(got.toSeq === want.toSeq)
  }

  test("hot-fingerprint df cap prunes boilerplate pairs") {
    import spark.implicits._
    val r = new scala.util.Random(23)
    def words(n: Int) = (0 until n).map(_ => randAlnum(3 + r.nextInt(6), r)).mkString(" ")
    val boiler = words(20)
    // 10 docs all sharing the same boilerplate span, otherwise unrelated
    val docs = (1L to 10L).map(i => (i, boiler + " " + words(40))).toDF("doc_id", "text")
    val uncapped = candidates(docs, maxDf = Long.MaxValue).count()
    assert(uncapped === 45L) // all 10-choose-2 pairs via the boilerplate
    val capped = candidates(docs, maxDf = 5L).count()
    assert(capped < 45L, s"df cap failed to prune ($capped)")
  }
}
