package graft.spark

import graft.core._
import graft.spark.catalyst._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-stage (salted) aggregation: stage-1 sketches per (key, salt),
  * stage-2 sketchMergeAgg per key — must equal a direct one-stage build
  * (bit-identical for Bloom/HLL/CMS, bound-level for t-digest/KLL). */
class SketchMergeAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-merge-test")
    .getOrCreate()

  test("two-stage salted HLL/Bloom/CMS == direct build, state-identical") {
    import spark.implicits._
    val df = (0 until 40000).map(i => (s"g${i % 3}", s"item-$i", i)).toDF("g", "k", "i")
    val twoStage = df
      .groupBy($"g", saltBucket(16, $"i").as("salt"))
      .agg(hllAggNative($"k").as("h"),
        bloomAggNative(20000L, 0.001)($"k").as("b"),
        cmsAggNative(0.01, 0.01)($"k").as("c"))
      .groupBy($"g")
      .agg(sketchMergeAgg($"h").as("h"), sketchMergeAgg($"b").as("b"),
        sketchMergeAgg($"c").as("c"))
    val direct = df.groupBy($"g")
      .agg(hllAggNative($"k").as("h"),
        bloomAggNative(20000L, 0.001)($"k").as("b"),
        cmsAggNative(0.01, 0.01)($"k").as("c"))
    val ts = twoStage.collect().map(r => r.getString(0) -> r).toMap
    direct.collect().foreach { r =>
      val g = r.getString(0)
      assert(SketchCodec.decodeHll(ts(g).getAs[Array[Byte]]("h")) ===
        SketchCodec.decodeHll(r.getAs[Array[Byte]]("h")), s"HLL differs for $g")
      assert(SketchCodec.decodeBloom(ts(g).getAs[Array[Byte]]("b")) ===
        SketchCodec.decodeBloom(r.getAs[Array[Byte]]("b")), s"Bloom differs for $g")
      assert(SketchCodec.decodeCms(ts(g).getAs[Array[Byte]]("c")) ===
        SketchCodec.decodeCms(r.getAs[Array[Byte]]("c")), s"CMS differs for $g")
      // key convention preserved through the merge
      assert(SketchCodec.bloomKeyMode(ts(g).getAs[Array[Byte]]("b")) ===
        SketchCodec.KeyMode.RowHash)
    }
  }

  test("two-stage quantile sketches stay within bound") {
    import spark.implicits._
    val rnd = new scala.util.Random(3L)
    val vals = Array.fill(60000)(rnd.nextDouble() * 100)
    val sorted = vals.sorted
    def rankOf(x: Double): Double = {
      var lo = 0; var hi = sorted.length
      while (lo < hi) { val m = (lo + hi) / 2; if (sorted(m) <= x) lo = m + 1 else hi = m }
      lo.toDouble / sorted.length
    }
    val df = vals.zipWithIndex.map { case (v, i) => (v, i) }.toSeq.toDF("v", "i")
    val merged = df.groupBy(saltBucket(16, $"i").as("salt"))
      .agg(tdigestAggNative($"v").as("t"), kllAggNative($"v").as("k"))
      .agg(sketchMergeAgg($"t").as("t"), sketchMergeAgg($"k").as("k")).head
    val td = SketchCodec.decodeTDigest(merged.getAs[Array[Byte]]("t"))
    val kll = SketchCodec.decodeKll(merged.getAs[Array[Byte]]("k"))
    for (q <- Seq(0.5, 0.95, 0.99)) {
      assert(math.abs(rankOf(td.quantile(q)) - q) <= 0.02, s"tdigest q=$q")
      assert(math.abs(rankOf(kll.quantile(q)) - q) <= 3 * kll.normalizedRankError, s"kll q=$q")
    }
    assert(kll.count === 60000L)
  }

  test("merge agg rejects mixed sketch types and empty input yields null") {
    import spark.implicits._
    val df = (0 until 100).map(i => s"k$i").toDF("k")
    val hll = df.agg(hllAggNative($"k")).head.getAs[Array[Byte]](0)
    val bloom = df.agg(bloomAggNative(100L, 0.01)($"k")).head.getAs[Array[Byte]](0)
    val e = intercept[Exception](
      Seq(hll, bloom).toDF("s").agg(sketchMergeAgg($"s")).collect())
    assert(e != null)
    val empty = spark.emptyDataFrame.select(lit(Array.emptyByteArray).as("s")).limit(0)
    val out = Seq.empty[Array[Byte]].toDF("s").agg(sketchMergeAgg($"s")).head
    assert(out.isNullAt(0))
  }

  test("SQL: per-shard blobs rolled up with graft_sketch_merge_agg") {
    GraftExtensions.register(spark)
    import spark.implicits._
    (0 until 10000).map(i => (i % 32, s"u${i % 2000}")).toDF("shard", "k")
      .createOrReplaceTempView("rows_v")
    val got = spark.sql(
      """SELECT graft_sketch_merge_agg(s) FROM
        |(SELECT shard, graft_hll_agg(k) AS s FROM rows_v GROUP BY shard)""".stripMargin)
      .head.getAs[Array[Byte]](0)
    assert(math.abs(SketchCodec.decodeHll(got).estimate - 2000) <= 60)
  }
}
