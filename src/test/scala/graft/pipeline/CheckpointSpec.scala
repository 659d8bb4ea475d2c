package graft.pipeline

import graft.core.SketchCodec
import graft.spark.Transcripts
import graft.spark.catalyst._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** North-rule checkpoint/resume: a job killed halfway resumes from the
  * per-shard checkpoint, builds ONLY the missing shards, and the final
  * merged sketch equals an uninterrupted bulk build bit-for-bit. */
class CheckpointSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-ckpt-test")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("interrupted build resumes: missing shards only, final == bulk") {
    val dir = Files.createTempDirectory("graft_ckpt").toString + "/ckpt"
    val t = Transcripts.load(spark, sf).cache()
    val n = t.count()
    val cap = math.max(n, 1000L)

    // simulate a failure: first run only sees half the shards' data
    val half = t.withColumn("shard", pmod(xxhash64(col("conv_id")), lit(CheckpointedBuild.NumShards.toLong)))
      .filter(col("shard") < CheckpointedBuild.NumShards / 2).drop("shard")
    val (built1, total1) = CheckpointedBuild.run(spark, half, dir, cap, 0.001, "run1")
    assert(built1 > 0 && total1 == built1)

    // resume over the FULL input: only the missing shards get built
    val (built2, total2) = CheckpointedBuild.run(spark, t, dir, cap, 0.001, "run2")
    assert(built2 > 0, "resume built nothing")
    assert(total2 > total1, "resume did not extend coverage")
    // run2 must not have rebuilt run1's shards
    val byRun = spark.read.parquet(dir).groupBy(col("run_id"))
      .agg(countDistinct(col("shard")).as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRun("run1") + byRun("run2") == total2, "a shard was built twice")

    // final merged filter == uninterrupted bulk build (per-shard configs
    // are identical, union is exact — north rule merge ≡ bulk insertion)
    val fin = CheckpointedBuild.finalSketch(spark, dir)
    val zeroFn = t.filter(bloomMightContainNative(
      lit(SketchCodec.encodeBloom(fin, SketchCodec.KeyMode.RowHash)),
      col("conv_id"), col("turn_idx"))).count() == n
    assert(zeroFn, "final sketch lost keys")

    // third run: everything done, nothing rebuilt
    val (built3, total3) = CheckpointedBuild.run(spark, t, dir, cap, 0.001, "run3")
    assert(built3 == 0 && total3 == total2)

    // lineage: per-shard rows sum to the table size; fingerprints present
    val lin = CheckpointedBuild.lineage(spark, dir)
    assert(lin.agg(sum(col("input_rows"))).head.getLong(0) == n)
    assert(lin.filter(col("input_fingerprint").isNull).count() == 0)
    assert(lin.filter(col("popcount") <= 0).count() == 0)

    // staleness detector: unchanged input → no stale shards; perturbed
    // input → the affected shard flagged
    assert(CheckpointedBuild.staleShards(spark, t, dir).count() == 0)
    val perturbed = t.limit(1).withColumn("turn_idx", col("turn_idx") + 999)
      .unionByName(t.except(t.limit(1)))
    assert(CheckpointedBuild.staleShards(spark, perturbed, dir).count() >= 1)

    // the rest of the per-shard family survives resume: the merged
    // HLL/theta over the interrupted+resumed checkpoint equal a direct
    // one-shot build over the full input (state-identical merges)
    val (hll, cms, theta) = CheckpointedBuild.finalFamily(spark, dir)
    val direct = t.agg(
      hllAggNative(col("conv_id")).as("h"),
      cmsAggNative(0.001, 0.01)(col("tool")).as("c"),
      thetaAggNative(col("conv_id")).as("th")).head
    assert(hll === SketchCodec.decodeHll(direct.getAs[Array[Byte]]("h")),
      "resumed HLL diverged from one-shot build")
    assert(theta === SketchCodec.decodeTheta(direct.getAs[Array[Byte]]("th")),
      "resumed theta diverged from one-shot build")
    assert(cms.totalCount === n)
    assert(cms === SketchCodec.decodeCms(direct.getAs[Array[Byte]]("c")),
      "resumed CMS diverged from one-shot build")
    t.unpersist()
  }

  test("shard count is a parameter: non-default count builds and probes; mismatch fails fast") {
    val t = Transcripts.load(spark, sf).cache()
    val n = t.count()
    val cap = math.max(n, 1000L)

    // build at TWO different shard counts — the final merged sketch is
    // shard-count-independent (union associativity), and each checkpoint
    // is self-describing
    val blobs = Seq(16, 64).map { shards =>
      val dir = Files.createTempDirectory("graft_ckpt_sc").toString + "/ckpt"
      val (_, total) = CheckpointedBuild.run(spark, t, dir, cap, 0.001, "r", shards)
      assert(total <= shards, s"more shard rows than shards at $shards")
      assert(CheckpointedBuild.checkpointNumShards(spark, dir) == shards)

      // probe routing reads the recorded count: zero false negatives
      val fin = CheckpointedBuild.probeShards(spark, dir, t,
        col("conv_id"), col("turn_idx")).count()
      assert(fin == n, s"probeShards lost keys at numShards=$shards")

      // resuming with a DIFFERENT shard count must fail fast, not
      // silently mis-route the skip filter
      val ex = intercept[IllegalArgumentException] {
        CheckpointedBuild.run(spark, t, dir, cap, 0.001, "r2", shards * 2)
      }
      assert(ex.getMessage.contains("num_shards"))

      SketchCodec.encodeBloom(CheckpointedBuild.finalSketch(spark, dir),
        SketchCodec.KeyMode.RowHash)
    }
    // same capacity, same keys ⇒ per-shard configs derive from capacity/
    // numShards, so the GLOBAL merged filters differ in m — but both must
    // contain every key (the invariant that matters across resharding)
    blobs.foreach { b =>
      val contains = t.filter(bloomMightContainNative(lit(b),
        col("conv_id"), col("turn_idx"))).count()
      assert(contains == n)
    }
    t.unpersist()
  }
}
