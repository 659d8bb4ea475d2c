package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The two remaining scale mechanisms made visible: AQE splitting a
  * skewed join at runtime, and bucket-directory layout giving partition
  * pruning on probe routing (the "Iceberg-shaped" layout — no Iceberg
  * runtime jar in the offline image, SURVEY §7.4). */
class SkewAndLayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // static conf — must be set before the (suite-shared) session exists;
    // the bucketBy test saves managed tables here
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .appName("graft-skew-test")
    .getOrCreate()

  test("AQE splits a skewed sort-merge join at runtime (skew=true in final plan)") {
    import spark.implicits._
    // hot key: 90% of the left side lands on key 0
    val left = spark.range(0, 400000)
      .select(when($"id" % 10 === 0, $"id" % 1000).otherwise(0L).as("k"),
        concat(lit("payload-"), $"id".cast("string"), lit("x" * 64)).as("pay"))
    val right = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("v"))
    val old = (spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
      val joined = left.join(right, "k")
      // execute THIS DataFrame (count() would build a separate plan) so
      // its AdaptiveSparkPlan finalizes before inspection
      assert(joined.collect().length === 400000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed join:\n${finalPlan.take(1500)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old._1)
      old._2.foreach(spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", _))
      old._3.foreach(spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", _))
    }
  }

  test("bucketBy tables: co-located join plans with NO exchange on either side") {
    // the 100 TB co-location mechanism: both tables bucketed by the join
    // key at write time ⇒ the join consumes the disk layout directly —
    // zero shuffle, the property worth designing storage around
    val t = Transcripts.load(spark, "/root/testdata/sf0.001")
    // external tables with explicit paths: bucket layout lands in /tmp
    // regardless of which suite created the shared session (warehouse
    // dir is a static conf)
    val base = Files.createTempDirectory("graft_bucketed").toString
    t.write.bucketBy(8, "conv_id").sortBy("conv_id")
      .option("path", s"$base/turns")
      .mode("overwrite").saveAsTable("graft_turns_bucketed")
    t.groupBy(col("conv_id")).agg(count(lit(1)).as("n_turns"))
      .write.bucketBy(8, "conv_id").sortBy("conv_id")
      .option("path", s"$base/convs")
      .mode("overwrite").saveAsTable("graft_convs_bucketed")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the layout to matter
      val joined = spark.table("graft_turns_bucketed")
        .join(spark.table("graft_convs_bucketed"), "conv_id")
      assert(joined.count() === t.count())
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over bucketed tables:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffled — co-location lost:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS graft_turns_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_convs_bucketed")
    }
  }

  test("sharded probe routes through the shard table without merging it") {
    import graft.spark.catalyst._
    val dir = Files.createTempDirectory("graft_probe").toString
    val t = Transcripts.load(spark, "/root/testdata/sf0.001").cache()
    val n = t.count()
    graft.pipeline.CheckpointedBuild.run(spark, t, s"$dir/ckpt", 16 * n, 0.001, "spec")
    val probed = graft.pipeline.CheckpointedBuild
      .probeShards(spark, s"$dir/ckpt", t, col("conv_id"), col("turn_idx"))
    // zero FN through the routed path
    assert(probed.count() === n)
    // output schema is the probe rows (no shard/sketch leakage)
    assert(!probed.columns.contains("sketch") && !probed.columns.exists(_.contains("__graft")))
    // the plan must contain NO sketch merge — the filters stay sharded
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("graft_sketch_merge_agg"), s"probe path merged the shards:\n$plan")
    assert(plan.contains("graft_bloom_might_contain"), s"no probe in plan:\n$plan")
    // disjoint keys: FP-bounded, not zero-FN (sanity that routing probes
    // the RIGHT shard — a mis-route would lose inserted keys above, and
    // a saturated/mis-sized shard would blow this bound)
    val fp = graft.pipeline.CheckpointedBuild.probeShards(spark, s"$dir/ckpt",
      t.withColumn("turn_idx", (col("turn_idx") + 1000000).cast("int")),
      col("conv_id"), col("turn_idx")).count()
    assert(fp <= n * 0.001 * 1.05 + 3 * math.sqrt(n * 0.001) + 1, s"routed-probe FPs: $fp")
    t.unpersist()
  }

  test("sharded build over an empty input fails with a meaningful error, not an NPE") {
    import graft.spark.catalyst._
    val empty = spark.range(0)
      .selectExpr("CAST(id AS STRING) AS conv_id", "CAST(id AS INT) AS turn_idx")
    val ex = intercept[Exception] {
      shardedSketchBlobs(empty, 4, col("conv_id"))(
        "sk" -> bloomAggNative(1000L, 0.01)(col("conv_id"), col("turn_idx"))).head
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("empty input produced no sketch")),
      s"unexpected failure: ${messages(ex).mkString(" | ")}")
  }

  test("bucket-directory layout: probe routing prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/transcripts"
    val t = Transcripts.load(spark, "/root/testdata/sf0.001")
      .withColumn("bucket", pmod(xxhash64(col("conv_id")), lit(16L)))
    t.write.partitionBy("bucket").parquet(dir)
    val read = spark.read.parquet(dir)
    // route a probe to one bucket — the scan must prune to that directory
    val probe = read.filter(col("bucket") === 3)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(bucket"),
      s"no partition filter:\n${plan.take(800)}")
    // pruned scan reads strictly fewer files than the full table
    val prunedFiles = probe.select(input_file_name()).distinct().count()
    val allFiles = read.select(input_file_name()).distinct().count()
    assert(prunedFiles < allFiles && prunedFiles >= 1)
    // and the routed rows are exactly that bucket's rows
    assert(probe.count() === t.filter(col("bucket") === 3).count())
  }
}
