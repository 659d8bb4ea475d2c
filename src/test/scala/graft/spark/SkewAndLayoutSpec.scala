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
