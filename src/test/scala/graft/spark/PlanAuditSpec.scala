package graft.spark

import graft.spark.catalyst._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the 100 TB properties must be visible in the
  * plan, not just hoped for — pushdown reaches the parquet scan, column
  * pruning holds, dims broadcast, partial aggregation runs below the
  * exchange for the custom aggregates, and SQL registration via
  * SparkSessionExtensions works. */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-plan-test")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push into the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") > 30)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$plan")
  }

  test("bloom probe filter runs inside a WholeStageCodegen span") {
    val t = Transcripts.load(spark, sf)
    val sketch = t.agg(bloomAggNative(10000L, 0.001)(col("conv_id"), col("turn_idx")))
      .head.getAs[Array[Byte]](0)
    val probed = t.filter(bloomMightContainNative(lit(sketch), col("conv_id"), col("turn_idx")))
    // materialize THIS QueryExecution (count() would build a new one):
    // AQE only inserts WSCG stages into the final plan
    probed.collect()
    // the `*(n)` prefix marks a WholeStageCodegen stage; the probe
    // predicate must appear on such a line, not in an interpreted Filter
    val line = planOf(probed).linesIterator
      .find(_.contains("graft_bloom_might_contain"))
      .getOrElse(fail("probe filter not found in plan"))
    assert(line.trim.matches("""^[+\-:\s]*\*\(\d+\) Filter.*"""),
      s"probe filter not codegen'd: $line")
  }

  test("native sketch agg plans as partial ObjectHashAggregate below the exchange") {
    val t = Transcripts.load(spark, sf)
    val df = t.groupBy(col("role")).agg(bloomAggNative(1000L, 0.01)(col("conv_id")))
    val plan = planOf(df)
    val firstAgg = plan.indexOf("ObjectHashAggregate")
    val exchange = plan.indexOf("Exchange hashpartitioning(role")
    assert(firstAgg >= 0 && exchange >= 0, s"missing operators:\n$plan")
    // final agg (listed first) above exchange, partial below — partial
    // aggregation means per-partition insert + one sketch per group
    // crossing the wire, not raw rows
    assert(plan.indexOf("ObjectHashAggregate", exchange) > exchange,
      s"no partial aggregate below the exchange:\n$plan")
  }

  test("sharded global build: repartition-by-shard feeds the grouped agg, " +
      "merge stage sees blobs only (no full-size buffer per input partition)") {
    val t = Transcripts.load(spark, sf)
    val df = shardedSketchBlobs(t.select(col("conv_id"), col("turn_idx")), 8, col("conv_id"))(
      "sk" -> bloomAggNative(1000L, 0.01)(col("conv_id"), col("turn_idx")))
    val plan = planOf(df)
    // the row shuffle is the EXPLICIT repartition (shard count chosen by
    // the caller), not an aggregation ENSURE_REQUIREMENTS exchange — that
    // is what bounds live full-size buffers to the shard count
    val rep = plan.indexOf("REPARTITION_BY_NUM")
    assert(rep >= 0, s"no explicit shard repartition:\n$plan")
    // below the repartition: only the scan/projection — the per-shard
    // grouped aggregate (where full-size buffers live) sits ABOVE it
    val aggBelowRep = plan.indexOf("ObjectHashAggregate", rep)
    assert(aggBelowRep < 0, s"aggregate below the shard repartition:\n$plan")
    // the second stage (sketch_merge_agg) must also plan partial+final,
    // so only merged blobs cross the last exchange
    assert(plan.contains("graft_sketch_merge_agg"), s"no merge stage:\n$plan")
  }

  test("multi-way dim join plans as broadcast, not shuffle join") {
    val q = graft.SparkEntry.queries("q24_region_revenue")
    val plan = planOf(q(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dims fell back to SMJ:\n$plan")
  }

  test("scan of sketch-key projection prunes to exactly the key columns") {
    val df = spark.read.parquet(s"$sf/events.parquet")
      .select(xxhash64(col("user_id")).as("h"))
    assert(planOf(df).contains("ReadSchema: struct<user_id:bigint>"))
  }

  test("SQL surface via SparkSessionExtensions: build, probe, estimate in pure SQL") {
    // test suites share one JVM/session, so register at runtime — the
    // spark.sql.extensions config path injects the identical builders
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf/events.parquet").createOrReplaceTempView("ev")
    val sketch = spark.sql(
      "SELECT graft_bloom_agg(2000, CAST(0.01 AS DOUBLE), user_id, event_type) FROM ev")
      .head.getAs[Array[Byte]](0)
    spark.sql("SELECT * FROM ev").createOrReplaceTempView("ev2")
    val hits = spark.sql(
      s"SELECT count(*) FROM ev WHERE graft_bloom_might_contain(" +
        s"unhex('${sketch.map("%02x".format(_)).mkString}'), user_id, event_type)")
      .head.getLong(0)
    val total = spark.sql("SELECT count(*) FROM ev").head.getLong(0)
    assert(hits === total, "SQL-built sketch lost keys (zero-FN violated)")
    val hll = spark.sql("SELECT graft_hll_agg(user_id) FROM ev").head.getAs[Array[Byte]](0)
    val est = graft.core.SketchCodec.decodeHll(hll).estimate
    val exact = spark.sql("SELECT count(DISTINCT user_id) FROM ev").head.getLong(0)
    assert(math.abs(est - exact) <= 0.05 * exact + 1)
    val q = spark.sql(
      "SELECT graft_cms_estimate(graft_cms_agg(CAST(0.01 AS DOUBLE), CAST(0.01 AS DOUBLE), event_type), 'error') FROM ev")
    assert(q.head.getLong(0) >= 0L)
  }

  test("repetitionSignals is exchange-free: per-row signals never shuffle") {
    // every signal (incl. max_bigram_count via sorted-run fold) depends
    // only on the row's own word array — the plan must contain NO
    // Exchange (an earlier draft paid two corpus-token-count shuffles
    // and a join for the max-bigram column)
    val docs = graft.pipeline.TextPipeline.documents(spark, sf)
    val rep = graft.pipeline.TextPipeline.repetitionSignals(docs)
    rep.collect()
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetitionSignals plan contains a shuffle:\n$plan")
    assert(!plan.contains("Join"), s"repetitionSignals plan contains a join:\n$plan")
  }
}
