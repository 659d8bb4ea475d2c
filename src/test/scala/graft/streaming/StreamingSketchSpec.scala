package graft.streaming

import graft.core.SketchCodec
import graft.spark.native._
import graft.spark.Transcripts
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-stream-test")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Stage the transcript table as a multi-file parquet dir so readStream
    * has files to micro-batch over. */
  private def stageStreamInput(): String = {
    val dir = Files.createTempDirectory("graft_stream").toString + "/in"
    Transcripts.load(spark, sf).repartition(8).write.parquet(dir)
    dir
  }

  test("windowed streaming aggregation with native sketches == batch result") {
    val dir = stageStreamInput()
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingSketch.windowedSketches(stream)
      .writeStream.format("memory").queryName("win_sketches")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.sql("SELECT * FROM win_sketches")
    assert(got.count() > 0, "no windows emitted")
    // per-(window, tool) HLL estimates must match exact distinct counts
    // (tiny groups → linear counting is exact)
    val batch = StreamingSketch.windowedSketches(
      spark.read.parquet(dir)).collect()
      .map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(4)).toMap
    got.collect().foreach { r =>
      val est = SketchCodec.decodeHll(r.getAs[Array[Byte]]("hll_convs")).estimate
      val nTurns = r.getAs[Long]("n_turns")
      assert(est > 0 && est <= nTurns + 2)
      assert(batch((r.get(0).toString, r.getString(1))) === nTurns,
        "stream window row count != batch")
    }
    // stream's bloom for one window has zero FN vs the batch rows in it
    val row = got.orderBy(col("n_turns").desc).head
    val bloomBlob = row.getAs[Array[Byte]]("bloom_turns")
    val windowStart = row.getStruct(0).getTimestamp(0)
    val windowEnd = row.getStruct(0).getTimestamp(1)
    val tool = row.getString(1)
    val inWindow = spark.read.parquet(dir)
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .filter(col("tool") === tool && col("ts_utc") >= lit(windowStart)
        && col("ts_utc") < lit(windowEnd))
    val n = inWindow.count()
    val hits = inWindow.filter(
      bloomMightContainNative(lit(bloomBlob), col("conv_id"), col("turn_idx"))).count()
    assert(hits === n, s"streaming bloom lost keys: $hits of $n")
  }

  test("foreachBatch incremental union == one-shot batch build (bit-identical)") {
    val dir = stageStreamInput()
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2") // force multiple micro-batches
      .parquet(dir)
    val batchDf = spark.read.parquet(dir)
    val n = batchDf.count()
    val cap = math.max(n, 1000L)
    val state = new StreamingSketch.IncrementalState
    val q = StreamingSketch.incrementalBloom(stream, cap, state).start()
    try q.awaitTermination(120000) finally if (q.isActive) q.stop()

    val streamed = SketchCodec.decodeBloom(state.get.get)
    val bulk = SketchCodec.decodeBloom(
      batchDf.agg(bloomAggNative(cap, 0.001)(col("conv_id"), col("turn_idx")))
        .head.getAs[Array[Byte]](0))
    assert(streamed === bulk,
      "incremental micro-batch union != bulk batch build (associativity broken)")
  }
}
