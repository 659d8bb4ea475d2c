package graft.tools

import graft.core.{Hashing, SketchCodec, WeightedBottomKSketch}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped weighted sampling at scale, measured honestly.
  *
  * ONE-SHOT: the WeightedBottomKSampleAgg sketch path vs the exact
  * window-rank competitor. Spark 4 gives row_number+filter a PARTIAL
  * WindowGroupLimit below the exchange, so for a single mix the two
  * plans ship comparable volume (the run prints both wall time and
  * shuffle-write bytes; the sketch's serialized hashes even compress
  * WORSE than sorted key rows) — a one-shot sample is NOT where the
  * sketch wins, and this bench says so with numbers.
  *
  * INCREMENTAL: where it does win. The blobs are a STORED, MERGEABLE
  * artifact: with per-(stratum, day) blobs on hand, refreshing the mix
  * for a new day scans ONLY that day's rows and folds the stored blobs
  * (`sketchMergeAgg`), while the window plan re-scans and re-ranks the
  * whole corpus every time — the refresh cost ratio approaches the
  * corpus/increment size ratio, unbounded at 100 TB. The refreshed
  * sketch selection is verified equal to the full-corpus window rank
  * before anything is timed.
  *
  * Min-of-N interleaved (VM noise — BENCH.md protocol). Usage:
  *   sbt -batch "runMain graft.tools.SampleBench [expandFactor]"
  */
object SampleBench {
  def main(args: Array[String]): Unit = {
    val expand = if (args.nonEmpty) args(0).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .appName("graft-sample-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = 256
    val nStrata = 64
    // expanded turn relation: distinct keys per replica, stratum and
    // weight PURE FUNCTIONS of the key (the weighted-sample contract)
    val base = graft.spark.Transcripts.load(spark, "/root/testdata/sf0.1")
      .select(col("conv_id"), col("turn_idx"))
    val rows = (0 until expand).map(i =>
      base.select(concat(col("conv_id"), lit(s"r$i|"), col("turn_idx")).as("key")))
      .reduce(_ unionByName _)
      .select(col("key"),
        pmod(xxhash64(col("key")), lit(nStrata)).as("stratum"),
        (pmod(xxhash64(col("key"), lit(7)), lit(9)) + lit(1)).cast("double").as("w"))
      .repartition(64) // the union multiplies partitions; both variants
      .cache()         // must read the same sanely-sized cached input
    val n = rows.count()

    val raceUdf = udf((key: String, w: Double) => WeightedBottomKSketch.raceOf(
      Hashing.xxHash64(key.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0L), w))
    // tie-break on the kernel's RaceKey order (unsigned key hash, via
    // the sign-bit flip), NOT lexicographic key: an exact double race
    // tie between distinct keys at the k boundary would otherwise make
    // the hard parity require below abort on correct code
    val hashOrdUdf = udf((key: String) => Hashing.xxHash64(
      key.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0L) ^ Long.MinValue)

    // one-time parity gate: identical per-stratum selections
    val viaSketch = rows.groupBy(col("stratum"))
      .agg(graft.spark.catalyst.weightedBottomKSampleAgg(k)(col("key"), col("w")).as("sk"))
      .select(col("stratum"),
        explode(graft.spark.functions.weightedSampleStrings(col("sk"))).as("key"))
    val viaWindow = rows
      .withColumn("race", raceUdf(col("key"), col("w")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("stratum")).orderBy(col("race"), hashOrdUdf(col("key")))))
      .filter(col("rk") <= k).select(col("stratum"), col("key"))
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(expr("bit_xor(xxhash64(stratum, key))"), count(lit(1))).head
      (r.getLong(0), r.getLong(1))
    }
    val (s1, c1) = sig(viaSketch)
    val (s2, c2) = sig(viaWindow)
    require(c1 == c2 && s1 == s2,
      s"sketch and window selections differ: ($s1,$c1) vs ($s2,$c2)")
    println("window plan has partial WindowGroupLimit: " +
      viaWindow.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))

    // shuffle-write bytes per variant: wall clock barely separates the
    // two on local[32] (an in-memory "shuffle"), but the bytes are the
    // number that matters on a real cluster — they cross the network
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def timed(f: () => Long): (Double, Long) = {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      f()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus drain (private API in this Spark)
      (secs, shuffleBytes.get)
    }
    var skBest = Double.MaxValue
    var wnBest = Double.MaxValue
    var skBytes = 0L
    var wnBytes = 0L
    for (_ <- 1 to 3) {
      val (ts, bs) = timed(() => viaSketch.count())
      val (tw, bw) = timed(() => viaWindow.count())
      skBest = math.min(skBest, ts); skBytes = bs
      wnBest = math.min(wnBest, tw); wnBytes = bw
    }
    println(f"""{"bench":"weighted_sample_grouped","rows":$n,"strata":$nStrata,"k":$k,""" +
      f""""selected":$c1,"sketch_sec":$skBest%.3f,"window_sec":$wnBest%.3f,""" +
      f""""speedup":${wnBest / skBest}%.2f,"sketch_rows_per_sec":${n / skBest}%.0f,""" +
      f""""sketch_shuffle_mb":${skBytes / 1048576.0}%.2f,"window_shuffle_mb":${wnBytes / 1048576.0}%.2f,""" +
      f""""shuffle_reduction":${wnBytes.toDouble / math.max(1L, skBytes)}%.1f}""")

    // ---- incremental refresh, PRODUCTION SHAPE: the corpus lives on
    // disk partitioned by ingest day; the per-(stratum, day) blob table
    // is a stored artifact. Day 15 arrives: the sketch refresh reads
    // ONLY day=15 (partition-pruned scan, 1/16 of the bytes) plus the
    // tiny blob table and folds; the window competitor re-reads and
    // re-ranks the whole corpus. Both from parquet — no cache effects.
    val nDays = 16
    val corpusDir = "/tmp/graft_sample_corpus.parquet"
    val blobDir = "/tmp/graft_sample_blobs.parquet"
    rows.withColumn("day", pmod(xxhash64(col("key"), lit(13)), lit(nDays)))
      .write.mode("overwrite").partitionBy("day").parquet(corpusDir)
    rows.unpersist()
    val corpus = spark.read.parquet(corpusDir)
    corpus.filter(col("day") < nDays - 1)
      .groupBy(col("stratum"), col("day"))
      .agg(graft.spark.catalyst.weightedBottomKSampleAgg(k)(col("key"), col("w")).as("sk"))
      .select(col("stratum"), col("sk"))
      .write.mode("overwrite").parquet(blobDir) // built once, off the clock
    val refreshed = corpus.filter(col("day") === nDays - 1)
      .groupBy(col("stratum"))
      .agg(graft.spark.catalyst.weightedBottomKSampleAgg(k)(col("key"), col("w")).as("sk"))
      .unionByName(spark.read.parquet(blobDir))
      .groupBy(col("stratum"))
      .agg(graft.spark.catalyst.sketchMergeAgg(col("sk")).as("sk"))
      .select(col("stratum"),
        explode(graft.spark.functions.weightedSampleStrings(col("sk"))).as("key"))
    val fullRerank = corpus
      .withColumn("race", raceUdf(col("key"), col("w")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("stratum")).orderBy(col("race"), col("key"))))
      .filter(col("rk") <= k).select(col("stratum"), col("key"))
    val (s3, c3) = sig(refreshed)
    require(c3 == c1 && s3 == s1,
      s"incremental refresh diverged from the bulk selection: ($s3,$c3) vs ($s1,$c1)")

    var rfBest = Double.MaxValue
    var fullBest = Double.MaxValue
    for (_ <- 1 to 3) {
      rfBest = math.min(rfBest, timed(() => refreshed.count())._1)
      fullBest = math.min(fullBest, timed(() => fullRerank.count())._1)
    }
    val newDayRows = corpus.filter(col("day") === nDays - 1).count()
    println(f"""{"bench":"weighted_sample_incremental","rows":$n,"days":$nDays,""" +
      f""""new_day_rows":$newDayRows,"refresh_sec":$rfBest%.3f,""" +
      f""""full_rerank_sec":$fullBest%.3f,"speedup":${fullBest / rfBest}%.2f}""")
    for (d <- Seq(corpusDir, blobDir)) {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    spark.stop()
  }
}
