package graft.pipeline

import graft.core.{BloomSketch, CMSSketch, HLLSketch, SketchCodec, ThetaSketch}
import graft.spark.catalyst._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable sharded sketch build with per-shard lineage + metrics
  * (north rule, BASELINE.json; SURVEY §7.7).
  *
  * The unit of checkpointing is the SHARD — a content-deterministic hash
  * bucket of conv_id — not the physical partition, so resume works across
  * different cluster sizes / partition layouts. Each completed shard is a
  * parquet row carrying:
  *   shard, input_rows, sketch (Bloom codec bytes), hll / cms / theta
  *   (the rest of the per-shard family: distinct convs, tool frequencies,
  *   set-algebra cardinality), popcount, element estimate,
  *   input_fingerprint (order-independent XOR of row hashes — detects a
  *   changed input on resume), num_shards (the routing contract — resume
  *   and probe validate against it), run_id, built_at_ms.
  * NOTE: the checkpoint row schema is the resume contract — adding or
  * removing a sketch column is not compatible with checkpoints written by
  * an older build (start a fresh checkpointDir when it changes).
  * Resume = read checkpoint, skip completed shards (a PRUNING FILTER on
  * the scan, so a 90%-done job reads ~10% of the input), build the rest,
  * then fold all shard sketches into the final filter.
  */
object CheckpointedBuild {

  /** Default shard count. The shard count SIZES the build (per-shard
    * capacity, reducer fan-out, resume granularity): 256 fits the test
    * SFs, while BENCH.md's 10^12-turn sizing wants 65,536 — so it is a
    * `run` parameter, recorded in every checkpoint row (`num_shards`),
    * and resume/probe validate against the recorded value instead of
    * trusting the caller (a mismatched shard count would route probes
    * and resume-skips to the WRONG shards silently). */
  val NumShards = 256

  private def shardExpr(numShards: Int) =
    pmod(xxhash64(col("conv_id")), lit(numShards.toLong))

  /** The shard count the checkpoint was built with (its routing
    * contract). Fails fast on a pre-contract checkpoint or a dir mixing
    * shard counts (parquet Append cannot reject the latter itself). */
  def checkpointNumShards(spark: SparkSession, checkpointDir: String): Int =
    numShardsOf(spark.read.parquet(checkpointDir), checkpointDir)

  /** Same check over an already-opened checkpoint frame (callers that
    * just read the dir must not pay a second footer/listing pass — the
    * checkpointDir is HDFS/S3 in deployment). */
  private def numShardsOf(ck: DataFrame, checkpointDir: String): Int = {
    require(ck.schema.fieldNames.contains("num_shards"),
      s"checkpoint at $checkpointDir predates the recorded-shard-count " +
        "contract (no num_shards column) — start a fresh checkpointDir")
    val counts = ck.select(col("num_shards")).distinct().collect().map(_.getInt(0)).sorted
    require(counts.length == 1,
      s"checkpoint at $checkpointDir mixes shard counts ${counts.mkString(",")} " +
        "— it was appended to with different num_shards values and cannot be trusted")
    counts.head
  }

  /** Checkpoint existence via the Hadoop FileSystem API, not java.io.File:
    * SketchBuildJob is a spark-submit entry, so checkpointDir may be an
    * HDFS/S3 path where File.exists() is silently false (which would skip
    * the schema guard and re-build every shard on resume). */
  private def checkpointExists(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  /** One run: builds every shard not already in the checkpoint; returns
    * (newly built shards, total shards done after this run). */
  def run(spark: SparkSession, transcripts: DataFrame, checkpointDir: String,
      capacity: Long, fpp: Double, runId: String,
      numShards: Int = NumShards): (Long, Long) = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val capPerShard = math.max(1000L, capacity / numShards)

    // fail fast on a pre-family-schema checkpoint (parquet Append never
    // validates schemas, and mixed footers make later reads either throw
    // or silently drop the old shards' family columns) and on a shard
    // count differing from the one the checkpoint was built with (resume
    // would then skip/probe the WRONG shards with no error anywhere)
    if (checkpointExists(spark, checkpointDir)) {
      val ck = spark.read.parquet(checkpointDir) // ONE footer/listing pass for both guards
      val existing = ck.schema.fieldNames.toSet
      require(Seq("hll", "cms", "theta").forall(existing.contains),
        s"checkpoint at $checkpointDir predates the per-shard sketch family " +
          "(no hll/cms/theta columns) — start a fresh checkpointDir")
      val recorded = numShardsOf(ck, checkpointDir)
      require(recorded == numShards,
        s"checkpoint at $checkpointDir was built with num_shards=$recorded " +
          s"but this run requested $numShards — resume with the recorded " +
          "count or start a fresh checkpointDir")
    }

    val done: Set[Long] = doneShards(spark, checkpointDir)
    val remaining = transcripts
      .withColumn("shard", shardExpr(numShards))
      .filter(!col("shard").isInCollection(if (done.isEmpty) Seq(-1L) else done.toSeq))

    val t0 = System.currentTimeMillis()
    // one decode per shard blob for BOTH metrics (popcount feeds the
    // element estimate anyway — two UDFs would decode each blob twice)
    val metricsUdf = udf((b: Array[Byte]) => {
      val s = SketchCodec.decodeBloom(b)
      (s.bits.countOnes, s.approximateElementCount)
    })

    val built = remaining
      .repartition(col("shard"))
      .groupBy(col("shard"))
      .agg(
        bloomAggNative(capPerShard, fpp)(col("conv_id"), col("turn_idx")).as("sketch"),
        hllAggNative(col("conv_id")).as("hll"),
        cmsAggNative(0.001, 0.01)(col("tool")).as("cms"),
        thetaAggNative(col("conv_id")).as("theta"),
        count(lit(1)).as("input_rows"),
        // order-independent input fingerprint: XOR of per-row key hashes
        expr("bit_xor(xxhash64(conv_id, turn_idx))").as("input_fingerprint"))
      .withColumn("__m", metricsUdf(col("sketch")))
      .withColumn("popcount", col("__m._1"))
      .withColumn("element_estimate", col("__m._2"))
      .drop("__m")
      .withColumn("num_shards", lit(numShards))
      .withColumn("run_id", lit(runId))
      .withColumn("built_at_ms", lit(t0))

    built.write.mode(SaveMode.Append).parquet(checkpointDir)
    val newly = spark.read.parquet(checkpointDir)
      .filter(col("run_id") === runId).select(col("shard")).distinct().count()
    val total = doneShards(spark, checkpointDir).size.toLong
    (newly, total)
  }

  def doneShards(spark: SparkSession, checkpointDir: String): Set[Long] = {
    if (!checkpointExists(spark, checkpointDir)) return Set.empty
    spark.read.parquet(checkpointDir).select(col("shard")).distinct()
      .collect().map(_.getLong(0)).toSet
  }

  /** Per-shard lineage table (latest record per shard wins on re-runs). */
  def lineage(spark: SparkSession, checkpointDir: String): DataFrame =
    lineageOf(spark.read.parquet(checkpointDir))

  /** Lineage over an already-opened checkpoint frame (one footer/
    * listing pass — see numShardsOf). */
  private def lineageOf(ck: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("built_at_ms").desc, col("run_id").desc)
    ck.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Fold EVERY per-shard sketch into its global counterpart in ONE
    * lineage pass, executor-side via sketch_merge_agg — one small row to
    * the driver, never 65k blobs (a driver-side collect+reduce would pull
    * ~1.8 TB of Bloom state at the 10^12-turn sizing). Reference union
    * semantics: per-shard configs are identical, so merges are legal. */
  def finalSketches(spark: SparkSession, checkpointDir: String)
      : (BloomSketch, HLLSketch, CMSSketch, ThetaSketch) = {
    val r = lineage(spark, checkpointDir).agg(
      sketchMergeAgg(col("sketch")).as("bloom"),
      sketchMergeAgg(col("hll")).as("hll"),
      sketchMergeAgg(col("cms")).as("cms"),
      sketchMergeAgg(col("theta")).as("theta")).head
    require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3),
      s"no shard sketches in $checkpointDir")
    (SketchCodec.decodeBloom(r.getAs[Array[Byte]]("bloom")),
      SketchCodec.decodeHll(r.getAs[Array[Byte]]("hll")),
      SketchCodec.decodeCms(r.getAs[Array[Byte]]("cms")),
      SketchCodec.decodeTheta(r.getAs[Array[Byte]]("theta")))
  }

  def finalSketch(spark: SparkSession, checkpointDir: String): BloomSketch =
    finalSketches(spark, checkpointDir)._1

  def finalFamily(spark: SparkSession, checkpointDir: String): (HLLSketch, CMSSketch, ThetaSketch) = {
    val t = finalSketches(spark, checkpointDir)
    (t._2, t._3, t._4)
  }

  /** Membership probe against the CHECKPOINT's shard table without
    * merging it (catalyst.probeShardTable with this build's shard
    * function): the 10^12-turn query path — the global filter never
    * exists as one object, probes route to their shard's blob. Returns
    * the (conv_id, turn_idx, …) probe rows that might be contained. */
  def probeShards(spark: SparkSession, checkpointDir: String, probes: DataFrame,
      convId: org.apache.spark.sql.Column, turnIdx: org.apache.spark.sql.Column): DataFrame = {
    // shard count comes from the CHECKPOINT (its recorded routing
    // contract), never from a caller argument that could drift from it;
    // ONE open serves both the lineage and the count (the checkpointDir
    // is remote in deployment — no second footer/listing pass)
    val ck = spark.read.parquet(checkpointDir)
    probeShardTable(lineageOf(ck).select(col("shard"), col("sketch")),
      "shard", "sketch", numShardsOf(ck, checkpointDir),
      probes, convId, convId, turnIdx)
  }

  /** Verify the checkpoint against current input: recompute per-shard
    * (rows, fingerprint) and flag shards whose input changed since build. */
  def staleShards(spark: SparkSession, transcripts: DataFrame, checkpointDir: String): DataFrame = {
    val ck = spark.read.parquet(checkpointDir) // one open for count + lineage
    val current = transcripts
      .withColumn("shard", shardExpr(numShardsOf(ck, checkpointDir)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("rows_now"),
        expr("bit_xor(xxhash64(conv_id, turn_idx))").as("fp_now"))
    lineageOf(ck)
      .join(current, Seq("shard"), "full_outer")
      .filter(col("input_rows").isNull || col("rows_now").isNull ||
        col("input_rows") =!= col("rows_now") ||
        col("input_fingerprint") =!= col("fp_now"))
      .select(col("shard"), col("input_rows"), col("rows_now"),
        col("input_fingerprint"), col("fp_now"))
  }
}

/** spark-submit entry:
  *   spark-submit --class graft.pipeline.SketchBuildJob <jar> \
  *     <sfDir> <checkpointDir> <capacity> <fpp> [runId] [numShards]
  * Re-running after a failure resumes from the checkpoint; a resume
  * with a numShards differing from the checkpoint's recorded count
  * fails fast (the count is part of the routing contract). */
object SketchBuildJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: SketchBuildJob <sfDir> <checkpointDir> <capacity> <fpp> [runId] [numShards]")
    val Array(sfDir, ckpt, capS, fppS) = args.take(4)
    val runId = if (args.length > 4) args(4) else java.util.UUID.randomUUID().toString
    val numShards = if (args.length > 5) args(5).toInt else CheckpointedBuild.NumShards
    val builder = SparkSession.builder()
      .appName("graft-sketch-build")
      .config("spark.sql.adaptive.enabled", "true")
      // partition shuffles by data volume, not core count: start high and
      // let AQE coalesce (partitions == cores spills per-task join/agg
      // state once inputs outgrow executor memory — measured 15x on the
      // 500k-doc pair join, see BENCH.md); deployments can still override
      // via --conf
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects spark.master; running the bare main falls back
    // to local mode sized by SPARK_GRAFT_CPUS
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.spark.Transcripts.load(spark, sfDir)
    val (newly, total) = CheckpointedBuild.run(spark, t, ckpt, capS.toLong,
      fppS.toDouble, runId, numShards)
    // ONE lineage pass for all four global sketches, merged executor-side
    val (sketch, hll, cms, theta) = CheckpointedBuild.finalSketches(spark, ckpt)
    // Locale.ROOT: the JSON stdout contract must not follow the JVM's
    // default decimal separator
    def d1(x: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(x))
    println(s"""{"newly_built_shards":$newly,"total_shards":$total,""" +
      s""""final_popcount":${sketch.bits.countOnes},""" +
      s""""final_element_estimate":${sketch.approximateElementCount},""" +
      s""""hll_distinct_convs":${d1(hll.estimate)},""" +
      s""""cms_total":${cms.totalCount},""" +
      s""""theta_distinct_convs":${d1(theta.estimate)}}""")
    spark.stop()
  }
}
