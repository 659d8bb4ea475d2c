package graft.tools

import graft.pipeline.{SrpIndex, VectorPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The incremental embedding-dedup claim, measured (the BENCH.md
  * "Persisted SRP embedding index" section): deduping a new ingest
  * batch against an already-indexed corpus via the persisted band
  * index, vs the from-scratch `srpCandidates(corpus ∪ batch)` a
  * pipeline without the index re-runs per ingest — the vector sibling
  * of [[LshIndexBench]]. Candidate sets verified equal before anything
  * is reported.
  *
  * Corpus: the sf embeddings expanded ×E by deterministic per-replica
  * SIGN FLIPS (`x_i · sign(xxhash64(rep, i))`) — replicas are mutually
  * decorrelated (a random axis-sign flip scrambles cosine), so the
  * expansion scales the corpus without planting cross-replica dups.
  * The batch perturbs the replica-0 vectors (±5%, cos ≈ 0.9996) under
  * fresh ids — every batch vector is a near-dup of exactly its
  * replica-0 counterpart, so the probe join carries real match
  * traffic.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_SRP_EXPAND=8
  *        sbt "runMain graft.tools.SrpIndexBench"
  * Prints one JSON line: build secs (one-time), probe secs
  * (per-ingest), from-scratch secs (per-ingest without the index),
  * speedup, index bytes. */
object SrpIndexBench {

  private val IdStride = 1000000L

  private def flipped(spark: SparkSession, sfDir: String, e: Int) = {
    val vecs = VectorPipeline.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    vecs.crossJoin(spark.range(0, e).toDF("rep"))
      .select((col("vec_id") + col("rep") * IdStride).as("vec_id"),
        expr("transform(embedding, (x, i) -> CASE WHEN xxhash64(rep, i) % 2 = 0" +
          " THEN x ELSE -x END)").as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = sys.env.getOrElse("SPARK_GRAFT_SRP_EXPAND", "8").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-srp-index-bench")
      .config("spark.sql.shuffle.partitions", "32")
      // identical Spark settings to LshIndexBench so the two families'
      // speedup numbers in BENCH.md are measured like for like
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "128")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpusPath = "/dev/shm/graft-spark/srp_bench_corpus"
    val batchPath = "/dev/shm/graft-spark/srp_bench_batch"
    val indexPath = "/dev/shm/graft-spark/srp_bench_index"
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RAM-backed tmpfs: delete on EVERY exit path (a failed run must not
    // pin corpus+index bytes in /dev/shm, which shuffle writes share)
    def cleanup(): Unit =
      for (p <- Seq(corpusPath, batchPath, indexPath))
        fs.delete(new org.apache.hadoop.fs.Path(p), true)
    try {
    // the replica id scheme and the isNew boundary both assume source
    // ids below the stride — fail loudly instead of mislabeling rows
    val maxId = VectorPipeline.embeddings(spark, sfDir)
      .agg(max(col("vec_id"))).head.getLong(0)
    require(maxId < IdStride,
      s"source vec_id $maxId >= IdStride $IdStride — replica ids would collide")
    flipped(spark, sfDir, e).write.mode("overwrite").parquet(corpusPath)
    // batch: perturbed replica-0 (rep 0 flips too — same flip both sides)
    VectorPipeline.perturbEmbeddings(
        flipped(spark, sfDir, e).filter(col("vec_id") < IdStride), e * IdStride)
      .write.mode("overwrite").parquet(batchPath)
    val corpus = spark.read.parquet(corpusPath)
    val batch = spark.read.parquet(batchPath)
    val nCorpus = corpus.count()
    val nBatch = batch.count()

    def timed(desc: String)(f: => Long): (Double, Long) = {
      spark.sparkContext.setJobDescription(desc)
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val (buildSecs, _) = timed("srp-index-build") {
      SrpIndex.write(corpus, indexPath); 0L
    }
    val (probeSecs, nViaIndex) = timed("srp-index-probe") {
      SrpIndex.probeCandidates(spark, indexPath, batch).count()
    }
    // per-ingest WITHOUT the index: re-project the whole union
    val isNew = (c: org.apache.spark.sql.Column) => c >= e * IdStride
    val (scratchSecs, nScratch) = timed("srp-from-scratch") {
      VectorPipeline.srpCandidates(corpus.unionByName(batch))
        .filter(isNew(col("id_a")) =!= isNew(col("id_b")))
        .count()
    }
    require(nViaIndex == nScratch,
      s"candidate sets disagree: index $nViaIndex vs scratch $nScratch")

    val indexBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(indexPath)).getLength

    println(s"""{"bench":"srp-index-incremental-dedup","expand":$e,""" +
      s""""corpus_vecs":$nCorpus,"batch_vecs":$nBatch,""" +
      s""""build_secs":$buildSecs,"probe_secs":$probeSecs,""" +
      s""""scratch_secs":$scratchSecs,""" +
      s""""speedup":${scratchSecs / probeSecs},""" +
      s""""cross_candidates":$nViaIndex,"index_bytes":$indexBytes}""")
    } finally {
      cleanup()
      spark.stop()
    }
  }
}
