package graft.tools

import graft.pipeline.{LshIndex, TextPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The incremental-dedup claim, measured (the BENCH.md "LSH index"
  * section): deduping a new ingest batch (1/(E+1) of the corpus) against
  * an already-indexed corpus via the persisted band index, vs the
  * from-scratch `minhashCandidates(corpus ∪ batch)` a pipeline without
  * the index is condemned to re-run per ingest. Candidate sets verified
  * equal before anything is timed.
  *
  * Corpus: the DedupBench expansion (×E, replica-suffixed words so work
  * scales linearly); the batch is one extra replica — the daily-ingest
  * shape where Δ ≈ corpus/E.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_LSH_EXPAND=8
  *        sbt "runMain graft.tools.LshIndexBench"
  * Prints one JSON line: build secs (one-time), probe secs (per-ingest),
  * from-scratch secs (per-ingest without the index), speedup.
  */
object LshIndexBench {

  private val IdStride = 1000000L

  private def expanded(spark: SparkSession, sfDir: String, e: Int) = {
    val docs = TextPipeline.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    docs.crossJoin(spark.range(0, e).toDF("rep"))
      .select((col("doc_id") + col("rep") * IdStride).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(w, lit("_"), col("rep")))).as("text"))
  }

  /** The ingest batch: replica-0 TEXTS under fresh doc ids — every batch
    * doc is an exact dup of its corpus counterpart, so the probe join
    * exercises real match traffic (a batch sharing no shingles with the
    * corpus would make the probe artificially output-free). */
  private def ingestBatch(spark: SparkSession, sfDir: String, e: Int) =
    TextPipeline.documents(spark, sfDir)
      .select((col("doc_id") + lit(e * IdStride)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(w, lit("_0")))).as("text"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = sys.env.getOrElse("SPARK_GRAFT_LSH_EXPAND", "8").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-lsh-index-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "128")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpusPath = "/dev/shm/graft-spark/lsh_bench_corpus"
    val batchPath = "/dev/shm/graft-spark/lsh_bench_batch"
    val indexPath = "/dev/shm/graft-spark/lsh_bench_index"
    expanded(spark, sfDir, e).write.mode("overwrite").parquet(corpusPath)
    ingestBatch(spark, sfDir, e).write.mode("overwrite").parquet(batchPath)
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

    // one-time index build over the corpus
    val (buildSecs, _) = timed("lsh-index-build") {
      LshIndex.write(corpus, indexPath); 0L
    }

    // per-ingest WITH the index: batch signatures + pruned band join
    val (probeSecs, nViaIndex) = timed("lsh-index-probe") {
      LshIndex.probeCandidates(spark, indexPath, batch).count()
    }

    // per-ingest WITHOUT the index: re-shingle + re-minhash the union
    val isNew = (c: org.apache.spark.sql.Column) => c >= e * IdStride
    val (scratchSecs, nScratch) = timed("lsh-from-scratch") {
      TextPipeline.minhashCandidates(corpus.unionByName(batch))
        .filter(isNew(col("doc_a")) =!= isNew(col("doc_b")))
        .count()
    }
    require(nViaIndex == nScratch,
      s"candidate sets disagree: index $nViaIndex vs scratch $nScratch")

    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val indexBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(indexPath)).getLength

    println(s"""{"bench":"lsh-index-incremental-dedup","expand":$e,""" +
      s""""corpus_docs":$nCorpus,"batch_docs":$nBatch,""" +
      s""""build_secs":$buildSecs,"probe_secs":$probeSecs,""" +
      s""""scratch_secs":$scratchSecs,""" +
      s""""speedup":${scratchSecs / probeSecs},""" +
      s""""cross_candidates":$nViaIndex,"index_bytes":$indexBytes}""")
    fs.delete(new org.apache.hadoop.fs.Path(corpusPath), true)
    fs.delete(new org.apache.hadoop.fs.Path(batchPath), true)
    fs.delete(new org.apache.hadoop.fs.Path(indexPath), true)
    spark.stop()
  }
}
