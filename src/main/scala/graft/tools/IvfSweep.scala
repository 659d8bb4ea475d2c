package graft.tools

import graft.pipeline.VectorPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-vs-nprobe sweep for the trained IVF codebook (the q17
  * evidence recorded in BENCH.md): for each testdata SF, trains the
  * deterministic k-means codebook, then prints recall@10 of ivfTopK vs
  * the brute-force baseline at every nprobe, for both the trained and
  * the naive (first-16-by-id) codebook. */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("sf,codebook,nprobe,recall_at_10")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = VectorPipeline.embeddings(spark, s"/root/testdata/$sf").cache()
      val queries = emb.filter(col("vec_id") < 20)
      val nq = queries.count()
      val bf = VectorPipeline.bruteForceTopK(emb, queries, 10)
        .select(col("q_id"), col("n_id")).cache()
      bf.count()
      for ((name, book) <- Seq(
          "trained" -> VectorPipeline.trainedCodebook(emb, 16),
          "naive" -> VectorPipeline.codebook(emb, 16))) {
        val b = book.cache()
        val assigned = VectorPipeline.ivfAssign(emb, b).cache()
        // one scored pass at the deepest probe serves the whole sweep
        val scored = VectorPipeline.ivfScoredCandidates(assigned, b, queries, 16).cache()
        for (nprobe <- Seq(4, 6, 8, 10, 12, 14, 16)) {
          val ivf = VectorPipeline
            .topKFromScored(scored.filter(col("probe_rank") <= nprobe), 10)
            .select(col("q_id"), col("n_id"))
          val recall = bf.join(ivf, Seq("q_id", "n_id")).count().toDouble / (nq * 10)
          println(f"$sf,$name,$nprobe,$recall%.3f")
        }
        scored.unpersist(); assigned.unpersist(); b.unpersist()
      }
      bf.unpersist(); emb.unpersist()
    }

    // write-time assignment throughput (the shuffle-free argmax): the
    // sf0.1 corpus replicated 50x, min of 3 timed passes. Evidence for
    // BENCH.md's ivfAssign before/after entry.
    {
      val emb = VectorPipeline.embeddings(spark, "/root/testdata/sf0.1")
      val big = emb.crossJoin(spark.range(0, 50).toDF("rep"))
        .select((col("vec_id") * 50 + col("rep")).as("vec_id"), col("embedding"))
        .cache()
      val n = big.count()
      val book = VectorPipeline.trainedCodebook(emb, 16).cache()
      book.count()
      def once(): Double = {
        val t0 = System.nanoTime()
        VectorPipeline.ivfAssign(big, book)
          .agg(sum(col("centroid_id"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val secs = (1 to 3).map(_ => once()).min
      println(f"assign_bench,n_vectors=$n,secs=$secs%.3f,vecs_per_sec=${n / secs}%.0f")
      big.unpersist(); book.unpersist()
    }
    spark.stop()
  }
}
