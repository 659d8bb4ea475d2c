package graft.tools

import graft.pipeline.VectorPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Codebook machinery past toy k (round-4 evidence for BENCH.md):
  *   1. CosineArgmax assignment throughput at k ∈ {16, 256, 1024} over
  *      1M vectors (the flat per-row scan's vecs/sec curve — where a
  *      blocked/hierarchical successor would take over);
  *   2. trainedCodebookDistributed wall time at the same k;
  *   3. recall@10 of the k=64 distributed codebook on sf0.01/sf0.1 at
  *      proportional probe depths (the CodebookSpec gate's source).
  */
object CodebookBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = VectorPipeline.embeddings(spark, "/root/testdata/sf0.1").cache()
    val nEmb = emb.count()

    // 1M-vector corpus for the assignment curve
    val reps = 500
    val big = emb.crossJoin(spark.range(0, reps.toLong).toDF("rep"))
      .select((col("vec_id") * reps + col("rep")).as("vec_id"), col("embedding"))
      .cache()
    val n = big.count()

    // k = 4096 joins the curve in round 5: the training loop now routes
    // its per-iteration assignment through the two-level assigner above
    // twoLevelTrainK (default 512), so train time should grow SUBLINEARLY
    // in k past that point (per-row cost O((√k + 8·k/√k)·dim), not
    // O(k·dim)). The flat 1M-row assignment column stays k ≤ 1024 (at
    // 4096 the flat scan is exactly what the two-level path retires —
    // its entry below measures the production assignment instead).
    println("bench,k,secs,vecs_per_sec")
    for (k <- Seq(16, 256, 1024, 4096)) {
      val t0 = System.nanoTime()
      val book = VectorPipeline.trainedCodebookDistributed(emb, k,
        sampleN = 1 << 15, iters = 10)
      book.cache().count()
      val tTrain = (System.nanoTime() - t0) / 1e9
      println(f"train_distributed,$k,$tTrain%.2f,")
      if (k <= 1024) {
        def once(): Double = {
          val t = System.nanoTime()
          VectorPipeline.ivfAssign(big, book).agg(sum(col("centroid_id"))).collect()
          (System.nanoTime() - t) / 1e9
        }
        once() // warm
        val tAssign = (1 to 3).map(_ => once()).min
        println(f"assign_argmax,$k,$tAssign%.2f,${n / tAssign}%.0f")
      } else {
        val ck = math.ceil(math.sqrt(k.toDouble)).toInt
        def once(): Double = {
          val t = System.nanoTime()
          VectorPipeline.ivfAssignTwoLevel(big, book, ck, 8)
            .agg(sum(col("centroid_id"))).collect()
          (System.nanoTime() - t) / 1e9
        }
        once() // warm
        val tAssign = (1 to 3).map(_ => once()).min
        println(f"assign_2l_p8,$k,$tAssign%.2f,${n / tAssign}%.0f")
      }
      book.unpersist()
    }

    // two-level (coarse→fine) assignment vs the flat argmax at k=1024:
    // wall time over the 1M corpus + agreement fraction (the routing
    // approximation the probes parameter buys back)
    {
      val k = 1024
      val book = VectorPipeline.trainedCodebookDistributed(emb, k,
        sampleN = 1 << 15, iters = 10).cache()
      book.count()
      val coarseK = 32
      def onceFlat(): Double = {
        val t = System.nanoTime()
        VectorPipeline.ivfAssign(big, book).agg(sum(col("centroid_id"))).collect()
        (System.nanoTime() - t) / 1e9
      }
      def once2l(p: Int): Double = {
        val t = System.nanoTime()
        VectorPipeline.ivfAssignTwoLevel(big, book, coarseK, p)
          .agg(sum(col("centroid_id"))).collect()
        (System.nanoTime() - t) / 1e9
      }
      onceFlat(); once2l(4) // warm
      val tFlat = (1 to 3).map(_ => onceFlat()).min
      println("bench2l,variant,probes,secs,vecs_per_sec,agreement")
      println(f"bench2l,flat,-,$tFlat%.2f,${n / tFlat}%.0f,1.000")
      for (p <- Seq(2, 4, 8)) {
        val t2l = (1 to 3).map(_ => once2l(p)).min
        val agree = VectorPipeline.ivfAssign(emb, book).as("f")
          .join(VectorPipeline.ivfAssignTwoLevel(emb, book, coarseK, p)
            .select(col("vec_id"), col("centroid_id").as("c2")), "vec_id")
          .agg(avg(when(col("centroid_id") === col("c2"), 1.0).otherwise(0.0)))
          .head.getDouble(0)
        println(f"bench2l,two_level,$p,$t2l%.2f,${n / t2l}%.0f,$agree%.4f")
      }
      book.unpersist()
    }

    // recall of the k=64 distributed codebook at proportional depths
    println("sf,k,nprobe,recall_at_10")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val e = VectorPipeline.embeddings(spark, s"/root/testdata/$sf").cache()
      val queries = e.filter(col("vec_id") < 20)
      val nq = queries.count()
      val bf = VectorPipeline.bruteForceTopK(e, queries, 10)
        .select(col("q_id"), col("n_id")).cache()
      bf.count()
      val book = VectorPipeline.trainedCodebookDistributed(e, 64,
        sampleN = 1 << 15, iters = 10).cache()
      val assigned = VectorPipeline.ivfAssign(e, book).cache()
      val scored = VectorPipeline.ivfScoredCandidates(assigned, book, queries, 32).cache()
      for (nprobe <- Seq(8, 16, 24, 32)) {
        val ivf = VectorPipeline
          .topKFromScored(scored.filter(col("probe_rank") <= nprobe), 10)
          .select(col("q_id"), col("n_id"))
        val recall = bf.join(ivf, Seq("q_id", "n_id")).count().toDouble / (nq * 10)
        println(f"$sf,64,$nprobe,$recall%.3f")
      }
      scored.unpersist(); assigned.unpersist(); book.unpersist(); bf.unpersist(); e.unpersist()
    }
    println(s"n_embeddings_sf01=$nEmb,big_corpus=$n")
    spark.stop()
  }
}
