package graft.tools

import graft.pipeline.TextPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** N-vs-4N scaling ladder for the training-data dedup pipeline (the
  * same protocol as graft.Bench's sketch-build ladder, on the LSH
  * candidate-generation core used by q13/q29: shingle materialization →
  * 42×3 minhash bands → band self-join → distinct pairs).
  *
  * Corpus: the sf documents table expanded ×E with every word suffixed
  * by the replica id — replicas of a doc share NO shingles, so the
  * expansion scales the WORK linearly instead of quadratically (plain
  * text replication would make every replica an exact/near dup of its
  * source and blow up the pair count by E² — a corpus that misstates
  * how the join scales).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_DEDUP_EXPAND=10
  *        sbt "runMain graft.tools.DedupBench"
  * Prints one JSON line: per-level secs + docs/sec + N→4N efficiency.
  */
object DedupBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-dedup-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // partition by DATA VOLUME, not core count: the band self-join at
      // 500k docs measures 70s with 32 partitions on local[32] (per-task
      // hash maps spill) vs 4.8s with 128 — start high, let AQE coalesce
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "128")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def candidateJob(spark: SparkSession, inputPath: String): Double = {
    val docs = spark.read.parquet(inputPath)
    val t0 = System.nanoTime()
    docs.sparkSession.sparkContext.setJobDescription("minhash-candidates")
    val n = TextPipeline.minhashCandidates(docs).count()
    require(n >= 0)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val expand = sys.env.getOrElse("SPARK_GRAFT_DEDUP_EXPAND", "10").toInt
    val levels = Seq(4, 8, 16, 32)

    val benchInput = "/tmp/graft_dedup_input.parquet"
    var spark = session(32)
    val base = TextPipeline.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val nBase = base.count()
    base.crossJoin(spark.range(0, expand).toDF("rep"))
      .select(
        (col("doc_id") * expand + col("rep")).as("doc_id"),
        // suffix every word with the replica id: replicas share no
        // shingles, so work scales linearly with E
        concat_ws(" ", transform(split(col("text"), " "),
          x => concat(x, lit("r"), col("rep")))).as("text"))
      .repartition(64)
      .write.mode("overwrite").parquet(benchInput)
    val nDocs = nBase * expand
    spark.stop()

    val rounds = 3 // min-of-3: this shared VM's ambient swings survive min-of-2
    val samples = scala.collection.mutable.Map.empty[Int, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to rounds; cpus <- levels) {
      spark = session(cpus)
      candidateJob(spark, benchInput) // warm-up (JIT, codegen caches)
      samples(cpus) ::= candidateJob(spark, benchInput)
      spark.stop()
    }
    val secs = levels.map(c => c -> samples(c).min).toMap
    def eff(lo: Int, hi: Int): Double =
      (nDocs / secs(hi)) / ((hi.toDouble / lo) * (nDocs / secs(lo)))
    val levelJson = levels.map { c =>
      f""""local_$c":{"secs":${secs(c)}%.3f,"docs_per_sec":${nDocs / secs(c)}%.0f}"""
    }.mkString(",")
    println(
      f"""{"metric":"minhash-LSH candidate generation","docs":$nDocs,$levelJson,""" +
        f""""eff_4_to_16":${eff(4, 16)}%.3f,"eff_8_to_32":${eff(8, 32)}%.3f}""")
  }
}
