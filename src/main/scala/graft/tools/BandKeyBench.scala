package graft.tools

import graft.pipeline.TextPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Before/after microbench for the MinHash band-key step (the dominant
  * map-side cost of q13/q29/q43): the retired Scala UDF (rebuilt here
  * from the reference implementation) vs the native MinhashBandKeys
  * expression, over the sf0.1 shingle relation. Min-of-N interleaved
  * (VM noise — see BENCH.md protocol). Usage:
  *   sbt -batch "runMain graft.tools.BandKeyBench [expandFactor]"
  */
object BandKeyBench {
  def main(args: Array[String]): Unit = {
    val expand = if (args.nonEmpty) args(0).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .appName("graft-bandkey-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // expanded corpus: each doc replicated with a distinct id so the
    // per-row work is identical but the row count scales
    val docs = TextPipeline.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    val expanded = (0 until expand).map(i =>
      docs.select((col("doc_id") * expand + i).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    val sh = TextPipeline.withShingles(expanded, "__sh")
      .select(col("doc_id"), col("__sh")).cache()
    val n = sh.count()

    val bandKeysUdf = udf { (s: Seq[String]) =>
      if (s == null || s.isEmpty) null else TextPipeline.bandKeysOf(s)
    }
    // sink: fold the keys so the whole array materializes but nothing
    // but one long per variant leaves the executors (bit_xor, not sum —
    // ANSI mode would overflow a long sum of hashes)
    def sink(keys: org.apache.spark.sql.Column): Long =
      sh.select(xxhash64(keys).as("h")).agg(expr("bit_xor(h)")).head.getLong(0)

    def time(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val v = f()
      ((System.nanoTime() - t0) / 1e9, v)
    }

    var udfBest = Double.MaxValue
    var natBest = Double.MaxValue
    var udfV = 0L
    var natV = 0L
    for (_ <- 1 to 3) {
      val (tu, vu) = time(() => sink(bandKeysUdf(col("__sh"))))
      val (tn, vn) = time(() => sink(graft.spark.catalyst.minhashBandKeys(col("__sh"))))
      udfBest = math.min(udfBest, tu); udfV = vu
      natBest = math.min(natBest, tn); natV = vn
    }
    require(udfV == natV, s"variants disagree: udf=$udfV native=$natV")
    println(f"""{"bench":"band_keys","rows":$n,"udf_sec":$udfBest%.3f,""" +
      f""""native_sec":$natBest%.3f,"speedup":${udfBest / natBest}%.2f,""" +
      f""""udf_rows_per_sec":${n / udfBest}%.0f,"native_rows_per_sec":${n / natBest}%.0f}""")
    sh.unpersist()

    // ---- SRP band keys (round 5): the dense-embedding sibling — the
    // retired Scala UDF (kept in VectorPipeline as the parity oracle)
    // vs the native SrpBandKeys expression, over the sf0.1 embeddings.
    // 512 float dot products per row dominate either way; the native
    // path removes the boxed Seq[Float] decode and the codegen break.
    val vecs = graft.pipeline.VectorPipeline.embeddings(spark, "/root/testdata/sf0.1")
    val vExpanded = (0 until expand).map(i =>
      vecs.select((col("vec_id") * expand + i).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
      .cache()
    val vn2 = vExpanded.count()
    def vSink(keys: org.apache.spark.sql.Column): Long =
      vExpanded.select(xxhash64(keys).as("h")).agg(expr("bit_xor(h)")).head.getLong(0)
    var sUdfBest = Double.MaxValue
    var sNatBest = Double.MaxValue
    var sUdfV = 0L
    var sNatV = 0L
    for (_ <- 1 to 3) {
      val (tu, vu) = time(() =>
        vSink(graft.pipeline.VectorPipeline.srpBandKeysUdf(col("embedding"))))
      val (tn, vv) = time(() =>
        vSink(graft.spark.catalyst.srpBandKeysNative(col("embedding"))))
      sUdfBest = math.min(sUdfBest, tu); sUdfV = vu
      sNatBest = math.min(sNatBest, tn); sNatV = vv
    }
    require(sUdfV == sNatV, s"SRP variants disagree: udf=$sUdfV native=$sNatV")
    println(f"""{"bench":"srp_band_keys","rows":$vn2,"udf_sec":$sUdfBest%.3f,""" +
      f""""native_sec":$sNatBest%.3f,"speedup":${sUdfBest / sNatBest}%.2f,""" +
      f""""udf_rows_per_sec":${vn2 / sUdfBest}%.0f,"native_rows_per_sec":${vn2 / sNatBest}%.0f}""")
    spark.stop()
  }
}
