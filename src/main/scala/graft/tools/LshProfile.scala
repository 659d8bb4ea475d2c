package graft.tools

import graft.pipeline.{LshIndex, TextPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q55's stages (not part of the contract). */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val d = TextPipeline.documents(spark, s"/root/testdata/$sf")
      .select(col("doc_id"), col("text"))
    val corpus = d.filter(col("doc_id") % 3 =!= 0).cache()
    val batch = d.filter(col("doc_id") % 3 === 0).cache()
    t("counts") { (corpus.count(), batch.count()) }
    val split = sys.env.getOrElse("GRAFT_PROF_DIR", "/tmp") + "/graft_prof_split"
    def rm(p: String) = {
      val pp = new org.apache.hadoop.fs.Path(p)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true)
    }
    rm(split)
    t("write-half") { LshIndex.write(corpus.filter(col("doc_id") % 3 === 1), split, numBuckets = 64) }
    t("append-half") { LshIndex.append(corpus.filter(col("doc_id") % 3 === 2), split) }
    def sig(rows: org.apache.spark.sql.DataFrame) = rows
      .agg(expr("bit_xor(xxhash64(doc_id, band, bkey, bucket))"), count(lit(1))).head
    t("sig-mem") { sig(LshIndex.indexRows(corpus, numBuckets = 64)) }
    t("sig-split") { sig(spark.read.parquet(split)) }
    t("exact-pairs") {
      TextPipeline.exactJaccardPairs(d)
        .filter((col("doc_a") % 3 === 0) =!= (col("doc_b") % 3 === 0)).count()
    }
    val verified = t("verified") {
      val v = LshIndex.verifiedDupPairs(spark, split, batch, corpus).cache()
      v.count(); v
    }
    t("novel") { LshIndex.novelDocs(spark, split, batch, corpus, Some(verified)).count() }
    verified.unpersist()
    rm(split)
    spark.stop()
  }
}
