package graft.tools
import graft.pipeline.{LshIndex, TextPipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Scratch stage profiler for q56 (not part of the contract). */
object Q56Profile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = TextPipeline.documents(spark, s"/root/testdata/$sf")
      .select(col("doc_id"), col("text")).cache()
    t("count") { d.count() }
    val base = "/tmp/graft_q56prof"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val ix = s"$base/index"; val kept = s"$base/kept"
    for (i <- 0 to 2)
      t(s"ingest-t$i") {
        LshIndex.ingestNovel(spark, ix, kept, d.filter(col("doc_id") % 3 === i), 32)
      }
    val keptStream = t("read-kept") { val k = spark.read.parquet(kept).cache(); k.count(); k }
    t("greedy-recompute") {
      val pairs = TextPipeline.exactJaccardPairs(d).select(col("doc_a"), col("doc_b"))
      val both = pairs.select(col("doc_a").as("x"), col("doc_b").as("y"))
        .unionByName(pairs.select(col("doc_b").as("x"), col("doc_a").as("y"))).cache()
      def tt(i: Int) = d.filter(col("doc_id") % 3 === i).select(col("doc_id"))
      val k1 = tt(1).join(both.filter(col("y") % 3 === 0).select(col("x").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      val k01 = tt(0).unionByName(k1).cache()
      val k2 = tt(2).join(both.join(k01.select(col("doc_id").as("y")), "y").select(col("x").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      val keptBatch = k01.unionByName(k2)
      val ids = keptStream.select(col("doc_id"))
      (ids.join(keptBatch, Seq("doc_id"), "left_anti").count(),
       keptBatch.join(ids, Seq("doc_id"), "left_anti").count())
    }
    t("sig-gate") {
      def sig(rows: DataFrame) = rows.agg(
        expr("bit_xor(xxhash64(doc_id, band, bkey, bucket))"), count(lit(1))).head
      (sig(spark.read.parquet(ix)), sig(LshIndex.indexRows(keptStream, 32)))
    }
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    spark.stop()
  }
}
