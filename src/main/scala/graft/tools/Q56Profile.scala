package graft.tools
import graft.pipeline.{LshIndex, TextPipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage profiler for q56 (not part of the contract): mirrors the
  * contract query's exact shape — the bounded doc_id<1500 slice, the
  * 3-file AvailableNow stream replay through `LshIndex.ingestNovel`, then
  * every batch-side gate — with one wall-clock line per stage, so a slow
  * official-window q56 can be attributed to streaming machinery vs the
  * exact-pair recomputation vs the signature gates. */
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
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 1500).cache()
    t("count") { d.count() }
    val base = "/dev/shm/graft_q56prof"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val streamDir = s"$base/stream"; val ix = s"$base/index"; val kept = s"$base/kept"
    val buckets = 16
    t("stage-stream-files") {
      for (i <- 0 to 2) {
        val part = s"$base/part$i"
        d.filter(col("doc_id") % 3 === i).coalesce(1).write.parquet(part)
        val f = fs.globStatus(new org.apache.hadoop.fs.Path(s"$part/part-*"))(0).getPath
        fs.mkdirs(new org.apache.hadoop.fs.Path(streamDir))
        val dst = new org.apache.hadoop.fs.Path(s"$streamDir/t$i.parquet")
        fs.rename(f, dst)
        fs.setTimes(dst, 1000L * (i + 1), -1L)
      }
    }
    t("streaming-total") {
      val stream = spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", "1").parquet(streamDir)
      var batchNo = 0
      val q = stream.writeStream
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (b: DataFrame, batchId: Long) =>
          if (!b.isEmpty) {
            t(s"ingest-batch-$batchNo") {
              LshIndex.ingestNovel(b.sparkSession, ix, kept, b, batchId, buckets)
            }
            batchNo += 1
            ()
          }
        }
        .start()
      q.awaitTermination()
    }
    val keptStream = t("read-kept") { val k = spark.read.parquet(kept).cache(); k.count(); k }
    val (pairs, both) = t("exact-pairs") {
      val p = TextPipeline.exactJaccardPairs(d).select(col("doc_a"), col("doc_b")).cache()
      val b = p.select(col("doc_a").as("x"), col("doc_b").as("y"))
        .unionByName(p.select(col("doc_b").as("x"), col("doc_a").as("y"))).cache()
      b.count()
      (p, b)
    }
    val keptBatch = t("greedy-recompute") {
      def tt(i: Int) = d.filter(col("doc_id") % 3 === i).select(col("doc_id"))
      val k1 = tt(1).join(both.filter(col("y") % 3 === 0).select(col("x").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      val k01 = tt(0).unionByName(k1).cache()
      val k2 = tt(2).join(both.join(k01.select(col("doc_id").as("y")), "y").select(col("x").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      val kb = k01.unionByName(k2).cache(); kb.count(); kb
    }
    t("anti-join-eq") {
      val ids = keptStream.select(col("doc_id"))
      (ids.join(keptBatch, Seq("doc_id"), "left_anti").count(),
        keptBatch.join(ids, Seq("doc_id"), "left_anti").count())
    }
    t("sig-gate") {
      def sig(rows: DataFrame) = rows.agg(
        expr("bit_xor(xxhash64(doc_id, band, bkey, bucket))"), count(lit(1))).head
      (sig(spark.read.parquet(ix)), sig(LshIndex.indexRows(keptStream, buckets)))
    }
    t("per-tercile") {
      keptStream.groupBy((col("doc_id") % 3).as("t"))
        .agg(count(lit(1)).as("n")).collect()
    }
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    spark.stop()
  }
}
