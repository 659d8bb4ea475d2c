package graft.tools
import graft.pipeline.{LshIndex, TextPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = TextPipeline.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text")).filter(col("doc_id") % 3 === 1).cache()
    d.count()
    def rm(p: String) = { val pp = new org.apache.hadoop.fs.Path(p)
      pp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(pp, true) }
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (b <- Seq(256, 64, 16); trial <- 1 to 2) {
      val p = s"/dev/shm/graft_wp_$b"
      rm(p); t(s"write-b$b-t$trial") { LshIndex.write(d, p, b) }; rm(p)
    }
    // compute+shuffle only, no files: same plan minus the sink
    t("noop-shuffle") {
      LshIndex.indexRows(d, 256).repartition(col("bucket"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
