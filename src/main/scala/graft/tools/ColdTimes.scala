package graft.tools
import org.apache.spark.sql.SparkSession
object ColdTimes {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"COLD $q ${(System.nanoTime()-t0)/1e9}%.3f")
    }
    spark.stop()
  }
}
