package graft.tools
import org.apache.spark.sql.SparkSession
object CheckQ29 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val t0 = System.nanoTime()
      val r = graft.SparkEntry.queries("q29_dedup_embedding")(spark, s"/root/testdata/$sf").head
      println(f"CHECK29 $sf n_true=${r.getLong(0)} recall_ok=${r.getBoolean(1)} secs=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
