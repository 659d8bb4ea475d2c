package graft.tools
import org.apache.spark.sql.SparkSession
object ProfileQ30 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val r = graft.SparkEntry.queries("q30_winnow_fingerprint")(spark, s"/root/testdata/$sf").head
      println(s"Q30 $sf $r")
    }
    spark.stop()
  }
}
