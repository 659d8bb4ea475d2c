package graft.tools
import org.apache.spark.sql.SparkSession
object CheckQ31 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val r = graft.SparkEntry.queries("q31_theta_setops")(spark, s"/root/testdata/$sf").head
      println(s"Q31 $sf $r")
    }
    spark.stop()
  }
}
