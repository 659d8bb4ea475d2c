package graft.tools
import graft.spark.Transcripts
import graft.spark.catalyst._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CodegenRepro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.codegen.logging.maxLines", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Transcripts.load(spark, "/root/testdata/sf0.001").cache()
    val n = t.count()
    val sketch = t.agg(bloomAggNative(math.max(n,1000L), 0.001)(col("conv_id"), col("turn_idx")))
      .head.getAs[Array[Byte]](0)
    val c = t.filter(bloomMightContainNative(lit(sketch), col("conv_id"), col("turn_idx"))).count()
    println(s"probe count = $c / $n")
    spark.stop()
  }
}
