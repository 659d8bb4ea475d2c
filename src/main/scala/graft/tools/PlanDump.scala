package graft.tools
import graft.spark.Transcripts
import graft.spark.catalyst._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Transcripts.load(spark, "/root/testdata/sf0.001")
    val sketch = t.agg(bloomAggNative(10000L, 0.001)(col("conv_id"), col("turn_idx")))
      .head.getAs[Array[Byte]](0)
    val probed = t.filter(bloomMightContainNative(lit(sketch), col("conv_id"), col("turn_idx")))
    probed.count()
    val plan = probed.queryExecution.executedPlan.toString
    println("=== FINAL ===")
    println(plan.replaceAll("0x[0-9A-F]{40,}", "0xBLOB"))
  }
}
