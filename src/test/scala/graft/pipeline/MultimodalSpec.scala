package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-mm-test")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("feature extraction: deterministic, byte-exact totals, batch shape") {
    val a = MultimodalPipeline.assets(spark, sf)
    val f1 = MultimodalPipeline.extractFeatures(a).collect().sortBy(_.asset_id)
    val f2 = MultimodalPipeline.extractFeatures(a).collect().sortBy(_.asset_id)
    assert(f1.toSeq === f2.toSeq, "decode stub is not deterministic")
    val expectedBytes = spark.read.parquet(s"$sf/documents.parquet")
      .agg(sum(length(col("text")))).head.getLong(0) // ASCII: chars == bytes
    assert(f1.map(_.n_bytes).sum === expectedBytes)
    f1.foreach { f =>
      assert(f.channels === 3 && f.width >= 64 && f.width < 320 && f.height >= 64)
    }
  }

  test("frame sampling: 1:N explode with stride, offsets in range") {
    val a = MultimodalPipeline.assets(spark, sf)
    val frames = MultimodalPipeline.sampleFrames(a, stride = 16)
    val byAsset = frames.groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n"), max(col("frame_offset")).as("maxo")).collect()
    val sizes = MultimodalPipeline.extractFeatures(a).collect()
      .map(f => f.asset_id -> f.n_bytes).toMap
    byAsset.foreach { r =>
      val id = r.getLong(0)
      val expect = (sizes(id) + 15) / 16
      assert(r.getLong(1) === expect, s"asset $id frame count")
      assert(r.getInt(2) < sizes(id))
    }
  }
}
