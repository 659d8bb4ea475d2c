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
  private val mm = MultimodalPipeline

  test("real container decode: header-parsed dims equal the generator formulas") {
    val a = mm.assets(spark, sf)
    val f1 = mm.extractFeatures(a).collect().sortBy(_.asset_id)
    val f2 = mm.extractFeatures(a).collect().sortBy(_.asset_id)
    assert(f1.toSeq === f2.toSeq, "decode is not deterministic")
    assert(f1.nonEmpty)
    assert(Set("ppm", "bmp", "wav").subsetOf(f1.map(_.kind).toSet),
      "all three container formats must appear")
    f1.foreach { f =>
      assert(f.ok, s"asset ${f.asset_id} (${f.kind}) failed decode: ${f.err}")
      f.kind match {
        case "ppm" | "bmp" =>
          assert(f.width === mm.widthOf(f.asset_id), s"asset ${f.asset_id} width")
          assert(f.height === mm.heightOf(f.asset_id), s"asset ${f.asset_id} height")
          assert(f.channels === 3)
        case "wav" =>
          assert(f.width === mm.sampleCountOf(f.asset_id), s"asset ${f.asset_id} samples")
          assert(f.channels === mm.channelsOf(f.asset_id))
          assert(f.sample_rate === mm.sampleRateOf(f.asset_id))
      }
    }
  }

  test("corrupt container surfaces ok=false with the parse error, no crash") {
    val good = mm.assets(spark, sf).head(3)
    good.foreach { a =>
      val truncated = a.copy(payload = a.payload.take(10))
      val f = mm.decode(truncated)
      assert(!f.ok)
      assert(f.err != null && f.err.nonEmpty)
      // a flipped magic byte must not parse as the right format
      val mangled = a.payload.clone()
      mangled(0) = 'X'.toByte
      assert(!mm.decode(a.copy(payload = mangled)).ok)
    }
  }

  test("frame sampling: 1:N explode with stride, offsets in range") {
    val a = mm.assets(spark, sf)
    val frames = mm.sampleFrames(a, stride = 16)
    val byAsset = frames.groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n"), max(col("frame_offset")).as("maxo")).collect()
    val sizes = mm.extractFeatures(a).collect()
      .map(f => f.asset_id -> f.n_bytes).toMap
    byAsset.foreach { r =>
      val id = r.getLong(0)
      val expect = (sizes(id) + 15) / 16
      assert(r.getLong(1) === expect, s"asset $id frame count")
      assert(r.getInt(2) < sizes(id))
    }
  }
}
