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

  test("frame sampling: header-aware offsets, values match the generator exactly") {
    import graft.core.Hashing
    val a = mm.assets(spark, sf)
    val frames = mm.sampleFrames(a, stride = 16).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(frames.nonEmpty)
    assert(Set("ppm", "bmp", "wav").subsetOf(frames.map(_._2).toSet))

    // the generator fills payload bytes as pix(id, i) at data offset i —
    // recompute the EXPECTED sampled value per format from the logical
    // (frame/pixel) index through the container's real layout
    def pix(id: Long, i: Int): Int =
      (Hashing.xxHash64Long(id * 0x10001L + i, 0x4D4DL) & 0xff).toInt
    val counts = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
    frames.foreach { case (id, kind, idx, value) =>
      counts(id) += 1
      kind match {
        case "wav" =>
          val block = mm.channelsOf(id) * 2
          val lo = pix(id, idx * block)
          val hi = pix(id, idx * block + 1)
          val expect = ((lo | (hi << 8)).toShort).toInt
          assert(value === expect, s"wav $id frame $idx")
        case "ppm" =>
          assert(value === pix(id, 3 * idx), s"ppm $id pixel $idx")
        case "bmp" =>
          val (w, h) = (mm.widthOf(id), mm.heightOf(id))
          val rowBytes = (w * 3 + 3) / 4 * 4
          val x = idx % w
          val y = idx / w
          // generator fills the BOTTOM-UP padded pixel array; RED is the
          // third byte of a BGR pixel
          val expect = pix(id, (h - 1 - y) * rowBytes + 3 * x + 2)
          assert(value === expect, s"bmp $id pixel $idx")
      }
    }
    // 1:N explode counts: ceil(frames-or-pixels / stride) per asset
    counts.foreach { case (id, n) =>
      val units = mm.kindOf(id) match {
        case "wav" => mm.sampleCountOf(id)
        case _ => mm.widthOf(id) * mm.heightOf(id)
      }
      assert(n === (units + 15) / 16, s"asset $id sampled-frame count")
    }
  }
}
