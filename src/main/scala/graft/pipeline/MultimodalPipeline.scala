package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal asset plumbing: opaque `binary` payload column + typed
  * metadata, processed with mapPartitions in per-partition batches — the
  * exact shape a real image/audio decode stage needs (schema, partitioning,
  * batch iteration). The decode itself is a STUB: the container ships no
  * image/audio codecs, so `decodeStub` derives deterministic fake features
  * from the bytes. Swapping in a real decoder changes ONLY that function.
  */
object MultimodalPipeline {

  case class Asset(asset_id: Long, payload: Array[Byte])
  case class AssetFeatures(asset_id: Long, n_bytes: Long, width: Int, height: Int,
      channels: Int, checksum: Long)

  /** documents.text → fake binary assets (UTF-8 bytes as the payload). */
  def assets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("asset_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[Asset]
  }

  /** STUB decode — deterministic fake of an image decoder. A real
    * implementation would parse the container (JPEG/PNG/WAV…) here; the
    * Spark-side contract (runs per-partition, binary in, fixed-schema
    * features out) is identical. */
  def decodeStub(a: Asset): AssetFeatures = {
    val n = a.payload.length.toLong
    val checksum = graft.core.Hashing.xxHash64(a.payload, 0L)
    AssetFeatures(a.asset_id, n,
      width = 64 + (checksum & 0xff).toInt,
      height = 64 + ((checksum >>> 8) & 0xff).toInt,
      channels = 3,
      checksum = checksum)
  }

  /** The batch stage: mapPartitions so a real decoder could amortize
    * per-batch setup (model load, codec contexts) across the partition. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition setup would go here (decoder init / model load)
      it.map(decodeStub)
    }
  }

  /** Frame-sample stub: emit every k-th byte window as a "frame" record —
    * the 1:N explode shape of video frame sampling. */
  def sampleFrames(assets: Dataset[Asset], stride: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      a.payload.indices.by(math.max(1, stride)).map { off =>
        (a.asset_id, off, a.payload(off).toInt & 0xff)
      }
    }.toDF("asset_id", "frame_offset", "sample_value")
  }
}
