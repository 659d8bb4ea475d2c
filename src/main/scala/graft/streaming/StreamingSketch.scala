package graft.streaming

import graft.core.SketchCodec
import graft.spark.native._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming over the sketch family. Mergeable binary state is
  * exactly what incremental processing needs: every micro-batch folds into
  * the running sketch with the same `union` the batch path uses
  * (reference km_bloom_filter.rs:184–194 — associativity means batch/
  * stream equivalence is exact for Bloom/HLL/CMS, bound-level for
  * t-digest/KLL).
  *
  * Two shapes:
  *  1. windowed aggregation: readStream → withWatermark → groupBy(window)
  *     → native sketch agg (TypedImperativeAggregate state lives in the
  *     streaming state store like Spark's own approx_count_distinct);
  *  2. foreachBatch incremental build: each micro-batch produces a batch
  *     sketch that is unioned into a running checkpoint — the streaming
  *     twin of CheckpointedBuild.
  */
object StreamingSketch {

  /** Windowed per-tool HLL + Bloom over a transcript stream. */
  def windowedSketches(stream: DataFrame, watermark: String = "1 hour",
      window_ : String = "6 hours", capacity: Long = 100000L): DataFrame = {
    stream
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .withWatermark("ts_utc", watermark)
      .groupBy(window(col("ts_utc"), window_), col("tool"))
      .agg(
        hllAggNative(col("conv_id")).as("hll_convs"),
        bloomAggNative(capacity, 0.001)(col("conv_id"), col("turn_idx")).as("bloom_turns"),
        count(lit(1)).as("n_turns"))
  }

  /** foreachBatch incremental global sketch: unions each micro-batch's
    * sketch into `state` (driver-held here; a production job would put it
    * behind the CheckpointedBuild parquet). Returns the writer. */
  def incrementalBloom(stream: DataFrame, capacity: Long,
      state: IncrementalState): DataStreamWriter[Row] = {
    stream.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val blob = batch
            .agg(bloomAggNative(capacity, 0.001)(col("conv_id"), col("turn_idx")))
            .head.getAs[Array[Byte]](0)
          state.merge(blob)
        }
        ()
      }
  }

  /** Running union of sketch blobs (thread-safe; micro-batches arrive
    * sequentially but defensive anyway). */
  final class IncrementalState {
    private var current: Option[Array[Byte]] = None
    def merge(blob: Array[Byte]): Unit = synchronized {
      current = current match {
        case None => Some(blob)
        case Some(prev) =>
          val merged = SketchCodec.decodeBloom(prev)
            .unionInPlace(SketchCodec.decodeBloom(blob))
          Some(SketchCodec.encodeBloom(merged, SketchCodec.bloomKeyMode(prev)))
      }
    }
    def get: Option[Array[Byte]] = synchronized(current)
  }
}
