package graft.streaming

import graft.core.{KMBloomSketch, SketchCodec}
import graft.spark.catalyst._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
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

  /** Windowed per-tool HLL + Bloom + theta over a transcript stream.
    * NOTE: the aggregation buffer schema is part of the streaming state
    * schema — adding/removing a sketch column here is NOT
    * checkpoint-compatible with queries started on an older version
    * (Spark fails the restart with StateSchemaNotCompatible; plan a
    * fresh checkpoint dir when changing the column set). */
  def windowedSketches(stream: DataFrame, watermark: String = "1 hour",
      window_ : String = "6 hours", capacity: Long = 100000L): DataFrame = {
    stream
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .withWatermark("ts_utc", watermark)
      .groupBy(window(col("ts_utc"), window_), col("tool"))
      .agg(
        hllAggNative(col("conv_id")).as("hll_convs"),
        bloomAggNative(capacity, 0.001)(col("conv_id"), col("turn_idx")).as("bloom_turns"),
        // theta rather than a second HLL: the per-window sketches compose
        // downstream with thetaIntersect/thetaDifference ("convs active
        // in BOTH windows / NEW this window"), which HLL state cannot
        thetaAggNative(col("conv_id")).as("theta_convs"),
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

  /** Input row for the per-conversation stateful operator. */
  case class ConvTurn(conv_id: String, turn_idx: Int)

  /** flatMapGroupsWithState state: per-conversation Bloom blob + exact
    * count of turns admitted as new. At 10^12 turns an exact per-conv
    * turn-idx set cannot live in the state store; a Bloom does. */
  case class ConvDedupState(bloom: Array[Byte], totalDistinct: Long)

  /** One output row per conversation per micro-batch that touched it.
    * `saturated` means the conversation has exceeded the Bloom capacity:
    * from then on the ≤ fpp miscount bound no longer holds (the filter's
    * FP rate climbs as it fills) and `new_turns` may undercount. */
  case class ConvDedupUpdate(conv_id: String, new_turns: Long,
      total_distinct_turns: Long, saturated: Boolean)

  /** Per-conversation streaming dedup via `flatMapGroupsWithState`
    * (custom state, shape 3 next to windowed-agg and foreachBatch): a
    * replayed/duplicated (conv_id, turn_idx) is NEVER counted twice —
    * Bloom zero-false-negatives is exactly the replay-detection guarantee
    * (lib.rs:207–208) — while a genuinely new turn is miscounted with
    * probability ≤ fpp AS LONG AS the conversation stays within
    * `capacity` distinct turns; past that the update rows carry
    * `saturated = true` so callers can reshard or resize rather than
    * silently undercount. State per conversation is one fixed-size blob,
    * so the state store stays O(conversations), not O(turns). */
  def perConversationDedup(turns: Dataset[ConvTurn], capacity: Long = 8192L,
      fpp: Double = 1e-6): Dataset[ConvDedupUpdate] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvDedupState, ConvDedupUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (convId: String, events: Iterator[ConvTurn], state: GroupState[ConvDedupState]) =>
          val prior = state.getOption
          val sketch = prior.map(s => SketchCodec.decodeBloom(s.bloom))
            .getOrElse(KMBloomSketch(capacity, fpp))
          var total = prior.map(_.totalDistinct).getOrElse(0L)
          var fresh = 0L
          events.foreach { e =>
            if (!sketch.mightContainLong(e.turn_idx.toLong)) {
              sketch.insertLong(e.turn_idx.toLong)
              fresh += 1
            }
          }
          total += fresh
          state.update(ConvDedupState(SketchCodec.encodeBloom(sketch), total))
          Iterator(ConvDedupUpdate(convId, fresh, total, total >= capacity))
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
