package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (event-time nearest-match join): for every left row, the
  * single right row sharing the join keys that is nearest in event time —
  * most recent at-or-before ([[backward]]), earliest at-or-after
  * ([[forward]]), or closest of the two ([[nearest]]) — the time-series
  * enrichment operator (pandas `merge_asof`, kdb `aj`, Flink temporal
  * join) the engine-operator checklist's join family otherwise lacks.
  *
  * Spark-first plan: NO join node at all. Both sides are union-tagged and
  * shuffled ONCE by key; each direction is one running first/last-non-null
  * window over (ts, side, tieBreak) carrying the entire matched right row
  * as a struct (atomic — a null payload value can never desync from the
  * matched timestamp):
  *
  *   Exchange hashpartitioning(keys) → Sort → Window(last(struct)) →
  *   [nearest only: Sort↓ → Window(first(struct))] → Filter(side=1)
  *
  * ONE shuffle of |L|+|R| rows and one sort per direction — this is the
  * shape that survives 100 TB. The naive alternatives do not: an
  * inequality theta-join (`l.ts >= r.ts`) is a BroadcastNestedLoopJoin
  * (O(|L|·|R|) per key), and a "latest per pair" groupBy over a range
  * join explodes the pair multiset before collapsing it. Per-key row
  * count bounds the window partition — the same skew profile as any
  * groupBy(key), handled by the same salting/AQE levers.
  *
  * Semantics (pandas merge_asof parity):
  *  - matches are INCLUSIVE: a right row AT the left row's exact ts
  *    matches in every direction (side ordering puts it inside the frame);
  *  - `toleranceSecs`: a match further than this is nulled out (row kept,
  *    enrichment columns null — merge_asof's contract); for [[nearest]]
  *    the tolerance applies per direction BEFORE the closest-of-two
  *    choice;
  *  - unmatched left rows survive with null enrichment (left-outer);
  *  - ties inside the right side at equal (key, ts) resolve to the
  *    LARGEST `tieBreak` value in every direction (pandas keeps the last
  *    occurrence; pass a unique id for determinism — required, not
  *    optional, because a nondeterministic tie would break replay/retry
  *    idempotency);
  *  - [[nearest]] with equal gaps on both sides takes the BACKWARD match.
  */
object AsOfJoin {

  private val sideCol = "__asof_side"
  private val tieCol = "__asof_tie"
  private val bwCol = "__asof_bw"
  private val fwCol = "__asof_fw"

  /** Union-tag the two sides; right rows carry the matched-row struct
    * (ts first, then payload), left rows a typed null. */
  private def tagged(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tieBreak: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join with no payload enriches nothing")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(_.startsWith("asof_")),
      "left side already carries asof_* columns")
    require(!(leftCols ++ right.columns).exists(_.startsWith("__asof_")),
      "__asof_* column names are reserved by AsOfJoin internals")
    val rightStruct = struct(
      col(tsCol).as(s"asof_$tsCol") +: payload.map(c => col(c).as(s"asof_$c")): _*)
    val r = right.select(
      keys.map(col) :+ col(tsCol) :+ col(tieBreak).as(tieCol) :+
        lit(0).as(sideCol) :+ rightStruct.as(bwCol): _*)
    val l = left.select(
      leftCols.map(col) :+ lit(null).cast(r.schema(tieCol).dataType).as(tieCol) :+
        lit(1).as(sideCol) :+ lit(null).cast(r.schema(bwCol).dataType).as(bwCol): _*)
    l.unionByName(r, allowMissingColumns = true)
  }

  /** Most recent right row at-or-before: running last-non-null over
    * (ts asc, side asc [right first at equal ts — inclusive], tie asc
    * [last/largest tiebreak wins under last()]). */
  private def backwardMatch(u: DataFrame, keys: Seq[String], tsCol: String): Column =
    last(col(bwCol), ignoreNulls = true).over(
      Window.partitionBy(keys.map(col): _*)
        .orderBy(col(tsCol).asc, col(sideCol).asc, col(tieCol).asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Earliest right row at-or-after, as the MIRROR of [[backwardMatch]]:
    * running last-non-null over (ts DESC, side asc [right first at equal
    * ts — inclusive], tie asc [largest tiebreak sorts last and wins under
    * last()]) with an unboundedPreceding..currentRow frame. The previous
    * formulation (`first` over currentRow..unboundedFollowing) was
    * algebraically identical but executed as
    * UnboundedFollowingWindowFunctionFrame, which RESCANS the remainder
    * of the partition for every row — O(n²) in per-key row count, at
    * odds with the 100 TB hot-key argument above. The running frame is
    * O(n): one state update per row. Same single Exchange (the reversed
    * sort shares the key partitioning); results bit-identical (gated by
    * AsOfJoinSpec's pandas-parity matrix and q59's exact oracle). */
  private def forwardMatch(u: DataFrame, keys: Seq[String], tsCol: String): Column =
    last(col(bwCol), ignoreNulls = true).over(
      Window.partitionBy(keys.map(col): _*)
        .orderBy(col(tsCol).desc, col(sideCol).asc, col(tieCol).asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Gap in µs between the left ts and a matched struct's ts (positive in
    * the match's valid direction). NTZ columns cast through timestamp
    * under the session's pinned UTC — a plain long cast is illegal. */
  private def gapUs(tsCol: String, matchStruct: Column): Column =
    abs(unix_micros(col(tsCol).cast("timestamp")) -
      unix_micros(matchStruct.getField(s"asof_$tsCol").cast("timestamp")))

  private def withinTol(tsCol: String, matchStruct: Column,
      toleranceSecs: Option[Long]): Column = toleranceSecs match {
    case None => matchStruct
    case Some(tol) =>
      when(matchStruct.isNotNull &&
        gapUs(tsCol, matchStruct) <= tol * 1000000L, matchStruct)
  }

  private def emit(m: DataFrame, leftCols: Seq[String], tsCol: String,
      payload: Seq[String], chosen: Column): DataFrame =
    m.select((leftCols.map(col) :+
      chosen.getField(s"asof_$tsCol").as(s"asof_$tsCol")) ++
      payload.map(c => chosen.getField(s"asof_$c").as(s"asof_$c")): _*)

  /** @param left      left relation; all its columns survive
    * @param right     right relation; `keys`, `tsCol`, `tieBreak` and
    *                  `payload` must exist in it
    * @param keys      equi-join key columns (both sides)
    * @param tsCol     event-time column name (both sides)
    * @param tieBreak  right-side unique tiebreak column (e.g. event_id)
    * @param payload   right-side columns to carry onto matched left rows;
    *                  emitted as `asof_<name>`, plus `asof_<tsCol>` always
    * @param toleranceSecs max |left.ts − right.ts| in seconds beyond
    *                  which the match is nulled (merge_asof `tolerance`) */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tieBreak: String, payload: Seq[String],
      toleranceSecs: Option[Long] = None): DataFrame = {
    val u = tagged(left, right, keys, tsCol, tieBreak, payload)
    val m = u.withColumn(bwCol, backwardMatch(u, keys, tsCol))
      .filter(col(sideCol) === 1)
      .withColumn(bwCol, withinTol(tsCol, col(bwCol), toleranceSecs))
    emit(m, left.columns.toSeq, tsCol, payload, col(bwCol))
  }

  /** Earliest right row with `right.ts ≥ left.ts` (merge_asof
    * direction='forward'). Same plan shape as [[backward]] with the
    * window frame reversed. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tieBreak: String, payload: Seq[String],
      toleranceSecs: Option[Long] = None): DataFrame = {
    val u = tagged(left, right, keys, tsCol, tieBreak, payload)
    val m = u.withColumn(bwCol, forwardMatch(u, keys, tsCol))
      .filter(col(sideCol) === 1)
      .withColumn(bwCol, withinTol(tsCol, col(bwCol), toleranceSecs))
    emit(m, left.columns.toSeq, tsCol, payload, col(bwCol))
  }

  /** Closest right row in either direction (merge_asof
    * direction='nearest'); equal gaps take the backward match. Still ONE
    * shuffle — the two windows share the key partitioning (one extra
    * per-partition sort for the reversed frame). */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tieBreak: String, payload: Seq[String],
      toleranceSecs: Option[Long] = None): DataFrame = {
    val u = tagged(left, right, keys, tsCol, tieBreak, payload)
    val m = u
      .withColumn(fwCol, forwardMatch(u, keys, tsCol))
      .withColumn(bwCol, backwardMatch(u, keys, tsCol))
      .filter(col(sideCol) === 1)
      .withColumn(bwCol, withinTol(tsCol, col(bwCol), toleranceSecs))
      .withColumn(fwCol, withinTol(tsCol, col(fwCol), toleranceSecs))
    val chosen = when(col(bwCol).isNull, col(fwCol))
      .when(col(fwCol).isNull, col(bwCol))
      .when(gapUs(tsCol, col(fwCol)) < gapUs(tsCol, col(bwCol)), col(fwCol))
      .otherwise(col(bwCol))
    emit(m.withColumn(bwCol, chosen), left.columns.toSeq, tsCol, payload, col(bwCol))
  }
}
