package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin.backward — event-time nearest-predecessor join. Pins the
  * merge_asof semantics (backward-inclusive, left-outer, tolerance,
  * largest-tiebreak ties) and the SCALE-DEFINING plan property: no join
  * node, exactly one shuffle. */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-asof-test")
    .getOrCreate()

  import spark.implicits._

  private def tsDf(rows: Seq[(Long, String, Long)]) =
    rows.toDF("k", "ts", "id").withColumn("ts", col("ts").cast("timestamp"))

  test("backward match, left-outer nulls, no cross-key leakage") {
    val left = tsDf(Seq((1L, "2026-01-01 10:00:00", 100L),
      (1L, "2026-01-01 12:00:00", 101L), (2L, "2026-01-01 09:00:00", 102L)))
    val right = tsDf(Seq((1L, "2026-01-01 09:30:00", 200L),
      (1L, "2026-01-01 11:00:00", 201L), (3L, "2026-01-01 08:00:00", 202L)))
    val j = AsOfJoin.backward(left, right, Seq("k"), "ts", "id", Seq("id"))
      .orderBy(col("id")).collect()
    assert(j.map(r => Option(r.getAs[Any]("asof_id")).orNull).toSeq ===
      Seq(200L, 201L, null))
  }

  test("backward is INCLUSIVE: right row at the exact left ts matches") {
    val left = tsDf(Seq((1L, "2026-01-01 10:00:00", 100L)))
    val right = tsDf(Seq((1L, "2026-01-01 10:00:00", 200L)))
    val j = AsOfJoin.backward(left, right, Seq("k"), "ts", "id", Seq("id")).head
    assert(j.getAs[Long]("asof_id") === 200L)
  }

  test("equal (key, ts) right rows resolve to the LARGEST tiebreak") {
    val left = tsDf(Seq((1L, "2026-01-01 10:00:00", 100L)))
    val right = tsDf(Seq((1L, "2026-01-01 09:00:00", 201L),
      (1L, "2026-01-01 09:00:00", 205L), (1L, "2026-01-01 09:00:00", 203L)))
    val j = AsOfJoin.backward(left, right, Seq("k"), "ts", "id", Seq("id")).head
    assert(j.getAs[Long]("asof_id") === 205L,
      "pandas merge_asof keeps the last occurrence; ours is the max tiebreak")
  }

  test("tolerance nulls stale matches but keeps the rows (merge_asof contract)") {
    val left = tsDf(Seq((1L, "2026-01-01 10:00:00", 100L),
      (1L, "2026-01-02 12:00:00", 101L)))
    val right = tsDf(Seq((1L, "2026-01-01 09:00:00", 200L)))
    val j = AsOfJoin.backward(left, right, Seq("k"), "ts", "id", Seq("id"),
      toleranceSecs = Some(2 * 3600L)).orderBy(col("id")).collect()
    assert(j.length === 2, "tolerance must never drop left rows")
    assert(j(0).getAs[Long]("asof_id") === 200L, "1h-old match inside 2h tolerance")
    assert(j(1).getAs[Any]("asof_id") === null, "27h-old match beyond 2h tolerance")
  }

  test("null payload values cannot desync from the matched timestamp") {
    val left = Seq((1L, "2026-01-01 10:00:00", 100L))
      .toDF("k", "ts", "id").withColumn("ts", col("ts").cast("timestamp"))
    val right = Seq((1L, "2026-01-01 08:00:00", 200L, "old"),
      (1L, "2026-01-01 09:00:00", 201L, null.asInstanceOf[String]))
      .toDF("k", "ts", "id", "v").withColumn("ts", col("ts").cast("timestamp"))
    val j = AsOfJoin.backward(left, right, Seq("k"), "ts", "id", Seq("id", "v")).head
    // the matched right ROW is the 09:00 one — its null v must surface as
    // null, NOT fall back to the older row's value (the struct carry)
    assert(j.getAs[Long]("asof_id") === 201L)
    assert(j.getAs[Any]("asof_v") === null)
  }

  test("plan: no join node, exactly one exchange (the 100 TB shape)") {
    val left = tsDf(Seq((1L, "2026-01-01 10:00:00", 100L)))
    val right = tsDf(Seq((1L, "2026-01-01 09:00:00", 200L)))
    val j = AsOfJoin.backward(left, right, Seq("k"), "ts", "id", Seq("id"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"as-of must not plan a join node:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one shuffle, got $exchanges:\n$plan")
  }

  test("forward: earliest at-or-after match, inclusive, largest tiebreak") {
    val left = tsDf(Seq((1L, "2026-01-01 10:00:00", 100L),
      (1L, "2026-01-01 23:00:00", 101L)))
    val right = tsDf(Seq((1L, "2026-01-01 09:00:00", 200L),
      (1L, "2026-01-01 12:00:00", 201L), (1L, "2026-01-01 12:00:00", 205L),
      (1L, "2026-01-01 10:00:00", 202L)))
    val j = AsOfJoin.forward(left, right, Seq("k"), "ts", "id", Seq("id"))
      .orderBy(col("id")).collect()
    assert(j(0).getAs[Long]("asof_id") === 202L, "same-ts right row matches (inclusive)")
    assert(j(1).getAs[Any]("asof_id") === null, "no following right row")
    val left2 = tsDf(Seq((1L, "2026-01-01 11:00:00", 100L)))
    val j2 = AsOfJoin.forward(left2, right, Seq("k"), "ts", "id", Seq("id")).head
    assert(j2.getAs[Long]("asof_id") === 205L,
      "equal-ts right duplicates resolve to the largest tiebreak")
  }

  test("nearest: closest of both directions; equal gaps take backward") {
    val left = tsDf(Seq((1L, "2026-01-01 10:00:00", 100L), // bw 1h, fw 3h
      (1L, "2026-01-01 14:00:00", 101L),                   // bw 1h, fw 1h (tie)
      (2L, "2026-01-01 10:00:00", 102L)))                  // fw only
    val right = tsDf(Seq((1L, "2026-01-01 09:00:00", 200L),
      (1L, "2026-01-01 13:00:00", 201L), (1L, "2026-01-01 15:00:00", 202L),
      (2L, "2026-01-01 11:00:00", 203L)))
    val j = AsOfJoin.nearest(left, right, Seq("k"), "ts", "id", Seq("id"))
      .orderBy(col("id")).collect()
    assert(j(0).getAs[Long]("asof_id") === 200L, "backward 1h beats forward 3h")
    assert(j(1).getAs[Long]("asof_id") === 201L, "equal gaps take the backward match")
    assert(j(2).getAs[Long]("asof_id") === 203L, "forward-only still matches")
    // tolerance applies per direction BEFORE the choice
    val jt = AsOfJoin.nearest(left, right, Seq("k"), "ts", "id", Seq("id"),
      toleranceSecs = Some(30 * 60L)).orderBy(col("id")).collect()
    assert(jt.forall(_.getAs[Any]("asof_id") == null), "30min tolerance kills all")
  }

  test("nearest plan: still exactly one exchange (shared key partitioning)") {
    val left = tsDf(Seq((1L, "2026-01-01 10:00:00", 100L)))
    val right = tsDf(Seq((1L, "2026-01-01 09:00:00", 200L)))
    val j = AsOfJoin.nearest(left, right, Seq("k"), "ts", "id", Seq("id"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"no join node:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"both windows must share one shuffle, got $exchanges:\n$plan")
  }

  // r07 focused coverage: forward/nearest were rewritten from a
  // currentRow..unboundedFollowing frame (executed as an O(n²)-per-key
  // re-scan) to the backward direction's mirrored RUNNING frame. The
  // two tests below pin (a) value parity against an independent
  // brute-force reference on a HOT KEY with duplicate timestamps and
  // tiebreak collisions — the shape the reversed sort could get subtly
  // wrong — and (b) the plan property that every frame stays a running
  // unboundedPreceding..currentRow frame (the O(n) guarantee).
  test("hot key with duplicate ts: forward/nearest match a brute-force reference") {
    val rnd = new scala.util.Random(20260822L)
    // one hot key (k=1, 300 rows/side, ts drawn from just 60 distinct
    // seconds ⇒ heavy duplicates) + two sparse keys
    def gen(n: Int, k: Long, tsSpread: Int, idBase: Long) =
      (0 until n).map(i => (k, 1000L + rnd.nextInt(tsSpread).toLong, idBase + i))
    val leftRows = gen(300, 1L, 60, 10000L) ++ gen(20, 2L, 40, 20000L) ++
      Seq((3L, 1500L, 30000L)) // key with no right rows at all
    val rightRows = gen(300, 1L, 60, 50000L) ++ gen(20, 2L, 40, 60000L)
    val left = leftRows.toDF("k", "sec", "id").withColumn("ts", col("sec").cast("timestamp"))
    val right = rightRows.toDF("k", "sec", "id").withColumn("ts", col("sec").cast("timestamp"))
    def bruteBw(k: Long, lts: Long): Option[(Long, Long)] = {
      val c = rightRows.filter(r => r._1 == k && r._2 <= lts)
      if (c.isEmpty) None else {
        val ts = c.map(_._2).max
        Some((ts, c.filter(_._2 == ts).map(_._3).max)) // largest tiebreak
      }
    }
    def bruteFw(k: Long, lts: Long): Option[(Long, Long)] = {
      val c = rightRows.filter(r => r._1 == k && r._2 >= lts)
      if (c.isEmpty) None else {
        val ts = c.map(_._2).min
        Some((ts, c.filter(_._2 == ts).map(_._3).max))
      }
    }
    val fw = AsOfJoin.forward(left, right, Seq("k"), "ts", "id", Seq("id"))
      .select(col("k"), col("sec"), col("id"), col("asof_id")).collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("asof_id"))).toMap
    leftRows.foreach { case (k, sec, id) =>
      assert(fw(id) === bruteFw(k, sec).map(_._2),
        s"forward mismatch for left id=$id (k=$k, sec=$sec)")
    }
    val nr = AsOfJoin.nearest(left, right, Seq("k"), "ts", "id", Seq("id"))
      .select(col("id"), col("asof_id")).collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("asof_id"))).toMap
    leftRows.foreach { case (k, sec, id) =>
      val expected = (bruteBw(k, sec), bruteFw(k, sec)) match {
        case (Some((bts, bid)), Some((fts, fid))) =>
          if (sec - bts <= fts - sec) Some(bid) else Some(fid) // tie → backward
        case (b, f) => b.orElse(f).map(_._2)
      }
      assert(nr(id) === expected, s"nearest mismatch for left id=$id (k=$k, sec=$sec)")
    }
  }

  test("plan: every as-of window frame is a RUNNING frame (the O(n) shape)") {
    val left = tsDf(Seq((1L, "2026-01-01 10:00:00", 100L)))
    val right = tsDf(Seq((1L, "2026-01-01 09:00:00", 200L)))
    for ((name, df) <- Seq(
        "forward" -> AsOfJoin.forward(left, right, Seq("k"), "ts", "id", Seq("id")),
        "nearest" -> AsOfJoin.nearest(left, right, Seq("k"), "ts", "id", Seq("id")))) {
      val plan = df.queryExecution.executedPlan.toString.toLowerCase
      assert(!plan.contains("unboundedfollowing"),
        s"$name regressed to an UnboundedFollowing frame (O(n²) per-key re-scan):\n$plan")
      assert(plan.contains("unboundedpreceding"),
        s"$name lost its running frame:\n$plan")
    }
  }

  test("asof_* name collision on the left is rejected") {
    val left = tsDf(Seq((1L, "2026-01-01 10:00:00", 100L)))
      .withColumn("asof_x", lit(1))
    val right = tsDf(Seq((1L, "2026-01-01 09:00:00", 200L)))
    intercept[IllegalArgumentException](
      AsOfJoin.backward(left, right, Seq("k"), "ts", "id", Seq("id")))
  }
}
