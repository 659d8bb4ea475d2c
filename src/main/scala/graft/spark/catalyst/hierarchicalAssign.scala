package graft.spark.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Two-level (coarse → fine) nearest-centroid assignment — the
  * documented successor to [[CosineArgmax]]'s flat O(k·dim) per-row
  * scan once ncentroids outgrows ~10³ (BENCH.md "Codebook machinery
  * past toy k": the flat curve is linear in k, 20k vecs/s at k=1024).
  *
  * Construction (all driver-side, deterministic, over the FINE
  * centroids only — k rows, never the corpus):
  *   - a coarse codebook of `coarseK` centroids is trained by
  *     spherical k-means over the fine centroids (init = first coarseK
  *     in id order, fixed iteration count, zero RNG);
  *   - every fine centroid is bucketed under its nearest coarse
  *     centroid (ties to the smaller coarse id).
  * Per row: score the `coarseK` coarse centroids, take the `probes`
  * best coarse buckets (ties to the smaller coarse id), then run the
  * exact fine argmax over ONLY those buckets' fine centroids. Cost is
  * O((coarseK + probes·k/coarseK)·dim) — at k = 1024, coarseK = 32,
  * probes = 4 that is ~160 dims-dot-products vs 1024, ~6×.
  *
  * APPROXIMATE BY DESIGN: the true nearest fine centroid can live in a
  * coarse bucket outside the probed set. Two recoveries make it safe:
  * `probes = coarseK` degenerates to the EXACT flat argmax (every
  * bucket scanned — pinned bit-level in TwoLevelAssignSpec; non-finite
  * embeddings — NaN/Inf elements — bypass routing entirely and run the
  * flat scan verbatim, so the parity is bit-level THERE TOO, not just
  * on finite rows), and the
  * per-centroid arithmetic is EXACTLY CosineArgmax's (float multiply,
  * double accumulate, √·√, 1e-12 floor) with an order-independent
  * tie-break (strictly-greater, or equal-and-smaller-id), so agreement
  * with the flat scan is purely a routing property, measured and gated
  * — not a numerics artifact.
  */
final class TwoLevelAssigner(ids: Array[Long], mat: Array[Array[Float]],
    coarseK: Int, probes: Int, trainIters: Int = 10) extends Serializable {

  require(coarseK >= 1 && probes >= 1, "coarseK and probes must be >= 1")
  private val k = mat.length
  private val dim = mat(0).length
  private val kc = math.min(coarseK, k)
  private val w = math.min(probes, kc)

  /** √Σc² per fine centroid — CosineSim's fold (float multiply, double
    * accumulate). */
  private val fineNorms: Array[Double] = mat.map { c =>
    var s = 0.0d
    var i = 0
    while (i < c.length) { s += (c(i) * c(i)).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Deterministic spherical k-means over the NORMALIZED fine
    * centroids (double precision internally; coarse centroids held
    * unit-norm, so the coarse scoring below can skip their norms). */
  private val coarse: Array[Array[Double]] = {
    val unit = Array.tabulate(k) { c =>
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) { v(i) = mat(c)(i).toDouble; i += 1 }
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    var cents = Array.tabulate(kc)(i => unit(i).clone())
    for (_ <- 0 until trainIters) {
      val sums = Array.fill(kc)(new Array[Double](dim))
      val counts = new Array[Int](kc)
      unit.foreach { v =>
        var best = 0
        var bestDot = Double.MinValue
        var c = 0
        while (c < kc) {
          var dot = 0.0d
          var d = 0
          while (d < dim) { dot += cents(c)(d) * v(d); d += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        var d = 0
        while (d < dim) { sums(best)(d) += v(d); d += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(kc) { c =>
        if (counts(c) == 0) cents(c)
        else {
          val n = math.sqrt(sums(c).map(x => x * x).sum)
          if (n > 0) sums(c).map(_ / n) else cents(c)
        }
      }
    }
    cents
  }

  /** bucket(b) = fine-centroid indices routed under coarse b (ascending
    * index order — preserves the smaller-id tie-break inside a
    * bucket). */
  private val buckets: Array[Array[Int]] = {
    val bs = Array.fill(kc)(scala.collection.mutable.ArrayBuffer.empty[Int])
    var c = 0
    while (c < k) {
      val cv = mat(c)
      var best = 0
      var bestCos = Double.NegativeInfinity
      var b = 0
      while (b < kc) {
        var dot = 0.0d
        var d = 0
        while (d < dim) { dot += cv(d).toDouble * coarse(b)(d); d += 1 }
        val cos = dot / math.max(fineNorms(c), 1e-12d) // coarse is unit-norm
        if (cos > bestCos) { bestCos = cos; best = b }
        b += 1
      }
      bs(best) += c
      c += 1
    }
    bs.map(_.toArray)
  }

  /** Nearest fine-centroid id for an embedding, probing the `probes`
    * best coarse buckets; java.lang.Long so the expression can emit
    * null (null element / dim mismatch). */
  def assign(x: ArrayData): java.lang.Long = {
    if (x.numElements() != dim) return null
    val xv = new Array[Float](dim)
    var nx = 0.0d
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      val f = x.getFloat(i)
      xv(i) = f
      nx += (f * f).toDouble
      i += 1
    }
    val sx = math.sqrt(nx)

    // Non-finite input (NaN/Inf element): every coarse score is NaN (or
    // degenerate), so bucket ROUTING is undefined — the flat argmax,
    // by contrast, has a well-defined answer (first-strictly-greater
    // scan from bestId = ids(0)). Run that exact scan instead of
    // routing, so two-level ≡ flat bit-level on bad rows too (only bad
    // rows pay the O(k·dim); finite rows never take this branch).
    if (!java.lang.Double.isFinite(nx)) return flatAssign(xv, sx)

    // coarse scores (coarse is unit-norm: cos = dot/max(sx,floor))
    val cScore = new Array[Double](kc)
    var b = 0
    while (b < kc) {
      val cb = coarse(b)
      var dot = 0.0d
      var d = 0
      while (d < dim) { dot += xv(d).toDouble * cb(d); d += 1 }
      cScore(b) = dot / math.max(sx, 1e-12d)
      b += 1
    }
    // top-w NON-EMPTY coarse buckets by (score desc, id asc): k-means
    // over the fine centroids routinely leaves a coarse centroid with
    // zero members — probing its empty bucket would waste a slot and,
    // at probes=1, could leave a valid vector with NO candidates (a
    // null assignment that partitionBy would write to the default
    // partition: silent, query-invisible data loss). w is tiny, so a
    // selection pass per slot stays allocation-free. `best == -1`
    // doubles as the all-NaN fallback: a NaN embedding scores NaN
    // everywhere, every comparison is false, and the first unused
    // non-empty bucket wins — mirroring the flat argmax, which
    // TOLERATES NaN input (returns its first centroid) instead of
    // crashing the job on one bad row.
    val chosen = new Array[Int](w)
    val used = new Array[Boolean](kc)
    var nChosen = 0
    var s = 0
    while (s < w) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < kc) {
        if (!used(c) && buckets(c).length > 0 &&
          (best == -1 || cScore(c) > bestScore)) {
          bestScore = cScore(c)
          best = c
        }
        c += 1
      }
      if (best >= 0) {
        used(best) = true
        chosen(nChosen) = best
        nChosen += 1
      }
      s += 1
    }
    // exact fine argmax over the probed buckets — CosineArgmax's exact
    // arithmetic, ORDER-INDEPENDENT tie-break (buckets visit fine
    // centroids out of id order). The unset sentinel is an ARRAY INDEX
    // (-1), never an id value: centroid ids are caller data and may be
    // negative (the flat argmax handles them — this path must too).
    // `bestIdx == -1` admits the first scanned candidate even under NaN
    // scores (flat-argmax parity: never null for a valid-shaped vector
    // — k >= 1 fine centroids guarantee >= 1 non-empty bucket).
    var bestIdx = -1
    var bestCos = Double.NegativeInfinity
    s = 0
    while (s < nChosen) {
      val bucket = buckets(chosen(s))
      var j = 0
      while (j < bucket.length) {
        val c = bucket(j)
        val cv = mat(c)
        var dot = 0.0d
        var d = 0
        while (d < dim) { dot += (xv(d) * cv(d)).toDouble; d += 1 }
        val cos = dot / math.max(sx * fineNorms(c), 1e-12d)
        if (bestIdx == -1 || cos > bestCos || (cos == bestCos && ids(c) < ids(bestIdx))) {
          bestCos = cos
          bestIdx = c
        }
        j += 1
      }
      s += 1
    }
    if (bestIdx < 0) null else java.lang.Long.valueOf(ids(bestIdx))
  }

  /** CosineArgmax.nullSafeEval's loop VERBATIM (id-order scan,
    * first-strictly-greater wins, bestId starts at ids(0))} — the
    * non-finite-input fallback above. */
  private def flatAssign(xv: Array[Float], sx: Double): java.lang.Long = {
    var best = Double.NegativeInfinity
    var bestId = ids(0)
    var c = 0
    while (c < k) {
      val cv = mat(c)
      var dot = 0.0d
      var d = 0
      while (d < dim) { dot += (xv(d) * cv(d)).toDouble; d += 1 }
      val cos = dot / math.max(sx * fineNorms(c), 1e-12d)
      if (cos > best) { best = cos; bestId = ids(c) }
      c += 1
    }
    java.lang.Long.valueOf(bestId)
  }
}

object TwoLevelAssigner {
  /** Executor-side construction memo keyed by a content hash of
    * (ids, matrix, coarseK, probes): the INTERPRETED eval path
    * deserializes a fresh expression per task, and a bare lazy val
    * would re-run the coarse k-means (trainIters·k·coarseK·dim flops —
    * at the large-k regime this expression targets, more setup per
    * task than the assignment work it saves). The codegen path never
    * needs this (doGenCode forces training once on the DRIVER and
    * ships the finished assigner in the reference array), but
    * FALLBACK/interpreted mode must not retrain per task. Bounded at 64
    * live codebooks with single-entry LRU eviction (access-ordered
    * LinkedHashMap — the BloomProbeHelper.probeKeyed pattern; a
    * wholesale clear would retrigger a full coarse retrain for EVERY
    * other live codebook on each admit past the cap). 64-bit
    * content-hash collisions are ignorable at that count. */
  private val MaxEntries = 64

  /** Holder whose lazy val runs the coarse k-means under ITS OWN
    * monitor: the global cache lock covers only the map lookup/insert
    * (cheap), so two tasks building DIFFERENT codebooks train in
    * parallel while racers on the SAME codebook still deduplicate
    * (second one blocks on the slot's monitor, then reads the result).
    * Holding the global lock across training would serialize cold
    * starts across all distinct codebooks — sum of trainings instead
    * of max. */
  private final class Slot(ids: Array[Long], mat: Array[Array[Float]],
      coarseK: Int, probes: Int) {
    lazy val value: TwoLevelAssigner = new TwoLevelAssigner(ids, mat, coarseK, probes)
  }

  private val cache = new java.util.LinkedHashMap[java.lang.Long, Slot](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[java.lang.Long, Slot]): Boolean =
      size() > MaxEntries
  }

  def cached(ids: Array[Long], mat: Array[Array[Float]],
      coarseK: Int, probes: Int): TwoLevelAssigner = {
    var h = graft.core.Hashing.xxHash64Long(coarseK.toLong << 32 | (probes & 0xFFFFFFFFL), 0x324CL)
    var i = 0
    while (i < ids.length) {
      h = graft.core.Hashing.xxHash64Long(ids(i), h)
      val row = mat(i)
      var d = 0
      while (d < row.length) {
        h = graft.core.Hashing.xxHash64Long(
          java.lang.Float.floatToIntBits(row(d)).toLong & 0xFFFFFFFFL, h)
        d += 1
      }
      i += 1
    }
    val slot = cache.synchronized {
      val hit = cache.get(h)
      if (hit != null) hit
      else {
        val s = new Slot(ids, mat, coarseK, probes)
        cache.put(h, s)
        s
      }
    }
    // training runs OUTSIDE the global lock (see Slot): eviction of a
    // slot mid-build is harmless — its builders keep their reference
    slot.value
  }
}

/** Column expression over [[TwoLevelAssigner]]: same contract as
  * [[CosineArgmax]] (array<float> in, centroid id out, null for
  * null/dim-mismatch/null-element input), approximate routing unless
  * probes = coarseK. The assigner (with its trained coarse book and
  * buckets) ships to executors inside the expression like a broadcast
  * closure on the codegen path, and is built at most once per executor
  * JVM per codebook on the interpreted path (construction memo above);
  * codegen calls it through a reference object, keeping the enclosing
  * projection inside whole-stage codegen. */
case class CosineArgmaxTwoLevel(child: org.apache.spark.sql.catalyst.expressions.Expression,
    centroidIds: Seq[Long], centroids: Seq[Seq[Float]], coarseK: Int, probes: Int)
  extends UnaryExpression {

  require(centroids.nonEmpty && centroids.length == centroidIds.length,
    "CosineArgmaxTwoLevel needs one id per centroid and at least one centroid")
  require(centroidIds.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "CosineArgmaxTwoLevel centroidIds must be strictly ascending")
  require(centroids.forall(_.length == centroids.head.length),
    "CosineArgmaxTwoLevel centroids must all have the same dimension")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine_argmax_2l"

  override def stringArgs: Iterator[Any] =
    Iterator(child, s"ncentroids=${centroidIds.length}",
      s"dim=${centroids.head.length}", s"coarseK=$coarseK", s"probes=$probes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes an array<float> column, got ${other.catalogString}")
  }

  @transient private lazy val assigner = TwoLevelAssigner.cached(
    centroidIds.toArray, centroids.map(_.toArray).toArray, coarseK, probes)

  override def nullSafeEval(a: Any): Any =
    assigner.assign(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftTwoLevelAssigner", assigner,
      classOf[TwoLevelAssigner].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("assigned")
      s"""
        java.lang.Long $r = $ref.assign($a);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r.longValue();
        }
      """
    })
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): CosineArgmaxTwoLevel =
    copy(child = c)
}
