package graft.spark.catalyst

import graft.core.Hashing
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity of two float-array columns as a NATIVE codegen'd
  * expression — the ANN scoring hot path (brute-force top-k, IVF
  * centroid routing, embedding near-dup verification).
  *
  * Why not `zip_with` + `aggregate`? Higher-order functions are
  * CodegenFallback: every row allocates a product array, boxes through
  * lambda variables, and drops the enclosing Project out of whole-stage
  * codegen. This expression is one fused primitive loop (no allocation,
  * no boxing) and keeps its WSCG span — measured 14.6× on a 1M-row
  * scoring scan (IvfSweep `cosine_bench`, BENCH.md).
  *
  * Arithmetic is BIT-IDENTICAL to the higher-order form it replaces
  * (`dot/greatest(√Σx²·√Σy², 1e-12)` with FLOAT multiply then double
  * accumulate, left-to-right), so every recall gate and assignment is
  * unchanged. Nulls: null array, length mismatch, or a null element ⇒
  * null (the HOF chain's propagation).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes two array<float> columns, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0d
    var na = 0.0d
    var nb = 0.0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val fx = x.getFloat(i)
      val fy = y.getFloat(i)
      // float multiply, THEN widen — matches Catalyst's `x * y` typing
      // inside the zip_with lambda this expression replaces
      dot += (fx * fy).toDouble
      na += (fx * fx).toDouble
      nb += (fy * fy).toDouble
      i += 1
    }
    dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val fx = ctx.freshName("fx")
      val fy = ctx.freshName("fy")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0;
          double $na = 0.0;
          double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            float $fx = $a.getFloat($i);
            float $fy = $b.getFloat($i);
            $dot += (double) ($fx * $fy);
            $na += (double) ($fx * $fx);
            $nb += (double) ($fy * $fy);
          }
          if (!${ev.isNull}) {
            ${ev.value} = $dot / Math.max(Math.sqrt($na) * Math.sqrt($nb), 1e-12);
          }
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Nearest-centroid id by cosine — the IVF write-time assignment as ONE
  * fused expression: per row, a single primitive loop computes every
  * centroid's dot product against the embedding and keeps the argmax
  * (ties to the SMALLEST centroid id: strictly-greater comparison over
  * ids in ascending order), with centroid norms precomputed once at
  * construction. Zero per-row allocation, no shuffle, stays inside
  * whole-stage codegen.
  *
  * Per-centroid cosines are computed with exactly [[CosineSim]]'s
  * arithmetic (float multiply, double accumulate, √·√ then the 1e-12
  * floor), so the assignment is bit-identical to scoring each centroid
  * with `cosine()` and taking (cos desc, centroid_id asc) — the parity
  * VectorExprSpec pins.
  *
  * `centroidIds`/`centroids` are driver-side data (the codebook is tiny
  * by construction); they ship to executors inside the expression like a
  * broadcast closure. Returns null for a null/null-element embedding or
  * a dimension mismatch.
  */
case class CosineArgmax(child: Expression,
    centroidIds: Seq[Long], centroids: Seq[Seq[Float]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centroids.nonEmpty && centroids.length == centroidIds.length,
    "CosineArgmax needs one id per centroid and at least one centroid")
  // the documented "ties break to the smallest centroid id" contract is
  // implemented as first-strictly-greater-wins over the scan order, so
  // the scan order MUST be ascending ids — enforce rather than document
  require(centroidIds.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "CosineArgmax centroidIds must be strictly ascending (sort the codebook first)")
  require(centroids.forall(_.length == centroids.head.length),
    "CosineArgmax centroids must all have the same dimension")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine_argmax"

  /** Plan strings must not embed the full centroid matrix (a 16×64-float
    * codebook is ~6 KB of text per explain line). */
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"ncentroids=${centroidIds.length}", s"dim=${centroids.head.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes an array<float> column, got ${other.catalogString}")
  }

  /** Flat executor-side tables: ids, dim-major centroid matrix, norms
    * (√Σc², float-multiply/double-accumulate — CosineSim's fold). */
  @transient private lazy val ids: Array[Long] = centroidIds.toArray
  @transient private lazy val mat: Array[Array[Float]] = centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] = mat.map { c =>
    var s = 0.0d
    var i = 0
    while (i < c.length) { s += (c(i) * c(i)).toDouble; i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dim = mat(0).length
    if (x.numElements() != dim) return null
    var nx = 0.0d
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i)) return null
      val f = x.getFloat(i)
      nx += (f * f).toDouble
      i += 1
    }
    val sx = math.sqrt(nx)
    var best = Double.NegativeInfinity
    var bestId = ids(0)
    var c = 0
    while (c < mat.length) {
      val cv = mat(c)
      var dot = 0.0d
      var d = 0
      while (d < dim) { dot += (x.getFloat(d) * cv(d)).toDouble; d += 1 }
      val cos = dot / math.max(sx * norms(c), 1e-12d)
      if (cos > best) { best = cos; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("graftArgmaxIds", ids, "long[]")
    val matRef = ctx.addReferenceObj("graftArgmaxMat", mat, "float[][]")
    val normsRef = ctx.addReferenceObj("graftArgmaxNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val dim = ctx.freshName("dim")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val nx = ctx.freshName("nx")
      val sx = ctx.freshName("sx")
      val f = ctx.freshName("f")
      val cv = ctx.freshName("cv")
      val dot = ctx.freshName("dot")
      val cos = ctx.freshName("cos")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      s"""
        int $dim = $matRef[0].length;
        if ($a.numElements() != $dim) {
          ${ev.isNull} = true;
        } else {
          double $nx = 0.0;
          for (int $i = 0; $i < $dim; $i++) {
            if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
            float $f = $a.getFloat($i);
            $nx += (double) ($f * $f);
          }
          if (!${ev.isNull}) {
            double $sx = Math.sqrt($nx);
            double $best = Double.NEGATIVE_INFINITY;
            long $bestId = $idsRef[0];
            for (int $c = 0; $c < $matRef.length; $c++) {
              float[] $cv = $matRef[$c];
              double $dot = 0.0;
              for (int $d = 0; $d < $dim; $d++) {
                $dot += (double) ($a.getFloat($d) * $cv[$d]);
              }
              double $cos = $dot / Math.max($sx * $normsRef[$c], 1e-12);
              if ($cos > $best) { $best = $cos; $bestId = $idsRef[$c]; }
            }
            ${ev.value} = $bestId;
          }
        }
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): CosineArgmax =
    copy(child = c)
}

/** Per-vector symmetric int8 quantization of a float embedding:
  * q_i = round(127 · x_i / max|x|), emitted as BinaryType (1 byte per
  * dimension — 4× smaller than array<float> in storage, shuffle, and
  * scan IO). COSINE-SAFE BY CONSTRUCTION: cosine divides by both
  * norms, so the per-vector positive scale cancels exactly and no
  * scale column needs to be stored or read for similarity work (only
  * reconstruction would need it, which the ANN path never does).
  *
  * A zero vector quantizes to all-zero bytes (its cosine later hits
  * the 1e-12 floor at 0.0, matching the float path's behavior). A null
  * array or null element ⇒ null.
  */
case class QuantizeI8(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantize_i8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes an array<float> column, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var maxAbs = 0.0f
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = math.abs(x.getFloat(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxAbs > 0.0f) {
      val s = 127.0f / maxAbs
      i = 0
      while (i < n) { out(i) = math.round(x.getFloat(i) * s).toByte; i += 1 }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val maxAbs = ctx.freshName("maxAbs")
      val v = ctx.freshName("v")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      s"""
        int $n = $a.numElements();
        float $maxAbs = 0.0f;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
          float $v = Math.abs($a.getFloat($i));
          if ($v > $maxAbs) $maxAbs = $v;
        }
        if (!${ev.isNull}) {
          byte[] $out = new byte[$n];
          if ($maxAbs > 0.0f) {
            float $s = 127.0f / $maxAbs;
            for (int $j = 0; $j < $n; $j++) {
              $out[$j] = (byte) Math.round($a.getFloat($j) * $s);
            }
          }
          ${ev.value} = $out;
        }
      """
    })

  override protected def withNewChildInternal(c: Expression): QuantizeI8 =
    copy(child = c)
}

/** Cosine similarity of two int8-quantized embeddings ([[QuantizeI8]]
  * blobs): one primitive byte loop, integer multiply-accumulate in
  * longs (no overflow up to dim ≈ 5.7·10¹⁴), same `dot/√·√` with the
  * 1e-12 floor as [[CosineSim]]. The scan reads 1 byte per dimension
  * instead of 4 — at 10^9×1024-dim corpora the scoring scan's IO drops
  * 4×, which is the point. Null blob or length mismatch ⇒ null. */
case class CosineSimI8(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine_i8"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes two binary (QuantizeI8) columns, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < x.length) {
      dot += x(i).toLong * y(i)
      na += x(i).toLong * x(i)
      nb += y(i).toLong * y(i)
      i += 1
    }
    dot.toDouble / math.max(math.sqrt(na.toDouble) * math.sqrt(nb.toDouble), 1e-12d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
        if ($a.length != $b.length) {
          ${ev.isNull} = true;
        } else {
          long $dot = 0L;
          long $na = 0L;
          long $nb = 0L;
          for (int $i = 0; $i < $a.length; $i++) {
            $dot += (long) $a[$i] * $b[$i];
            $na += (long) $a[$i] * $a[$i];
            $nb += (long) $b[$i] * $b[$i];
          }
          ${ev.value} = (double) $dot /
            Math.max(Math.sqrt((double) $na) * Math.sqrt((double) $nb), 1e-12);
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimI8 =
    copy(left = l, right = r)
}

/** The SRP (signed-random-projection) band-key fold — 512
  * sign-of-projection bits packed 16 per band into 32 long keys — as a
  * plain kernel over Catalyst [[ArrayData]], shared by the interpreted
  * and generated paths of [[SrpBandKeys]] (the MinhashBandKernel
  * pattern: top-level object ⇒ static forwarders the generated Java
  * can call).
  *
  * The ±1 projection matrix is DETERMINISTIC (seeded xxHash64 of the
  * (bit, dimension) coordinate — zero RNG, identical on every executor
  * and every run) and built once per JVM (~2 MB of sign bytes at
  * MaxDim = 4096). Band geometry (16-bit bands × 32) is part of the
  * LSH contract: per-bit collision probability is p = 1 − θ/π, so only
  * wide bands suppress the n² random-pair mass at high cosine — the
  * canonical values live here, VectorPipeline re-exports them.
  */
object SrpBandKernel {
  final val BandBits = 16 // band key space 65536 ≫ corpus bucket sizes
  final val Bands = 32 // 512 bits; P(miss | cos = 0.95) = (1−p¹⁶)³² ≈ 2e-5
  final val MaxDim = 4096

  /** Row = projection bit, column = input dimension. Lazy: only tasks
    * that actually evaluate SRP pay the 2 MB. */
  private lazy val signs: Array[Array[Byte]] =
    Array.tabulate(Bands * BandBits) { i =>
      Array.tabulate(MaxDim) { j =>
        if ((Hashing.xxHash64Long(i.toLong * MaxDim + j, 0x53525033L) & 1L) == 1L) 1.toByte
        else (-1).toByte
      }
    }

  /** Sign row for the parity-oracle UDF (VectorPipeline keeps the
    * retired UDF as SrpLshSpec's reference, in its ORIGINAL row-fetch
    * shape so before/after measurements compare like for like) — never
    * on the hot path. */
  def signRow(bit: Int): Array[Byte] = signs(bit)

  /** 32 band keys for a dense float embedding. Null for an empty,
    * all-zero, or null-element vector (no direction ⇒ must not bucket
    * with anything); throws past MaxDim (silently truncating the
    * projection would change every key). Arithmetic is the retired
    * UDF's verbatim: float sign·component product, double accumulate,
    * `dot >= 0` bit rule — SrpLshSpec pins parity both directions. */
  def bandKeys(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n == 0) return null
    if (n > MaxDim)
      throw new IllegalArgumentException(
        s"embedding dim $n exceeds SrpBandKernel.MaxDim=$MaxDim — raise it")
    val x = new Array[Float](n)
    var nonZero = false
    var d = 0
    while (d < n) {
      if (a.isNullAt(d)) return null
      val f = a.getFloat(d)
      x(d) = f
      if (f != 0f) nonZero = true
      d += 1
    }
    if (!nonZero) return null
    val keys = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      var bits = 0L
      var j = 0
      while (j < BandBits) {
        val s = signs(b * BandBits + j)
        var dot = 0.0d
        var i = 0
        while (i < n) { dot += s(i) * x(i); i += 1 }
        bits = (bits << 1) | (if (dot >= 0) 1L else 0L)
        j += 1
      }
      keys(b) = bits
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(keys)
  }
}

/** `array<float>` embedding → `array<long>` of 32 SRP band keys as a
  * NATIVE expression — the dense-embedding sibling of
  * [[MinhashBandKeys]], retiring the last Scala UDF on a near-dup map
  * side (boxed Seq[Float] in, per-row key-array allocation, codegen
  * break). The per-row work stays on Catalyst representations (floats
  * read straight out of ArrayData, primitive long array out) and the
  * enclosing projection keeps its whole-stage-codegen span. Null/empty/
  * zero-norm/null-element input ⇒ null (a zero vector has no direction
  * and must not bucket together). */
case class SrpBandKeys(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_srp_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes an array<float> column, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    SrpBandKernel.bandKeys(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("srpKeys")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $r =
          graft.spark.catalyst.SrpBandKernel.bandKeys($a);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r;
        }
      """
    })

  override protected def withNewChildInternal(c: Expression): SrpBandKeys =
    copy(child = c)
}

/** Product-quantization kernels shared by the interpreted and generated
  * paths of [[PqEncode]] / [[PqAdcCosine]] (the SrpBandKernel pattern:
  * top-level object ⇒ static forwarders the generated Java can call).
  *
  * PQ splits a dim-D vector into `m` disjoint subvectors of D/m
  * coordinates and quantizes each against its OWN `ksub`-centroid
  * codebook (ksub ≤ 256 so a code is one byte): the vector becomes m
  * code bytes plus one float — the reconstruction norm, which is EXACT
  * because the subspaces are disjoint coordinates (|x̂|² = Σⱼ|cⱼ|²).
  * Asymmetric distance computation (ADC) then scores a RAW query
  * against encoded vectors through a per-query lookup table of
  * dot(q_j, C_j[c]) partials: one table build per query, then m table
  * lookups + one divide per corpus vector — no float decode of the
  * corpus, ever. Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search" (TPAMI 2011); cited in PAPERS.md.
  */
object PqKernel {

  /** Encode: m argmin-L2 scans (score = |c|² − 2·x_j·c; the |x_j|² term
    * is constant per subspace and dropped), ties to the SMALLEST code —
    * the codebook-scan-order determinism rule every other assigner here
    * uses. Output blob: m code bytes, then the reconstruction norm as a
    * little-endian float. Null array / wrong dim / null element ⇒ null. */
  def encode(x: ArrayData, mat: Array[Array[Array[Float]]],
      cSq: Array[Array[Double]]): Array[Byte] = {
    if (x == null) return null
    val m = mat.length
    val subdim = mat(0)(0).length
    if (x.numElements() != m * subdim) return null
    var i = 0
    while (i < m * subdim) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Byte](m + 4)
    var reconSq = 0.0d
    var j = 0
    while (j < m) {
      val base = j * subdim
      val book = mat(j)
      val sq = cSq(j)
      var best = 0
      var bestScore = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cv = book(c)
        var dot = 0.0d
        var d = 0
        while (d < subdim) { dot += (x.getFloat(base + d) * cv(d)).toDouble; d += 1 }
        val score = sq(c) - 2.0d * dot
        if (score < bestScore) { bestScore = score; best = c }
        c += 1
      }
      out(j) = best.toByte
      reconSq += sq(best)
      j += 1
    }
    val bits = java.lang.Float.floatToIntBits(math.sqrt(reconSq).toFloat)
    out(m) = bits.toByte
    out(m + 1) = (bits >>> 8).toByte
    out(m + 2) = (bits >>> 16).toByte
    out(m + 3) = (bits >>> 24).toByte
    out
  }

  /** ADC cosine: table = [ m , |q| , dot(q_j, C_j[c]) row-major
    * j·ksub+c ] (built once per query by VectorPipeline.pqAdcTable),
    * codes = an [[encode]] blob. cos ≈ Σⱼ table[2+j·ksub+codeⱼ] /
    * max(|q|·|x̂|, 1e-12) — the same divide-with-floor every cosine path
    * here uses. The explicit m header makes a books mismatch DETECTABLE:
    * without it, an m=16 blob against an m=8·ksub=64 table passes the
    * divisibility check (512 % 16 == 0) and silently scores garbage.
    * Malformed inputs (blob under 5 bytes, table m ≠ blob m, table
    * length not 2 + m·ksub, a code beyond ksub) ⇒ null, the
    * codec-boundary convention. */
  def adcCosine(table: ArrayData, codes: Array[Byte]): java.lang.Double = {
    if (table == null || codes == null || codes.length < 5) return null
    val m = codes.length - 4
    if (table.numElements() < 2 || table.getDouble(0) != m.toDouble) return null
    val tlen = table.numElements() - 2
    if (tlen <= 0 || tlen % m != 0) return null
    val ksub = tlen / m
    var dot = 0.0d
    var j = 0
    while (j < m) {
      val c = codes(j) & 0xFF
      if (c >= ksub) return null
      dot += table.getDouble(2 + j * ksub + c)
      j += 1
    }
    val bits = (codes(m) & 0xFF) | ((codes(m + 1) & 0xFF) << 8) |
      ((codes(m + 2) & 0xFF) << 16) | ((codes(m + 3) & 0xFF) << 24)
    val recon = java.lang.Float.intBitsToFloat(bits).toDouble
    java.lang.Double.valueOf(
      dot / math.max(table.getDouble(1) * recon, 1e-12d))
  }
}

/** Product-quantization encode of an array<float> column against a
  * driver-trained set of subspace codebooks (see [[PqKernel.encode]]):
  * dim floats → m bytes + 4 (the 100 TB embedding-storage shape — 21×
  * under float at m=8 on dim-64, vs 4× for [[QuantizeI8]]). The
  * codebooks ride the expression like [[CosineArgmax]]'s matrix does. */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Float]]])
  extends UnaryExpression {

  require(books.nonEmpty && books.forall(_.nonEmpty),
    "PqEncode needs at least one non-empty subspace codebook")
  require(books.forall(_.length == books.head.length) && books.head.length <= 256,
    "PqEncode subspace codebooks must share one ksub <= 256 (codes are one byte)")
  require(books.forall(_.forall(_.length == books.head.head.length)) &&
    books.head.head.nonEmpty,
    "PqEncode centroids must all have the same (positive) subdimension")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  /** Plan strings must not embed the codebooks (m·ksub·subdim floats). */
  override def stringArgs: Iterator[Any] = Iterator(child,
    s"m=${books.length}", s"ksub=${books.head.length}",
    s"subdim=${books.head.head.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes an array<float> column, got ${other.catalogString}")
  }

  @transient private[catalyst] lazy val mat: Array[Array[Array[Float]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient private[catalyst] lazy val cSq: Array[Array[Double]] =
    mat.map(_.map { c =>
      var s = 0.0d
      var i = 0
      while (i < c.length) { s += (c(i) * c(i)).toDouble; i += 1 }
      s
    })

  override def nullSafeEval(a: Any): Any =
    PqKernel.encode(a.asInstanceOf[ArrayData], mat, cSq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("graftPqMat", mat, "float[][][]")
    val sqRef = ctx.addReferenceObj("graftPqSq", cSq, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("pqBlob")
      s"""
        byte[] $r = graft.spark.catalyst.PqKernel.encode($a, $matRef, $sqRef);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r;
        }
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** ADC cosine of a per-query lookup table (array<double>, built once
  * per query — see VectorPipeline.pqAdcTable) against a [[PqEncode]]
  * blob: the PQ scoring hot path, m byte-indexed table reads per corpus
  * row instead of a dim-float dot product, inside whole-stage codegen. */
case class PqAdcCosine(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes (array<double> ADC table, binary PqEncode blob), " +
          s"got (${lt.catalogString}, ${rt.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernel.adcCosine(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("pqCos")
      s"""
        java.lang.Double $r = graft.spark.catalyst.PqKernel.adcCosine($a, $b);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r.doubleValue();
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcCosine =
    copy(left = l, right = r)
}
