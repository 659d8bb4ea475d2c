package graft.spark.catalyst

import graft.core.Hashing
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The MinHash band-key fold (one pass per doc: 126 minhash minima →
  * 42 band keys) as a plain kernel over Catalyst [[ArrayData]] — shared
  * by the interpreted and generated code paths of [[MinhashBandKeys]].
  *
  * Top-level object so the Scala compiler emits STATIC forwarders the
  * generated Java can call (same pattern as graft.core.Hashing in
  * ProbeCodegen). The hash family is Kirsch–Mitzenmacher style over
  * (xxHash64, Murmur3-128 low64): two real hash passes per shingle +
  * 126 multiply-adds, h2 forced odd so i ↦ g_i is a bijection mod 2^64
  * (see the reference's double-hashing index scheme,
  * km_bloom_filter.rs:311–318, reused here for signature generation).
  */
object MinhashBandKernel {
  /** Rows per band and band count are part of the LSH contract (they
    * fix the candidate-probability curve); the canonical values live
    * here, TextPipeline re-exports them. */
  final val Rows = 3
  final val Bands = 42 // 126 hashes; P(candidate | j=0.5) ≈ 0.996

  /** 42 band keys for a shingle array; null for an empty array (no
    * shingles ⇒ no minima: emitting keys would bucket every short doc
    * with every other one in all bands). A NULL ELEMENT throws — it
    * means corrupt upstream data, and silently nulling the keys would
    * drop the doc out of near-dup candidate generation with no error
    * anywhere (the retired UDF failed loudly here too). Reads
    * UTF8String bytes straight out of the ArrayData — no
    * java.lang.String decode, no Seq boxing (the UDF this replaced
    * paid both per row on the dominant map side of q13/q29/q43). */
  def bandKeys(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n == 0) return null
    val mins = new Array[Long](Rows * Bands)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var idx = 0
    while (idx < n) {
      if (a.isNullAt(idx))
        throw new IllegalArgumentException(
          s"null shingle at index $idx — corrupt shingle array; a doc must " +
            "not silently drop out of near-dup candidate generation")
      val bytes = a.getUTF8String(idx).getBytes
      var g = Hashing.xxHash64(bytes, 0L)
      val step = Hashing.murmur3_64(bytes, 0L) | 1L
      var i = 0
      while (i < mins.length) {
        if (g < mins(i)) mins(i) = g
        g += step
        i += 1
      }
      idx += 1
    }
    val keys = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      var h = b.toLong
      var i = 0
      while (i < Rows) { h = Hashing.xxHash64Long(mins(b * Rows + i), h); i += 1 }
      keys(b) = h
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(keys)
  }
}

/** `array<string>` shingles → `array<long>` of 42 MinHash band keys as
  * a NATIVE expression: value-identical to the Scala UDF it replaced
  * (TextPipelineSpec pins parity against an independent per-row
  * reference), but the per-row work stays on Catalyst representations
  * (UTF8String bytes in, primitive long array out) and the enclosing
  * projection keeps its whole-stage-codegen span — the same
  * HOF/UDF→native move that bought 14.6–25.4× on CosineSim. Null or
  * empty input ⇒ null; a null ELEMENT throws (corrupt data must not
  * silently skip dedup). */
case class MinhashBandKeys(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes an array<string> column, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    MinhashBandKernel.bandKeys(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("bandKeys")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $r =
          graft.spark.catalyst.MinhashBandKernel.bandKeys($a);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r;
        }
      """
    })

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): MinhashBandKeys =
    copy(child = c)
}
