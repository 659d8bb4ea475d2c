package graft.spark.catalyst

import graft.core.{HLLSketch, KLLSketch, SketchCodec, TDigestSketch}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the native sketch expressions, registered through the
  * public SparkSessionExtensions hook:
  *
  *   spark.sql.extensions=graft.spark.catalyst.GraftExtensions
  *
  * SQL forms (sizing arguments are foldable literals):
  *   graft_bloom_agg(capacity, fpp, key...)            → binary sketch
  *   graft_bloom_agg_pair(pair, capacity, fpp, key...) → binary sketch
  *     (pair = registered hash-pair name or id: 'xx64+murmur3_64',
  *      'xx64+fnv1a64', 'fnv1a64+murmur3_64', 'xx64(0)+xx64(seeded)')
  *   graft_bloom_might_contain(sketch, key...)         → boolean
  *   graft_bloom_might_contain_pair(pair, sketch, key...) → boolean
  *   graft_hll_agg(key...)                             → binary sketch
  *   graft_cms_agg(eps, delta, key...)                 → binary sketch
  *   graft_cms_estimate(sketch, key...)                → bigint
  *   graft_tdigest_agg(value)                          → binary sketch
  *   graft_kll_agg(value)                              → binary sketch
  *   graft_cosine(a, b)                                → double
  *   graft_quantize_i8(embedding)                      → binary (1 B/dim)
  *   graft_cosine_i8(a, b)                             → double
  *   graft_srp_band_keys(embedding)                    → array<bigint> (32 keys)
  *   graft_cosine_argmax(emb, ids, cents)              → bigint centroid id
  *   graft_cosine_argmax_2l(emb, ids, cents, ck, p)    → bigint centroid id
  *     (ids/cents are literal arrays — the codebook ships inside the
  *      expression exactly as the Scala column API injects it)
  * plus the blob-level estimators from graft.spark.functions
  * (bloom_fpp, hll_estimate, …) via functions.registerAll.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, (usage, builder)) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""), builder))
    }
}

object GraftExtensions {

  private def lit2Long(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal integer")
    e.eval(null) match {
      case v: Long => v
      case v: Int => v.toLong
      case v: Short => v.toLong
      case other => throw new IllegalArgumentException(s"$what must be a literal integer, got $other")
    }
  }

  private def lit2Double(e: Expression, what: String): Double = {
    require(e.foldable, s"$what must be a literal number")
    e.eval(null) match {
      case v: Double => v
      case v: Float => v.toDouble
      case v: org.apache.spark.sql.types.Decimal => v.toDouble
      case v: java.math.BigDecimal => v.doubleValue()
      case v: Int => v.toDouble
      case v: Long => v.toDouble
      case other => throw new IllegalArgumentException(s"$what must be a literal number, got $other")
    }
  }

  /** Foldable `array<bigint>` literal → Seq[Long] (codebook centroid ids
    * in the SQL argmax forms; `array(0, 1, ...)` int literals widen). */
  private def lit2LongSeq(e: Expression, what: String): Seq[Long] = {
    require(e.foldable, s"$what must be a literal array of integers")
    import org.apache.spark.sql.types.{ArrayType => AT}
    (e.dataType, e.eval(null)) match {
      case (AT(et, _), a: org.apache.spark.sql.catalyst.util.ArrayData) =>
        a.toObjectArray(et).toSeq.map {
          case v: java.lang.Long => v.longValue()
          case v: java.lang.Integer => v.longValue()
          case v: java.lang.Short => v.longValue()
          case other => throw new IllegalArgumentException(
            s"$what must contain integer literals, got $other")
        }
      case other => throw new IllegalArgumentException(
        s"$what must be a literal array of integers, got $other")
    }
  }

  /** Foldable `array<array<float|double>>` literal → Seq[Seq[Float]] (the
    * codebook matrix in the SQL argmax forms; SQL numeric literals are
    * double, so doubles narrow to the expressions' float arithmetic). */
  private def lit2FloatMatrix(e: Expression, what: String): Seq[Seq[Float]] = {
    require(e.foldable, s"$what must be a literal array of float arrays")
    import org.apache.spark.sql.types.{ArrayType => AT}
    def num2Float(v: Any): Float = v match {
      case f: Float => f
      case d: Double => d.toFloat
      case d: org.apache.spark.sql.types.Decimal => d.toDouble.toFloat
      case i: Int => i.toFloat
      case l: Long => l.toFloat
      case other => throw new IllegalArgumentException(
        s"$what must contain numeric literals, got $other")
    }
    (e.dataType, e.eval(null)) match {
      case (AT(AT(et, _), _), a: org.apache.spark.sql.catalyst.util.ArrayData) =>
        (0 until a.numElements()).map { i =>
          val row = a.getArray(i)
          require(row != null, s"$what must not contain null rows")
          row.toObjectArray(et).toSeq.map(num2Float)
        }
      case other => throw new IllegalArgumentException(
        s"$what must be a literal array of float arrays, got $other")
    }
  }

  /** Resolve a registered KM hash pair from a SQL literal: its name
    * (string) or stable id (integer) — the SQL twin of the Scala-side
    * `bloomAggNativePair(…, pair)` injection. */
  private def lit2Pair(e: Expression, what: String): graft.core.RegisteredKMHashPair = {
    require(e.foldable, s"$what must be a literal hash-pair name or id")
    e.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String =>
        val name = s.toString
        graft.core.KMHashPair.registered.find(_.name == name).getOrElse(
          throw new IllegalArgumentException(s"$what: unknown hash pair '$name' — " +
            s"registered: ${graft.core.KMHashPair.registered.map(_.name).mkString(", ")}"))
      case v: Int => byCheckedId(v.toLong, what)
      case v: Long => byCheckedId(v, what)
      case other => throw new IllegalArgumentException(
        s"$what must be a literal hash-pair name or id, got $other")
    }
  }

  /** Pair-id lookup with an explicit range check: a bare `toByte` would
    * WRAP an out-of-range id (256 → 0, 257 → 1) and silently resolve a
    * typo to the wrong registered pair. */
  private def byCheckedId(v: Long, what: String): graft.core.RegisteredKMHashPair = {
    require(v >= Byte.MinValue && v <= Byte.MaxValue,
      s"$what: hash-pair id $v out of byte range — registered ids: " +
        graft.core.KMHashPair.registered.map(_.id).mkString(", "))
    graft.core.KMHashPair.byId(v.toByte)
  }

  private[catalyst] val builders: Seq[(String, (String, Seq[Expression] => Expression))] = Seq(
    "graft_bloom_agg" -> ("graft_bloom_agg(capacity, fpp, key...) - mergeable KM Bloom sketch",
      (args: Seq[Expression]) => {
        require(args.length >= 3, "graft_bloom_agg(capacity, fpp, key...)")
        BloomSketchAgg(args.drop(2), lit2Long(args(0), "capacity"), lit2Double(args(1), "fpp"))
          .toAggregateExpression()
      }),
    "graft_bloom_agg_pair" ->
      ("graft_bloom_agg_pair(pair, capacity, fpp, key...) - KM Bloom sketch with an " +
        "injected registered hash pair (the reference's KMBloomFilter<H1,H2> genericity in SQL)",
      (args: Seq[Expression]) => {
        require(args.length >= 4, "graft_bloom_agg_pair(pair, capacity, fpp, key...)")
        BloomSketchAgg(args.drop(3), lit2Long(args(1), "capacity"),
          lit2Double(args(2), "fpp"), lit2Pair(args(0), "graft_bloom_agg_pair pair").id)
          .toAggregateExpression()
      }),
    "graft_bloom_might_contain_pair" ->
      ("graft_bloom_might_contain_pair(pair, sketch, key...) - pair-aware membership probe " +
        "(the blob's pair id is verified at decode; a mismatched probe fails fast)",
      (args: Seq[Expression]) => {
        require(args.length >= 3, "graft_bloom_might_contain_pair(pair, sketch, key...)")
        BloomMightContain(args(1), args.drop(2),
          lit2Pair(args(0), "graft_bloom_might_contain_pair pair").id)
      }),
    "graft_bloom_might_contain" -> ("graft_bloom_might_contain(sketch, key...) - membership probe",
      (args: Seq[Expression]) => {
        require(args.length >= 2, "graft_bloom_might_contain(sketch, key...)")
        BloomMightContain(args.head, args.tail)
      }),
    "graft_hll_agg" -> ("graft_hll_agg(key...) - mergeable HyperLogLog sketch",
      (args: Seq[Expression]) => {
        require(args.nonEmpty, "graft_hll_agg(key...)")
        HllSketchAgg(args).toAggregateExpression()
      }),
    "graft_cms_agg" -> ("graft_cms_agg(eps, delta, key...) - mergeable count-min sketch",
      (args: Seq[Expression]) => {
        require(args.length >= 3, "graft_cms_agg(eps, delta, key...)")
        CmsSketchAgg(args.drop(2), lit2Double(args(0), "eps"), lit2Double(args(1), "delta"))
          .toAggregateExpression()
      }),
    "graft_cms_estimate" -> ("graft_cms_estimate(sketch, key...) - frequency estimate",
      (args: Seq[Expression]) => {
        require(args.length >= 2, "graft_cms_estimate(sketch, key...)")
        CmsEstimate(args.head, args.tail)
      }),
    "graft_tdigest_agg" -> ("graft_tdigest_agg(value) - mergeable t-digest sketch",
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_tdigest_agg(value)")
        TDigestSketchAgg(args.head).toAggregateExpression()
      }),
    "graft_kll_agg" -> ("graft_kll_agg(value) - mergeable KLL sketch",
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_kll_agg(value)")
        KllSketchAgg(args.head).toAggregateExpression()
      }),
    "graft_theta_agg" -> ("graft_theta_agg(key...) - mergeable theta (KMV) sketch",
      (args: Seq[Expression]) => {
        require(args.nonEmpty, "graft_theta_agg(key...)")
        ThetaSketchAgg(args).toAggregateExpression()
      }),
    "graft_bottomk_sample_agg" -> ("graft_bottomk_sample_agg(k, key) - deterministic bottom-k distinct sample",
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_bottomk_sample_agg(k, key)")
        val k = lit2Long(args.head, "graft_bottomk_sample_agg k")
        require(k >= 1 && k <= Int.MaxValue,
          s"graft_bottomk_sample_agg k out of range: $k")
        BottomKSampleAgg(args(1), k.toInt).toAggregateExpression()
      }),
    "graft_weighted_bottomk_agg" ->
      ("graft_weighted_bottomk_agg(k, key, weight) - deterministic weighted bottom-k " +
        "distinct sample (A-ES race keys; inclusion probability ~ k*w/sum(w))",
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_weighted_bottomk_agg(k, key, weight)")
        val k = lit2Long(args.head, "graft_weighted_bottomk_agg k")
        require(k >= 1 && k <= Int.MaxValue,
          s"graft_weighted_bottomk_agg k out of range: $k")
        WeightedBottomKSampleAgg(args(1),
          org.apache.spark.sql.catalyst.expressions.Cast(args(2),
            org.apache.spark.sql.types.DoubleType), k.toInt).toAggregateExpression()
      }),
    "graft_sketch_merge_agg" -> ("graft_sketch_merge_agg(blob) - fold sketch blobs into one",
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_sketch_merge_agg(blob)")
        SketchMergeAgg(args.head).toAggregateExpression()
      }),
    "graft_cosine" -> ("graft_cosine(a, b) - cosine similarity of two array<float> embeddings",
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine(a, b)")
        CosineSim(args(0), args(1))
      }),
    "graft_bloom_might_contain_keyed" ->
      ("graft_bloom_might_contain_keyed(cache_key, sketch, key...) - shard-table probe " +
        "(cache_key bounds blob decode to once per distinct key per task)",
      (args: Seq[Expression]) => {
        require(args.length >= 3, "graft_bloom_might_contain_keyed(cache_key, sketch, key...)")
        BloomMightContainKeyed(args(0), args(1), args.drop(2))
      }),
    "graft_mg_agg" -> ("graft_mg_agg(k, key) - Misra-Gries heavy hitters (deterministic, undercount-only)",
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_mg_agg(k, key)")
        val k = lit2Long(args.head, "graft_mg_agg k")
        require(k >= 1 && k <= Int.MaxValue, s"graft_mg_agg k out of range: $k")
        MgSketchAgg(args(1), k.toInt).toAggregateExpression()
      }),
    "graft_quantize_i8" ->
      ("graft_quantize_i8(embedding) - symmetric int8 quantization of array<float> to binary",
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_quantize_i8(embedding)")
        QuantizeI8(args.head)
      }),
    "graft_cosine_i8" ->
      ("graft_cosine_i8(a, b) - cosine similarity of two graft_quantize_i8 blobs",
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine_i8(a, b)")
        CosineSimI8(args(0), args(1))
      }),
    "graft_minhash_band_keys" ->
      ("graft_minhash_band_keys(shingles) - 42 MinHash band keys of an array<string> " +
        "(LSH near-dup signature step; null for empty input)",
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_minhash_band_keys(shingles)")
        MinhashBandKeys(args.head)
      }),
    "graft_srp_band_keys" ->
      ("graft_srp_band_keys(embedding) - 32 SRP band keys of an array<float> embedding " +
        "(dense-vector LSH near-dup signature step; null for zero-norm/empty input)",
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_srp_band_keys(embedding)")
        SrpBandKeys(args.head)
      }),
    "graft_cosine_argmax" ->
      ("graft_cosine_argmax(embedding, ids, centroids) - nearest-centroid id by cosine " +
        "against a LITERAL codebook (ids array<bigint> ascending, centroids array<array<float>>); " +
        "the IVF write-time assignment in SQL",
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_cosine_argmax(embedding, ids, centroids)")
        CosineArgmax(args(0), lit2LongSeq(args(1), "graft_cosine_argmax ids"),
          lit2FloatMatrix(args(2), "graft_cosine_argmax centroids"))
      }),
    "graft_cosine_argmax_2l" ->
      ("graft_cosine_argmax_2l(embedding, ids, centroids, coarseK, probes) - two-level " +
        "coarse->fine nearest-centroid assignment against a LITERAL codebook; " +
        "probes = coarseK degenerates to the exact flat argmax",
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "graft_cosine_argmax_2l(embedding, ids, centroids, coarseK, probes)")
        val ck = lit2Long(args(3), "graft_cosine_argmax_2l coarseK")
        val p = lit2Long(args(4), "graft_cosine_argmax_2l probes")
        require(ck >= 1 && ck <= Int.MaxValue && p >= 1 && p <= Int.MaxValue,
          "graft_cosine_argmax_2l coarseK and probes must be positive integers")
        CosineArgmaxTwoLevel(args(0),
          lit2LongSeq(args(1), "graft_cosine_argmax_2l ids"),
          lit2FloatMatrix(args(2), "graft_cosine_argmax_2l centroids"),
          ck.toInt, p.toInt)
      }))

  /** Runtime registration into an existing session (same builders the
    * spark.sql.extensions path injects at session creation). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, (_, builder)) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
