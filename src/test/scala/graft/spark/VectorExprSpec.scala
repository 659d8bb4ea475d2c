package graft.spark

import graft.spark.catalyst._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native CosineSim expression replaces the zip_with/aggregate
  * higher-order form on the ANN hot path — this spec pins:
  *   1. BIT-identical results vs the HOF formula (same float-multiply /
  *      double-accumulate order, same 1e-12 floor) on random vectors;
  *   2. codegen/interpreted parity under CODEGEN_ONLY (no silent
  *      fallback — the whole point of the native expression);
  *   3. null propagation (null array, null element, length mismatch). */
class VectorExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-vector-expr-test")
    .getOrCreate()

  /** The superseded higher-order formula, kept here as the oracle. */
  private def cosineHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    dot / greatest(na * nb, lit(1e-12d))
  }

  private def randomVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Float], Seq[Float])] = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong,
        Seq.fill(dim)((r.nextFloat() - 0.5f) * 4f),
        Seq.fill(dim)((r.nextFloat() - 0.5f) * 4f))
    }
  }

  test("native cosine is bit-identical to the higher-order formula") {
    import spark.implicits._
    // include a zero vector (floor case) and antipodal pair (cos = -1)
    val rows = randomVecs(2000, 64, seed = 11) ++ Seq(
      (9001L, Seq.fill(64)(0f), Seq.fill(64)(1f)),
      (9002L, Seq.fill(64)(1f), Seq.fill(64)(-1f)))
    val df = rows.toDF("id", "a", "b").cache()
    val mismatches = df.select(
        cosineNative($"a", $"b").as("n"), cosineHof($"a", $"b").as("h"))
      .filter($"n" =!= $"h" || ($"n".isNull =!= $"h".isNull))
      .count()
    assert(mismatches === 0L, "native and HOF cosine must agree bit-for-bit")
    // sanity: values are real cosines
    val anti = df.filter($"id" === 9002L).select(cosineNative($"a", $"b")).head.getDouble(0)
    assert(math.abs(anti + 1.0) < 1e-9)
    df.unpersist()
  }

  test("codegen compiles and agrees with interpreted (CODEGEN_ONLY, NO_CODEGEN)") {
    import spark.implicits._
    val df = randomVecs(500, 48, seed = 23).toDF("id", "a", "b").cache()
    def run(): Array[Double] =
      df.orderBy($"id").select(cosineNative($"a", $"b")).collect().map(_.getDouble(0))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val cg = try run() finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val in = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(cg.toSeq === in.toSeq)
    df.unpersist()
  }

  test("null propagation: null array, null element, length mismatch") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(Some(1f), Some(2f))), Some(Seq(Some(1f), Some(2f)))),
      (2L, None, Some(Seq(Some(1f), Some(2f)))),
      (3L, Some(Seq(Some(1f), None)), Some(Seq(Some(1f), Some(2f)))),
      (4L, Some(Seq(Some(1f), Some(2f), Some(3f))), Some(Seq(Some(1f), Some(2f)))))
      .toDF("id", "a", "b")
    val got = df.orderBy($"id")
      .select(cosineNative($"a", $"b").as("c")).collect().map(r => r.isNullAt(0))
    assert(got.toSeq === Seq(false, true, true, true))
  }

  // ------------------------------------------------------------ CosineArgmax

  private val bookIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 7L)
  private def bookVecs(dim: Int): Seq[Seq[Float]] = {
    val r = new scala.util.Random(101)
    bookIds.map(_ => Seq.fill(dim)((r.nextFloat() - 0.5f) * 2f))
  }

  test("argmax expression matches per-centroid cosine scoring + (cos desc, id asc)") {
    import spark.implicits._
    val dim = 32
    val book = bookVecs(dim)
    // random vectors, plus: an exact duplicate of centroid 2 (cos = 1 winner),
    // a zero vector (every cosine hits the 1e-12 floor at 0.0 — tie across
    // ALL centroids must pick the smallest id), and a tie between two
    // identical centroids added below
    val rows = randomVecs(1500, dim, seed = 31).map { case (id, a, _) => (id, a) } ++
      Seq((9001L, book(2)), (9002L, Seq.fill(dim)(0f)))
    val df = rows.toDF("vec_id", "embedding").cache()

    val native = df.select($"vec_id",
      cosineArgmaxNative($"embedding", bookIds, book).as("cid"))

    // oracle: score every centroid with the (already parity-pinned) native
    // cosine, take max by (cos, -id) — the round-2 windowed semantics
    val scored = bookIds.zip(book).map { case (cid, c) =>
      struct(cosineNative($"embedding", typedLit(c)).as("cos"),
        lit(-cid).as("negid"))
    }
    val oracle = df.select($"vec_id",
      (-array_max(array(scored: _*)).getField("negid")).as("cid"))

    assert(native.exceptAll(oracle).isEmpty && oracle.exceptAll(native).isEmpty,
      "fused argmax must agree with per-centroid scoring everywhere")
    val dup = native.filter($"vec_id" === 9001L).head.getLong(1)
    assert(dup === 2L, "an exact centroid copy must route to that centroid")
    val zero = native.filter($"vec_id" === 9002L).head.getLong(1)
    assert(zero === 0L, "an all-tie row must break to the smallest centroid id")
    df.unpersist()
  }

  test("argmax ties between identical centroids break to the smaller id") {
    import spark.implicits._
    val dim = 8
    val c = Seq.fill(dim)(0.5f)
    val ids = Seq(3L, 9L) // same vector registered twice, ids out of position order
    val df = Seq((1L, c.map(x => x * 2f))).toDF("vec_id", "embedding")
    val got = df.select(cosineArgmaxNative($"embedding", ids, Seq(c, c))).head.getLong(0)
    assert(got === 3L)
  }

  test("argmax codegen compiles and agrees with interpreted") {
    import spark.implicits._
    val dim = 24
    val book = bookVecs(dim)
    val df = randomVecs(400, dim, seed = 57).map { case (id, a, _) => (id, a) }
      .toDF("vec_id", "embedding").cache()
    def run(): Array[Long] = df.orderBy($"vec_id")
      .select(cosineArgmaxNative($"embedding", bookIds, book)).collect().map(_.getLong(0))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val cg = try run() finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val in = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(cg.toSeq === in.toSeq)
    df.unpersist()
  }

  test("graft_cosine / graft_quantize_i8 / graft_cosine_i8 on the SQL surface") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((Seq(1f, 0f), Seq(1f, 0f)), (Seq(1f, 0f), Seq(0f, 1f)))
      .toDF("a", "b").createOrReplaceTempView("vecs_sql_test")
    val got = spark.sql("SELECT graft_cosine(a, b) AS c FROM vecs_sql_test ORDER BY c")
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-12 && math.abs(got(1) - 1.0) < 1e-12)
    val gotI8 = spark.sql(
      "SELECT graft_cosine_i8(graft_quantize_i8(a), graft_quantize_i8(b)) AS c " +
        "FROM vecs_sql_test ORDER BY c").collect().map(_.getDouble(0))
    assert(math.abs(gotI8(0)) < 1e-12 && math.abs(gotI8(1) - 1.0) < 1e-12)
  }

  test("argmax null propagation: null embedding, null element, dim mismatch") {
    import spark.implicits._
    val dim = 4
    val book = Seq(Seq.fill(dim)(1f))
    val df = Seq(
      (1L, Some(Seq(Some(1f), Some(2f), Some(3f), Some(4f)))),
      (2L, None),
      (3L, Some(Seq(Some(1f), None, Some(3f), Some(4f)))),
      (4L, Some(Seq(Some(1f), Some(2f)))))
      .toDF("id", "embedding")
    val got = df.orderBy($"id")
      .select(cosineArgmaxNative($"embedding", Seq(0L), book)).collect().map(_.isNullAt(0))
    assert(got.toSeq === Seq(false, true, true, true))
  }

  // ---------------------------------------------------- QuantizeI8 + i8 cosine

  test("int8 quantization: exact values, scale cancellation, cosine fidelity") {
    import spark.implicits._
    // hand-computable vector: max|x| = 4 → scale 127/4 = 31.75
    val df = Seq((1L, Seq(4f, -4f, 2f, 0f, 1f))).toDF("id", "a")
    val q = df.select(quantizeI8($"a")).head.getAs[Array[Byte]](0)
    assert(q.toSeq === Seq[Byte](127, -127, 64, 0, 32)) // round(31.75·x)
    // scale cancellation: a and 1000·a quantize to the SAME bytes
    val scaled = Seq((1L, Seq(4000f, -4000f, 2000f, 0f, 1000f))).toDF("id", "a")
    assert(scaled.select(quantizeI8($"a")).head.getAs[Array[Byte]](0).toSeq === q.toSeq)
    // cosine fidelity on random vectors: |i8 cosine − float cosine| small
    val rows = randomVecs(1000, 64, seed = 77)
    val maxErr = rows.toDF("id", "a", "b")
      .select(abs(cosineI8(quantizeI8($"a"), quantizeI8($"b"))
        - cosineNative($"a", $"b")).as("err"))
      .agg(max($"err")).head.getDouble(0)
    assert(maxErr < 0.02, s"int8 cosine deviates $maxErr from float cosine")
    // zero vector: all-zero bytes, cosine floors to 0.0 like the float path
    val z = Seq((1L, Seq(0f, 0f), Seq(1f, 2f))).toDF("id", "a", "b")
    assert(z.select(quantizeI8($"a")).head.getAs[Array[Byte]](0).toSeq === Seq[Byte](0, 0))
    assert(z.select(cosineI8(quantizeI8($"a"), quantizeI8($"b"))).head.getDouble(0) === 0.0)
  }

  test("int8 expressions: codegen agrees with interpreted; null propagation") {
    import spark.implicits._
    val df = randomVecs(300, 32, seed = 91).toDF("id", "a", "b").cache()
    def run(): Array[Double] = df.orderBy($"id")
      .select(cosineI8(quantizeI8($"a"), quantizeI8($"b"))).collect().map(_.getDouble(0))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val cg = try run() finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val in = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(cg.toSeq === in.toSeq)
    df.unpersist()
    // nulls: null array / null element → null blob; length mismatch → null cosine
    val nulls = Seq(
      (1L, Some(Seq(Some(1f), Some(2f)))),
      (2L, None),
      (3L, Some(Seq(Some(1f), None))))
      .toDF("id", "a")
    val got = nulls.orderBy($"id").select(quantizeI8($"a")).collect().map(_.isNullAt(0))
    assert(got.toSeq === Seq(false, true, true))
    val mism = Seq((Array[Byte](1, 2), Array[Byte](1, 2, 3))).toDF("x", "y")
    assert(mism.select(cosineI8($"x", $"y")).head.isNullAt(0))
  }
}
