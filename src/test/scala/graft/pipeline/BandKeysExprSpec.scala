package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native MinhashBandKeys expression replaces the Scala band-key UDF
  * on the dominant map side of q13/q29/q43 — this spec pins:
  *   1. value identity vs the independent per-row Scala reference
  *     (TextPipeline.bandKeysOf — java.lang.String decode path, shares
  *     no Catalyst plumbing with the expression) on the real corpus;
  *   2. codegen/interpreted parity under CODEGEN_ONLY (no silent
  *     fallback can mask a bad emit);
  *   3. null semantics (null / empty shingle array ⇒ null keys — short
  *     docs must NOT bucket together);
  *   4. the LSH candidate relation is unchanged end-to-end vs a UDF
  *     twin built from the reference. */
class BandKeysExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-bandkeys-expr-test")
    .getOrCreate()

  private def shingled = TextPipeline.withShingles(
    TextPipeline.documents(spark, "/root/testdata/sf0.001"), "__sh")

  test("expression matches the per-row Scala reference on the real corpus") {
    val got = shingled
      .select(col("doc_id"), col("__sh"),
        graft.spark.catalyst.minhashBandKeys(col("__sh")).as("keys"))
      .collect()
    assert(got.nonEmpty)
    var checkedNonEmpty = 0
    got.foreach { r =>
      val sh = r.getSeq[String](1)
      if (sh == null || sh.isEmpty) assert(r.isNullAt(2))
      else {
        assert(r.getSeq[Long](2) == TextPipeline.bandKeysOf(sh).toSeq,
          s"band keys diverged for doc ${r.getLong(0)}")
        checkedNonEmpty += 1
      }
    }
    assert(checkedNonEmpty > 0, "corpus had no shingled docs to check")
  }

  test("codegen compiles and agrees with interpreted (CODEGEN_ONLY, NO_CODEGEN)") {
    val df = shingled.cache()
    def run(): Seq[Seq[Long]] = df.orderBy(col("doc_id"))
      .select(graft.spark.catalyst.minhashBandKeys(col("__sh")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0)).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val cg = try run() finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val in = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(cg == in)
    df.unpersist()
  }

  test("null semantics: null and empty arrays produce null keys") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq("a b c", "b c d"))),
      (2L, Some(Seq.empty[String])),
      (3L, Option.empty[Seq[String]]))
      .toDF("doc_id", "__sh")
    val got = df.orderBy(col("doc_id"))
      .select(graft.spark.catalyst.minhashBandKeys(col("__sh"))).collect()
    assert(!got(0).isNullAt(0) && got(0).getSeq[Long](0).length == TextPipeline.MinhashBands)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))

    // a null ELEMENT is corrupt data and must FAIL LOUDLY, not silently
    // drop the doc out of candidate generation (the retired UDF NPE'd)
    val corrupt = Seq((1L, Seq("a b c", null))).toDF("doc_id", "__sh")
    val ex = intercept[Exception](
      corrupt.select(graft.spark.catalyst.minhashBandKeys(col("__sh"))).collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("null shingle")))
  }

  test("LSH candidate pairs unchanged vs a UDF twin of the reference") {
    val sh = shingled.cache()
    val native = TextPipeline.minhashCandidatesFromShingled(sh)
    // UDF twin built HERE from the reference implementation — the exact
    // shape the production path used before the native expression
    val bandKeysUdf = udf { (s: Seq[String]) =>
      if (s == null || s.isEmpty) null else TextPipeline.bandKeysOf(s)
    }
    val bands = sh
      .select(col("doc_id"), posexplode_outer(bandKeysUdf(col("__sh"))).as(Seq("band", "bkey")))
      .filter(col("bkey").isNotNull)
      .hint("shuffle_hash")
    val viaUdf = bands.as("a").join(bands.as("b"), Seq("band", "bkey"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    assert(native.exceptAll(viaUdf).isEmpty && viaUdf.exceptAll(native).isEmpty,
      "candidate relation changed under the native band-key expression")
    sh.unpersist()
  }
}
