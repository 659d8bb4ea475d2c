package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SRP (signed-random-projection) LSH over dense embeddings: the
  * high-cosine near-dup candidate path for vector columns, where minhash
  * has no support set to work with. Planted-pair corpus: recall must be
  * total AND the candidate set must actually prune (the whole point of
  * LSH — a candidate set near n² is a failed design even if it "recalls"
  * everything; the 4-bit-band variant failed exactly that way). */
class SrpLshSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-srp-test")
    .getOrCreate()

  private val Dim = 64

  /** Seeded unit-ish gaussian vector. */
  private def randVec(rnd: scala.util.Random): Array[Float] =
    Array.fill(Dim)(rnd.nextGaussian().toFloat)

  /** Slightly perturbed copy: cosine ≥ ~0.95 to the original. */
  private def perturb(v: Array[Float], rnd: scala.util.Random): Array[Float] = {
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    v.map(x => x + (rnd.nextGaussian() * 0.12 * norm / math.sqrt(Dim)).toFloat)
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na * nb)
  }

  test("srpCandidates: full recall of planted cos>=0.9 pairs, real pruning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val n = 200
    val base = (0 until n).map(i => (i.toLong, randVec(rnd)))
    val dups = (0 until 20).map { i =>
      val (origId, origVec) = base(i * 3)
      (1000L + origId, perturb(origVec, rnd))
    }
    val all = base ++ dups
    // planted pairs really are high-cosine, random pairs really are not
    val planted = dups.map { case (dupId, dupVec) =>
      val (origId, origVec) = base.find(_._1 == dupId - 1000L).get
      assert(cosine(origVec, dupVec) >= 0.9, s"fixture drift: pair $origId")
      (origId, dupId)
    }
    val vecs = all.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val cands = VectorPipeline.srpCandidates(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    planted.foreach { case (a, b) =>
      assert(cands.contains((a, b)), s"SRP missed planted pair ($a,$b)")
    }
    // pruning: candidates must be a small fraction of the ~24k possible pairs
    val nPairs = all.size.toLong * (all.size - 1) / 2
    assert(cands.size < nPairs / 10,
      s"SRP did not prune: ${cands.size} candidates of $nPairs pairs")
  }

  test("srpCandidates: zero and null vectors never become candidates") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val rows = Seq(
      (1L, Option(randVec(rnd).toSeq)),
      (2L, Option(Array.fill(Dim)(0f).toSeq)),
      (3L, Option(Array.fill(Dim)(0f).toSeq)),
      (4L, None: Option[Seq[Float]])
    ).toDF("vec_id", "embedding")
    val cands = VectorPipeline.srpCandidates(rows).collect()
    assert(cands.isEmpty, s"zero/null vectors paired: ${cands.mkString(",")}")
  }

  test("native SrpBandKeys == reference UDF both directions (real + edge vectors)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17L)
    val synth = (0 until 300).map(i => (i.toLong, Option(randVec(rnd).toSeq)))
    val edges = Seq(
      (900L, Option(Array.fill(Dim)(0f).toSeq)), // zero norm → null
      (901L, None: Option[Seq[Float]]), // null → null
      (902L, Option(Seq.empty[Float])), // empty → null
      (903L, Option(Seq(1f))), // dim 1 (≠ matrix dim — any dim ≤ MaxDim is legal)
      (904L, Option(Seq(-1f, 2f, -3f))))
    val df = (synth ++ edges).toDF("vec_id", "embedding")
      // real parquet embeddings too, so the parity evidence covers the
      // actual near-dup input distribution, not just gaussians
      .unionByName(VectorPipeline.embeddings(spark, "/root/testdata/sf0.001")
        .select(col("vec_id") + 10000L as "vec_id", col("embedding")))
    val both = df.select(col("vec_id"),
      graft.spark.catalyst.srpBandKeysNative(col("embedding")).as("native"),
      VectorPipeline.srpBandKeysUdf(col("embedding")).as("ref")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val n = if (r.isNullAt(1)) null else r.getSeq[Long](1)
      val u = if (r.isNullAt(2)) null else r.getSeq[Long](2)
      assert(n == u, s"vec ${r.getLong(0)}: native $n != udf $u")
    }
  }

  test("exactCosinePairs equals brute-force binary cosine on a small corpus") {
    import spark.implicits._
    val words = (0 until 40).map(i => s"w$i")
    val rnd = new scala.util.Random(13L)
    val docs = (0 until 30).map(i =>
      (i.toLong, rnd.shuffle(words).take(15).mkString(" "))) ++
      Seq((100L, "a b c d e f g h"), (101L, "a b c d e f g h i"))
    val df = docs.toDF("doc_id", "text")
    // brute-force oracle from the shingle sets
    val sets = df.select($"doc_id", TextPipeline.shingles3($"text").as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet)).sortBy(_._1)
    val expected = (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (ida, sa) = sets(i); (idb, sb) = sets(j)
      if sa.nonEmpty && sb.nonEmpty
      c = sa.intersect(sb).size
      if 25L * c * c >= 9L * sa.size * sb.size // cos >= 3/5
    } yield (ida, idb)).toSet
    val got = TextPipeline.exactCosinePairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(expected.contains((100L, 101L))) // the planted high-cos pair
  }
}
