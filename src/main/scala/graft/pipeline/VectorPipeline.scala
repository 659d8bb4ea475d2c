package graft.pipeline

import graft.core.Hashing
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Brute-force cosine top-k is the correctness baseline (one broadcast of
  * the query set, one scan — at 100 TB this is the only exact option and
  * it's embarrassingly parallel). IVF is the scale path: a fixed, seeded
  * centroid codebook (no training pass — deterministic), cluster
  * assignment at write time, query probes the nprobe nearest centroids so
  * the scan touches nprobe/ncentroids of the corpus.
  */
object VectorPipeline {

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Cosine similarity of two float-array columns via zip_with +
    * aggregate — pure Catalyst collection functions, codegen'd, no UDF. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    dot / greatest(na * nb, lit(1e-12d))
  }

  /** Brute-force top-k: queries (small, broadcast) × corpus (scanned once),
    * ranked per query with a window — the exact baseline. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.as("c")
      .crossJoin(broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))))
      .filter(col("c.vec_id") =!= col("q_id"))
      .select(col("q_id"), col("c.vec_id").as("n_id"),
        cosine(col("q_emb"), col("c.embedding")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic IVF codebook: the embeddings of the `ncentroids`
    * smallest vec_ids (no random training — reproducible across runs and
    * engines). Returns (centroid_id, c_emb). */
  def codebook(corpus: DataFrame, ncentroids: Int): DataFrame =
    corpus.orderBy(col("vec_id")).limit(ncentroids)
      .select(monotonically_increasing_id().as("centroid_id"), col("embedding").as("c_emb"))

  /** Assign every vector to its nearest centroid (write-time step). */
  def ivfAssign(corpus: DataFrame, book: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.crossJoin(broadcast(book))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        cosine(col("embedding"), col("c_emb")).as("cos"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("centroid_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
  }

  // -------------------------------------------- embedding-cosine near-dup
  /** SRP (signed-random-projection) LSH for DENSE embeddings at high
    * cosine thresholds. Per-bit collision probability is p = 1 − θ/π, so
    * the random-vs-near-dup gap is only 0.5 → ~0.9 at cos ≥ 0.9 — wide
    * bands (16 bits) are required to suppress the n² random-pair mass,
    * and that in turn limits SRP to high thresholds. For near-dup over
    * BINARY-support embeddings (e.g. shingle-incidence document vectors)
    * at moderate τ, minhash on the support is the right angular LSH
    * (its gap is j ≈ 0 → 0.5, vastly stronger amplification) — see
    * PipelineEntries q29, which pairs TextPipeline.minhashCandidates
    * with TextPipeline.exactCosinePairs. A 4-bit-band SRP variant of q29
    * was measured: it "recalled" everything only because ~95% of all n²
    * pairs collided somewhere — no pruning at all. */
  val SrpBandBits = 16 // band key space 65536 ≫ corpus bucket sizes
  val SrpBands = 32 // 512 bits; P(miss | cos = 0.95) = (1−p¹⁶)³² ≈ 2e-5

  /** Deterministic ±1 projection matrix: row = projection bit, column =
    * input dimension (extend Dim if embeddings grow). Seeded xxHash64, so
    * every executor and every run derives the identical matrix. */
  private val SrpMaxDim = 4096
  private lazy val srpSigns: Array[Array[Byte]] =
    Array.tabulate(SrpBands * SrpBandBits) { i =>
      Array.tabulate(SrpMaxDim) { j =>
        if ((Hashing.xxHash64Long(i.toLong * SrpMaxDim + j, 0x53525033L) & 1L) == 1L) 1.toByte
        else (-1).toByte
      }
    }

  /** 32 SRP band keys for a dense float embedding: 512 sign-of-projection
    * bits packed 16 per band. Null for null/zero-norm vectors (a zero
    * vector has no direction — and must not bucket together). */
  private val srpBandKeysUdf = udf { (vec: Seq[Float]) =>
    if (vec == null || vec.isEmpty || !vec.exists(_ != 0f)) null
    else {
      require(vec.length <= SrpMaxDim,
        s"embedding dim ${vec.length} exceeds SrpMaxDim=$SrpMaxDim — raise it in VectorPipeline")
      val keys = new Array[Long](SrpBands)
      var b = 0
      while (b < SrpBands) {
        var bits = 0L
        var j = 0
        while (j < SrpBandBits) {
          val signs = srpSigns(b * SrpBandBits + j)
          var dot = 0.0
          var d = 0
          while (d < vec.length) { dot += signs(d) * vec(d); d += 1 }
          bits = (bits << 1) | (if (dot >= 0) 1L else 0L)
          j += 1
        }
        keys(b) = bits
        b += 1
      }
      keys
    }
  }

  /** LSH candidate pairs (id_a < id_b) of likely cosine-near-dup dense
    * embeddings — the corpus-scale path when exact all-pairs is n². Same
    * shuffle shape as TextPipeline.minhashCandidates: only (id, band,
    * 8-byte key) rows move; candidates then get exact-cosine verified. */
  def srpCandidates(vecs: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val bands = vecs
      .select(col(idCol).as("id"), posexplode_outer(srpBandKeysUdf(col(embCol))).as(Seq("band", "bkey")))
      .filter(col("bkey").isNotNull)
      // shuffle-hash, not broadcast: ReusedExchange evaluates the
      // projection pipeline once (see TextPipeline.minhashCandidates)
      .hint("shuffle_hash")
    bands.as("a").join(bands.as("b"), Seq("band", "bkey"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** IVF top-k: probe the nprobe nearest centroids per query, scan only
    * those inverted lists. */
  def ivfTopK(assigned: DataFrame, book: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qc = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(book))
      .select(col("q_id"), col("q_emb"), col("centroid_id"),
        cosine(col("q_emb"), col("c_emb")).as("ccos"))
    val wq = Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("centroid_id"))
    val probes = qc.withColumn("rn", row_number().over(wq)).filter(col("rn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("centroid_id"))
    val scored = probes.join(assigned, "centroid_id")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
