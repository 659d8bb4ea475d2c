package graft.pipeline

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
