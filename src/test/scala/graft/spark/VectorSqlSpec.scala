package graft.spark

import graft.pipeline.VectorPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL face of the vector surface (GraftExtensions round-5
  * registrations): an index path built and probed END-TO-END through
  * `spark.sql` — literal-codebook `graft_cosine_argmax` assignment, a
  * partitioned write of the SQL result, and a pure-SQL probe
  * (centroid routing + inverted-list join + `graft_cosine` ranking) —
  * must return exactly what the Scala column API returns. SQL users
  * get the same engine, not a parallel implementation: every function
  * resolves to the same Catalyst expression the Scala builders inject,
  * so parity here is parity of the WIRING (literal conversion, type
  * checks, tie-breaks), which is all that is new on the SQL path. */
class VectorSqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-vector-sql-test")
    .getOrCreate()

  /** Float.toString is the shortest decimal that round-trips to the
    * same float, so SQL's double parse narrowed back to float is
    * bit-identical to the Scala-side literal injection. */
  private def sqlFloats(v: Seq[Float]): String =
    v.map(_.toString).mkString("array(", ",", ")")

  test("SQL e2e: graft_cosine_argmax builds an index path, SQL probe == Scala top-k") {
    graft.spark.catalyst.GraftExtensions.register(spark)
    val emb = VectorPipeline.embeddings(spark, "/root/testdata/sf0.001").cache()
    val book = VectorPipeline.trainedCodebook(emb, 8).cache()
    val bookRows = book.orderBy(col("centroid_id")).collect()
    val ids = bookRows.map(_.getLong(0))
    assert(ids.sameElements(ids.indices.map(_.toLong)),
      "test assumes centroid ids 0..k-1 (posexplode position == id below)")
    val idsSql = ids.mkString("array(", ",", ")")
    val centsSql = bookRows.map(r => sqlFloats(r.getSeq[Float](1)))
      .mkString("array(", ",", ")")
    emb.createOrReplaceTempView("emb_v")

    // ---- build: write-time assignment entirely in SQL
    val assignedSql = spark.sql(
      s"""SELECT vec_id, embedding,
         |  graft_cosine_argmax(embedding, $idsSql, $centsSql) AS centroid_id
         |FROM emb_v""".stripMargin)
    val assignedScala = VectorPipeline.ivfAssign(emb, book)
      .select(col("vec_id"), col("centroid_id"))
    val sqlPairs = assignedSql.select(col("vec_id"), col("centroid_id"))
    assert(sqlPairs.exceptAll(assignedScala).isEmpty &&
      assignedScala.exceptAll(sqlPairs).isEmpty,
      "SQL literal-codebook assignment differs from the Scala column path")

    val indexPath = "/tmp/graft_test_sql_ivf_index"
    assignedSql.write.partitionBy("centroid_id").mode("overwrite").parquet(indexPath)

    // ---- probe: routing, list join, scoring, ranking — all SQL.
    // Tie-breaks mirror centroidProbes (ccos desc, centroid_id) and
    // topKFromScored (cos desc, n_id); self-matches excluded as there.
    spark.read.parquet(indexPath).createOrReplaceTempView("sqlidx_v")
    val (nprobe, k) = (3, 10)
    val topSql = spark.sql(
      s"""WITH cbook AS (
         |  SELECT posexplode($centsSql) AS (cid, c_emb)
         |), probes AS (
         |  SELECT q_id, q_emb, cid, probe_rank FROM (
         |    SELECT q.vec_id AS q_id, q.embedding AS q_emb, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY graft_cosine(q.embedding, CAST(c.c_emb AS ARRAY<FLOAT>)) DESC,
         |          c.cid) AS probe_rank
         |    FROM emb_v q CROSS JOIN cbook c
         |    WHERE q.vec_id < 20
         |  ) WHERE probe_rank <= $nprobe
         |)
         |SELECT q_id, n_id FROM (
         |  SELECT p.q_id, i.vec_id AS n_id,
         |    ROW_NUMBER() OVER (PARTITION BY p.q_id
         |      ORDER BY graft_cosine(p.q_emb, i.embedding) DESC, i.vec_id) AS rnk
         |  FROM probes p JOIN sqlidx_v i ON i.centroid_id = p.cid
         |  WHERE i.vec_id != p.q_id
         |) WHERE rnk <= $k""".stripMargin)
    val topScala = VectorPipeline.ivfTopK(
        VectorPipeline.ivfAssign(emb, book), book, emb.filter(col("vec_id") < 20), k, nprobe)
      .select(col("q_id"), col("n_id"))
    assert(topSql.exceptAll(topScala).isEmpty && topScala.exceptAll(topSql).isEmpty,
      "pure-SQL index probe differs from the Scala IVF top-k")

    // ---- graft_cosine_argmax_2l: probes = coarseK degenerates to the
    // exact flat argmax — bit-level, on the SQL surface too
    val disagree = spark.sql(
      s"""SELECT COUNT(*) FROM (
         |  SELECT graft_cosine_argmax(embedding, $idsSql, $centsSql) AS flat,
         |    graft_cosine_argmax_2l(embedding, $idsSql, $centsSql, 3, 3) AS routed
         |  FROM emb_v
         |) WHERE flat IS DISTINCT FROM routed""".stripMargin).head.getLong(0)
    assert(disagree === 0L, s"$disagree rows: SQL 2l(ck=p) != flat argmax")

    // a malformed codebook literal fails at ANALYSIS, not at runtime
    val bad = intercept[Exception](spark.sql(
      s"SELECT graft_cosine_argmax(embedding, vec_id, $centsSql) FROM emb_v"))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(bad).exists(_.contains("literal array")),
      s"non-literal ids should name the contract, got: ${messages(bad)}")
    emb.unpersist(); book.unpersist()
  }

  test("graft_srp_band_keys on the SQL surface == native column expression") {
    graft.spark.catalyst.GraftExtensions.register(spark)
    val emb = VectorPipeline.embeddings(spark, "/root/testdata/sf0.001")
    emb.createOrReplaceTempView("emb_srp_v")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_srp_band_keys(embedding) AS keys FROM emb_srp_v")
    val viaCol = emb.select(col("vec_id"),
      graft.spark.catalyst.srpBandKeysNative(col("embedding")).as("keys"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty,
      "SQL-registered SRP band keys differ from the column expression")
  }
}
