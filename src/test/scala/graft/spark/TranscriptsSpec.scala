package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The north-rule per-row invariant (BASELINE.json input_hint): per-turn
  * TEXT EQUALITY under stable (conv_id, turn_idx) ordering. The
  * transcript table must be a deterministic function of the events table
  * with (conv_id, turn_idx) a dense unique key, so any two derivations —
  * different partitioning, different session — agree on every turn's
  * text, and the DuckDB oracle (same ANSI CTE) reconstructs the
  * identical rows. */
object TranscriptsSpec {
  /** input_hint schema as a typed Dataset row (top-level so the
    * case-class encoder resolves). */
  case class Turn(conv_id: String, turn_idx: Int, role: String,
      text: String, tool: String, ts: java.sql.Timestamp)
}

class TranscriptsSpec extends AnyFunSuite {
  import TranscriptsSpec.Turn

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-transcripts-test")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("(conv_id, turn_idx) is a dense unique ordering key") {
    val t = Transcripts.load(spark, sf).cache()
    val n = t.count()
    assert(t.select(col("conv_id"), col("turn_idx")).distinct().count() === n,
      "(conv_id, turn_idx) not unique — ordering is not stable")
    // dense 1..len per conversation (row_number over a total order)
    val holes = t.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n"), max(col("turn_idx")).as("mx"), min(col("turn_idx")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1).count()
    assert(holes === 0L, "turn_idx not dense 1..len within conversations")
    t.unpersist()
  }

  test("per-turn text equality: independent derivations agree on every turn's text") {
    // same derivation under adversarial repartitioning — the window's
    // total order (ts, event_id) must make text a pure function of
    // (conv_id, turn_idx)
    val a = Transcripts.load(spark, sf)
      .select(col("conv_id"), col("turn_idx"), col("text"))
    val b = Transcripts.load(spark, sf.stripSuffix("/"))
      .repartition(17, col("turn_idx"))
      .select(col("conv_id"), col("turn_idx"), col("text"))
    // null-safe inequality: a null-vs-value divergence must fail too
    assert(a.join(b, Seq("conv_id", "turn_idx"))
      .filter(!(a("text") <=> b("text"))).count() === 0L,
      "same (conv_id, turn_idx) produced different text across derivations")
    assert(a.count() === b.count())
  }

  test("typed Dataset surface: input_hint schema binds to a case-class encoder") {
    import spark.implicits._
    val ds = Transcripts.load(spark, sf)
      .withColumn("ts", col("ts").cast("timestamp")).as[Turn]
    val first = ds.filter(_.turn_idx == 1).head()
    assert(first.conv_id.nonEmpty && first.text != null)
    assert(ds.count() > 0)
  }

  test("CatalogSource drives a pipeline query end-to-end (the Iceberg drop-in seam)") {
    // the seam is EXECUTED, not just compiled: testdata registered as
    // catalog-visible temp views, then the q12 dedup aggregation runs
    // through CatalogSource and must agree with the ParquetDirSource run
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("documents")
    try {
      val viaCatalog = graft.pipeline.TextPipeline
        .documents(spark, new CatalogSource(""))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_distinct_texts"))
        .head
      val viaParquet = graft.pipeline.TextPipeline.documents(spark, sf)
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_distinct_texts"))
        .head
      assert(viaCatalog === viaParquet)
      assert(viaCatalog.getLong(0) > 0)
    } finally spark.catalog.dropTempView("documents")
  }

  test("JsonDirSource / CsvDirSource read the same rows with pinned schemas") {
    // the append-log ingestion formats: export the documents table to
    // ndjson + csv, read back through the seam with the PINNED parquet
    // schema (no inference pass), and the dedup aggregation must agree
    val base = s"/tmp/graft_srcfmt_${java.util.UUID.randomUUID()}"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    try {
      docs.coalesce(1).write.json(s"$base/documents.json")
      docs.coalesce(1).write.option("header", "true").csv(s"$base/documents.csv")
      val pinned = Map("documents" -> docs.schema)
      val expected = docs
        .agg(count(lit(1)).as("n"), countDistinct(col("text")).as("d")).head
      for (src <- Seq(new JsonDirSource(base, pinned), new CsvDirSource(base, pinned))) {
        val got = graft.pipeline.TextPipeline.documents(spark, src)
          .agg(count(lit(1)).as("n"), countDistinct(col("text")).as("d")).head
        assert(got === expected, s"$src disagrees with parquet")
        // the pinned schema came through (no silent type widening)
        assert(src.table(spark, "documents").schema("doc_id").dataType
          === docs.schema("doc_id").dataType, s"$src widened doc_id")
      }
    } finally {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
