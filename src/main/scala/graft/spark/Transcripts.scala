package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The north-rule input table (BASELINE.json input_hint):
  *   (conv_id string, turn_idx int, role string, text string,
  *    tool string, ts timestamp)
  * derived DETERMINISTICALLY from the driver-generated `events` table so
  * the DuckDB oracle can reconstruct the identical rows with the identical
  * SQL (no external or synthesized-at-random data). A conversation is one
  * user's event stream; turn order is the total order (ts, event_id) —
  * event_id is unique, so row_number is stable, which is what preserves
  * the per-turn text-equality invariant (BASELINE.json:15).
  */
object Transcripts {

  /** DuckDB/Spark-shared derivation (ANSI SQL both engines parse the same
    * way). Every oracleSql entry that touches transcripts is prefixed with
    * this CTE. */
  val Cte: String =
    "WITH transcripts AS (" +
      "SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id, " +
      "CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS turn_idx, " +
      "CASE WHEN event_type IN ('signup','login') THEN 'user' " +
      "WHEN event_type = 'error' THEN 'system' ELSE 'assistant' END AS role, " +
      "props AS text, event_type AS tool, ts " +
      "FROM events)"

  def events(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, TableSource.parquetDir(sfDir))

  def events(spark: SparkSession, source: TableSource): DataFrame =
    source.table(spark, "events")

  /** Spark-side construction of the same table, DataFrame-API-native.
    * The window is per-conversation (small partitions by construction);
    * the row_number never shuffles more than one conversation to a task. */
  def load(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, TableSource.parquetDir(sfDir))

  /** Same, over any [[TableSource]] (the Iceberg-deployment entry). */
  def load(spark: SparkSession, source: TableSource): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, source)
      .select(
        concat(lit("c"), col("user_id").cast("string")).as("conv_id"),
        row_number().over(w).cast("int").as("turn_idx"),
        when(col("event_type").isin("signup", "login"), "user")
          .when(col("event_type") === "error", "system")
          .otherwise("assistant").as("role"),
        col("props").as("text"),
        col("event_type").as("tool"),
        col("ts"))
  }
}
