package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The physical-source seam (SURVEY §7.4): every table read in the
  * library routes through ONE of these, so swapping parquet directories
  * for an Iceberg (or any catalog-managed) deployment is a constructor
  * change, not a code edit.
  *
  * The sandbox ships no Iceberg runtime jar (documented in SURVEY.md), so
  * [[ParquetDirSource]] is the tested implementation; [[CatalogSource]]
  * is the drop-in for any session-configured catalog — with the Iceberg
  * extensions on the classpath, `new CatalogSource("iceberg_cat.db")`
  * makes every pipeline read an Iceberg table scan (pushdown, pruning,
  * snapshots all come from the DSv2 connector, not from this library).
  */
trait TableSource extends Serializable {
  /** Load table `name` (e.g. "events", "documents", "lineitem"). */
  def table(spark: SparkSession, name: String): DataFrame
}

/** Driver-generated testdata layout: one parquet dir per table. */
final class ParquetDirSource(dir: String) extends TableSource {
  override def table(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
  override def toString: String = s"ParquetDirSource($dir)"
}

/** Catalog-managed tables (Iceberg/Hive/DSv2): `prefix` is the
  * catalog[.namespace] the tables live under. */
final class CatalogSource(prefix: String) extends TableSource {
  override def table(spark: SparkSession, name: String): DataFrame =
    spark.table(if (prefix.isEmpty) name else s"$prefix.$name")
  override def toString: String = s"CatalogSource($prefix)"
}

/** Newline-delimited JSON dirs (one per table) — the append-log shape
  * transcript ingestion actually arrives in. `schemas` pins each
  * table's schema: at corpus scale schema INFERENCE is a full extra
  * pass over the data and silently widens types (an int64 turn_idx
  * inferred from a small sample can come back as double), so reads of
  * a pinned table fail fast on drift instead of inferring around it;
  * unpinned tables fall back to inference for exploration. */
final class JsonDirSource(dir: String,
    schemas: Map[String, org.apache.spark.sql.types.StructType] = Map.empty)
  extends TableSource {
  override def table(spark: SparkSession, name: String): DataFrame = {
    val reader = spark.read
    schemas.get(name)
      // FAILFAST delivers the fail-on-drift contract: Spark's default
      // PERMISSIVE mode would silently null drifted fields/rows instead
      .fold(reader)(sc => reader.schema(sc).option("mode", "FAILFAST"))
      .json(s"$dir/$name.json")
  }
  override def toString: String = s"JsonDirSource($dir)"
}

/** CSV dirs with headers; same pinned-schema discipline as
  * [[JsonDirSource]] (CSV inference is even weaker — everything is a
  * string without it). `multiLine` is on: transcript/document text
  * embeds newlines, which the CSV writer quotes — the default
  * line-split reader would shred those records (note the trade:
  * multiLine files are read whole, so parallelism is per FILE — keep
  * ingestion files bounded in size). `enforceSchema=false`
  * makes Spark VALIDATE the header against the pinned schema instead
  * of binding columns positionally (column-order drift fails instead
  * of silently misbinding). */
final class CsvDirSource(dir: String,
    schemas: Map[String, org.apache.spark.sql.types.StructType] = Map.empty)
  extends TableSource {
  override def table(spark: SparkSession, name: String): DataFrame = {
    val reader = spark.read.option("header", "true").option("multiLine", "true")
    schemas.get(name)
      .fold(reader.option("inferSchema", "true")) { sc =>
        reader.schema(sc)
          .option("mode", "FAILFAST")
          .option("enforceSchema", "false")
      }
      .csv(s"$dir/$name.csv")
  }
  override def toString: String = s"CsvDirSource($dir)"
}

object TableSource {
  /** The convention every (spark, sfDir) entry point uses today. */
  def parquetDir(dir: String): TableSource = new ParquetDirSource(dir)
}
