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

object TableSource {
  /** The convention every (spark, sfDir) entry point uses today. */
  def parquetDir(dir: String): TableSource = new ParquetDirSource(dir)
}
