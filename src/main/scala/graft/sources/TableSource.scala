package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The physical-source seam: every library-surface table read goes through
  * [[read]], dispatched on one session conf. The reference's production
  * input is an Iceberg table of Common-Crawl-style web pages
  * (BASELINE.json input_hint); this sandbox has no Iceberg jars offline
  * (verified in COVERAGE.md), so the parquet path is the one exercised
  * here — but a cluster that has the Iceberg runtime on the classpath and
  * a catalog configured flips EVERY read site with
  * `spark.conf.set("spark.graft.source.format", "iceberg")`, no code
  * changes. Downstream operators are format-agnostic by construction
  * (they take plain DataFrames); this seam removes the last hard-coded
  * `spark.read.parquet` from the table-resolution layer too.
  */
object TableSource {

  /** Session conf key: "parquet" (default) or "iceberg". */
  final val FormatKey = "spark.graft.source.format"

  def format(spark: SparkSession): String =
    spark.conf.get(FormatKey, "parquet")

  /** Read one table. `location` is a path for parquet, a catalog table
    * identifier (or metadata location) for Iceberg — use [[resolve]] to
    * build it from a (base, name) pair uniformly. */
  def read(spark: SparkSession, location: String): DataFrame =
    format(spark) match {
      case "parquet" => spark.read.parquet(location)
      case "iceberg" => spark.read.format("iceberg").load(location)
      case other => throw new IllegalArgumentException(
        s"$FormatKey must be parquet or iceberg, got '$other'")
    }

  /** Map a (base, table-name) pair to the format's location convention:
    * `base/name.parquet` for parquet files, `base.name` (catalog
    * namespace) for Iceberg. */
  def resolve(spark: SparkSession, base: String, name: String): String =
    format(spark) match {
      case "iceberg" => s"$base.$name"
      case _ => s"$base/$name.parquet"
    }

  /** Read a named table under a base dir/namespace. */
  def table(spark: SparkSession, base: String, name: String): DataFrame =
    read(spark, resolve(spark, base, name))
}
