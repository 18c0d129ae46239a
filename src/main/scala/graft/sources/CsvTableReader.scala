package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.schema.RetailSchemas

/** Explicit-schema CSV source (reference operator S1, SURVEY §2.1).
  *
  * The reference reads each table with `spark.read.csv(path,
  * header=True, inferSchema=True)` (reference: Data
  * Transformation.py:33-34) and then re-casts four date columns by
  * hand (`:44-47`). Declaring the schema removes both the extra
  * inference scan and the cast pass: `DateType` fields parse directly
  * via `dateFormat`.
  *
  * Scale notes: schema inference is O(bytes) before the first real
  * task runs; on a 100 TB lake that is a full read of the lake. With
  * an explicit schema the scan starts immediately and column pruning
  * still applies (CSV must parse whole lines, but only requested
  * columns are materialized).
  */
object CsvTableReader {

  /** Read one headered CSV table with a declared schema. PERMISSIVE
    * would silently null malformed cells; the pipeline wants loud
    * failures at the boundary, so default FAILFAST. Caveat: with CSV
    * column pruning (on by default) FAILFAST validates only the
    * columns the query actually reads — corruption in an unread column
    * surfaces on first use, not at ingest. A full-validation pass is
    * one `df.selectExpr("*").count()` away when ingest-time strictness
    * matters more than scan cost. */
  def read(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("dateFormat", "yyyy-MM-dd")
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .csv(path)

  /** Read one of the five retail tables by name. */
  def readRetail(spark: SparkSession, table: String, path: String): DataFrame =
    read(spark, path, RetailSchemas.byName(table))

  /** Read all five from a `table -> path` map (the run-config shape the
    * reference passes around — Lambda Function.py:21-26). */
  def readAll(spark: SparkSession, inputs: Map[String, String]): Map[String, DataFrame] =
    inputs.map { case (t, p) => t -> readRetail(spark, t, p) }
}
