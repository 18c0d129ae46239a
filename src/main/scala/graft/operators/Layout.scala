package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-layout operators — the write-side optimization tier. A 100 TB
  * lake table queried by more than one dimension (here: events filtered
  * by user AND by time) cannot sort by both; the standard answer is a
  * space-filling curve: bucket each dimension, interleave the bucket
  * bits into one Z-value, and range-partition files by that value.
  * Every file then covers a small RECTANGLE of (user, time) space, so
  * min/max file statistics prune scans for predicates on EITHER
  * dimension — the layout trick behind Delta/Iceberg Z-ordering.
  *
  * Cross-engine exactness: bit extraction is pure integer `div`/`%`
  * over non-negative ints (both dims are bucketed through a
  * non-negative modulus first), never float `pow`/shift builtins, so
  * both engines compute identical Z-values.
  */
object Layout {

  private[graft] val zDimBits = 8 // 256 buckets per dimension
  private[graft] val zFileBuckets = 32L
  private val zCells = 1L << (2 * zDimBits) // 65536 z-values
  private[graft] val zBucketWidth = zCells / zFileBuckets

  /** Bit-interleave expression over non-negative int columns `x`/`y`
    * (x in even bit positions, y in odd), as engine-portable integer
    * arithmetic. `div` is the engine's integer-division spelling —
    * exposed for the spec's known-value checks. */
  private[graft] def zExpr(x: String, y: String, div: String): String =
    (0 until zDimBits).map { i =>
      val p = 1L << i
      s"(($x $div $p) % 2) * ${1L << (2 * i)} + (($y $div $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  // ---------------------------------------------------------------------
  // layout_zorder — per-event Z-value and target file bucket over the
  // (user_id, hour-of-epoch) dimensions. Scale shape: a pure map-side
  // projection (fully codegen'd, no shuffle before the final sort); the
  // write step it feeds is a repartitionByRange(file_bucket) sink, and
  // the whole point is that the expensive part — clustering 100 TB —
  // is ONE range shuffle at write time that every later scan amortizes.
  // ---------------------------------------------------------------------
  def zorder(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.loadEvents(spark, dir)
      // non-negative bucket coords: user_id >= 0 by schema; the hour
      // bucket uses the catalog's floor-division idiom (sec - pmod)
      // so a pre-1970 timestamp buckets identically in both engines
      // (Spark `div` truncates toward zero, DuckDB `//` floors)
      .withColumn("zx", expr("pmod(user_id, 256)"))
      .withColumn("zy", expr("pmod((sec - pmod(sec, 3600)) div 3600, 256)"))
    df.select(col("event_id"), col("zx"), col("zy"),
        expr(zExpr("zx", "zy", "div")).as("zval"))
      .withColumn("file_bucket", expr(s"zval div $zBucketWidth"))
      .orderBy("event_id")
  }

  val zorderSql: String = {
    val sec = "CAST(floor(epoch(ts)) AS BIGINT)"
    s"""WITH b AS (SELECT event_id,
       |  ((user_id % 256) + 256) % 256 AS zx,
       |  ((($sec // 3600) % 256) + 256) % 256 AS zy
       |  FROM events)
       |SELECT event_id, zx, zy,
       |  ${zExpr("zx", "zy", "//")} AS zval,
       |  (${zExpr("zx", "zy", "//")}) // $zBucketWidth AS file_bucket
       |FROM b ORDER BY event_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> (zorder _))

  val oracles: Map[String, String] = Map(
    "layout_zorder" -> zorderSql)
}
