package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the shuffle-elimination story for repeated
  * big-big joins at 100 TB (SURVEY §7.1: "bucketing for co-located
  * joins").
  *
  * Writing both fact tables bucketed by the join key (same bucket
  * count) makes every subsequent equi-join on that key exchange-free:
  * each task reads matching bucket files from both sides. The write
  * pays one shuffle ONCE; every downstream join, groupBy, or
  * `dropDuplicates` on the bucket key then skips its exchange —
  * the right trade whenever a fact is joined more often than it is
  * rewritten. BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets for
    * sort-merge-ready reads). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    // repartition on the bucket keys first: otherwise every input task
    // opens a writer per bucket (tasks x buckets small files) and
    // multi-file buckets forfeit the sortBy guarantee downstream
    df.repartition(buckets, keys.map(df.col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys; the physical
    * plan contains no Exchange for either side. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** Drop any stale version of `table` — catalog entry AND warehouse
    * directory (an in-memory catalog forgets its tables across JVMs
    * but the directories persist, and saveAsTable(Overwrite) refuses a
    * dir it has no catalog entry for) — then write fresh. The location
    * comes from the catalog's own path resolution (not warehouse-dir
    * string munging), so non-default databases, URI-escaped paths, and
    * non-local warehouses all clean correctly. */
  def rewriteBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    writeBucketed(df, table, buckets, keys)
  }
}
