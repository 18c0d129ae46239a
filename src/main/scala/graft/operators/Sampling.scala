package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic, content-addressed dataset splitting and sampling —
  * the assignment a training pipeline needs to be STABLE: a document's
  * split must be a pure function of its identity, never of partition
  * layout, row order, cluster size, or RNG state, or reruns and
  * backfills leak held-out data into train. `randomSplit`/`rand()`
  * have none of those properties; a hash-mod bucket has all of them.
  *
  * The bucket hash is md5-derived (same cross-engine trick as
  * [[Dedup]]'s token hashes) rather than xxhash64, so ANY engine
  * reading the output — the DuckDB oracle here, an auditor's warehouse
  * in production — can re-derive the assignment bit-for-bit.
  *
  * Scale shape: a narrow projection over the corpus — no shuffle, no
  * state, fully codegen'd built-ins; the 10% sample flag shows the
  * same mechanism gating a deterministic Bernoulli sample (bucket
  * slices compose: the sample is uniform within every split).
  */
object Sampling {

  /** 60-bit md5 bucket hash of the doc id, mod 1000. Rendering the id
    * through VARCHAR keeps both engines hashing identical bytes; the
    * hash itself is [[Dedup.tokHash60Spark]], whose explicit BIGINT
    * cast keeps the modulo exact in either ANSI mode (with ANSI off, a
    * bare conv() string would coerce to DOUBLE and ~96% of docs would
    * silently land in a different bucket than the oracle). */
  private val bucketSpark =
    s"CAST(${Dedup.tokHash60Spark("cast(doc_id AS string)")} % 1000 AS int)"
  private val bucketSql =
    s"CAST(${Dedup.tokHash60Sql("CAST(doc_id AS VARCHAR)")} % 1000 AS INT)"

  /** 80/10/10 train/val/test + a deterministic 10% sample flag. */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), expr(bucketSpark).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 800, lit("train"))
          .when(col("bucket") < 900, lit("val"))
          .otherwise(lit("test")))
      .withColumn("in_10pct_sample", col("bucket") % 10 === 0)
      .orderBy("doc_id")

  val splitAssignSql: String =
    s"""SELECT doc_id, $bucketSql AS bucket,
       |  CASE WHEN $bucketSql < 800 THEN 'train'
       |       WHEN $bucketSql < 900 THEN 'val'
       |       ELSE 'test' END AS split,
       |  $bucketSql % 10 = 0 AS in_10pct_sample
       |FROM documents ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("doc_split_assign" -> (splitAssign _))

  val oracles: Map[String, String] =
    Map("doc_split_assign" -> splitAssignSql)
}
