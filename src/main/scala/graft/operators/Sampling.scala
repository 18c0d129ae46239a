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
  private[graft] val bucketSpark =
    s"CAST(${Dedup.tokHash60Spark("cast(doc_id AS string)")} % 1000 AS int)"
  private[graft] val bucketSql =
    s"CAST(${Dedup.tokHash60Sql("CAST(doc_id AS VARCHAR)")} % 1000 AS INT)"

  private[graft] val trainCut = 800
  private[graft] val valCut = 900

  /** 80/10/10 train/val/test + a deterministic 10% sample flag. */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), expr(bucketSpark).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainCut, lit("train"))
          .when(col("bucket") < valCut, lit("val"))
          .otherwise(lit("test")))
      .withColumn("in_10pct_sample", col("bucket") % 10 === 0)
      .orderBy("doc_id")

  val splitAssignSql: String =
    s"""SELECT doc_id, $bucketSql AS bucket,
       |  CASE WHEN $bucketSql < $trainCut THEN 'train'
       |       WHEN $bucketSql < $valCut THEN 'val'
       |       ELSE 'test' END AS split,
       |  $bucketSql % 10 = 0 AS in_10pct_sample
       |FROM documents ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // corpus_mixture — weighted source-mixture sampling: each source gets
  // a stable inclusion rate (derived here by hashing the source name,
  // so the oracle re-derives it; production supplies a rate table),
  // and a document is kept iff its content-addressed bucket falls
  // under its source's rate. This is how training mixtures are
  // downweighted (oversampled web crud vs. rare high-quality sources)
  // while keeping every property of [[splitAssign]]: rerun-stable,
  // engine-independent, and uniform within each source. The mixture
  // gate hashes a SALTED doc key — deliberately independent of the
  // split bucket. Gating on the split bucket itself would maximally
  // correlate the two decisions (a source with rate 500‰ would keep
  // ONLY train docs and silently drop its entire val/test partitions);
  // with an independent hash the kept set preserves the 80/10/10
  // proportions within every source in expectation. Scale shape:
  // still a narrow codegen'd projection — the per-source rate is a
  // hash of a column value, not a join against a rate table; with a
  // real rate table it becomes one broadcast join.
  // ---------------------------------------------------------------------
  private[graft] val rateSpark =
    s"CAST(100 + ${Dedup.tokHash60Spark("source")} % 900 AS int)"
  private[graft] val rateSql =
    s"CAST(100 + ${Dedup.tokHash60Sql("source")} % 900 AS INT)"
  private[graft] val mixBucketSpark =
    s"CAST(${Dedup.tokHash60Spark("concat('mix:', cast(doc_id AS string))")} % 1000 AS int)"
  private[graft] val mixBucketSql =
    s"CAST(${Dedup.tokHash60Sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000 AS INT)"

  def mixture(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr(mixBucketSpark).as("mix_bucket"),
        expr(rateSpark).as("rate_permille"))
      .withColumn("kept", col("mix_bucket") < col("rate_permille"))
      .orderBy("doc_id")

  val mixtureSql: String =
    s"""SELECT doc_id, source, $mixBucketSql AS mix_bucket,
       |  $rateSql AS rate_permille,
       |  $mixBucketSql < $rateSql AS kept
       |FROM documents ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("doc_split_assign" -> (splitAssign _),
      "corpus_mixture" -> (mixture _))

  val oracles: Map[String, String] =
    Map("doc_split_assign" -> splitAssignSql,
      "corpus_mixture" -> mixtureSql)
}
