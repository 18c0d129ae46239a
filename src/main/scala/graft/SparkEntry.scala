package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full operator catalog: every operator
  * class from SURVEY.md §2 (scans, projections/filters, joins incl.
  * the faithful fanout join, hash aggs, snapshot windows, sorts/top-k,
  * metric assembly) plus the large-scale training-data-pipeline
  * extensions (dedup, similarity search, text analysis, events
  * windows). `oracleSql` carries a DuckDB-equivalent query for every
  * entry that ANSI SQL can express; the rest get rows-only checks and
  * ScalaTest specs.
  *
  * Cache convention: a catalog query may `persist()` a sub-frame that
  * several of its branches share (Dedup's pair indexes, Curation's
  * tokenized projections). Ownership of the teardown sits with the
  * ENTRY POINT, not the query: Verify, Bench, and Explain each call
  * `spark.catalog.clearCache()` after every query, and any other
  * caller (notebook, long-lived service) must do the same — a query
  * cannot unpersist its own result before the caller materializes it.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RetailPipeline.faithful(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RetailPipeline.queries ++ Dedup.queries ++
      TextAnalysis.queries ++ Similarity.queries ++ Events.queries ++
      Multimodal.queries ++ MediaContainers.queries ++
      AsofJoin.queries ++ Sampling.queries ++
      Curation.queries ++ Ranking.queries ++ Layout.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ RetailPipeline.oracles ++ Dedup.oracles ++
      TextAnalysis.oracles ++ Similarity.oracles ++ Events.oracles ++
      Multimodal.oracles ++ MediaContainers.oracles ++
      AsofJoin.oracles ++ Sampling.oracles ++
      Curation.oracles ++ Ranking.oracles ++ Layout.oracles
}
