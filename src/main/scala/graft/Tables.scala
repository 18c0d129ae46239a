package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-generated parquet test data
  * (TESTDATA.md). At 100 TB these reads are plain `spark.read.parquet`
  * over a partitioned lake path — column pruning + predicate pushdown
  * flow to the scan automatically because every query here is built
  * declaratively on top of these frames.
  *
  * The reference loads its 5 retail tables as headered CSV with
  * `inferSchema=True` (reference: Data Transformation.py:24-34), which
  * costs an extra full scan per file; we read parquet (self-describing)
  * and, for the CSV ingestion surface, declare explicit schemas — see
  * [[graft.sources.CsvTableReader]].
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Like [[load]], but spread across the cluster when the input has
    * fewer splits than cores. Small single-row-group parquet (the test
    * data) is unsplittable, so every map stage before the first
    * shuffle would otherwise run on ONE task; a real lake table has
    * plenty of splits and passes through untouched. Use for operators
    * with heavy per-row compute (hashing, sketching, vector math). */
  def loadBalanced(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = load(spark, sfDir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** `events.ts` is nanosecond-precision parquet, which Spark 4 refuses
    * as TimestampType; read nanos as a long (legacy flag) and expose
    * epoch seconds — all event queries do their window arithmetic in
    * the epoch-seconds domain anyway (see operators.Events). */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // floor division via pmod (Spark's `div` truncates toward zero,
    // which would disagree with the floor-semantics oracles for any
    // pre-1970 timestamp)
    loadBalanced(spark, sfDir, "events")
      .withColumn("sec",
        org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000000000)) div 1000000000"))
  }

  /** Register every table as a temp view so the ad-hoc `spark.sql`
    * surface (reference's Glue/Athena step, README.md:64-78) works
    * in-engine. `events` must go through [[loadEvents]]: a plain read
    * of its nanosecond timestamps throws in Spark 4, and the event
    * queries expect the derived `sec` column. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      // events needs the nanos conf + sec column, but NOT loadBalanced:
      // a generic SQL view shouldn't pay a repartition shuffle on every
      // ad-hoc query
      val df = if (n == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        load(spark, sfDir, n)
          .withColumn("sec",
            org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000000000)) div 1000000000"))
      } else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
