package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface. The reference pipeline is a daily
  * batch triggered by a file-readiness check (SURVEY §2.10/C1-C2); the
  * Spark-native analog is a file-source stream with
  * `Trigger.AvailableNow` — the same "process what has landed, then
  * stop" contract, but with exactly-once bookkeeping from the stream
  * checkpoint instead of a Lambda + Airflow sensor.
  *
  * `EventsStreamSpec` asserts the streaming result equals
  * [[graft.operators.Events.tumblingAgg]] on the same input.
  */
object EventsStream {

  /** Watermarked event-time stream over the events parquet — shared
    * source for both window shapes. events.ts is nanosecond parquet →
    * read as long, rebuild a microsecond TimestampType for the
    * event-time window/watermark. */
  private def eventsSource(spark: SparkSession, dir: String): DataFrame = {
    // explicit nanos-as-long schema (no session-wide legacy conf)
    spark.readStream
      .schema(graft.Tables.eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_utc", "2 hours")
  }

  /** 1-hour tumbling aggregation as a stream over the events parquet.
    * Watermark bounds state for continuous runs; with AvailableNow +
    * complete mode it simply drains the backlog. */
  def tumblingAgg(spark: SparkSession, dir: String, queryName: String): StreamingQuery = {
    eventsSource(spark, dir)
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(
        (unix_timestamp(col("window.start")).cast("long") / 3600).cast("long").as("bucket_hr"),
        col("event_type"), col("n_events"), col("sum_value"))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Batch frame with the same shape, for equivalence checks. */
  def batchEquivalent(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Events.tumblingAgg(spark, dir)
      .select("bucket_hr", "event_type", "n_events", "sum_value")

  /** Sliding-window (1 h, slide 30 min) streaming aggregation — the
    * overlapping-window face of
    * [[graft.operators.Events.slidingAgg]]: each event lands in two
    * windows; watermark bounds the open-window state. */
  def slidingAgg(spark: SparkSession, dir: String, queryName: String): StreamingQuery = {
    eventsSource(spark, dir)
      .groupBy(window(col("ts_utc"), "1 hour", "30 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Batch twin of [[slidingAgg]] (the epoch-arithmetic batch query in
    * operators.Events shares its shape). */
  def slidingBatchEquivalent(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Events.slidingAgg(spark, dir)
      .select("win_start", "event_type", "n_events", "sum_value")

  /** Streaming exactly-once dedup: drop replayed event_ids, keeping
    * state only inside the watermark horizon (the standard at-least-
    * once-source → exactly-once-pipeline repair; state is bounded by
    * events per `delay` window, not by stream lifetime). */
  def dedupStream(spark: SparkSession, dir: String, queryName: String): StreamingQuery = {
    eventsSource(spark, dir) // carries the 2h event-time watermark
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "event_type", "value")
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** At-least-once variant of [[eventsSource]]: every event_id % 10 == 0
    * is delivered twice (deterministic plant — the events table itself
    * is unique on event_id, spec-verified), so a downstream dedup is
    * exercised against real duplicates rather than vacuously passing on
    * an already-unique feed. The watermark attached by [[eventsSource]]
    * survives the projection (the event-time column is untouched). */
  private def dupedEventsSource(spark: SparkSession, dir: String): DataFrame =
    eventsSource(spark, dir)
      .withColumn("copy", explode(
        when(col("event_id") % 10 === 0, array(lit(0), lit(1)))
          .otherwise(array(lit(0)))))
      .drop("copy")

  /** Exactly-once per-type counts over the duplicated feed:
    * [[dedupStream]]'s repair composed with an aggregate, proving the
    * planted duplicates are dropped before they can inflate a
    * downstream metric. Dedup state expires with the event-time
    * watermark — bounded by the watermark window's arrival volume, not
    * stream lifetime; a duplicate arriving later than the delay is the
    * standard documented miss window. `DedupStreamSpec` asserts the
    * streamed counts equal the batch distinct counts. */
  def dedupCounts(spark: SparkSession, dir: String, queryName: String): StreamingQuery =
    dupedEventsSource(spark, dir)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Batch frame with [[dedupCounts]]'s shape: counts over distinct
    * event ids. */
  def dedupBatchEquivalent(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.loadEvents(spark, dir)
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
}
