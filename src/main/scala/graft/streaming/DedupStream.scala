package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming exact dedup: exactly-once event counts over an
  * at-least-once delivery feed — the guarantee every streaming ingest
  * layer must provide before any downstream aggregate is trustworthy.
  *
  * The events table is unique on event_id (spec-verified), so the
  * at-least-once feed is DERIVED deterministically: every
  * event_id % 10 == 0 is delivered twice (the same plant-then-verify
  * trick as the dedup/scrub corpora). The stream then restores
  * exactly-once with `dropDuplicatesWithinWatermark` — dedup state is
  * keyed by event_id but EXPIRES with the event-time watermark, so
  * state is bounded by the watermark window's arrival volume, not by
  * stream lifetime: the operative difference from a plain
  * `dropDuplicates`, whose state grows forever on an unbounded stream.
  * At 100 TB/day that bound is what makes streaming dedup feasible;
  * the trade (a duplicate arriving later than the watermark delay is
  * not caught) is the standard one, and mirrors the batch catalog's
  * banding/cap trades: bound the state, document the miss window.
  *
  * `DedupStreamSpec` asserts the streamed counts equal the batch
  * distinct counts — i.e. the planted duplicates are all removed.
  */
object DedupStream {

  /** Watermarked at-least-once feed over the events parquet (every
    * 10th event delivered twice). */
  private def dupedSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(graft.Tables.eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .withColumn("copy", explode(
        when(col("event_id") % 10 === 0, array(lit(0), lit(1)))
          .otherwise(array(lit(0)))))
      .drop("copy")
      .withWatermark("ts_utc", "2 hours")

  /** Per-type exactly-once counts over the deduped feed. */
  def dedupCounts(spark: SparkSession, dir: String, queryName: String): StreamingQuery =
    dupedSource(spark, dir)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Batch frame with the same shape: counts over distinct event ids. */
  def batchEquivalent(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.loadEvents(spark, dir)
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
}
