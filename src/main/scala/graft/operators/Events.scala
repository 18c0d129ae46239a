package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Event-stream analytics over the `events` table, batch-first (the
  * reference is a pure daily batch pipeline — SURVEY §2.10); the
  * Structured Streaming variant of the tumbling aggregation lives in
  * [[graft.streaming.EventsStream]] and is asserted equal to the batch
  * result in its spec.
  *
  * Timestamp parity notes: the parquet column is nanosecond-precision;
  * Spark truncates to microseconds, DuckDB keeps its own precision —
  * so oracle-compared outputs only ever expose epoch SECONDS (both
  * engines floor identically) and windows are epoch-second arithmetic,
  * not engine-native window functions. `sum(value)` goes through
  * DECIMAL(18,6) so it is order-independent under Spark's parallel
  * partial aggregation.
  */
object Events {

  // ---------------------------------------------------------------------
  // events_tumbling_agg — 1-hour tumbling windows per event_type.
  // ---------------------------------------------------------------------
  def tumblingAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .groupBy(expr("(sec - pmod(sec, 3600)) div 3600").as("bucket_hr"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy("bucket_hr", "event_type")

  val tumblingAggSql: String =
    """SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket_hr, event_type,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
      |  MIN(value) AS min_value,
      |  MAX(value) AS max_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // events_sliding_agg — 1-hour windows sliding by 30 min, via explode
  // of the (two) windows each event belongs to. This is exactly how
  // Spark's own window() with slide works logically; done in epoch
  // arithmetic for oracle parity.
  // ---------------------------------------------------------------------
  def slidingAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .withColumn("win_start", explode(expr(
        "array(sec - pmod(sec, 1800) - 1800, sec - pmod(sec, 1800))")))
      .groupBy(col("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .orderBy("win_start", "event_type")

  val slidingAggSql: String =
    """WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |w AS (
      |  SELECT unnest([(sec // 1800) * 1800 - 1800, (sec // 1800) * 1800]) AS win_start,
      |    event_type, value
      |  FROM e)
      |SELECT win_start, event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // events_sessionize — gap-based sessions (30 min) per user via
  // lag + running sum; per-session rollup. The classic stateful-stream
  // operation expressed as two window passes (one shuffle on user_id).
  // ---------------------------------------------------------------------
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    Tables.loadEvents(spark, dir)
      .withColumn("new_session",
        when(col("sec") - lag(col("sec"), 1).over(byUser) > 1800, 1)
          .when(lag(col("sec"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("sec")).as("start_s"),
        max(col("sec")).as("end_s"),
        (max(col("sec")) - min(col("sec"))).as("dur_s"))
      .orderBy("user_id", "session_idx")
  }

  val sessionizeSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, sec,
      |    CASE WHEN lag(sec) OVER w IS NULL THEN 1
      |         WHEN sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      |sessions AS (
      |  SELECT user_id, sec,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM flagged)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  COUNT(*) AS n_events, MIN(sec) AS start_s, MAX(sec) AS end_s,
      |  MAX(sec) - MIN(sec) AS dur_s
      |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // events_hll_distinct — mergeable distinct-user sketches (SURVEY §7.3's
  // "mergeable HLL" north-star, via Spark 4's built-in DataSketches
  // functions — no custom TypedImperativeAggregate needed). Daily
  // sketches are built once and UNIONED into weekly estimates: at
  // 100 TB the daily sketch table is what you persist, and any rollup
  // (week, month, ad-hoc date range) is a cheap union over kilobyte
  // sketches instead of a re-scan of raw events. Estimates are
  // approximate → rows-only driver check; EventsSpec bounds the error
  // against exact counts.
  // ---------------------------------------------------------------------
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.loadEvents(spark, dir)
      .groupBy(expr("(sec - pmod(sec, 86400)) div 86400").as("bucket_day"), col("event_type"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("day_sketch"),
        count(lit(1)).as("n_events"))
    daily
      .groupBy(expr("(bucket_day - pmod(bucket_day, 7)) div 7").as("bucket_wk"), col("event_type"))
      .agg(
        expr("hll_sketch_estimate(hll_union_agg(day_sketch))").as("approx_users_wk"),
        sum(col("n_events")).as("n_events"))
      .orderBy("bucket_wk", "event_type")
  }

  /** Exact twin of [[hllDistinct]] for error-bound checks. */
  def exactDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(spark, dir)
      .groupBy(expr("(sec - pmod(sec, 604800)) div 604800").as("bucket_wk"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users_wk"))
      .orderBy("bucket_wk", "event_type")

  // ---------------------------------------------------------------------
  // events_intervals — event-to-state interval build (the SCD-Type-2 /
  // temporal-table transformation): each user's event stream becomes
  // contiguous validity intervals [valid_from, valid_to), the last one
  // open-ended (is_current). This is how a mutable-dimension history
  // is reconstructed from a change-event log. Scale shape: ONE shuffle
  // on user_id and one per-partition sort shared by the lead() window;
  // the order key includes event_id so same-second events still form a
  // total order (deterministic intervals under at-least-once feeds).
  // ---------------------------------------------------------------------
  def intervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    Tables.loadEvents(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("sec"))
      .withColumn("valid_to", lead(col("sec"), 1).over(w))
      .withColumn("duration_sec", col("valid_to") - col("sec"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("sec").as("valid_from"), col("valid_to"), col("duration_sec"),
        col("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
  }

  val intervalsSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |           FROM events),
      |i AS (SELECT user_id, event_id, event_type, sec AS valid_from,
      |        lead(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS valid_to
      |      FROM e)
      |SELECT user_id, event_id, event_type, valid_from, valid_to,
      |  valid_to - valid_from AS duration_sec,
      |  valid_to IS NULL AS is_current
      |FROM i ORDER BY user_id, valid_from, event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_tumbling_agg" -> (tumblingAgg _),
    "events_sliding_agg"  -> (slidingAgg _),
    "events_sessionize"   -> (sessionize _),
    "events_hll_distinct" -> (hllDistinct _),
    "events_intervals"    -> (intervals _))

  val oracles: Map[String, String] = Map(
    "events_tumbling_agg" -> tumblingAggSql,
    "events_sliding_agg"  -> slidingAggSql,
    "events_sessionize"   -> sessionizeSql,
    "events_intervals"    -> intervalsSql)
}
