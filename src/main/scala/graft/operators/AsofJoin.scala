package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal joins Spark has no native operator for: as-of and banded
  * range join.
  *
  * As-of — for each probe row, the latest build row of
  * the same key with `build.time <= probe.time`. The naive composition
  * (equi-join on key + range filter + max_by) explodes each key into
  * |probe|×|build| rows before filtering. This is the scalable
  * formulation instead:
  *
  *   union(build, probe) → ONE shuffle on key → ONE sort on
  *   (time, side) → running `last(..., ignoreNulls)` window
  *
  * so the cost is that of a single sort-merge pass regardless of how
  * many build rows precede each probe row — the standard distributed
  * as-of shape (the same plan a point-in-time feature lookup or a
  * slowly-changing-dimension resolve wants at 100 TB). Build rows
  * order BEFORE probe rows at equal timestamps, giving `<=` semantics.
  *
  * Determinism contract: the caller supplies a build side with at most
  * one row per (key, time) — de-duplicate first (as the catalog query
  * does with max_by) — otherwise "the" latest row at a tied timestamp
  * is not well-defined in any engine.
  */
object AsofJoin {

  /** @param probe     left side; every column is preserved
    * @param build     right side; must contain `key` and `time`
    * @param key       equi-join column present on both sides
    * @param time      event-time column present on both sides
    * @param buildCols build payload columns to attach to probe rows
    * @return probe rows that have a matching as-of build row (inner
    *         semantics), each with `buildCols` attached
    */
  def latestPerKey(probe: DataFrame, build: DataFrame, key: String,
      time: String, buildCols: Seq[String]): DataFrame = {
    val side = "__asof_build"
    val pay = "__asof_pay"
    // One struct per build row, attached through a SINGLE running
    // last(ignoreNulls) window: the probe row receives the whole as-of
    // build row atomically. Per-column windows would stitch a probe row
    // from DIFFERENT build rows whenever a payload column is null (a
    // chimera row); the struct is non-null for every build row even
    // when its fields are null, so nullable payloads are safe too.
    val b = build.select(col(key), col(time),
      struct(buildCols.map(col): _*).as(pay)).withColumn(side, lit(1))
    val p = probe.withColumn(side, lit(0))
    val u = p.unionByName(b, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col(side).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached: Column = last(col(pay), ignoreNulls = true).over(w).as(pay)
    u.select((probe.columns.map(col) :+ col(side)) :+ attached: _*)
      .filter(col(side) === 0 && col(pay).isNotNull)
      .select(probe.columns.map(col) ++
        buildCols.map(c => col(s"$pay.$c").as(c)): _*)
  }

  // ---------------------------------------------------------------------
  // events_asof_order — each event annotated with the customer's most
  // recent order at event time (the point-in-time feature-lookup
  // pattern). Build side deduped to one row per (customer, order-day)
  // keeping the max order key, so the as-of row is well-defined and
  // the DuckDB ASOF JOIN oracle must agree exactly.
  // ---------------------------------------------------------------------
  def eventsAsofOrder(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
      .select(col("event_id"), col("user_id"), col("sec"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("user_id"),
        col("o_orderdate").cast("timestamp").cast("long").as("o_sec"),
        col("o_orderkey"))
      .groupBy("user_id", "o_sec")
      .agg(max(col("o_orderkey")).as("last_orderkey"))
      .withColumn("sec", col("o_sec"))
    latestPerKey(ev, ord, key = "user_id", time = "sec",
        buildCols = Seq("last_orderkey", "o_sec"))
      .withColumnRenamed("o_sec", "last_order_sec")
      .orderBy("event_id")
  }

  val eventsAsofOrderSql: String =
    """WITH ord AS (
      |  SELECT o_custkey AS user_id,
      |    CAST(epoch(o_orderdate) AS BIGINT) AS o_sec,
      |    max(o_orderkey) AS last_orderkey
      |  FROM orders GROUP BY 1, 2),
      |ev AS (
      |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events)
      |SELECT ev.event_id, ev.user_id, ev.sec,
      |  ord.last_orderkey, ord.o_sec AS last_order_sec
      |FROM ev ASOF JOIN ord
      |  ON ev.user_id = ord.user_id AND ord.o_sec <= ev.sec
      |ORDER BY ev.event_id""".stripMargin

  // ---------------------------------------------------------------------
  // Banded range join — pairs within a time band |probe.t − build.t| ≤ W
  // on the same key. The naive formulation joins on the key alone and
  // filters the band afterwards: |probe|×|build| intermediate rows per
  // key. The banded form buckets both sides by floor(t/W) and explodes
  // the PROBE side to its 3 adjacent buckets (any row within ±W lies
  // in bucket b−1, b, or b+1), so the join is a plain equi-join on
  // (key, bucket) with a bounded ×3 fanout — then the exact band
  // predicate prunes the corners. One shuffle per side, intermediate
  // size ≤ 3·|probe| + matches, at any scale.
  // ---------------------------------------------------------------------

  /** @param probe/build both need `key` and `time`
    * @param bandSec     half-width W of the band, in `time` units */
  /** floor(t / W) as a long (pmod keeps it floor, not truncate-toward-
    * zero, for pre-epoch times; Column./ alone would go double). */
  private def bucketOf(t: Column, w: Long): Column =
    ((t - pmod(t, lit(w))) / lit(w)).cast("long")

  def bandedRangeJoin(probe: DataFrame, build: DataFrame, key: String,
      time: String, bandSec: Long): DataFrame = {
    val pb = probe
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__b", bucketOf(col(time), bandSec) + col("__off"))
      .drop("__off")
    val bb = build
      .withColumnRenamed(time, s"${time}_b")
      .withColumn("__b", bucketOf(col(s"${time}_b"), bandSec))
    pb.join(bb, Seq(key, "__b"))
      .filter(abs(col(time) - col(s"${time}_b")) <= bandSec)
      .drop("__b")
  }

  /** events_range_join — for each click, the views of the same user
    * within ±15 min (the session-stitching / attribution shape). */
  def eventsRangeJoin(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("sec"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("sec"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("sec"))
    bandedRangeJoin(clicks, views, key = "user_id", time = "sec", bandSec = 900L)
      .groupBy(col("click_id"))
      .agg(count(lit(1)).as("n_views"),
        min(col("sec_b")).as("first_view_sec"),
        max(col("view_id")).as("max_view_id"))
      .orderBy("click_id")
  }

  val eventsRangeJoinSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events)
      |SELECT c.event_id AS click_id,
      |  count(*) AS n_views,
      |  min(v.sec) AS first_view_sec,
      |  max(v.event_id) AS max_view_id
      |FROM ev c JOIN ev v
      |  ON c.user_id = v.user_id
      |  AND c.event_type = 'click' AND v.event_type = 'view'
      |  AND abs(c.sec - v.sec) <= 900
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("events_asof_order" -> (eventsAsofOrder _),
        "events_range_join" -> (eventsRangeJoin _))

  val oracles: Map[String, String] =
    Map("events_asof_order" -> eventsAsofOrderSql,
        "events_range_join" -> eventsRangeJoinSql)
}
