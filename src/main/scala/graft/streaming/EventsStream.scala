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

  /** Un-watermarked event-time stream over the events parquet (for
    * consumers that must place their own watermark, e.g. after a
    * rename — Spark disallows redefining one). events.ts is nanosecond
    * parquet → read as long, rebuild a microsecond TimestampType for
    * event-time semantics. `maxFilesPerTrigger` slices a multi-file
    * (directory-layout) table into one micro-batch per file — the
    * bench idiom that turns a one-shot drain into a real multi-batch
    * trajectory. */
  private def rawEventsSource(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // explicit nanos-as-long schema (no session-wide legacy conf).
    // Layout-aware source: the streaming file source needs a DIRECTORY
    // base path, so a directory-layout table (every Spark-written
    // table) streams directly, while the single-file testdata layout
    // streams its parent through a name filter. The earlier
    // unconditional pathGlobFilter=events.parquet only matched the
    // single-file shape and turned a directory-layout table into a
    // silently EMPTY stream — the worst failure mode a source can
    // have, hence the one metadata probe here.
    val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val isDir =
      try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).isDirectory
      catch {
        case e: java.io.FileNotFoundException =>
          // fail-fast is deliberate (the alternative was a silently
          // empty stream), but name the layout contract instead of
          // surfacing a bare Hadoop FNFE from deep in the source.
          throw new IllegalArgumentException(
            s"events source expects '$dir/events.parquet' as either a " +
              "Spark-written parquet DIRECTORY or a single parquet FILE " +
              s"inside $dir; neither exists", e)
      }
    val reader = spark.readStream.schema(graft.Tables.eventsSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val src =
      if (isDir) reader.parquet(p.toString)
      else reader.option("pathGlobFilter", "events.parquet").parquet(dir)
    // normalize the on-disk INT64 unit (nanos/micros/millis vintages —
    // see Tables.eventsTsNanosFactor) to the engine's epoch-nanos
    // contract before rebuilding event-time. The factor is resolved
    // ONCE at stream definition: the stream contract is one ts
    // vintage per source dir for the stream's lifetime (files of a
    // different vintage landing later would scale wrong — regenerate
    // into a fresh dir instead). A dir with no parts yet falls back
    // to factor 1 (the legacy epoch-nanos contract) so the stream
    // starts empty and drains later-arriving nanos-vintage files —
    // warned, because MICROS/MILLIS late arrivals would be mis-scaled
    // (populate the dir before defining the stream for those).
    val factor = graft.Tables.eventsTsNanosFactorOpt(spark, p.toString).getOrElse {
      System.err.println(
        s"[graft] $p has no parquet parts yet; assuming epoch-NANOS ts " +
          "(factor 1). If later files are MICROS/MILLIS vintage, populate " +
          "the dir before defining the stream.")
      1L
    }
    src.withColumn("ts", expr(s"ts * ${factor}L"))
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
  }

  /** Watermarked shared source for the window/dedup shapes. */
  private def eventsSource(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    rawEventsSource(spark, dir, maxFilesPerTrigger)
      .withWatermark("ts_utc", "2 hours")

  /** 1-hour tumbling aggregation as a stream over the events parquet.
    * Watermark bounds state for continuous runs; with AvailableNow +
    * complete mode it simply drains the backlog. */
  /** The shared hourly-bucket aggregation all three tumbling variants
    * stream — ONE definition, so the complete/append/durable twins
    * (whose equivalence the specs pin against the batch query) cannot
    * drift apart in the agg itself; each variant only attaches its
    * sink/output-mode wiring. */
  private def hourlyAgg(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int]): DataFrame =
    eventsSource(spark, dir, maxFilesPerTrigger)
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(
        // integer arithmetic end-to-end, like the batch twin
        // (Events.scala:30) — the double-division idiom agreed only
        // because window.start is hour-aligned
        expr("unix_timestamp(window.start) div 3600").as("bucket_hr"),
        col("event_type"), col("n_events"), col("sum_value"))

  def tumblingAgg(spark: SparkSession, dir: String, queryName: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    hourlyAgg(spark, dir, maxFilesPerTrigger)
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

  /** APPEND-mode twin of [[tumblingAgg]] — the shape that runs
    * FOREVER: a window emits exactly once, when the event-time
    * watermark passes its end, and its state row is EVICTED, so state
    * tracks the open-window horizon (watermark delay + in-flight
    * span), not windows-ever-seen. Complete mode re-emits the full
    * result per trigger and must keep every window alive — right for
    * a bounded drain, unbounded state on a continuous stream; this is
    * the bounded-state variant the 100 TB pipeline schedules.
    * Documented append caveat: windows inside the final watermark
    * horizon (the last `delay` of event time) are NOT emitted by an
    * AvailableNow drain — they emit on the next drain, once later
    * events push the watermark past them. EventsSpec pins emitted ==
    * batch-rows-outside-the-horizon, value-exactly. */
  def tumblingAggAppend(spark: SparkSession, dir: String, queryName: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    hourlyAgg(spark, dir, maxFilesPerTrigger)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** [[tumblingAggAppend]] with a DURABLE sink + checkpoint — the
    * shape that actually runs as a scheduled cadence: each
    * AvailableNow drain appends the windows the advancing watermark
    * closed to a parquet directory, and the NEXT drain resumes from
    * the checkpoint (file-source log: already-committed files never
    * reprocess; state store: windows still open at the previous
    * drain's end keep their partial aggregates, so a window straddling
    * two drains' files emits once, value-exact, when it finally
    * closes). The memory-sink twin above cannot express this — the
    * memory sink does not support recovery, so a second drain there
    * starts a fresh query. EventsSpec's two-drain case pins the
    * documented in-horizon-tail caveat end-to-end: windows inside
    * drain 1's final watermark horizon emit on drain 2, exactly once,
    * batch-identical. */
  def tumblingAggAppendDurable(spark: SparkSession, dir: String,
      outPath: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    hourlyAgg(spark, dir, maxFilesPerTrigger)
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Sliding-window (1 h, slide 30 min) streaming aggregation — the
    * overlapping-window face of
    * [[graft.operators.Events.slidingAgg]]: each event lands in two
    * windows; watermark bounds the open-window state. */
  def slidingAgg(spark: SparkSession, dir: String, queryName: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    eventsSource(spark, dir, maxFilesPerTrigger)
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
  private def dupedEventsSource(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    eventsSource(spark, dir, maxFilesPerTrigger)
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
  def dedupCounts(spark: SparkSession, dir: String, queryName: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    dupedEventsSource(spark, dir, maxFilesPerTrigger)
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

  /** Stream-stream interval join: each click paired with every view by
    * the same user in the preceding 10 minutes — the attribution-join
    * shape. Both sides carry event-time watermarks and the join
    * condition bounds the time skew, so Spark can expire join state:
    * a buffered view is droppable once the click-side watermark passes
    * v_ts + 10 min, giving bounded state on an unbounded stream — the
    * property that makes this runnable continuously, not just under
    * AvailableNow. Append mode (stream-stream inner joins emit
    * matches only once both sides' watermarks clear them). */
  def clickViewJoin(spark: SparkSession, dir: String, queryName: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val views = rawEventsSource(spark, dir, maxFilesPerTrigger)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts_utc").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val clicks = rawEventsSource(spark, dir, maxFilesPerTrigger)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts_utc").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    clicks.join(views,
        expr("""c_user = v_user AND
                v_ts <= c_ts AND c_ts <= v_ts + interval 10 minutes"""))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        unix_timestamp(col("c_ts")).as("click_sec"),
        unix_timestamp(col("v_ts")).as("view_sec"))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Batch twin of [[clickViewJoin]]: the same user-keyed interval
    * join in one batch equi-join + band filter. The band arithmetic
    * runs in the stream's MICROSECOND domain (ts div 1000) — flooring
    * to seconds first would flip the comparison on sub-second edges. */
  def clickViewBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.loadEvents(spark, dir)
      .withColumn("us", expr("ts div 1000"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("us").as("v_us"), col("sec").as("view_sec"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("us").as("c_us"), col("sec").as("click_sec"))
    clicks.join(views, Seq("user_id"))
      .filter(col("v_us") <= col("c_us")
        && col("c_us") <= col("v_us") + 600000000L)
      .select("user_id", "click_id", "view_id", "click_sec", "view_sec")
  }

  /** The static dimension for stream enrichment: user → market
    * segment (customer keyed by user_id). */
  private def userSegments(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))

  /** STREAM-STATIC enrichment join — the third Structured Streaming
    * join shape (alongside the stream-stream interval join and the
    * windowed aggs): each streaming event is enriched against a
    * broadcast dimension, then counted per (segment, hour). This is
    * the 100 TB enrichment shape — the dimension is loaded once per
    * microbatch and broadcast, the stream never shuffles for the join,
    * and no join state accumulates (static side is bounded, so unlike
    * stream-stream there is nothing to watermark away). Unmatched
    * users degrade to an explicit 'UNKNOWN' segment rather than
    * silently dropping events. */
  def enrichedAgg(spark: SparkSession, dir: String, queryName: String,
      maxFilesPerTrigger: Option[Int] = None,
      dimDir: Option[String] = None): StreamingQuery = {
    // the static dimension may live in a different dir than the event
    // stream (e.g. a time-sliced drop folder enriched against the
    // warehouse dims) — default is the co-located layout
    eventsSource(spark, dir, maxFilesPerTrigger)
      .join(broadcast(userSegments(spark, dimDir.getOrElse(dir))), Seq("user_id"), "left")
      .withColumn("segment", coalesce(col("segment"), lit("UNKNOWN")))
      .groupBy(window(col("ts_utc"), "1 hour"), col("segment"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        expr("unix_timestamp(window.start) div 3600").as("bucket_hr"),
        col("segment"), col("n_events"))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Batch twin of [[enrichedAgg]]: same broadcast enrichment + hour
    * bucket over the batch events frame. */
  def enrichedBatchEquivalent(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.loadEvents(spark, dir)
      .join(broadcast(userSegments(spark, dir)), Seq("user_id"), "left")
      .withColumn("segment", coalesce(col("segment"), lit("UNKNOWN")))
      .groupBy(expr("(sec - pmod(sec, 3600)) div 3600").as("bucket_hr"), col("segment"))
      .agg(count(lit(1)).as("n_events"))
}
