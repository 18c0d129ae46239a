package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Stateful streaming sessionization — the `flatMapGroupsWithState`
  * face of [[graft.operators.Events.sessionize]] (same 30-minute gap
  * rule, same output shape).
  *
  * State design for scale: one small fixed-size record per ACTIVE user
  * (open-session bounds + a session counter), not per event; closed
  * sessions are emitted immediately (Append mode) and leave state; an
  * event-time timeout at open-end + gap flushes idle users, so state
  * size tracks concurrently-active users — the invariant that keeps a
  * stateful stream healthy at 100 TB/day.
  */
object SessionStream {

  val GapSeconds = 1800L

  /** How long a user's session COUNTER outlives their last session
    * before the state is dropped entirely. After a timeout flushes an
    * open session we keep a counter-only tombstone so a returning
    * user's session_idx keeps incrementing (matching the batch
    * numbering); the tombstone itself expires on a second, longer
    * timeout so state never grows without bound. */
  val TombstoneSeconds: Long = 7L * 24 * 3600

  /** The watermarked TimestampType column must reach the stateful
    * operator unchanged (a cast would mint a fresh, untagged
    * attribute), so events carry `ts_utc` and seconds are derived
    * inside the state function. */
  case class Ev(user_id: Long, event_id: Long, ts_utc: java.sql.Timestamp) {
    def sec: Long = ts_utc.getTime / 1000L
  }

  /** Per-user state: open-session bounds + event count (`n == 0` ⇒ no
    * open session, counter-only tombstone) + closed-session counter. */
  case class UserSession(start: Long, last: Long, n: Long, closed: Long)

  case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
      start_s: Long, end_s: Long, dur_s: Long)

  /** Per-user, per-microbatch transition: fold the (sorted) new events
    * into the open session, emitting every session the gap rule
    * closes; the still-open session stays in state with an event-time
    * timeout at its earliest possible close. */
  private[streaming] def updateUser(userId: Long, events: Iterator[Ev],
      state: GroupState[UserSession]): Iterator[SessionOut] = {
    // setTimeoutTimestamp throws if the requested timestamp is not
    // beyond the current watermark (possible when the watermark jumped
    // far ahead of this user's last event) — always clamp.
    def setTimeout(atMs: Long): Unit =
      state.setTimeoutTimestamp(math.max(atMs, state.getCurrentWatermarkMs() + 1))

    if (state.hasTimedOut) {
      val s = state.get
      if (s.n > 0) { // flush the open session, leave a counter tombstone
        state.update(UserSession(0, 0, 0, s.closed + 1))
        setTimeout((s.last + GapSeconds + TombstoneSeconds) * 1000L)
        return Iterator(SessionOut(userId, s.closed + 1, s.n, s.start, s.last, s.last - s.start))
      } else { // tombstone expiry
        state.remove()
        return Iterator.empty
      }
    }
    val sorted = events.toSeq.sortBy(e => (e.sec, e.event_id))
    val prior = state.getOption
    var closed = prior.map(_.closed).getOrElse(0L)
    var open = prior.filter(_.n > 0)
    val out = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.sec - s.last > GapSeconds =>
          closed += 1
          out += SessionOut(userId, closed, s.n, s.start, s.last, s.last - s.start)
          open = Some(UserSession(e.sec, e.sec, 1, closed))
        case Some(s) =>
          open = Some(s.copy(last = math.max(s.last, e.sec), n = s.n + 1))
        case None =>
          open = Some(UserSession(e.sec, e.sec, 1, closed))
      }
    }
    open match {
      case Some(s) =>
        state.update(s.copy(closed = closed))
        setTimeout((s.last + GapSeconds) * 1000L)
      case None => // no new events and nothing open: keep prior tombstone as-is
    }
    out.result().iterator
  }

  /** Sessionize a stream of events (needs `user_id`, `event_id`, and a
    * `ts_utc` TimestampType column for the watermark).
    *
    * `watermarkDelay` is the out-of-orderness bound: events arriving
    * more than this far behind the max seen event time are DROPPED
    * before the state function, so with the "0 seconds" default the
    * stream==batch equivalence holds only for event-time-ordered
    * input (e.g. time-partitioned files). Feeds with cross-batch
    * disorder must pass their real lateness bound. */
  def sessionize(events: Dataset[_],
      watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts_utc", watermarkDelay)
      .selectExpr("user_id", "event_id", "ts_utc")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateUser)
  }

  /** File-stream wrapper: sessionize every parquet part under `dir`
    * (AvailableNow) into an in-memory sink named `queryName`. */
  def run(spark: SparkSession, dir: String, queryName: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    // explicit nanos-as-long schema (no session-wide legacy conf)
    val reader = spark.readStream.schema(graft.Tables.eventsSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    // normalize the on-disk INT64 unit to epoch nanos (see
    // Tables.eventsTsNanosFactor) before rebuilding event-time.
    // Resolved ONCE at stream definition — the contract is one ts
    // vintage per source dir for the stream's lifetime; a dir empty
    // at start falls back to factor 1 (legacy epoch-nanos) so the
    // stream starts and drains later-arriving files. The fallback is
    // WARNED because it is only correct for nanos-vintage late files:
    // MICROS/MILLIS files landing in an empty-at-start dir would be
    // mis-scaled — populate the dir first (or restart the stream) for
    // those vintages.
    val factor = graft.Tables.eventsTsNanosFactorOpt(spark, dir).getOrElse {
      System.err.println(
        s"[graft] $dir has no parquet parts yet; assuming epoch-NANOS ts " +
          "(factor 1). If later files are MICROS/MILLIS vintage, populate " +
          "the dir before defining the stream.")
      1L
    }
    val src = reader.parquet(dir)
      .withColumn("ts", expr(s"ts * ${factor}L"))
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
    sessionize(src)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
