package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events
import graft.streaming.EventsStream

class EventsSpec extends AnyFunSuite with SparkSuite {

  test("tumbling agg partitions all events exactly once") {
    val total = Tables.loadEvents(spark, SF).count()
    val agg = Events.tumblingAgg(spark, SF)
    assert(agg.selectExpr("sum(n_events)").head().getLong(0) === total)
  }

  test("sliding windows (1h, slide 30m) see each event exactly twice") {
    val total = Tables.loadEvents(spark, SF).count()
    val agg = Events.slidingAgg(spark, SF)
    assert(agg.selectExpr("sum(n_events)").head().getLong(0) === total * 2)
  }

  test("sessionize covers every event; gaps within sessions <= 30min") {
    val total = Tables.loadEvents(spark, SF).count()
    val s = Events.sessionize(spark, SF)
    assert(s.selectExpr("sum(n_events)").head().getLong(0) === total)
    assert(s.filter("dur_s < 0").count() === 0)
    // the ACTUAL gap rule: per user, sessions == 1 + inter-event gaps > 1800s,
    // computed independently of the operator under test
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val byUser = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val expected = Tables.loadEvents(spark, SF)
      .withColumn("gap", col("sec") - lag("sec", 1).over(byUser))
      .groupBy("user_id")
      .agg((sum(when(col("gap") > 1800, 1).otherwise(0)) + 1).as("n_sessions"))
    val actual = s.groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    assert(expected.exceptAll(actual).count() === 0 &&
      actual.exceptAll(expected).count() === 0,
      "per-user session count must equal 1 + gaps>30min")
  }

  test("structured-streaming tumbling agg equals the batch result") {
    val q = EventsStream.tumblingAgg(spark, SF, "stream_out")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_out")
      .selectExpr("bucket_hr", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch = EventsStream.batchEquivalent(spark, SF)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("append-mode tumbling agg emits exactly the windows behind the watermark, value-exact") {
    val q = EventsStream.tumblingAggAppend(spark, SF, "stream_append_out")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stream_append_out")
      .selectExpr("bucket_hr", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch = EventsStream.batchEquivalent(spark, SF)
      .collect().map(_.toSeq).toSet
    // final watermark = max event time − 2h: every window strictly
    // behind it MUST have emitted (exactly once, batch-identical
    // values); nothing outside the batch result may appear; windows
    // inside the horizon emit on the NEXT drain (documented caveat)
    val maxSec = Tables.loadEvents(spark, SF)
      .agg(org.apache.spark.sql.functions.max("sec")).head().getLong(0)
    val horizonHr = (maxSec - 7200) / 3600 // window end <= this hour is closed
    val mustEmit = batch.filter(r => r.head.asInstanceOf[Long] + 1 < horizonHr)
    assert(got.nonEmpty, "drain must close at least the early windows")
    assert(got.subsetOf(batch), "append rows must match batch values exactly")
    assert(mustEmit.subsetOf(got),
      "every window strictly behind the final watermark must have emitted")
  }

  test("append-mode agg across TWO drains: the horizon tail emits on drain 2, exactly once, value-exact") {
    import org.apache.spark.sql.functions._
    import java.nio.file.{Files, Path}
    // four time slices via the bench splitter, then staged into the
    // live folder two per drain — drain 1 leaves its final-watermark
    // horizon unemitted (the documented AvailableNow caveat), drain 2
    // RESUMES from the checkpoint and must close that tail with
    // batch-exact values (windows straddling the two drains' files
    // prove the state store carried drain 1's partial aggregates)
    val staged = Path.of(StreamBench.timeSplit(spark, SF, 4), "events.parquet")
    val live = Files.createTempDirectory("graft_twodrain")
    val liveEv = Files.createDirectories(live.resolve("events.parquet"))
    val out = Files.createTempDirectory("graft_twodrain_out").toString
    val ckpt = Files.createTempDirectory("graft_twodrain_ckpt").toString
    def stage(i: Int): Unit =
      Files.move(staged.resolve(f"p$i%02d.parquet"),
        liveEv.resolve(f"p$i%02d.parquet")): Unit
    def drain(): Unit = {
      val q = EventsStream.tumblingAggAppendDurable(
        spark, live.toString, out, ckpt, maxFilesPerTrigger = Some(1))
      q.awaitTermination()
    }
    def emitted(): Set[Seq[Any]] = spark.read.parquet(out)
      .selectExpr("bucket_hr", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet

    stage(0); stage(1)
    drain()
    val got1 = emitted()
    stage(2); stage(3)
    drain()
    val got2 = emitted()

    val batch = EventsStream.batchEquivalent(spark, SF)
      .collect().map(_.toSeq).toSet
    def closedBehind(maxSec: Long): Set[Seq[Any]] =
      batch.filter(r => r.head.asInstanceOf[Long] + 1 < (maxSec - 7200) / 3600)
    val ev = Tables.loadEvents(spark, SF)
    val mm = ev.agg(min("sec"), max("sec")).head()
    val (minS, fullMax) = (mm.getLong(0), mm.getLong(1))
    // drain 1 saw slices 0-1 = sec < minS + 2*width, replicating
    // timeSplit's slicing arithmetic exactly — a midpoint approximation
    // would mis-place boundary events and corrupt the tail set
    val width = math.max(1L, (fullMax - minS) / 4 + 1)
    val halfMax = ev.filter(col("sec") < minS + 2 * width)
      .agg(max("sec")).head().getLong(0)

    // drain 1: value-exact, and everything behind ITS watermark closed
    assert(got1.nonEmpty && got1.subsetOf(batch))
    // drain 2: exactly once across drains (no re-emission of drain 1's
    // windows), still value-exact against the full-input batch twin
    val dupes = spark.read.parquet(out)
      .groupBy("bucket_hr", "event_type").count().filter("count > 1").count()
    assert(dupes === 0, "a window must emit exactly once across drains")
    assert(got2.subsetOf(batch), "all emitted rows must be batch-exact")
    assert(closedBehind(fullMax).subsetOf(got2),
      "every window behind drain 2's watermark must have emitted")
    // the TAIL: windows inside drain 1's horizon but behind drain 2's
    // watermark — the last untested line of the append contract: they
    // were withheld by drain 1 and must arrive with drain 2, intact.
    // Lower bound uses window END vs drain 1's raw watermark (strict
    // >): a window ending exactly AT the watermark may already emit in
    // drain 1 under the inclusive eviction rule, and closedBehind's
    // conservative strict floor would misplace it into the tail when
    // that boundary hour holds events.
    val tail = closedBehind(fullMax).filter(r =>
      (r.head.asInstanceOf[Long] + 1) * 3600 > halfMax - 7200)
    assert(tail.nonEmpty, "fixture must exercise the horizon tail")
    assert(tail.subsetOf(got2 -- got1),
      "the drain-1 horizon tail must emit on drain 2, value-exact")
  }

  test("mergeable HLL sketches: weekly union estimate within 5% of exact") {
    val approx = graft.operators.Events.hllDistinct(spark, SF).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2).toDouble).toMap
    val exact = graft.operators.Events.exactDistinct(spark, SF).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex) <= math.max(1.0, ex * 0.05),
        s"$k: approx $ap vs exact $ex")
    }
  }

  test("streaming dedup keeps exactly the distinct event_ids") {
    val q = EventsStream.dedupStream(spark, SF, "stream_dedup_out")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_dedup_out")
    val distinctIds = Tables.loadEvents(spark, SF).select("event_id").distinct().count()
    assert(streamed.count() === distinctIds)
    assert(streamed.groupBy("event_id").count().filter("count > 1").count() === 0)
  }

  test("structured-streaming sliding agg equals the batch result") {
    val q = EventsStream.slidingAgg(spark, SF, "stream_sliding_out")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_sliding_out")
      .selectExpr("win_start", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch = EventsStream.slidingBatchEquivalent(spark, SF)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("stream-stream interval join equals the batch attribution join") {
    val q = EventsStream.clickViewJoin(spark, SF, "stream_cvjoin_out")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_cvjoin_out")
      .select("user_id", "click_id", "view_id", "click_sec", "view_sec")
      .collect().map(_.toSeq).toSet
    val batch = EventsStream.clickViewBatchEquivalent(spark, SF)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    // a vacuously-empty join would "pass" — the mixed synthetic stream
    // must produce real attributions
    assert(streamed.nonEmpty, "no click-view pair matched within the band")
  }

  test("per-group top-k is bounded, rank-ordered, and plans a WindowGroupLimit") {
    val df = Events.topkPerGroup(spark, SF)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      assert(rs.length <= Events.topkK, s"$tpe over k")
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to rs.length), s"$tpe ranks")
      // counts are non-increasing down the ranks
      sorted.map(_.getLong(2)).sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"$tpe counts not ranked")
        case _ =>
      }
    }
    // Spark 4 must compile rank<=k into a WindowGroupLimit so each map
    // task ships only a bounded per-group heap into the shuffle —
    // without it the exchange carries every (type, user) pair
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter must push down as WindowGroupLimit:\n$plan")
  }

  test("json props extraction covers every event and averages consistently") {
    val rows = Events.jsonProps(spark, SF).collect()
    assert(rows.nonEmpty)
    // every event carries a parseable {"k": N} payload
    assert(rows.map(_.getLong(1)).sum === Tables.loadEvents(spark, SF).count())
    rows.foreach { r =>
      val (n, sum, mn, mx, avg) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(mn <= mx && sum >= n * mn && sum <= n * mx)
      assert(avg === sum.toDouble / n)
    }
  }

  test("funnel stages are ordered, total over users, and monotone in time") {
    // funnel persists its shared projection; specs are callers under
    // the SparkEntry cache convention (cleanup survives failures)
    try {
      val rows = Events.funnel(spark, SF).collect()
      val nUsers = Tables.loadEvents(spark, SF).select("user_id").distinct().count()
      assert(rows.length.toLong === nUsers, "one funnel row per user")
      rows.foreach { r =>
        val stage = r.getInt(4)
        // stage encodes exactly which step timestamps exist
        assert(!r.isNullAt(1) === (stage >= 1), "t_view iff stage>=1")
        assert(!r.isNullAt(2) === (stage >= 2), "t_click iff stage>=2")
        assert(!r.isNullAt(3) === (stage >= 3), "t_purchase iff stage>=3")
        if (stage >= 2) assert(r.getLong(2) >= r.getLong(1), "click at/after view")
        if (stage >= 3) assert(r.getLong(3) >= r.getLong(2), "purchase at/after click")
      }
      // the synthetic stream has every type well-mixed: some users must
      // complete the funnel, or the dependent-min chain matched nothing
      assert(rows.exists(_.getInt(4) === 3), "nobody completed the funnel")
    } finally spark.catalog.clearCache()
  }

  test("retention matrix starts every cohort at full size and never grows") {
    // retention persists its distinct (user, week) frame (SparkEntry
    // cache convention: callers clear, unconditionally)
    try {
      val rows = Events.retention(spark, SF).collect()
      assert(rows.nonEmpty)
      val byCohort = rows.groupBy(_.getLong(0))
      byCohort.foreach { case (cohort, rs) =>
        val week0 = rs.find(_.getLong(1) == 0L)
        assert(week0.isDefined, s"cohort $cohort missing its own week")
        val size = week0.get.getLong(2)
        rs.foreach { r =>
          assert(r.getLong(1) >= 0, "no activity before the cohort week")
          assert(r.getLong(2) <= size, s"cohort $cohort retention above cohort size")
        }
      }
      // cohort sizes partition the user base
      val nUsers = Tables.loadEvents(spark, SF).select("user_id").distinct().count()
      assert(byCohort.values.map(_.find(_.getLong(1) == 0L).get.getLong(2)).sum === nUsers)
    } finally spark.catalog.clearCache()
  }

  test("intervals chain per user: contiguous, total, one open end") {
    val df = Events.intervals(spark, SF)
    val rows = df.collect()
    assert(rows.length === Tables.loadEvents(spark, SF).count(),
      "every event opens exactly one interval")
    rows.groupBy(_.getLong(0)).foreach { case (user, rs) =>
      // ordered output: each interval's valid_to is the next valid_from
      rs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) === b.getLong(3), s"user $user gap in interval chain")
          assert(a.getLong(5) === a.getLong(4) - a.getLong(3))
          assert(a.getLong(5) >= 0, s"user $user negative duration")
        case _ =>
      }
      // exactly the last interval is open-ended
      assert(rs.count(_.getBoolean(6)) === 1, s"user $user open intervals")
      assert(rs.last.getBoolean(6) && rs.last.isNullAt(4))
    }
    // one shuffle + one sort for the lead window: exactly one Window
    // node in the final plan
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("\\bWindow\\b".r.findAllIn(plan).size === 1, s"one lead window only:\n$plan")
  }

  test("window dedup keeps exactly the lag-rule survivors, gaps audit out") {
    import org.apache.spark.sql.functions._
    // independent reference: driver-side scan of every (user, type) run
    val all = Tables.loadEvents(spark, SF)
      .select("user_id", "event_type", "sec", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = all.groupBy(e => (e._1, e._2)).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._4))
      sorted.head +: sorted.sliding(2).collect {
        case Array(prev, e) if e._3 - prev._3 > Events.dedupGapSec => e
      }.toSeq
    }.map(_._4).toSet
    val got = Events.windowDedup(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(got.keySet === expected,
      s"missed ${expected.diff(got.keySet).size} / fabricated ${got.keySet.diff(expected).size}")
    assert(got.keySet.size < all.length, "dedup must actually drop something")
    // gap audit column: -1 exactly for each key's first event
    val firsts = all.groupBy(e => (e._1, e._2)).values
      .map(es => es.minBy(e => (e._3, e._4))._4).toSet
    assert(got.filter(_._2 == -1L).keySet === firsts)
  }

  test("debounce: last-KEPT fold reference, suppression accounting totals") {
    val all = Tables.loadEvents(spark, SF)
      .select("user_id", "event_type", "sec", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // independent reference fold: keep iff > gap after the last KEPT
    val expected = scala.collection.mutable.Map.empty[Long, Long]
    var trailing = 0L
    all.groupBy(e => (e._1, e._2)).values.foreach { es =>
      var lastKept = Long.MinValue
      var sup = 0L
      es.sortBy(e => (e._3, e._4)).foreach { e =>
        if (lastKept == Long.MinValue || e._3 - lastKept > Events.dedupGapSec) {
          expected(e._4) = sup; lastKept = e._3; sup = 0L
        } else sup += 1
      }
      trailing += sup
    }
    val got = Events.debounce(spark, SF).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got === expected.toMap)
    // every event is kept, suppressed-and-reported, or trailing
    assert(got.size + got.values.sum + trailing === all.length)
    assert(got.size < all.length, "debounce must actually drop something")
  }

  test("debounce vs lag-dedup: distinct semantics on a crafted chain") {
    // A chain spaced at gap*5/6 (3000s for the 3600s gap): every
    // inter-event distance is UNDER the gap, so the stateless lag rule
    // keeps only the first event — but the distance from the last KEPT
    // accumulates, so debounce re-keeps every second event. Whether the
    // production fixture happens to contain such a chain is
    // data-dependent (at sf0.001 it does not), so the semantics
    // difference is proven on a constructed corpus instead.
    import spark.implicits._
    val step = Events.dedupGapSec * 5 / 6
    val dir = java.nio.file.Files.createTempDirectory("debounce_fix").toString
    (0L until 6L)
      .map(i => (i + 1, i * step * 1000000000L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val lagKept = Events.windowDedup(spark, dir).collect().map(_.getLong(0)).toSet
    val debKept = Events.debounce(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(lagKept === Set(1L), "every lag is under the gap: lag rule keeps only the head")
    assert(debKept === Map(1L -> 0L, 3L -> 1L, 5L -> 1L),
      "distance-to-last-KEPT accumulates past the gap at every second event")
  }

  test("stream-static enrichment join equals the batch enrichment") {
    val q = EventsStream.enrichedAgg(spark, SF, "stream_enriched_out")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_enriched_out")
      .select("bucket_hr", "segment", "n_events")
      .collect().map(_.toSeq).toSet
    val batch = EventsStream.enrichedBatchEquivalent(spark, SF)
      .select("bucket_hr", "segment", "n_events")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    // non-vacuous: real segments must appear (every test user_id has a
    // customer row, so nothing should fall into UNKNOWN here)
    val segs = streamed.map(_(1).asInstanceOf[String])
    assert(segs.nonEmpty && !segs.contains("UNKNOWN"),
      s"every event user must enrich against the dimension: $segs")
  }

  test("gap fill densifies every type over the global span and conserves counts") {
    try {
      val rows = Events.gapFill(spark, SF).collect()
      val types = rows.map(_.getString(0)).distinct
      val d0 = rows.map(_.getLong(1)).min
      val d1 = rows.map(_.getLong(1)).max
      // every type spans the SAME global calendar, contiguously
      types.foreach { t =>
        val days = rows.filter(_.getString(0) == t).map(_.getLong(1)).sorted
        assert(days.head === d0 && days.last === d1,
          s"type $t must cover the global span [$d0,$d1]")
        assert(days.length.toLong === d1 - d0 + 1, s"type $t has calendar holes")
      }
      // zeros are explicit, flagged, and the non-zero mass is conserved
      rows.foreach(r => assert(r.getBoolean(3) === (r.getLong(2) == 0L)))
      val total = rows.map(_.getLong(2)).sum
      assert(total === Tables.loadEvents(spark, SF).count(),
        "gap fill must not create or lose events")
    } finally spark.catalog.clearCache()
  }

  test("anomaly flags recompute from the emitted median/MAD, constant per type") {
    try {
      val rows = Events.anomaly(spark, SF).collect()
      assert(rows.nonEmpty)
      rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
        assert(rs.map(_.getDouble(3)).distinct.length === 1, s"$t median must be constant")
        assert(rs.map(_.getDouble(4)).distinct.length === 1, s"$t MAD must be constant")
        // scalar reference: median/MAD over this type's own series
        def medianOf(xs: Seq[Double]): Double = {
          val s = xs.sorted
          val n = s.length
          if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
        }
        val counts = rs.map(_.getLong(2).toDouble).toSeq
        val med = medianOf(counts)
        val mad = medianOf(counts.map(c => math.abs(c - med)))
        assert(rs.head.getDouble(3) === med && rs.head.getDouble(4) === mad,
          s"$t med/MAD must match the scalar reference")
        rs.foreach { r =>
          val want = math.abs(r.getLong(2) - med) > Events.madK * mad
          assert(r.getBoolean(5) === want, s"flag must recompute from med/MAD at $r")
        }
      }
    } finally spark.catalog.clearCache()
  }
}
