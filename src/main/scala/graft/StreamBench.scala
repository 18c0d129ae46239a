package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{EventsStream, SessionStream}

/** Per-round streaming benchmark — `StreamBench <sfDir>` runs every
  * streaming operator in the tier against the given corpus and writes
  * one machine-readable artifact (per-op wall seconds, emitted rows,
  * per-batch trigger-execution millis, per-batch state rows), so
  * stream regressions show up in a diffable `bench_reports/
  * stream_r{N}.json` rather than only in local ScalaTest runs.
  *
  * The ops mirror the spec-asserted streaming surface:
  * tumbling/sliding windowed aggs (complete-mode drain AND the
  * append-mode continuous twin whose watermark evicts closed
  * windows), exactly-once dedup counts over an at-least-once feed,
  * the stream-stream interval join, stream-static broadcast
  * enrichment, `flatMapGroupsWithState` sessionization, and the
  * at-rest-index dedup probe. Every op streams a time-split copy
  * with `maxFilesPerTrigger=1` (the StreamSkewBench idiom) so each
  * artifact row carries a real multi-batch state-rows trajectory,
  * not a single-batch point.
  *
  * Stdout contract matches graft.Bench: a compact summary line is
  * printed FIRST and again LAST (tail-anchored captures see the final
  * complete line), with the artifact on disk as the full record.
  */
object StreamBench {

  /** JSON for one op run — pure, so the bookkeeping spec can pin the
    * shape without a streaming run. A micro-batch where the source
    * reported no metric (internally recorded as a negative value —
    * e.g. a stateless op's state rows, or a missing trigger duration)
    * is emitted as JSON `null`: the schema is self-describing, where
    * the pre-schema-2 `-1` sentinel needed a top-level note to keep
    * readers from mis-parsing it as a regression. */
  def recordJson(name: String, batchMs: Seq[Long], stateRows: Seq[Long],
      wallS: Double, outRows: Long): String = {
    def arr(xs: Seq[Long]): String =
      xs.map(x => if (x < 0) "null" else x.toString).mkString("[", ",", "]")
    s""""$name": {"batch_ms": ${arr(batchMs)}, """ +
      s""""state_rows": ${arr(stateRows)}, """ +
      s""""wall_s": ${num(wallS)}, "out_rows": $outRows}"""
  }

  /** The full artifact object — pure. Schema 3 adds the harness config
    * (cpus = local[N] AND shuffle partitions, splits = micro-batch
    * count): batch latencies shift ~2-3x between local[8] and
    * local[32] on the SAME data — a micro-batch's shuffle pays
    * per-task scheduling overhead proportional to partition count, so
    * over-parallelizing small batches is a real cost, not noise
    * (measured r16: 35.5 s at cpus=8 vs 70.4 s at cpus=32, identical
    * state trajectories). An artifact without its config invited
    * exactly the false cross-round comparison the bench budgets
    * refuse for batch runs. */
  def reportJson(sfDir: String, totalWallS: Double, records: Seq[String],
      cpus: String, splits: Int): String =
    records.mkString(
      s"""{"metric": "stream_total", "value": ${num(totalWallS)}, """ +
        s""""unit": "sec", "sf": "$sfDir", "schema": 3, """ +
        s""""cpus": "$cpus", "splits": $splits, """ +
        """"ops": {""",
      ", ", "}}")

  private def num(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  /** Rewrite `dir`'s events as `k` single-file time slices with
    * ascending mtimes (the file source orders micro-batches by mtime,
    * keeping the watermark honest), laid out as a directory-layout
    * events table — `<out>/events.parquet/pNN.parquet` — so the
    * returned dir streams through EVERY events consumer: pass `<out>`
    * to the EventsStream ops (their layout probe sees the directory)
    * and `<out>/events.parquet` to SessionStream.run. Shared with
    * StreamSkewBench. */
  def timeSplit(spark: SparkSession, dir: String, k: Int): String = {
    val ev = Tables.loadEvents(spark, dir)
    val mm = ev.agg(min("sec"), max("sec")).head()
    val (minS, maxS) = (mm.getLong(0), mm.getLong(1))
    val width = math.max(1L, (maxS - minS) / k + 1)
    val out = Files.createTempDirectory("graft_stream_in")
    val evDir = Files.createDirectories(out.resolve("events.parquet"))
    val base = System.currentTimeMillis() - 600000
    (0 until k).foreach { i =>
      val lo = minS + i * width
      val hi = minS + (i + 1) * width
      val tmp = Files.createTempDirectory("graft_stream_part")
      ev.filter(col("sec") >= lo && col("sec") < hi)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(_.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
      val dst = evDir.resolve(f"p$i%02d.parquet")
      Files.move(part, dst): Unit
      dst.toFile.setLastModified(base + i * 1000L): Unit
    }
    out.toString
  }

  /** Arriving-docs drop folder for the dedup probe stream: the
    * corpus's batch partition (doc_id % 10 == 7) written as `k`
    * single-file slices, one micro-batch each under
    * maxFilesPerTrigger=1. Sliced on doc_id DIV batchStride — the ids
    * themselves are all ≡ batchRes (mod batchStride), so slicing on
    * doc_id mod k would leave slices structurally empty for even k. */
  def docSplit(spark: SparkSession, dir: String, k: Int): String = {
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % graft.operators.Dedup.batchStride ===
        lit(graft.operators.Dedup.batchRes))
    val out = Files.createTempDirectory("graft_docstream_in")
    (0 until k).foreach { i =>
      docs.filter(expr(
          s"pmod(doc_id div ${graft.operators.Dedup.batchStride}, $k) = $i"))
        .coalesce(1).write.mode("append").parquet(out.toString)
    }
    out.toString
  }

  /** Run one streaming query to termination and pull its metrics:
    * (per-batch trigger ms, per-batch state rows, wall s, out rows). */
  def runTimed(spark: SparkSession, start: () => StreamingQuery, sink: String)
      : (Seq[Long], Seq[Long], Double, Long) = {
    val t0 = System.nanoTime()
    val q = start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    val trig = prog.map(p =>
      Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(-1L))
    // SUM across state operators — a plan can carry several (e.g.
    // dedup_counts = dropDuplicatesWithinWatermark + aggregate), and
    // the first alone under-reports the stream's real state footprint
    val state = prog.map(p =>
      if (p.stateOperators.isEmpty) -1L
      else p.stateOperators.map(_.numRowsTotal).sum)
    val outRows = spark.table(sink).count()
    spark.sql(s"DROP VIEW IF EXISTS $sink"): Unit
    (trig, state, wall, outRows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val splits = sys.env.getOrElse("SPARK_GRAFT_STREAM_SPLITS", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // one micro-batch per split file: keep every progress entry
      .config("spark.sql.streaming.numRecentProgressUpdates",
        math.max(100, splits * 2))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional comma-separated op subset (e.g. the sf1 latency probe
    // runs only sessionize + doc_dedup_probe against the big corpus).
    // Unknown names fail fast: a typo must not commit an empty artifact
    // wearing a success-shaped summary line as round evidence.
    val knownOps = Set("tumbling_agg", "tumbling_agg_append", "sliding_agg",
      "dedup_counts", "clickview_join", "enriched_agg", "sessionize",
      "doc_dedup_probe")
    val only = sys.env.get("SPARK_GRAFT_STREAM_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      // an empty/whitespace value would pass the unknown-name check
      // vacuously, deselect every op, and commit an empty ops:{}
      // artifact wearing a success-shaped summary line
      require(names.nonEmpty,
        "SPARK_GRAFT_STREAM_OPS is set but selects no ops " +
          s"(known: ${knownOps.toSeq.sorted.mkString(", ")})")
      val unknown = names.diff(knownOps)
      require(unknown.isEmpty,
        s"unknown SPARK_GRAFT_STREAM_OPS: ${unknown.mkString(", ")} " +
          s"(known: ${knownOps.toSeq.sorted.mkString(", ")})")
    }
    def selected(name: String): Boolean = only.forall(_.contains(name))

    def run(name: String, start: String => StreamingQuery): Option[String] =
      if (!selected(name)) None
      else {
        val sink = s"graft_sb_$name"
        val (trig, state, wall, outRows) = runTimed(spark, () => start(sink), sink)
        System.err.println(s"[stream-bench] $name: ${num(wall)} s, $outRows rows")
        Some(recordJson(name, trig, state, wall, outRows))
      }

    // setup OUTSIDE the timed window: input slicing AND the one-time
    // at-rest dedup index build — the probe op measures the steady
    // state where the index already exists (run()'s own ensureIndexed
    // is then a fingerprint-gated no-op). Every op streams the
    // time-sliced copy with maxFilesPerTrigger=1, one micro-batch per
    // slice, so each artifact row carries a real multi-batch
    // trajectory (flat-state evidence needs >= 2 points per op).
    val evOps = knownOps - "doc_dedup_probe"
    val sessionIn =
      if (evOps.exists(selected)) timeSplit(spark, sfDir, splits) else ""
    val probeIn =
      if (selected("doc_dedup_probe")) docSplit(spark, sfDir, 4) else ""
    if (selected("doc_dedup_probe"))
      graft.operators.Dedup.ensureIndexed(spark, sfDir)
    val t0 = System.nanoTime()
    val records = Seq(
      run("tumbling_agg",
        EventsStream.tumblingAgg(spark, sessionIn, _, Some(1))),
      // the continuous-pipeline twin: append mode + watermark eviction
      // — its state trajectory stays at the open-window horizon while
      // complete-mode tumbling_agg's grows with windows-ever-seen
      run("tumbling_agg_append",
        EventsStream.tumblingAggAppend(spark, sessionIn, _, Some(1))),
      run("sliding_agg",
        EventsStream.slidingAgg(spark, sessionIn, _, Some(1))),
      run("dedup_counts",
        EventsStream.dedupCounts(spark, sessionIn, _, Some(1))),
      run("clickview_join",
        EventsStream.clickViewJoin(spark, sessionIn, _, Some(1))),
      run("enriched_agg", EventsStream.enrichedAgg(spark, sessionIn, _,
        Some(1), dimDir = Some(sfDir))),
      run("sessionize", SessionStream.run(spark, s"$sessionIn/events.parquet",
        _, maxFilesPerTrigger = Some(1))),
      run("doc_dedup_probe", graft.streaming.DocDedupStream.run(
        spark, sfDir, probeIn, _, maxFilesPerTrigger = Some(1)))).flatten
    val totalWall = (System.nanoTime() - t0) / 1e9

    val report = reportJson(sfDir, totalWall, records, cpus, splits)
    val reportPath = java.nio.file.Paths
      .get(sys.env.getOrElse("SPARK_GRAFT_STREAM_REPORT_PATH",
        "target/stream_report.json"))
      .toAbsolutePath
    try {
      Option(reportPath.getParent).foreach(Files.createDirectories(_): Unit)
      Files.write(reportPath,
        report.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      System.err.println(s"[stream-bench] report written to $reportPath")
    } catch {
      case e: Throwable => System.err.println(s"[stream-bench] report write failed: $e")
    }

    val compact =
      s"""{"metric": "stream_total", "value": ${num(totalWall)}, """ +
        s""""unit": "sec", "sf": "$sfDir", "report": "$reportPath"}"""
    println(compact)
    println(report)
    println(compact)
    spark.stop()
  }
}
