package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events
import graft.streaming.SessionStream

/** Stateful streaming sessionization vs the batch window-function
  * result: identical sessions, with state genuinely crossing
  * microbatch boundaries (maxFilesPerTrigger=1 over time-split files).
  * A far-future flush event per user closes every real session so
  * Append mode emits them all deterministically. */
class SessionStreamSpec extends AnyFunSuite with SparkSuite {

  test("flatMapGroupsWithState sessions equal the batch sessionize") {
    import spark.implicits._
    val ev = Tables.loadEvents(spark, SF)
      .select(col("user_id"), col("event_id"), col("ts").cast("long").as("ts"),
        col("sec"))
    val (minS, maxS) = ev.agg(min("sec"), max("sec")).as[(Long, Long)].head()
    val midS = (minS + maxS) / 2

    val dir: Path = Files.createTempDirectory("graft_stream_in")
    def dump(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft_part")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = dir.resolve(name)
      Files.move(part, dst)
      dst.toFile.setLastModified(mtime)
    }
    val base = System.currentTimeMillis() - 60000
    dump(ev.filter(col("sec") <= midS).select("user_id", "event_id", "ts"),
      "p1.parquet", base)
    dump(ev.filter(col("sec") > midS).select("user_id", "event_id", "ts"),
      "p2.parquet", base + 10000)
    // flush: one far-future event per user (its own never-emitted session)
    dump(ev.groupBy("user_id").agg(((max(col("ts") / 1000000000L) + 1000000L) * 1000000000L)
        .cast("long").as("ts"))
      .withColumn("event_id", lit(-1L)).select("user_id", "event_id", "ts"),
      "p3.parquet", base + 20000)

    val q = SessionStream.run(spark, dir.toString, "graft_sessions",
      maxFilesPerTrigger = Some(1))
    q.awaitTermination()

    // The trailing no-data batch times out the flush-marker sessions
    // too; they start beyond the real data range — drop them.
    val got = spark.table("graft_sessions")
      .select("user_id", "session_idx", "n_events", "start_s", "end_s", "dur_s")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      .filter(_._4 <= maxS)
    val want = Events.sessionize(spark, SF)
      .select(col("user_id"), col("session_idx").cast("long"), col("n_events"),
        col("start_s"), col("end_s"), col("dur_s"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

    assert(got.nonEmpty)
    val missing = want.diff(got)
    val extra = got.diff(want)
    assert(got === want,
      s"\nmissing(${missing.size}): ${missing.toSeq.sorted.take(10)}\n" +
        s"extra(${extra.size}): ${extra.toSeq.sorted.take(10)}")
  }
}
