package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

class DedupStreamSpec extends AnyFunSuite with SparkSuite {

  test("events table is unique on event_id (plant precondition)") {
    val ev = Tables.loadEvents(spark, SF)
    assert(ev.count() === ev.dropDuplicates("event_id").count(),
      "derived at-least-once feed assumes unique source event ids")
  }

  test("streaming dedup restores exactly-once counts over the duplicated feed") {
    val q = EventsStream.dedupCounts(spark, SF, "dedup_stream_out")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dedup_stream_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = EventsStream.dedupBatchEquivalent(spark, SF)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch,
      "streamed per-type counts must equal batch distinct counts")
    // and the dedup genuinely removed the planted duplicates: totals
    // equal the source row count, not the inflated feed count
    val total = Tables.loadEvents(spark, SF).count()
    assert(streamed.values.sum === total)
    val planted = Tables.loadEvents(spark, SF)
      .filter(col("event_id") % 10 === 0).count()
    assert(planted > 0, "fixture must actually plant duplicates")
  }
}
