package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite with SparkSuite {

  test("as-of picks the latest build row at or before each probe time") {
    import spark.implicits._
    val probe = Seq(
      (1L, 10L, "p10"), (1L, 20L, "p20"), (1L, 5L, "p5"),
      (2L, 100L, "q100"),
      (3L, 50L, "r50")) // key with no build rows at all
      .toDF("k", "sec", "tag")
    val build = Seq(
      (1L, 10L, 111L), (1L, 15L, 115L), // tie at probe t=10 -> '<=' takes it
      (2L, 99L, 299L), (2L, 101L, 301L)) // 101 is AFTER the probe -> excluded
      .toDF("k", "sec", "v")
    val out = AsofJoin.latestPerKey(probe, build, "k", "sec", Seq("v"))
      .collect().map(r => (r.getAs[String]("tag"), r.getAs[Long]("v"))).toMap
    assert(out === Map(
      "p10" -> 111L, // equal timestamp counts (<= semantics)
      "p20" -> 115L, // latest of the two earlier rows
      "q100" -> 299L // the later build row is invisible
      // p5 (before any build) and r50 (keyless) dropped: inner semantics
    ))
  }

  test("banded range join: inclusive band edges, bounded bucket fanout") {
    import spark.implicits._
    val probe = Seq((1L, 1000L, "a"), (2L, 5000L, "b")).toDF("k", "sec", "tag")
    val build = Seq(
      (1L, 100L, 10L),   // 900 before 'a'  -> inside (edge, inclusive)
      (1L, 1900L, 11L),  // 900 after 'a'   -> inside (edge, inclusive)
      (1L, 99L, 12L),    // 901 before      -> outside
      (1L, 1901L, 13L),  // 901 after       -> outside
      (2L, 5000L, 20L),  // same second     -> inside
      (3L, 1000L, 30L))  // other key       -> never
      .toDF("k", "sec", "v")
    val out = AsofJoin.bandedRangeJoin(probe, build, "k", "sec", 900L)
      .select("tag", "v").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out === Set(("a", 10L), ("a", 11L), ("b", 20L)))
  }

  test("as-of is one shuffle on the key, not a range-fanout join") {
    val df = AsofJoin.eventsAsofOrder(spark, SF)
    val plan = df.queryExecution.executedPlan.toString
    // union + window = a single hash exchange on the key; the final
    // orderBy adds only a range exchange. A naive key-join + filter
    // formulation would show a Join with a range condition instead.
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx <= 2, s"as-of should not multiply shuffles:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must be the union+window form, not a join:\n$plan")
    assert(df.limit(1).count() === 1, "query returns rows at sf0.001")
  }
}
