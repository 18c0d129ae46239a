package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite with SparkSuite {

  test("split assignment is deterministic, total, and near the 80/10/10 target") {
    val once = Sampling.splitAssign(spark, SF).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2), r.getBoolean(3))).toMap
    val twice = Sampling.splitAssign(spark, SF).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2), r.getBoolean(3))).toMap
    assert(once === twice, "assignment must be a pure function of doc identity")
    assert(once.size.toLong === Tables.load(spark, SF, "documents").count())
    val n = once.size.toDouble
    val frac = once.values.groupBy(_._2).view.mapValues(_.size / n).toMap
    // md5 buckets are uniform; at spec scale allow generous tolerance
    assert(math.abs(frac("train") - 0.8) < 0.08, s"train fraction ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.05, s"val fraction ${frac("val")}")
    assert(math.abs(frac("test") - 0.1) < 0.05, s"test fraction ${frac("test")}")
    // the sample flag is consistent with the bucket and hits every split
    once.values.foreach { case (b, _, s) => assert(s === (b % 10 == 0)) }
    val sampledSplits = once.values.filter(_._3).map(_._2).toSet
    assert(sampledSplits === Set("train", "val", "test"),
      s"10% sample must cut across splits, got $sampledSplits")
  }

  test("split assignment is a narrow projection (no shuffle before the sort)") {
    // the only exchange in the plan is the final orderBy's range
    // partitioning; the assignment itself must never hash-shuffle
    val plan = Sampling.splitAssign(spark, SF).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"assignment must not hash-shuffle:\n$plan")
  }
}
