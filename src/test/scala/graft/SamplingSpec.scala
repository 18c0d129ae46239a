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

  test("mixture keeps each source at its hash-derived rate, stable across reruns") {
    val rows = Sampling.mixture(spark, SF).collect()
    assert(rows.length.toLong === Tables.load(spark, SF, "documents").count())
    rows.foreach { r =>
      val (bucket, rate, kept) = (r.getInt(2), r.getInt(3), r.getBoolean(4))
      assert(bucket >= 0 && bucket < 1000)
      assert(rate >= 100 && rate < 1000, "rate must sit in the derived [100,1000) band")
      assert(kept === (bucket < rate))
    }
    // every doc of one source shares that source's rate
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      assert(rs.map(_.getInt(3)).distinct.length === 1, s"$src has multiple rates")
    }
    // the mixture gate must be INDEPENDENT of the split bucket: a
    // correlated gate (kept == bucket < rate) would keep only train
    // docs for any source with rate <= 800‰ — the kept set must still
    // span all three splits
    val sa = Sampling.splitAssign(spark, SF).collect()
    val splits = sa.map(r => r.getLong(0) -> r.getString(2)).toMap
    val keptSplits = rows.filter(_.getBoolean(4)).map(r => splits(r.getLong(0))).toSet
    assert(keptSplits === Set("train", "val", "test"),
      s"mixture must cut across splits, got $keptSplits")
    // and the mix bucket is not the split bucket for most docs
    // (expected hash collisions ~0.1%; floor the bound at 1 so a
    // sub-100-doc fixture can't make it unsatisfiable)
    val splitBuckets = sa.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val same = rows.count(r => splitBuckets(r.getLong(0)) == r.getInt(2))
    assert(same <= math.max(1, rows.length / 100),
      s"mix bucket correlates with split bucket ($same equal)")
  }

  test("split assignment is a narrow projection (no shuffle before the sort)") {
    // the only exchange in the plan is the final orderBy's range
    // partitioning; the assignment itself must never hash-shuffle
    val plan = Sampling.splitAssign(spark, SF).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"assignment must not hash-shuffle:\n$plan")
  }
}
