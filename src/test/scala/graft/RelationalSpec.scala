package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, to_date, year}
import graft.operators.Relational

/** Correctness smoke + physical-plan assertions: the plans must be the
  * plans we'd want at 100 TB (pushdown reaching the scan, broadcast on
  * dims, top-k as TakeOrdered), not just any plan that returns rows. */
class RelationalSpec extends AnyFunSuite with SparkSuite {

  test("q01 pricing summary returns the 6 flag/status groups") {
    val rows = Relational.q01(spark, SF).collect()
    assert(rows.length === 6)
    assert(rows.map(_.getLong(6)).sum === 3225) // count_order total = filtered lineitem rows
  }

  test("q02 pushes filters and prunes columns at the parquet scan") {
    val plan = Relational.q02(spark, SF).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThanOrEqual(l_quantity"),
      s"filter not pushed:\n$plan")
    // 6 needed columns only (5 projected + shipdate for the filter)
    assert(plan.contains("ReadSchema") && !plan.contains("l_returnflag"),
      s"column pruning failed:\n$plan")
  }

  test("q03 star join broadcasts every dimension") {
    val plan = Relational.q03(spark, SF).queryExecution.executedPlan.toString
    assert(plan.split("BroadcastHashJoin").length >= 4, s"dims not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$plan")
  }

  test("q04 snapshot window picks the latest date per grain") {
    val df = Relational.q04(spark, SF)
    val row = df.filter("yr_wk_num = 0").orderBy("store_key", "prod_key").head()
    assert(row.getAs[java.sql.Date]("last_dt") != null)
    assert(df.groupBy("yr_wk_num", "store_key", "prod_key").count()
      .filter("count > 1").count() === 0, "grain must be unique after rn=1 filter")
  }

  test("q05 faithful fanout join inflates row counts within (prod, store)") {
    val df = Relational.q05(spark, SF)
    // fanout_rows ≥ 1 everywhere; at least one group fans out (>1) if any
    // (prod, store) pair ships on two different days in a week.
    assert(df.filter("fanout_rows < 1").count() === 0)
    assert(df.filter("fanout_rows > 1").count() > 0)
  }

  test("q08 branch joins are co-partitioned on the grain (no join re-shuffle)") {
    // Pin the static planner: AQE would broadcast these tiny test-scale
    // branches and hide the partitioning contract this asserts.
    // Restore the PRIOR values, not defaults — the session is shared.
    val prior = Seq("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Relational.q08(spark, SF).queryExecution.executedPlan.toString
      // one shuffle per branch (two aggregates + one window), and the
      // two grain joins reuse that partitioning instead of adding more
      val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(hashEx === 3, s"expected exactly one shuffle per branch, got $hashEx:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"grain joins should be shuffle-side joins on the branch partitioning:\n$plan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q10 plans as TakeOrderedAndProject (no global sort at scale)") {
    val plan = Relational.q10(spark, SF).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$plan")
  }

  test("q11 rollup emits all three grouping levels in one aggregate") {
    val rows = Relational.q11(spark, SF).collect()
    val byLevel = rows.groupBy(r => (r.getAs[Byte]("g_flag"), r.getAs[Byte]("g_status")))
    assert(byLevel.keySet === Set((0: Byte, 0: Byte), (0: Byte, 1: Byte), (1: Byte, 1: Byte)))
    val grand = byLevel((1: Byte, 1: Byte))
    assert(grand.length === 1)
    // grand total row count = sum of the leaf-level counts
    assert(grand.head.getAs[Long]("n_rows") ===
      byLevel((0: Byte, 0: Byte)).map(_.getAs[Long]("n_rows")).sum)
    // one hash aggregate does all levels — Expand feeds it, no union of scans
    val plan = Relational.q11(spark, SF).queryExecution.executedPlan.toString
    assert(plan.contains("Expand") && !plan.contains("Union"), s"rollup shape:\n$plan")
  }

  test("q12 quantiles are ordered and bounded per group") {
    Relational.q12(spark, SF).collect().foreach { r =>
      val (mn, p50, p90, p99, mx) = (r.getAs[Double]("min_qty"),
        r.getAs[Double]("p50_qty"), r.getAs[Double]("p90_qty"),
        r.getAs[Double]("p99_qty"), r.getAs[Double]("max_qty"))
      assert(mn <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx)
    }
  }

  test("q14 pivot is total, zero-filled, and single-pass") {
    val df = Relational.q14(spark, SF)
    val rows = df.collect()
    // every document lands in exactly one cell
    val total = Tables.load(spark, SF, "documents").count()
    assert(rows.map(r => (1 to 5).map(r.getLong).sum).sum === total)
    rows.foreach(r => (1 to 5).foreach(i => assert(r.getLong(i) >= 0)))
    // explicit pivot values → ONE conditional-aggregation pass: a single
    // documents scan, no values-discovery distinct job (after execution
    // the AQE plan string repeats the tree as Final + Initial sections —
    // count scans in the final section only)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(plan).size === 1,
      s"pivot must scan documents exactly once:\n$plan")
  }

  test("q15 splits every customer across semi/anti and plans both join types") {
    val df = Relational.q15(spark, SF)
    val rows = df.collect()
    // the semi and anti sides partition each nation's customers exactly
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3),
        s"nation ${r.get(0)}: semi + anti must partition the customers")
    }
    val total = Tables.load(spark, SF, "customer").count()
    assert(rows.map(_.getLong(1)).sum === total)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"semi join must plan as LeftSemi:\n$plan")
    assert(plan.contains("LeftAnti"), s"anti join must plan as LeftAnti:\n$plan")
    // the urgent filter reaches the orders SCAN (PushedFilters on the
    // parquet scan node) — a whole-plan substring would pass equally
    // with the predicate stuck in a post-join Filter
    assert("""PushedFilters: \[[^\]]*EqualTo\(o_orderpriority,1-URGENT\)""".r
        .findFirstIn(plan).isDefined,
      s"priority filter must reach the orders scan's PushedFilters:\n$plan")
  }

  test("q17 running windows share one Window node and recompute by hand") {
    val df = Relational.q17(spark, SF)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // per customer: seq is 1..n, running_spend is the prefix sum of
    // price, gap_days null exactly on the first order
    rows.groupBy(_.getLong(0)).foreach { case (cust, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to rs.length), s"cust $cust seq")
      var run = BigDecimal(0)
      sorted.zipWithIndex.foreach { case (r, i) =>
        run += BigDecimal(r.getDouble(2))
        assert(math.abs(r.getDouble(4) - run.toDouble) < 1e-6, s"cust $cust running")
        assert(r.isNullAt(5) === (i == 0), s"cust $cust gap_days null iff first")
        assert(r.isNullAt(6) === (i == rs.length - 1), s"cust $cust next_price null iff last")
      }
    }
    // all four window functions share ONE window spec → exactly one
    // Window node (and its one sort) in the plan
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("\\bWindow\\b".r.findAllIn(plan).size === 1,
      s"the four running functions must share one Window node:\n$plan")
  }

  test("q18 cube emits all four grouping levels consistently") {
    val rows = Relational.q18(spark, SF).collect()
    val byLevel = rows.groupBy(r => (r.getByte(4), r.getByte(5)))
    assert(byLevel.keySet === Set((0.toByte, 0.toByte), (0.toByte, 1.toByte),
      (1.toByte, 0.toByte), (1.toByte, 1.toByte)), "cube must emit all 4 levels")
    // the grand total row's count equals the sum of each marginal level
    val grand = byLevel((1.toByte, 1.toByte))
    assert(grand.length === 1)
    val total = grand.head.getLong(3)
    Seq((0.toByte, 0.toByte), (0.toByte, 1.toByte), (1.toByte, 0.toByte)).foreach { lvl =>
      assert(byLevel(lvl).map(_.getLong(3)).sum === total, s"level $lvl counts")
    }
    // null dims appear exactly on their grouping level
    rows.foreach { r =>
      assert(r.isNullAt(0) === (r.getByte(4) == 1), "priority null iff grouped out")
      assert(r.isNullAt(1) === (r.getByte(5) == 1), "year null iff grouped out")
    }
  }

  test("q20 grouping sets emit exactly the two marginal levels") {
    val rows = Relational.q20(spark, SF).collect()
    val byLevel = rows.groupBy(r => (r.getByte(4), r.getByte(5)))
    // the partial lattice: (priority) and (year) only — no cross
    // cells, no grand total
    assert(byLevel.keySet === Set((0.toByte, 1.toByte), (1.toByte, 0.toByte)),
      s"grouping sets must emit exactly the requested marginals, got ${byLevel.keySet}")
    // both marginals partition the same order count
    val total = Tables.load(spark, SF, "orders").count()
    assert(byLevel((0.toByte, 1.toByte)).map(_.getLong(3)).sum === total)
    assert(byLevel((1.toByte, 0.toByte)).map(_.getLong(3)).sum === total)
    rows.foreach { r =>
      assert(r.isNullAt(0) === (r.getByte(4) == 1))
      assert(r.isNullAt(1) === (r.getByte(5) == 1))
    }
  }

  test("q19 set ops partition the two year-cohorts exactly") {
    // q19 persists its cohort frames; specs are callers too under the
    // SparkEntry cache convention (shared session across suites), and
    // the cleanup must survive assert failures
    try {
      val df = Relational.q19(spark, SF)
      val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
      // no customer may land in two segments
      assert(rows.map(_._1).distinct.length === rows.length, "segments must be disjoint")
      val seg = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      // recompute the cohorts directly
      val o = Tables.load(spark, SF, "orders")
        .select(col("o_custkey"), year(to_date(col("o_orderdate"))).as("yr"))
      val c97 = o.filter(col("yr") === 1997).select("o_custkey").distinct()
        .collect().map(_.getLong(0)).toSet
      val c98 = o.filter(col("yr") === 1998).select("o_custkey").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(seg.getOrElse("both", Set.empty) === (c97 & c98))
      assert(seg.getOrElse("1997_only", Set.empty) === (c97 -- c98))
      assert(seg.getOrElse("1998_only", Set.empty) === (c98 -- c97))
    } finally spark.catalog.clearCache()
  }

  test("range-frame window equals a per-row scalar recomputation on a sample") {
    val rows = Relational.q21(spark, SF).collect()
    assert(rows.nonEmpty)
    val byCust = rows.groupBy(_.getLong(0))
    // scalar reference: for every order of the 10 busiest customers,
    // spend_30d must equal the sum over THAT customer's orders with
    // dayno in [d-30, d] — the value-based frame, not a row count
    byCust.toSeq.sortBy(-_._2.length).take(10).foreach { case (_, os) =>
      os.foreach { r =>
        val d = r.getInt(2)
        val want = os.filter(o => o.getInt(2) >= d - 30 && o.getInt(2) <= d)
        assert(r.getLong(5) === want.length.toLong, s"n_orders_30d mismatch at $r")
        assert(math.abs(r.getDouble(4) - want.map(_.getDouble(3)).sum) < 1e-6,
          s"spend_30d mismatch at $r")
      }
    }
    // one shuffle on the partition key, no extra exchange for the frame
    val plan = Relational.q21(spark, SF).queryExecution.executedPlan.toString
    assert(plan.contains("specifiedwindowframe(RangeFrame"),
      s"window must plan a RANGE frame, not a rows frame:\n$plan")
  }

  test("rank distribution: balanced deciles, one Window node, bounded fractions") {
    val rows = Relational.q24(spark, SF).collect()
    rows.groupBy(_.getString(1)).foreach { case (seg, rs) =>
      val sizes = rs.groupBy(_.getInt(3)).view.mapValues(_.length).toMap
      // ntile emits min(10, n) buckets — don't bake the test data's
      // segment sizes into the assert
      assert(sizes.keySet === (1 to math.min(10, rs.length)).toSet,
        s"$seg must fill the first min(10, n) deciles")
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$seg decile sizes must differ by at most 1: $sizes")
      rs.foreach { r =>
        assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
        assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
      }
    }
    // all three functions must share ONE Window node (one shuffle+sort)
    val plan = Relational.q24(spark, SF).queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("\\bWindow\\b".r.findAllIn(plan).length === 1,
      s"ntile/percent_rank/cume_dist must share a single Window node:\n$plan")
  }

  test("approx quantiles track the exact percentiles within rank tolerance") {
    val exact = Relational.q12(spark, SF).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val approx = Relational.q25(spark, SF).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (e50, e90, e99) = exact(r.getString(0))
      // approx_percentile guarantees a rank within accuracy⁻¹·n of the
      // target; l_quantity is integers 1..50, so a small rank slip can
      // move the value by at most a few units — assert a loose but
      // real value bound (exact interpolates, the sketch returns a
      // data value, so ±1 covers the interpolation gap alone)
      assert(math.abs(r.getDouble(1) - e50) <= 2, s"${r.getString(0)} p50 drifted")
      assert(math.abs(r.getDouble(2) - e90) <= 2, s"${r.getString(0)} p90 drifted")
      assert(math.abs(r.getDouble(3) - e99) <= 2, s"${r.getString(0)} p99 drifted")
    }
  }

  test("approx NDV tracks exact column stats within the HLL error bound") {
    val exact = Relational.q23(spark, SF).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Relational.q26(spark, SF).collect()
    assert(approx.length === exact.size)
    approx.foreach { r =>
      val e = exact(r.getString(0))
      // count/min/max are exact aggregates in both variants
      assert(r.getLong(1) === e.getLong(1), s"${r.getString(0)} n_rows")
      assert(r.getDouble(3) === e.getDouble(3), s"${r.getString(0)} min")
      assert(r.getDouble(4) === e.getDouble(4), s"${r.getString(0)} max")
      // HLL++ at the configured rsd: within 5 standard errors — a bound a
      // correct sketch exceeds with probability < 1e-6 per column
      val rel = math.abs(r.getLong(2).toDouble / e.getLong(2) - 1.0)
      assert(rel <= 5 * Relational.ndvRsd,
        s"${r.getString(0)} ndv off by ${100 * rel}% (sketch ${r.getLong(2)} vs exact ${e.getLong(2)})")
    }
    // the sketch plan must not carry q23's Expand (the 4× row blowup
    // that makes exact multi-distinct infeasible at 100 TB)
    val plan = Relational.q26(spark, SF).queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Expand"), s"approx NDV must plan without Expand:\n$plan")
  }

  test("CDC diff classifies every derived change and nothing else") {
    val rows = Relational.q22(spark, SF).collect()
    val keys = Tables.load(spark, SF, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val byOp = rows.groupBy(_.getString(1)).map { case (k, v) => k -> v.length }
    assert(byOp("D") === keys.count(_ % 97 == 3), "every 97%3 key is a delete")
    assert(byOp("I") === keys.count(_ % 97 == 7), "every 97%7 clone is an insert")
    assert(byOp("U") === keys.count(_ % 97 == 5), "every 97%5 key is an update")
    assert(rows.length === byOp.values.sum, "no unchanged rows may leak through")
    rows.foreach { r =>
      (r.getString(1): @unchecked) match {
        case "D" => assert(r.getLong(0) % 97 === 3 && r.isNullAt(3))
        case "I" => assert((r.getLong(0) - 10000000L) % 97 === 7 && r.isNullAt(2))
        case "U" =>
          assert(r.getLong(0) % 97 === 5)
          assert(math.abs(r.getDouble(3) - r.getDouble(2) - 10.0) < 1e-9)
      }
    }
  }

  test("column stats collect in ONE scan via Expand-planned multi-distinct") {
    val df = Relational.q23(spark, SF)
    val got = df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val li = Tables.load(spark, SF, "lineitem")
    val n = li.count()
    val ndvQ = li.select("l_quantity").distinct().count()
    val Array(mn, mx) = li.agg(org.apache.spark.sql.functions.min("l_quantity"),
      org.apache.spark.sql.functions.max("l_quantity")).collect()
      .flatMap(r => Array(r.getDouble(0), r.getDouble(1)))
    assert(got("l_quantity") === ((n, ndvQ, mn, mx)))
    assert(got.keySet.size === 4 && got.values.forall(_._1 == n))
    // the four exact NDVs must come from ONE lineitem scan (Expand),
    // not one aggregation pipeline per column
    // AQE's toString prints final AND initial plans — count scans in
    // the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("Expand"), s"multi-distinct must plan an Expand:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).length === 1,
      s"stats collection must read the fact exactly once:\n$plan")
  }
}
