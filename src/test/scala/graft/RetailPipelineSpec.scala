package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RetailPipeline

class RetailPipelineSpec extends AnyFunSuite with SparkSuite {

  test("faithful pipeline produces the 15-column weekly fact") {
    val df = RetailPipeline.faithful(spark, SF)
    assert(df.columns.toSeq === Seq(
      "yr_wk_num", "store_key", "prod_key", "total_sales_amt", "total_sales_qty",
      "avg_sales_amt", "total_sales_cost", "inventory_on_hand_qty_end_wk",
      "inventory_on_order_qty_end_wk", "total_cost_week", "out_of_stock_count",
      "total_low_stock_impact", "potential_low_stock_impact", "no_stock_instances",
      "weeks_supply"))
    assert(df.count() > 0)
  }

  test("faithful reproduces the reference quirks: A5 duplicates A4") {
    val df = RetailPipeline.faithful(spark, SF)
    assert(df.filter("total_sales_cost <> total_cost_week").count() === 0,
      "total_cost_week is defined as a duplicate of total_sales_cost")
  }

  test("faithful inner-join assembly drops grain groups; corrected keeps all") {
    val faithfulGroups = RetailPipeline.faithful(spark, SF)
      .select("yr_wk_num", "store_key", "prod_key").distinct().count()
    val correctedGroups = RetailPipeline.corrected(spark, SF).count()
    assert(correctedGroups > faithfulGroups,
      s"corrected ($correctedGroups) must cover more groups than faithful ($faithfulGroups)")
  }

  test("corrected grain is unique (no weeks_supply fanout)") {
    val df = RetailPipeline.corrected(spark, SF)
    assert(df.groupBy("yr_wk_num", "store_key", "prod_key").count()
      .filter("count > 1").count() === 0)
  }

  test("corrected mode aggregates in a single exchange (daily pre-agg plan)") {
    val plan = RetailPipeline.corrected(spark, SF).queryExecution.executedPlan.toString
    // partial/final HashAggregate pairs, no row_number window, no 8-way join
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("Window"), s"corrected mode must not need a window:\n$plan")
  }

  test("fused corrected ≡ generic buildCorrected over the derived tables (r21)") {
    // the catalog entry fuses retailTables ∘ buildCorrected into one
    // aggregate (the dailySales ⋈ dailyInv identity-join elimination);
    // this pins value-exact row equality against the generic two-table
    // path it replaced — sort both, compare full rows
    val (sales, inventory, _, _, _) = RetailPipeline.retailTables(spark, SF)
    val generic = RetailPipeline.buildCorrected(sales, inventory).collect().toSeq
    val fused = RetailPipeline.corrected(spark, SF).collect().toSeq
    assert(fused.size === generic.size)
    assert(fused === generic, "fused corrected diverged from the generic path")
  }

  test("fused corrected plan has no sort-merge join (single-scan daily frame)") {
    val plan = RetailPipeline.corrected(spark, SF).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"fused corrected must not join the daily frames:\n$plan")
  }
}
