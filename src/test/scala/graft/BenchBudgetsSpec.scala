package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure bookkeeping for the per-query regression gate
  * (`bench_budgets.json` → the bench artifact's `budget` block) — the
  * BenchNoiseSpec idiom: the algebra is pinned without a Spark run. */
class BenchBudgetsSpec extends AnyFunSuite {

  private val sampleJson =
    """{
      | "schema": 1, "tolerance_x": 1.5, "abs_slack_s": 0.5,
      | "epochs": {
      |  "sf0.1": {
      |   "artifact": "bench_reports/example.json",
      |   "cpus": "32",
      |   "sentinels": {"dedup_exact": 0.40, "mm_binary_meta": 0.10},
      |   "queries": {"q_fast": 1.0, "q_slow": 10.0}
      |  }
      | }
      |}""".stripMargin

  test("parse reads tolerance, slack, and per-SF epochs") {
    val b = BenchBudgets.parse(sampleJson)
    assert(b.toleranceX === 1.5)
    assert(b.absSlackS === 0.5)
    assert(b.epochs("sf0.1").queries === Map("q_fast" -> 1.0, "q_slow" -> 10.0))
    assert(b.epochs("sf0.1").sentinels("dedup_exact") === 0.40)
    // the epoch's harness config rides along (absent in older files)
    assert(b.epochs("sf0.1").cpus === Some("32"))
  }

  test("sfKey is the data dir basename, shared by driver and local paths") {
    assert(BenchBudgets.sfKey("/root/testdata/sf0.1") === "sf0.1")
    assert(BenchBudgets.sfKey("target/benchdata/sf1") === "sf1")
  }

  test("ambientFactor: geometric mean of sentinel ratios, clamped >= 1") {
    val epoch = Map("a" -> 0.40, "b" -> 0.10)
    // 2x on one sentinel, 1x on the other -> sqrt(2)
    val f = BenchBudgets.ambientFactor(epoch, Map("a" -> 0.80, "b" -> 0.10))
    assert(math.abs(f - math.sqrt(2.0)) < 1e-9)
    // a FASTER host never tightens ceilings below the committed epoch
    assert(BenchBudgets.ambientFactor(epoch, Map("a" -> 0.20, "b" -> 0.05)) === 1.0)
    // no usable sentinel -> the conservative factor 1
    assert(BenchBudgets.ambientFactor(epoch, Map.empty) === 1.0)
    assert(BenchBudgets.ambientFactor(epoch, Map("a" -> -1.0)) === 1.0)
  }

  test("evaluate: violations above the scaled ceiling, unbudgeted named, failures skipped") {
    val b = BenchBudgets.parse(sampleJson)
    val epoch = b.epochs("sf0.1")
    // calm sentinels -> factor 1; ceilings 1*1.5+0.5=2.0 and 10*1.5+0.5=15.5
    val (f, violations, unbudgeted) = BenchBudgets.evaluate(
      epoch, b.toleranceX, b.absSlackS,
      headline = Map("q_fast" -> 2.5, "q_slow" -> 12.0, "q_new" -> 3.0),
      currentSentinelMins = Map("dedup_exact" -> 0.40, "mm_binary_meta" -> 0.10))
    assert(f === 1.0)
    assert(violations.map(v => (v.query, v.budgetS)) === Seq(("q_fast", 2.0)))
    assert(unbudgeted === Seq("q_new"))
    // an ambient epoch (sentinels uniformly 2x) lifts the ceiling over 2.5
    val (f2, v2, _) = BenchBudgets.evaluate(
      epoch, b.toleranceX, b.absSlackS, Map("q_fast" -> 2.5),
      Map("dedup_exact" -> 0.80, "mm_binary_meta" -> 0.20))
    assert(math.abs(f2 - 2.0) < 1e-9)
    assert(v2.isEmpty, "sentinel-normalized ceiling must absorb the ambient epoch")
    // a failed query (-1 headline sentinel) is not a budget violation
    val (_, v3, _) = BenchBudgets.evaluate(
      epoch, b.toleranceX, b.absSlackS, Map("q_fast" -> -1.0),
      Map("dedup_exact" -> 0.40))
    assert(v3.isEmpty)
  }

  test("the COMMITTED bench_budgets.json parses and is structurally sound") {
    // guards regeneration mistakes at build time: a malformed or
    // half-pinned committed file would otherwise only surface as a
    // skipped gate deep inside a 15-minute bench run
    val path = java.nio.file.Paths.get("bench_budgets.json")
    assert(java.nio.file.Files.exists(path), "bench_budgets.json must be committed")
    val b = BenchBudgets.parse(java.nio.file.Files.readString(path))
    assert(b.toleranceX > 1.0 && b.absSlackS > 0.0)
    assert(b.epochs.keySet === Set("sf0.1", "sf1", "sf10", "sf100sub"))
    // the sf100sub tier pins EXACTLY the sub-quadratic dedup/ANN family
    // (r20, commit bba010e): assert membership, not just a count, so a
    // silently dropped query trips this spec rather than skating past a
    // size threshold
    val subQuadFamily = Set(
      "dedup_embedding_cosine_sampled", "dedup_embedding_lsh",
      "dedup_incremental_bucketed", "dedup_minhash_lsh", "dedup_paragraph",
      "dedup_simhash_wide", "sim_ann_ivf", "sim_ann_ivfpq",
      "sim_ann_ivfpq_served", "sim_ann_lsh", "sim_cosine_topk")
    b.epochs.foreach { case (key, e) =>
      assert(e.cpus.nonEmpty, s"$key epoch must pin its cpus config")
      assert(e.sentinels.nonEmpty && e.sentinels.values.forall(_ > 0),
        s"$key epoch needs positive sentinel floors")
      assert(e.queries.values.forall(_ >= 0), s"$key epoch has negative budgets")
      if (key == "sf100sub") {
        assert(e.queries.keySet === subQuadFamily,
          s"sf100sub epoch must pin exactly the sub-quadratic family " +
            s"(got ${e.queries.keySet.toSeq.sorted})")
      } else {
        // every full tier pins the FULL catalog since r18 (sf10 pinned only
        // the 18-query scaling subset through r17, leaving 78 queries free
        // to regress at the 100x tier without tripping a ceiling)
        assert(e.queries.size >= 90,
          s"$key epoch must cover the full catalog (got ${e.queries.size})")
      }
    }
  }

  test("blockJson: explicit skip marker vs clean vs violating runs") {
    assert(BenchBudgets.blockJson(None) === """{"checked": false}""")
    // a skipped gate names WHY (missing file, unpinned tier, or a
    // cpus-incomparable run — the failure mode the first gated run hit)
    assert(BenchBudgets.blockJson(None, Some("epoch pinned at cpus=32")) ===
      """{"checked": false, "reason": "epoch pinned at cpus=32"}""")
    // arbitrary error text (the parse-failure path) must stay valid JSON
    assert(BenchBudgets.blockJson(None, Some("bad \"quote\"\nand\tline")) ===
      """{"checked": false, "reason": "bad  quote  and line"}""")
    // control characters beyond \n\r\t (the r15 advisory: \b, \f, raw
    // U+0000-001F from exception messages) must also sanitize
    assert(BenchBudgets.blockJson(None, Some("a\u0000b\bc\fd")) ===
      """{"checked": false, "reason": "a b c d"}""")
    val clean = BenchBudgets.blockJson(Some(
      BenchBudgets.GateResult("sf1", "quiet_passes", 1.07, Seq.empty, Seq.empty)))
    assert(clean.contains(""""checked": true"""))
    assert(clean.contains(""""sf_key": "sf1""""))
    assert(clean.contains(""""mode": "quiet_passes""""))
    assert(clean.contains(""""ambient_factor": 1.070"""))
    assert(clean.contains(""""violations": []"""))
    assert(!clean.contains("uncovered"), "no uncovered list outside subset mode")
    val bad = BenchBudgets.blockJson(Some(BenchBudgets.GateResult("sf0.1",
      "quiet_passes", 1.0,
      Seq(BenchBudgets.Violation("q", 3.21, 2.5)), Seq("q_new"))))
    assert(bad.contains(
      """"violations": [{"query":"q","sec":3.210,"budget_s":2.500}]"""))
    assert(bad.contains(""""unbudgeted": ["q_new"]"""))
    val subset = BenchBudgets.blockJson(Some(BenchBudgets.GateResult("sf1",
      "quiet_subset", 1.0, Seq.empty, Seq.empty, uncovered = Seq("q_miss"))))
    assert(subset.contains(""""mode": "quiet_subset""""))
    assert(subset.contains(""""uncovered": ["q_miss"]"""))
  }

  test("gate: cpus-mismatched runs refuse with checked:false, never false violations") {
    // the r15 *_cpus8 demo artifacts showed the PRE-guard behavior
    // (checked:true with structurally-false violations from gating a
    // local[8] run against a local[32] epoch); this pins the decision
    // at HEAD — alongside the committed *_cpus8_r16 artifact showing
    // the same refusal from a live run
    val b = BenchBudgets.parse(sampleJson)
    val headline = Map("q_fast" -> 2.5, "q_slow" -> 22.0) // would violate
    val out = BenchBudgets.gate(b, "sf0.1", cpus = "8", headline,
      quietPassesExist = true, quietSubset = Map.empty,
      sentinelMins = Map("dedup_exact" -> 0.40))
    assert(out === Left("epoch pinned at cpus=32, this run used cpus=8 — " +
      "incomparable harness config"))
    assert(BenchBudgets.blockJson(None, out.left.toOption)
      .startsWith("""{"checked": false, "reason": "epoch pinned at cpus=32"""))
  }

  test("gate: quiet passes gate the headline; without them the quiet subset gates") {
    val b = BenchBudgets.parse(sampleJson)
    val calmMins = Map("dedup_exact" -> 0.40, "mm_binary_meta" -> 0.10)
    // normal path: headline checked in quiet_passes mode
    val normal = BenchBudgets.gate(b, "sf0.1", "32",
      Map("q_fast" -> 2.5, "q_slow" -> 9.0), quietPassesExist = true,
      quietSubset = Map.empty, sentinelMins = calmMins)
    assert(normal.exists(r => r.mode == "quiet_passes" &&
      r.violations.map(_.query) == Seq("q_fast")))
    // contaminated headline + salvage: ONLY the subset entries are
    // checked (the burst-inflated headline never is), and the queries
    // with no quiet-bracketed sample are listed as uncovered
    val salvage = BenchBudgets.gate(b, "sf0.1", "32",
      Map("q_fast" -> 9.9, "q_slow" -> 99.0), quietPassesExist = false,
      quietSubset = Map("q_fast" -> 1.2), sentinelMins = calmMins)
    assert(salvage.exists(r => r.mode == "quiet_subset" &&
      r.violations.isEmpty && r.uncovered == Seq("q_slow")))
    // contaminated with NO salvage: explicit skip
    val nothing = BenchBudgets.gate(b, "sf0.1", "32",
      Map("q_fast" -> 9.9), quietPassesExist = false,
      quietSubset = Map.empty, sentinelMins = calmMins)
    assert(nothing.isLeft && nothing.left.exists(_.contains("nothing gateable")))
    // unknown tier: explicit skip naming the key
    assert(BenchBudgets.gate(b, "skew0.1", "32", Map.empty,
      quietPassesExist = true, Map.empty, calmMins).isLeft)
  }
}
