package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-healing rests entirely on this algebra: sentinel
  * sample i and i+1 bracket pass i, a pass is quiet iff every sentinel
  * was at its noise floor on BOTH sides, and the retry loop adds
  * bounded passes only while no quiet pass exists. Pure functions —
  * no SparkSession. */
class BenchNoiseSpec extends AnyFunSuite {

  private val Th = 40.0

  test("noisyIdx flags samples above the threshold over the lower-median floor") {
    // pos sorted [0.30, 0.42, 0.43, 1.2] -> lower median 0.42; only the
    // 1.2 burst exceeds 0.42*1.4 = 0.588 (strict >)
    assert(BenchNoise.noisyIdx(Vector(0.30, 0.42, 0.43, 1.2), Th) === Set(3))
    // size <= 2 degenerates to the min floor: a two-sample burst flags
    assert(BenchNoise.noisyIdx(Vector(0.30, 0.50), Th) === Set(1))
  }

  test("noisyIdx: a warm first sample plus slow drift flags nothing") {
    // the round-13 sf0.1 shape: sample 0 probed at the warmest instant
    // (0.24), later samples drifted to 0.33-0.35 — 46% over the MIN but
    // only ~17% over the median. A min floor disqualified passes 1-2
    // and forced the headline onto the coldest pass; the median floor
    // keeps ordinary drift quiet and saves the flag for real bursts.
    assert(BenchNoise.noisyIdx(Vector(0.24, 0.29, 0.35, 0.33), Th) === Set.empty[Int])
    // ...but a genuine burst on the same baseline still towers over it
    assert(BenchNoise.noisyIdx(Vector(0.24, 0.29, 0.90, 0.33), Th) === Set(2))
  }

  test("noisyIdx treats failed probes (-1) as noisy, and all-failed as all-noisy") {
    assert(BenchNoise.noisyIdx(Vector(0.3, -1.0, 0.31), Th) === Set(1))
    assert(BenchNoise.noisyIdx(Vector(-1.0, -1.0), Th) === Set(0, 1))
  }

  test("quietPasses requires both bracketing samples quiet on every sentinel") {
    // 3 passes -> 4 samples. Sentinel a bursts on sample 2: poisons the
    // passes it brackets (1 and 2); pass 0 stays quiet.
    val s = Map(
      "a" -> Vector(0.30, 0.31, 0.90, 0.30),
      "b" -> Vector(0.10, 0.10, 0.11, 0.10))
    assert(BenchNoise.quietPasses(s, 3, Th) === Set(0))
    // burst on sentinel b's FIRST sample instead: only pass 0 poisoned
    val s2 = Map(
      "a" -> Vector(0.30, 0.31, 0.30, 0.30),
      "b" -> Vector(0.50, 0.10, 0.11, 0.10))
    assert(BenchNoise.quietPasses(s2, 3, Th) === Set(1, 2))
  }

  test("quietPasses is empty when every pass touches a noisy sample") {
    // monotone ramp (the r11 driver-bench shape): median (mid-ramp)
    // and min disagree beyond the threshold, so the conservative min
    // floor applies, every later sample flags, and only a leading pass
    // could be quiet — the ramp starts inside pass 0's closing bracket
    val ramp = Map("a" -> Vector(0.35, 0.9, 1.3, 1.83))
    assert(BenchNoise.quietPasses(ramp, 3, Th) === Set.empty[Int])
    // bursts landing on alternating probes poison every bracket too
    val alternating = Map("a" -> Vector(3.0, 0.3, 3.0, 0.3))
    assert(BenchNoise.quietPasses(alternating, 3, Th) === Set.empty[Int])
  }

  test("a burst inflating MOST samples cannot launder itself through the median") {
    // sustained contention from inside pass 0 onward: 3 of 4 samples at
    // 10x. A bare median floor would sit at 3.0 and certify the whole
    // contaminated run quiet; the median/min disagreement (10x > Th)
    // must drop the floor to the min and flag all three
    val sustained = Map("a" -> Vector(0.3, 3.0, 3.0, 3.0))
    assert(BenchNoise.noisyIdx(Vector(0.3, 3.0, 3.0, 3.0), Th) === Set(1, 2, 3))
    assert(BenchNoise.quietPasses(sustained, 3, Th) === Set.empty[Int],
      "self-heal must trigger on a majority-contaminated run")
  }

  test("spreadPct is worst-sentinel max/min-1 and ignores failed samples") {
    val s = Map(
      "a" -> Vector(0.30, 0.60, -1.0), // 100%
      "b" -> Vector(0.10, 0.11))       // 10%
    assert(math.abs(BenchNoise.spreadPct(s) - 100.0) < 1e-9)
    assert(BenchNoise.spreadPct(Map("a" -> Vector(-1.0, -1.0))) === -1.0)
  }

  test("needsExtraPass: while fewer than minQuiet quiet passes and budget remains") {
    assert(BenchNoise.needsExtraPass(Set.empty, 0, 2))
    assert(BenchNoise.needsExtraPass(Set.empty, 1, 2))
    assert(!BenchNoise.needsExtraPass(Set.empty, 2, 2))
    // ONE quiet pass is still thin evidence (the r14 driver headline
    // shipped on quiet_passes: [0] and cost a judge cycle) — the
    // default minQuiet = 2 keeps healing until a second quiet pass
    assert(BenchNoise.needsExtraPass(Set(1), 0, 2))
    assert(!BenchNoise.needsExtraPass(Set(1, 2), 0, 2))
    assert(!BenchNoise.needsExtraPass(Set.empty, 0, 0))
    // minQuiet = 1 restores the old single-quiet-pass behavior
    assert(!BenchNoise.needsExtraPass(Set(1), 0, 2, minQuiet = 1))
  }

  test("minTimes restricts to quiet passes, falls back per-query, and keeps -1 for never-passed") {
    val passes = IndexedSeq(
      Map("q1" -> 5.0, "q2" -> -1.0, "q3" -> -1.0), // noisy pass
      Map("q1" -> 2.0, "q2" -> -1.0, "q3" -> -1.0)) // quiet pass
    val m = BenchNoise.minTimes(passes, Seq("q1", "q2", "q3"), Set(1))
    assert(m("q1") === 2.0) // quiet-pass time, not the noisy pass's 5.0
    assert(m("q3") === -1.0) // never succeeded anywhere
    // q2 fails in the quiet pass but succeeded in a noisy one -> fallback
    val passes2 = IndexedSeq(
      Map("q2" -> 7.0),
      Map("q2" -> -1.0))
    assert(BenchNoise.minTimes(passes2, Seq("q2"), Set(1))("q2") === 7.0)
  }

  test("warmup residue on the pre-pass-0 sample disqualifies only pass 0") {
    // the round-12 sf0.1 run's shape: one sentinel's first probe still
    // carries cold-cache/JIT residue (0.23 s vs a 0.14 s floor), every
    // later sample calm. The quiet-pass algebra must localize the
    // damage to pass 0 — and the run-level burst verdict (quiet empty)
    // must stay false, because the headline min never reads pass 0.
    val sentinels = Map(
      "a" -> Vector(0.31, 0.28, 0.28, 0.32),           // flat
      "b" -> Vector(0.23, 0.15, 0.14, 0.15))           // residue on sample 0
    val quiet = BenchNoise.quietPasses(sentinels, nPasses = 3, thresholdPct = 40.0)
    assert(quiet === Set(1, 2))
    assert(!BenchNoise.needsExtraPass(quiet, extrasUsed = 0, maxExtra = 2))
    assert(BenchNoise.spreadPct(sentinels) > 40.0,
      "the raw spread still records the residue for cross-round reading")
  }

  test("minTimes quiet restriction actually excludes noisy-pass wins") {
    // the noisy pass records a FASTER time (e.g. page-cache luck); the
    // quiet-restricted headline must not use it
    val passes = IndexedSeq(Map("q" -> 1.0), Map("q" -> 3.0))
    assert(BenchNoise.minTimes(passes, Seq("q"), Set(1))("q") === 3.0)
    assert(BenchNoise.minTimes(passes, Seq("q"), Set(0, 1))("q") === 1.0)
  }

  test("calmSamples intersects every sentinel's calm set") {
    val s = Map(
      "a" -> Vector(0.30, 0.31, 0.90, 0.30),
      "b" -> Vector(0.50, 0.10, 0.11, 0.10))
    // a flags sample 2, b flags sample 0 -> calm = {1, 3}
    assert(BenchNoise.calmSamples(s, Th) === Set(1, 3))
  }

  test("quietPassesRange is strict: a mid-pass probe burst unquiets the pass") {
    // pass 0 spans probes 0..2 (one interior probe), pass 1 spans 2..3.
    // The interior probe (index 1) bursts: schema 2's endpoint rule
    // would have called pass 0 quiet; the strict range rule must not.
    val s = Map("a" -> Vector(0.30, 0.95, 0.31, 0.30))
    val calm = BenchNoise.calmSamples(s, Th)
    val ranges = IndexedSeq((0, 2), (2, 3))
    assert(BenchNoise.quietPassesRange(calm, ranges) === Set(1))
    // degenerate case (no interior probes) == the endpoint rule
    val s2 = Map("a" -> Vector(0.30, 0.31, 0.90, 0.30))
    assert(BenchNoise.quietPassesRange(
      BenchNoise.calmSamples(s2, Th), IndexedSeq((0, 1), (1, 2), (2, 3))) === Set(0))
  }

  test("quietSubsetMins salvages calm-bracketed samples from a pass-contaminated run") {
    // One pass, probes 0|q1|1|q2|2 — probe 2 bursts. q1 (bracketed by
    // calm 0,1) is salvageable; q2 (bracketed by 1, noisy 2) is not.
    // That is exactly the r15 driver shape: zero quiet passes, but
    // most queries individually sat between calm probes.
    val s = Map("a" -> Vector(0.30, 0.31, 1.2))
    val calm = BenchNoise.calmSamples(s, Th)
    val passTimes = IndexedSeq(Map("q1" -> 5.0, "q2" -> 7.0))
    val brackets = IndexedSeq(Map("q1" -> ((0, 1)), "q2" -> ((1, 2))))
    assert(BenchNoise.quietSubsetMins(passTimes, brackets, calm) ===
      Map("q1" -> ((5.0, 1))))
    // failures (-1) never qualify even when calm-bracketed
    val failed = IndexedSeq(Map("q1" -> -1.0))
    assert(BenchNoise.quietSubsetMins(failed, brackets, calm) === Map.empty)
    // the min is taken across passes' quiet samples only — and the
    // sample count records how much corroboration backs it (1 here:
    // the gate refuses to fail a query on a single quiet sample)
    val s3 = Map("a" -> Vector(0.30, 0.31, 1.2, 0.30, 0.31))
    val calm3 = BenchNoise.calmSamples(s3, Th)
    val twoPasses = IndexedSeq(Map("q1" -> 2.0), Map("q1" -> 9.0))
    val twoBrackets = IndexedSeq(Map("q1" -> ((1, 2))), Map("q1" -> ((3, 4))))
    // pass-0 sample is faster but noisy-bracketed; only pass 1 counts
    assert(BenchNoise.quietSubsetMins(twoPasses, twoBrackets, calm3) ===
      Map("q1" -> ((9.0, 1))))
    // both samples quiet-bracketed → min of the two, count 2 (gateable)
    val sAll = Map("a" -> Vector(0.30, 0.31, 0.30, 0.30, 0.31))
    val calmAll = BenchNoise.calmSamples(sAll, Th)
    assert(BenchNoise.quietSubsetMins(twoPasses, twoBrackets, calmAll) ===
      Map("q1" -> ((2.0, 2))))
  }

  test("classed analysis: a systematic boundary-vs-intra gap on a flat host is calm") {
    // the r16 sf1 shape that made a quiet host ungateable: boundary
    // probes (0,3,6) ~0.24, intra-pass probes ~0.36 — each class flat,
    // but single-population noisyIdx floors to the fast class's min
    // and flags every intra sample
    val s = Map("mm" -> Vector(0.24, 0.36, 0.35, 0.23, 0.37, 0.34, 0.25))
    val boundary = Set(0, 3, 6)
    val classes = Seq(boundary, s("mm").indices.toSet -- boundary)
    assert(BenchNoise.noisyIdx(s("mm"), Th).nonEmpty) // the defect
    assert(BenchNoise.noisyIdxClassed(s("mm"), classes, Th) === Set.empty[Int])
    assert(BenchNoise.calmSamplesClassed(s, classes, Th) ===
      s("mm").indices.toSet)
  }

  test("classed analysis: an UNCORROBORATED fast first sample cannot condemn the run") {
    // the post-warmup first probe is systematically the warmest of the
    // run; with a single-sample min the floor stays at the median and
    // only genuinely slow samples flag
    val v = Vector(0.35, 0.57, 0.54, 0.66, 0.56, 0.53, 0.61)
    val one = Seq(v.indices.toSet)
    assert(BenchNoise.noisyIdx(v, Th) === v.indices.drop(1).toSet) // the defect
    assert(BenchNoise.noisyIdxClassed(v, one, Th) === Set.empty[Int])
    // a real slow outlier still flags against the median floor
    val burst = Vector(0.35, 0.57, 0.54, 1.40, 0.56, 0.53, 0.61)
    assert(BenchNoise.noisyIdxClassed(burst, one, Th) === Set(3))
  }

  test("classed analysis keeps the sustained-contention paranoia when the min is corroborated") {
    // onset ramp: two calm early samples corroborate the min, the
    // median is dragged up by the contended majority — the low floor
    // must still flag the tail (the shape the min rule exists for)
    val ramp = Vector(0.30, 0.31, 0.55, 0.58, 0.60, 0.59)
    val one = Seq(ramp.indices.toSet)
    assert(BenchNoise.noisyIdxClassed(ramp, one, Th) === Set(2, 3, 4, 5))
    // and a burst spanning an intra-pass probe flags within its class
    val s = Map("mm" -> Vector(0.24, 0.36, 0.80, 0.23, 0.37, 0.34, 0.25))
    val boundary = Set(0, 3, 6)
    val classes = Seq(boundary, s("mm").indices.toSet -- boundary)
    assert(BenchNoise.noisyIdxClassed(s("mm"), classes, Th) === Set(2))
  }
}
