package graft

/** Pure bookkeeping for the bench's noise sentinels and self-healing
  * retry decision — separated from [[Bench]]'s side-effecting main so
  * the quiet-pass algebra is spec-testable without a SparkSession.
  *
  * Model: a run is `nPasses` interleaved catalog passes bracketed by
  * sentinel probes — one probe before pass 0 and one after every pass,
  * so sentinel sample `i` and `i+1` bracket pass `i`. A burst that
  * spans a probe lands on that sample and un-quiets the adjacent
  * pass(es). A burst confined STRICTLY inside one pass (starting
  * after its leading probe, ending before its trailing one) can leave
  * both probes calm — the sentinel flag is a strong signal, not a
  * proof; what protects the headline against that residual case is
  * the min over MULTIPLE interleaved passes (a mid-pass burst inflates
  * one pass's times, and another pass's min wins).
  */
object BenchNoise {

  /** Indices of noisy samples, flagged against an adaptive floor.
    *
    * Floor choice: the positive LOWER MEDIAN when it agrees with the
    * positive MIN (within `thresholdPct`), else the MIN. Rationale for
    * each half:
    *  - median over min when they agree: sample 0 is probed at the
    *    warmest instant of the run (right after sentinel warmup), so
    *    it is systematically the fastest — with a bare min floor,
    *    ordinary slow ambient drift pushes every LATER sample over
    *    the threshold, disqualifying exactly the warmed-up passes and
    *    forcing the headline onto the coldest pass (observed in the
    *    round-13 sf0.1 run: quiet=[0] with pass-0 times 30-50% above
    *    the true per-query mins);
    *  - min when median and min DISAGREE: a burst that inflates more
    *    than half the samples (sustained contention, a mid-run onset
    *    ramp) drags the median up with it, and a median floor would
    *    certify the whole contaminated run as quiet — when the two
    *    floors diverge beyond the threshold the run is bimodal and
    *    the conservative low floor is the trustworthy one.
    * Degenerates to the min floor for vectors of size ≤ 2.
    * Non-positive samples (probe failures recorded as -1) are treated
    * as noisy — an unobserved noise floor must not certify a pass as
    * quiet. */
  def noisyIdx(samples: Vector[Double], thresholdPct: Double): Set[Int] = {
    val pos = samples.filter(_ > 0).sorted
    if (pos.isEmpty) samples.indices.toSet
    else {
      val minPos = pos.head
      val median = pos((pos.size - 1) / 2)
      val base =
        if (median / minPos - 1.0 > thresholdPct / 100.0) minPos else median
      samples.zipWithIndex.collect {
        case (s, i) if s <= 0 || s / base - 1.0 > thresholdPct / 100.0 => i
      }.toSet
    }
  }

  /** SCHEMA-2 LEGACY endpoint rule — passes whose two BRACKETING
    * samples (p and p+1) are non-noisy for every sentinel. Production
    * runs are schema 3 and use [[quietPassesRange]] over
    * [[calmSamples]] instead (strict over every probe in the pass's
    * range, including intra-pass probes); this stays only as the
    * spec-pinned degenerate case that rule must reduce to when a pass
    * has no interior probes. Not called from [[Bench]]. */
  def quietPasses(sentinelSamples: Map[String, Vector[Double]], nPasses: Int,
      thresholdPct: Double): Set[Int] = {
    val noisy = sentinelSamples.values.map(noisyIdx(_, thresholdPct)).toSeq
    (0 until nPasses).filter { p =>
      noisy.forall(n => !n(p) && !n(p + 1))
    }.toSet
  }

  /** Worst per-sentinel spread (max/min − 1, %) across the run; -1 when
    * no sentinel has two positive samples. A raw observable for
    * cross-round comparison; the run-level `burst` verdict is
    * `quietPassesRange(calmSamples(...), ranges).isEmpty` — the
    * headline is contaminated exactly when no pass had every probe in
    * its range calm. */
  def spreadPct(sentinelSamples: Map[String, Vector[Double]]): Double = {
    val spreads = sentinelSamples.values.flatMap { s =>
      val pos = s.filter(_ > 0)
      if (pos.size >= 2) Some((pos.max / pos.min - 1.0) * 100.0) else None
    }
    if (spreads.isEmpty) -1.0 else spreads.max
  }

  /** Sample indices calm (non-noisy) for EVERY sentinel — the shared
    * ingredient of the strict pass verdict and the quiet-subset
    * salvage below. */
  def calmSamples(sentinelSamples: Map[String, Vector[Double]],
      thresholdPct: Double): Set[Int] = {
    val n = sentinelSamples.values.map(_.size).minOption.getOrElse(0)
    val noisy = sentinelSamples.values.map(noisyIdx(_, thresholdPct)).toSeq
    (0 until n).filter(i => noisy.forall(!_(i))).toSet
  }

  /** Class-stratified noisy-sample detection. Schema-3 probe samples
    * are NOT one population: pass-BOUNDARY probes run against a
    * different micro-environment than INTRA-PASS probes, which execute
    * interleaved with heavy catalog queries — the r16 sf1 runs
    * measured a systematic ~50% boundary-vs-intra gap on a FLAT
    * ambient host, which [[noisyIdx]]'s single-population floor read
    * as 100%+ spread and flagged every intra-pass sample, making a
    * quiet host structurally unable to produce a gateable sf1 run.
    * Each sample is therefore judged against its OWN class's floor.
    *
    * Within a class the floor is the positive lower median, EXCEPT
    * when the class min is corroborated (≥ 2 positive samples within
    * `thresholdPct` of it) AND the median diverges from it beyond the
    * threshold — the sustained-contention shape (an onset ramp's calm
    * early samples corroborate the min, so the conservative low floor
    * still flags the contended tail). Requiring corroboration means a
    * SINGLE anomalously fast sample — the post-warmup first probe is
    * systematically the warmest of the whole run — can no longer
    * condemn every other sample. */
  def noisyIdxClassed(samples: Vector[Double], classes: Seq[Set[Int]],
      thresholdPct: Double): Set[Int] =
    classes.flatMap { cls =>
      val idx = samples.indices.filter(cls)
      val pos = idx.map(samples).filter(_ > 0).sorted
      if (pos.isEmpty) idx
      else {
        val minPos = pos.head
        val median = pos((pos.size - 1) / 2)
        val corroborated =
          pos.count(s => s / minPos - 1.0 <= thresholdPct / 100.0) >= 2
        val base =
          if (corroborated && median / minPos - 1.0 > thresholdPct / 100.0)
            minPos
          else median
        idx.filter(i =>
          samples(i) <= 0 || samples(i) / base - 1.0 > thresholdPct / 100.0)
      }
    }.toSet

  /** [[calmSamples]] under class stratification: calm = non-noisy per
    * [[noisyIdxClassed]] for EVERY sentinel. `classes` partitions (or
    * covers) the probe indices — Bench passes {boundary, intra-pass}
    * derived from the pass probe ranges. */
  def calmSamplesClassed(sentinelSamples: Map[String, Vector[Double]],
      classes: Seq[Set[Int]], thresholdPct: Double): Set[Int] = {
    val n = sentinelSamples.values.map(_.size).minOption.getOrElse(0)
    val noisy =
      sentinelSamples.values.map(noisyIdxClassed(_, classes, thresholdPct)).toSeq
    (0 until n).filter(i => noisy.forall(!_(i))).toSet
  }

  /** STRICT pass-quiet over probe ranges (schema 3): pass p is quiet
    * iff EVERY probe index in [ranges(p)._1, ranges(p)._2] is calm —
    * with intra-pass probes this closes most of the schema-2 blind
    * spot (a burst confined strictly inside one pass could leave both
    * boundary probes calm; now it must also dodge every mid-pass
    * probe). Degenerates to the schema-2 endpoint rule when a pass
    * has no interior probes. */
  def quietPassesRange(calm: Set[Int], ranges: IndexedSeq[(Int, Int)]): Set[Int] =
    ranges.indices.filter { p =>
      val (s, e) = ranges(p)
      (s to e).forall(calm)
    }.toSet

  /** Per-query minima over samples whose BOTH bracketing probes are
    * calm — the `quiet_subset`: quiet evidence salvaged from a run
    * where no whole pass is quiet (the r15 driver bench shipped
    * exactly that shape: zero quiet passes after self-heal, so the
    * budget gate had NOTHING to check even though most individual
    * query timings sat between calm probes). Entries appear only for
    * queries with ≥ 1 successfully-timed quiet-bracketed sample;
    * failures (-1) never qualify. brackets(p)(q) = (probe index taken
    * just before q ran in pass p, probe index taken just after). */
  def quietSubsetMins(passTimes: IndexedSeq[Map[String, Double]],
      brackets: IndexedSeq[Map[String, (Int, Int)]],
      calm: Set[Int]): Map[String, (Double, Int)] = {
    // (min, n): the per-query QUIET SAMPLE COUNT rides along so the
    // gate can demand corroboration — headline mode requires two whole
    // quiet passes, so a subset-mode value derived from ONE
    // calm-bracketed sample must not silently carry the same weight
    // (one noisy-but-unbracketed sample could record a false budget
    // violation on a contaminated run)
    val acc = scala.collection.mutable.Map.empty[String, (Double, Int)]
    passTimes.indices.foreach { p =>
      passTimes(p).foreach { case (q, sec) =>
        if (sec >= 0) brackets.lift(p).flatMap(_.get(q)).foreach {
          case (before, after) =>
            if (calm(before) && calm(after)) {
              val (m, n) = acc.getOrElse(q, (Double.MaxValue, 0))
              acc(q) = (math.min(m, sec), n + 1)
            }
        }
      }
    }
    acc.toMap
  }

  /** Self-healing decision: run another interleaved catalog pass when
    * fewer than `minQuiet` passes so far are quiet and the extra-pass
    * budget isn't spent. minQuiet = 2 is the shipped default: a
    * single quiet pass makes the headline depend on that one pass's
    * numbers — exactly the ambiguity the sentinel machinery exists to
    * remove (the r14 driver bench shipped on `quiet_passes: [0]` with
    * 63% spread and cost a judge cycle to adjudicate). Bounded: a
    * persistently loaded host costs at most `maxExtra` extra passes,
    * then the run reports itself with however much quiet evidence it
    * gathered. */
  def needsExtraPass(quiet: Set[Int], extrasUsed: Int, maxExtra: Int,
      minQuiet: Int = 2): Boolean =
    quiet.size < minQuiet && extrasUsed < maxExtra

  /** Per-query min over the passes in `restrictTo`; a query with no
    * positive sample inside `restrictTo` (e.g. it failed in every
    * quiet pass) falls back to its min over all passes, and a query
    * that never succeeded reports -1 (the failure sentinel — a broken
    * query must not read as a 0-second win). `passTimes(p)` holds pass
    * p's per-query seconds with failures recorded as -1. */
  def minTimes(passTimes: IndexedSeq[Map[String, Double]], queryNames: Iterable[String],
      restrictTo: Set[Int]): Map[String, Double] = {
    def minOver(name: String, passes: Iterable[Int]): Option[Double] = {
      val ts = passes.flatMap(p => passTimes(p).get(name)).filter(_ >= 0)
      if (ts.isEmpty) None else Some(ts.min)
    }
    queryNames.map { n =>
      n -> minOver(n, restrictTo).orElse(minOver(n, passTimes.indices)).getOrElse(-1.0)
    }.toMap
  }
}
