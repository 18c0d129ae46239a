package graft

import org.json4s.{DefaultFormats, JDouble, JInt, JObject, JValue}
import org.json4s.jackson.JsonMethods

/** Per-query regression budgets for the bench artifact.
  *
  * Cross-round comparison used to need prose attribution every round
  * ("untouched-median 1.06×, the r13c host pairing ran ~18% fast…").
  * This pins the comparison machine-readable instead: a committed
  * `bench_budgets.json` carries, per SF tier, the quiet-epoch headline
  * seconds of every query plus the same epoch's sentinel floors, and
  * each bench run emits a `budget` block — the ceiling factor it
  * applied and the (ideally empty) `violations` list — into its
  * artifact.
  *
  * Ceiling construction, per query:
  *
  *   budget(q) = epoch(q) × tolerance × ambientFactor + absSlackS
  *
  *  - `tolerance` absorbs plan-level run-to-run jitter (GC phase, page
  *    cache, codegen luck) that the sentinels cannot see;
  *  - `ambientFactor` is the SENTINEL-NORMALIZED part: the geometric
  *    mean of (this run's sentinel floor / the epoch's sentinel
  *    floor), clamped to ≥ 1 — a uniformly slow host epoch raises
  *    every ceiling by the factor the sentinels actually measured,
  *    instead of flagging the whole catalog (the r13c/r14 "ambient
  *    epoch" adjudication, automated). Clamping at 1 means a FASTER
  *    host never tightens ceilings below the committed epoch's.
  *  - `absSlackS` keeps sub-second queries from tripping on absolute
  *    noise a relative tolerance can't cover.
  *
  * A query with no committed epoch value (new this round) has no
  * ceiling; it is listed under `unbudgeted` so silence is visible, and
  * gets a budget when the epoch file is next regenerated
  * (`tools/gen_budgets.py`).
  */
object BenchBudgets {

  final case class Violation(query: String, sec: Double, budgetS: Double)

  /** `cpus` pins the epoch's harness config: a run at a different
    * local[N] is structurally incomparable (shuffle-heavy queries
    * scale with cores while sub-second scans barely move, so neither
    * the tolerance nor the sentinel factor can normalize it — the very
    * first gated run demonstrated this, reading 1.5–2.4× on the heavy
    * tier at cpus=8 against a cpus=32 epoch with CALM sentinels). */
  final case class Epoch(sentinels: Map[String, Double],
      queries: Map[String, Double], cpus: Option[String])

  final case class Budgets(toleranceX: Double, absSlackS: Double,
      epochs: Map[String, Epoch])

  private implicit val formats: DefaultFormats.type = DefaultFormats

  private def numMap(v: JValue): Map[String, Double] = v match {
    case JObject(fields) => fields.collect {
      case (k, JDouble(d)) => k -> d
      case (k, JInt(i))    => k -> i.toDouble
    }.toMap
    case _ => Map.empty
  }

  /** Parse `bench_budgets.json`. Throws on malformed JSON; the bench
    * catches at the gate boundary and records the error as the skip
    * `reason` — loud in the artifact, but never sinking a completed
    * run's timing work over a config-file typo. */
  def parse(json: String): Budgets = {
    val root = JsonMethods.parse(json)
    val epochs = (root \ "epochs") match {
      case JObject(fields) => fields.map { case (sfKey, e) =>
        sfKey -> Epoch(numMap(e \ "sentinels"), numMap(e \ "queries"),
          (e \ "cpus").extractOpt[String])
      }.toMap
      case _ => Map.empty[String, Epoch]
    }
    Budgets((root \ "tolerance_x").extract[Double],
      (root \ "abs_slack_s").extract[Double], epochs)
  }

  /** The default `bench_budgets.json` location, independent of the
    * process CWD: a bench launched from outside the repo (the driver
    * invokes `java -cp …/target/scala-2.13/classes graft.Bench` from
    * its own directory) must still find the committed file, not
    * silently downgrade the gate to `checked: false` naming a
    * nonexistent CWD-relative path. Resolution: the CWD file when it
    * exists, else walk UP from this class's code-source location (the
    * classes dir lives at `<repo>/target/scala-2.13/classes`) to the
    * first ancestor holding a `bench_budgets.json`. Falls back to the
    * CWD path so the skip reason at least names a concrete location. */
  def defaultBudgetsPath(): java.nio.file.Path = {
    val cwd = java.nio.file.Paths.get("bench_budgets.json").toAbsolutePath
    if (java.nio.file.Files.exists(cwd)) cwd
    else {
      val fromCode = for {
        src <- Option(getClass.getProtectionDomain.getCodeSource)
        loc <- Option(src.getLocation)
        start = java.nio.file.Paths.get(loc.toURI)
        hit <- Iterator.iterate(start)(_.getParent).takeWhile(_ != null)
          .take(8).map(_.resolve("bench_budgets.json"))
          .find(java.nio.file.Files.exists(_))
      } yield hit
      fromCode.getOrElse(cwd)
    }
  }

  /** The SF key a bench run files its budgets under: the basename of
    * the data dir ("/root/testdata/sf0.1" and "target/benchdata/sf1"
    * → "sf0.1" / "sf1"), so driver and local runs over the same tier
    * share one epoch. */
  def sfKey(sfDir: String): String =
    java.nio.file.Paths.get(sfDir).getFileName.toString

  /** Sentinel-normalized ambient factor: geometric mean over sentinels
    * of (current quiet floor / epoch floor), clamped to ≥ 1. Sentinels
    * missing from either side contribute nothing; no usable sentinel
    * → factor 1 (the conservative ceiling). */
  def ambientFactor(epochSentinels: Map[String, Double],
      currentSentinelMins: Map[String, Double]): Double = {
    val ratios = epochSentinels.toSeq.flatMap { case (name, epochMin) =>
      currentSentinelMins.get(name).filter(_ > 0).filter(_ => epochMin > 0)
        .map(cur => math.log(cur / epochMin))
    }
    if (ratios.isEmpty) 1.0
    else math.max(1.0, math.exp(ratios.sum / ratios.size))
  }

  /** Evaluate one run against its epoch: (ambient factor, violations,
    * unbudgeted query names). Failed queries (headline < 0) are never
    * violations — the -1 failure sentinel is its own, louder, signal. */
  def evaluate(epoch: Epoch, toleranceX: Double, absSlackS: Double,
      headline: Map[String, Double], currentSentinelMins: Map[String, Double])
      : (Double, Seq[Violation], Seq[String]) = {
    val factor = ambientFactor(epoch.sentinels, currentSentinelMins)
    val violations = headline.toSeq.sortBy(_._1).flatMap { case (q, sec) =>
      epoch.queries.get(q).flatMap { e =>
        val budget = e * toleranceX * factor + absSlackS
        if (sec >= 0 && sec > budget) Some(Violation(q, sec, budget)) else None
      }
    }
    val unbudgeted = headline.keys.filterNot(epoch.queries.contains).toSeq.sorted
    (factor, violations, unbudgeted)
  }

  private def num(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  /** One checked gate outcome. `mode` records WHICH evidence was
    * gated: `"quiet_passes"` (the normal headline — mins over whole
    * sentinel-quiet passes) or `"quiet_subset"` (a contaminated run's
    * salvage: per-query minima over quiet-bracketed samples only —
    * see BenchNoise.quietSubsetMins; the caller passes only
    * CORROBORATED entries, ≥ 2 quiet samples, mirroring headline
    * mode's two-quiet-pass requirement). `uncovered` lists queries
    * the subset had no — or only a single, ungateable — quiet sample
    * for: visible silence, only ever non-empty in subset mode. */
  final case class GateResult(sfKey: String, mode: String, factor: Double,
      violations: Seq[Violation], unbudgeted: Seq[String],
      uncovered: Seq[String] = Seq.empty)

  /** The full gate decision, pure — spec-pinned so every skip/check
    * path (including the cpus-mismatch refusal the r15 demo artifacts
    * motivated) renders identically forever. Returns Left(skipReason)
    * or Right(result).
    *
    * Evidence precedence: whole quiet passes gate the headline; with
    * NONE (the contaminated-run case), the quiet subset gates
    * whatever queries have quiet-bracketed samples; with neither, the
    * gate skips loudly. */
  def gate(budgets: Budgets, sfKey: String, cpus: String,
      headline: Map[String, Double], quietPassesExist: Boolean,
      quietSubset: Map[String, Double], sentinelMins: Map[String, Double])
      : Either[String, GateResult] =
    budgets.epochs.get(sfKey) match {
      case None => Left(s"no pinned epoch for sf key '$sfKey'")
      case Some(epoch) if epoch.cpus.exists(_ != cpus) =>
        // a different local[N] shifts the heavy tier by the core
        // ratio while the sub-second sentinels barely move — neither
        // knob can normalize it, so refuse loudly instead of
        // reporting structurally-false violations
        Left(s"epoch pinned at cpus=${epoch.cpus.get}, this run used " +
          s"cpus=$cpus — incomparable harness config")
      case Some(epoch) if quietPassesExist =>
        val (factor, violations, unbudgeted) = evaluate(
          epoch, budgets.toleranceX, budgets.absSlackS, headline, sentinelMins)
        Right(GateResult(sfKey, "quiet_passes", factor, violations, unbudgeted))
      case Some(epoch) if quietSubset.nonEmpty =>
        val (factor, violations, unbudgeted) = evaluate(
          epoch, budgets.toleranceX, budgets.absSlackS, quietSubset, sentinelMins)
        val uncovered = headline.keys.filterNot(quietSubset.contains).toSeq.sorted
        Right(GateResult(sfKey, "quiet_subset", factor, violations, unbudgeted,
          uncovered))
      case Some(_) =>
        Left("headline contaminated (no sentinel-quiet pass) and no " +
          "quiet-bracketed samples — nothing gateable")
    }

  /** The `budget` block for the bench artifact — pure, spec-pinned.
    * `None` (no budget file / unknown SF tier / incomparable harness
    * config) renders as an explicit skip marker WITH its reason, so
    * "no gate ran" is distinguishable from "gate ran clean" — and
    * attributable — in the JSON alone. */
  def blockJson(result: Option[GateResult],
      skipReason: Option[String] = None): String = result match {
    case None =>
      // reasons can carry arbitrary error text — keep the JSON valid.
      // Full control range, not just \n\r\t: an exception message on
      // the gate's error path can carry \b, \f, or raw U+0000-U+001F
      val r = skipReason.map(s =>
        s""", "reason": "${s.replaceAll("[\\p{Cntrl}\"\\\\]", " ")}"""")
        .getOrElse("")
      s"""{"checked": false$r}"""
    case Some(GateResult(sfKey, mode, factor, violations, unbudgeted, uncovered)) =>
      val vs = violations.map(v =>
        s"""{"query":"${v.query}","sec":${num(v.sec)},""" +
          s""""budget_s":${num(v.budgetS)}}""").mkString("[", ",", "]")
      val un = unbudgeted.map("\"" + _ + "\"").mkString("[", ",", "]")
      val uc =
        if (uncovered.isEmpty) ""
        else uncovered.map("\"" + _ + "\"").mkString(""", "uncovered": [""", ",", "]")
      s"""{"checked": true, "sf_key": "$sfKey", "mode": "$mode", """ +
        s""""ambient_factor": ${num(factor)}, """ +
        s""""violations": $vs, "unbudgeted": $un$uc}"""
  }
}
