package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Multimodal, Relational, Similarity}

/** Quantitative gates for the catalog entries that are approximate BY
  * CONSTRUCTION and therefore carry no SQL oracle (the driver records
  * a rows-only check for them). Each entry here pairs the approximate
  * query with its exact twin and a floor/bound; `graft.Quality` (a
  * main) evaluates all of them and writes the per-round
  * `QUALITY_r{N}.json` artifact, so the no-oracle rows are gated by a
  * recorded number, not just a local ScalaTest run.
  *
  * The ANN recall gates run on the planted-cluster fixture rather than
  * the table embeddings: the synthetic table vectors are near-uniform,
  * so corpus recall there is data-limited (≈ fraction scanned) and
  * cannot discriminate a working index from a random scan. The fixture
  * plants 10 tight clusters (member-member cosine ≈ 0.985) in a
  * 1500-vector uniform background; each cluster's id-multiple-of-50
  * member is a query whose TRUE top-10 is its 10 fellow members.
  * SimilaritySpec asserts the same floors on the same fixture. */
object QualityHarness {

  /** The catalog entries gated HERE instead of by a SQL oracle —
    * approximate or stubbed by construction, so the driver records
    * `err: "no_oracle"` for them and this harness's recorded number is
    * their correctness gate. CatalogSpec asserts that this set plus
    * `SparkEntry.oracleSql.keySet` exactly covers
    * `SparkEntry.queries.keySet`, and [[writeArtifact]] asserts the
    * evaluated gates match this declaration — so a new catalog entry
    * cannot ship ungated, and a gate cannot silently drop out. */
  val gatedEntries: Set[String] = Set(
    "sim_ann_lsh", "sim_ann_ivf", "sim_ann_ivfpq", "sim_ann_ivfpq_served",
    "events_hll_distinct", "q25_approx_quantiles", "q26_column_stats_approx",
    "mm_decode_stub")

  /** One evaluated gate: `value` compared against `floor` (higher is
    * better — error metrics are recorded as their complement's bound
    * via `direction`). */
  final case class Gate(
      entry: String, metric: String, value: Double,
      floor: Double, higherIsBetter: Boolean) {
    def pass: Boolean = if (higherIsBetter) value >= floor else value <= floor
  }

  /** Deterministic planted-cluster corpus — shared by SimilaritySpec
    * and the Quality artifact so the recorded floor and the spec floor
    * gate the identical computation. */
  def plantedCorpus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    def gauss(dim: Int): Array[Float] =
      Array.fill(dim)(rnd.nextGaussian().toFloat)
    val clustered = (0 until 10).flatMap { k =>
      val center = gauss(64)
      (0 until 11).map { m =>
        val v = center.zip(gauss(64)).map { case (c, n) => c + 0.12f * n }
        (50L * k + m, v)
      }
    }
    // odd ids are never % 50 == 0, so the background contributes no queries
    val background = (0 until 1500).map(i => (1001L + 2 * i, gauss(64)))
    (clustered ++ background).toDF("vec_id", "embedding")
  }

  /** Mean per-query recall of `ann` against each planted query's true
    * cluster (its 10 fellow members). */
  def recallOnPlanted(ann: Array[org.apache.spark.sql.Row]): Double = {
    val truth = (0 until 10).map { k =>
      val q = 50L * k
      q -> ((q + 1) to (q + 10)).toSet
    }.toMap
    val found = ann.filter(_.getLong(0) < 1000)
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val hit = truth.map { case (q, ns) =>
      ns.count(found.getOrElse(q, Set.empty).contains).toDouble / ns.size
    }
    hit.sum / hit.size
  }

  /** Evaluate every no-oracle gate. `sfDir` feeds the sketch-vs-exact
    * pairs; the ANN recalls use the planted fixture (see scaladoc). */
  def gates(spark: SparkSession, sfDir: String): Seq[Gate] = {
    val planted = plantedCorpus(spark)
    def recall(rows: Array[org.apache.spark.sql.Row]): Double =
      recallOnPlanted(rows)

    // Floors at measured-minus-margin (r15 ask #5), not discriminate-
    // from-random: planted lsh measures 0.92, ivf/ivfpq 1.0 — a 0.85/
    // 0.90 floor detects DRIFT (a banding or probe-count regression),
    // where the old 0.6 floor only caught catastrophe.
    val lsh = Gate("sim_ann_lsh", "planted_recall_at_10",
      recall(Similarity.annLshOver(planted).collect()), 0.85, higherIsBetter = true)
    val ivf = Gate("sim_ann_ivf", "planted_recall_at_10",
      recall(Similarity.ivfTopKOver(planted).collect()), 0.9, higherIsBetter = true)
    // floor raised 0.5 → 0.8 once the exact-refine stage landed: ADC
    // quantization now costs shortlist membership only, so planted
    // recall matches plain IVF's (measured 1.0 on the fixture)
    val ivfpq = Gate("sim_ann_ivfpq", "planted_recall_at_10",
      recall(Similarity.ivfPqTopKOver(planted).collect()), 0.9, higherIsBetter = true)
    spark.catalog.clearCache()

    // served == inline is an EXACT property (same algebra over at-rest
    // artifacts): gate the row-identity fraction at 1.0, which carries
    // the inline recall floor over to the served path by construction.
    // The inline side MUST be the corpus-parameterized ivfPqTopKOver
    // (train-per-call, never consults the served-index marker) — the
    // catalog entry ivfPqTopK serves from the at-rest index when one
    // exists, which would turn this gate into served-vs-served: a
    // tautology that passes straight through a serving-path regression.
    // The stride (and the emitted query_mod column) must match the
    // served side BY CONSTRUCTION — ivfPqServed derives its stride from
    // the corpus size, so a stride-1 inline call would fail the gate at
    // any gate corpus past ~316k rows for query-set reasons, not a
    // serving regression. Metadata-only count, same derivation.
    val gateStride = Similarity.annQueryStrideFor(
      Tables.load(spark, sfDir, "embeddings").count())
    val inline = Similarity.ivfPqTopKOver(
      Tables.loadBalanced(spark, sfDir, "embeddings"),
      queryStride = gateStride, emitMod = true).collect().toSeq
    spark.catalog.clearCache()
    val served = Similarity.ivfPqServed(spark, sfDir).collect().toSeq
    spark.catalog.clearCache()
    val servedGate = Gate("sim_ann_ivfpq_served", "served_equals_inline",
      if (served == inline && served.nonEmpty) 1.0 else 0.0, 1.0,
      higherIsBetter = true)

    val sketch = sketchGates(spark, sfDir, suffix = "")

    // the video-decode stub has no quality axis (documented no-JDK-codec
    // seam); its gate is determinism of the stubbed features across runs
    def stubSig(): Seq[Seq[Any]] =
      Multimodal.decodeStub(spark, sfDir).collect().toSeq.map(_.toSeq)
    val stub = Gate("mm_decode_stub", "deterministic_across_runs",
      if (stubSig() == stubSig()) 1.0 else 0.0, 1.0, higherIsBetter = true)

    spark.catalog.clearCache()
    Seq(lsh, ivf, ivfpq, servedGate) ++ sketch :+ stub
  }

  /** The three sketch-vs-exact error gates (HLL distinct, approx
    * quantiles, approx NDV), parameterized over the data directory so
    * they run both at the driver's gate SF (bare entry names) and at
    * sf1 via [[writeArtifact]]'s corpus dir (suffixed `@sf1` rows) —
    * sketch error only materializes at scale, so the small-SF rows
    * alone can't catch an error-bound regression. */
  def sketchGates(spark: SparkSession, sfDir: String, suffix: String): Seq[Gate] = {
    // HLL distinct: worst-group relative error vs the exact twin
    val hllExact = graft.operators.Events.exactDistinct(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val hllErr = graft.operators.Events.hllDistinct(spark, sfDir).collect()
      .map { r =>
        val ex = hllExact((r.getLong(0), r.getString(1)))
        math.abs(r.getLong(2).toDouble - ex) / math.max(1.0, ex.toDouble)
      }.max
    // bounds are PER SCALE: sketch error only materializes with
    // cardinality, so at the small gate SFs the sketches run exact (or
    // near-exact) and the sf1 allowance would let a small-scale
    // regression hide under it — e.g. a 0.02 HLL error at sf0.1
    // (measured: 0.000) passing under the 0.03 sf1 bound would mean
    // the sparse/exact low-cardinality path broke while the gate
    // stayed green. Small-scale bounds sit near measured-zero plus
    // working margin; @sf1 bounds keep ~2x over the sf1 readings.
    // Keyed on the exact "@sf1" suffix, not suffix.nonEmpty: a future
    // suffixed tier (e.g. "@sf10") must fail loudly here and get its
    // own measured bounds rather than silently inheriting the sf1
    // allowances (0.03 HLL / 1.5 quantile drift).
    val atSf1 = suffix == "@sf1"
    require(suffix.isEmpty || atSf1,
      s"sketchGates has no calibrated bounds for tier suffix '$suffix' — " +
        "measure the tier and add explicit bounds before gating it")
    // measured 0.000 at sf0.1 / 0.013 at sf1
    val hll = Gate(s"events_hll_distinct$suffix", "max_group_rel_error",
      hllErr, if (atSf1) 0.03 else 0.005, higherIsBetter = false)

    // approx quantiles: worst absolute value drift vs exact q12
    val qExact = Relational.q12(spark, sfDir).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val qErr = Relational.q25(spark, sfDir).collect().map { r =>
      qExact(r.getString(0)).zip(Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .map { case (e, a) => math.abs(e - a) }.max
    }.max
    // measured 0.0 at sf0.01/sf0.1 (groups fit the sketch's exact
    // regime) / 1.0 at sf1 (value-domain units)
    val q25 = Gate(s"q25_approx_quantiles$suffix", "max_abs_value_drift", qErr,
      if (atSf1) 1.5 else 0.05, higherIsBetter = false)

    // approx NDV: worst relative error vs exact q23 (5x the configured rsd)
    val ndvExact = Relational.q23(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val ndvErr = Relational.q26(spark, sfDir).collect().map { r =>
      math.abs(r.getLong(2).toDouble / ndvExact(r.getString(0)) - 1.0)
    }.max
    // measured 0.02 at both tiers = 1x the configured rsd; 3x rsd
    // (0.06) keeps the HLL++ tail-probability margin without
    // admitting the 5x drift the old bound allowed
    val q26 = Gate(s"q26_column_stats_approx$suffix", "max_rel_ndv_error", ndvErr,
      3 * Relational.ndvRsd, higherIsBetter = false)

    spark.catalog.clearCache()
    Seq(hll, q25, q26)
  }

  /** ANN recall against the exact brute-force top-10 over a REAL
    * corpus (`corpusDir/embeddings.parquet`) — the planted fixture
    * proves the index machinery discriminates; these rows prove it on
    * the sf-scaled corpus shape (at sf1: clone-rich, 10 near-identical
    * members per base vector — the neighbor structure a web-scale
    * near-dup corpus actually has). Gate entries are suffixed with
    * `@tag` so they coexist with the planted rows in one artifact. */
  def corpusGates(spark: SparkSession, corpusDir: String, tag: String): Seq[Gate] = {
    val corpus = Tables.loadBalanced(spark, corpusDir, "embeddings")
    def topSets(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
      rows.groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    // ONE stride for every side of every recall comparison below —
    // exact yardstick, lsh/ivf gates, and the inline ivfpq — derived
    // once from the corpus size. Past ~316k embeddings the stride
    // widens (queryMod 50·s+1, coprime to 50), so an exact side left
    // at its stride-1 default would share almost no queries with the
    // widened approximate sides and recall would collapse to ~0 for
    // query-set reasons, not index reasons (r20 ADVICE). At sf1 the
    // stride is 1 and every reading is bit-identical to the historic
    // gates.
    val corpusStride = Similarity.annQueryStrideFor(
      Tables.load(spark, corpusDir, "embeddings").count())
    val exact = topSets(
      Similarity.cosineTopKOver(corpus, queryStride = corpusStride).collect())
    spark.catalog.clearCache()
    def recallVsExact(rows: Array[org.apache.spark.sql.Row]): Double = {
      val found = topSets(rows)
      val per = exact.map { case (q, ns) =>
        ns.count(found.getOrElse(q, Set.empty).contains).toDouble / ns.size
      }
      per.sum / per.size
    }
    def gate(name: String, df: DataFrame, floor: Double): Gate = {
      val g = Gate(s"$name@$tag", s"corpus_recall_vs_exact_at_10",
        recallVsExact(df.collect()), floor, higherIsBetter = true)
      spark.catalog.clearCache()
      g
    }
    // inline ivfpq collected ONCE: feeds its recall row AND the
    // served-identity row below (same de-tautologized inline side as
    // the driver-SF gate — train-per-call, never the served marker).
    // Stride + query_mod column matched to the served side by the same
    // metadata-derived arithmetic (see the driver-SF gate's note).
    val inline = Similarity.ivfPqTopKOver(corpus,
      queryStride = corpusStride, emitMod = true).collect()
    spark.catalog.clearCache()
    val ivfpqGate = Gate(s"sim_ann_ivfpq@$tag", "corpus_recall_vs_exact_at_10",
      // measured 0.95 at sf1 vs plain IVF's 0.97 coarse ceiling;
      // 0.85 keeps margin for corpora with different clone structure
      // while catching a refine-stage regression (r15 ask #5)
      recallVsExact(inline), 0.85, higherIsBetter = true)
    // served == inline at the SF-SCALED corpus too (r13 gated the
    // serving path at the driver SF only): exact row identity carries
    // the inline recall floor over to the at-rest index path
    val served = Similarity.ivfPqServed(spark, corpusDir).collect().toSeq
    spark.catalog.clearCache()
    val servedGate = Gate(s"sim_ann_ivfpq_served@$tag", "served_equals_inline",
      if (served == inline.toSeq && served.nonEmpty) 1.0 else 0.0, 1.0,
      higherIsBetter = true)
    Seq(
      // corpus floors from the r15 sf1 readings (0.915 / 0.97) minus
      // margin for clone-structure variation across corpora
      gate("sim_ann_lsh",
        Similarity.annLshOver(corpus, queryStride = corpusStride), 0.85),
      gate("sim_ann_ivf",
        Similarity.ivfTopKOver(corpus, queryStride = corpusStride), 0.9),
      ivfpqGate, servedGate)
  }

  /** Evaluate all gates and write the JSON artifact; returns the
    * failed entries. Shared by `graft.Quality` (explicit run) and
    * `graft.Verify` (per-round regeneration beside the correctness
    * dump, so the no-oracle entries never ship on a stale gate). When
    * `annCorpusDir` is set, the sf-scaled corpus recall rows are
    * appended. */
  def writeArtifact(spark: SparkSession, sfDir: String, outFile: String,
      annCorpusDir: Option[String]): Seq[String] = {
    val gs = gates(spark, sfDir) ++
      annCorpusDir.toSeq.flatMap { d =>
        val tag = new java.io.File(d).getName
        corpusGates(spark, d, tag) ++ sketchGates(spark, d, s"@$tag")
      }
    // the declaration and the evaluation can't drift: every no-oracle
    // entry declared gated must actually have been evaluated, and no
    // undeclared bare gate may appear
    val bare = gs.map(_.entry).filterNot(_.contains("@")).toSet
    require(bare == gatedEntries,
      s"gate drift: evaluated $bare vs declared $gatedEntries")
    // JSON demands '.' decimal separators; the f-interpolator follows
    // the JVM default locale, so format explicitly under Locale.ROOT
    def num(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))
    val json = gs.map { g =>
      s""""${g.entry}": {"metric": "${g.metric}", "value": ${num(g.value)}, """ +
        s""""${if (g.higherIsBetter) "floor" else "bound"}": ${num(g.floor)}, """ +
        s""""pass": ${g.pass}}"""
    }.mkString("{\n  ", ",\n  ", "\n}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), json + "\n"): Unit
    println(json)
    gs.filterNot(_.pass).map(_.entry)
  }
}

/** Emit the no-oracle quality artifact: `Quality <sfDir> <outFile>`. */
object Quality {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failed = QualityHarness.writeArtifact(spark, sfDir, outFile,
      sys.env.get("SPARK_GRAFT_QUALITY_ANN_DIR"))
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[quality] FAILED gates: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}
