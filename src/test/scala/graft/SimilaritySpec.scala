package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkSuite {

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(): Unit
  }

  test("brute-force top-k: 10 ranked neighbors per query, scores descending") {
    val rows = Similarity.cosineTopK(spark, SF).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rs) =>
      assert(rs.length === 10, s"query $q returned ${rs.length} neighbors")
      val scores = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q scores not descending")
    }
  }

  test("query stride is pinned per shipped tier: 1 through sf1, 32 at sf10") {
    // pure-function pins at the shipped corpus sizes plus the exact
    // boundary, so the stride ladder itself is a spec'd fixture
    assert(Similarity.queryStrideFor(200L) === 1)      // sf0.001
    assert(Similarity.queryStrideFor(20000L) === 1)    // sf1
    assert(Similarity.queryStrideFor(49999L) === 1)    // last stride-1 n
    assert(Similarity.queryStrideFor(50000L) === 2)    // first stride-2 n
    assert(Similarity.queryStrideFor(200000L) === 32)  // sf10
    // and against the tiers actually on disk: a corpus regeneration
    // that lands n across a stride boundary legitimately changes the
    // catalog result SHAPE — it must fail HERE as a fixture change,
    // not surface as a silent oracle re-derivation
    val pins = Seq(
      "/root/testdata/sf0.001" -> 1, "/root/testdata/sf0.01" -> 1,
      "/root/testdata/sf0.1" -> 1, "target/benchdata/sf1" -> 1,
      "target/benchdata/sf10" -> 32)
    pins.foreach { case (dir, want) =>
      if (new java.io.File(s"$dir/embeddings.parquet").exists()) {
        val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
        assert(Similarity.queryStrideFor(n) === want,
          s"tier $dir (n=$n) stride drifted")
      }
    }
  }

  test("widened query moduli are coprime to the replica key-offsets") {
    // stride 1 = the historic modulus, bit-identical gate tiers
    assert(Similarity.queryModFor(1) === 50L)
    // widened strides: 50·s + 1, odd and ≡1 (mod 5) — gcd(qmod, 10^k)
    // = 1, so ScaleData's power-of-10 replica offsets cannot resonate
    // (the r19 sf100sub probe measured 50·s putting a query in EVERY
    // replica: 1,000 queries / 2B dots where the budget says ~12/25M)
    assert(Similarity.queryModFor(32) === 1601L)
    Seq(2, 32, 3200, 3528).foreach { s =>
      val m = Similarity.queryModFor(s)
      assert(m === 50L * s + 1, s"stride $s modulus")
      assert(m % 2 === 1 && m % 5 === 1, s"stride $s modulus $m not coprime to 10")
    }
  }

  test("ANN query stride is pinned per shipped tier: 1 through sf10") {
    // the ANN probe stages do corpus-linear work per query, so the
    // budget caps |q|·n at 1B probed pairs: stride 1 (the historic
    // vec_id % 50 set) at every shipped tier through sf10, widening
    // only beyond (sf100sub: 80 → ~500 queries × 2M = 1B)
    assert(Similarity.annQueryStrideFor(200L) === 1)
    assert(Similarity.annQueryStrideFor(20000L) === 1)    // sf1
    assert(Similarity.annQueryStrideFor(200000L) === 1)   // sf10
    assert(Similarity.annQueryStrideFor(316227L) === 1)   // last stride-1 n
    assert(Similarity.annQueryStrideFor(316228L) === 2)   // first stride-2 n
    assert(Similarity.annQueryStrideFor(2000000L) === 80) // sf100sub
  }

  test("stride budgets fail loudly past their arithmetic horizon, never wrap") {
    // n² overflows Long at n ≳ 3.04e9: a plain n*n wraps negative and
    // max(1, negative) silently resets the stride to 1 — an unbounded
    // probe budget. The guard must throw instead.
    intercept[IllegalStateException] {
      Similarity.annQueryStrideFor(4L * 1000 * 1000 * 1000)
    }
    // n² still fits Long at n = 3e9, but the exact yardstick's stride
    // (n² / 1.25e9 = 7.2e9) exceeds Int — .toInt would truncate it.
    intercept[IllegalStateException] {
      Similarity.queryStrideFor(3L * 1000 * 1000 * 1000)
    }
    // just under the Long horizon, the ANN stride still fits Int
    // (9e18 / 5e10 = 1.8e8)
    assert(Similarity.annQueryStrideFor(3L * 1000 * 1000 * 1000) === 180000000)
  }

  test("catalog ANN entries emit a self-describing query_mod column") {
    // the CATALOG surface is scale-invariant and self-describing: a
    // widened-stride artifact (sf100sub: qmod 4001) must be schema-
    // distinguishable from a historic %50 run. Spec/QUALITY fixtures
    // (the bare *Over forms) keep the 4-column shape.
    Seq(Similarity.annLsh(spark, SF), Similarity.ivfTopK(spark, SF),
        Similarity.ivfPqTopK(spark, SF)).foreach { df =>
      assert(df.columns.last === "query_mod")
      assert(df.select("query_mod").head().getLong(0) === 50L)
    }
    assert(Similarity.annLshOver(
      graft.Tables.loadBalanced(spark, SF, "embeddings")).columns
      .sameElements(Array("query_id", "neighbor_id", "rank", "score")))
    spark.catalog.clearCache()
  }

  test("ANN returns true scores and beats random-sampling recall") {
    val exact = Similarity.cosineTopK(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val ann = Similarity.annLsh(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
    // Any overlapping (query, neighbor) pair must carry the identical
    // exact cosine — the ANN is approximate in RECALL, never in score.
    ann.foreach { case (key, score) =>
      exact.get(key).foreach(es => assert(es === score, s"score mismatch for $key"))
    }
    val queries = exact.keys.map(_._1).toSet
    val hit = queries.toSeq.map { q =>
      val e = exact.keys.filter(_._1 == q).toSet
      val a = ann.map(_._1).filter(_._1 == q).toSet
      e.count(a.contains).toDouble / e.size
    }
    val recall = hit.sum / hit.size
    // 9 probed buckets of 256 ≈ 3.5% of the corpus scanned; LSH must do
    // meaningfully better than scanning a random 3.5%. (The synthetic
    // embeddings are near-uniform — real clustered data recalls higher.)
    assert(recall > 0.07, s"recall $recall not better than random scan")
  }

  /** Planted-cluster fixture + recall — shared with the QUALITY
    * artifact (QualityHarness scaladoc has the construction). */
  private def plantedCorpus: org.apache.spark.sql.DataFrame =
    QualityHarness.plantedCorpus(spark)

  private def recallOnPlanted(ann: Array[org.apache.spark.sql.Row]): Double =
    recallChecked(ann)

  /** The harness assumes each planted query's true top-10 is its own
    * cluster; verify that assumption against the EXACT scorer here so
    * the shared recall stays honest. */
  private def recallChecked(ann: Array[org.apache.spark.sql.Row]): Double = {
    val exact = Similarity.cosineTopKOver(plantedCorpus).collect()
      .filter(_.getLong(0) < 1000)   // planted queries only
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    assert(exact.size === 10)
    exact.foreach { case (q, ns) =>
      assert(ns === ((q until q + 11).toSet - q), s"query $q true top-10 not its cluster")
    }
    QualityHarness.recallOnPlanted(ann)
  }

  test("LSH recall on planted clusters discriminates from a random scan") {
    val corpus = plantedCorpus
    val recall = recallOnPlanted(Similarity.annLshOver(corpus).collect())
    // 9 of 256 buckets probed ≈ 3.5% scanned; planted members are
    // near-duplicates of their query, so multiprobe must catch most
    assert(recall > 0.85, s"LSH planted recall $recall (random scan ≈ 0.035)")
  }

  test("IVF recall on planted clusters discriminates from a random scan") {
    val corpus = plantedCorpus
    val recall = recallOnPlanted(Similarity.ivfTopKOver(corpus).collect())
    // nprobe=4 of K=16 lists ≈ 25% scanned; co-clustered members land
    // in the probed lists, so recall must far exceed that fraction
    assert(recall > 0.9, s"IVF planted recall $recall (random scan ≈ 0.25)")
  }

  test("IVF: exact scores, ~nprobe/K of the corpus scanned, beats random") {
    val exact = Similarity.cosineTopK(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val ivf = Similarity.ivfTopK(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
    ivf.foreach { case (key, score) =>
      exact.get(key).foreach(es => assert(es === score, s"score mismatch for $key"))
    }
    val queries = exact.keys.map(_._1).toSet
    val hit = queries.toSeq.map { q =>
      val e = exact.keys.filter(_._1 == q).toSet
      val a = ivf.map(_._1).filter(_._1 == q).toSet
      e.count(a.contains).toDouble / e.size
    }
    val recall = hit.sum / hit.size
    // nprobe=4 of K=16 lists ≈ 25% of the corpus; require clearly better
    // than a random 25% scan even on near-uniform synthetic vectors.
    assert(recall > 0.35, s"IVF recall $recall not better than random scan")
  }

  test("IVF-PQ recall on planted clusters discriminates from a random scan") {
    val corpus = plantedCorpus
    val recall = recallOnPlanted(Similarity.ivfPqTopKOver(corpus).collect())
    // same nprobe=4/16 coarse stage as plain IVF; candidates are
    // SHORTLISTED from PQ codes via the ADC table, then the shortlist
    // is re-ranked exactly — quantization costs shortlist membership
    // only, so planted recall must match plain IVF's floor (measured
    // 1.0 on the fixture).
    assert(recall > 0.9, s"IVF-PQ planted recall $recall (random scan ≈ 0.25)")
  }

  test("IVF-PQ refine emits true cosine scores, never quantized ones") {
    val exact = Similarity.cosineTopK(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val ann = Similarity.ivfPqTopK(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
    // Any (query, neighbor) pair the exact baseline also ranked must
    // carry the identical exact cosine — the refine stage's contract:
    // IVF-PQ is approximate in RECALL, never in score (the same
    // property the LSH and IVF specs assert).
    var overlap = 0
    ann.foreach { case (key, score) =>
      exact.get(key).foreach { es =>
        overlap += 1
        assert(es === score, s"score mismatch for $key")
      }
    }
    assert(overlap > 0, "no overlapping pairs — refine property untested")
    spark.catalog.clearCache()
  }

  test("IVF-PQ output is well-formed: dense ranks, descending scores, no self-match") {
    val out = Similarity.ivfPqTopK(spark, SF).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rows) =>
      assert(rows.length <= 10, s"query $q returned ${rows.length} rows")
      val ranks = rows.map(_.getInt(2)).sorted
      assert(ranks.sameElements(1 to rows.length), s"query $q ranks not dense")
      // approximate scores must descend with rank (the ranking's own order)
      val byRank = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      byRank.sliding(2).foreach(p => if (p.length == 2) assert(p(0) >= p(1)))
      rows.foreach(r => assert(r.getLong(1) !== q, s"query $q returned itself"))
    }
    spark.catalog.clearCache()
  }

  test("served IVF-PQ equals the inline query and never re-scans the corpus") {
    val indexDir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_spec").toFile
    try {
      Similarity.buildIvfPqIndex(spark, SF, indexDir.getPath)
      spark.catalog.clearCache() // index build persists are done with
      val served = Similarity.ivfPqServe(spark, SF, indexDir.getPath)
      // identical algebra from at-rest artifacts: output must match the
      // inline (train-per-call) query row for row — which also carries
      // the planted-recall guarantee over to the served path unchanged.
      // ivfPqTopKOver is used deliberately: the catalog's ivfPqTopK
      // now reuses a fresh index itself, so only the corpus-
      // parameterized form is guaranteed to train per call here.
      val inline = Similarity
        .ivfPqTopKOver(Tables.loadBalanced(spark, SF, "embeddings"))
        .collect().toSeq
      assert(served.collect().toSeq === inline,
        "served top-k must be identical to the inline query")
      // the serving property that matters at 100 TB: the corpus
      // embeddings table appears in the plan exactly once — the
      // probe-set (query) scan; candidates come from the postings
      // artifacts (2 B codes + norm), never the raw vectors
      val plan = served.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val scans = "embeddings\\.parquet".r.findAllIn(plan).length
      assert(scans === 1, s"serve plan must scan embeddings once, found $scans:\n$plan")
      assert(plan.contains("postings"), "candidates must come from the postings artifact")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(indexDir)
      spark.catalog.clearCache()
    }
  }

  /** Staleness cycle shared between the plain-path and the
    * `file:`-scheme runs: the freshness layer resolves corpora through
    * the Hadoop FileSystem API, so any scheme the job can read must
    * behave identically — build, stamp, invalidate on regeneration,
    * transparent rebuild. */
  private def stalenessCycle(scheme: String): Unit = {
    // the round-9 marker keyed freshness on (dir path, format version)
    // only — a corpus REGENERATED at the same path (the normal
    // per-round workflow) would silently serve neighbors from the
    // stale index. The stamp now carries a content fingerprint (a hash
    // over per-file name/size/mtime tuples), so regeneration invalidates.
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft_fp_corpus").toFile
    val dir = scheme + corpusDir.getPath
    try {
      val dst = new java.io.File(corpusDir, "embeddings.parquet")
      java.nio.file.Files.copy(
        new java.io.File(SF, "embeddings.parquet").toPath, dst.toPath): Unit
      val before = Similarity.ivfPqServed(spark, dir).collect().toSeq
      spark.catalog.clearCache()
      assert(before.nonEmpty)
      assert(Similarity.servedIndexIfFresh(dir).isDefined,
        "index must be at rest and fresh right after the build")
      // "regenerate" the corpus: same path, newer mtime — the cheapest
      // observable consequence of any rewrite
      assert(dst.setLastModified(dst.lastModified() + 60000))
      assert(Similarity.servedIndexIfFresh(dir).isEmpty,
        "a regenerated corpus must invalidate the at-rest index")
      // and the serving entry transparently rebuilds: output identical
      // (the bytes really are the same here), marker fresh again
      val after = Similarity.ivfPqServed(spark, dir).collect().toSeq
      spark.catalog.clearCache()
      assert(after === before, "rebuild from identical bytes must reproduce the output")
      assert(Similarity.servedIndexIfFresh(dir).isDefined)
    } finally {
      rmTree(corpusDir)
      // the index built for this throwaway corpus lives under tmpdir,
      // keyed by the random temp path — remove it too or every run leaks
      // one graft_ivfpq_index_* directory
      rmTree(new java.io.File(Similarity.servedIndexPath(dir)._1))
      spark.catalog.clearCache()
    }
  }

  test("served index goes stale when the corpus at the same path is regenerated") {
    stalenessCycle("")
  }

  test("the freshness cycle holds verbatim over a file:-scheme Hadoop path") {
    stalenessCycle("file:")
  }

  test("a URI-scheme corpus path fingerprints instead of degrading to never-fresh") {
    // the round-11 layer walked corpora with java.io.File, which cannot
    // resolve scheme-qualified paths — ANY "file:/…" (or hdfs://…)
    // corpus returned stamp None, i.e. rebuild-on-every-call. The
    // Hadoop FileSystem layer resolves every scheme the job can read,
    // and the fingerprint (relative paths are stripped against the
    // qualified root) is identical however the same bytes are addressed.
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft_uri_corpus").toFile
    try {
      java.nio.file.Files.copy(
        new java.io.File(SF, "embeddings.parquet").toPath,
        new java.io.File(corpusDir, "embeddings.parquet").toPath): Unit
      val plain = Similarity.servedIndexPath(corpusDir.getPath)._3
        .getOrElse(fail("plain local corpus must fingerprint"))
      val uri = Similarity.servedIndexPath("file:" + corpusDir.getPath)._3
        .getOrElse(fail("file:-scheme corpus must fingerprint, not degrade"))
      def fp(stamp: String): String = stamp.substring(stamp.lastIndexOf('#') + 1)
      assert(fp(plain) === fp(uri),
        "the content fingerprint must not depend on how the path is spelled")
    } finally rmTree(corpusDir)
  }

  test("a marker from an older index format forces a transparent rebuild") {
    // the upgrade path a served 100 TB index actually hits: the binary
    // is upgraded (indexFormatVersion bumped), the at-rest index was
    // written by the previous version. Simulated by rewriting the
    // marker's "#v<N>#" to "#v0#" — exactly what a stale marker looks
    // like to the new binary. Serving must notice, rebuild, and return
    // identical output (same corpus bytes, same algebra).
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft_ver_corpus").toFile
    val dir = corpusDir.getPath
    try {
      java.nio.file.Files.copy(
        new java.io.File(SF, "embeddings.parquet").toPath,
        new java.io.File(corpusDir, "embeddings.parquet").toPath): Unit
      val before = Similarity.ivfPqServed(spark, dir).collect().toSeq
      spark.catalog.clearCache()
      assert(before.nonEmpty)
      val (_, marker, stampOpt) = Similarity.servedIndexPath(dir)
      val stamp = stampOpt.getOrElse(fail("local corpus must fingerprint"))
      assert(stamp.matches(".*#v\\d+#.*"), s"stamp missing version segment: $stamp")
      java.nio.file.Files.write(java.nio.file.Paths.get(marker.toUri.getPath),
        stamp.replaceFirst("#v\\d+#", "#v0#")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      assert(Similarity.servedIndexIfFresh(dir).isEmpty,
        "an old-format marker must read as stale")
      val after = Similarity.ivfPqServed(spark, dir).collect().toSeq
      spark.catalog.clearCache()
      assert(after === before, "format-version rebuild must reproduce the output")
      assert(Similarity.servedIndexIfFresh(dir).isDefined,
        "rebuild must re-stamp at the current format version")
    } finally {
      rmTree(corpusDir)
      rmTree(new java.io.File(Similarity.servedIndexPath(dir)._1))
      spark.catalog.clearCache()
    }
  }

  test("an unfingerprintable corpus dir is never fresh, even with a colluding marker") {
    // an empty or unresolvable corpus listing (no files yet, scheme
    // with no loadable FileSystem, permission failure) yields stamp
    // None: no marker content can match, and serving never writes a
    // marker for such a dir — rebuild-always beats serve-stale.
    // Simulated with an empty local dir plus a marker hand-written
    // with the constant stamp a degenerate fingerprint would produce.
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft_nofp_corpus").toFile   // no embeddings.parquet inside
    val dir = corpusDir.getPath
    val (indexDir, marker, stampOpt) = Similarity.servedIndexPath(dir)
    val markerNio = java.nio.file.Paths.get(marker.toUri.getPath)
    try {
      assert(stampOpt.isEmpty, "empty listing must not produce a stamp")
      java.nio.file.Files.createDirectories(markerNio.getParent)
      java.nio.file.Files.write(markerNio,
        s"$dir#v4#n0b0m0".getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      assert(Similarity.servedIndexIfFresh(dir).isEmpty,
        "no marker content may ever read fresh for an unfingerprintable corpus")
    } finally {
      rmTree(corpusDir)
      rmTree(new java.io.File(indexDir))
    }
  }

  test("PQ: codes in range, seeds self-quantize at zero error") {
    import org.apache.spark.sql.functions._
    val out = Similarity.pqAssign(spark, SF).collect()
      .map(r => r.getLong(0) ->
        (Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)), r.getDouble(5))).toMap
    val corpusN = Tables.load(spark, SF, "embeddings").count()
    assert(out.size.toLong === corpusN, "every vector gets an encoding")
    out.values.foreach { case (codes, qerr) =>
      assert(codes.forall(c => c >= 0 && c < 16), s"code out of range: $codes")
      assert(qerr >= 0.0, s"negative quantization error $qerr")
    }
    // seed ids derived INDEPENDENTLY from the table (not from the
    // operator's own output): the i-th smallest qualifying vec_id is
    // centroid i, must self-assign to code i in every block with qerr 0
    val seeds = Tables.load(spark, SF, "embeddings")
      .filter(col("vec_id") % Similarity.pqSeedComb === Similarity.pqSeedRes)
      .orderBy("vec_id").limit(16).collect().map(_.getLong(0))
    assert(seeds.length === 16, "fixture must yield a full codebook")
    seeds.zipWithIndex.foreach { case (vid, i) =>
      val (codes, qerr) = out(vid)
      assert(codes === Seq(i, i, i, i), s"seed $vid not self-coded: $codes")
      assert(qerr === 0.0, s"seed $vid qerr $qerr != 0")
    }
  }

  test("PQ: encoding matches an independent Scala reference on a sample") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, SF, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val seeds = emb.keys.toSeq
      .filter(id => id % Similarity.pqSeedComb == Similarity.pqSeedRes)
      .sorted.take(16)
    def dist(x: Array[Float], c: Array[Float], b: Int): Double = {
      var dxx = 0.0; var dcc = 0.0; var dxc = 0.0
      (16 * b until 16 * b + 16).foreach { i =>
        dxx += x(i).toDouble * x(i); dcc += c(i).toDouble * c(i)
        dxc += x(i).toDouble * c(i)
      }
      dxx + dcc - 2 * dxc
    }
    val out = Similarity.pqAssign(spark, SF).collect()
      .map(r => r.getLong(0) ->
        (Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)), r.getDouble(5))).toMap
    emb.keys.toSeq.sorted.take(20).foreach { vid =>
      val x = emb(vid)
      val expected = (0 until 4).map { b =>
        seeds.indices.map(i => (dist(x, emb(seeds(i)), b), i)).min
      }
      val (codes, qerr) = out(vid)
      assert(codes === expected.map(_._2), s"vec $vid codes differ from reference")
      val refErr = BigDecimal(expected.map(_._1).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(qerr === refErr, s"vec $vid qerr $qerr != $refErr")
    }
  }
}
