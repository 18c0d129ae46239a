package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Sampling}

class CurationSpec extends AnyFunSuite with SparkSuite {

  test("decontaminate excludes eval docs and bounds hits by shingle count") {
    // decontaminate persists its shingle projection; specs are callers
    // too under the SparkEntry cache convention (shared session), and
    // the cleanup must survive assert failures or one failure cascades
    // into later suites' plan/memory assumptions
    try {
      val rows = Curation.decontaminate(spark, SF).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (docId, nNgrams, nHit, ratio, contaminated) =
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
        assert(docId % Curation.evalStride != 0, s"eval doc $docId leaked into output")
        assert(nHit >= 0 && nHit <= nNgrams, s"doc $docId: $nHit hits of $nNgrams shingles")
        assert(math.abs(ratio - nHit.toDouble / nNgrams) < 1e-12)
        assert(contaminated === (ratio >= Curation.contamThreshold))
      }
      // the synthetic corpus is drawn from a shared phrase pool, so SOME
      // overlap with the eval subset must exist — an all-zero hit column
      // would mean the join silently matched nothing
      assert(rows.exists(_.getLong(2) > 0), "no doc overlaps the eval set at all")
    } finally spark.catalog.clearCache()
  }

  test("quota sample keeps at most Q per group, by smallest rank hash") {
    val df = Curation.quotaSample(spark, SF)
    val rows = df.collect()
    val perGroup = rows.groupBy(_.getString(1))
    perGroup.foreach { case (lang, rs) =>
      assert(rs.length <= Curation.quotaPerGroup, s"$lang over quota: ${rs.length}")
      assert(rs.map(_.getInt(3)).sorted.toSeq === (1 to rs.length), s"$lang ranks not 1..n")
    }
    // kept docs per group are exactly the Q smallest hashes of that group
    val all = Tables.load(spark, SF, "documents")
      .select(col("doc_id"), col("lang"), expr(Curation.rankHashSpark).as("h"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(0)))
    perGroup.foreach { case (lang, rs) =>
      val expected = all.filter(_._1 == lang).map(t => (t._2, t._3)).sorted
        .take(Curation.quotaPerGroup).map(_._2).toSet
      assert(rs.map(_.getLong(0)).toSet === expected, s"$lang sample is not the hash-min set")
    }
  }

  test("kmeans assignment covers every vector and broadcasts the centroids") {
    val df = Curation.kmeansAssign(spark, SF)
    val rows = df.collect()
    val nVec = Tables.load(spark, SF, "embeddings").count()
    assert(rows.length.toLong === nVec, "every vector must receive an assignment")
    // recompute the seed set from its DEFINITION (not from the output's
    // centroid column — a seed that never wins any vector would silently
    // escape a definition-free check): smallest K ids on the modular comb
    val expectedSeeds = Tables.load(spark, SF, "embeddings")
      .filter(col("vec_id") % Curation.kmeansSeedComb === 3)
      .orderBy("vec_id").limit(Curation.kmeansK)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(expectedSeeds.nonEmpty)
    // every seed must assign to itself at cosine 1, and no non-seed id
    // may appear as a centroid
    expectedSeeds.foreach { s =>
      val self = rows.find(_.getLong(0) == s).get
      assert(self.getLong(1) === s, s"seed $s not assigned to itself")
      assert(math.abs(self.getDouble(2) - 1.0) < 1e-6)
    }
    assert(rows.map(_.getLong(1)).toSet.subsetOf(expectedSeeds),
      "output assigns to a centroid outside the seed set")
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    // the K-row centroid side must broadcast, and the argmax must be
    // the partial-aggregated max_by (one post-agg row per vector enters
    // the shuffle) — never a window over the N×K cross-join output,
    // which would shuffle K× the corpus
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"centroids must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"assignment must not sort-merge join:\n$plan")
    assert(!plan.contains("Window"), s"argmax must be aggregated, not windowed:\n$plan")
    assert(plan.contains("partial_max_by") || plan.contains("partial_maxby")
        || plan.toLowerCase.contains("max_by"),
      s"argmax must be a max_by aggregate:\n$plan")
  }

  test("scrub counts planted PII exactly and redacts it from the text") {
    val docs = Tables.load(spark, SF, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("orig_md5"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Curation.scrub(spark, SF).collect()
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val (docId, nEmails, nPhones, scrubMd5) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))
      // the corpus itself holds no PII (zero digits, verified), so the
      // counts are exactly the plants
      assert(nEmails === (if (docId % 7 == 0) 1 else 0), s"doc $docId emails")
      assert(nPhones === (if (docId % 11 == 0) 1 else 0), s"doc $docId phones")
      val planted = docId % 7 == 0 || docId % 11 == 0
      assert((scrubMd5 != docs(docId)) === planted,
        s"doc $docId: scrubbed text must differ from original iff PII was planted")
    }
  }

  test("repetition stats are internally consistent and hand-checkable") {
    val rows = Curation.repetition(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nBi, nDist) = (r.getInt(1), r.getInt(2), r.getInt(3))
      val (dupFrac, topCount, topFrac, rep) =
        (r.getDouble(4), r.getLong(5), r.getDouble(6), r.getBoolean(7))
      assert(nBi === nTok - 1)
      assert(nDist >= 1 && nDist <= nBi)
      assert(dupFrac >= 0.0 && dupFrac <= 1.0)
      assert(topCount >= 1 && topCount <= nTok)
      assert(math.abs(dupFrac - (1.0 - nDist.toDouble / nBi)) < 1e-12)
      assert(math.abs(topFrac - topCount.toDouble / nTok) < 1e-12)
      assert(rep === (dupFrac >= Curation.dupBigramThreshold
        || topFrac >= Curation.topTokThreshold))
    }
    // hand recompute for one doc
    val doc0 = Tables.load(spark, SF, "documents")
      .filter(col("doc_id") === rows.head.getLong(0))
      .select("text").collect().head.getString(0)
    val toks = doc0.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
    assert(rows.head.getInt(1) === toks.length)
    assert(rows.head.getInt(3) === bigrams.distinct.length)
    assert(rows.head.getLong(5) === toks.groupBy(identity).values.map(_.size).max.toLong)
  }

  test("pack stream equals the scalar prefix sum and partitions its big window") {
    // packStream persists its sized projection (SparkEntry convention:
    // callers clear, unconditionally)
    try {
      val df = Curation.packStream(spark, SF)
      val rows = df.collect()
      assert(rows.nonEmpty)
      // scalar recompute of the global prefix sum in doc_id order
      var cum = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(2) === cum, s"doc ${r.getLong(0)} cum_before")
        assert(r.getLong(3) === cum / Curation.packCapacity)
        assert(r.getLong(4) === cum % Curation.packCapacity)
        cum += r.getInt(1)
      }
      // the corpus-sized window must be partitioned by the id-derived
      // bucket — a global unpartitioned window over the full corpus would
      // funnel everything through one task; only the tiny bucket-offset
      // window (corpus/B rows) may be global
      // match the PARTITION spec form "windowspecdefinition(bucket#N, doc_id#..."
      // specifically: the tiny global offsets window stringifies as
      // "windowspecdefinition(bucket#N ASC ..." (ORDER spec, no comma) and
      // must not satisfy this assert
      val plan = df.queryExecution.executedPlan.toString
      assert("""windowspecdefinition\(bucket#\d+L?, doc_id#""".r.findFirstIn(plan).isDefined,
        s"big cumsum window must partition by bucket:\n$plan")
    } finally spark.catalog.clearCache()
  }

  test("boilerplate fraction is bounded and the top list broadcasts") {
    // boilerplate persists the exploded bigram projection (SparkEntry
    // cache convention: callers clear, unconditionally)
    try {
      val df = Curation.boilerplate(spark, SF)
      val rows = df.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (nBi, nHits, frac, flag) =
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
        assert(nBi >= 1 && nHits >= 0 && nHits <= nBi)
        assert(math.abs(frac - nHits.toDouble / nBi) < 1e-12)
        assert(flag === (frac >= Curation.boilerplateThreshold))
      }
      // the phrase-pool corpus must produce SOME top-bigram hits — an
      // all-zero hit column would mean the membership join matched nothing
      assert(rows.exists(_.getLong(2) > 0), "no doc hits the top-bigram list")
      // the K-row top list must broadcast to the per-doc side
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
        s"top-K list must broadcast:\n$plan")
    } finally spark.catalog.clearCache()
  }

  test("lang histogram partitions the corpus and its buckets are consistent") {
    val rows = Curation.langHist(spark, SF).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.load(spark, SF, "documents")
      .filter(size(expr(graft.operators.Dedup.toksSpark)) > 0).count()
    assert(rows.map(_.getLong(2)).sum === nDocs, "histogram must cover every doc once")
    rows.foreach { r =>
      val (mag, n, sum, mn, mx) =
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5))
      assert(n >= 1 && mn >= 1 && mn <= mx)
      // bucket bounds: digit width of the token count
      assert(mn.toString.length === mag && mx.toString.length === mag,
        s"bucket $mag holds counts outside its digit width")
      assert(sum >= n * mn && sum <= n * mx)
    }
  }

  test("chunking tiles every document with the declared stride and overlap") {
    val rows = Curation.chunk(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getInt(2))
      val n = sorted.head.getInt(1)
      assert(sorted.map(_.getInt(2)).toSeq === sorted.indices, s"doc $doc chunk idx gap")
      sorted.foreach { r =>
        val (idx, start, end) = (r.getInt(2), r.getInt(3), r.getInt(4))
        assert(start === idx * Curation.chunkStride)
        assert(end === math.min(start + Curation.chunkSize, n))
        assert(end > start, s"doc $doc empty chunk $idx")
      }
      // coverage: the last chunk reaches the end of the doc, and every
      // token index below n is inside at least one chunk (stride <=
      // size guarantees no gap between consecutive chunks)
      assert(sorted.last.getInt(4) === n, s"doc $doc tail uncovered")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getInt(3) <= a.getInt(4), s"doc $doc gap")
        case _ =>
      }
    }
    // hand-recompute one doc's first-chunk hash from the raw text
    val doc0 = rows.head.getLong(0)
    val text = Tables.load(spark, SF, "documents")
      .filter(col("doc_id") === doc0).select("text").head().getString(0)
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val first = toks.take(Curation.chunkSize).mkString(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(first.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.head.getString(5) === md, s"doc $doc0 chunk 0 content hash")
  }

  test("train manifest gates agree with every standalone operator it composes") {
    // the manifest persists its base projection; several standalone
    // operators below persist too — clear unconditionally
    try {
      val rows = Curation.trainManifest(spark, SF).collect()
      assert(rows.length.toLong === Tables.load(spark, SF, "documents").count(),
        "one manifest row per document")
      val byId = rows.map(r => r.getLong(0) -> r).toMap
      // kept is exactly the conjunction of its reason columns
      rows.foreach { r =>
        val kept = r.getBoolean(4) && r.getBoolean(5) && !r.getBoolean(3) &&
          !r.getBoolean(6) && r.getBoolean(7)
        assert(r.getBoolean(9) === kept, s"doc ${r.getLong(0)} kept != gates")
      }
      // dup_keeper matches Dedup.exact's keeper set
      val keepers = graft.operators.Dedup.exact(spark, SF).collect()
        .map(_.getLong(0)).toSet
      rows.foreach(r => assert(r.getBoolean(5) === keepers(r.getLong(0)),
        s"doc ${r.getLong(0)} keeper mismatch vs dedup_exact"))
      // contaminated matches decontaminate (non-eval docs)
      val contam = Curation.decontaminate(spark, SF).collect()
        .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      contam.foreach { case (id, c) =>
        assert(byId(id).getBoolean(6) === c, s"doc $id contamination mismatch")
      }
      // mixture and split match the standalone assignments
      val mix = Sampling.mixture(spark, SF).collect()
        .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      val split = Sampling.splitAssign(spark, SF).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      rows.foreach { r =>
        assert(r.getBoolean(7) === mix(r.getLong(0)), s"doc ${r.getLong(0)} mix mismatch")
        assert(r.getString(8) === split(r.getLong(0)), s"doc ${r.getLong(0)} split mismatch")
      }
      // the gates must each actually fire somewhere, or the manifest is
      // vacuously composing no-ops
      assert(rows.exists(_.getBoolean(3)), "no eval docs")
      assert(rows.exists(!_.getBoolean(7)), "mixture dropped nothing")
      assert(rows.exists(_.getBoolean(9)), "manifest kept nothing")
      assert(rows.exists(!_.getBoolean(9)), "manifest dropped nothing")
    } finally spark.catalog.clearCache()
  }

  test("ngram top-k is rank-ordered with deterministic tiebreak") {
    val rows = Curation.ngramTopk(spark, SF).collect()
    assert(rows.nonEmpty && rows.length <= Curation.ngramTopK)
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    pairs.sliding(2).foreach {
      case Array((n1, g1), (n2, g2)) =>
        assert(n1 > n2 || (n1 == n2 && g1 < g2), s"order violated at ($n1,$g1) -> ($n2,$g2)")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_docs cannot exceed n_occurrences")
      assert(r.getLong(1) > 0)
    }
    // spot-check one count against a direct recompute
    val (top, topN) = (rows.head.getString(0), rows.head.getLong(1))
    val recount = Tables.load(spark, SF, "documents")
      .withColumn("toks", expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"""
          .stripMargin)).as("g"))
      .filter(col("g") === top).count()
    assert(recount === topN, s"top bigram '$top' recount $recount != $topN")
  }

  test("bigram LM: totals consistent, rarity bounded, flags follow the cut") {
    try {
      val rows = Curation.bigramLm(spark, SF).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (n, rare, pct, keep) =
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
        assert(n > 0 && rare >= 0 && rare <= n)
        assert(math.abs(pct - rare.toDouble / n) < 1e-12)
        assert(keep === (pct < Curation.lmRareCut))
      }
      // Σ n_bigrams over docs == total bigram occurrences in the corpus
      val totalBigrams = Tables.load(spark, SF, "documents")
        .withColumn("toks", expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"))
        .filter(size(col("toks")) >= 2)
        .selectExpr("size(toks) - 1 AS nb")
        .agg(sum(col("nb"))).head().getLong(0)
      assert(rows.map(_.getLong(1)).sum === totalBigrams)
    } finally spark.catalog.clearCache()
  }

  test("bigram LM: gibberish is flagged rare, phrase-pool text is kept") {
    // crafted corpus: two docs sharing a repetitive phrase (their
    // bigrams occur far more than lmRareMax times) and one gibberish
    // doc whose bigrams exist nowhere else (all corpus-rare)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bigram_lm").toString
    val common = Seq.fill(8)("the cat sat on the mat").mkString(" ")
    Seq(
      (1L, common, "en", "web", common.length.toLong),
      (2L, common, "en", "web", common.length.toLong),
      (3L, "qzv wxj plk mnb ghf dsa", "en", "web", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val out = Curation.bigramLm(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
      assert(out(1L)._2 && out(2L)._2, "repeated phrase-pool docs must be kept")
      assert(out(1L)._1 === 0.0, "no bigram of a duplicated 8x phrase is rare")
      assert(!out(3L)._2 && out(3L)._1 === 1.0,
        "gibberish doc must be 100% rare and dropped")
    } finally spark.catalog.clearCache()
  }

  test("source stats partition the corpus and agree with exact dedup's dup mass") {
    try {
      val stats = Curation.sourceStats(spark, SF).collect()
      val nDocs = Tables.load(spark, SF, "documents").count()
      assert(stats.map(_.getLong(1)).sum === nDocs,
        "per-source doc counts must partition the corpus")
      // total duplicated-doc mass must equal what exact dedup reports:
      // the sum of n_copies over groups with more than one member
      val dupMass = graft.operators.Dedup.exact(spark, SF).collect()
        .map(_.getLong(1)).filter(_ >= 2L).sum
      assert(stats.map(_.getLong(4)).sum === dupMass,
        "per-source dup counts must total exact dedup's duplicated mass")
      stats.foreach { r =>
        assert(r.getLong(1) > 0 && r.getLong(2) > 0)
        assert(r.getDouble(5) > 0.0, "avg tokens must be positive")
        assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
      }
    } finally spark.catalog.clearCache()
  }
}
