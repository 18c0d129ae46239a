package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends AnyFunSuite with SparkSuite {

  test("decontaminate excludes eval docs and bounds hits by shingle count") {
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
      .select(col("doc_id"), col("lang"),
        expr("CAST(conv(substring(md5(cast(cast(doc_id AS string) AS binary)), 1, 15), 16, 10) AS bigint)").as("h"))
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
    // seed vectors must assign to themselves at cosine 1
    val seeds = rows.map(_.getLong(1)).toSet
    seeds.foreach { s =>
      val self = rows.find(_.getLong(0) == s).get
      assert(self.getLong(1) === s, s"seed $s not assigned to itself")
      assert(math.abs(self.getDouble(2) - 1.0) < 1e-6)
    }
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    // the K-row centroid side must broadcast: the corpus-side pass is
    // shuffle-free (a BroadcastNestedLoopJoin over 8 rows, never a SMJ)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"centroids must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"assignment must not sort-merge join:\n$plan")
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
}
