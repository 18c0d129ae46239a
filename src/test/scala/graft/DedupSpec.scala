package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite with SparkSuite {

  test("minhash-LSH finds exactly the exact-jaccard pairs (certified recall)") {
    val exact = Dedup.ngramJaccard(spark, SF)
      .select("doc_i", "doc_j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, SF)
      .select("doc_i", "doc_j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data must contain planted near-dups")
    assert(lsh === exact,
      s"LSH missed ${exact.diff(lsh)} / fabricated ${lsh.diff(exact)}")
  }

  test("near-dup pairs are also close in simhash space") {
    val jacPairs = Dedup.ngramJaccard(spark, SF)
      .filter("jaccard >= 0.95")
      .select("doc_i", "doc_j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val simPairs = Dedup.simhashPairs(spark, SF)
      .select("doc_i", "doc_j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = jacPairs.count(simPairs.contains)
    // 2*found avoids Int-division vacuity (size/2 == 0 for one pair)
    assert(jacPairs.isEmpty || (found >= 1 && 2 * found >= jacPairs.size),
      s"simhash found $found of ${jacPairs.size} very-near dups at hamming<=3")
  }

  test("clusters: pair endpoints co-clustered, keeper is component min") {
    val labels = Dedup.clusters(spark, SF).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.minhashLsh(spark, SF).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (i, j) =>
      assert(labels(i) === labels(j), s"pair ($i,$j) split across clusters")
    }
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid === members.keys.min, s"cluster $cid keeper is not the min doc_id")
    }
  }

  test("exact dedup keeps one keeper per distinct text") {
    val docs = Tables.load(spark, SF, "documents").count()
    val dedup = Dedup.exact(spark, SF)
    assert(dedup.count() <= docs)
    assert(dedup.selectExpr("sum(n_copies)").head().getLong(0) === docs)
  }

  test("embedding near-dup join is symmetric-free (i < j) and thresholded") {
    val df = Dedup.embeddingCosine(spark, SF)
    assert(df.filter("vec_i >= vec_j").count() === 0)
    assert(df.filter("cosine < 0.45").count() === 0)
  }
}
