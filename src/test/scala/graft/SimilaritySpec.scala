package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite with SparkSuite {

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
}
