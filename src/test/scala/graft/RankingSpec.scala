package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ranking

class RankingSpec extends AnyFunSuite with SparkSuite {

  test("tfidf: hand-computed scores on a 3-doc fixture") {
    import spark.implicits._
    // doc 1: cat cat dog | doc 2: cat fish | doc 3: fish fish fish
    // N=3; df(cat)=2, df(dog)=1, df(fish)=2
    val docs = Seq(
      (1L, "cat cat dog"), (2L, "cat fish"), (3L, "fish fish fish"))
      .toDF("doc_id", "text")
    val got = Ranking.tfidfTopkOver(docs)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5)))
      .toMap
    // tfidf = tf * (N+1)/(df+1)
    assert(got((1L, "cat")) === ((2L, 2L, 2.0 * 4 / 3, 1)))
    assert(got((1L, "dog")) === ((1L, 1L, 1.0 * 4 / 2, 2)))
    // tie at tfidf=4/3 between cat and fish in doc 2 breaks on term asc
    assert(got((2L, "cat")) === ((1L, 2L, 1.0 * 4 / 3, 1)))
    assert(got((2L, "fish")) === ((1L, 2L, 1.0 * 4 / 3, 2)))
    assert(got((3L, "fish")) === ((3L, 2L, 3.0 * 4 / 3, 1)))
    assert(got.size === 5)
    spark.catalog.clearCache()
  }

  test("tfidf on testdata: per-doc ranks dense from 1, scores non-increasing") {
    val rows = Ranking.tfidfTopk(spark, SF)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(4), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_._3)
      assert(byRank.map(_._3).toSeq === (1 to byRank.length),
        s"doc $doc ranks not dense: ${byRank.map(_._3).mkString(",")}")
      assert(byRank.length <= Ranking.tfidfTopK)
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a._2 >= b._2,
          s"doc $doc scores increase down the ranking")
        case _ =>
      }
    }
    spark.catalog.clearCache()
  }
}
