package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite with SparkSuite {

  test("winnowing: a shared >= k+w-1 token run always yields a shared fingerprint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow_fix").toString
    // docs 1/2 share an 8-token run (>= k+w-1 = 6: the winnowing
    // guarantee threshold) embedded in otherwise-unique text; doc 3 is
    // fully unique
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"${(1 to 10).map(i => s"a$i").mkString(" ")} $shared"),
      (2L, s"$shared ${(1 to 10).map(i => s"b$i").mkString(" ")}"),
      (3L, (1 to 20).map(i => s"c$i").mkString(" ")))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val sets = TextAnalysis.winnowSets(spark, dir)
      .select(col("doc_id"), col("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(sets(1L).intersect(sets(2L)).nonEmpty,
      "the winnowing guarantee: a shared run of >= k+w-1 tokens must share a fingerprint")
    assert(sets(1L).intersect(sets(3L)).isEmpty && sets(2L).intersect(sets(3L)).isEmpty,
      "unrelated docs must not collide on 48-bit fingerprints at this scale")

    // density bounds on the real corpus: selections exist and never
    // exceed the window count
    val counts = TextAnalysis.winnow(spark, SF).collect()
    assert(counts.nonEmpty)
    counts.foreach { r =>
      val (m, nFps) = (r.getInt(1), r.getInt(2))
      assert(nFps >= 1 && nFps <= math.max(1, m - TextAnalysis.winnowW + 1),
        s"fingerprint count $nFps out of bounds for $m grams")
      assert(r.getLong(4) <= r.getLong(5), "min_fp must not exceed max_fp")
    }
  }

  test("winnowing covers short docs: 3-5 tokens yield exactly one fingerprint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow_short").toString
    val docs = Seq(
      (1L, "just three tokens"),          // m = 1 gram
      (2L, "now we have five tokens"),    // m = 3 grams < w
      (3L, "a b"))                        // m = 0 -> excluded
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.winnow(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got === Map(1L -> 1, 2L -> 1),
      s"short docs take one all-gram window; sub-3-token docs have no gram: $got")
  }
}
