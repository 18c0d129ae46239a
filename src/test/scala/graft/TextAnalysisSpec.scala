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

  test("winnowing equals an independent scalar reference on random repeated-token docs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // tiny vocabulary with punctuation/case noise → repeated grams and
    // genuine equal-hash ties, the cases where the packed tie-break
    // and distinct-ing could silently diverge from the reference
    val vocab = Seq("the", "cat", "sat", "on", "Mat,", "DOG!", "9lives", "the")
    val docGen = for {
      n <- Gen.choose(3, 30)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val texts = (0 until 40).map(i =>
      docGen.pureApply(Gen.Parameters.default, Seed(0xBEEF + i)))

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def scalarFps(text: String): Set[Long] = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty
      else {
        val enc = (1 to toks.length - 2).map { i =>
          val h = java.lang.Long.parseLong(
            md5hex(s"${toks(i - 1)} ${toks(i)} ${toks(i + 1)}").take(12), 16)
          h * 1024 + (1023 - i % 1024)
        }
        val wins = (1 to math.max(1, enc.length - TextAnalysis.winnowW + 1))
          .map(j => enc.slice(j - 1, j - 1 + TextAnalysis.winnowW).min / 1024)
        wins.toSet
      }
    }

    val dir = java.nio.file.Files.createTempDirectory("winnow_prop").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.winnowSets(spark, dir)
      .select(col("doc_id"), col("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = scalarFps(t)
      if (want.isEmpty) assert(!got.contains(i.toLong), s"doc $i should be filtered")
      else assert(got(i.toLong) === want, s"doc $i fps diverge for text: $t")
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
