package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sf10 replica-scramble invariants (BenchData.writeScaled with
  * scramble = true). The whole point of the scramble is the GROUP-SIZE
  * contract: an sf1 near-dup clone family must stay a family within
  * each sf10 replica, while the replicas of one doc must NOT be
  * near-dups of each other under ANY of the engine's similarity bases
  * (3-shingles for minhash/jaccard/containment, unigram multisets for
  * simhash, identical floats for the embedding tiers). The first sf10
  * cut appended a single token per replica and silently compounded
  * group size to ~100 — these tests pin the properties that prevented
  * failure mode from coming back. */
class ScaleDataSpec extends AnyFunSuite with SparkSuite {

  private val baseText =
    "batch part spark line column order small sort column sort fast " +
      "value scan sort a hash sort slow spark group fast batch grid " +
      "window join key stream filter table query agg vector customer"

  /** text × __rep frame with the scramble applied (rep 0 verbatim, as
    * writeScaled does). */
  private def scrambled(texts: Seq[String], reps: Seq[Int]) = {
    import spark.implicits._
    texts.flatMap(t => reps.map(r => (t, r))).toDF("text", "__rep")
      .withColumn("out",
        when(col("__rep") === 0, col("text"))
          .otherwise(expr(BenchData.ScrambledTextSql)))
  }

  private def shingles(s: String): Set[Seq[String]] =
    s.split(" ").toSeq.sliding(3).map(_.toSeq).toSet

  private def jaccard(a: Set[Seq[String]], b: Set[Seq[String]]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size.toDouble

  test("scramble is deterministic and keeps rep 0 verbatim") {
    val out1 = scrambled(Seq(baseText), 0 to 3).select("__rep", "out")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val out2 = scrambled(Seq(baseText), 0 to 3).select("__rep", "out")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out1 === out2, "scramble must be a pure function of (text, __rep)")
    assert(out1(0) === baseText)
    assert((1 to 3).forall(r => out1(r) !== baseText))
  }

  test("one sf1 clone family scrambles into a family per replica") {
    // an sf1 family: the base doc and its ' repN'-suffixed clones
    val family = Seq(baseText, s"$baseText rep1", s"$baseText rep7")
    val rows = scrambled(family, Seq(2)).select("text", "out").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val sh = family.map(t => shingles(rows(t)))
    // members differ by ONE trailing token pre-scramble; position-keyed
    // scrambling must keep them 3-shingle near-dups (the suffix token
    // moves to a seeded position — a 1-token splice, not a reshuffle)
    for (Seq(a, b) <- sh.combinations(2))
      assert(jaccard(a, b) >= 0.8,
        s"family members must stay near-dups within a replica, got ${jaccard(a, b)}")
  }

  test("replicas of one doc are near-dups under NO similarity basis") {
    val perRep = scrambled(Seq(baseText), 0 to 4).select("__rep", "out")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    // 3-shingle basis (minhash/jaccard/containment/clusters edges)
    for (Seq(i, j) <- (0 to 4).combinations(2))
      assert(jaccard(shingles(perRep(i)), shingles(perRep(j))) <= 0.2,
        s"replicas $i/$j still share shingles")
    // unigram basis (simhash is order-invariant — a permutation alone
    // would leave identical signatures): ~30% of tokens must differ
    val base = baseText.split(" ").toSeq
    for (r <- 1 to 4) {
      val kept = perRep(r).split(" ").count(base.contains)
      val frac = kept.toDouble / base.size
      assert(frac > 0.45 && frac < 0.9,
        s"replica $r retains $frac of unigrams — replacement off target")
    }
  }

  test("embedding scramble: one value per (vector, replica), exact-dup groups preserved") {
    import spark.implicits._
    val v = Seq.tabulate(8)(i => 0.1f * i)
    val w = Seq.tabulate(8)(i => -0.2f * i)
    // two sf1 copies of v (distinct ids, same floats) + one of w
    val df = Seq((1L, v), (2L, v), (3L, w))
      .toDF("vec_id", "embedding")
      .withColumn("__rep", explode(expr("sequence(0, 2)")))
      .withColumn("__vh",
        expr("xxhash64(concat_ws(',', transform(embedding, x -> cast(x AS string))))"))
      .withColumn("out",
        when(col("__rep") === 0, col("embedding"))
          .otherwise(expr(BenchData.ScrambledVecSql)))
    val rows = df.select("vec_id", "__rep", "out").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    // copies of the same input vector agree within every replica...
    for (r <- 0 to 2) assert(rows((1L, r)) === rows((2L, r)))
    // ...replicas differ from each other and from the original...
    assert(rows((1L, 0)) === v)
    assert(rows((1L, 1)) !== v)
    assert(rows((1L, 1)) !== rows((1L, 2)))
    // ...distinct input vectors get distinct replacements...
    assert(rows((1L, 1)) !== rows((3L, 1)))
    // ...and components stay in the corpus's [-1, 1] shape
    assert(rows((1L, 1)).forall(x => x >= -1.0f && x <= 1.0f))
  }
}
