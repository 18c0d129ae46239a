package graft

import org.scalatest.funsuite.AnyFunSuite

/** The balance() split-estimate must walk a path's file listing at
  * most once per session: at a 100 TB table with millions of files the
  * per-file getFileStatus walk is real driver work, and every catalog
  * query builds its input frames through loadBalanced. */
class TablesSpec extends AnyFunSuite with SparkSuite {

  test("balance() walks the file listing once per (session, path)") {
    val before = Tables.listingWalks.get()
    Tables.loadBalanced(spark, SF, "lineitem")
    val afterFirst = Tables.listingWalks.get()
    Tables.loadBalanced(spark, SF, "lineitem")
    Tables.loadBalanced(spark, SF, "lineitem")
    val afterRepeat = Tables.listingWalks.get()
    // other suites may have warmed this path already in the shared
    // session — assert the *repeat* calls never re-walk, and the first
    // call walks at most once
    assert(afterFirst - before <= 1, "first load must walk at most once")
    assert(afterRepeat === afterFirst, "repeat loads must hit the cache")
  }

  test("balance() caches per path, not globally") {
    Tables.loadBalanced(spark, SF, "customer")
    val warm = Tables.listingWalks.get()
    Tables.loadBalanced(spark, SF, "orders") // distinct cold path
    // a distinct path may need its own (single) walk; the customer
    // path stays cached
    Tables.loadBalanced(spark, SF, "customer")
    val after = Tables.listingWalks.get()
    assert(after - warm <= 1, "only the new path may walk")
  }

  test("invalidateBalance forces a fresh walk for a rewritten path") {
    Tables.loadBalanced(spark, SF, "nation")
    val warm = Tables.listingWalks.get()
    Tables.loadBalanced(spark, SF, "nation")
    assert(Tables.listingWalks.get() === warm, "warm path must not re-walk")
    // a compaction flow that rewrites files under the same path calls
    // this hook; the next load must re-derive the spread verdict
    Tables.invalidateBalance(spark, s"$SF/nation.parquet")
    Tables.loadBalanced(spark, SF, "nation")
    assert(Tables.listingWalks.get() === warm + 1,
      "invalidated path must walk exactly once more")
  }

  test("cached balance still spreads an unsplittable small input") {
    // the decision itself must survive caching: tiny single-row-group
    // parquet at local[4] should come back repartitioned to cluster
    // parallelism both on the cold and the cached call
    val target = spark.sparkContext.defaultParallelism
    val cold = Tables.loadBalanced(spark, SF, "region")
    val cached = Tables.loadBalanced(spark, SF, "region")
    assert(cold.rdd.getNumPartitions === target)
    assert(cached.rdd.getNumPartitions === target)
  }
}
