package graft

import org.apache.spark.sql.SparkSession

/** One shared local session across suites (getOrCreate dedupes). Specs
  * run on sf0.001 for speed — full DuckDB-oracle hash checks run at
  * sf0.01 via graft.Verify (see tools/verify.sh). */
trait SparkSuite {
  lazy val spark: SparkSession = SparkSuite.sessionLock.synchronized {
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // plan-string assertions read PushedFilters/ReadSchema; the default
      // 100-char metadata truncation would cut them off mid-list
      .config("spark.sql.maxMetadataStringLength", "10000")
      .getOrCreate()
  }

  val SF: String = "/root/testdata/sf0.001"
}

object SparkSuite {
  /** Suites run in parallel inside the forked test JVM, and
    * [[ExtensionsSpec]] must clear the default session while it builds
    * its extensions-bearing one — without a lock, a concurrently
    * initializing suite can publish a fresh default session inside
    * that window and ExtensionsSpec's getOrCreate adopts it
    * (extensions-less → UNRESOLVED_ROUTINE). Every session
    * construction path in the test JVM takes this lock. */
  val sessionLock = new Object
}
