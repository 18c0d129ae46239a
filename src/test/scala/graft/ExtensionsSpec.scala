package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions path must expose every native function
  * to plain SQL (the cluster deployment story: `--conf
  * spark.sql.extensions=graft.functions.GraftExtensions`). Extensions
  * apply at session CONSTRUCTION, so the test clears the default
  * session to force a fresh one (sharing the JVM's SparkContext) and
  * restores it afterwards — no stop(), other suites keep running. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=GraftExtensions registers the native functions") {
    val old = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
          |  vec_norm(array(3.0F, 4.0F)) AS n,
          |  simhash60(array(7L)) AS s,
          |  size(shingles3(array('a', 'b', 'c', 'd'))) AS sh,
          |  size(minhash_sig64(array(1L, 2L))) AS mh""".stripMargin).head()
      assert(r.getDouble(0) === 11.0)
      assert(r.getDouble(1) === 5.0)
      assert(r.getLong(2) === 7L)
      assert(r.getInt(3) === 2)
      assert(r.getInt(4) === 64)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      old.foreach(SparkSession.setDefaultSession)
    }
  }
}
