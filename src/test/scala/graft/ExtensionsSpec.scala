package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions path must expose every native function
  * to plain SQL (the cluster deployment story: `--conf
  * spark.sql.extensions=graft.functions.GraftExtensions`).
  *
  * The literal conf can't be exercised in this JVM: Spark resolves
  * `spark.sql.extensions` from the SparkCONTEXT conf at session
  * construction, and the suite's shared context (created without the
  * conf — static confs on a pre-existing context are dropped with the
  * "some configuration may not take effect" warning) makes that path
  * structurally unreachable here. So the test performs exactly the two
  * steps Spark's own `applyExtensions` does with the conf value —
  * reflective no-arg construction from the class NAME a user would put
  * in the conf, then injection at builder time — which proves the conf
  * string resolves, instantiates, and registers everything. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=GraftExtensions registers the native functions") {
    // as spark-submit would: load by name, no-arg construct
    val ext = Class.forName("graft.functions.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    // the whole clear-default → build window runs under the session
    // lock so a parallel suite cannot publish its own default session
    // for this getOrCreate to adopt (see SparkSuite.sessionLock)
    val old = SparkSession.getDefaultSession
    val spark = SparkSuite.sessionLock.synchronized {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(ext)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
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
      SparkSuite.sessionLock.synchronized {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        old.foreach(SparkSession.setDefaultSession)
      }
    }
  }
}
