package graft

import org.apache.spark.sql.SparkSession

/** Executor-JVM plumbing for `local-cluster[n,cores,memMB]` masters.
  *
  * Everything before round 16 ran `local[N]` — one JVM, so a native
  * `Expression`, an `Aggregator`, a broadcast codebook, or bucketed
  * catalog metadata never actually crossed a process boundary. A
  * `local-cluster` master spawns real executor JVMs (Spark's own
  * multi-JVM test harness mode), which is where serialization bugs
  * live. Those child JVMs don't inherit the driver's `-cp`/`--add-
  * opens` flags, so:
  *
  *  - `spark.executor.extraClassPath` gets the driver's own classpath
  *    (the repo's compiled classes; the Spark jars come from
  *    `SPARK_HOME`, which the worker launcher requires anyway);
  *  - `spark.executor.extraJavaOptions` gets the JDK17 module opens
  *    Spark needs on Java 17+ (the driver script passes them via the
  *    command line; executors must carry their own).
  *
  * A no-op for plain `local[N]` masters, so the default path is
  * byte-identical to previous rounds.
  */
object MasterConfig {

  /** The add-opens set tools/verify.sh passes the driver JVM. */
  private val Opens: Seq[String] = {
    val base = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util",
      "java.util.concurrent", "java.util.concurrent.atomic")
      .map(p => s"--add-opens java.base/$p=ALL-UNNAMED")
    val sun = Seq("sun.nio.ch", "sun.nio.cs", "sun.security.action",
      "sun.util.calendar")
      .map(p => s"--add-opens java.base/$p=ALL-UNNAMED")
    base ++ sun
  }

  def apply(b: SparkSession.Builder, master: String): SparkSession.Builder =
    if (!master.startsWith("local-cluster")) b
    else b
      .config("spark.executor.extraClassPath",
        sys.props.getOrElse("java.class.path", ""))
      // no -Dspark.* here: Spark rejects spark options in executor
      // opts, and session confs (timezone etc.) propagate via SQLConf
      .config("spark.executor.extraJavaOptions", Opens.mkString(" "))
}
