package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER overrides the single-JVM default — the
    // local-cluster[<workers>,<cores>,<memMB>] form runs executors as
    // SEPARATE JVMs, which is the only local way to exercise the
    // serialization boundary (native Expressions, Aggregators,
    // broadcast codebooks, bucketed-table metadata all cross it on a
    // real cluster). MasterConfig supplies the executor classpath +
    // JDK17 opens those child JVMs need.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = MasterConfig(SparkSession.builder()
      .master(master), master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated subset for local iteration (same contract
    // as Bench's SPARK_GRAFT_BENCH_QUERIES); the driver leaves it unset
    val only = sys.env.get("SPARK_GRAFT_VERIFY_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      val dest = new java.io.File(s"$outDir/$name")
      // pre-delete so a failed query can never be scored against a
      // previous run's parquet lingering at the same path
      def wipe(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(wipe)
        f.delete(): Unit
      }
      if (dest.exists()) wipe(dest)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(dest.getPath)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        if (dest.exists()) wipe(dest) // no half-written output either
      }
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // subset runs dump only the selected queries' oracles: the DuckDB
    // stage iterates oracle_sql.json, so un-dumped entries would each
    // land a junk file-not-found ERR row in a pinned subset artifact
    // (observed on the r17 cluster-at-sf1 run)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // Per-round QUALITY regeneration: the gates behind the no-oracle
    // entries are re-evaluated by the SAME run that produces the
    // correctness dump, so they can never ship on a stale artifact.
    // Round N = 1 + the latest CORRECTNESS_r*.json in the cwd (the
    // repo root when the driver runs); skipped for subset runs (local
    // iteration) and when no round artifacts are visible. A quality
    // failure must never sink the correctness dump — log and continue.
    if (only.isEmpty && !sys.env.contains("SPARK_GRAFT_SKIP_QUALITY")) {
      val cwd = new java.io.File(".").getCanonicalFile
      val roundRe = "CORRECTNESS_r0*(\\d+)\\.json".r
      val rounds = Option(cwd.listFiles).getOrElse(Array.empty).flatMap(f =>
        roundRe.findFirstMatchIn(f.getName).map(_.group(1).toInt))
      if (rounds.nonEmpty) try {
        val out = sys.env.getOrElse("SPARK_GRAFT_QUALITY_OUT",
          new java.io.File(cwd, s"QUALITY_r${rounds.max + 1}.json").getPath)
        // sf-scaled ANN corpus recall rides along when the bench corpus
        // is present (graft.BenchData writes it; see BASELINE.md)
        val annDir = sys.env.get("SPARK_GRAFT_QUALITY_ANN_DIR").orElse(
          Some(new java.io.File(cwd, "target/benchdata/sf1").getPath)
            .filter(p => new java.io.File(p, "embeddings.parquet").isDirectory))
        val failed = QualityHarness.writeArtifact(spark, sfDir, out, annDir)
        if (failed.nonEmpty)
          System.err.println(s"[quality] FAILED gates: ${failed.mkString(", ")}")
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[quality] artifact generation failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
