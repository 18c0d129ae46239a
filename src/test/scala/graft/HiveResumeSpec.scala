package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** CROSS-JVM streaming resume on a persistent catalog (RUNBOOK.md's
  * Hive-metastore deployment shape, previously documented but never
  * exercised): two separate JVM processes run
  * [[graft.streaming.ResumeHarness]] — the identical cadence command —
  * against one derby-backed metastore, warehouse, checkpoint, and
  * drop folder, with a new file landing between them. The second
  * process must SEE the first's managed sink table through the
  * metastore (the in-memory catalog cannot), replay nothing, append
  * no duplicates, and converge to the batch probe.
  *
  * Child processes (not a second in-suite SparkSession) because
  * cross-JVM is the property under test: the suite-shared session's
  * in-memory catalog and its JVM-wide SparkContext would make an
  * in-process restart a weaker claim than the deployment it models.
  */
class HiveResumeSpec extends AnyFunSuite with SparkSuite {

  /** The verify.sh JVM flag set — Spark on JDK 17 needs the opens. */
  private val opens: Seq[String] =
    (Seq("java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic").map(p => s"java.base/$p") ++
      Seq("sun.nio.ch", "sun.nio.cs", "sun.security.action",
        "sun.util.calendar").map(p => s"java.base/$p"))
      .flatMap(m => Seq("--add-opens", s"$m=ALL-UNNAMED"))

  private def runPhase(phase: String, corpus: String, drop: String,
      ckpt: String, warehouse: String, metastore: String,
      cwd: java.io.File): Map[String, Any] = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = "/opt/spark/jars/*:" +
      java.nio.file.Paths.get("target/scala-2.13/classes").toAbsolutePath
    val cmd = (Seq(javaBin) ++ opens ++ Seq("-Xmx4g",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", cp, "graft.streaming.ResumeHarness",
      corpus, drop, ckpt, warehouse, metastore, phase)).asJava
    val pb = new ProcessBuilder(cmd)
    pb.directory(cwd) // derby.log and metastore scratch land here
    // stderr to a FILE: Spark's log volume would fill a pipe buffer
    // and deadlock a parent that drains stdout first
    val errFile = new java.io.File(cwd, s"stderr_$phase.log")
    pb.redirectError(errFile)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = proc.waitFor()
    lazy val errTail = scala.util.Try(
      java.nio.file.Files.readString(errFile.toPath)
        .linesIterator.toSeq.takeRight(25).mkString("\n")).getOrElse("")
    assert(code === 0, s"phase $phase exited $code\nstderr tail:\n$errTail")
    val line = out.linesIterator.toSeq.reverse
      .find(l => l.startsWith("""{"phase":"""))
      .getOrElse(fail(s"phase $phase printed no evidence line; stdout:\n$out"))
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(line) match {
      case JObject(fields) => fields.toMap.map {
        case (k, JInt(v))    => k -> v.toLong
        case (k, JString(v)) => k -> v
        case (k, v)          => k -> v
      }
      case other => fail(s"unparseable evidence line: $other")
    }
  }

  test("cross-JVM resume on a Hive metastore: second process replays nothing, duplicates nothing") {
    // same fixture family as DedupSpec's single-JVM resume case: the
    // corpus's batch partition, split into two drop-folder files
    val batchDocs = Tables.load(spark, SF, "documents")
      .filter(col("doc_id") % Dedup.batchStride === lit(Dedup.batchRes))
    def slice(i: Int) = batchDocs.filter(
      expr(s"pmod(doc_id div ${Dedup.batchStride}, 2) = $i"))
    val slice1Rows = slice(1).count()
    assert(slice(0).count() > 0 && slice1Rows > 0, "fixture slices must be non-empty")

    val base = Files.createTempDirectory("graft_hive_resume")
    val drop = Files.createDirectory(base.resolve("drop")).toString
    val ckpt = base.resolve("ckpt").toString
    val warehouse = base.resolve("warehouse").toString
    val metastore = base.resolve("metastore_db").toString
    val cwd = Files.createDirectory(base.resolve("scratch")).toFile

    slice(0).coalesce(1).write.mode("append").parquet(drop)
    val p1 = runPhase("jvm1", SF, drop, ckpt, warehouse, metastore, cwd)
    assert(p1("rows").asInstanceOf[Long] > 0, "first drain must find near-dups")
    assert(p1("dup_rows") === 0L && p1("missing_vs_batch") === 0L &&
      p1("extra_vs_batch") === 0L, s"first drain must match the batch probe: $p1")

    // a new file lands; a FRESH JVM reruns the identical command
    slice(1).coalesce(1).write.mode("append").parquet(drop)
    val p2 = runPhase("jvm2", SF, drop, ckpt, warehouse, metastore, cwd)
    // resume, not reprocess: the second drain ingested only the new
    // file's docs (under the in-memory catalog it would clear both
    // halves and re-ingest everything — the documented non-persistent
    // fallback this spec distinguishes from true resume)
    assert(p2("input_rows") === slice1Rows,
      s"second JVM must process exactly the new file's ${slice1Rows} docs: $p2")
    assert(p2("dup_rows") === 0L,
      s"resume must not re-append committed pairs: $p2")
    assert(p2("missing_vs_batch") === 0L && p2("extra_vs_batch") === 0L,
      s"accumulated pairs must equal the batch probe of the full folder: $p2")
    assert(p2("rows").asInstanceOf[Long] >= p1("rows").asInstanceOf[Long],
      "the second drain must keep the first's committed rows")
  }
}
