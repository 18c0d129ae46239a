package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IngestStream

/** The checkpoint must make repeated drains incremental and
  * exactly-once: new files are picked up, seen files never reprocess —
  * across separate query instances (i.e. across "daily runs"). */
class IngestStreamSpec extends AnyFunSuite with SparkSuite {

  test("repeated drains ingest each file exactly once") {
    import org.apache.spark.sql.functions._
    val in = Files.createTempDirectory("graft_ingest_in")
    val out = Files.createTempDirectory("graft_ingest_out").toString + "/data"
    val ckpt = Files.createTempDirectory("graft_ingest_ckpt").toString

    def addFile(name: String, from: Long, n: Long): Unit = {
      val tmp = Files.createTempDirectory("graft_ingest_part")
      spark.range(from, from + n).select(col("id"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, in.resolve(name)): Unit
    }
    def drain(): Unit = {
      val schema = spark.read.parquet(in.toString).schema
      val q = IngestStream.drainOnce(spark, in.toString, out, ckpt, schema)
      q.awaitTermination()
    }
    def ingested(): Long = spark.read.parquet(out).count()

    addFile("day1.parquet", 0, 100)
    drain()
    assert(ingested() === 100)

    addFile("day2.parquet", 100, 50)
    drain() // a NEW query instance resuming from the same checkpoint
    assert(ingested() === 150, "second drain adds only the new file")

    drain() // nothing new landed
    assert(ingested() === 150, "no-op drain must not reprocess anything")

    // and the ingested ids are exactly 0..149, each once
    val ids = spark.read.parquet(out).select("id")
    assert(ids.distinct().count() === 150)
  }
}
