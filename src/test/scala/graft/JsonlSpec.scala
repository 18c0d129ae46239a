package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JsonlTableReader

/** JSONL round-trip + corrupt-line quarantine over the documents
  * table. */
class JsonlSpec extends AnyFunSuite with SparkSuite {

  test("documents round-trip through JSONL losslessly") {
    val out = Files.createTempDirectory("graft_jsonl").toString + "/docs"
    val docs = Tables.load(spark, SF, "documents")
    JsonlTableReader.write(docs, out)
    val back = JsonlTableReader.read(spark, out).drop("_corrupt")
    assert(back.count() === docs.count())
    // digest-level equality, order-free
    val h = (df: org.apache.spark.sql.DataFrame) => df
      .selectExpr("bit_xor(xxhash64(doc_id, text, lang, source, n_chars)) AS h")
      .head().getLong(0)
    assert(h(back) === h(docs))
  }

  test("malformed lines are quarantined, not fatal and not silent") {
    val dir = Files.createTempDirectory("graft_jsonl_bad")
    Files.write(dir.resolve("part.jsonl"), java.util.List.of(
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""",
      """{"doc_id": broken not json""",
      """{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}"""))
    val split = JsonlTableReader.readSplit(spark, dir.toString)
    assert(split.good.count() === 2)
    assert(split.quarantined.count() === 1)
    assert(!split.good.columns.contains("_corrupt"))
    split.release()
  }
}
