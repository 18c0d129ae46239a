package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSuite {

  test("decode stage is lossless over rows and deterministic") {
    val media = Multimodal.mediaTable(spark, SF)
    val once = Multimodal.decode(media).collect().sortBy(_.doc_id)
    val twice = Multimodal.decode(media).collect().sortBy(_.doc_id)
    assert(once.length === media.count())
    assert(once.toSeq === twice.toSeq, "stub decode must be deterministic")
    assert(once.forall(d => d.width >= 64 && d.height >= 64 && d.n_frames >= 1))
  }

  test("decode stage is a narrow map (no shuffle in the plan)") {
    val plan = Multimodal.decode(Multimodal.mediaTable(spark, SF))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
  }

  test("media payloads round-trip byte-exactly (digest parity)") {
    val df = Multimodal.binaryMeta(spark, SF)
    assert(df.filter("length(digest) <> 64").count() === 0)
    assert(df.count() === Tables.load(spark, SF, "documents").count())
  }
}
