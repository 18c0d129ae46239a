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

  test("real codec round-trip: PNG, WAV, and GIF decode to their encoded content") {
    val decoded = Multimodal.decodeReal(Multimodal.realMediaTable(spark, SF))
      .collect().map(d => d.doc_id -> d).toMap
    assert(decoded.nonEmpty)
    decoded.values.foreach { d =>
      if (d.doc_id % 3 == 0) {
        assert(d.media_type === "image")
        assert(d.width === 8 + (d.doc_id % 16).toInt, s"doc ${d.doc_id} width")
        assert(d.height === 8 + (d.doc_id % 8).toInt, s"doc ${d.doc_id} height")
        assert(d.feature === d.doc_id % 256, s"doc ${d.doc_id} mean red channel")
      } else if (d.doc_id % 3 == 1) {
        assert(d.media_type === "audio")
        assert(d.n_frames === 800 + (d.doc_id % 160).toInt, s"doc ${d.doc_id} PCM frames")
        assert(d.feature === math.abs((d.doc_id % 1000) - 500), s"doc ${d.doc_id} peak")
      } else {
        assert(d.media_type === "video")
        val n = 2 + (d.doc_id % 6).toInt
        assert(d.width === 4 + (d.doc_id % 8).toInt, s"doc ${d.doc_id} width")
        assert(d.height === 5 + (d.doc_id % 4).toInt, s"doc ${d.doc_id} height")
        assert(d.n_frames === n, s"doc ${d.doc_id} GIF frames")
        assert(d.feature === (0 until n).map(k => k * 255 / (n - 1)).sum.toLong,
          s"doc ${d.doc_id} sum of per-frame means")
      }
    }
    // payloads really are the containers they claim to be
    val rows = Multimodal.realMediaTable(spark, SF).take(20)
    rows.foreach { m =>
      val magic = m.payload.take(4).map(_ & 0xff)
      if (m.media_type == "image")
        assert(magic.sameElements(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)),
          s"doc ${m.doc_id} payload is not a PNG")
      else if (m.media_type == "audio")
        assert(new String(m.payload.take(4), "US-ASCII") === "RIFF",
          s"doc ${m.doc_id} payload is not a WAV/RIFF container")
      else
        assert(new String(m.payload.take(4), "US-ASCII") === "GIF8",
          s"doc ${m.doc_id} payload is not a GIF container")
    }
    // still the same narrow no-shuffle stage as the stub path
    val plan = Multimodal.decodeReal(Multimodal.realMediaTable(spark, SF))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"real decode must not shuffle:\n$plan")
  }

  test("media payloads round-trip byte-exactly (digest parity)") {
    val df = Multimodal.binaryMeta(spark, SF)
    assert(df.filter("length(digest) <> 64").count() === 0)
    assert(df.count() === Tables.load(spark, SF, "documents").count())
  }

  test("frame sampling: 1..maxFrames strided frames per doc, no shuffle") {
    val decoded = Multimodal.decode(Multimodal.mediaTable(spark, SF))
    val frames = Multimodal.frameSample(decoded, maxFrames = 4)
    val perDoc = frames.groupBy("doc_id").count().collect()
    assert(perDoc.length === decoded.count())
    assert(perDoc.forall { r =>
      val n = r.getLong(1); n >= 1 && n <= 4
    })
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling must not shuffle:\n$plan")
  }

  test("real frame sampling: strided frames of the decoded PCM/pixels, no shuffle") {
    val frames = Multimodal.frameSampleReal(
      Multimodal.decodeReal(Multimodal.realMediaTable(spark, SF)))
    val rows = frames.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.doc_id).foreach { case (id, fs) =>
      if (id % 3 == 0) {
        // images decode to exactly one frame at ts 0
        assert(fs.length === 1 && fs.head.frame_idx === 0 && fs.head.ts_ms === 0L)
      } else if (id % 3 == 1) {
        // audio: 4 strided samples of the real PCM frame count
        val n = 800 + (id % 160).toInt
        assert(fs.map(_.frame_idx).sorted.toSeq === (0 until 4).map(_ * (n / 4)))
        fs.foreach(f => assert(f.ts_ms === f.frame_idx * 1000L / 8000L))
      } else {
        // video: up to 4 strided samples of the real GIF frame count
        val n = 2 + (id % 6).toInt
        val take = math.min(4, n)
        assert(fs.map(_.frame_idx).sorted.toSeq ===
          (0 until take).map(_ * math.max(1, n / take)), s"doc $id video stride")
      }
    }
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling must not shuffle:\n$plan")
  }

  test("audio features match the square-wave closed form via a real WAV parse") {
    val feats = Multimodal.audioFeatures(Multimodal.audioTable(spark, SF))
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { f =>
      val (n, a, p) = (800 + (f.doc_id % 160).toInt,
        100 + f.doc_id % 900, 2 + (f.doc_id % 7).toInt)
      assert(f.n_samples === n, s"doc ${f.doc_id} n_samples")
      assert(f.peak === a, s"doc ${f.doc_id} peak")
      assert(f.sum_sq === n.toLong * a * a, s"doc ${f.doc_id} energy")
      assert(f.zero_crossings === (n - 1) / p, s"doc ${f.doc_id} zero crossings")
      assert(math.abs(f.rms - a) < 1e-9, s"doc ${f.doc_id} rms")
    }
    // the feature scan is a narrow map over the synth — no shuffle
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"audio feature extraction must not shuffle:\n$plan")
  }

  test("audio decode: corrupt rows degrade to sentinels between good rows") {
    // exercises the SPI reader path's fallback contract through a MIXED
    // partition: the first good WAV promotes the WAV reader to the
    // front of the per-thread provider list, a corrupt payload must
    // still exhaust every provider and degrade to the sentinel (never
    // a task kill), and the NEXT good WAV must still parse first-try —
    // i.e. the last-success-first reorder can neither mask the
    // no-reader-accepts error nor poison later rows. coalesce(1) pins
    // all three rows into one partition so they share one provider
    // list and thread.
    import spark.implicits._
    def wav(id: Long) = Multimodal.audioTable(spark, SF)
      .filter(_.doc_id == id).head()
    val ids = Multimodal.audioTable(spark, SF).take(2).map(_.doc_id)
    val mixed = Seq(
      wav(ids(0)),
      Multimodal.MediaRow(999L, "audio", Array[Byte](0x52, 0x49, 0x46, 0x9)), // RIFF-ish garbage
      wav(ids(1))).toDS().coalesce(1)
    val out = Multimodal.audioFeatures(mixed).collect().sortBy(_.doc_id)
    val good = out.filter(_.doc_id != 999L)
    assert(good.length === 2 && good.forall(f => f.peak > 0 && f.n_samples > 0),
      s"good rows must decode around the corrupt one: ${out.toSeq}")
    val bad = out.find(_.doc_id == 999L).get
    assert(bad.peak === -1L && bad.n_samples === 0,
      s"corrupt payload must yield the sentinel, got $bad")
  }

  test("video frames decode the temporal gradient per frame; corrupt GIFs degrade to sentinels") {
    import spark.implicits._
    val frames = Multimodal.videoFramesQuery(spark, SF).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.getLong(0)).foreach { case (id, fs) =>
      val n = 2 + (id % 6).toInt
      assert(fs.length === n, s"doc $id must emit one row per stored frame")
      fs.foreach { r =>
        val k = r.getInt(1)
        assert(r.getInt(2) === 4 + (id % 8).toInt, s"doc $id width")
        assert(r.getInt(3) === 5 + (id % 4).toInt, s"doc $id height")
        assert(r.getInt(4) === n, s"doc $id n_frames")
        // frame k of the temporal gradient is solid k·255/(n−1): a
        // decode that returns the wrong frame for an index fails here
        assert(r.getLong(5) === (k * 255 / (n - 1)).toLong, s"doc $id frame $k red")
      }
    }
    // a truncated GIF (valid magic, no image data) must yield the
    // sentinel row, not a task kill — same invariant as the audio tier
    val garbage = Seq(Multimodal.MediaRow(999L, "video",
      "GIF89a".getBytes("US-ASCII"))).toDS()
    val out = Multimodal.decodeReal(garbage).collect()
    assert(out.length === 1 && out.head.feature === -1L && out.head.n_frames === 0,
      s"corrupt GIF must degrade to the sentinel, got ${out.toSeq}")
  }

  test("image features match the gradient closed form via a real PNG decode") {
    val feats = Multimodal.imageFeatures(Multimodal.gradientTable(spark, SF))
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { f =>
      val (w, h) = (8 + (f.doc_id % 16).toInt, 8 + (f.doc_id % 8).toInt)
      val reds = (0 until w).map(x => x * 255 / (w - 1))
      assert(f.width === w && f.height === h, s"doc ${f.doc_id} dims")
      assert(f.min_red === 0 && f.max_red === 255, s"doc ${f.doc_id} range")
      assert(f.sum_red === reds.map(_.toLong).sum * h, s"doc ${f.doc_id} sum")
      assert(f.n_edges === (1 until w).count(x => reds(x) != reds(x - 1)) * h,
        s"doc ${f.doc_id} edges")
      assert(f.mean_red === f.sum_red.toDouble / (w.toLong * h))
    }
    // the pixel scan is a narrow map over the synth — no shuffle
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"image feature extraction must not shuffle:\n$plan")
    // a corrupt payload degrades to the sentinel row, never a task kill
    import spark.implicits._
    val bad = Seq(Multimodal.MediaRow(7L, "image", Array[Byte](1, 2, 3))).toDS()
    val s = Multimodal.imageFeatures(bad).head()
    assert(s.doc_id === 7L && s.sum_red === -1L && s.n_edges === -1)
  }

  test("resize plan clamps into the box preserving aspect ratio") {
    val decoded = Multimodal.decode(Multimodal.mediaTable(spark, SF))
    val planned = Multimodal.resizePlan(decoded, maxW = 128, maxH = 96).collect()
    planned.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(ow <= 128 && oh <= 96 && ow >= 1 && oh >= 1)
      if (w <= 128 && h <= 96) assert(ow === w && oh === h)
      else {
        // same integer math as the plan: scale by min(maxW/w, maxH/h)
        val num = math.min(128L * h, 96L * w)
        assert(ow === math.max(1L, num / h).toInt)
        assert(oh === math.max(1L, num / w).toInt)
      }
    }
  }

  test("real resize: re-decoded thumbnails match a scalar nearest-neighbor reference") {
    val rows = Multimodal.imageResizeQuery(spark, SF).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
      assert(w === 8 + (id % 16).toInt && h === 8 + (id % 8).toInt)
      // resizePlan's clamp formula, recomputed independently
      val num = math.min(Multimodal.resizeBox * h, Multimodal.resizeBox * w)
      val (ow, oh) = (math.max(1, num / h), math.max(1, num / w))
      assert(r.getInt(3) === ow && r.getInt(4) === oh,
        s"doc $id out dims must follow the clamp formula")
      assert(ow <= Multimodal.resizeBox && oh <= Multimodal.resizeBox)
      // scalar reference: resized column x' samples source column
      // floor(x'*w/ow) of the red ramp, identical over oh rows
      val rowSum = (0 until ow).map(x => (x * w / ow) * 255 / (w - 1)).sum.toLong
      assert(r.getLong(5) === rowSum * oh,
        s"doc $id sum_red must equal the nearest-neighbor closed form")
      assert(r.getDouble(6) === rowSum * oh / (ow.toDouble * oh),
        s"doc $id mean_red must be sum over out pixels")
    }
    // still a narrow codec seam: no shuffle anywhere before the sort
    val plan = Multimodal.imageResize(Multimodal.gradientTable(spark, SF))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"resize must stay a narrow map:\n$plan")
  }
}
