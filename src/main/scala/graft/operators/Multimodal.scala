package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and a decode/feature-extract stage.
  *
  * Two decode paths, both through the same narrow mapPartitions seam:
  *
  *  - [[decodeReal]] / `mm_decode` — REAL codecs for the formats the
  *    JVM ships in pure Java: PNG (javax.imageio) and WAV PCM
  *    (javax.sound.sampled). Payloads are genuinely encoded media and
  *    the stage genuinely parses them; the DuckDB oracle checks the
  *    decoded dimensions/amplitudes in closed form.
  *  - [[decode]] / `mm_decode_stub` — the documented deterministic
  *    stub standing in for formats with no pure-JDK codec (video —
  *    and any external-library format a deployment would add):
  *    [[decodePartition]] is the single function to swap for the
  *    JNI/codec call.
  *
  * This mirrors how a Python pipeline would run decode under
  * `mapInPandas`: Spark streams each partition through a narrow,
  * no-shuffle map stage, so at 100 TB the stage scales with input
  * splits and never materializes more than a partition of media bytes
  * at once.
  */
object Multimodal {

  /** The JDK sound stack's public entry points — `AudioSystem.write`
    * and `AudioSystem.getAudioInputStream` — run a SYNCHRONIZED
    * provider lookup per call, and the read side discovers the right
    * container parser by letting every non-matching reader THROW
    * `UnsupportedAudioFileException` (AIFF and AU are registered ahead
    * of WAV). Measured at 32 threads that costs ~700–1800 µs of
    * thread-time per row against ~15 µs for the actual codec work —
    * a 50× collapse that made the audio tier scale superlinearly
    * (sf1 full-catalog run, BASELINE.md round 11). At 100 TB a decode
    * stage serialized on a JVM-global registry lock is a cluster-wide
    * straggler factory.
    *
    * Fix, still 100% public API and still the REAL JDK codec
    * (`com.sun.media.sound.WaveFileReader/WaveFileWriter` underneath):
    * resolve the SPI providers once per thread via `ServiceLoader`,
    * probe writers with the exception-free `isFileTypeSupported`, and
    * keep the reader list in last-success-first order so steady-state
    * rows parse on the first try instead of paying two
    * exception-throwing misses each. */
  private object SoundSpi {
    import javax.sound.sampled.{AudioInputStream, AudioFileFormat, UnsupportedAudioFileException}
    import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}
    import scala.jdk.CollectionConverters._
    private val tl = new ThreadLocal[
        (Array[AudioFileWriter], scala.collection.mutable.ArrayBuffer[AudioFileReader])] {
      override def initialValue() =
        (java.util.ServiceLoader.load(classOf[AudioFileWriter]).asScala.toArray,
          scala.collection.mutable.ArrayBuffer.from(
            java.util.ServiceLoader.load(classOf[AudioFileReader]).asScala))
    }

    def writeWave(ais: AudioInputStream, out: java.io.OutputStream): Unit = {
      val w = tl.get()._1
        .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, ais))
        .getOrElse(throw new java.io.IOException("no WAVE writer installed"))
      w.write(ais, AudioFileFormat.Type.WAVE, out): Unit
    }

    /** Parse `bytes` with the first accepting reader; throws
      * `UnsupportedAudioFileException` when none accepts — the same
      * contract as `AudioSystem.getAudioInputStream`. A reader that
      * accepts the container magic but then fails on the payload
      * (truncated header → IOException) is also skipped, so the
      * outcome for a given payload never depends on which reader the
      * last-success reorder happens to have put first. */
    def open(bytes: Array[Byte]): AudioInputStream = {
      val rs = tl.get()._2
      var i = 0
      while (i < rs.length) {
        try {
          val ais = rs(i).getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
          if (i != 0) { val r = rs.remove(i); rs.insert(0, r) }
          return ais
        } catch {
          case _: UnsupportedAudioFileException => ()
          case _: java.io.IOException           => ()
        }
        i += 1
      }
      throw new UnsupportedAudioFileException("no installed reader accepts the payload")
    }
  }

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded features (fake, deterministic — see decodePartition). */
  case class DecodedMedia(doc_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** Fabricate a media table from `documents` (text bytes stand in for
    * encoded media; type assigned deterministically). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        expr("element_at(array('image','audio','video'), cast(doc_id % 3 AS int) + 1)")
          .as("media_type"),
        col("text").cast("binary").as("payload"))

  /** STUB decode for codec PAYLOADS the JDK ships no decoder for
    * (H.264, VP9, AAC, …): deterministic fake dimensions derived
    * from the payload, so the distributed plumbing is fully testable.
    * Formats with a pure-JDK codec decode for REAL elsewhere — PNG
    * ([[decodeRealPartition]]), WAV PCM ([[audioFeaturesPartition]]),
    * multi-frame GIF ([[gifFrames]]) — and since r16 the CONTAINER
    * layer of MP4/MKV parses for real too ([[MediaContainers]],
    * oracle-checked `mm_container_meta`: ISO BMFF box walk + EBML
    * vint walk are plain byte structure, no codec needed) — leaving
    * this seam as exactly the JNI/codec swap-in point a production
    * deployment fills, now scoped to compressed payload decode only. */
  private def decodePartition(rows: Iterator[MediaRow]): Iterator[DecodedMedia] =
    rows.map { r =>
      // null payloads (nullable source columns) decode as empty media
      // instead of NPE-ing the stage
      val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
      val checksum = bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
      val w = 64 + (checksum % 1024).toInt
      val h = 64 + ((checksum / 1024) % 1024).toInt
      val frames = r.media_type match {
        case "video" => 1 + (checksum % 64).toInt
        case "audio" => 1 + (checksum % 16).toInt
        case _       => 1
      }
      DecodedMedia(r.doc_id, r.media_type, bytes.length, w, h, frames, checksum)
    }

  /** The decode stage: narrow mapPartitions over the typed Dataset —
    * the one place the engine drops below declarative DataFrame ops,
    * because codec calls are inherently imperative per-record work. */
  def decode(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(decodePartition _)
  }

  // ---------------------------------------------------------------------
  // mm_binary_meta — binary-column metadata + content digest, fully
  // oracle-checkable (sha256 agrees across engines on the same bytes).
  // ---------------------------------------------------------------------
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media_type"),
        octet_length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("digest"))
      .orderBy("doc_id")

  val binaryMetaSql: String =
    """SELECT doc_id,
      |  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
      |  sha256(text) AS digest
      |FROM documents ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // mm_decode_stub — the decode stage end-to-end (rows-only driver
  // check; the decode itself is the documented stub).
  // ---------------------------------------------------------------------
  def decodeStub(spark: SparkSession, dir: String): DataFrame =
    decode(mediaTable(spark, dir)).toDF().orderBy("doc_id")

  /** A sampled frame reference: which frame of which doc, plus the
    * (stubbed) frame feature vector derived from it. */
  case class FrameRef(doc_id: Long, frame_idx: Int, ts_ms: Long, feature: Long)

  /** Frame sampling: up to `maxFrames` evenly-strided frames per item
    * (images contribute one frame; audio/video contribute up to
    * `maxFrames` strided samples of their n_frames; ts_ms uses a fixed
    * 25fps frame clock — the stub's convention). A narrow flatMap —
    * output rows scale with docs × maxFrames, never with payload size,
    * and no shuffle is introduced. The frame "feature" is the stubbed
    * decode seam (real deployments put the codec + model call there). */
  /** The one strided-sampling rule both decode paths share: up to
    * `maxFrames` evenly-strided frames; `tsOf` maps a frame index onto
    * the media's clock; `seed` feeds the per-frame feature. */
  private def stridedFrames(docId: Long, nFrames: Int, seed: Long,
      maxFrames: Int, tsOf: Int => Long): Seq[FrameRef] = {
    val take = math.min(maxFrames, nFrames)
    val stride = math.max(1, nFrames / math.max(take, 1))
    (0 until take).map { i =>
      val idx = i * stride
      FrameRef(docId, idx, tsOf(idx), (seed * 31 + idx) % 1000000007L)
    }
  }

  def frameSample(decoded: Dataset[DecodedMedia], maxFrames: Int = 4): Dataset[FrameRef] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    // 25fps stub clock → 40ms/frame
    decoded.flatMap(d =>
      stridedFrames(d.doc_id, d.n_frames, d.checksum, maxFrames, idx => idx * 40L))
  }

  /** Resize planning: clamp each media item into a target box
    * preserving aspect ratio (integer math only, deterministic — the
    * actual pixel resample is the same stubbed seam as decode). */
  def resizePlan(decoded: Dataset[DecodedMedia], maxW: Int = 512, maxH: Int = 512): DataFrame = {
    val d = decoded.toDF()
    // w·min(maxW·h, maxH·w)/(w·h) reduces to min(maxW·h, maxH·w)/h —
    // the unreduced form overflows Int for large media dims (8000² ×
    // 512 > Int.MaxValue), the reduced one cannot.
    d.withColumn("scale_num",
        least(lit(maxW) * col("height"), lit(maxH) * col("width")))
      .withColumn("out_w",
        when(col("width") <= maxW && col("height") <= maxH, col("width"))
          .otherwise(greatest(lit(1), (col("scale_num") / col("height")).cast("int"))))
      .withColumn("out_h",
        when(col("width") <= maxW && col("height") <= maxH, col("height"))
          .otherwise(greatest(lit(1), (col("scale_num") / col("width")).cast("int"))))
      .select("doc_id", "media_type", "width", "height", "out_w", "out_h")
  }

  /** Frame sampling over REAL decodes: the same strided sampling as
    * [[frameSample]], but n_frames and the per-frame feature come from
    * [[decodeReal]]'s genuinely parsed PNG/WAV content, so every output
    * cell is a closed-form function of doc_id and the query carries a
    * DuckDB oracle. ts_ms uses the audio PCM sample clock (8 kHz →
    * sample·1000/8000 ms, floor); an image's single frame sits at 0 on
    * any clock. Still a narrow flatMap — no shuffle, output scales
    * with docs × maxFrames. */
  def frameSampleReal(decoded: Dataset[RealDecoded], maxFrames: Int = 4): Dataset[FrameRef] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    // 8 kHz PCM sample clock; an image's single frame sits at ts 0
    decoded.flatMap(d =>
      stridedFrames(d.doc_id, d.n_frames, d.feature, maxFrames, idx => idx * 1000L / 8000L))
  }

  def frameSampleQuery(spark: SparkSession, dir: String): DataFrame =
    frameSampleReal(decodeReal(realMediaTable(spark, dir)))
      .toDF().orderBy("doc_id", "frame_idx")

  /** Every sampled frame is a closed-form function of doc_id: images
    * (doc_id % 3 = 0) decode to one frame; WAVs to 800 + doc_id % 160
    * PCM frames sampled 4× strided; GIFs to their real 2 + doc_id % 6
    * frame count with the Σ-of-frame-means seed the video decode
    * emits. */
  val frameSampleSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 1
      |         WHEN doc_id % 3 = 2 THEN 2 + doc_id % 6
      |         ELSE 800 + doc_id % 160 END AS n_frames,
      |    CASE WHEN doc_id % 3 = 0 THEN doc_id % 256
      |         WHEN doc_id % 3 = 2 THEN list_sum(list_transform(
      |           range(0, 2 + doc_id % 6), k -> k * 255 // (1 + doc_id % 6)))
      |         ELSE abs((doc_id % 1000) - 500) END AS feat
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, feat,
      |    unnest(range(0, least(n_frames, 4))) *
      |      greatest(n_frames // least(n_frames, 4), 1) AS idx
      |  FROM m)
      |SELECT doc_id, CAST(idx AS INT) AS frame_idx,
      |  CAST(idx * 1000 // 8000 AS BIGINT) AS ts_ms,
      |  CAST((feat * 31 + idx) % 1000000007 AS BIGINT) AS feature
      |FROM f ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // mm_decode — REAL codec round-trip for the formats the JVM ships
  // pure-Java codecs for: PNG via javax.imageio, WAV PCM via
  // javax.sound.sampled, and multi-frame GIF (the JDK's only
  // multi-frame media container) via javax.imageio's sequence API.
  // The payloads are genuinely ENCODED media bytes (content generated
  // deterministically from doc_id) and the decode stage genuinely
  // parses those bytes back — so the decoded properties are
  // closed-form functions of doc_id and the query is fully
  // DuckDB-oracle-checkable across all three media thirds. The
  // [[decodePartition]] stub remains only for container formats the
  // JDK truly lacks a codec for (MP4/H.264, MKV, …); a real
  // deployment swaps that one seam for its JNI/codec call exactly as
  // an image/audio/GIF deployment would swap in its own formats here.
  // ---------------------------------------------------------------------

  /** Decoded REAL media: image → dimensions + mean red channel;
    * audio → PCM frame count + peak amplitude. */
  case class RealDecoded(doc_id: Long, media_type: String, width: Int,
      height: Int, n_frames: Int, feature: Long)

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 256-gray palette: with TYPE_BYTE_INDEXED over this exact color
    * model, the GIF writer emits the palette verbatim — no quantizer
    * in the loop — so every frame's gray value survives the
    * encode→decode round-trip bit-exactly (the property the oracle
    * depends on; a TYPE_INT_RGB source would route through the
    * writer's color quantization instead). */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** A real multi-frame GIF: `nFrames` full frames, frame k solid
    * gray k·255/(nFrames−1) — a TEMPORAL gradient, so a decode that
    * returns the wrong frame for an index (or composites frames)
    * cannot match the oracle. */
  private def gifBytes(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var k = 0
      while (k < nFrames) {
        val v = if (nFrames <= 1) 0 else k * 255 / (nFrames - 1)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val rgb = (v << 16) | (v << 8) | v
        var y = 0
        while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        k += 1
      }
      writer.endWriteSequence()
      ios.flush()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Parse a multi-frame GIF back: (width, height, mean red per
    * frame). Full-frame mean (not a corner probe) so a frame written
    * at the wrong position or size cannot pass. None when no reader
    * accepts the payload. */
  private def gifFrames(bytes: Array[Byte]): Option[(Int, Int, Array[Long])] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, false)
          val n = reader.getNumImages(true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          val means = Array.tabulate(n) { k =>
            val img = reader.read(k)
            sumRed(img) / (img.getWidth.toLong * img.getHeight)
          }
          Some((w, h, means))
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** The video third's generation rule (doc_id % 3 == 2): closed-form
    * dims and frame count, small enough that a 500-doc fixture decodes
    * in milliseconds yet every frame index is exercised. Height starts
    * at 5: the JDK GIF codec corrupts the LAST ROW of height-4 images
    * (probed exhaustively — h=4 fails at every width, h>=5 round-trips
    * bit-exactly), so the generation rule simply never emits the
    * broken shape. */
  private def videoDims(id: Long): (Int, Int, Int) =
    (4 + (id % 8).toInt, 5 + (id % 4).toInt, 2 + (id % 6).toInt)

  private def wavBytes(nSamples: Int, value: Short): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      pcm(2 * i) = (value & 0xff).toByte
      pcm(2 * i + 1) = ((value >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    SoundSpi.writeWave(ais, bos)
    bos.toByteArray
  }

  /** Real encoded media (PNG / WAV / multi-frame GIF bytes),
    * deterministic per doc_id: the %3==0 third is w×h solid-gray
    * PNGs, %3==1 constant-amplitude 8 kHz PCM16 WAVs, %3==2
    * temporal-gradient GIFs ([[gifBytes]]). Encoding runs in the same
    * narrow mapPartitions seam decode does. */
  def realMediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        // ImageIO's default scratch cache is DISK-backed — 32 tasks
        // contending on tmp files for in-memory byte arrays
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          if (id % 3 == 0) {
            val w = 8 + (id % 16).toInt
            val h = 8 + (id % 8).toInt
            val r = (id % 256).toInt
            MediaRow(id, "image", pngBytes(w, h, (r << 16) | (r << 8) | r))
          } else if (id % 3 == 1) {
            val n = 800 + (id % 160).toInt
            val a = ((id % 1000) - 500).toShort
            MediaRow(id, "audio", wavBytes(n, a))
          } else {
            val (w, h, n) = videoDims(id)
            MediaRow(id, "video", gifBytes(w, h, n))
          }
        }
      }
  }

  /** REAL decode: parses the PNG/WAV container + content back out of
    * the payload bytes. Anything else falls through to the documented
    * stub semantics of [[decodePartition]]. */
  /** Sentinel row for null/corrupt payloads: one bad record must
    * degrade to a filterable marker, not poison a 100 TB decode stage
    * with task-killing NPEs (the invariant the stub path documents). */
  private def undecodable(m: MediaRow): RealDecoded =
    RealDecoded(m.doc_id, m.media_type, 0, 0, 0, -1L)

  private def decodeRealPartition(rows: Iterator[MediaRow]): Iterator[RealDecoded] = {
    javax.imageio.ImageIO.setUseCache(false)
    rows.map { m =>
      if (m.payload == null || m.payload.isEmpty) undecodable(m)
      else m.media_type match {
        case "image" =>
          // ImageIO.read returns null for bytes no registered reader
          // accepts, throws IIOException/IOException when a reader
          // accepts the header then fails mid-parse (truncated PNG),
          // and throws RuntimeExceptions (IllegalArgument, CMM, OOB)
          // on malformed headers — NonFatal covers all three without
          // swallowing OOM/fatal errors
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
            if (img == null) undecodable(m)
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              RealDecoded(m.doc_id, "image", w, h, 1, sumRed(img) / (w.toLong * h))
            }
          } catch {
            case scala.util.control.NonFatal(_) => undecodable(m)
          }
        case "audio" =>
          try {
            val ais = SoundSpi.open(m.payload)
            val frames = ais.getFrameLength.toInt
            val bytes = ais.readAllBytes()
            var peak = 0L
            var i = 0
            while (i + 1 < bytes.length) {
              val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort
              if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
              i += 2
            }
            RealDecoded(m.doc_id, "audio", 0, 0, frames, peak)
          } catch {
            // same NonFatal rationale as the image branch: the JDK
            // audio stack throws RuntimeExceptions on garbage chunks
            case scala.util.control.NonFatal(_) => undecodable(m)
          }
        case "video" =>
          // real multi-frame GIF parse; feature = Σ per-frame mean
          // red, so EVERY frame (not just frame 0) must decode to its
          // exact temporal-gradient value for the oracle to match
          try {
            gifFrames(m.payload) match {
              case Some((w, h, means)) =>
                RealDecoded(m.doc_id, "video", w, h, means.length, means.sum)
              case None => undecodable(m)
            }
          } catch {
            case scala.util.control.NonFatal(_) => undecodable(m)
          }
        case other =>
          val d = decodePartition(Iterator(m)).next()
          RealDecoded(d.doc_id, other, d.width, d.height, d.n_frames, d.checksum)
      }
    }
  }

  def decodeReal(media: Dataset[MediaRow]): Dataset[RealDecoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(decodeRealPartition _)
  }

  def realDecodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeReal(realMediaTable(spark, dir)).toDF().orderBy("doc_id")

  /** Every decoded property is a closed-form function of doc_id — the
    * oracle recomputes what the codec round-trip must return. The
    * video rows re-derive the temporal gradient: frame k of n is
    * solid k·255//(n−1), so the Σ-of-frame-means feature is
    * list_sum over range(0, n). */
  val realDecodeSql: String =
    """WITH v AS (
      |  SELECT doc_id, CAST(2 + doc_id % 6 AS BIGINT) AS nf FROM documents)
      |SELECT d.doc_id,
      |  ['image','audio','video'][CAST(d.doc_id % 3 AS INT) + 1] AS media_type,
      |  CAST(CASE WHEN d.doc_id % 3 = 0 THEN 8 + d.doc_id % 16
      |       WHEN d.doc_id % 3 = 2 THEN 4 + d.doc_id % 8 ELSE 0 END AS INT) AS width,
      |  CAST(CASE WHEN d.doc_id % 3 = 0 THEN 8 + d.doc_id % 8
      |       WHEN d.doc_id % 3 = 2 THEN 5 + d.doc_id % 4 ELSE 0 END AS INT) AS height,
      |  CAST(CASE WHEN d.doc_id % 3 = 0 THEN 1
      |       WHEN d.doc_id % 3 = 2 THEN v.nf ELSE 800 + d.doc_id % 160 END AS INT) AS n_frames,
      |  CAST(CASE WHEN d.doc_id % 3 = 0 THEN d.doc_id % 256
      |       WHEN d.doc_id % 3 = 2 THEN
      |         list_sum(list_transform(range(0, v.nf), k -> k * 255 // (v.nf - 1)))
      |       ELSE abs((d.doc_id % 1000) - 500) END AS BIGINT) AS feature
      |FROM documents d JOIN v USING (doc_id) ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // mm_audio_features — REAL audio feature extraction: peak amplitude,
  // energy (sum of squares), zero-crossing count, and RMS — the
  // standard first-pass audio features — computed by genuinely parsing
  // WAV containers and scanning their PCM16 samples. The corpus is the
  // doc_id % 3 == 2 third (the slot the real-decode path leaves to the
  // video stub): square waves with doc_id-derived amplitude and
  // half-period, so every feature is a closed-form function of doc_id
  // and the query carries an exact DuckDB oracle — a square wave of
  // amplitude a has energy n·a², and its sign flips exactly at
  // half-period multiples, so zero_crossings = ⌊(n−1)/p⌋. Same narrow
  // mapPartitions codec seam as mm_decode: no shuffle, one partition
  // of media bytes in memory at a time.
  // ---------------------------------------------------------------------
  case class AudioFeatures(doc_id: Long, n_samples: Int, peak: Long,
      sum_sq: Long, zero_crossings: Int, rms: Double)

  private def squareWavBytes(nSamples: Int, amp: Short, halfPeriod: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v: Short = if ((i / halfPeriod) % 2 == 0) amp else (-amp).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    SoundSpi.writeWave(ais, bos)
    bos.toByteArray
  }

  /** Square-wave WAVs, deterministic per doc_id: n = 800 + id%160
    * samples, amplitude 100 + id%900, half-period 2 + id%7. */
  def audioTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        MediaRow(id, "audio", squareWavBytes(
          800 + (id % 160).toInt, (100 + id % 900).toShort, 2 + (id % 7).toInt))
      })
  }

  private def audioFeaturesPartition(rows: Iterator[MediaRow]): Iterator[AudioFeatures] =
    rows.map { m =>
      try {
        val ais = SoundSpi.open(m.payload)
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var peak = 0L; var sumSq = 0L; var zc = 0; var prev = 0
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
          val a = math.abs(s.toLong)
          if (a > peak) peak = a
          sumSq += s.toLong * s
          // zero crossing = strict sign change between consecutive
          // samples; a zero sample carries the previous sign forward
          if (i > 0 && s * prev < 0) zc += 1
          if (s != 0) prev = s
          i += 1
        }
        val rms = if (n > 0) math.sqrt(sumSq.toDouble / n) else 0.0
        AudioFeatures(m.doc_id, n, peak, sumSq, zc, rms)
      } catch {
        // same NonFatal seam as decodeRealPartition: one corrupt WAV
        // degrades to a filterable sentinel, never a task kill
        case scala.util.control.NonFatal(_) =>
          AudioFeatures(m.doc_id, 0, -1L, -1L, -1, -1.0)
      }
    }

  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(audioFeaturesPartition _)
  }

  def audioFeaturesQuery(spark: SparkSession, dir: String): DataFrame =
    audioFeatures(audioTable(spark, dir)).toDF().orderBy("doc_id")

  /** Closed-form oracle: a square wave of amplitude a over n samples
    * has peak a, energy n·a², ⌊(n−1)/p⌋ sign flips, and RMS exactly a
    * (√(n·a²/n) — a² is integer-exact in a double, so IEEE sqrt
    * returns a bit-exactly in both engines). */
  val audioFeaturesSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(800 + doc_id % 160 AS BIGINT) AS n,
      |    CAST(100 + doc_id % 900 AS BIGINT) AS amp,
      |    CAST(2 + doc_id % 7 AS BIGINT) AS hp
      |  FROM documents WHERE doc_id % 3 = 2)
      |SELECT doc_id, CAST(n AS INT) AS n_samples,
      |  amp AS peak,
      |  n * amp * amp AS sum_sq,
      |  CAST((n - 1) // hp AS INT) AS zero_crossings,
      |  sqrt(CAST(n * amp * amp AS DOUBLE) / n) AS rms
      |FROM m ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // mm_image_features — REAL image feature extraction: min/max/sum of
  // the red channel, mean brightness, and a horizontal edge count, by
  // genuinely decoding PNGs and scanning their pixels. Where mm_decode
  // round-trips SOLID images (one value repeated — a pixel-position bug
  // would pass), this corpus is horizontal GRADIENTS: red(x) =
  // x·255 div (w−1), different at every column, so the features only
  // match the oracle if the encode→decode round-trip preserved every
  // pixel's VALUE AND POSITION. The edge count is the number of
  // adjacent-column value steps times the height — the first-pass
  // saliency stat a vision pipeline computes before spending model
  // time on an image. Same narrow mapPartitions codec seam: no
  // shuffle, one partition of media bytes in memory at a time.
  // ---------------------------------------------------------------------
  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      min_red: Int, max_red: Int, sum_red: Long, n_edges: Int,
      mean_red: Double)

  private def gradientPngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = x * 255 / (w - 1)
        img.setRGB(x, y, (r << 16) | (r << 8) | r)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Gradient PNGs, deterministic per doc_id (the doc_id % 3 == 0
    * third, the same slot realMediaTable gives images): w = 8+id%16,
    * h = 8+id%8, red ramping 0→255 left to right. */
  def gradientTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map(id => MediaRow(id, "image",
          gradientPngBytes(8 + (id % 16).toInt, 8 + (id % 8).toInt)))
      }
  }

  private def imageFeaturesPartition(rows: Iterator[MediaRow]): Iterator[ImageFeatures] = {
    javax.imageio.ImageIO.setUseCache(false)
    rows.map { m =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
        if (img == null) ImageFeatures(m.doc_id, 0, 0, -1, -1, -1L, -1, -1.0)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var minR = 255; var maxR = 0; var sum = 0L; var edges = 0
          var y = 0
          while (y < h) {
            var x = 0
            var prev = -1
            while (x < w) {
              val r = (img.getRGB(x, y) >> 16) & 0xff
              if (r < minR) minR = r
              if (r > maxR) maxR = r
              sum += r
              if (x > 0 && r != prev) edges += 1
              prev = r
              x += 1
            }
            y += 1
          }
          ImageFeatures(m.doc_id, w, h, minR, maxR, sum, edges,
            sum.toDouble / (w.toLong * h))
        }
      } catch {
        // same NonFatal seam as decodeRealPartition: one corrupt PNG
        // degrades to a filterable sentinel, never a task kill
        case scala.util.control.NonFatal(_) =>
          ImageFeatures(m.doc_id, 0, 0, -1, -1, -1L, -1, -1.0)
      }
    }
  }

  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(imageFeaturesPartition _)
  }

  def imageFeaturesQuery(spark: SparkSession, dir: String): DataFrame =
    imageFeatures(gradientTable(spark, dir)).toDF().orderBy("doc_id")

  /** The oracle recomputes per-column ramp values from the generation
    * rule with list arithmetic — every cell is a pure function of
    * doc_id, independent of the codec path under test. */
  val imageFeaturesSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(8 + doc_id % 16 AS INT) AS w,
      |    CAST(8 + doc_id % 8 AS INT) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |g AS (
      |  SELECT doc_id, w, h,
      |    list_transform(range(0, w), x -> x * 255 // (w - 1)) AS reds
      |  FROM m)
      |SELECT doc_id, w AS width, h AS height,
      |  CAST(list_min(reds) AS INT) AS min_red,
      |  CAST(list_max(reds) AS INT) AS max_red,
      |  CAST(list_sum(reds) * h AS BIGINT) AS sum_red,
      |  CAST(len(list_filter(range(1, w),
      |    x -> x * 255 // (w - 1) <> (x - 1) * 255 // (w - 1))) * h AS INT)
      |    AS n_edges,
      |  CAST(list_sum(reds) * h AS DOUBLE) / (w * h) AS mean_red
      |FROM g ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // mm_image_resize — REAL thumbnail materialization: decode the
  // gradient PNGs, nearest-neighbor resample into the aspect-
  // preserving 6×6 clamp box ([[resizePlan]]'s exact integer formula,
  // here with pixels actually moved), RE-ENCODE the thumbnail to PNG,
  // decode it again, and report the re-decoded features. This is the
  // standard vision-pipeline pre-step (downsample before embedding)
  // and the re-encode leg is what makes it honest: the reported sums
  // come from bytes that survived a second codec round-trip, so a
  // resampling bug (wrong source pixel, off-by-one in the scale map)
  // cannot hide. Because source pixels are the deterministic gradient,
  // every output cell is a closed-form function of doc_id — exact
  // DuckDB oracle. Same narrow mapPartitions codec seam: no shuffle.
  // ---------------------------------------------------------------------
  private[graft] val resizeBox = 6

  case class ResizedImage(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, sum_red: Long, mean_red: Double)

  /** Red-channel pixel sum — the one scan loop shared by the real
    * decode, and the resize round-trip. */
  private def sumRed(img: java.awt.image.BufferedImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { sum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
      y += 1
    }
    sum
  }

  private def resizePartition(rows: Iterator[MediaRow]): Iterator[ResizedImage] = {
    javax.imageio.ImageIO.setUseCache(false)
    val bad = (id: Long) => ResizedImage(id, 0, 0, -1, -1, -1L, -1.0)
    rows.map { m =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
        if (img == null) bad(m.doc_id)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          // resizePlan's clamp: scaleNum = min(maxW·h, maxH·w); the
          // gradient corpus is always larger than the box, so the
          // pass-through branch never applies here
          val scaleNum = math.min(resizeBox * h, resizeBox * w)
          val ow = math.max(1, scaleNum / h)
          val oh = math.max(1, scaleNum / w)
          val out = new java.awt.image.BufferedImage(
            ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              out.setRGB(x, y, img.getRGB(x * w / ow, y * h / oh))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          // same explicit guard as the first decode: a writer-less
          // re-encode must degrade to the sentinel, not rely on a
          // caught NPE
          if (back == null) bad(m.doc_id)
          else {
            val sum = sumRed(back)
            ResizedImage(m.doc_id, w, h, ow, oh, sum,
              sum.toDouble / (ow.toLong * oh))
          }
        }
      } catch {
        case scala.util.control.NonFatal(_) => bad(m.doc_id)
      }
    }
  }

  def imageResize(media: Dataset[MediaRow]): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(resizePartition _)
  }

  def imageResizeQuery(spark: SparkSession, dir: String): DataFrame =
    imageResize(gradientTable(spark, dir)).toDF().orderBy("doc_id")

  /** The oracle re-derives the thumbnail arithmetic from the
    * generation rule: out dims from the clamp formula, each resized
    * column's red from the nearest-neighbor source column, summed over
    * out_h identical rows. */
  val imageResizeSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(8 + doc_id % 16 AS INT) AS w,
       |    CAST(8 + doc_id % 8 AS INT) AS h
       |  FROM documents WHERE doc_id % 3 = 0),
       |d AS (
       |  SELECT doc_id, w, h,
       |    greatest(1, least($resizeBox * h, $resizeBox * w) // h) AS ow,
       |    greatest(1, least($resizeBox * h, $resizeBox * w) // w) AS oh
       |  FROM m),
       |s AS (
       |  SELECT doc_id, w, h, ow, oh,
       |    list_sum(list_transform(range(0, ow),
       |      x -> ((x * w) // ow) * 255 // (w - 1))) AS row_sum
       |  FROM d)
       |SELECT doc_id, w AS width, h AS height,
       |  CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
       |  CAST(row_sum * oh AS BIGINT) AS sum_red,
       |  CAST(row_sum * oh AS DOUBLE) / (ow * oh) AS mean_red
       |FROM s ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // mm_video_frames — REAL per-frame video decode: parse the
  // multi-frame GIFs (the %3==2 third) and emit one row per stored
  // frame with its full-frame mean red. The corpus is a TEMPORAL
  // gradient (frame k solid k·255//(n−1)), so a decoder that returns
  // the wrong frame for an index, composites frames, or miscounts
  // them cannot match — the per-frame analog of what mm_image_features
  // pins spatially. Same narrow mapPartitions codec seam: no shuffle,
  // output scales with docs × frames (≤ 7), never payload size.
  // ---------------------------------------------------------------------
  case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, n_frames: Int, red: Long)

  private def videoFramesPartition(rows: Iterator[MediaRow]): Iterator[VideoFrame] = {
    javax.imageio.ImageIO.setUseCache(false)
    rows.flatMap { m =>
      try {
        gifFrames(m.payload) match {
          case Some((w, h, means)) =>
            means.iterator.zipWithIndex.map { case (mean, k) =>
              VideoFrame(m.doc_id, k, w, h, means.length, mean)
            }
          // undecodable payloads degrade to one sentinel row, the
          // same filterable-marker invariant as the other codec tiers
          case None => Iterator.single(VideoFrame(m.doc_id, -1, 0, 0, 0, -1L))
        }
      } catch {
        case scala.util.control.NonFatal(_) =>
          Iterator.single(VideoFrame(m.doc_id, -1, 0, 0, 0, -1L))
      }
    }
  }

  /** The %3==2 third as encoded GIFs — the same generation the
    * mm_decode video branch reads. */
  def videoTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val (w, h, n) = videoDims(id)
          MediaRow(id, "video", gifBytes(w, h, n))
        }
      }
  }

  def videoFramesQuery(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    videoTable(spark, dir).mapPartitions(videoFramesPartition _)
      .toDF().orderBy("doc_id", "frame_idx")
  }

  /** The oracle re-derives every frame of the temporal gradient from
    * the generation rule — pure doc_id arithmetic, independent of the
    * codec path under test. */
  val videoFramesSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(4 + doc_id % 8 AS INT) AS w,
      |    CAST(5 + doc_id % 4 AS INT) AS h,
      |    CAST(2 + doc_id % 6 AS BIGINT) AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |f AS (SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS k FROM m)
      |SELECT doc_id, CAST(k AS INT) AS frame_idx, w AS width, h AS height,
      |  CAST(nf AS INT) AS n_frames,
      |  CAST(k * 255 // (nf - 1) AS BIGINT) AS red
      |FROM f ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_video_frames"    -> (videoFramesQuery _),
    "mm_image_resize"    -> (imageResizeQuery _),
    "mm_binary_meta"     -> (binaryMeta _),
    "mm_decode_stub"     -> (decodeStub _),
    "mm_decode"          -> (realDecodeQuery _),
    "mm_frame_sample"    -> (frameSampleQuery _),
    "mm_audio_features"  -> (audioFeaturesQuery _),
    "mm_image_features"  -> (imageFeaturesQuery _))

  val oracles: Map[String, String] = Map(
    "mm_video_frames"    -> videoFramesSql,
    "mm_binary_meta"     -> binaryMetaSql,
    "mm_decode"          -> realDecodeSql,
    "mm_frame_sample"    -> frameSampleSql,
    "mm_audio_features"  -> audioFeaturesSql,
    "mm_image_features"  -> imageFeaturesSql,
    "mm_image_resize"    -> imageResizeSql)
}
