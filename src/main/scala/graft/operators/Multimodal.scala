package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and a decode/feature-extract stage.
  *
  * The Spark-side plumbing is real — schema, per-partition batch
  * iteration, typed output — but the actual byte decoding is STUBBED
  * with a deterministic fake (this container ships no image/audio
  * codecs): see [[decodePartition]], the single function a real
  * deployment swaps for a JNI/codec call. This mirrors how a Python
  * pipeline would run decode under `mapInPandas`: Spark streams each
  * partition through a narrow, no-shuffle map stage, so at 100 TB the
  * stage scales with input splits and never materializes more than a
  * partition of media bytes at once.
  */
object Multimodal {

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

  /** STUB decode: a real implementation would hand `bytes` to an image
    * or audio codec here; we derive deterministic fake dimensions from
    * the payload so the distributed plumbing is fully testable. */
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
  def frameSample(decoded: Dataset[DecodedMedia], maxFrames: Int = 4): Dataset[FrameRef] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.flatMap { d =>
      val take = math.min(maxFrames, d.n_frames)
      val stride = math.max(1, d.n_frames / math.max(take, 1))
      (0 until take).map { i =>
        val idx = i * stride
        FrameRef(d.doc_id, idx, idx * 40L, // 25fps → 40ms/frame
          (d.checksum * 31 + idx) % 1000000007L)
      }
    }
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

  def frameSampleQuery(spark: SparkSession, dir: String): DataFrame =
    frameSample(decode(mediaTable(spark, dir))).toDF().orderBy("doc_id", "frame_idx")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta"  -> (binaryMeta _),
    "mm_decode_stub"  -> (decodeStub _),
    "mm_frame_sample" -> (frameSampleQuery _))

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" -> binaryMetaSql)
}
