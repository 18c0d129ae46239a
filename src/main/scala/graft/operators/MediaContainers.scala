package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Container-layer metadata for the video formats whose CODEC layer
  * the JDK cannot decode (MP4/H.264, MKV) — r15 ask #6: the container
  * framing is plain byte structure (ISO BMFF boxes; EBML elements), so
  * duration, track count, and video dimensions are parseable in pure
  * JVM with no native libs, shrinking `mm_decode_stub`'s documented
  * stub scope to codec PAYLOADS only.
  *
  * Reference anchor: the reference pipeline has no media surface at
  * all (548 LoC of PySpark/SQL retail ETL); this operator belongs to
  * the training-data-pipeline tier the brief adds on top. Same design
  * rules as the rest of the multimodal family (`Multimodal.scala`):
  * payload synthesis and parsing run in the narrow `mapPartitions`
  * codec seam (imperative per-record byte work is exactly what that
  * seam is for), everything around it stays declarative, no shuffle is
  * introduced, and every output cell is a closed-form function of
  * doc_id so the query carries an exact DuckDB oracle.
  *
  * The writer and the parser are deliberately asymmetric: the writer
  * emits one fixed layout, but the parser walks the actual byte
  * grammar — MP4 boxes by (size, fourcc) with unknown boxes skipped
  * and 64-bit largesize handled; EBML elements by variable-length
  * ID/size vints with unknown IDs skipped — so it also reads
  * foreign-written files with extra boxes or different child order
  * (MediaContainersSpec pins that with a hand-built variant layout).
  *
  * At 100 TB this stage is embarrassingly parallel: bytes in, one
  * metadata row out, no exchange; partition sizing is governed by the
  * same `files.maxPartitionBytes` math as every other scan.
  */
object MediaContainers {

  /** Parsed container metadata. Sentinel row for unparseable bytes:
    * duration_ms = -1 (same convention as Multimodal's `undecodable` —
    * one corrupt record must degrade to a filterable marker, never
    * kill the stage). */
  case class ContainerMeta(doc_id: Long, container: String,
      duration_ms: Long, n_tracks: Int, width: Int, height: Int)

  // ------------------------------------------------------------------
  // Generation rule (closed-form per doc_id, mirrored by the oracle):
  // even ids carry MP4, odd ids MKV; 1-3 tracks (track 1 video, rest
  // audio); millisecond duration and video dims derived from id.
  // ------------------------------------------------------------------
  private[graft] def ruleDurationMs(id: Long): Long = 1000L + id % 9000
  private[graft] def ruleTracks(id: Long): Int = (1 + id % 3).toInt
  private[graft] def ruleWidth(id: Long): Int = (160 + id % 512).toInt
  private[graft] def ruleHeight(id: Long): Int = (120 + id % 256).toInt

  // ------------------------------------------------------------------
  // MP4 (ISO BMFF) writer: ftyp + moov(mvhd + trak(tkhd)...) + mdat.
  // Box = u32 size (incl. header) + fourcc + payload. mvhd v0 carries
  // (timescale, duration); tkhd v0 carries track id, duration, and
  // 16.16 fixed-point width/height on video tracks.
  // ------------------------------------------------------------------
  private val Mp4Timescale = 1000 // units == milliseconds

  private def u32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(fourcc: String, payload: Array[Byte]): Array[Byte] =
    u32(8L + payload.length) ++ fourcc.getBytes("US-ASCII") ++ payload

  /** Identity transform matrix, as mvhd/tkhd specify it. */
  private def unityMatrix: Array[Byte] =
    u32(0x00010000L) ++ u32(0) ++ u32(0) ++
      u32(0) ++ u32(0x00010000L) ++ u32(0) ++
      u32(0) ++ u32(0) ++ u32(0x40000000L)

  private def mvhd(durationUnits: Long, nextTrackId: Int): Array[Byte] = box("mvhd",
    u32(0) ++                       // version 0 + flags
      u32(0) ++ u32(0) ++           // creation, modification
      u32(Mp4Timescale.toLong) ++ u32(durationUnits) ++
      u32(0x00010000L) ++           // rate 1.0
      u16(0x0100) ++ u16(0) ++      // volume 1.0, reserved
      u32(0) ++ u32(0) ++           // reserved
      unityMatrix ++
      Array.fill(24)(0.toByte) ++   // pre_defined
      u32(nextTrackId.toLong))

  private def tkhd(trackId: Int, durationUnits: Long, w: Int, h: Int): Array[Byte] =
    box("tkhd",
      u32(7) ++                     // version 0 + flags (enabled|in movie|in preview)
        u32(0) ++ u32(0) ++         // creation, modification
        u32(trackId.toLong) ++ u32(0) ++
        u32(durationUnits) ++
        u32(0) ++ u32(0) ++         // reserved
        u16(0) ++ u16(0) ++         // layer, alternate_group
        u16(if (w == 0) 0x0100 else 0) ++ u16(0) ++ // volume (audio), reserved
        unityMatrix ++
        u32(w.toLong << 16) ++ u32(h.toLong << 16)) // 16.16 fixed

  private[graft] def mp4Bytes(id: Long): Array[Byte] = {
    val dur = ruleDurationMs(id) // timescale 1000 -> units are ms
    val tracks = (1 to ruleTracks(id)).map { t =>
      val (w, h) = if (t == 1) (ruleWidth(id), ruleHeight(id)) else (0, 0)
      box("trak", tkhd(t, dur, w, h))
    }
    val moov = box("moov", mvhd(dur, ruleTracks(id) + 1) ++ tracks.flatten.toArray)
    box("ftyp", "isom".getBytes("US-ASCII") ++ u32(0) ++
      "isom".getBytes("US-ASCII") ++ "mp41".getBytes("US-ASCII")) ++
      moov ++
      box("mdat", Array[Byte](0x21, (id % 251).toByte)) // stub codec payload
  }

  // ------------------------------------------------------------------
  // MP4 parser: generic box walk. Reads (size, fourcc) at each level,
  // skips unknown boxes, handles size==1 (64-bit largesize) and
  // size==0 (to end-of-enclosure); descends only into moov/trak.
  // ------------------------------------------------------------------
  private def readU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def readU64(b: Array[Byte], off: Int): Long =
    (readU32(b, off) << 32) | readU32(b, off + 4)

  /** Iterate (fourcc, payloadStart, payloadEnd) over the boxes in
    * b[start, end). Malformed sizes terminate the walk (the caller
    * degrades to the sentinel row on missing required boxes). */
  private def boxes(b: Array[Byte], start: Int, end: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var off = start
      def hasNext: Boolean = off + 8 <= end
      def next(): (String, Int, Int) = {
        val size32 = readU32(b, off)
        val fourcc = new String(b, off + 4, 4, "US-ASCII")
        val (payloadStart, boxEnd): (Long, Long) =
          if (size32 == 1 && off + 16 <= end) (off + 16L, off + readU64(b, off + 8))
          else if (size32 == 0) (off + 8L, end.toLong)
          else (off + 8L, off + size32)
        if (boxEnd < payloadStart || boxEnd > end) { off = end; ("", end, end) }
        else {
          off = boxEnd.toInt
          (fourcc, payloadStart.toInt, boxEnd.toInt)
        }
      }
    }

  private[graft] def parseMp4(id: Long, b: Array[Byte]): ContainerMeta = {
    var durationMs = -1L
    var nTracks = 0
    var width = 0
    var height = 0
    boxes(b, 0, b.length).foreach {
      case ("moov", ms, me) =>
        boxes(b, ms, me).foreach {
          // a box's SIZE field can be self-consistent while its payload
          // is too short for the fields this parser reads — every fixed
          // offset is bounds-checked against the payload end so a
          // foreign/corrupt leaf degrades to the sentinel instead of
          // throwing out of the stage
          case ("mvhd", ps, pe) if pe - ps >= 1 =>
            val version = b(ps) & 0xff
            val (ts, dur) =
              if (version == 1 && pe - ps >= 32)
                (readU32(b, ps + 20), readU64(b, ps + 24))
              else if (version == 0 && pe - ps >= 20)
                (readU32(b, ps + 12), readU32(b, ps + 16))
              else (0L, 0L)
            if (ts > 0) durationMs = dur * 1000L / ts
          case ("trak", ts0, te) =>
            nTracks += 1
            boxes(b, ts0, te).foreach {
              case ("tkhd", ps, pe) if pe - ps >= 8 =>
                // width/height are the LAST 8 payload bytes in both
                // tkhd versions (16.16 fixed point)
                val w = (readU32(b, pe - 8) >> 16).toInt
                val h = (readU32(b, pe - 4) >> 16).toInt
                if (w > 0 && h > 0) { width = w; height = h }
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    if (durationMs < 0 || nTracks == 0)
      ContainerMeta(id, "mp4", -1, 0, 0, 0)
    else ContainerMeta(id, "mp4", durationMs, nTracks, width, height)
  }

  // ------------------------------------------------------------------
  // MKV (EBML) writer: EBML header (DocType matroska) + Segment
  // containing Info (TimestampScale, Duration) and Tracks
  // (TrackEntry* with TrackType and, for video, PixelWidth/Height).
  // Element = vint ID (marker bits kept) + vint size + payload.
  // ------------------------------------------------------------------
  private def vintSize(v: Long): Array[Byte] = {
    // encode a size in the fewest octets; marker bit in the first
    require(v >= 0 && v < (1L << 56), s"size out of vint range: $v")
    var n = 1
    while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1
    val out = new Array[Byte](n)
    var rest = v | (1L << (7 * n)) // marker
    var i = n - 1
    while (i >= 0) { out(i) = (rest & 0xff).toByte; rest >>= 8; i -= 1 }
    out
  }

  private def ebmlId(idBytes: Long): Array[Byte] = {
    // IDs are written verbatim (marker bits already in the constant)
    val n = if (idBytes <= 0xff) 1 else if (idBytes <= 0xffff) 2
      else if (idBytes <= 0xffffff) 3 else 4
    (0 until n).map(i => ((idBytes >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  }

  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlId(id) ++ vintSize(payload.length.toLong) ++ payload

  private def uintPayload(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && v >= (1L << (8 * n))) n += 1
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  }

  private def doublePayload(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    (0 until 8).map(i => ((bits >> (8 * (7 - i))) & 0xff).toByte).toArray
  }

  // EBML / Matroska element IDs (public spec constants)
  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdDocTypeVersion = 0x4287L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackType = 0x83L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL

  private[graft] def mkvBytes(id: Long): Array[Byte] = {
    val header = el(IdEbml,
      el(IdDocType, "matroska".getBytes("US-ASCII")) ++
        el(IdDocTypeVersion, uintPayload(4)))
    // TimestampScale 1e6 ns/tick -> Duration ticks are milliseconds
    val info = el(IdInfo,
      el(IdTimestampScale, uintPayload(1000000L)) ++
        el(IdDuration, doublePayload(ruleDurationMs(id).toDouble)))
    val entries = (1 to ruleTracks(id)).map { t =>
      val base = el(IdTrackNumber, uintPayload(t.toLong)) ++
        el(IdTrackType, uintPayload(if (t == 1) 1L else 2L))
      val video =
        if (t == 1) el(IdVideo,
          el(IdPixelWidth, uintPayload(ruleWidth(id).toLong)) ++
            el(IdPixelHeight, uintPayload(ruleHeight(id).toLong)))
        else Array.empty[Byte]
      el(IdTrackEntry, base ++ video)
    }
    val tracks = el(IdTracks, entries.flatten.toArray)
    header ++ el(IdSegment, info ++ tracks)
  }

  // ------------------------------------------------------------------
  // EBML parser: generic vint walk — reads (id, size) per element,
  // recurses into the master elements it knows, skips everything else.
  // ------------------------------------------------------------------
  /** Read a vint at `off`: (value, nOctets); `keepMarker` for IDs.
    * Returns None on truncation. A size vint of all value-bits-ones is
    * the spec's reserved "unknown size" (live/streaming muxers write
    * Segment this way) — reported as value -1 so [[elements]] can treat
    * the element as extending to the end of its enclosing scope. */
  private def readVint(b: Array[Byte], off: Int, end: Int,
      keepMarker: Boolean): Option[(Long, Int)] = {
    if (off >= end) return None
    val first = b(off) & 0xff
    if (first == 0) return None
    val n = Integer.numberOfLeadingZeros(first) - 23 // 1..8
    if (off + n > end) return None
    var v = if (keepMarker) first.toLong else (first & ((1 << (8 - n)) - 1)).toLong
    var i = 1
    while (i < n) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    if (!keepMarker && v == (1L << (7 * n)) - 1) Some((-1L, n))
    else Some((v, n))
  }

  private def elements(b: Array[Byte], start: Int, end: Int): Iterator[(Long, Int, Int)] =
    new Iterator[(Long, Int, Int)] {
      private var off = start
      private var nextEl: Option[(Long, Int, Int)] = advance()
      private def advance(): Option[(Long, Int, Int)] = for {
        (id, idLen) <- readVint(b, off, end, keepMarker = true)
        (size, szLen) <- readVint(b, off + idLen, end, keepMarker = false)
        ps = off + idLen + szLen
        // unknown size (-1): the element runs to the end of the
        // enclosing scope (the only legal reading for an unknown-size
        // master; anything after it belongs to that element anyway)
        pe = if (size == -1L) end.toLong else ps + size
        if pe <= end && pe >= ps
      } yield { off = pe.toInt; (id, ps, pe.toInt) }
      def hasNext: Boolean = nextEl.isDefined
      def next(): (Long, Int, Int) = {
        val r = nextEl.get; nextEl = advance(); r
      }
    }

  /** EBML uints are at most 8 octets; a longer payload (foreign or
    * corrupt writer) would silently fold into an arbitrary overflowed
    * Long here, so callers must bounds-check with [[uintFits]] and
    * route oversized elements to the sentinel path instead. */
  private def readUint(b: Array[Byte], ps: Int, pe: Int): Long =
    (ps until pe).foldLeft(0L)((a, i) => (a << 8) | (b(i) & 0xffL))

  private def uintFits(ps: Int, pe: Int): Boolean = pe - ps <= 8

  private def readFloat(b: Array[Byte], ps: Int, pe: Int): Double = pe - ps match {
    case 4 => java.lang.Float.intBitsToFloat(readUint(b, ps, pe).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(readUint(b, ps, pe))
    case _ => -1.0
  }

  private[graft] def parseMkv(id: Long, b: Array[Byte]): ContainerMeta = {
    var tsScale = 1000000L // spec default
    var durationTicks = -1.0
    var nTracks = 0
    var width = 0
    var height = 0
    var sawHeader = false
    // an oversized (> 8-octet) uint leaf is unparseable, not "roughly
    // this value" — folding it through readUint would yield a plausible
    // but wrong TimestampScale/PixelWidth; route the whole record to
    // the sentinel instead (hostile-input contract)
    var badUint = false
    elements(b, 0, b.length).foreach {
      case (IdEbml, _, _) => sawHeader = true
      case (IdSegment, ss, se) =>
        elements(b, ss, se).foreach {
          case (IdInfo, is, ie) =>
            elements(b, is, ie).foreach {
              case (IdTimestampScale, ps, pe) =>
                if (uintFits(ps, pe)) tsScale = readUint(b, ps, pe)
                else badUint = true
              case (IdDuration, ps, pe)       => durationTicks = readFloat(b, ps, pe)
              case _ => ()
            }
          case (IdTracks, ts0, te) =>
            elements(b, ts0, te).foreach {
              case (IdTrackEntry, es, ee) =>
                nTracks += 1
                elements(b, es, ee).foreach {
                  case (IdVideo, vs, ve) =>
                    elements(b, vs, ve).foreach {
                      case (IdPixelWidth, ps, pe) =>
                        if (uintFits(ps, pe)) width = readUint(b, ps, pe).toInt
                        else badUint = true
                      case (IdPixelHeight, ps, pe) =>
                        if (uintFits(ps, pe)) height = readUint(b, ps, pe).toInt
                        else badUint = true
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    if (!sawHeader || badUint || durationTicks < 0 || nTracks == 0 || tsScale <= 0)
      ContainerMeta(id, "mkv", -1, 0, 0, 0)
    else {
      // ticks × ns/tick → ms (scale 1e6 makes ticks = ms exactly)
      val durationMs = math.round(durationTicks * tsScale / 1e6)
      ContainerMeta(id, "mkv", durationMs, nTracks, width, height)
    }
  }

  // ------------------------------------------------------------------
  // The catalog query: synthesize container bytes per doc (even ids
  // MP4, odd MKV), parse the bytes back, emit the metadata row. One
  // narrow mapPartitions — no shuffle, no UDF registration.
  // ------------------------------------------------------------------
  private[graft] def containerBytes(id: Long): Array[Byte] =
    if (id % 2 == 0) mp4Bytes(id) else mkvBytes(id)

  private[graft] def parseContainer(id: Long, b: Array[Byte]): ContainerMeta = {
    val kind = if (id % 2 == 0) "mp4" else "mkv"
    if (b == null || b.length < 4) ContainerMeta(id, kind, -1, 0, 0, 0)
    else try {
      if (id % 2 == 0) parseMp4(id, b) else parseMkv(id, b)
    } catch {
      // the parse paths bounds-check every read, but the module's
      // contract (one corrupt record degrades to a filterable marker,
      // never kills the stage) must hold even against a byte shape the
      // checks don't anticipate — hostile input is the normal case for
      // container metadata at corpus scale
      case scala.util.control.NonFatal(_) => ContainerMeta(id, kind, -1, 0, 0, 0)
    }
  }

  def containerTable(spark: SparkSession, dir: String): Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => Multimodal.MediaRow(
        id, if (id % 2 == 0) "mp4" else "mkv", containerBytes(id))))
  }

  def containerMetaQuery(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    containerTable(spark, dir)
      .mapPartitions(_.map(m => parseContainer(m.doc_id, m.payload)))
      .toDF().orderBy("doc_id")
  }

  /** The oracle re-derives the generation rule in SQL — independent of
    * both the writer and the parser under test. */
  val containerMetaSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'mkv' END AS container,
      |  CAST(1000 + doc_id % 9000 AS BIGINT) AS duration_ms,
      |  CAST(1 + doc_id % 3 AS INT) AS n_tracks,
      |  CAST(160 + doc_id % 512 AS INT) AS width,
      |  CAST(120 + doc_id % 256 AS INT) AS height
      |FROM documents ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_container_meta" -> (containerMetaQuery _))

  val oracles: Map[String, String] = Map(
    "mm_container_meta" -> containerMetaSql)
}
