package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaContainers._

/** The MP4/MKV container-metadata operator (`mm_container_meta`): the
  * writer/parser pair must round-trip the generation rule, the parser
  * must read FOREIGN layouts (not just the writer's own byte order —
  * otherwise it would be an echo, not a parser), and corrupt bytes
  * must degrade to the sentinel row. */
class MediaContainersSpec extends AnyFunSuite with SparkSuite {

  test("writer/parser round-trip matches the generation rule for both containers") {
    for (id <- (0L to 40L) ++ Seq(8999L, 9000L, 123456L)) {
      val m = parseContainer(id, containerBytes(id))
      val container = if (id % 2 == 0) "mp4" else "mkv"
      assert(m == ContainerMeta(id, container, ruleDurationMs(id),
        ruleTracks(id), ruleWidth(id), ruleHeight(id)), s"id=$id")
    }
  }

  test("MP4 parser reads a foreign layout: free boxes, trailing skip, moov not first") {
    // hand-assemble a file our writer never emits: free box first,
    // then mdat BEFORE moov (streaming layout), a free box between
    // them, and a trailing skip box
    def u32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def bx(cc: String, p: Array[Byte]): Array[Byte] =
      u32(8L + p.length) ++ cc.getBytes("US-ASCII") ++ p
    val own = mp4Bytes(10L) // 10 -> 2 tracks, video 170x130, 1010 ms
    // extract this writer's moov box (after the fixed 24-byte ftyp)
    val moovLen = ((own(24) & 0xffL) << 24) | ((own(25) & 0xffL) << 16) |
      ((own(26) & 0xffL) << 8) | (own(27) & 0xffL)
    val moov = own.slice(24, 24 + moovLen.toInt)
    val foreign = bx("free", Array[Byte](1, 2, 3)) ++
      bx("mdat", Array.fill(16)(0x55.toByte)) ++
      bx("free", Array.empty[Byte]) ++ moov ++ bx("skip", Array[Byte](9))
    val m = parseMp4(10L, foreign)
    assert(m == ContainerMeta(10L, "mp4", ruleDurationMs(10), ruleTracks(10),
      ruleWidth(10), ruleHeight(10)))
  }

  test("MP4 parser handles 64-bit largesize boxes") {
    def u32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val own = mp4Bytes(4L)
    val moovLen = ((own(24) & 0xffL) << 24) | ((own(25) & 0xffL) << 16) |
      ((own(26) & 0xffL) << 8) | (own(27) & 0xffL)
    val moov = own.slice(24, 24 + moovLen.toInt)
    // rewrap moov's payload in a size==1 box with 64-bit largesize
    val payload = moov.drop(8)
    val large = u32(1) ++ "moov".getBytes("US-ASCII") ++
      u32(0) ++ u32(16L + payload.length) ++ payload
    val m = parseMp4(4L, large)
    assert(m.duration_ms == ruleDurationMs(4) && m.n_tracks == ruleTracks(4))
  }

  test("MKV parser reads a foreign layout: Void elements, reordered children, default scale") {
    // Segment with a Void (0xEC) between children, Tracks BEFORE Info,
    // and NO TimestampScale (spec default 1e6 must apply)
    val own = mkvBytes(7L) // odd -> mkv; 7 -> 2 tracks, 174x127, 1007 ms
    // lift the Info/Tracks payloads out of our own writer's segment,
    // then re-assemble in a different order with Void noise.
    // own = header ++ el(Segment, info ++ tracks); rather than split
    // bytes by hand, rebuild the pieces through the public rule —
    // but with the scale element REMOVED (default applies) the
    // Duration ticks are still ms, so the parse must agree.
    def el(id: Long, p: Array[Byte]): Array[Byte] = {
      val idB =
        if (id <= 0xff) Array((id & 0xff).toByte)
        else if (id <= 0xffff) Array(((id >> 8) & 0xff).toByte, (id & 0xff).toByte)
        else if (id <= 0xffffff) Array(((id >> 16) & 0xff).toByte, ((id >> 8) & 0xff).toByte, (id & 0xff).toByte)
        else Array(((id >> 24) & 0xff).toByte, ((id >> 16) & 0xff).toByte, ((id >> 8) & 0xff).toByte, (id & 0xff).toByte)
      // 2-octet size vint keeps this helper trivially correct for
      // payloads < 16383 bytes
      val size = Array((0x40 | (p.length >> 8)).toByte, (p.length & 0xff).toByte)
      idB ++ size ++ p
    }
    def uint(v: Long): Array[Byte] =
      if (v <= 0xff) Array((v & 0xff).toByte)
      else if (v <= 0xffff) Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      else (0 until 8).map(i => ((v >> (8 * (7 - i))) & 0xff).toByte).toArray.dropWhile(_ == 0)
    def dbl(v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).map(i => ((bits >> (8 * (7 - i))) & 0xff).toByte).toArray
    }
    val header = el(0x1A45DFA3L, el(0x4282L, "matroska".getBytes("US-ASCII")))
    val voidEl = el(0xECL, Array.fill(5)(0.toByte))
    val video = el(0xE0L, el(0xB0L, uint(174)) ++ el(0xBAL, uint(127)))
    // children reordered: TrackType before TrackNumber; Video between
    val t1 = el(0xAEL, el(0x83L, uint(1)) ++ video ++ el(0xD7L, uint(1)))
    val t2 = el(0xAEL, el(0x83L, uint(2)) ++ el(0xD7L, uint(2)))
    val tracks = el(0x1654AE6BL, t1 ++ voidEl ++ t2)
    val info = el(0x1549A966L, el(0x4489L, dbl(1007.0))) // no TimestampScale
    val segment = el(0x18538067L, voidEl ++ tracks ++ voidEl ++ info)
    val m = parseMkv(7L, header ++ segment)
    assert(m == ContainerMeta(7L, "mkv", 1007L, 2, 174, 127))

    // oversized uint leaves (> 8 octets — illegal EBML, seen only from
    // corrupt/hostile writers) must hit the sentinel, not fold through
    // readUint into a plausible-but-wrong overflowed value
    val wideTs = el(0x2AD7B1L, Array.fill(9)(1.toByte)) // 9-byte TimestampScale
    val badInfo = el(0x1549A966L, wideTs ++ el(0x4489L, dbl(1007.0)))
    val badSeg1 = el(0x18538067L, tracks ++ badInfo)
    assert(parseMkv(7L, header ++ badSeg1) == ContainerMeta(7L, "mkv", -1L, 0, 0, 0),
      "9-byte TimestampScale must degrade to the sentinel row")
    val wideVideo = el(0xE0L, el(0xB0L, Array.fill(9)(1.toByte)) ++ el(0xBAL, uint(127)))
    val badTrack = el(0xAEL, el(0x83L, uint(1)) ++ wideVideo ++ el(0xD7L, uint(1)))
    val badSeg2 = el(0x18538067L, el(0x1654AE6BL, badTrack) ++ info)
    assert(parseMkv(7L, header ++ badSeg2) == ContainerMeta(7L, "mkv", -1L, 0, 0, 0),
      "9-byte PixelWidth must degrade to the sentinel row")
  }

  test("corrupt or truncated payloads degrade to the sentinel row, never throw") {
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    assert(parseContainer(2L, garbage).duration_ms == -1L)
    assert(parseContainer(3L, garbage).duration_ms == -1L)
    assert(parseContainer(2L, null).duration_ms == -1L)
    assert(parseContainer(3L, Array.empty[Byte]).duration_ms == -1L)
    // truncated mid-box / mid-element
    assert(parseContainer(2L, containerBytes(2L).take(30)).duration_ms == -1L)
    val mkvCut = containerBytes(3L)
    assert(parseContainer(3L, mkvCut.take(5)).duration_ms == -1L)
    // valid-SIZED but too-short leaf payloads: the box walk succeeds,
    // so only the per-field bounds checks stand between these bytes
    // and an ArrayIndexOutOfBounds killing the stage
    def u32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def bx(cc: String, p: Array[Byte]): Array[Byte] =
      u32(8L + p.length) ++ cc.getBytes("US-ASCII") ++ p
    // mvhd v0 with a 4-byte payload (needs 20); as the LAST box so a
    // missing bounds check reads past the array end
    val shortMvhd = bx("moov", bx("mvhd", Array[Byte](0, 0, 0, 0)))
    assert(parseContainer(2L, shortMvhd).duration_ms == -1L)
    // empty mvhd payload: even the version byte is out of bounds
    val emptyMvhd = bx("moov", bx("mvhd", Array.empty[Byte]))
    assert(parseContainer(2L, emptyMvhd).duration_ms == -1L)
    // mvhd v1 sized for v0: version byte says 32 bytes needed, has 20
    val v1short = bx("moov", bx("mvhd", Array[Byte](1) ++ Array.fill[Byte](19)(0)))
    assert(parseContainer(2L, v1short).duration_ms == -1L)
    // tkhd with a 4-byte payload (width/height read needs >= 8)
    val shortTkhd = bx("moov", bx("trak", bx("tkhd", Array[Byte](1, 2, 3, 4))))
    assert(parseContainer(2L, shortTkhd).duration_ms == -1L)
  }

  test("MKV parser handles an unknown-size Segment (live/streaming muxer layout)") {
    // rewrite our own writer's Segment size vint to the reserved
    // all-ones "unknown size" — the element must be read as extending
    // to the end of the buffer, not skipped
    val own = mkvBytes(7L)
    val headerLen = {
      // header = el(IdEbml, ...): 4-byte id, then a size vint
      val szFirst = own(4) & 0xff
      val szLen = Integer.numberOfLeadingZeros(szFirst) - 23
      val size = (1 until szLen).foldLeft((szFirst & ((1 << (8 - szLen)) - 1)).toLong)(
        (a, i) => (a << 8) | (own(4 + i) & 0xffL))
      4 + szLen + size.toInt
    }
    // segment id is 4 bytes; its size vint starts right after
    val sizeOff = headerLen + 4
    val szLen = Integer.numberOfLeadingZeros(own(sizeOff) & 0xff) - 23
    val unknown = own.clone()
    // all-ones vint of the same length: marker byte 0xFF >> (len-1)
    unknown(sizeOff) = ((0xff >> (szLen - 1)) | (1 << (8 - szLen))).toByte
    (1 until szLen).foreach(i => unknown(sizeOff + i) = 0xff.toByte)
    val m = parseMkv(7L, unknown)
    assert(m == ContainerMeta(7L, "mkv", ruleDurationMs(7), ruleTracks(7),
      ruleWidth(7), ruleHeight(7)))
  }

  test("the catalog query emits one parsed row per document at sf0.001") {
    val df = containerMetaQuery(spark, SF).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == (if (id % 2 == 0) "mp4" else "mkv"))
      assert(r.getLong(2) == ruleDurationMs(id), s"duration for id=$id")
      assert(r.getInt(3) == ruleTracks(id))
      assert(r.getInt(4) == ruleWidth(id))
      assert(r.getInt(5) == ruleHeight(id))
    }
  }
}
