package graft.multimodal

/** Pure-JVM video CONTAINER metadata — the part of the video gap that
  * needs no codec: MP4 (ISO BMFF box walk: `moov`/`mvhd` for
  * timescale+duration, `trak`/`tkhd` for the first visual track's
  * 16.16-fixed dimensions) and WebM/Matroska (EBML walk:
  * `Segment`→`Info` for TimestampScale+Duration,
  * `Tracks`→`TrackEntry`→`Video` for PixelWidth/PixelHeight). FRAME
  * decode still requires codecs the JDK lacks and stays the labeled
  * [[Multimodal.decodeStub]] fallback — this parser upgrades
  * inspection (format, dimensions, duration) from stub to real, the
  * same per-container discipline as [[ImageHeader]]: bounds-checked
  * Long cursors (crafted sizes must not wrap), None instead of throw
  * for anything malformed or truncated. */
object VideoHeader {

  /** `durationMs` is -1 when the container carries no duration. */
  final case class VideoMeta(format: String, width: Int, height: Int,
                             durationMs: Long)

  def parse(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes == null || bytes.length < 12) None
    else if (isMp4(bytes)) parseMp4(bytes)
    else if (isEbml(bytes)) parseWebm(bytes)
    else None
  }

  private def u8(b: Array[Byte], i: Long): Int = b(i.toInt) & 0xff
  private def be32(b: Array[Byte], i: Long): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) |
      u8(b, i + 3)
  private def be64(b: Array[Byte], i: Long): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  // ---------------------------------------------------------------- MP4

  private def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** Walk the sibling boxes of [from, to), returning the content range
    * of the first box named `name`. Box header: size u32 + 4cc; size 1
    * means a u64 largesize follows; size 0 means to-end. */
  private def findBox(b: Array[Byte], from: Long, to: Long,
                      name: String): Option[(Long, Long)] = {
    var i = from
    while (i + 8 <= to) {
      val size32 = be32(b, i)
      val tag = new String(b, i.toInt + 4, 4, "US-ASCII")
      val (contentStart, boxEnd) =
        if (size32 == 1) {
          if (i + 16 > to) return None
          (i + 16, i + be64(b, i + 8))
        } else if (size32 == 0) (i + 8, to)
        else (i + 8, i + size32)
      if (boxEnd < contentStart || boxEnd > to) return None // malformed
      if (tag == name) return Some((contentStart, boxEnd))
      i = boxEnd
    }
    None
  }

  private def parseMp4(b: Array[Byte]): Option[VideoMeta] = {
    val n = b.length.toLong
    val moov = findBox(b, 0, n, "moov").getOrElse(return None)
    // duration: mvhd timescale + duration (version-dependent layout)
    val durationMs = findBox(b, moov._1, moov._2, "mvhd").flatMap {
      case (s, e) =>
        if (e - s < 4) None
        else {
          // ISO-BMFF "unknown duration" sentinel is all-ones
          // (0xFFFFFFFF / 2^64-1) → report -1, never a huge fake
          // duration; and a crafted 64-bit duration must not overflow
          // the *1000 — bounds-check and report -1 (crafted-input
          // hardening: this parser never throws, never fabricates)
          def ms(duration: Long, timescale: Long): Option[Long] =
            if (timescale <= 0 || duration < 0 ||
              duration > Long.MaxValue / 1000L) None
            else Some(duration * 1000L / timescale)
          val version = u8(b, s)
          if (version == 0 && e - s >= 24) {
            val timescale = be32(b, s + 12)
            val duration = be32(b, s + 16)
            if (duration == 0xFFFFFFFFL) None else ms(duration, timescale)
          } else if (version == 1 && e - s >= 32) {
            val timescale = be32(b, s + 20)
            val duration = be64(b, s + 24)
            if (duration == -1L) None else ms(duration, timescale)
          } else None
        }
    }.getOrElse(-1L)
    // dimensions: first trak whose tkhd declares a nonzero raster
    var cursor = moov._1
    while (cursor < moov._2) {
      findBox(b, cursor, moov._2, "trak") match {
        case None => cursor = moov._2
        case Some((ts, te)) =>
          findBox(b, ts, te, "tkhd").foreach { case (s, e) =>
            val version = u8(b, s)
            val off = if (version == 1) 88L else 76L
            if (e - s >= off + 8) {
              val w = (be32(b, s + off) >> 16).toInt // 16.16 fixed
              val h = (be32(b, s + off + 4) >> 16).toInt
              if (w > 0 && h > 0)
                return Some(VideoMeta("mp4", w, h, durationMs))
            }
          }
          cursor = te
      }
    }
    Some(VideoMeta("mp4", 0, 0, durationMs))
  }

  // --------------------------------------------------------- WebM/EBML

  private def isEbml(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b, 0) == 0x1a && u8(b, 1) == 0x45 &&
      u8(b, 2) == 0xdf && u8(b, 3) == 0xa3

  /** EBML element id at `i`: returned with its marker bits (the id
    * compares as its full byte sequence), plus its byte length. */
  private def readId(b: Array[Byte], i: Long, to: Long): Option[(Long, Int)] = {
    if (i >= to) return None
    val first = u8(b, i)
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len < 1 || len > 4 || i + len > to) return None
    var v = 0L
    var k = 0
    while (k < len) { v = (v << 8) | u8(b, i + k); k += 1 }
    Some((v, len))
  }

  /** EBML size vint at `i`: value without the marker bit; all-ones
    * payload means UNKNOWN size (stream to container end). */
  private def readSize(b: Array[Byte], i: Long,
                       to: Long): Option[(Long, Int, Boolean)] = {
    if (i >= to) return None
    val first = u8(b, i)
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len < 1 || len > 8 || i + len > to) return None
    var v = (first & (0xff >>> len)).toLong
    var k = 1
    while (k < len) { v = (v << 8) | u8(b, i + k); k += 1 }
    val unknown = v == (1L << (7 * len)) - 1
    Some((v, len, unknown))
  }

  /** Content range of the first child element with `id` among the
    * siblings of [from, to). */
  private def findEbml(b: Array[Byte], from: Long, to: Long,
                       id: Long): Option[(Long, Long)] = {
    var i = from
    while (i < to) {
      val (eid, idLen) = readId(b, i, to).getOrElse(return None)
      val (sz, szLen, unknown) =
        readSize(b, i + idLen, to).getOrElse(return None)
      val start = i + idLen + szLen
      val end = if (unknown) to else start + sz
      if (end < start || end > to) return None
      if (eid == id) return Some((start, end))
      i = end
    }
    None
  }

  private def ebmlUint(b: Array[Byte], s: Long, e: Long): Long = {
    var v = 0L
    var i = s
    while (i < e) { v = (v << 8) | u8(b, i); i += 1 }
    v
  }

  private def ebmlFloat(b: Array[Byte], s: Long, e: Long): Option[Double] =
    (e - s) match {
      case 4 => Some(java.lang.Float.intBitsToFloat(be32(b, s).toInt).toDouble)
      case 8 => Some(java.lang.Double.longBitsToDouble(be64(b, s)))
      case _ => None
    }

  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val SegDuration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val VideoEl = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL

  private def parseWebm(b: Array[Byte]): Option[VideoMeta] = {
    val n = b.length.toLong
    val seg = findEbml(b, 0, n, Segment).getOrElse(return None)
    val durationMs = findEbml(b, seg._1, seg._2, Info).flatMap {
      case (is, ie) =>
        // TimestampScale default: 1e6 ns per tick; Duration is in ticks
        val scaleNs = findEbml(b, is, ie, TimestampScale)
          .map { case (s, e) => ebmlUint(b, s, e) }.getOrElse(1000000L)
        findEbml(b, is, ie, SegDuration)
          .flatMap { case (s, e) => ebmlFloat(b, s, e) }
          .map(ticks => (ticks * scaleNs / 1e6).toLong)
    }.getOrElse(-1L)
    // first TrackEntry carrying a Video element
    val dims = findEbml(b, seg._1, seg._2, Tracks).flatMap { case (ts, te) =>
      var i = ts
      var found: Option[(Int, Int)] = None
      while (found.isEmpty && i < te) {
        val (eid, idLen) = readId(b, i, te).getOrElse(return None)
        val (sz, szLen, unknown) =
          readSize(b, i + idLen, te).getOrElse(return None)
        val start = i + idLen + szLen
        val end = if (unknown) te else start + sz
        if (end < start || end > te) return None
        if (eid == TrackEntry) {
          findEbml(b, start, end, VideoEl).foreach { case (vs, ve) =>
            for {
              (ws, we) <- findEbml(b, vs, ve, PixelWidth)
              (hs, he) <- findEbml(b, vs, ve, PixelHeight)
            } {
              val w = ebmlUint(b, ws, we).toInt
              val h = ebmlUint(b, hs, he).toInt
              if (w > 0 && h > 0) found = Some((w, h))
            }
          }
        }
        i = end
      }
      found
    }
    val (w, h) = dims.getOrElse((0, 0))
    Some(VideoMeta("webm", w, h, durationMs))
  }
}
