package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Video CONTAINER metadata ([[VideoHeader]]): hand-built MP4 boxes and
  * WebM EBML trees with known numbers, adversarial truncation/size-wrap
  * cases, and the unified [[Multimodal.inspectMedia]] surface over a
  * mixed frame. */
class VideoHeaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------ MP4 builders

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(tag: String, content: Array[Byte]): Array[Byte] =
    be32(content.length + 8L) ++ tag.getBytes("US-ASCII") ++ content

  private def mvhdV0(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array.fill[Byte](12)(0) ++ be32(timescale) ++
      be32(duration) ++ Array.fill[Byte](80)(0))

  private def tkhdV0(w: Int, h: Int): Array[Byte] =
    // v0 layout: 76 bytes to the 16.16 width field
    box("tkhd", Array.fill[Byte](76)(0) ++ be32(w.toLong << 16) ++
      be32(h.toLong << 16))

  private def mp4(w: Int, h: Int, timescale: Long,
                  duration: Long): Array[Byte] =
    box("ftyp", "isom".getBytes("US-ASCII") ++ Array.fill[Byte](4)(0)) ++
      box("moov", mvhdV0(timescale, duration) ++ box("trak", tkhdV0(w, h)))

  // ----------------------------------------------------- EBML builders

  private def vintSize(v: Long): Array[Byte] = {
    require(v < (1L << 28) - 1)
    // 4-byte size vint: marker 0x10 in the first byte
    Array((0x10 | ((v >> 24) & 0x0f)).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  }

  private def ebmlId(id: Long): Array[Byte] = {
    val len = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    (0 until len).reverse.map(k => ((id >> (8 * k)) & 0xff).toByte).toArray
  }

  private def el(id: Long, content: Array[Byte]): Array[Byte] =
    ebmlId(id) ++ vintSize(content.length) ++ content

  private def uintEl(id: Long, v: Long): Array[Byte] = {
    val bytes = Iterator.iterate(v)(_ >> 8).takeWhile(_ != 0).map(x =>
      (x & 0xff).toByte).toArray.reverse
    el(id, if (bytes.isEmpty) Array(0.toByte) else bytes)
  }

  private def floatEl(id: Long, v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    el(id, (0 until 8).reverse.map(k => ((bits >> (8 * k)) & 0xff).toByte).toArray)
  }

  private def webm(w: Int, h: Int, durTicks: Double,
                   scaleNs: Long): Array[Byte] = {
    val header = el(0x1A45DFA3L, Array.empty)
    val info = el(0x1549A966L,
      uintEl(0x2AD7B1L, scaleNs) ++ floatEl(0x4489L, durTicks))
    val video = el(0xE0L, uintEl(0xB0L, w) ++ uintEl(0xBAL, h))
    val tracks = el(0x1654AE6BL, el(0xAEL, video))
    header ++ el(0x18538067L, info ++ tracks)
  }

  test("MP4: dimensions from the first visual tkhd, duration from mvhd") {
    val m = VideoHeader.parse(mp4(640, 360, timescale = 600,
      duration = 1800)).get
    assert(m == VideoHeader.VideoMeta("mp4", 640, 360, 3000))
  }

  test("WebM: dimensions from Tracks/Video, duration from Info " +
    "(ticks x TimestampScale)") {
    val m = VideoHeader.parse(webm(320, 240, durTicks = 2500.0,
      scaleNs = 1000000L)).get
    assert(m == VideoHeader.VideoMeta("webm", 320, 240, 2500))
  }

  test("adversarial payloads: garbage, truncation and size wraps yield " +
    "None (or partial metadata), never a throw") {
    assert(VideoHeader.parse(null).isEmpty)
    assert(VideoHeader.parse(Array.fill[Byte](64)(7)).isEmpty)
    val good = mp4(640, 360, 600, 1800)
    // every truncation point must stay total
    (0 until good.length by 7).foreach { cut =>
      VideoHeader.parse(good.take(cut)) // must not throw
    }
    // crafted box size wrapping past the buffer: malformed, not a crash
    val wrapped = good.clone()
    wrapped(0) = 0x7f.toByte // ftyp size becomes enormous
    VideoHeader.parse(wrapped) // must not throw
    // mp4 with no visual track still reports format + duration
    val noTrak = box("ftyp", "isom".getBytes("US-ASCII")) ++
      box("moov", mvhdV0(1000, 5000))
    assert(VideoHeader.parse(noTrak).get ==
      VideoHeader.VideoMeta("mp4", 0, 0, 5000))
  }

  test("mvhd hardening: the all-ones 'unknown duration' sentinel reads " +
    "-1 (v0 and v1), and a crafted v1 duration that would overflow " +
    "*1000 reads -1 instead of a bogus huge number") {
    def be64b(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    def mvhdV1(timescale: Long, duration: Long): Array[Byte] =
      box("mvhd", Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](16)(0) ++
        be32(timescale) ++ be64b(duration) ++ Array.fill[Byte](80)(0))
    def mp4WithMvhd(mvhd: Array[Byte]): Array[Byte] =
      box("ftyp", "isom".getBytes("US-ASCII")) ++
        box("moov", mvhd ++ box("trak", tkhdV0(64, 48)))
    // v0 sentinel: 0xFFFFFFFF
    assert(VideoHeader.parse(mp4WithMvhd(mvhdV0(600, 0xFFFFFFFFL))).get
      .durationMs == -1L)
    // v1 sentinel: 2^64-1 (all bits)
    assert(VideoHeader.parse(mp4WithMvhd(mvhdV1(600, -1L))).get
      .durationMs == -1L)
    // v1 overflow: duration*1000 would wrap
    assert(VideoHeader.parse(
      mp4WithMvhd(mvhdV1(600, Long.MaxValue / 1000L + 1))).get
      .durationMs == -1L)
    // v1 high-bit-set (negative as signed): unknown, not garbage
    assert(VideoHeader.parse(
      mp4WithMvhd(mvhdV1(600, Long.MinValue))).get.durationMs == -1L)
    // v1 sane large duration still reads exactly
    assert(VideoHeader.parse(mp4WithMvhd(mvhdV1(1000, 5000000L))).get
      .durationMs == 5000000L)
  }

  test("inspectMedia: one surface for stills, audio and video " +
    "containers; unrecognized rows keep nulls") {
    val rows = Seq(
      (1L, mp4(640, 360, 600, 1800)),
      (2L, webm(320, 240, 2500.0, 1000000L)),
      (3L, Array.fill[Byte](32)(42)))
      .toDF("media_id", "media")
    val got = Multimodal.inspectMedia(rows, "media", "media_id")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(6))))).toMap
    assert(got(1L) == ((Some("mp4"), Some(640), Some(360), Some(3000L))))
    assert(got(2L) == ((Some("webm"), Some(320), Some(240), Some(2500L))))
    assert(got(3L) == ((None, None, None, None)))
  }
}
