package graft.multimodal

/** Pure-JVM media header parsing: container format + dimensions/sample
  * layout + bit depth straight from the leading bytes, no codec libraries.
  * This is the real metadata-extraction step of a multimodal ingest
  * pipeline — header inspection at 100 TB is exactly this: a few branches
  * over the first bytes of an opaque binary column, no allocation, fully
  * codegen-hostable. Full decode lives in [[Multimodal]]: real pixels via
  * `javax.imageio`, real WAV-PCM samples via [[Multimodal.decodeWav]],
  * byte-hash stubs only for the video codecs this container lacks.
  *
  * Formats: PNG (IHDR), GIF87a/89a (logical screen descriptor), BMP
  * (BITMAPINFOHEADER), JPEG (SOF0-SOF15 marker scan), WAV (RIFF fmt
  * chunk — width carries sample rate, height channel count). Anything
  * else → None.
  */
object ImageHeader {

  /** For audio (wav): width = sample rate, height = channels. */
  final case class ImageMeta(format: String, width: Int, height: Int, bitDepth: Int)

  def parse(bytes: Array[Byte]): Option[ImageMeta] = {
    if (bytes == null || bytes.length < 10) None
    else if (isPng(bytes)) parsePng(bytes)
    else if (isGif(bytes)) parseGif(bytes)
    else if (isBmp(bytes)) parseBmp(bytes)
    else if (isJpeg(bytes)) parseJpeg(bytes)
    else if (isWav(bytes)) parseWav(bytes)
    else None
  }

  private def u8(b: Byte): Int = b & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b(i)) << 8) | u8(b(i + 1))
  private def le16(b: Array[Byte], i: Int): Int = u8(b(i)) | (u8(b(i + 1)) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b(i)) << 24) | (u8(b(i + 1)) << 16) | (u8(b(i + 2)) << 8) | u8(b(i + 3))
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b(i)) | (u8(b(i + 1)) << 8) | (u8(b(i + 2)) << 16) | (u8(b(i + 3)) << 24)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && u8(b(0)) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b(4)) == 0x0d && u8(b(5)) == 0x0a && u8(b(6)) == 0x1a && u8(b(7)) == 0x0a

  /** PNG: signature(8) + IHDR chunk: len(4) "IHDR" width(4) height(4)
    * bitdepth(1) colortype(1). Bits per pixel = depth × channels. */
  private def parsePng(b: Array[Byte]): Option[ImageMeta] =
    if (b.length < 26 || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') None
    else {
      val depth = u8(b(24))
      val channels = u8(b(25)) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette
        case 4 => 2 // gray+alpha
        case 6 => 4 // rgba
        case _ => return None
      }
      Some(ImageMeta("png", be32(b, 16), be32(b, 20), depth * channels))
    }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** GIF: logical screen width/height LE at 6/8; color resolution bits in
    * the packed byte at 10 (bits 4-6, stored minus one). */
  private def parseGif(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 11) None
    else Some(ImageMeta("gif", le16(b, 6), le16(b, 8), ((u8(b(10)) >> 4) & 0x7) + 1))
  }

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  /** BMP: BITMAPINFOHEADER (or later) at offset 14: size(4) width(s32)
    * height(s32, negative = top-down) planes(2) bitcount(2). */
  private def parseBmp(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 30) None
    else {
      val hdrSize = le32(b, 14)
      if (hdrSize < 40) None // BITMAPCOREHEADER not supported
      else Some(ImageMeta("bmp", le32(b, 18), math.abs(le32(b, 22)), le16(b, 28)))
    }
  }

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** WAV: walk RIFF chunks to "fmt ": channels(2 LE) at +2, sample rate
    * (4 LE) at +4, bits per sample (2 LE) at +14 within the chunk body. */
  private def parseWav(b: Array[Byte]): Option[ImageMeta] = {
    // Long cursor: a crafted chunk length near Int.MaxValue would wrap an
    // Int cursor negative, pass the loop guard, and crash the scan
    var i = 12L
    while (i + 8 <= b.length) {
      val p = i.toInt
      val isFmt = b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' && b(p + 3) == ' '
      val len = le32(b, p + 4).toLong & 0xffffffffL // RIFF sizes are unsigned
      if (isFmt) {
        if (len < 16 || p + 8 + 16 > b.length) return None
        val channels = le16(b, p + 10)
        val sampleRate = le32(b, p + 12)
        val bits = le16(b, p + 22)
        return Some(ImageMeta("wav", sampleRate, channels, bits))
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    None
  }

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b(0)) == 0xff && u8(b(1)) == 0xd8

  /** JPEG: walk marker segments until a start-of-frame (FFC0-FFCF except
    * the DHT/JPG/DAC markers C4/C8/CC): precision(1) height(2 BE)
    * width(2 BE) components(1). */
  private def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b(i)) != 0xff) return None // corrupt marker stream
      val marker = u8(b(i + 1))
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker >= 0xc0 && marker <= 0xcf &&
               marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (i + 9 >= b.length) return None
        val precision = u8(b(i + 4))
        val ncomp = u8(b(i + 9))
        return Some(ImageMeta("jpeg", be16(b, i + 7), be16(b, i + 5), precision * ncomp))
      } else {
        val len = be16(b, i + 2)
        if (len < 2) return None
        i += 2 + len
      }
    }
    None
  }
}
