package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Binary-column plumbing: schema, determinism, batch shape. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A real PNG, produced by the JDK's own encoder: `w`x`h`, every pixel
    * the given RGB color. */
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage decodes a real PNG to known pixel values") {
    val red = pngBytes(4, 2, 0xff0000)
    val p = Multimodal.decodeImage(red).get
    assert(p.width == 4 && p.height == 2)
    assert(p.rgb.length == 4 * 2 * 3)
    assert(p.rgb.grouped(3).forall(px =>
      (px(0) & 0xff) == 255 && (px(1) & 0xff) == 0 && (px(2) & 0xff) == 0))
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
  }

  test("featurize emits fixed schema; real pixels for images, stub for garbage") {
    import spark.implicits._
    val green = pngBytes(8, 8, 0x00ff00)
    val media = Seq((1L, green), (2L, "garbage bytes stand-in".getBytes))
      .toDF("media_id", "media")
    val out1 = Multimodal.featurize(media, "media", "media_id", dim = 8)
    assert(out1.schema.fieldNames.toSeq ==
      Seq("media_id", "n_bytes", "decoded", "features"))
    val rows1 = out1.collect().map(r =>
      r.getLong(0) -> ((r.getInt(1), r.getBoolean(2), r.getSeq[Float](3)))).toMap
    // pure-green image: meanR=0, meanG=1, meanB=0; luminance 587/1000*255
    // lands every pixel in one histogram bucket of the remaining 5
    val (n1, dec1, f1) = rows1(1L)
    assert(dec1 && n1 == green.length)
    assert(f1(0) == 0f && f1(1) == 1f && f1(2) == 0f)
    assert(f1.drop(3).count(_ == 1f) == 1 && f1.drop(3).count(_ == 0f) == 4)
    val (_, dec2, f2) = rows1(2L)
    assert(!dec2 && f2.length == 8) // garbage falls back to the byte-hash stub
    // deterministic end to end
    val rows2 = Multimodal.featurize(media, "media", "media_id", dim = 8)
      .collect().map(r =>
        r.getLong(0) -> ((r.getInt(1), r.getBoolean(2), r.getSeq[Float](3)))).toMap
    assert(rows1 == rows2)
    // still runs over arbitrary fabricated payloads (the corpus-shaped path)
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(20)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("media"))
    assert(Multimodal.featurize(corpus, "media", "media_id", dim = 8)
      .collect().forall(r => !r.getBoolean(2) && r.getSeq[Float](3).length == 8))
  }

  test("ImageHeader parses PNG/GIF/BMP/JPEG dimensions from raw bytes") {
    // minimal hand-built headers
    val png = Array[Int](
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0, 0, 0, 13, 'I', 'H', 'D', 'R',             // IHDR chunk header
      0, 0, 2, 0,                                  // width 512
      0, 0, 1, 0,                                  // height 256
      8, 6, 0, 0, 0                                // depth 8, rgba
    ).map(_.toByte)
    assert(ImageHeader.parse(png).contains(ImageHeader.ImageMeta("png", 512, 256, 32)))

    val gif = ("GIF89a".getBytes("ASCII") ++ Array[Int](
      0x40, 0x01, // width 320 LE
      0xc8, 0x00, // height 200 LE
      0x70, 0, 0  // packed: color resolution 8
    ).map(_.toByte))
    assert(ImageHeader.parse(gif).contains(ImageHeader.ImageMeta("gif", 320, 200, 8)))

    val bmp = ("BM".getBytes("ASCII") ++ Array.fill(12)(0.toByte) ++ Array[Int](
      40, 0, 0, 0,        // BITMAPINFOHEADER size
      0x80, 0, 0, 0,      // width 128
      0xb0, 0xff, 0xff, 0xff, // height -80 (top-down) -> 80
      1, 0, 24, 0         // planes, bitcount 24
    ).map(_.toByte))
    assert(ImageHeader.parse(bmp).contains(ImageHeader.ImageMeta("bmp", 128, 80, 24)))

    val jpeg = Array[Int](
      0xff, 0xd8,                   // SOI
      0xff, 0xe0, 0x00, 0x04, 0, 0, // APP0 segment, len 4
      0xff, 0xc0, 0x00, 0x11,       // SOF0, len 17
      8,                            // precision
      0x00, 0xf0,                   // height 240
      0x01, 0x40,                   // width 320
      3                             // 3 components
    ).map(_.toByte)
    assert(ImageHeader.parse(jpeg).contains(ImageHeader.ImageMeta("jpeg", 320, 240, 24)))

    // WAV with a junk chunk before fmt (walker must skip it)
    val wav = ("RIFF".getBytes("ASCII") ++ Array[Int](0, 0, 0, 0).map(_.toByte) ++
      "WAVE".getBytes("ASCII") ++
      "junk".getBytes("ASCII") ++ Array[Int](2, 0, 0, 0, 9, 9).map(_.toByte) ++
      "fmt ".getBytes("ASCII") ++ Array[Int](16, 0, 0, 0).map(_.toByte) ++ Array[Int](
        1, 0,             // PCM
        2, 0,             // 2 channels
        0x44, 0xac, 0, 0, // 44100 Hz
        0, 0, 0, 0,       // byte rate (unused)
        4, 0,             // block align (unused)
        16, 0             // 16 bits/sample
      ).map(_.toByte))
    assert(ImageHeader.parse(wav).contains(ImageHeader.ImageMeta("wav", 44100, 2, 16)))

    assert(ImageHeader.parse("not an image at all".getBytes).isEmpty)
    assert(ImageHeader.parse(Array.empty[Byte]).isEmpty)
    assert(ImageHeader.parse(null).isEmpty)
  }

  test("inspectImages emits per-row metadata, nulls for unrecognized bytes") {
    import spark.implicits._
    val png = Array[Int](
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0, 64, 0, 0, 0, 32, 8, 2, 0, 0, 0).map(_.toByte)
    val media = Seq((1L, png), (2L, "garbage-bytes-here!!".getBytes))
      .toDF("media_id", "media")
    val out = Multimodal.inspectImages(media, "media", "media_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(2) == "png")
    assert(out(1L).getInt(3) == 64 && out(1L).getInt(4) == 32 && out(1L).getInt(5) == 24)
    assert(out(2L).isNullAt(2) && out(2L).isNullAt(3))
    assert(out(2L).getInt(1) == 20)
  }

  /** A real 16-bit mono PCM WAV built byte by byte. */
  private def wavBytes(sampleRate: Int, samples: Seq[Short]): Array[Byte] = {
    val data = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { data.write(v & 0xff); data.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    def ascii(s: String): Unit = data.write(s.getBytes("US-ASCII"))
    val dataLen = samples.length * 2
    ascii("RIFF"); le32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1); le16(1) // PCM, mono
    le32(sampleRate); le32(sampleRate * 2) // byte rate
    le16(2); le16(16) // block align, bits
    ascii("data"); le32(dataLen)
    samples.foreach(s => le16(s & 0xffff))
    data.toByteArray
  }

  test("decodeWav decodes real PCM samples to known float values") {
    // square wave: 4 frames at +0.5, 4 at -0.5 (16384 = 0.5 * 32768)
    val wav = wavBytes(8000, Seq[Short](16384, 16384, 16384, 16384,
      -16384, -16384, -16384, -16384))
    val clip = Multimodal.decodeWav(wav).get
    assert(clip.sampleRate == 8000 && clip.channels == 1 && clip.bitsPerSample == 16)
    assert(clip.samples.toSeq == Seq(0.5f, 0.5f, 0.5f, 0.5f, -0.5f, -0.5f, -0.5f, -0.5f))
    // per-window RMS of a +-0.5 square wave is 0.5 in both halves
    assert(Multimodal.audioFeatures(clip, 2).toSeq == Seq(0.5f, 0.5f))
    assert(Multimodal.decodeWav("RIFFnope".getBytes).isEmpty)
    assert(Multimodal.decodeWav(null).isEmpty)
  }

  test("featurizeAudio: real RMS features for WAV, stub for garbage") {
    import spark.implicits._
    val wav = wavBytes(8000, Seq.fill(8)(16384.toShort))
    val media = Seq((1L, wav), (2L, "not audio at all".getBytes))
      .toDF("media_id", "media")
    val out = Multimodal.featurizeAudio(media, "media", "media_id", dim = 4)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(2), r.getSeq[Float](3)))).toMap
    assert(out(1L)._1 && out(1L)._2 == Seq(0.5f, 0.5f, 0.5f, 0.5f))
    assert(!out(2L)._1 && out(2L)._2.length == 4)
  }

  test("resize bilinear-scales real images and stride-samples garbage") {
    import spark.implicits._
    val blue = pngBytes(16, 8, 0x0000ff)
    val media = Seq(
      (1L, blue),
      (2L, "some moderately long payload standing in for pixels".getBytes),
      (3L, Array.empty[Byte])).toDF("media_id", "media")
    val out = Multimodal.resize(media, "media", "media_id", outW = 4, outH = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // real path: a solid-blue source stays solid blue at any scale
    val px1 = out(1L).getAs[Array[Byte]](1)
    assert(out(1L).getBoolean(4) && px1.length == 4 * 3 * 3)
    assert(px1.grouped(3).forall(p =>
      (p(0) & 0xff) == 0 && (p(1) & 0xff) == 0 && (p(2) & 0xff) == 255))
    // fallback path: same 3-bytes-per-pixel shape, decoded = false
    assert(!out(2L).getBoolean(4) && out(2L).getAs[Array[Byte]](1).length == 36)
    assert(out(2L).getInt(2) == 4 && out(2L).getInt(3) == 3)
    assert(out(3L).getAs[Array[Byte]](1).length == 36) // empty payload still shapes
    val again = Multimodal.resize(media, "media", "media_id", 4, 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(again(1L) == px1.toSeq && again(2L) == out(2L).getAs[Array[Byte]](1).toSeq)
  }

  test("resize rejects non-positive or overflowing dimensions at call time") {
    import spark.implicits._
    val media = Seq((1L, Array.empty[Byte])).toDF("media_id", "media")
    // driver-side failure with a clear message — not a per-row
    // NegativeArraySizeException inside an executor task
    for ((w, h) <- Seq((0, 3), (4, 0), (-1, 3), (4, -2))) {
      val e = intercept[IllegalArgumentException] {
        Multimodal.resize(media, "media", "media_id", w, h)
      }
      assert(e.getMessage.contains("positive"), s"($w,$h): ${e.getMessage}")
    }
    intercept[IllegalArgumentException] {
      Multimodal.resizeStub(Array[Byte](1, 2, 3), -1, 4)
    }
    intercept[IllegalArgumentException] {
      Multimodal.resizeImage(Array[Byte](1, 2, 3), 0, 0)
    }
    // dimension product past Int.MaxValue/3 must also fail loud
    intercept[IllegalArgumentException] {
      Multimodal.resize(media, "media", "media_id", 50000, 50000)
    }
  }

  test("sampleFrames explodes n evenly spaced frame stubs per media row") {
    val media = spark.range(3).select(col("id").as("media_id"))
    val out = Multimodal.sampleFrames(media, "media_id", n = 4).collect()
    assert(out.length == 12)
    val offsets = out.filter(_.getLong(0) == 0L).map(_.getDouble(2)).sorted.toSeq
    assert(offsets == Seq(0.0, 0.25, 0.5, 0.75))
  }

  /** A real animated GIF written by the JDK's own sequence encoder: one
    * full solid-color frame per entry in `colors`. */
  private def animatedGifBytes(w: Int, h: Int, colors: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { c =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Animated GIF with an explicit logical screen larger than its frames —
    * the shape gifsicle-style optimizers emit (sub-rect first frame). */
  private def optimizedGifBytes(screenW: Int, screenH: Int,
      frames: Seq[(Int, Int, Int)]): Array[Byte] = { // (w, h, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      val smd = writer.getDefaultStreamMetadata(null)
      val fmt = "javax_imageio_gif_stream_1.0"
      val root = smd.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val ls = root.getElementsByTagName("LogicalScreenDescriptor")
      val lsd =
        if (ls.getLength > 0)
          ls.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        else {
          val n = new javax.imageio.metadata.IIOMetadataNode("LogicalScreenDescriptor")
          root.appendChild(n); n
        }
      lsd.setAttribute("logicalScreenWidth", screenW.toString)
      lsd.setAttribute("logicalScreenHeight", screenH.toString)
      lsd.setAttribute("colorResolution", "8")
      lsd.setAttribute("pixelAspectRatio", "0")
      smd.setFromTree(fmt, root)
      writer.prepareWriteSequence(smd)
      frames.foreach { case (w, h, c) =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  test("decodeGifFrames sizes the canvas from the logical screen, not frame 0") {
    // optimizer shape: 10x8 screen, 3x2 first frame — later full frames
    // must not be clipped to frame 0's bounds
    val gif = optimizedGifBytes(10, 8,
      Seq((3, 2, 0xff0000), (10, 8, 0x0000ff)))
    val frames = Multimodal.decodeGifFrames(gif).get
    assert(frames.length == 2)
    assert(frames.forall(p => p.width == 10 && p.height == 8))
    // frame 0 composite: red in the 3x2 corner, untouched canvas elsewhere
    val f0 = frames(0)
    def px(p: Multimodal.Pixels, x: Int, y: Int) = {
      val i = (y * p.width + x) * 3
      (p.rgb(i) & 0xff, p.rgb(i + 1) & 0xff, p.rgb(i + 2) & 0xff)
    }
    assert(px(f0, 0, 0) == ((255, 0, 0)))
    assert(px(f0, 9, 7) == ((0, 0, 0)))
    // frame 1 composite: blue everywhere, including beyond frame 0's rect
    val f1 = frames(1)
    assert(px(f1, 0, 0) == ((0, 0, 255)) && px(f1, 9, 7) == ((0, 0, 255)))
  }

  test("decodeGifFrames materializes only the wanted frame indices") {
    val gif = animatedGifBytes(4, 4, Seq(0xff0000, 0x00ff00, 0x0000ff))
    val only2 = Multimodal.decodeGifFrames(gif, Some(Set(2))).get
    assert(only2.length == 1)
    assert((only2.head.rgb(2) & 0xff) == 255) // frame 2 is blue
    val oneAndTwo = Multimodal.decodeGifFrames(gif, Some(Set(1, 2))).get
    assert(oneAndTwo.length == 2)
    assert((oneAndTwo.head.rgb(1) & 0xff) == 255) // frame 1 green first
  }

  test("decodeGifFrames wanted-set edge cases never misreport readability") {
    val gif = animatedGifBytes(4, 4, Seq(0xff0000, 0x00ff00))
    // empty set: readable GIF, zero frames requested — Some(empty), not None
    assert(Multimodal.decodeGifFrames(gif, Some(Set.empty)).get.isEmpty)
    // out-of-range indices are ignored, in-range ones still decode
    val mixed = Multimodal.decodeGifFrames(gif, Some(Set(1, 7, -3))).get
    assert(mixed.length == 1)
    assert((mixed.head.rgb(1) & 0xff) == 255) // frame 1 green
    // all out-of-range: Some(empty)
    assert(Multimodal.decodeGifFrames(gif, Some(Set(9))).get.isEmpty)
  }

  test("a frame declaring huge dimensions is rejected before decoding") {
    // hand-patch a valid GIF's image descriptor to claim 46000x46000 —
    // the header-only bound must bail out (None), never allocate
    val gif = animatedGifBytes(4, 4, Seq(0xff0000, 0x00ff00))
    // image descriptor: 0x2C introducer, then left,top,width,height (u16 LE)
    val idx = gif.indexWhere(_ == 0x2c.toByte)
    assert(idx > 0, "no image descriptor found in test GIF")
    val patched = gif.clone()
    val dim = 46000
    patched(idx + 5) = (dim & 0xff).toByte
    patched(idx + 6) = ((dim >> 8) & 0xff).toByte
    patched(idx + 7) = (dim & 0xff).toByte
    patched(idx + 8) = ((dim >> 8) & 0xff).toByte
    assert(Multimodal.decodeGifFrames(patched).isEmpty)
  }

  test("decodeGifFrames reads every frame of a real animated GIF") {
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val frames = Multimodal.decodeGifFrames(
      animatedGifBytes(5, 3, colors)).get
    assert(frames.length == 4)
    frames.zip(colors).foreach { case (p, c) =>
      assert(p.width == 5 && p.height == 3)
      val px = p.rgb.take(3).map(_ & 0xff)
      assert(px(0) == ((c >> 16) & 0xff) && px(1) == ((c >> 8) & 0xff) &&
        px(2) == (c & 0xff), s"frame pixel $px vs color $c")
    }
    assert(Multimodal.decodeGifFrames(pngBytes(2, 2, 0xff0000)).isEmpty)
    assert(Multimodal.decodeGifFrames("garbage".getBytes).isEmpty)
    assert(Multimodal.decodeGifFrames(null).isEmpty)
  }

  test("sampleFramesDecoded: real pixels for animated GIFs, index-only rows otherwise") {
    import spark.implicits._
    val gif = animatedGifBytes(4, 4,
      Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00, 0xff00ff, 0x00ffff))
    val media = Seq((1L, gif), (2L, "not media".getBytes))
      .toDF("media_id", "bytes")
    val out = Multimodal.sampleFramesDecoded(media, "bytes", "media_id", n = 3)
      .collect()
    assert(out.length == 6)
    val gifRows = out.filter(_.getLong(0) == 1L).sortBy(_.getInt(1))
    // 6 frames sampled 3 ways: indices 0, 2, 4
    assert(gifRows.map(_.getInt(2)).toSeq == Seq(0, 2, 4))
    assert(gifRows.forall(_.getBoolean(6)))
    val colors = Seq(0xff0000, 0x0000ff, 0xff00ff) // frames 0, 2, 4
    gifRows.zip(colors).foreach { case (r, c) =>
      assert(r.getInt(3) == 4 && r.getInt(4) == 4)
      val px = r.getAs[Array[Byte]](5).take(3).map(_ & 0xff)
      assert(px(0) == ((c >> 16) & 0xff) && px(1) == ((c >> 8) & 0xff) &&
        px(2) == (c & 0xff), s"sampled pixel $px vs color $c")
    }
    val stubRows = out.filter(_.getLong(0) == 2L)
    assert(stubRows.length == 3 && stubRows.forall(r => !r.getBoolean(6)))
    assert(stubRows.forall(r => r.isNullAt(3) && r.isNullAt(5)))
  }
}
