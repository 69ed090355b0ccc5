package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Media curation funnel ([[MediaCuration]]): each stage engages on a
  * mixed frame (image triples, audio triples, garbage, empty), counts
  * are monotone, and the recognition gate's default keeps unknowns. */
class MediaCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def png(seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        img.setRGB(x, y, (((x * 255 / 64 + seed * 37) % 256) << 16) |
          (((y * 255 / 64 + seed * 73) % 256) << 8) |
          (((x + y) * 255 / 128 + seed * 11) % 256))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def jpg(seed: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png(seed))), "jpg", bos)
    bos.toByteArray
  }

  private def wav(seed: Int, rate: Int): Array[Byte] = {
    val data = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { data.write(v & 0xff); data.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    def ascii(s: String): Unit = data.write(s.getBytes("US-ASCII"))
    val rnd = new java.util.Random(seed * 104729L + 7)
    val env = Array.fill(65)(0.1 + 0.9 * rnd.nextDouble())
    val n = rate / 4
    val samples = (0 until n).map { i =>
      (env(((i.toLong * 65) / n).toInt) *
        math.sin(2 * math.Pi * 440 * i / rate) * 16384).toShort
    }
    ascii("RIFF"); le32(36 + samples.length * 2); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1)
    le32(rate); le32(rate * 2); le16(2); le16(16)
    ascii("data"); le32(samples.length * 2)
    samples.foreach(s => le16(s & 0xffff))
    data.toByteArray
  }

  private def frame(seed: Int, idx: Int): java.awt.image.BufferedImage = {
    val rnd = new java.util.Random(seed * 7919L + idx * 104729L + 1)
    val levels = Array.fill(8, 9)(if (rnd.nextBoolean()) 224 else 32)
    val img = new java.awt.image.BufferedImage(
      72, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 72) {
      val v = levels(y / 8)(x / 8)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def gif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(
        new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  private def scaledImg(img: java.awt.image.BufferedImage, w: Int,
                        h: Int): java.awt.image.BufferedImage = {
    val dst = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    dst
  }

  test("funnel: size gate drops empties, exact-bytes dedup collapses " +
    "byte-identical copies to the lowest id before any decode, image, " +
    "video and audio tiers each keep one per component, unknown bytes " +
    "survive by default and drop under the recognition gate; counts " +
    "monotone") {
    def clip(seed: Int) = (0 until 9).map(i => frame(seed, i))
    val rows = Seq(
      (1L, png(1)), (2L, jpg(1)),           // image pair -> keep larger
      (3L, png(2)),                         // distinct image
      (4L, png(2)),                         // BYTE-identical copy of 3 -> exact stage
      (10L, wav(5, 16000)), (11L, wav(5, 8000)), // audio pair
      (12L, wav(6, 16000)),                 // distinct audio
      (13L, wav(6, 16000)),                 // BYTE-identical copy of 12 -> exact stage
      (20L, Array.fill[Byte](200)(42)),     // unrecognized bytes
      (21L, Array.empty[Byte]),             // empty -> size gate
      (30L, gif(clip(30))),                 // animated clip
      (31L, gif(clip(30).map(scaledImg(_, 54, 48)))), // rescaled copy -> video tier
      (32L, gif(clip(31)))                  // distinct animation
    ).toDF("media_id", "media")
    val (out, r) = MediaCuration.curate(rows, "media", "media_id")
    val kept = out.select("media_id").as[Long].collect().toSet
    assert(r.nInput == 13 && r.nAfterSize == 12 && r.nAfterExact == 10)
    assert(r.nAfterSize >= r.nAfterExact &&
      r.nAfterExact >= r.nAfterImageDedup &&
      r.nAfterImageDedup >= r.nAfterVideoDedup &&
      r.nAfterVideoDedup >= r.nAfterAudioDedup &&
      r.nAfterAudioDedup >= r.nOut)
    assert(!kept.contains(21L), "empty payload must drop at the gate")
    assert(!kept.contains(4L) && kept.contains(3L),
      s"exact stage must keep the LOWEST id of byte-identical copies: $kept")
    assert(!kept.contains(13L) && kept.contains(12L),
      s"exact stage must collapse the identical clip: $kept")
    assert(kept.intersect(Set(1L, 2L)).size == 1,
      s"image pair must keep exactly one: $kept")
    assert(kept.intersect(Set(10L, 11L)) == Set(10L),
      s"audio pair must keep the larger payload: $kept")
    assert(kept.contains(30L) && !kept.contains(31L),
      s"video tier must keep the larger clip of the rescaled pair: $kept")
    assert(kept.contains(32L), "distinct animation must survive")
    assert(r.nAfterImageDedup - r.nAfterVideoDedup == 1,
      s"exactly the rescaled clip drops at the video stage: $r")
    assert(kept.contains(20L), "unknown bytes must SURVIVE by default")
    // recognition gate on: the unknown row drops, nothing else changes
    // (animated GIFs carry a parseable header -> recognized)
    val (out2, _) = MediaCuration.curate(rows, "media", "media_id",
      dropUnrecognized = true)
    val kept2 = out2.select("media_id").as[Long].collect().toSet
    assert(kept2 == kept - 20L, s"gate must drop only the unknown: $kept2")
  }

  test("decode-once: one probe pass per exact-surviving payload per " +
    "funnel run, recognition gate included") {
    val rows = Seq(
      (1L, png(1)), (2L, jpg(1)), (3L, png(2)), (4L, png(2)),
      (10L, wav(5, 16000)), (11L, wav(5, 8000)),
      (20L, Array.fill[Byte](200)(42)), (21L, Array.empty[Byte])
    ).toDF("media_id", "media").localCheckpoint(true)
    // exact survivors: 7 rows pass the size gate, {3,4} collapse -> 6
    val before = MediaCuration.probedPayloads.sum()
    val (out, r) = MediaCuration.curate(rows, "media", "media_id",
      dropUnrecognized = true)
    out.count()
    assert(r.nAfterExact == 6)
    val probed = MediaCuration.probedPayloads.sum() - before
    assert(probed == r.nAfterExact,
      s"expected exactly ${r.nAfterExact} probes (one decode pass per " +
        s"payload), got $probed")
  }

  test("media_funnel sidecar accounting is exact at scaled-down knobs: " +
    "the 10^3-copy exact pile collapses at ONE decode, the perceptual " +
    "pile keeps one survivor, decoded == distinct payloads") {
    val json = graft.multimodal.MediaAudit.run(spark, nImg = 20,
      nAud = 10, nVid = 5, nGarbage = 10, exactPile = 200, percPile = 50,
      nDistinct = 300)
    def field(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
    // payloads = 3*20+3*10+3*5+11+200+50+300; the empty payload drops
    // at the size gate; exact collapses each trio to 2 and the whole
    // pile to 1; image drops one per trio + all but one perc variant;
    // video/audio drop one per trio
    assert(field("payloads") == 666L, json)
    assert(field("n_size") == 665L, json)
    assert(field("n_exact") == 431L, json)
    assert(field("decoded") == 431L,
      s"decode count must equal distinct payloads: $json")
    assert(field("n_image") == 362L, json)
    assert(field("n_video") == 357L, json)
    assert(field("n_audio") == 347L, json)
    assert(field("n_out") == 347L, json)
  }
}
