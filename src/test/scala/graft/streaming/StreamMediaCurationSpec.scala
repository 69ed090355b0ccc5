package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming media funnel ([[StreamMediaCuration]]): exact and
  * perceptual duplicates drop ACROSS batches, unknown bytes survive by
  * default, a replayed batch reproduces its output, the per-stage
  * report is monotone, and a single batch matches the batch funnel's
  * survivors on a min-id-aligned fixture. */
class StreamMediaCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pattern(seed: Int): java.awt.image.BufferedImage = {
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
    img
  }

  private def encode(img: java.awt.image.BufferedImage,
                     fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def scaled(img: java.awt.image.BufferedImage, w: Int,
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

  private def clip(seed: Int): Seq[java.awt.image.BufferedImage] =
    (0 until 9).map(i => frame(seed, i))

  test("cross-batch drops: byte-identical, recompressed image, rescaled " +
    "clip and resampled audio copies die in LATER batches; a shared " +
    "title card alone does NOT collapse clips across batches; unknown " +
    "bytes survive; replay reproduces; report monotone and exact") {
    val stateDir = Files.createTempDirectory("graft-smedia").toString
    var reports = Vector.empty[StreamMediaCuration.BatchReport]
    val curate = StreamMediaCuration.curator(spark, stateDir,
      onReport = Some(r => reports :+= r))
    val b1 = Seq(
      (1L, encode(pattern(1), "png")),
      (5L, gif(clip(50))),                // animated clip
      (10L, wav(5, 16000)),
      (20L, Array.fill[Byte](200)(42)),   // unknown bytes
      (21L, Array.empty[Byte])            // empty -> size gate
    ).toDF("media_id", "media")
    val out1 = curate(b1, 0L).select("media_id").as[Long].collect().toSet
    assert(out1 == Set(1L, 5L, 10L, 20L), s"batch 1: $out1")
    assert(reports(0) == StreamMediaCuration.BatchReport(0L,
      nBatch = 5, nAfterSize = 4, nAfterExact = 4, nAfterImageDedup = 4,
      nAfterAudioDedup = 4, nOut = 4, nAfterVideoDedup = 4))
    val b2fixed = Seq(
      (30L, encode(pattern(1), "png")),   // byte-identical to 1 -> exact
      (31L, encode(pattern(1), "jpg")),   // recompression of 1 -> image
      (32L, wav(5, 8000)),                // resample of 10 -> audio
      (33L, encode(pattern(2), "png")),   // genuinely new
      (34L, Array.fill[Byte](200)(42)),   // byte-identical unknown -> exact
      (35L, gif(clip(50).map(scaled(_, 54, 48)))), // rescaled clip -> video
      // shares ONLY the title frame with batch-1's clip: 1 vote < 7
      (36L, gif(frame(50, 0) +: (1 until 9).map(i => frame(60, i))))
    ).toDF("media_id", "media")
    val out2 = curate(b2fixed, 1L).select("media_id").as[Long]
      .collect().toSet
    assert(out2 == Set(33L, 36L),
      s"batch 2 must keep the new image and the title-card-only clip: $out2")
    val r2 = reports(1)
    assert(r2 == StreamMediaCuration.BatchReport(1L,
      nBatch = 7, nAfterSize = 7, nAfterExact = 5, nAfterImageDedup = 4,
      nAfterAudioDedup = 2, nOut = 2, nAfterVideoDedup = 3),
      s"report miscounted: $r2")
    val replay = curate(b2fixed, 1L).select("media_id").as[Long]
      .collect().toSet
    assert(replay == out2, s"replayed batch diverged: $replay")
    // reopened store keeps the claims (incl. the video tier's)
    val curate2 = StreamMediaCuration.curator(spark, stateDir)
    val out3 = curate2(Seq(
      (40L, encode(pattern(1), "png")),
      (41L, gif(clip(50)))) // byte-identical clip -> exact claims
      .toDF("media_id", "media"), 2L).count()
    assert(out3 == 0L, "reopened store must still hold prior claims")
  }

  test("single-batch parity with the batch funnel on a min-id-aligned " +
    "fixture (lowest id carries the largest payload), recognition gate " +
    "included") {
    val stateDir = Files.createTempDirectory("graft-smedia-par").toString
    val rows = Seq(
      (1L, encode(pattern(5), "png")),                 // larger + lowest id
      (2L, encode(scaled(pattern(5), 48, 48), "png")), // near-dup of 1
      (3L, encode(pattern(6), "png")),
      (4L, encode(pattern(6), "png")),                 // byte-identical to 3
      (10L, wav(7, 16000)), (11L, wav(7, 8000)),       // audio pair
      (20L, Array.fill[Byte](64)(9))                   // unknown -> gate drops
    ).toDF("media_id", "media")
    val curate = StreamMediaCuration.curator(spark, stateDir,
      dropUnrecognized = true)
    val streamed = curate(rows, 0L).select("media_id").as[Long]
      .collect().toSet
    val (batchOut, _) = graft.pipeline.MediaCuration.curate(rows, "media",
      "media_id", dropUnrecognized = true)
    val batch = batchOut.select("media_id").as[Long].collect().toSet
    assert(streamed == batch,
      s"single-batch survivors must match the batch funnel: " +
        s"$streamed vs $batch")
    assert(streamed == Set(1L, 3L, 10L), s"survivors: $streamed")
  }

  test("video claims: an unsatisfiable vote threshold fails loud at " +
    "construction (minMatch > sampled positions)") {
    val dir = Files.createTempDirectory("graft-ivd-guard").toString
    val e = intercept[IllegalArgumentException] {
      new IncrementalVideoDedup(spark, dir, minMatch = 10)
    }
    assert(e.getMessage.contains("minMatch"), e.getMessage)
  }

  test("retraction: deleting a claimant payload clears its digest, band " +
    "and frame-vote claims across the funnel's stores — the recrawled " +
    "copy survives and re-claims") {
    val stateDir = Files.createTempDirectory("graft-smc-retract").toString
    val curate = StreamMediaCuration.curator(spark, stateDir)
    val png = encode(pattern(31), "png")
    val vid = gif(clip(32))
    val aud = wav(33, 16000)
    // batch 0: payloads 1 (image), 2 (clip), 3 (audio) claim
    assert(curate(Seq((1L, png), (2L, vid), (3L, aud))
      .toDF("media_id", "media"), 0L).count() == 3)
    // batch 1: exact + perceptual copies all drop against the claimants
    assert(curate(Seq((11L, png), (12L, gif(clip(32).map(scaled(_, 54, 48)))),
      (13L, wav(33, 8000))).toDF("media_id", "media"), 1L).count() == 0)
    // delete payloads 1 and 2 (takedown) — digest, dHash band and
    // frame-vote claims clear; payload 3's audio claims stay
    val removed = StreamMediaCuration.retract(spark, stateDir, Seq(1L, 2L))
    assert(removed > 0L, "no claims removed")
    // the recrawled copies now survive and re-claim first-writer-wins;
    // the audio claimant was NOT retracted, so its copy still drops
    assert(curate(Seq((21L, png), (22L, vid), (23L, wav(33, 8000)))
      .toDF("media_id", "media"), 2L)
      .select("media_id").as[Long].collect().toSet == Set(21L, 22L))
    // and the new claims are live: the next copies drop again
    assert(curate(Seq((31L, png), (32L, vid))
      .toDF("media_id", "media"), 3L).count() == 0)
  }
}
