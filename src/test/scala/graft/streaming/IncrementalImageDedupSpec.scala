package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming image near-dup claims ([[IncrementalImageDedup]]): cross-batch
  * drops via stored claimant hashes, within-batch pigeonhole parity with
  * the batch tier, garbage pass-through, replay stability. */
class IncrementalImageDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the ImageDedupSpec fixture family
  private def pattern(seed: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val r = (x * 255 / 64 + seed * 37) % 256
        val g = (y * 255 / 64 + seed * 73) % 256
        val b = ((x + y) * 255 / 128 + seed * 11) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
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

  test("within-batch dedup keeps the min id per near-dup set; cross-batch " +
    "recompressions drop against stored claims; distinct and garbage " +
    "rows pass; replay reproduces exactly") {
    val root = Files.createTempDirectory("graft-imgdedup").toString
    val d = new IncrementalImageDedup(spark, root)
    d.init()
    val b1 = Seq(
      (1L, encode(pattern(1), "png")),
      (2L, encode(scaled(pattern(1), 48, 48), "png")), // near-dup of 1
      (3L, encode(pattern(2), "png")),
      (9L, Array.fill[Byte](64)(7))                    // garbage
    ).toDF("media_id", "media")
    val out1 = d.filterAndClaim(b1, "media", "media_id")
      .select("media_id").as[Long].collect().toSet
    assert(out1 == Set(1L, 3L, 9L),
      s"batch-1: want min-per-set + distinct + garbage, got $out1")
    val b2 = Seq(
      (10L, encode(pattern(1), "jpg")),  // recompression of batch-1's 1
      (11L, encode(pattern(3), "png")),  // genuinely new
      (12L, encode(scaled(pattern(2), 32, 32), "png")) // near-dup of 3
    ).toDF("media_id", "media")
    val out2 = d.filterAndClaim(b2, "media", "media_id")
      .select("media_id").as[Long].collect().toSet
    assert(out2 == Set(11L),
      s"batch-2: claims must drop 10 (vs 1) and 12 (vs 3), got $out2")
    // replay: same batch, same verdicts, no state corruption
    val replay = d.filterAndClaim(b2, "media", "media_id")
      .select("media_id").as[Long].collect().toSet
    assert(replay == out2, s"replay diverged: $replay vs $out2")
    // and the claims survive a fresh handle over the same state dir
    val d2 = new IncrementalImageDedup(spark, root)
    d2.init()
    val out3 = d2.filterAndClaim(
      Seq((20L, encode(pattern(1), "png"))).toDF("media_id", "media"),
      "media", "media_id").count()
    assert(out3 == 0L, "reopened store must still hold batch-1's claims")
  }

  test("single-batch parity with the batch tier: the streamed keep set " +
    "equals dedupImages' kept set on the same frame") {
    val frame = Seq(
      (1L, encode(pattern(5), "png")),
      (2L, encode(pattern(5), "jpg")),
      (3L, encode(scaled(pattern(5), 48, 48), "png")),
      (4L, encode(pattern(6), "png")),
      (5L, Array.fill[Byte](32)(1))
    ).toDF("media_id", "media")
    val root = Files.createTempDirectory("graft-imgdedup-par").toString
    val d = new IncrementalImageDedup(spark, root)
    d.init()
    val streamed = d.filterAndClaim(frame, "media", "media_id")
      .select("media_id").as[Long].collect().toSet
    val batch = graft.multimodal.ImageDedup
      .dedupImages(frame, "media", "media_id")
      .filter(org.apache.spark.sql.functions.col("kept"))
      .select("media_id").as[Long].collect().toSet
    // keep POLICY differs by design (streaming: first/min id —
    // replayable; batch: largest payload), so compare component
    // structure: same number of survivors, and each near-dup set
    // contributes exactly one
    assert(streamed.size == batch.size,
      s"survivor counts diverge: streamed $streamed vs batch $batch")
    assert(streamed == Set(1L, 4L, 5L), s"streamed keep set: $streamed")
  }

  test("within-batch: an unrelated bucket MINIMUM cannot mask a real " +
    "near-dup pair (smallest NEAR id wins), and an identical-hash " +
    "pileup collapses linearly to its representative") {
    val root = Files.createTempDirectory("graft-banded-mask").toString
    val core = new IncrementalBanded64(spark, root, compactEvery = 16,
      maxHamming = 3)
    core.init()
    // a / a2: hamming 3 (one flipped bit in each of bands 1, 2, 3) —
    // they share ONLY the band-0 bucket. m: same band-0 key, 8 flipped
    // band-3 bits (unrelated to both), SMALLER id — the old per-bucket
    // min test verified 2 and 3 against m alone and kept both.
    val a = 0x1234L
    val a2 = a ^ (1L << 20) ^ (1L << 36) ^ (1L << 52)
    val m = a ^ (0xFFL << 48)
    val kept = core.filterAndClaim(
      Seq(1L, 2L, 3L).toDF("media_id"),
      Seq((1L, m), (2L, a), (3L, a2)).toDF("id", "h"),
      "media_id").select("media_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L),
      s"3 near-dups 2 and must drop despite the unrelated bucket min: $kept")

    val root2 = Files.createTempDirectory("graft-banded-pile").toString
    val core2 = new IncrementalBanded64(spark, root2, compactEvery = 16,
      maxHamming = 3)
    core2.init()
    val n = 10000
    val pile = (0 until n).map(i => (100L + i, 0x5a5aL)) :+
      ((900000L, 0x5a5aL ^ 3L)) // hamming-2 near variant
    val kept2 = core2.filterAndClaim(
      pile.map(_._1).toDF("media_id"),
      pile.toDF("id", "h"),
      "media_id").select("media_id").as[Long].collect().toSet
    assert(kept2 == Set(100L),
      s"pile must collapse to its min-id rep and catch the variant: " +
        s"${kept2.take(5)}... (${kept2.size})")
  }
}
