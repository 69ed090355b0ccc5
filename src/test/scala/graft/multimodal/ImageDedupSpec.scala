package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Image near-dup tier ([[ImageDedup]]): planted near-identical images
  * (resized / recompressed) pair up, distinct images do not, garbage
  * never pairs, and the keep tier carries the whole corpus. */
class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A deterministic content-bearing image: a strong two-axis gradient
    * with a seeded diagonal structure — enough luminance variation that
    * dHash comparisons survive rescaling and JPEG quantization. */
  private def pattern(seed: Int, w: Int = 64, h: Int = 64)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 255 / w + seed * 37) % 256
        val g = (y * 255 / h + seed * 73) % 256
        val b = ((x + y) * 255 / (w + h) + seed * 11) % 256
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

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("dHash invariances: a resized copy and a JPEG recompression stay " +
    "within 3 bits of the original; distinct patterns are far apart; " +
    "garbage bytes produce no hash") {
    val base = pattern(1)
    val h0 = ImageDedup.dHash(encode(base, "png")).get
    val hResized = ImageDedup.dHash(encode(scaled(base, 32, 32), "png")).get
    val hJpeg = ImageDedup.dHash(encode(base, "jpg")).get
    assert(hamming(h0, hResized) <= 3,
      s"resize moved ${hamming(h0, hResized)} bits")
    assert(hamming(h0, hJpeg) <= 3,
      s"recompression moved ${hamming(h0, hJpeg)} bits")
    val hOther = ImageDedup.dHash(encode(pattern(2), "png")).get
    assert(hamming(h0, hOther) > 10,
      s"distinct patterns only ${hamming(h0, hOther)} bits apart")
    assert(ImageDedup.dHash(Array.fill[Byte](64)(7)).isEmpty)
    assert(ImageDedup.dHash(null).isEmpty)
  }

  test("nearDupPairs: planted near-identical images pair up, distinct " +
    "images don't, garbage rows never pair") {
    val rows = Seq(
      (1L, encode(pattern(1), "png")),
      (2L, encode(scaled(pattern(1), 48, 48), "png")), // near-dup of 1
      (3L, encode(pattern(1), "jpg")),                 // near-dup of 1
      (4L, encode(pattern(2), "png")),                 // distinct
      (5L, encode(pattern(3), "png")),                 // distinct
      (6L, Array.fill[Byte](128)(42))                  // garbage
    ).toDF("media_id", "media")
    val pairs = ImageDedup.nearDupPairs(rows, "media", "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"resized copy unpaired: $pairs")
    assert(pairs.contains((1L, 3L)), s"recompressed copy unpaired: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"distinct image 4 paired: $pairs")
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L),
      s"garbage paired: $pairs")
  }

  test("dedupImages keep-one: one survivor per near-dup component (the " +
    "largest payload, ties to lowest id), distinct and undecodable " +
    "images pass through kept") {
    val big = encode(pattern(1), "png") ++ Array.fill[Byte](512)(0)
    // trailing junk after IEND still decodes; payload is biggest
    val rows = Seq(
      (1L, encode(pattern(1), "png")),
      (2L, big),                                       // biggest copy
      (3L, encode(scaled(pattern(1), 48, 48), "png")),
      (4L, encode(pattern(2), "png")),
      (6L, Array.fill[Byte](128)(42))
    ).toDF("media_id", "media")
    val out = ImageDedup.dedupImages(rows, "media", "media_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 6L), s"rows lost: $out")
    val cluster = Set(1L, 2L, 3L).map(out(_)._1)
    assert(cluster.size == 1, s"copies split across components: $out")
    val kept = out.filter(_._2._2).keySet
    assert(kept == Set(2L, 4L, 6L),
      s"keep policy broke (want biggest copy + singletons): $kept")
  }

  test("scale shape: only (id, dhash) longs reach the band exchange — " +
    "image bytes never shuffle") {
    val rows = Seq((1L, encode(pattern(1), "png"))).toDF("media_id", "media")
    val plan = ImageDedup.nearDupPairs(rows, "media", "media_id")
      .queryExecution.optimizedPlan
    val exchanges = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(exchanges.nonEmpty)
    exchanges.foreach { j =>
      val inputs = (j.left.output ++ j.right.output).map(_.name)
      assert(!inputs.contains("media"),
        s"image bytes reach the pair join: $inputs")
    }
  }
}
