package graft.multimodal

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Frame-fingerprint voting for multi-frame clips ([[VideoDedup]]):
  * rescaled re-encodes pair, distinct animations do not, a shared TITLE
  * CARD no longer collapses two different clips (the first-frame
  * precision gap of the image tier, fixed), single-frame payloads are
  * not this tier's business, and keep-one follows the family policy. */
class VideoDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic binary block-grid frame (the ImageAudit margin
    * discipline: levels 32/224 survive palette quantization and
    * bilinear rescale). */
  private def frame(seed: Int, idx: Int): java.awt.image.BufferedImage = {
    val rnd = new java.util.Random(seed * 7919L + idx * 104729L + 1)
    val levels = Array.fill(8, 9)(if (rnd.nextBoolean()) 224 else 32)
    val img = new java.awt.image.BufferedImage(
      72, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 72) {
        val v = levels(y / 8)(x / 8)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
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

  test("rescaled re-encode pairs at 9/9 positions; distinct animations " +
    "and single-frame payloads emit nothing; a shared title card does " +
    "NOT collapse two different clips (the image tier's first-frame " +
    "gap, fixed here)") {
    val titled1 = frame(100, 0) +: (1 until 9).map(i => frame(101, i))
    val titled2 = frame(100, 0) +: (1 until 9).map(i => frame(102, i))
    val rows = Seq(
      (1L, gif(clip(1))),
      (2L, gif(clip(1).map(scaled(_, 54, 48)))), // rescaled copy of 1
      (3L, gif(clip(2))),                        // distinct animation
      (10L, gif(titled1)), (11L, gif(titled2)),  // shared title card only
      (20L, gif(Seq(frame(5, 0)))),              // single frame: not ours
      (21L, Array.fill[Byte](64)(7))             // garbage
    ).toDF("media_id", "media")
    val pairs = VideoDedup.nearDupPairs(rows, "media", "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(pairs.keySet == Set((1L, 2L)), s"pairs: $pairs")
    assert(pairs((1L, 2L)) >= 8L,
      s"rescaled copy must agree on ~all positions: ${pairs((1L, 2L))}")
    // the image tier WOULD have collapsed the title-card pair — that is
    // the precision gap this tier exists for
    val firstFramePairs = ImageDedup
      .nearDupPairs(rows.filter(col("media_id").isin(10L, 11L)),
        "media", "media_id")
      .collect()
    assert(firstFramePairs.nonEmpty,
      "fixture check: the shared title card must fool the image tier")
    // no frame rows at all for the single-frame and garbage payloads
    val ids = VideoDedup.frameHashes(rows, "media", "media_id")
      .select("id").distinct().as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 10L, 11L), s"hashed ids: $ids")
  }

  test("identical-clip pileup collapses to star edges through the " +
    "min-id rep; keep-one keeps the largest payload per component") {
    val base = gif(clip(7))
    val m = 500
    val pile = (0 until m).map(i => (i.toLong, base)) :+
      ((9000L, gif(clip(7).map(scaled(_, 54, 48))))) :+
      ((9001L, gif(clip(8))))
    val rows = pile.toDF("media_id", "media").repartition(8)
    val pairs = VideoDedup.nearDupPairs(rows, "media", "media_id")
      .localCheckpoint(true)
    val star = pairs.filter(col("id_a") === 0L && col("id_b") < m.toLong)
      .count()
    assert(star == m - 1, s"want ${m - 1} star edges, got $star")
    assert(pairs.count() == m.toLong,
      s"pile + near variant = $m edges, got ${pairs.count()}")
    val kept = VideoDedup.dedupClips(rows, "media", "media_id")
      .filter(col("kept")).select("media_id").as[Long].collect().toSet
    // survivor of the big component: the largest payload (all copies
    // equal-size, the rescale is smaller -> ties to lowest id = 0)
    assert(kept == Set(0L, 9001L), s"kept: $kept")
  }

  test("an unsatisfiable vote threshold fails loud, never silently " +
    "detects nothing (minMatch > sampled positions)") {
    val rows = Seq((1L, gif(clip(3))), (2L, gif(clip(3))))
      .toDF("media_id", "media")
    // n = 5 sampled frames under the default minMatch = 7: even
    // byte-identical clips would score n_match = 5 < 7 — inert
    val e = intercept[IllegalArgumentException] {
      VideoDedup.nearDupPairs(rows, "media", "media_id", n = 5)
    }
    assert(e.getMessage.contains("minMatch"), e.getMessage)
    // satisfiable thresholds at the same width still work
    assert(VideoDedup.nearDupPairs(rows, "media", "media_id",
      minMatch = 5, n = 5).count() == 1L)
  }
}
