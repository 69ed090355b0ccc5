package graft.multimodal

import org.apache.spark.sql.SparkSession

/** Bench sidecar for the END-TO-END media funnel
  * ([[graft.pipeline.MediaCuration]]) — `funnel_full`'s byte-column
  * sibling: a deterministic synthetic corpus where every stage has
  * planted work (exact byte copies, recompressed/rescaled images,
  * rescaled clips, resampled audio, garbage), run through `curate` at
  * the production knobs with per-stage counts and the wall beside them,
  * so cross-round regressions in the funnel's STAGE COMPOSITION surface
  * automatically. Generation is driver-side (a few MB); the funnel runs
  * the real distributed plan. */
object MediaAudit {

  private def pattern(seed: Int, frame: Int = 0): java.awt.image.BufferedImage = {
    val rnd = new java.util.Random(seed * 2654435761L + frame * 104729L + 1)
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

  private def wavBytes(rate: Int, samples: Seq[Short]): Array[Byte] = {
    val data = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { data.write(v & 0xff); data.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    def ascii(s: String): Unit = data.write(s.getBytes("US-ASCII"))
    val dataLen = samples.length * 2
    ascii("RIFF"); le32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1)
    le32(rate); le32(rate * 2); le16(2); le16(16)
    ascii("data"); le32(dataLen)
    samples.foreach(s => le16(s & 0xffff))
    data.toByteArray
  }

  private def clipWav(seed: Int, rate: Int): Array[Byte] = {
    val rnd = new java.util.Random(seed * 104729L + 7)
    val env = Array.fill(65)(0.1 + 0.9 * rnd.nextDouble())
    val n = rate / 4
    wavBytes(rate, (0 until n).map { i =>
      (env(((i.toLong * 65) / n).toInt) *
        math.sin(2 * math.Pi * 440 * i / rate) * 16384).toShort
    })
  }

  /** One JSON object: funnel wall + per-stage counts + the DECODE COUNT
    * (distinct payloads probed — the decode-once receipt, measured per
    * run from the funnel's own [[graft.pipeline.MediaCuration
    * .probedPayloads]] counter, valid in local mode where executors
    * share the JVM).
    *
    * Beyond the base per-modality trios, the corpus plants the two
    * crawl-scale duplication regimes the engine's pre-collapse and
    * decode-once guarantees exist for, so their wins are MEASURED
    * numbers cross-round, not spec-only: `exactPile` byte-identical
    * copies of ONE image (the mirrored-meme regime — must collapse on
    * the digest hash-agg at ~zero decode cost: the whole pile costs ONE
    * probe) and `percPile` DISTINCT re-encodes of one image at stepped
    * sizes (a quality ladder — every variant decodes once, the banded
    * tier's identical-signature pre-collapse keeps the bucket linear).
    * Default totals: 10,081 payloads, 8,901 distinct after the exact
    * stage — and the published `decoded` count must EQUAL that distinct
    * count (decode cost scales with DISTINCT payloads: the decode-once
    * guarantee as a cross-round measured number, not spec-only). */
  def run(spark: SparkSession, nImg: Int = 100, nAud: Int = 50,
          nVid: Int = 30, nGarbage: Int = 40, exactPile: Int = 1000,
          percPile: Int = 100, nDistinct: Int = 8400): String = {
    import spark.implicits._
    val imgs = (0 until nImg).flatMap { i =>
      val base = pattern(i)
      val png = encode(base, "png")
      Seq((10000L + 3 * i, png),
        (10000L + 3 * i + 1, encode(base, "jpg")),        // near-dup
        (10000L + 3 * i + 2, png))                        // exact dup
    }
    val auds = (0 until nAud).flatMap { i =>
      val orig = clipWav(i, 16000)
      Seq((20000L + 3 * i, orig),
        (20000L + 3 * i + 1, clipWav(i, 8000)),           // near-dup
        (20000L + 3 * i + 2, orig))                       // exact dup
    }
    val vids = (0 until nVid).flatMap { i =>
      val frames = (0 until 9).map(f => pattern(1000 + i, f))
      val orig = gif(frames)
      Seq((30000L + 3 * i, orig),
        (30000L + 3 * i + 1, gif(frames.map(scaled(_, 54, 48)))), // near
        (30000L + 3 * i + 2, orig))                       // exact dup
    }
    val junk = (0 until nGarbage).map { i =>
      val rnd = new java.util.Random(i * 7919L + 3)
      val b = new Array[Byte](256)
      rnd.nextBytes(b)
      (40000L + i, b)
    } :+ ((50000L, Array.empty[Byte]))
    // the 10^3-copy EXACT pile: one meme mirrored exactPile times —
    // one encode driver-side, one decode in the funnel, m−1 drops in
    // the digest hash-agg before any perceptual tier sees it
    val pileBytes = encode(pattern(5000), "png")
    val exacts = (0 until exactPile).map(i => (60000L + i, pileBytes))
    // the 10^2-variant PERCEPTUAL pile: DISTINCT re-encodes of one
    // image at stepped sizes — every variant decodes (distinct bytes),
    // the dHash band tier collapses the bucket linearly
    val percBase = pattern(6000)
    val percs = (0 until percPile).map { i =>
      (70000L + i, encode(scaled(percBase, 172 - i, 150 - i), "png"))
    }
    // distinct random-byte payloads pad the corpus to ~10^4 rows
    // without driver-side image-encode cost (they exercise the size
    // gate + probe + recognition path, not the decoders)
    val pad = (0 until nDistinct).map { i =>
      val rnd = new java.util.Random(i * 31337L + 11)
      val b = new Array[Byte](128)
      rnd.nextBytes(b)
      (80000L + i, b)
    }
    val rows = imgs ++ auds ++ vids ++ junk ++ exacts ++ percs ++ pad
    val df = rows.toDF("media_id", "media").repartition(16)
      .localCheckpoint(true)
    graft.pipeline.MediaCuration.probedPayloads.reset()
    val t0 = System.nanoTime()
    val (out, r) = graft.pipeline.MediaCuration.curate(df, "media",
      "media_id")
    out.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val decoded = graft.pipeline.MediaCuration.probedPayloads.sum()
    f"""{"payloads":${rows.size},"wall_sec":$wall%.3f,"n_size":${r.nAfterSize},"n_exact":${r.nAfterExact},"n_image":${r.nAfterImageDedup},"n_video":${r.nAfterVideoDedup},"n_audio":${r.nAfterAudioDedup},"n_out":${r.nOut},"decoded":$decoded}"""
  }
}
