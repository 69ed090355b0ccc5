package graft.multimodal

import org.apache.spark.sql.SparkSession

/** Bench sidecar for the image near-dup tier: a deterministic synthetic
  * corpus of `nBase` distinct patterns, each shipped as THREE encodings —
  * the PNG original, a JPEG recompression, and a bilinear 48×48 rescale —
  * so the planted truth is exactly `3·nBase` intra-triple pairs. The
  * audit runs [[ImageDedup.nearDupPairs]] + [[ImageDedup.dedupImages]] at
  * the production knobs (4×16 bands, maxHamming 3) and reports both
  * quality axes (intra-triple recall, cross-triple pair count — the
  * false-positive axis) beside the wall time, the same
  * recall-AND-cost discipline as `ann_recall`.
  *
  * Image generation is driver-side (a few MB of PNG bytes) but hashing,
  * banding and pairing run the real distributed plan over a
  * parallelized frame — the measured path is the deployed one. */
object ImageAudit {

  /** Deterministic content-bearing pattern: a seeded random BINARY 9×8
    * block grid rendered at 8×8 px per cell (72×64). Two properties the
    * audit needs: (a) distinct seeds flip ~half the 64 comparator bits
    * (independent random levels), so cross-seed false pairs are the
    * banded tier's true false-positive rate, not an artifact of a
    * correlated fixture family; (b) the binary levels (32 vs 224) give
    * every dHash comparison a huge margin, so rescaling and JPEG
    * quantization cannot flip bits — intra-triple recall isolates the
    * HASH's invariance, not the fixture's fragility. */
  private def pattern(seed: Int): java.awt.image.BufferedImage = {
    val rnd = new java.util.Random(seed * 2654435761L + 1)
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

  /** Audio twin of the image audit: `nBase` distinct envelopes × three
    * encodings (16 kHz original, 8 kHz resample, 0.7× amplitude) through
    * [[AudioDedup]] at the production knobs. */
  def runAudio(spark: SparkSession, nBase: Int = 160): String = {
    import spark.implicits._
    def wavBytes(rate: Int, samples: Seq[Short]): Array[Byte] = {
      val data = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = {
        data.write(v & 0xff); data.write((v >> 8) & 0xff)
      }
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
    def clip(seed: Int, rate: Int, gain: Double): Array[Byte] = {
      val rnd = new java.util.Random(seed * 104729L + 7)
      val env = Array.fill(65)(0.1 + 0.9 * rnd.nextDouble())
      val n = rate / 4 // 250 ms
      wavBytes(rate, (0 until n).map { i =>
        val slot = ((i.toLong * 65) / n).toInt
        (gain * env(slot) *
          math.sin(2 * math.Pi * 440 * i / rate) * 16384).toShort
      })
    }
    val rows = (0 until nBase).flatMap { i =>
      Seq((3L * i, clip(i, 16000, 1.0)),
        (3L * i + 1, clip(i, 8000, 1.0)),
        (3L * i + 2, clip(i, 16000, 0.7)))
    }
    val df = rows.toDF("media_id", "media").repartition(8)
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val pairs = AudioDedup.nearDupPairs(df, "media", "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairSec = (System.nanoTime() - t0) / 1e9
    val (intra, cross) = connectivity(pairs, nBase)
    val possible = 3L * nBase
    f"""{"clips":${rows.size},"planted_pairs":$possible,"intra_pairs":$intra,"intra_recall":${intra.toDouble / possible}%.4f,"cross_pairs":$cross,"pair_sec":$pairSec%.3f}"""
  }

  /** Recall bookkeeping at the CONNECTIVITY level — the level the keep
    * tier consumes: since the banded tier's identical-signature
    * pre-collapse, the pair output is a connectivity-EQUIVALENT edge
    * set (star edges inside identical-signature groups, not the
    * C(m,2) clique), so a planted pair counts as recovered when both
    * endpoints share a connected component of the edge set. `cross` is
    * still the raw count of edges joining different triples (the
    * false-positive axis). Driver-side union-find over 3·nBase ids. */
  private def connectivity(pairs: Array[(Long, Long)],
                           nBase: Int): (Long, Long) = {
    val parent = Array.tabulate(3 * nBase)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    val cross = pairs.count { case (a, b) => a / 3 != b / 3 }.toLong
    pairs.foreach { case (a, b) =>
      val ra = find(a.toInt)
      val rb = find(b.toInt)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    var intra = 0L
    var i = 0
    while (i < nBase) {
      val b = 3 * i
      if (find(b) == find(b + 1)) intra += 1
      if (find(b) == find(b + 2)) intra += 1
      if (find(b + 1) == find(b + 2)) intra += 1
      i += 1
    }
    (intra, cross)
  }

  /** One JSON object (no outer braces handled by the caller). */
  def run(spark: SparkSession, nBase: Int = 160): String = {
    import spark.implicits._
    val rows = (0 until nBase).flatMap { i =>
      val base = pattern(i)
      Seq(
        (3L * i, encode(base, "png")),
        (3L * i + 1, encode(base, "jpg")),
        (3L * i + 2, encode(scaled(base, 54, 48), "png"))) // cell-aligned rescale
    }
    val df = rows.toDF("media_id", "media").repartition(8)
      .localCheckpoint(true)
    val t0 = System.nanoTime()
    val pairs = ImageDedup.nearDupPairs(df, "media", "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairSec = (System.nanoTime() - t0) / 1e9
    val (intra, cross) = connectivity(pairs, nBase)
    val possible = 3L * nBase // 3 unordered pairs per triple
    val t1 = System.nanoTime()
    val kept = ImageDedup.dedupImages(df, "media", "media_id")
      .filter(org.apache.spark.sql.functions.col("kept")).count()
    val dedupSec = (System.nanoTime() - t1) / 1e9
    f"""{"images":${rows.size},"planted_pairs":$possible,"intra_pairs":$intra,"intra_recall":${intra.toDouble / possible}%.4f,"cross_pairs":$cross,"pair_sec":$pairSec%.3f,"kept":$kept,"dedup_sec":$dedupSec%.3f}"""
  }
}
