package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * Image decode and resize are REAL — `javax.imageio` ships in the JDK
  * (PNG/GIF/BMP/JPEG), so [[decodeImage]] produces actual RGB pixels and
  * [[resizeImage]] actual bilinear-scaled pixels; WAV PCM decode is real
  * ([[decodeWav]]), and multi-frame extraction is real for animated GIF
  * ([[decodeGifFrames]]/[[sampleFramesDecoded]] — the one multi-frame
  * container with a JDK codec). Payloads nothing in the JDK can read
  * (MP4/WebM video, compressed audio; a 100 TB crawl always contains
  * garbage) fall back to the deterministic byte-derived stubs so the
  * pipeline stays total. The execution shape
  * is the scale path either way: repartition so each task holds a
  * codec-friendly batch, decode inside `mapPartitions` (one codec init per
  * task, not per row), and emit fixed metadata + feature columns.
  */
object Multimodal {

  /** Decoded raster: row-major RGB, 3 bytes per pixel. */
  final case class Pixels(width: Int, height: Int, rgb: Array[Byte])

  /** Cheap magic-byte pre-filter before ImageIO: a 100 TB crawl is mostly
    * non-image bytes, and without this every garbage row still pays
    * ImageIO's format-sniffing across all registered readers. Deliberately
    * BROADER than [[ImageHeader.parse]] (magic only, no header-well-formed
    * requirement) so formats ImageIO can decode but the header parser
    * cannot fully parse — TIFF, BITMAPCOREHEADER BMPs — still reach the
    * real decoder. Known loss: WBMP has no magic bytes and is skipped. */
  private def looksLikeImage(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 4) return false
    def u(i: Int) = b(i) & 0xff
    (u(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // png
    (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||                 // gif
    (b(0) == 'B' && b(1) == 'M') ||                                // bmp (any header)
    (u(0) == 0xff && u(1) == 0xd8) ||                              // jpeg
    (b(0) == 'I' && b(1) == 'I' && u(2) == 0x2a && u(3) == 0) ||   // tiff LE
    (b(0) == 'M' && b(1) == 'M' && u(2) == 0 && u(3) == 0x2a)      // tiff BE
  }

  /** REAL image decode via `javax.imageio` (pure JDK). None when the
    * payload is not a decodable image (formats are those the header
    * parser recognizes: PNG/GIF/BMP/JPEG). */
  def decodeImage(bytes: Array[Byte]): Option[Pixels] = {
    if (bytes == null || bytes.isEmpty || !looksLikeImage(bytes)) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None else Some(toPixels(img))
    } catch { case _: Exception => None }
  }

  /** Argument check shared by every resize entry point: non-positive or
    * overflowing dimensions must fail at call time on the driver. */
  private def requireDims(outW: Int, outH: Int): Unit = {
    require(outW > 0 && outH > 0,
      s"resize dimensions must be positive, got ${outW}x$outH")
    require(outW.toLong * outH * 3 <= Int.MaxValue,
      s"resize output ${outW}x$outH exceeds the maximum byte-array size")
  }

  /** REAL resize: decode, bilinear-scale to (outW, outH), return raw RGB.
    * None when the payload is not a decodable image. */
  def resizeImage(bytes: Array[Byte], outW: Int, outH: Int): Option[Pixels] = {
    requireDims(outW, outH)
    if (bytes == null || bytes.isEmpty || !looksLikeImage(bytes)) return None
    try {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (src == null) None
      else {
        val dst = new java.awt.image.BufferedImage(
          outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, outW, outH, null)
        } finally g.dispose()
        Some(toPixels(dst))
      }
    } catch { case _: Exception => None }
  }

  private def toPixels(img: java.awt.image.BufferedImage): Pixels = {
    val w = img.getWidth
    val h = img.getHeight
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        rgb(i) = ((p >> 16) & 0xff).toByte
        rgb(i + 1) = ((p >> 8) & 0xff).toByte
        rgb(i + 2) = (p & 0xff).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    Pixels(w, h, rgb)
  }

  /** Features from real pixels: per-channel means (0..1) then a luminance
    * histogram over the remaining buckets — deterministic, bounded, and
    * actually about the image content. */
  def imageFeatures(p: Pixels, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = p.width * p.height
    if (n == 0 || dim == 0) return out
    val channelDims = math.min(3, dim)
    val histDims = dim - channelDims
    val sums = new Array[Long](3)
    var i = 0
    while (i < p.rgb.length) {
      val r = p.rgb(i) & 0xff
      val g = p.rgb(i + 1) & 0xff
      val b = p.rgb(i + 2) & 0xff
      sums(0) += r; sums(1) += g; sums(2) += b
      if (histDims > 0) {
        val lum = (299 * r + 587 * g + 114 * b) / 1000
        out(channelDims + math.min(histDims - 1, lum * histDims / 256)) += 1f
      }
      i += 3
    }
    var c = 0
    while (c < channelDims) { out(c) = sums(c).toFloat / (255f * n); c += 1 }
    var k = channelDims
    while (k < dim) { out(k) /= n; k += 1 }
    out
  }

  /** Canonical media schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Decoded audio: interleaved samples normalized to [-1, 1). */
  final case class AudioClip(sampleRate: Int, channels: Int,
                             bitsPerSample: Int, samples: Array[Float])

  /** REAL WAV decode: RIFF chunk walk (same discipline as
    * [[ImageHeader.parse]]) to the `fmt ` and `data` chunks, then PCM
    * samples (8-bit unsigned, 16/24/32-bit signed little-endian) normalized
    * to floats. Pure JVM, no codec library. None for anything that is not
    * integer-PCM WAV. */
  def decodeWav(bytes: Array[Byte]): Option[AudioClip] = {
    if (bytes == null || bytes.length < 44) return None
    def u8(i: Int) = bytes(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return None
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var i = 12L // Long cursor: crafted chunk sizes must not wrap (ImageHeader note)
    while (i + 8 <= bytes.length) {
      val p = i.toInt
      val tag = new String(bytes, p, 4, "US-ASCII")
      val len = le32(p + 4).toLong & 0xffffffffL
      if (tag == "fmt ") {
        if (len < 16 || p + 8 + 16 > bytes.length) return None
        val audioFormat = le16(p + 8)
        if (audioFormat != 1) return None // integer PCM only
        fmt = Some((le16(p + 10), le32(p + 12), le16(p + 22)))
      } else if (tag == "data" && fmt.nonEmpty) {
        val (channels, rate, bits) = fmt.get
        if (channels < 1 || !Set(8, 16, 24, 32).contains(bits)) return None
        val bytesPerSample = bits / 8
        val avail = math.min(len, (bytes.length - p - 8).toLong)
        val n = (avail / bytesPerSample).toInt
        val out = new Array[Float](n)
        var s = 0
        while (s < n) {
          val o = p + 8 + s * bytesPerSample
          out(s) = bits match {
            case 8 => (u8(o) - 128) / 128f
            case 16 => le16(o).toShort / 32768f
            case 24 =>
              val v = u8(o) | (u8(o + 1) << 8) | (u8(o + 2) << 16)
              ((v << 8) >> 8) / 8388608f // sign-extend 24 -> 32
            case 32 => le32(o) / 2147483648f
          }
          s += 1
        }
        return Some(AudioClip(rate, channels, bits, out))
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    None
  }

  /** Features from real audio: per-window RMS energy over the mono mix —
    * `dim` equal time windows, deterministic and bounded. */
  def audioFeatures(clip: AudioClip, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val frames = clip.samples.length / clip.channels
    if (frames == 0 || dim == 0) return out
    var w = 0
    while (w < dim) {
      val from = (w.toLong * frames / dim).toInt
      val until = ((w + 1).toLong * frames / dim).toInt
      var acc = 0.0
      var f = from
      while (f < until) {
        var c = 0
        var mono = 0.0
        while (c < clip.channels) { mono += clip.samples(f * clip.channels + c); c += 1 }
        mono /= clip.channels
        acc += mono * mono
        f += 1
      }
      out(w) = if (until > from) math.sqrt(acc / (until - from)).toFloat else 0f
      w += 1
    }
    out
  }

  /** Audio decode + featurize, same per-partition shape and schema as
    * [[featurize]]: real WAV-PCM clips yield RMS-window features
    * (`decoded = true`); anything else falls back to the byte-hash stub. */
  def featurizeAudio(df: DataFrame, bytesCol: String, idCol: String,
                     dim: Int = 8): DataFrame =
    decodePartitions(df, bytesCol, idCol, featureSchema) { (id, bytes) =>
      decodeWav(bytes) match {
        case Some(clip) => Row(id, bytes.length, true,
          audioFeatures(clip, dim).toSeq)
        case None => Row(id, if (bytes == null) 0 else bytes.length,
          false, decodeStub(bytes, dim).toSeq)
      }
    }

  /** FALLBACK for payloads [[decodeImage]]/[[decodeWav]] cannot read (and
    * the stand-in for the video codecs this container lacks): a rolling
    * byte hash seeds `dim` deterministic pseudo-features, keeping the
    * pipeline total over garbage bytes. */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L
    if (bytes != null) bytes.foreach { b => h = h * 31 + (b & 0xff) }
    Array.tabulate(dim) { i =>
      val v = h * (i + 1) + 0x9e3779b97f4a7c15L * i
      ((v >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
  }

  /** The shared per-partition decode shell (the `mapInPandas` analog): one
    * codec init per task (ImageIO's disk-backed stream cache off — a temp
    * file per row otherwise), rows processed as an iterator, output schema
    * fixed up-front. Every decode surface (image/audio featurize, resize)
    * goes through here so the (media_id, n_bytes, decoded, ...) contract
    * cannot drift between them. */
  private def decodePartitions(df: DataFrame, bytesCol: String, idCol: String,
      outSchema: StructType)(rowFn: (Long, Array[Byte]) => Row): DataFrame =
    decodeShell(df, bytesCol, idCol, outSchema)(
      _.map(r => rowFn(r.getLong(0), r.getAs[Array[Byte]](1))))

  /** One-to-many variant of the shell (frame sampling emits n rows per
    * media row) — same codec init and contract, no per-row wrapper on the
    * one-to-one surfaces. */
  private def decodePartitionsFlat(df: DataFrame, bytesCol: String,
      idCol: String, outSchema: StructType)(
      rowFn: (Long, Array[Byte]) => Seq[Row]): DataFrame =
    decodeShell(df, bytesCol, idCol, outSchema)(
      _.flatMap(r => rowFn(r.getLong(0), r.getAs[Array[Byte]](1))))

  private def decodeShell(df: DataFrame, bytesCol: String, idCol: String,
      outSchema: StructType)(
      partFn: Iterator[Row] => Iterator[Row]): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol), col(bytesCol)).rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // codec init, once per task
      partFn(rows)
    }
    spark.createDataFrame(rdd, outSchema)
  }

  private def featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("features", ArrayType(FloatType), nullable = false)))

  /** Decode + featurize images per partition: decodable payloads yield
    * REAL pixel-derived features ([[imageFeatures]], `decoded = true`);
    * anything else falls back to the byte-hash stub (`decoded = false`). */
  def featurize(df: DataFrame, bytesCol: String, idCol: String,
                dim: Int = 8): DataFrame =
    decodePartitions(df, bytesCol, idCol, featureSchema) { (id, bytes) =>
      decodeImage(bytes) match {
        case Some(p) => Row(id, bytes.length, true, imageFeatures(p, dim).toSeq)
        case None => Row(id, if (bytes == null) 0 else bytes.length,
          false, decodeStub(bytes, dim).toSeq)
      }
    }

  /** Header inspection: REAL (non-stub) metadata extraction — container
    * format, dimensions and bit depth parsed from the leading bytes by
    * [[ImageHeader]], per-partition like [[featurize]]. Unrecognized
    * payloads yield nulls rather than dropping rows (a 100 TB crawl always
    * contains garbage; filtering is the caller's policy decision). */
  def inspectImages(df: DataFrame, bytesCol: String, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("bit_depth", IntegerType)))
    decodePartitions(df, bytesCol, idCol, outSchema) { (id, bytes) =>
      ImageHeader.parse(bytes) match {
        case Some(m) => Row(id, bytes.length, m.format, m.width, m.height, m.bitDepth)
        case None => Row(id, if (bytes == null) 0 else bytes.length,
          null, null, null, null)
      }
    }
  }

  /** Unified MEDIA inspection — [[inspectImages]] widened to the video
    * containers: stills and WAV parse through [[ImageHeader]] (width/
    * height/bit depth, no duration), MP4 and WebM through
    * [[VideoHeader]] (pure byte-walk of the container — REAL format,
    * dimensions and duration without any codec; frame decode remains
    * the labeled stub elsewhere). Unrecognized payloads keep their row
    * with null metadata — filtering is the caller's policy. */
  def inspectMedia(df: DataFrame, bytesCol: String, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("bit_depth", IntegerType),
      StructField("duration_ms", LongType)))
    decodePartitions(df, bytesCol, idCol, outSchema) { (id, bytes) =>
      val nb = if (bytes == null) 0 else bytes.length
      ImageHeader.parse(bytes) match {
        case Some(m) => Row(id, nb, m.format, m.width, m.height,
          m.bitDepth, null)
        case None => VideoHeader.parse(bytes) match {
          case Some(v) => Row(id, nb, v.format,
            if (v.width > 0) v.width else null,
            if (v.height > 0) v.height else null, null,
            if (v.durationMs >= 0) v.durationMs else null)
          case None => Row(id, nb, null, null, null, null, null)
        }
      }
    }
  }

  /** FALLBACK for payloads [[resizeImage]] cannot read: samples
    * `outW*outH*3` bytes from the payload on a fixed stride (same
    * 3-bytes-per-pixel shape as the real path), keeping the pipeline
    * total over garbage bytes. */
  def resizeStub(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    requireDims(outW, outH)
    val n = outW * outH * 3
    val out = new Array[Byte](n)
    if (bytes != null && bytes.nonEmpty) {
      var i = 0
      while (i < n) {
        out(i) = bytes((i.toLong * bytes.length / n).toInt)
        i += 1
      }
    }
    out
  }

  /** Resize via per-partition batches: decodable images take the REAL
    * bilinear path ([[resizeImage]], `decoded = true`, payload = raw RGB
    * at 3 bytes/pixel); anything else falls back to the stride-sampling
    * stub with the same output shape (`decoded = false`). */
  def resize(df: DataFrame, bytesCol: String, idCol: String,
             outW: Int, outH: Int): DataFrame = {
    requireDims(outW, outH) // fail on the driver at call time, not per-row
                            // inside an executor task with a confusing
                            // NegativeArraySizeException
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("decoded", BooleanType, nullable = false)))
    decodePartitions(df, bytesCol, idCol, outSchema) { (id, bytes) =>
      resizeImage(bytes, outW, outH) match {
        case Some(p) => Row(id, p.rgb, outW, outH, true)
        case None => Row(id, resizeStub(bytes, outW, outH), outW, outH, false)
      }
    }
  }

  /** Frame-sampling shape: explode a media row into n evenly-spaced frame
    * stubs (id, frame_no, offset_ratio) — the plumbing for video pipelines. */
  def sampleFrames(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("media_id"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_no"))
      .withColumn("offset_ratio", col("frame_no").cast("double") / n)

  /** Adversarial-payload bounds for GIF decoding: one crawl row must never
    * take down a task. A canvas past [[MaxGifPixels]] or a container past
    * [[MaxGifFrames]] is treated as undecodable (stub fallback), not
    * decoded-until-OOM. 64 MP ≈ 192 MB of canvas RGB — roomy for real
    * media, far below task heap. */
  val MaxGifPixels: Long = 64L * 1024 * 1024
  val MaxGifFrames: Int = 4096

  /** REAL multi-frame decode for the one multi-frame container the JDK
    * ships a codec for: animated GIF — the honest stand-in for video
    * frame extraction (MP4/WebM codecs are absent from the JDK; those
    * stay [[decodeStub]]-fallback rows). The canvas is the GIF's logical
    * screen (from the stream metadata — frame 0's bounds alone would clip
    * optimizer-produced sub-rect first frames); delta frames composite at
    * their ImageDescriptor offsets under the "do not dispose" policy —
    * the dominant encoding for animation deltas; restore-to-background
    * GIFs show stale pixels outside the delta rect, a documented fidelity
    * bound of the JDK codec path. Returns the frames at `wanted` indices
    * in ascending order (all frames when None; out-of-range indices are
    * ignored, an effectively-empty set yields Some(empty) — a readable
    * GIF is never misreported as undecodable), compositing incrementally
    * so memory is O(canvas + wanted), not O(canvas × frames). None when
    * the payload is not a readable GIF or exceeds the decode bounds
    * ([[MaxGifFrames]], per-frame and canvas [[MaxGifPixels]] — checked
    * header-only BEFORE any raster allocates). */
  def decodeGifFrames(bytes: Array[Byte],
                      wanted: Option[Set[Int]] = None): Option[IndexedSeq[Pixels]] =
    decodeGif(bytes, total =>
      wanted.map(_.filter(i => i >= 0 && i < total).toSeq.sorted)
        .getOrElse(0 until total))
      .map(_.map(_._2).toIndexedSeq)

  /** Evenly-sampled composited frames of a MULTI-sample plan — the
    * video-fingerprint decode: `n` frame indices on the
    * [[sampleFramesDecoded]] stride (`k·total/n`, duplicates folded),
    * returned with the container's total frame count. Canvas gated at
    * `maxCanvasPixels` BEFORE any decode (the GIF header's logical
    * screen via [[ImageHeader]]) — the sampled snapshots peak at
    * n × canvas bytes of task memory, so the fingerprint path bounds
    * the canvas far below [[MaxGifPixels]]' single-frame bound.
    * None when not a readable GIF or past a bound. */
  private[multimodal] def gifSampledFrames(bytes: Array[Byte], n: Int,
      maxCanvasPixels: Long = 1L << 20): Option[(Int, IndexedSeq[Pixels])] = {
    require(n >= 1, "sample count must be >= 1")
    if (bytes == null) return None
    val headOk = ImageHeader.parse(bytes).exists(m =>
      m.format == "gif" && m.width.toLong * m.height <= maxCanvasPixels)
    if (!headOk) None
    else {
      var total = 0
      decodeGif(bytes, t => {
        total = t
        (0 until n).map(k => (k.toLong * t / n).toInt).distinct
      }).map { frames =>
        val byIndex = frames.toMap
        (total, (0 until n)
          .map(k => byIndex((k.toLong * total / n).toInt)).toIndexedSeq)
      }
    }
  }

  /** Single-parse core shared by [[decodeGifFrames]] and
    * [[sampleFramesDecoded]]: one container scan yields the frame count,
    * `plan(total)` picks the indices to materialize (must be sorted,
    * in-range), and frames composite incrementally — only planned indices
    * snapshot to [[Pixels]]. Every frame's declared dimensions are
    * checked HEADER-ONLY (`reader.getWidth/getHeight`) against
    * [[MaxGifPixels]] BEFORE `reader.read` allocates its raster: a
    * crafted descriptor cannot OOM the task by declaring a huge frame.
    * An empty plan returns Some(empty) — a readable GIF is never
    * misreported as undecodable. */
  private def decodeGif(bytes: Array[Byte],
      plan: Int => Seq[Int]): Option[Seq[(Int, Pixels)]] = {
    if (bytes == null || bytes.length < 3 ||
        !(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, false, false)
          val n = reader.getNumImages(true)
          if (n <= 0 || n > MaxGifFrames) return None
          val indices = plan(n)
          require(indices.forall(i => i >= 0 && i < n),
            s"frame plan out of range for $n frames: $indices")
          if (indices.isEmpty) return Some(Seq.empty)
          val wantedSet = indices.toSet
          val last = indices.last
          var canvas: java.awt.image.BufferedImage = null
          val out = Seq.newBuilder[(Int, Pixels)]
          var i = 0
          while (i <= last) {
            // header-only bound BEFORE the raster allocates
            if (reader.getWidth(i).toLong * reader.getHeight(i) > MaxGifPixels)
              return None
            val frame = reader.read(i)
            val (ox, oy) = gifFrameOffset(reader, i)
            if (canvas == null) {
              val (lw, lh) = gifLogicalScreen(reader)
                .getOrElse((ox + frame.getWidth, oy + frame.getHeight))
              val w = lw max (ox + frame.getWidth)
              val h = lh max (oy + frame.getHeight)
              if (w.toLong * h > MaxGifPixels) return None
              canvas = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            }
            val g = canvas.createGraphics()
            try g.drawImage(frame, ox, oy, null) finally g.dispose()
            if (wantedSet.contains(i)) out += ((i, toPixels(canvas)))
            i += 1
          }
          Some(out.result())
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** Logical screen (width, height) from the GIF stream metadata; None
    * when the node is missing or unparsable. */
  private def gifLogicalScreen(
      reader: javax.imageio.ImageReader): Option[(Int, Int)] =
    try {
      val tree = reader.getStreamMetadata
        .getAsTree("javax_imageio_gif_stream_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val nodes = tree.getElementsByTagName("LogicalScreenDescriptor")
      if (nodes.getLength == 0) None
      else {
        val d = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
        val w = d.getAttribute("logicalScreenWidth").toInt
        val h = d.getAttribute("logicalScreenHeight").toInt
        if (w > 0 && h > 0) Some((w, h)) else None
      }
    } catch { case _: Exception => None }

  /** (left, top) placement of frame `i` from the GIF ImageDescriptor
    * metadata; (0, 0) when the node is missing. */
  private def gifFrameOffset(reader: javax.imageio.ImageReader, i: Int): (Int, Int) =
    try {
      val md = reader.getImageMetadata(i)
      val tree = md.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val nodes = tree.getElementsByTagName("ImageDescriptor")
      if (nodes.getLength == 0) (0, 0)
      else {
        val d = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
        (d.getAttribute("imageLeftPosition").toInt,
          d.getAttribute("imageTopPosition").toInt)
      }
    } catch { case _: Exception => (0, 0) }

  /** Frame sampling with REAL decode: each media row explodes into
    * `n` evenly-spaced decoded frames (frame index `k·nFrames/n`).
    * Animated GIFs yield real composited pixels (`decoded = true` —
    * ONE container parse per row, only the sampled frames materialize,
    * see [[decodeGif]]); payloads without a JDK multi-frame codec keep
    * the index-only rows with null pixels (`decoded = false`) so the
    * pipeline stays total — same contract as every other decode surface
    * here. */
  def sampleFramesDecoded(df: DataFrame, bytesCol: String, idCol: String,
                          n: Int): DataFrame = {
    require(n >= 1, "frame sample count must be >= 1")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame_index", IntegerType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("rgb", org.apache.spark.sql.types.BinaryType),
      StructField("decoded", BooleanType, nullable = false)))
    decodePartitionsFlat(df, bytesCol, idCol, outSchema) { (id, bytes) =>
      var total = 0 // captured by the plan during decodeGif's single parse
      val sampled = decodeGif(bytes, t => {
        total = t
        (0 until n).map(k => (k.toLong * t / n).toInt).distinct
      }).map { frames =>
        val byIndex = frames.toMap
        (0 until n).map { k =>
          val idx = (k.toLong * total / n).toInt
          val p = byIndex(idx)
          Row(id, k, idx, p.width, p.height, p.rgb, true)
        }
      }
      sampled.getOrElse((0 until n).map(k => Row(id, k, k, null, null, null, false)))
    }
  }
}
