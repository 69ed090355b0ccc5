package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** VIDEO near-duplicate detection by FRAME-FINGERPRINT VOTING — the
  * multi-frame tier the image tier cannot serve: `ImageDedup.dHash`
  * hashes a container's FIRST frame (that is what `ImageIO.read`
  * decodes), so two animations sharing a title card would false-collapse
  * and two cuts of one clip with different openings would never pair.
  * This tier samples [[FrameSamples]] frames evenly across the clip
  * (the [[Multimodal.sampleFramesDecoded]] stride), spatial-dHashes each
  * composited frame, and calls two clips near-duplicates when at least
  * `minMatch` of the positions agree within `maxHamming` bits — the
  * standard video-fingerprint shape (per-frame perceptual hashes +
  * positional voting), re-encoding/rescale-invariant because the frame
  * hash is.
  *
  * Container reality: animated GIF is the one multi-frame container the
  * JDK decodes (the honest stand-in for video — MP4/WebM frame decode
  * stays the documented environment stub; their container METADATA is
  * real via [[VideoHeader]]). Single-frame GIFs and stills emit nothing
  * here — they are [[ImageDedup]]'s job. Undecodable or over-bound
  * payloads emit nothing and pass any keep tier unclustered.
  *
  * Scale shape: decode + n hashes ride a mapPartitions scan (bytes never
  * cross an exchange; snapshots peak at n × canvas, canvas gated at 1 MP
  * by [[Multimodal.gifSampledFrames]]); identical clip signatures
  * collapse to a min-id representative BEFORE banding (the engine-wide
  * pre-collapse — m re-uploads of one meme cost m−1 star edges); only
  * DISTINCT clip signatures band per (position, 16-bit key), and the
  * popcount verify runs map-side before the per-pair vote count. */
object VideoDedup {

  /** Frames sampled per clip — the voting positions. */
  val FrameSamples: Int = 9

  /** Default vote threshold: 7 of 9 positions within [[FrameSamples]]
    * default sampling — tolerant of one trimmed/retimed segment, far
    * above chance agreement for distinct content. */
  val DefaultMinMatch: Int = 7

  private def toImage(p: Multimodal.Pixels): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      p.width, p.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    var i = 0
    while (y < p.height) {
      var x = 0
      while (x < p.width) {
        img.setRGB(x, y, ((p.rgb(i) & 0xff) << 16) |
          ((p.rgb(i + 1) & 0xff) << 8) | (p.rgb(i + 2) & 0xff))
        i += 3
        x += 1
      }
      y += 1
    }
    img
  }

  /** Spatial 9×8 dHash of one composited frame (bilinear resize, the
    * [[ImageDedup]] comparison core). */
  private[multimodal] def frameDHash(p: Multimodal.Pixels): Long = {
    val dst = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(toImage(p), 0, 0, 9, 8, null)
    } finally g.dispose()
    val rgb = new Array[Byte](9 * 8 * 3)
    var y = 0
    var i = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val px = dst.getRGB(x, y)
        rgb(i) = ((px >> 16) & 0xff).toByte
        rgb(i + 1) = ((px >> 8) & 0xff).toByte
        rgb(i + 2) = (px & 0xff).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    ImageDedup.dHashOf(Multimodal.Pixels(9, 8, rgb))
  }

  /** Per-clip sampled-frame hashes of one payload: `n` (position, hash)
    * entries for a MULTI-frame decodable clip, None otherwise. */
  def clipHashes(bytes: Array[Byte],
                 n: Int = FrameSamples): Option[IndexedSeq[Long]] =
    Multimodal.gifSampledFrames(bytes, n).collect {
      case (total, frames) if total >= 2 => frames.map(frameDHash)
    }

  /** (id, pos, fhash) for every MULTI-frame decodable clip — `n` rows
    * per clip, decode + hash in the scan; `idCol` must be long-castable
    * (the dedup family contract). */
  def frameHashes(df: DataFrame, bytesCol: String, idCol: String,
                  n: Int = FrameSamples): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false),
      StructField("fhash", LongType, nullable = false)))
    df.select(col(idCol).cast("long").as("id"), col(bytesCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.isNullAt(0) || r.isNullAt(1)) Iterator.empty
          else clipHashes(r.getAs[Array[Byte]](1), n) match {
            case Some(hs) =>
              hs.iterator.zipWithIndex.map { case (h, p) =>
                Row(r.getLong(0), p, h)
              }
            case None => Iterator.empty
          }
        }
      }(Encoders.row(outSchema))
  }

  /** Near-dup clip pairs from a long-format hash table (id, pos, fhash)
    * — the composition entry the media funnel's probe sidecar feeds.
    * Output: (id_a, id_b, n_match), id_a < id_b, n_match = positions
    * agreeing within `maxHamming`, ≥ `minMatch`.
    *
    * CONSTRAINT: `minMatch` must not exceed the number of positions per
    * clip in `fh` — an unsatisfiable threshold (e.g. 5 sampled frames
    * under the default `minMatch = 7`) would make the tier silently
    * inert (even byte-identical clips score n_match = n < minMatch).
    * This long-format entry cannot see the sampling width statically,
    * so [[nearDupPairs]] / [[dedupClips]] enforce `minMatch <= n` loud
    * at the call boundary; callers feeding `fh` directly (the media
    * funnel probe) own the same invariant. */
  def pairsFromHashes(fh: DataFrame, maxHamming: Int = 3,
                      minMatch: Int = DefaultMinMatch): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64, "maxHamming in [0,64]")
    require(minMatch >= 1, "minMatch must be >= 1")
    val checkpointed = fh.localCheckpoint(true)
    // clip signature = the position-ordered hash vector; identical
    // signatures collapse to a min-id rep (the engine-wide pre-collapse)
    val sigs = checkpointed.groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("fhash"))))
        .as("vsig"))
    val withRep = sigs.withColumn("_rep", min(col("id")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("vsig"))))
    val nPos = checkpointed.groupBy(col("id"))
      .agg(count(lit(1)).as("_np"))
    val star = withRep.filter(col("id") =!= col("_rep"))
      .join(nPos, Seq("id"))
      .select(col("_rep").as("id_a"), col("id").as("id_b"),
        col("_np").as("n_match"))
    // DISTINCT clip signatures band per (position, band, 16-bit key);
    // the popcount verify runs map-side, then the per-pair vote
    val repFh = checkpointed.join(
      withRep.filter(col("id") === col("_rep")).select(col("id")),
      Seq("id"), "left_semi")
    def bandKeys(sig: Column): Column =
      array((0 until 4).map(b =>
        shiftright(sig, b * 16).bitwiseAND(lit(65535L))): _*)
    val bands = repFh.select(col("id"), col("pos"), col("fhash"),
      posexplode(bandKeys(col("fhash"))).as(Seq("band", "bkey")))
    val cross = bands.as("x")
      .join(bands.as("y"),
        col("x.pos") === col("y.pos") && col("x.band") === col("y.band") &&
          col("x.bkey") === col("y.bkey") && col("x.id") < col("y.id"))
      .filter(bit_count(col("x.fhash").bitwiseXOR(col("y.fhash")))
        <= maxHamming)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("x.pos"))
      .distinct()
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_match"))
    star.unionByName(cross).filter(col("n_match") >= minMatch)
  }

  /** Near-dup clip pairs straight from payloads. Fails loud on an
    * unsatisfiable vote threshold (`minMatch > n` can never fire — the
    * tier would silently detect nothing, against the engine's
    * fail-loud contract). */
  def nearDupPairs(df: DataFrame, bytesCol: String, idCol: String,
                   maxHamming: Int = 3, minMatch: Int = DefaultMinMatch,
                   n: Int = FrameSamples): DataFrame = {
    require(minMatch <= n,
      s"minMatch=$minMatch exceeds the $n sampled positions per clip — " +
        "no pair could ever reach the vote threshold; lower minMatch or " +
        "sample more frames")
    pairsFromHashes(frameHashes(df, bytesCol, idCol, n), maxHamming,
      minMatch)
  }

  /** Keep-one over a clip corpus ([[ImageDedup.dedupImages]]' contract):
    * one survivor per near-dup component — the largest payload, ties to
    * the lowest id; non-clips pass unclustered. Output:
    * (idCol, component, kept). */
  def dedupClips(df: DataFrame, bytesCol: String, idCol: String,
                 maxHamming: Int = 3,
                 minMatch: Int = DefaultMinMatch): DataFrame = {
    val pairs = nearDupPairs(df, bytesCol, idCol, maxHamming, minMatch)
    val withQ = df.select(col(idCol).cast("long").as(idCol),
      coalesce(length(col(bytesCol)).cast("long"), lit(0L)).as("_q"))
    graft.operators.Dedup.keepCanonical(withQ, idCol, "_q", pairs)
  }
}
