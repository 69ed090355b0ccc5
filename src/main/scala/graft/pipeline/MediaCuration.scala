package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.multimodal.{AudioDedup, Banded64, ImageDedup, ImageHeader, VideoHeader}

/** The CURATION funnel for BYTE-COLUMN corpora — [[Curation]]'s sibling
  * for media frames (`media_id`, `media: binary`): size gate →
  * exact-bytes dedup → image near-dup keep-one → video (multi-frame
  * clip) near-dup keep-one → audio near-dup keep-one → optional
  * drop-unrecognized, each stage the already-audited operator composed
  * unchanged. Every tier only examines what it can decode (non-images
  * emit no dHash, non-clips no frame vector, non-WAV no energy hash),
  * so the stages are independent and garbage flows through to the
  * recognition gate. Multi-frame clips are the VIDEO tier's alone —
  * the probe withholds their first-frame dHash so two animations
  * sharing a title card cannot false-collapse in the image tier.
  *
  * Exact-bytes dedup runs FIRST (after the size gate): byte-identical
  * blobs — the dominant duplication mode in a crawl (the same meme
  * mirrored a million times) — collapse on a SHA-256 digest hash-agg
  * before any perceptual decode, so decode cost scales with DISTINCT
  * payloads and the banded tiers never see the m-copy pileup. Keep
  * policy within a digest group: lowest id (payloads are
  * byte-identical, so there is no quality axis to prefer).
  *
  * Keep policy in the perceptual tiers ([[ImageDedup.dedupImages]] /
  * [[AudioDedup.dedupAudio]]' policy): one survivor per near-dup
  * component, the largest payload, ties to the lowest id.
  * `dropUnrecognized` drops rows with NO parseable media identity (not
  * an image/video header the metadata walk reads, not decodable PCM
  * audio) — off by default: at crawl scale "unrecognized" usually means
  * "format we have not taught the parser yet", and a curation default
  * must not silently delete it.
  *
  * Decode-once: ONE `mapPartitions` probe scan over the exact-dedup
  * survivors computes (dhash, vhash, ahash, header format, payload
  * length) per payload; the probe sidecar (ids + longs + a short
  * format string, always locally checkpointed — that IS the
  * decode-once guarantee) then serves the image, video and audio
  * tiers AND the recognition gate without ever re-reading payload
  * bytes.
  *
  * Scale shape: only (id, digest/hash/metadata) columns cross any
  * exchange — media bytes ride the scans; the verdict joins are
  * ids-only. */
object MediaCuration {

  final case class Report(nInput: Long, nAfterSize: Long, nAfterExact: Long,
                          nAfterImageDedup: Long, nAfterAudioDedup: Long,
                          nOut: Long, nAfterVideoDedup: Long = -1L)

  /** Payloads probed (decoded) since JVM start — test instrumentation
    * for the decode-once guarantee (a [[java.util.concurrent.atomic.LongAdder]]
    * is per-JVM, which local-mode specs share with executors). */
  private[graft] val probedPayloads = new java.util.concurrent.atomic.LongAdder

  private val probeSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("dhash", LongType),
    StructField("ahash", LongType),
    StructField("format", StringType),
    StructField("vhash",
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false))))

  /** The one decode pass: (id, n_bytes, dhash?, ahash?, format?,
    * vhash?) per row — dHash via full image decode, energy hash via PCM
    * decode, format via the header byte-walk (image headers first, then
    * the video containers), frame-fingerprint vector via the sampled
    * GIF decode, all against bytes read ONCE per payload. A MULTI-frame
    * clip carries `vhash` and NO `dhash` — its identity is the frame
    * vote ([[graft.multimodal.VideoDedup]]), not the first frame the
    * image tier would otherwise hash (two animations sharing a title
    * card must not collapse). Single-frame GIFs stay the image tier's
    * (the clip probe costs them one extra cheap parse). */
  private[graft] def probe(df: DataFrame, bytesCol: String,
                           idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col(bytesCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.isNullAt(0) || r.isNullAt(1)) None
          else {
            val bytes = r.getAs[Array[Byte]](1)
            probedPayloads.increment()
            val fmt = ImageHeader.parse(bytes).map(_.format)
              .orElse(VideoHeader.parse(bytes).map(_.format))
            val clip = graft.multimodal.VideoDedup.clipHashes(bytes)
            Some(Row(r.getLong(0), bytes.length.toLong,
              if (clip.isDefined) null
              else ImageDedup.dHash(bytes).map(Long.box).orNull,
              AudioDedup.aHash(bytes).map(Long.box).orNull,
              fmt.orNull,
              clip.map(_.toSeq).orNull))
          }
        }
      }(Encoders.row(probeSchema))

  def curate(df: DataFrame, bytesCol: String, idCol: String,
             minBytes: Long = 1L, maxBytes: Long = Long.MaxValue,
             imageMaxHamming: Int = 3, audioMaxHamming: Int = 3,
             videoMaxHamming: Int = 3,
             videoMinMatch: Int = graft.multimodal.VideoDedup.DefaultMinMatch,
             dropUnrecognized: Boolean = false,
             audit: Boolean = true): (DataFrame, Report) = {
    def stage(d: DataFrame): DataFrame =
      if (audit) d.localCheckpoint(true) else d
    def n(d: DataFrame): Long = if (audit) d.count() else -1L
    val idL = col(idCol).cast("long")

    // 1. size gate: NULL or out-of-range payloads drop (an empty or
    // multi-GB blob is junk for every downstream decoder)
    val sized = stage(df.filter(
      length(col(bytesCol)).between(minBytes, maxBytes)))

    // 2. exact-bytes dedup: SHA-256 digest in-scan, hash-agg to the
    // min-id keeper — byte-identical copies never reach a decoder or a
    // band exchange (only (id, digest) crosses this one)
    val keepers = sized
      .select(idL.as("_eid"), sha2(col(bytesCol), 256).as("_digest"))
      .groupBy(col("_digest")).agg(min(col("_eid")).as("_keep"))
      .select(col("_keep"))
    val afterExact = stage(sized.join(keepers, idL === col("_keep"),
      "left_semi"))

    // one decode pass over the distinct payloads; the sidecar is always
    // checkpointed so every downstream consumer reuses it
    val probes = probe(afterExact, bytesCol, idCol).localCheckpoint(true)

    // 3. image near-dup keep-one (non-images never hash -> untouched)
    val imgPairs = Banded64.pairs(
      probes.filter(col("dhash").isNotNull).select(col("id"), col("dhash")),
      "dhash", imageMaxHamming)
    val imgDrop = graft.operators.Dedup
      .keepCanonical(probes.select(col("id"), col("n_bytes")), "id",
        "n_bytes", imgPairs)
      .filter(!col("kept")).select(col("id").as("_did"))
    val afterImg = stage(afterExact.join(imgDrop, idL === col("_did"),
      "left_anti"))
    val probesImg = probes.join(imgDrop.withColumnRenamed("_did", "id"),
      Seq("id"), "left_anti")

    // 4. video (multi-frame clip) near-dup keep-one — frame-fingerprint
    // voting over the probe's vhash vectors ([[graft.multimodal
    // .VideoDedup]]); stills/audio/garbage carry no vhash -> untouched
    val vidPairs = graft.multimodal.VideoDedup.pairsFromHashes(
      probesImg.filter(col("vhash").isNotNull)
        .select(col("id"), posexplode(col("vhash")).as(Seq("pos", "fhash"))),
      videoMaxHamming, videoMinMatch)
    val vidDrop = graft.operators.Dedup
      .keepCanonical(probesImg.select(col("id"), col("n_bytes")), "id",
        "n_bytes", vidPairs)
      .filter(!col("kept")).select(col("id").as("_did"))
    val afterVid = stage(afterImg.join(vidDrop, idL === col("_did"),
      "left_anti"))
    val probesVid = probesImg.join(vidDrop.withColumnRenamed("_did", "id"),
      Seq("id"), "left_anti")

    // 5. audio near-dup keep-one (non-audio never hashes -> untouched)
    val audPairs = Banded64.pairs(
      probesVid.filter(col("ahash").isNotNull).select(col("id"), col("ahash")),
      "ahash", audioMaxHamming)
    val audDrop = graft.operators.Dedup
      .keepCanonical(probesVid.select(col("id"), col("n_bytes")), "id",
        "n_bytes", audPairs)
      .filter(!col("kept")).select(col("id").as("_did"))
    val afterAud = stage(afterVid.join(audDrop, idL === col("_did"),
      "left_anti"))

    // 6. optional recognition gate: keep rows with SOME parseable media
    // identity — an image/video header (the metadata walk) or decodable
    // PCM audio; the verdict reuses the probe sidecar (no re-decode)
    val out =
      if (!dropUnrecognized) afterAud
      else {
        val recognized = probes
          .filter(col("format").isNotNull || col("ahash").isNotNull)
          .select(col("id").as("_rid"))
        stage(afterAud.join(recognized, idL === col("_rid"), "left_semi"))
      }
    (out, Report(nInput = n(df), nAfterSize = n(sized),
      nAfterExact = n(afterExact), nAfterImageDedup = n(afterImg),
      nAfterAudioDedup = n(afterAud), nOut = n(out),
      nAfterVideoDedup = n(afterVid)))
  }
}
