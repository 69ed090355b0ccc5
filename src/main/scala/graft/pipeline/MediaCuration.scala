package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.multimodal.{AudioDedup, ImageDedup, Multimodal}

/** The CURATION funnel for BYTE-COLUMN corpora — [[Curation]]'s sibling
  * for media frames (`media_id`, `media: binary`): size gate → image
  * near-dup keep-one → audio near-dup keep-one → optional
  * drop-unrecognized, each stage the already-audited operator composed
  * unchanged. Every tier only examines what it can decode (non-images
  * emit no dHash, non-WAV no energy hash), so the stages are
  * independent and garbage flows through to the recognition gate.
  *
  * Keep policy is per tier ([[ImageDedup.dedupImages]] /
  * [[AudioDedup.dedupAudio]]): one survivor per near-dup component, the
  * largest payload, ties to the lowest id. `dropUnrecognized` drops
  * rows with NO parseable media identity (not an image/video header the
  * metadata walk reads, not decodable PCM audio) — off by default: at
  * crawl scale "unrecognized" usually means "format we have not taught
  * the parser yet", and a curation default must not silently delete it.
  *
  * Scale shape: only (id, hash/metadata) longs cross any exchange —
  * media bytes ride the scans; the verdict joins are ids-only. */
object MediaCuration {

  final case class Report(nInput: Long, nAfterSize: Long,
                          nAfterImageDedup: Long, nAfterAudioDedup: Long,
                          nOut: Long)

  def curate(df: DataFrame, bytesCol: String, idCol: String,
             minBytes: Long = 1L, maxBytes: Long = Long.MaxValue,
             imageMaxHamming: Int = 3, audioMaxHamming: Int = 3,
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

    // 2. image near-dup keep-one (non-images never hash -> untouched)
    val imgDrop = ImageDedup
      .dedupImages(sized, bytesCol, idCol, imageMaxHamming)
      .filter(!col("kept")).select(col(idCol).as("_did"))
    val afterImg = stage(sized.join(imgDrop, idL === col("_did"),
      "left_anti"))

    // 3. audio near-dup keep-one (non-audio never hashes -> untouched)
    val audDrop = AudioDedup
      .dedupAudio(afterImg, bytesCol, idCol, audioMaxHamming)
      .filter(!col("kept")).select(col(idCol).as("_did"))
    val afterAud = stage(afterImg.join(audDrop, idL === col("_did"),
      "left_anti"))

    // 4. optional recognition gate: keep rows with SOME parseable media
    // identity — an image/video header (the metadata walk) or decodable
    // PCM audio
    val out =
      if (!dropUnrecognized) afterAud
      else {
        val headed = Multimodal.inspectMedia(afterAud, bytesCol, idCol)
          .filter(col("format").isNotNull)
          .select(col("media_id").as("_rid"))
        val pcm = AudioDedup.audioHashes(afterAud, bytesCol, idCol)
          .select(col("id").as("_rid"))
        stage(afterAud.join(headed.unionByName(pcm).distinct(),
          idL === col("_rid"), "left_semi"))
      }
    (out, Report(nInput = n(df), nAfterSize = n(sized),
      nAfterImageDedup = n(afterImg), nAfterAudioDedup = n(afterAud),
      nOut = n(out)))
  }
}
