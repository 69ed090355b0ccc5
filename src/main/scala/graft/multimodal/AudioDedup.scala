package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** AUDIO near-duplicate detection — the perceptual-hash tier for binary
  * audio columns, completing the multimodal curation family (text
  * SimHash, image dHash, now audio): a 64-bit ENERGY-DELTA hash over the
  * decoded PCM envelope, banded 4×16 via [[Banded64]] with the popcount
  * verify.
  *
  * The hash (dHash's construction transposed to time): the clip's
  * samples are cut into 65 equal TIME frames (by sample index, so the
  * framing is invariant to the sample RATE — a resampled copy lands in
  * the same frames), mean energy per frame (all channels folded), bit
  * `j` set when `energy(j) > energy(j+1)`. Amplitude scaling, DC-free
  * requantization and resampling preserve the comparisons (energy
  * ratios, not values); genuinely different material flips ~half the
  * bits. Clips shorter than 65 samples (or anything
  * [[Multimodal.decodeWav]] cannot read — only integer-PCM WAV has a
  * pure-JDK decode; compressed audio is the documented environment
  * stub) emit no hash, pair with nothing, and pass the keep tier
  * unclustered.
  *
  * Scale shape is [[ImageDedup]]'s: decode + hash ride a mapPartitions
  * scan, only (id, ahash) longs cross the band exchange, candidate
  * volume is the banded contract and recall is pigeonhole-exact for
  * `maxHamming ≤ 3`. */
object AudioDedup {

  /** Energy-delta hash of one encoded clip; None when the payload does
    * not decode or is too short to fingerprint. */
  def aHash(bytes: Array[Byte]): Option[Long] =
    Multimodal.decodeWav(bytes).flatMap { clip =>
      val ch = clip.channels
      val n = clip.samples.length / ch
      if (n < 65) None
      else {
        val e = new Array[Double](65)
        val cnt = new Array[Long](65)
        var i = 0
        while (i < n) {
          val f = ((i.toLong * 65) / n).toInt
          var c = 0
          var s = 0.0
          while (c < ch) {
            val v = clip.samples(i * ch + c).toDouble
            s += v * v
            c += 1
          }
          e(f) += s
          cnt(f) += 1
          i += 1
        }
        var h = 0L
        var j = 0
        while (j < 64) {
          if (e(j) / cnt(j) > e(j + 1) / cnt(j + 1)) h |= 1L << j
          j += 1
        }
        Some(h)
      }
    }

  /** (id, ahash) for every DECODABLE clip — the [[ImageDedup
    * .imageHashes]] contract for audio; `idCol` must be long-castable. */
  def audioHashes(df: DataFrame, bytesCol: String, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    df.select(col(idCol).cast("long").as("id"), col(bytesCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.isNullAt(0) || r.isNullAt(1)) None
          else aHash(r.getAs[Array[Byte]](1)).map(h => Row(r.getLong(0), h))
        }
      }(Encoders.row(outSchema))
  }

  /** Near-duplicate clip pairs — (id_a, id_b, hamming), id_a < id_b. */
  def nearDupPairs(df: DataFrame, bytesCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame =
    Banded64.pairs(audioHashes(df, bytesCol, idCol), "ahash", maxHamming)

  /** Keep-one over an audio corpus ([[ImageDedup.dedupImages]]'
    * contract): one survivor per near-dup component — the largest
    * payload, ties to the lowest id; undecodable clips pass unclustered.
    * Output: (idCol, component, kept). */
  def dedupAudio(df: DataFrame, bytesCol: String, idCol: String,
                 maxHamming: Int = 3): DataFrame = {
    val pairs = nearDupPairs(df, bytesCol, idCol, maxHamming)
    val withQ = df.select(col(idCol).cast("long").as(idCol),
      coalesce(length(col(bytesCol)).cast("long"), lit(0L)).as("_q"))
    graft.operators.Dedup.keepCanonical(withQ, idCol, "_q", pairs)
  }
}
