package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** IMAGE near-duplicate detection — the perceptual-hash tier for binary
  * image columns: a 64-bit DIFFERENCE HASH (dHash) over the decoded
  * luminance grid, banded 4×16 exactly like the text tier's SimHash
  * ([[graft.operators.Dedup.simhashPairs]]), with the popcount verify on
  * band collisions. Resized and recompressed copies of an image land
  * within a few Hamming bits of each other (the gradient comparisons
  * survive scaling and JPEG quantization), while distinct images are
  * ~32 bits apart — the single most common multimodal curation need,
  * served by machinery the engine already owns.
  *
  * dHash (the classic 9×8 construction): bilinear-resize to 9 columns ×
  * 8 rows, integer luminance per cell ((299R + 587G + 114B)/1000, the
  * [[Multimodal.imageFeatures]] weights), bit `y·8 + x` set when
  * `lum(x, y) > lum(x + 1, y)` — 8 horizontal comparisons per row. Pure
  * JDK (`javax.imageio` + bilinear `Graphics2D`), deterministic.
  *
  * Scale shape: decode + hash ride a `mapPartitions` scan (one codec
  * init per task, the [[Multimodal]] discipline) and only (id, dhash)
  * longs reach the band exchange; candidate volume is the banded
  * contract (~4·C(n,2)·2⁻¹⁶ for unrelated images) and recall is EXACT
  * by pigeonhole for `maxHamming ≤ 3` — 3 flipped bits cannot touch all
  * 4 bands. Undecodable payloads (a crawl always has garbage) emit no
  * hash: they can never pair, and the keep tier carries them through
  * unclustered. */
object ImageDedup {

  /** dHash of one encoded image; None when the payload does not decode. */
  def dHash(bytes: Array[Byte]): Option[Long] =
    Multimodal.resizeImage(bytes, 9, 8).map(dHashOf)

  /** The comparison core over an already-resized 9×8 raster. */
  private[multimodal] def dHashOf(p: Multimodal.Pixels): Long = {
    require(p.width == 9 && p.height == 8,
      s"dHash grid must be 9x8, got ${p.width}x${p.height}")
    def lum(x: Int, y: Int): Int = {
      val i = (y * 9 + x) * 3
      (299 * (p.rgb(i) & 0xff) + 587 * (p.rgb(i + 1) & 0xff) +
        114 * (p.rgb(i + 2) & 0xff)) / 1000
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(x, y) > lum(x + 1, y)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** (id, dhash) for every DECODABLE image — decode + hash in the scan,
    * one row of two longs per image, nothing else crosses an exchange.
    * `idCol` must be long-castable (the dedup family contract). */
  def imageHashes(df: DataFrame, bytesCol: String, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    df.select(col(idCol).cast("long").as("id"), col(bytesCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.isNullAt(0) || r.isNullAt(1)) None
          else dHash(r.getAs[Array[Byte]](1)).map(h => Row(r.getLong(0), h))
        }
      }(Encoders.row(outSchema))
  }

  /** Near-duplicate image pairs: band the dHash into 4×16-bit keys, join
    * on (band, key), verify with the codegen'd popcount BEFORE the
    * distinct (the [[graft.operators.Dedup.simhashPairs]] shape — the
    * dedup shuffle carries only qualifying pairs). Output:
    * (id_a, id_b, hamming), id_a < id_b. Exact recall for
    * `maxHamming ≤ 3` by pigeonhole. */
  def nearDupPairs(df: DataFrame, bytesCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame =
    Banded64.pairs(imageHashes(df, bytesCol, idCol), "dhash", maxHamming)

  /** Near-dup KEEP-ONE over an image corpus — [[nearDupPairs]] composed
    * with the text tier's canonical-keep ([[graft.operators.Dedup
    * .keepCanonical]]): every image gets its near-dup component, exactly
    * one survives per component — the LARGEST payload (bytes ≈ fidelity
    * for same-content encodings), ties to the lowest id. Undecodable
    * images never pair, so they pass through unclustered (kept). Output:
    * (idCol, component, kept) for every input image — the optional
    * Curation stage for byte-column corpora is `filter(kept)`. */
  def dedupImages(df: DataFrame, bytesCol: String, idCol: String,
                  maxHamming: Int = 3): DataFrame = {
    val pairs = nearDupPairs(df, bytesCol, idCol, maxHamming)
    val withQ = df.select(col(idCol).cast("long").as(idCol),
      coalesce(length(col(bytesCol)).cast("long"), lit(0L)).as("_q"))
    graft.operators.Dedup.keepCanonical(withQ, idCol, "_q", pairs)
  }
}
