package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared 4×16-bit banding over a 64-bit perceptual signature — the pair
  * machinery behind [[ImageDedup]] and [[AudioDedup]] (and the text
  * tier's SimHash shape, `Dedup.simhashPairs`): explode the signature
  * into 4 band keys, join on (band, key), verify with the codegen'd
  * popcount BEFORE the distinct so the dedup shuffle carries only
  * qualifying pairs. Recall is EXACT by pigeonhole for `maxHamming ≤ 3`
  * — 3 flipped bits cannot touch all 4 bands; candidate volume is
  * ~4·C(n,2)·2⁻¹⁶ for unrelated signatures. */
object Banded64 {

  /** The 4 (band, 16-bit key) columns of a signature column. */
  def bandKeyArray(sig: Column): Column =
    array((0 until 4).map(b =>
      shiftright(sig, b * 16).bitwiseAND(lit(65535L))): _*)

  /** Near-dup pairs over `sig` = (id: long, `sigCol`: long). Output:
    * (id_a, id_b, hamming), id_a < id_b. */
  def pairs(sig: DataFrame, sigCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64,
      s"maxHamming must be in [0, 64], got $maxHamming")
    val checkpointed = sig.localCheckpoint(true)
    val bands = checkpointed.select(col("id"), col(sigCol),
      posexplode(bandKeyArray(col(sigCol))).as(Seq("band", "bkey")))
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col(s"x.$sigCol").bitwiseXOR(col(s"y.$sigCol")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
