package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared 4×16-bit banding over a 64-bit perceptual signature — the pair
  * machinery behind [[ImageDedup]] and [[AudioDedup]] (and the text
  * tier's SimHash shape, `Dedup.simhashPairs`): collapse IDENTICAL
  * signatures to a min-id representative first, explode only the
  * DISTINCT signatures into 4 band keys, join on (band, key), verify
  * with the codegen'd popcount BEFORE the distinct so the dedup shuffle
  * carries only qualifying pairs. Recall is EXACT by pigeonhole for
  * `maxHamming ≤ 3` — 3 flipped bits cannot touch all 4 bands;
  * candidate volume is ~4·C(d,2)·2⁻¹⁶ for `d` DISTINCT unrelated
  * signatures.
  *
  * The pre-collapse is the quadratic-skew guard a 100 TB crawl needs:
  * `m` byte-identical copies of one payload (the same meme image, the
  * same boilerplate page) hash to ONE signature and previously landed
  * in the SAME four band buckets — C(m,2) verified pairs on one join
  * key, ~5·10¹¹ pairs at m = 10⁶. Now they cost one hash-aggregate and
  * `m − 1` star edges. The output edge set is therefore
  * CONNECTIVITY-EQUIVALENT to the historical all-pairs set, not
  * pair-identical: within an identical-signature group the m − 1 edges
  * (rep, member, 0) replace the C(m,2) clique, and cross-signature
  * pairs connect the two groups' REPRESENTATIVES. Every downstream
  * consumer (`Components.of` → `keepCanonical`) sees the same connected
  * components, so survivors are unchanged. */
object Banded64 {

  /** The 4 (band, 16-bit key) columns of a signature column. */
  def bandKeyArray(sig: Column): Column =
    array((0 until 4).map(b =>
      shiftright(sig, b * 16).bitwiseAND(lit(65535L))): _*)

  /** Near-dup edge set over `sig` = (id: long, `sigCol`: long),
    * connectivity-equivalent to all-pairs banding (see object doc).
    * Output: (id_a, id_b, hamming), id_a < id_b — star edges at
    * hamming 0 inside identical-signature groups plus banded pairs
    * between distinct-signature representatives. Edge volume is
    * linear in group sizes and ~4·C(d,2)·2⁻¹⁶ across `d` distinct
    * signatures. */
  def pairs(sig: DataFrame, sigCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64,
      s"maxHamming must be in [0, 64], got $maxHamming")
    val checkpointed = sig.localCheckpoint(true)
    // 1. collapse identical signatures: min-id representative per
    // signature (one hash-agg; the m-copy pileup becomes linear here)
    val reps = checkpointed.groupBy(col(sigCol))
      .agg(min(col("id")).as("_rep"))
      .localCheckpoint(true)
    // star edges: every non-representative member attaches to its
    // group's representative at hamming 0 (identical signature)
    val star = checkpointed.join(reps, Seq(sigCol))
      .filter(col("id") =!= col("_rep"))
      .select(col("_rep").as("id_a"), col("id").as("id_b"),
        lit(0L).as("hamming"))
    // 2. band DISTINCT signatures only
    val distinctSig = reps.select(col("_rep").as("id"), col(sigCol))
    val bands = distinctSig.select(col("id"), col(sigCol),
      posexplode(bandKeyArray(col(sigCol))).as(Seq("band", "bkey")))
    val cross = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col(s"x.$sigCol").bitwiseXOR(col(s"y.$sigCol")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    // a star edge's id_b is never a representative, a cross edge's ids
    // are both representatives — the union is duplicate-free
    star.unionByName(cross)
  }
}
