package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.Snapshots

/** The shared CLAIMS core of the 64-bit perceptual-hash streaming twins
  * ([[IncrementalImageDedup]], [[IncrementalAudioDedup]]): band a
  * (id, hash) signature table 4×16, drop rows whose bucket is claimed by
  * ANOTHER id whose stored hash verifies at `maxHamming` (or by a
  * SMALLER NEAR id within the batch — any smaller id whose hash
  * verifies, not merely the bucket minimum, so a chance band collision
  * parking an unrelated minimum in the bucket cannot hide a real
  * near-dup pair behind it), then claim the batch's unclaimed buckets
  * first-writer-wins with the claimant's hash attached — replay-stable,
  * O(batch) deltas, depth-triggered compaction. The within-batch check
  * runs collapsed (identical hashes fold to their min-id representative
  * first; only DISTINCT hashes meet in the pairwise bucket probe), so
  * the single-batch survivor set matches the batch tier
  * ([[graft.multimodal.Banded64.pairs]] + min-id keep) at linear cost
  * even when one signature floods a bucket. The modality owns only the
  * DECODE + HASH step. */
private[streaming] final class IncrementalBanded64(
    spark: SparkSession, root: String, compactEvery: Int, maxHamming: Int) {
  require(maxHamming >= 0 && maxHamming <= 64,
    s"maxHamming must be in [0, 64], got $maxHamming")

  private val schema = StructType(Seq(
    StructField("bkey", StringType, nullable = false),
    StructField("claimant", LongType, nullable = false),
    StructField("chash", LongType, nullable = false)))
  private val snaps = new Snapshots(spark, root, schema)

  def init(): Unit = snaps.init()

  def buckets(): DataFrame = snaps.read()

  /** Retract DELETED claimants ([[graft.store.ClaimRetraction]]'s
    * contract): their buckets clear, the next arrival claims them.
    * Returns the number of claims removed. */
  def retract(ids: Seq[Long]): Long =
    graft.store.ClaimRetraction.retract(snaps, ids)

  /** Audit read: claims still held by `ids` (0 after [[retract]]). */
  def held(ids: Seq[Long]): Long =
    graft.store.ClaimRetraction.held(snaps, ids)

  /** `hashes` is (id: long, h: long) — the batch's decodable signatures;
    * rows of `batch` without one pass through unexamined. */
  def filterAndClaim(batch: DataFrame, hashes: DataFrame,
                     idCol: String): DataFrame = {
    val bands = hashes
      .select(col("id"), col("h"),
        explode(array((0 until 4).map(b =>
          concat_ws(",", lit(b),
            shiftright(col("h"), b * 16).bitwiseAND(lit(65535L)))): _*))
          .as("bkey"))
      .localCheckpoint(true)
    def near(a: org.apache.spark.sql.Column,
             b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      bit_count(a.bitwiseXOR(b)) <= maxHamming
    val storeDup = bands.join(snaps.read(), "bkey")
      .filter(col("claimant") =!= col("id") && near(col("h"), col("chash")))
      .select("id")
    // within-batch: smallest NEAR id wins. Identical hashes collapse to
    // their min-id representative (hamming 0 — every non-rep drops);
    // DISTINCT hashes probe buckets pairwise among representatives only,
    // so an unrelated bucket minimum can never mask a real pair and the
    // m-copy pileup stays linear (the Banded64 pre-collapse discipline).
    // Completeness of the rep-only probe: a near smaller NON-rep y has
    // rep(y) ≤ y with the SAME hash — same distance, same buckets — so
    // rep(y) already witnesses the drop.
    val reps = hashes.groupBy("h").agg(min(col("id")).as("_rep"))
      .localCheckpoint(true)
    val sameHashDup = hashes.join(reps, "h")
      .filter(col("id") =!= col("_rep")).select("id")
    val repBands = bands.join(
      reps.select(col("_rep").as("id")), Seq("id"), "left_semi")
    val crossDup = repBands.as("x")
      .join(repBands.as("y"),
        col("x.bkey") === col("y.bkey") && col("y.id") < col("x.id"))
      .filter(near(col("x.h"), col("y.h")))
      .select(col("x.id").as("id"))
    val batchDup = sameHashDup.unionAll(crossDup)
    // claims stay one-per-bucket, keyed by the bucket's min id (with its
    // hash) — the cross-batch single-claimant semantics, unchanged
    val batchMin = bands.groupBy("bkey")
      .agg(min_by(struct(col("id"), col("h")), col("id")).as("m"))
      .select(col("bkey"), col("m.id").as("min_id"), col("m.h").as("mhash"))
    val dropIds = storeDup.unionAll(batchDup).distinct()
      .withColumnRenamed("id", "_drop_id")
    val kept = batch.join(dropIds,
        batch(idCol).cast("long") === col("_drop_id"), "left_anti")
      .localCheckpoint(true) // materialize BEFORE the snapshot advances
    val newClaims = batchMin
      .select(col("bkey"), col("min_id").as("claimant"),
        col("mhash").as("chash"))
      .join(snaps.read(), Seq("bkey"), "left_anti")
      .localCheckpoint(true)
    if (newClaims.head(1).nonEmpty) {
      snaps.appendDelta(newClaims)
      if (snaps.deltaCount >= compactEvery) snaps.replace(snaps.read())
    }
    kept
  }
}

/** Streaming AUDIO near-dup claims — [[graft.multimodal.AudioDedup]]'s
  * energy-delta hash through the shared banded claims core: cross-batch
  * drops against stored claimant hashes, replay-stable, undecodable
  * clips pass unexamined. */
final class IncrementalAudioDedup(spark: SparkSession, root: String,
                                  compactEvery: Int = 16,
                                  maxHamming: Int = 3) {
  private val core = new IncrementalBanded64(spark, root, compactEvery,
    maxHamming)

  def init(): Unit = core.init()

  def buckets(): DataFrame = core.buckets()

  /** Retract deleted claimants' buckets (the family contract). */
  def retract(ids: Seq[Long]): Long = core.retract(ids)

  /** Audit read: claims still held by `ids` (0 after [[retract]]). */
  def held(ids: Seq[Long]): Long = core.held(ids)

  def filterAndClaim(batch: DataFrame, bytesCol: String,
                     idCol: String): DataFrame =
    core.filterAndClaim(batch,
      graft.multimodal.AudioDedup.audioHashes(batch, bytesCol, idCol)
        .withColumnRenamed("ahash", "h"),
      idCol)
}
