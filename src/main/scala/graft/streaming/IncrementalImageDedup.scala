package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.multimodal.ImageDedup
import graft.store.Snapshots

/** [[IncrementalDedup]] for IMAGE columns — the streaming twin of
  * [[graft.multimodal.ImageDedup]]: banded dHash candidates against a
  * persistent claims store, with a HAMMING verify against the claimed
  * representative's stored hash (the [[IncrementalEmbedDedup]]
  * discipline with popcount in place of the exact cosine — a band
  * collision alone costs one XOR, never data).
  *
  * Band keys are the 4×16-bit slices of the 64-bit dHash — the batch
  * tier's exact banding, so the pigeonhole guarantee transfers: within
  * one batch, any pair at hamming ≤ 3 shares a band and the single-batch
  * result equals [[ImageDedup.nearDupPairs]]-driven dedup. Across
  * batches, first-writer-wins claims (bucket → (claimant id, claimant
  * dHash)) make replays stable: a crash-replayed batch re-derives the
  * same drops because existing claims always win and within-batch
  * representatives are deterministic (min id per bucket).
  *
  * Undecodable payloads carry no hash: they pass through unexamined and
  * claim nothing (a 100 TB crawl is mostly garbage; garbage must never
  * block a bucket). Per-batch state IO is O(batch) — only NEW bucket
  * claims append; depth-triggered compaction bounds the manifest chain.
  */
final class IncrementalImageDedup(spark: SparkSession, root: String,
                                  compactEvery: Int = 16,
                                  maxHamming: Int = 3) {
  require(maxHamming >= 0 && maxHamming <= 64,
    s"maxHamming must be in [0, 64], got $maxHamming")

  private val schema = StructType(Seq(
    StructField("bkey", StringType, nullable = false),
    StructField("claimant", LongType, nullable = false),
    StructField("chash", LongType, nullable = false)))
  private val snaps = new Snapshots(spark, root, schema)

  def init(): Unit = snaps.init()

  def buckets(): DataFrame = snaps.read()

  /** (id, dhash, bkey) — one row per (decodable image, band). */
  private def bandKeys(batch: DataFrame, bytesCol: String,
                       idCol: String): DataFrame =
    ImageDedup.imageHashes(batch, bytesCol, idCol)
      .select(col("id"), col("dhash"),
        explode(array((0 until 4).map(b =>
          concat_ws(",", lit(b),
            shiftright(col("dhash"), b * 16).bitwiseAND(lit(65535L)))): _*))
          .as("bkey"))

  /** Filters `batch` to rows that are NOT certified near-duplicates of
    * an earlier claimant (across all prior batches and within this one),
    * then claims the batch's unclaimed buckets. Returns the kept rows
    * with the batch's original columns. */
  def filterAndClaim(batch: DataFrame, bytesCol: String,
                     idCol: String): DataFrame = {
    val bands = bandKeys(batch, bytesCol, idCol).localCheckpoint(true)
    def near(a: org.apache.spark.sql.Column,
             b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      bit_count(a.bitwiseXOR(b)) <= maxHamming
    // dropped: a bucket claimed by SOMEONE ELSE whose stored hash
    // certifies the near-duplication…
    val storeDup = bands.join(snaps.read(), "bkey")
      .filter(col("claimant") =!= col("id") &&
        near(col("dhash"), col("chash")))
      .select("id")
    // …or a smaller NEAR id in this batch shares the bucket
    val batchMin = bands.groupBy("bkey")
      .agg(min_by(struct(col("id"), col("dhash")), col("id")).as("m"))
      .select(col("bkey"), col("m.id").as("min_id"),
        col("m.dhash").as("mhash"))
    val batchDup = bands.join(batchMin, "bkey")
      .filter(col("id") > col("min_id") && near(col("dhash"), col("mhash")))
      .select("id")
    val dropIds = storeDup.unionAll(batchDup).distinct()
      .withColumnRenamed("id", "_drop_id")
    val kept = batch.join(dropIds,
        batch(idCol).cast("long") === col("_drop_id"), "left_anti")
      .localCheckpoint(true) // materialize BEFORE the snapshot advances
    // claim: min id per bucket with its hash attached for future
    // verifies; existing claims win (replay-stable, chains collapse to
    // the earliest representative); empty deltas skipped
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
