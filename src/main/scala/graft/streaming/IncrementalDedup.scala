package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.store.Snapshots

/** Near-duplicate dedup under continuous ingestion: each micro-batch is
  * filtered against a persistent MinHash band-bucket index, then claims its
  * buckets (the `foreachBatch` body of a streaming dedup pipeline — exact
  * streaming dedup is [[StreamDedup]]; this is the LSH analog).
  *
  * Semantics (deterministic, transitive): a document is DROPPED iff any of
  * its 4 band buckets is already claimed by ANOTHER document, or a
  * smaller-id document in the same batch shares one of its buckets. ALL
  * incoming documents claim their buckets — including dropped ones — so
  * chains of near-dups collapse to the earliest representative (same
  * policy as offline LSH dedup keeping the min-id doc per cluster).
  * Claims record the claimant id, which makes the filter idempotent under
  * micro-batch REPLAY: a re-run of the same batch after a crash between
  * claim-commit and downstream write keeps the same rows.
  *
  * Scale: the filter is one semi-join of (id, 4 band keys) against the
  * bucket index — the corpus text never re-processes; signatures come from
  * the codegen'd [[graft.functions.MinHashSig]] in the scan. Claims are
  * APPEND-ONLY deltas on the shared [[Snapshots]] store: a micro-batch
  * writes O(batch) rows (one delta directory), never the whole index, and
  * the delta log compacts back into one base snapshot every `compactEvery`
  * batches — amortized O(index / compactEvery) per batch. At 100 TB the
  * same log becomes a key-value table bucketed by band key, the join logic
  * unchanged.
  */
final class IncrementalDedup(spark: SparkSession, root: String,
                             compactEvery: Int = 16) {

  private val schema = StructType(Seq(
    StructField("bkey", StringType, nullable = false),
    StructField("claimant", LongType, nullable = false)))
  private val snaps = new Snapshots(spark, root, schema)

  def init(): Unit = snaps.init()

  def buckets(): DataFrame = snaps.read()

  /** (id, bkey) band-bucket keys per document: band index prefixed onto the
    * 4-row signature slice, same banding as [[graft.operators.Dedup
    * .minhashPairs]]. Docs with < 3 tokens have no signature and pass
    * through undeduplicated (no shingles → nothing to collide on). */
  private def bandKeys(batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.MinHashSig.ensureRegistered(batch.sparkSession)
    batch
      .select(col(idCol).as("id"), graft.functions.MinHashSig(col(textCol)).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"), explode(array((0 until 4).map { bnd =>
        concat_ws(",", lit(bnd) +:
          (0 until 4).map(r => col("sig").getItem(bnd * 4 + r)): _*)
      }: _*)).as("bkey"))
  }

  /** Filters `batch` to its novel documents and claims all of the batch's
    * buckets in a new snapshot. Returns the kept rows (original columns). */
  def filterAndClaim(batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bands = bandKeys(batch, idCol, textCol).localCheckpoint(true)
    // dropped: bucket already claimed by SOMEONE ELSE in the store…
    val storeDup = bands.join(buckets(), "bkey")
      .filter(col("claimant") =!= col("id")).select("id")
    // …or a smaller id in this batch shares the bucket
    val batchMin = bands.groupBy("bkey").agg(min(col("id")).as("min_id"))
    val batchDup = bands.join(batchMin, "bkey")
      .filter(col("id") > col("min_id")).select("id")
    val dropIds = storeDup.unionAll(batchDup).distinct()
    val kept = batch.join(dropIds.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      .localCheckpoint(true) // materialize BEFORE the snapshot advances
    // claim: unclaimed buckets get the batch's min id; existing claims win
    // (first-writer-wins keeps replays stable). Deltas are left_anti'd
    // against the full store, so no bucket key ever appears in two manifest
    // entries — read() needs no per-key precedence rule.
    val newClaims = bands.groupBy("bkey").agg(min(col("id")).as("claimant"))
      .join(buckets(), Seq("bkey"), "left_anti")
    snaps.appendDelta(newClaims)
    if (snaps.deltaCount >= compactEvery) snaps.replace(snaps.read())
    kept
  }
}
