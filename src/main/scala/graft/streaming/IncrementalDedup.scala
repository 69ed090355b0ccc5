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
  def filterAndClaim(batch: DataFrame, idCol: String, textCol: String): DataFrame =
    ClaimStore.filterAndClaim(snaps, compactEvery, batch,
      bandKeys(batch, idCol, textCol), idCol)
}

/** The shared claim-store step of the incremental dedup family: given a
  * batch and its (id, bkey) band keys, drop every row whose bucket is
  * already claimed by another id (in the store, or by a smaller id in
  * the same batch) and claim the batch's buckets first-writer-wins —
  * recording the claimant, which is what makes micro-batch REPLAYS
  * return the same rows. Keying is the caller's (MinHash bands for
  * text, [[graft.functions.HyperplaneSig]] byte bands for embeddings);
  * the store mechanics are identical. */
private[streaming] object ClaimStore {

  def filterAndClaim(snaps: Snapshots, compactEvery: Int, batch: DataFrame,
                     keys: DataFrame, idCol: String): DataFrame = {
    val bands = keys.localCheckpoint(true)
    // dropped: bucket already claimed by SOMEONE ELSE in the store…
    val storeDup = bands.join(snaps.read(), "bkey")
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
      .join(snaps.read(), Seq("bkey"), "left_anti")
      .localCheckpoint(true)
    // skip empty deltas: a crash-replayed (or all-duplicate) batch claims
    // nothing, and appending an empty delta would still advance deltaCount
    // — letting replays re-trigger or starve the compaction cadence,
    // against the replay-appends-nothing rationale the tokened BM25 path
    // documents
    if (newClaims.head(1).nonEmpty) {
      snaps.appendDelta(newClaims)
      if (snaps.deltaCount >= compactEvery) snaps.replace(snaps.read())
    }
    kept
  }
}

/** [[IncrementalDedup]] for EMBEDDINGS: the same persistent claim store,
  * keyed by the 4 byte bands of the 32-plane [[graft.functions
  * .HyperplaneSig]] SRP signature — a document is dropped iff it shares
  * a band with an earlier claimant, which by pigeonhole catches every
  * pair within signature-Hamming 3 (genuinely-near vectors disagree on
  * few planes; per-plane odds angle/π, the SRP-LSH contract q85's batch
  * operator documents). Signatures compute in-scan; O(batch) claim
  * deltas; replay-stable via the recorded claimant — all inherited from
  * the shared [[ClaimStore]] step. */
final class IncrementalEmbedDedup(spark: SparkSession, root: String,
                                  compactEvery: Int = 16) {

  private val schema = StructType(Seq(
    StructField("bkey", StringType, nullable = false),
    StructField("claimant", LongType, nullable = false)))
  private val snaps = new Snapshots(spark, root, schema)

  def init(): Unit = snaps.init()

  def buckets(): DataFrame = snaps.read()

  /** (id, bkey): band index prefixed onto each of the signature's 4
    * bytes. Malformed vectors sign 0 like the batch tier — they all land
    * in the 0-signature buckets and dedup among themselves. */
  private def bandKeys(batch: DataFrame, idCol: String,
                       vecCol: String): DataFrame = {
    graft.functions.HyperplaneSig.ensureRegistered(batch.sparkSession)
    batch
      .select(col(idCol).as("id"),
        graft.functions.HyperplaneSig(
          transform(col(vecCol), _.cast("double"))).as("hsig"))
      .select(col("id"), explode(array((0 until 4).map { bnd =>
        concat_ws(",", lit(bnd), shiftright(col("hsig"), bnd * 8) % 256)
      }: _*)).as("bkey"))
  }

  /** Filters `batch` to its novel rows and claims its buckets. */
  def filterAndClaim(batch: DataFrame, idCol: String, vecCol: String): DataFrame =
    ClaimStore.filterAndClaim(snaps, compactEvery, batch,
      bandKeys(batch, idCol, vecCol), idCol)
}
