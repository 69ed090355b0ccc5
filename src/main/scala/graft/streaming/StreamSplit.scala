package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.TextAnalysis.strHash
import graft.operators.Components
import graft.store.Snapshots

/** LEAKAGE-SAFE train/val splitting under continuous ingestion — the
  * streaming twin of [[graft.operators.Mixing.leakageSafeSplit]] (q96):
  * every arriving document is assigned a cluster REPRESENTATIVE and a
  * split immediately, never dropped, and the split is the content hash
  * of the representative (q49/q96's placement convention) — so two
  * near-duplicates detected together can never straddle the train/val
  * boundary, and a document's split NEVER changes after it ships
  * (claims are first-writer-wins, appends are batch-tokened, replays
  * reproduce the assignment bit-for-bit).
  *
  * Representative resolution per batch: (1) batch-local connected
  * components over shared MinHash band buckets (the q41 closure, on the
  * batch's candidates only); (2) each component takes the minimum over
  * its members' own ids AND every representative already claiming one
  * of their buckets; (3) unclaimed buckets are claimed by the resolved
  * representative — so duplicate CHAINS collapse forward across batches
  * (a later twin of a dup inherits the ORIGINAL representative, not the
  * dup's id). Documents with no signature (< 3 tokens) are their own
  * singleton cluster, like the dedup tier's pass-through.
  *
  * HONEST CONTRACT (weaker than the batch q96 closure, necessarily):
  * every near-dup pair DETECTED at assignment time — batch-local, or
  * via a claimed bucket — shares a split. A late merge of two clusters
  * that already shipped under different representatives cannot be
  * repaired (shipped splits are immutable by design); the batch
  * operator remains the ground truth for a from-scratch re-split.
  *
  * Scale shape: candidates and claims ride the [[IncrementalDedup]]
  * economics (ids-only band keys, ~124-bit buckets where collision ⇒
  * near-duplication, O(batch) deltas, additive-merge-free first-writer
  * store with tokened replays and periodic compaction).
  */
final class StreamSplit(spark: SparkSession, root: String,
                        valMilli: Int = 100, compactEvery: Int = 16) {
  require(valMilli >= 0 && valMilli <= 1000, "valMilli must be in [0, 1000]")
  require(compactEvery >= 1, "compactEvery must be >= 1")

  private val schema = StructType(Seq(
    StructField("bkey", StringType, nullable = false),
    StructField("rep", LongType, nullable = false)))
  private val snaps = new Snapshots(spark, root, schema)

  def init(): Unit = {
    graft.functions.PolyHash.ensureRegistered(spark) // strHash placement
    snaps.init()
  }

  /** (id, bkey) MinHash band keys — the [[IncrementalDedup]] banding. */
  private def bandKeys(batch: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    graft.functions.MinHashSig.ensureRegistered(batch.sparkSession)
    batch
      .select(col(idCol).cast("long").as("id"),
        graft.functions.MinHashSig(col(textCol)).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"), explode(array((0 until 4).map { bnd =>
        concat_ws(",", lit(bnd) +:
          (0 until 4).map(r => col("sig").getItem(bnd * 4 + r)): _*)
      }: _*)).as("bkey"))
  }

  /** Assign reps and splits to one micro-batch. Returns the batch rows
    * plus (rep, split); never drops a row. */
  def assign(batch: DataFrame, idCol: String, textCol: String,
             batchId: Long): DataFrame = {
    val bands = bandKeys(batch, idCol, textCol).localCheckpoint(true)
    // 1. batch-local components over shared buckets (candidate pairs
    // only — ids cross the self-join, nothing else)
    val pairs = bands.as("x")
      .join(bands.as("y"),
        col("x.bkey") === col("y.bkey") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val comp = Components.of(pairs, "id_a", "id_b")
      .select(col("id"), col("component"))
    // 2. per-doc batch rep (own id when unpaired), then fold in any
    // representative already claiming one of the doc's buckets, then
    // take the component-wide minimum so every member agrees
    val docIds = batch.select(col(idCol).cast("long").as("id")).distinct()
    val batchRep = docIds.join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("brep"))
    val claimedRep = bands.join(snaps.read(), "bkey")
      .groupBy("id").agg(min(col("rep")).as("crep"))
    val cand = batchRep.join(claimedRep, Seq("id"), "left")
      .select(col("id"), col("brep"),
        least(col("brep"), coalesce(col("crep"), col("brep"))).as("cand"))
    val finalRep = cand
      .withColumn("rep", min(col("cand"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("brep")))
      .select(col("id"), col("rep"))
      .localCheckpoint(true) // feeds the output AND the claim delta
    // 3. claim unclaimed buckets with the resolved rep (unique per
    // bucket within a batch: sharing a bucket implies one component)
    val newClaims = bands.join(finalRep, "id")
      .groupBy("bkey").agg(min(col("rep")).as("rep"))
      .join(snaps.read(), Seq("bkey"), "left_anti")
      .localCheckpoint(true)
    if (newClaims.head(1).nonEmpty) {
      snaps.appendDelta(newClaims, Some(s"b$batchId"))
      if (snaps.deltaCount >= compactEvery) snaps.replace(snaps.read())
    }
    batch
      .join(finalRep.withColumnRenamed("id", "_rid"),
        col(idCol).cast("long") === col("_rid"), "left")
      .withColumn("rep", coalesce(col("rep"), col(idCol).cast("long")))
      .drop("_rid")
      .withColumn("split",
        when(strHash(col("rep").cast("string")) % 1000 < valMilli, lit("val"))
          .otherwise(lit("train")))
  }
}
