package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Dedup, Mixing, Packing}

/** The end-to-end training-data curation pipeline, composed from the
  * operator library — the workflow a pretraining data team runs over a
  * raw crawl before a training job:
  *
  *   1. quality filter   — drop repetitive documents
  *                         ([[graft.functions.RepetitionStats]], Gopher
  *                         thresholds, in-scan)
  *   2. exact dedup      — keep one copy per normalized text
  *                         ([[Dedup.exactGroups]], keep-lowest-id)
  *   3. near-dup dedup   — MinHash+LSH pairs, greedy keep-lowest-id
  *                         ([[Dedup.minhashPairs]])
  *   4. decontamination  — drop documents overlapping the eval set
  *                         ([[Decontaminate.clean]])
  *   5. mixing           — per-source static rates ([[Mixing.rateMix]])
  *   6. packing          — fixed-token-budget packs per source
  *                         ([[Packing.packByBudget]])
  *
  * Every stage is the library operator, unchanged — this object only
  * composes (and is itself spec-covered for composition: schema flow,
  * determinism, monotone survivor counts). Scale properties are the
  * stages' own: in-scan signatures, banded candidate generation, broadcast
  * eval sets, map-side mixing, shard-parallel packing.
  *
  * Greedy keep-lowest-id for near-dups (drop every `id_b` of a pair) is
  * the simple transitive-safe policy: it can over-drop relative to
  * connected-component canonicalization ([[graft.operators.Components]])
  * but never keeps two documents that were flagged as a pair.
  */
object Curation {

  /** Per-stage survivor counts — the curation funnel audit. */
  final case class Report(nInput: Long, nAfterQuality: Long,
                          nAfterExact: Long, nAfterNearDup: Long,
                          nAfterDecontam: Long, nAfterMix: Long,
                          nPacks: Long)

  /** Run the full funnel. Returns the curated corpus with `pack_id`
    * assigned, plus the per-stage report. Counts force one action per
    * stage boundary; pass `audit = false` to skip them (single-action
    * lazy plan, Report filled with -1 except the ends).
    */
  def curate(docs: DataFrame, evalDocs: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             sourceCol: String = "source",
             nearDupThresholdMilli: Int = 800,
             decontamMinShared: Int = 2,
             mixRatesMilli: Map[String, Int] = Map.empty,
             mixDefaultMilli: Int = 1000,
             packBudget: Long = 2048,
             audit: Boolean = true): (DataFrame, Report) = {
    val spark = docs.sparkSession
    graft.functions.RepetitionStats.ensureRegistered(spark)
    graft.functions.TokenStats.ensureRegistered(spark)

    def n(df: DataFrame): Long = if (audit) df.count() else -1L

    // 1. quality: Gopher-style repetition thresholds, exact integers
    val rs = graft.functions.RepetitionStats(col(textCol))
    val quality = docs
      .withColumn("_rs", rs)
      .filter(!(
        (col("_rs.n_bigrams") > 0 &&
          col("_rs.top_bigram_n") * 1000 >= col("_rs.n_bigrams") * 100) ||
        (col("_rs.n_trigrams") > 0 &&
          (col("_rs.n_trigrams") - col("_rs.n_distinct_trigrams")) * 1000 >=
            col("_rs.n_trigrams") * 20)))
      .drop("_rs")

    // 2. exact dedup: keep the canonical (lowest) id of each text group
    val canon = Dedup.exactGroups(quality, idCol, textCol)
      .select(col("canonical_id").as(idCol))
    val exact = quality.join(canon, Seq(idCol), "left_semi")

    // 3. near-dup: drop the higher id of every LSH-verified pair
    val dropB = Dedup.minhashPairs(exact, idCol, textCol,
        thresholdMilli = nearDupThresholdMilli)
      .select(col("id_b").as(idCol)).distinct()
    val nearDup = exact.join(dropB, Seq(idCol), "left_anti")

    // 4. decontamination against the eval corpus
    val decontam = Decontaminate.clean(nearDup, evalDocs, idCol, textCol,
      minShared = decontamMinShared)

    // 5. mixing: per-source static rates
    val mixed =
      if (mixRatesMilli.isEmpty && mixDefaultMilli == 1000) decontam
      else Mixing.rateMix(decontam, idCol, sourceCol, mixRatesMilli,
        mixDefaultMilli)

    // 6. packing: token budget per source shard
    val weighted = mixed.withColumn("_tok",
      graft.functions.TokenStats(col(textCol)).getField("n_tokens").cast("long"))
    val packed = Packing.packByBudget(weighted, idCol, "_tok",
      Seq(sourceCol), packBudget)
      .withColumnRenamed("_tok", "n_tokens")

    val report = Report(
      nInput = n(docs), nAfterQuality = n(quality), nAfterExact = n(exact),
      nAfterNearDup = n(nearDup), nAfterDecontam = n(decontam),
      nAfterMix = n(mixed),
      nPacks = if (audit)
        packed.select(sourceCol, "pack_id").distinct().count() else -1L)
    (packed, report)
  }
}
