package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis.tokens

/** In-stream distribution monitoring — the streaming consumer of the
  * [[graft.operators.Drift]] statistic: every micro-batch's term
  * distribution is compared against a REFERENCE corpus frozen at binder
  * creation, and the batch's total-variation ppm (plus its most-drifted
  * terms) comes back as the alert record. An ingestion pipeline runs
  * exactly this beside the curation funnel: a scraper regression or a
  * source going off-distribution shows up as a TV spike batches before
  * it would poison a training mix.
  *
  * The reference term counts fold ONCE ([[StreamDecontam]]'s fold-once
  * discipline): one pass over the reference corpus at binder creation,
  * checkpointed vocab-sized counts + a scalar total. Per batch: one
  * in-scan token explode into a map-side-combined batch vocab, one
  * vocab-sized full-outer join against the frozen reference (terms the
  * batch misses still contribute their reference mass — that is what
  * makes a COLLAPSED batch alarm at TV → 10⁶), one aggregate. All
  * arithmetic is the exact integer-ppm discipline of [[graft.operators
  * .Drift]] (floor division, deterministic lower bound), so a
  * replayed batch reproduces its alert record bit-for-bit.
  */
object StreamDrift {

  /** One batch's alert record. */
  final case class Alert(batchId: Long, nTokens: Long, tvPpm: Long,
                         topTerms: Seq[(String, Long)])

  /** Bind a monitor to a reference corpus. `topK` bounds the triage
    * list in each alert. Use inside `foreachBatch` beside the curation
    * sink. */
  def monitor(spark: SparkSession, reference: DataFrame, textCol: String,
              topK: Int = 5): (DataFrame, Long) => Alert = {
    require(topK >= 0, "topK must be >= 0")
    val refCounts = reference
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cr"))
      .localCheckpoint(true) // fold once; every batch probes this
    val nRef = refCounts.agg(sum(col("cr"))).head() match {
      case r if r.isNullAt(0) => 0L // empty reference: sum is NULL
      case r => r.getLong(0)
    }
    require(nRef > 0, "reference corpus must contain tokens")

    (batch: DataFrame, batchId: Long) => {
      val bCounts = batch
        .select(explode(tokens(col(textCol))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cb"))
        .localCheckpoint(true)
      val nB = bCounts.agg(sum(col("cb"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
      if (nB == 0L) Alert(batchId, 0L, 1000000L, Seq.empty)
      else {
        val drift = refCounts.join(bCounts, Seq("term"), "full_outer")
          .select(col("term"),
            abs(expr(s"coalesce(cr, 0L) * 1000000L div ${nRef}L") -
              expr(s"coalesce(cb, 0L) * 1000000L div ${nB}L"))
              .as("drift_ppm"))
          .localCheckpoint(true) // feeds the scalar AND the triage top-k
        val tv = drift.agg(sum(col("drift_ppm"))).head().getLong(0) / 2
        val top =
          if (topK == 0) Seq.empty[(String, Long)]
          else drift.orderBy(col("drift_ppm").desc, col("term").asc)
            .limit(topK).collect()
            .map(r => (r.getString(0), r.getLong(1))).toSeq
        Alert(batchId, nB, tv, top)
      }
    }
  }
}
