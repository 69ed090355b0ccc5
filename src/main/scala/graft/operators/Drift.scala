package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis.tokens

/** Corpus drift detection — the monitoring step between two crawls or
  * two curation runs: which terms changed frequency, and by how much.
  * A training-data pipeline watches exactly this number to catch a
  * source going stale, a scraper regression, or a contamination event
  * before a training run does (the reference has no multi-corpus
  * surface; extension tier).
  *
  * The metric is per-term probability drift in EXACT integer ppm:
  * `|cA·10⁶ div NA − cB·10⁶ div NB|` (term count over total token
  * count, floor division) — total variation's summand, with no float
  * division and no libm, so the oracle replays `//` verbatim (the
  * engine's integer-score discipline, same as BM25/TF-IDF). Missing
  * terms count 0 on their side (full-outer union of the vocabularies).
  *
  * Scale shape: each side is one in-scan token explode into a
  * map-side-combined (term, count) aggregate — vocab-sized, orders of
  * magnitude under the token stream; the drift join is vocab×vocab on
  * the term key, and both inputs arrive already partitioned by that
  * key, so the join reuses the aggregation exchanges. Totals ride as
  * two scalar literals (one `head()` each, computed from the same
  * aggregates). Top-k is a TakeOrderedAndProject, never a full sort.
  */
object Drift {

  /** Per-term counts + the corpus's total token count. */
  private def termCounts(df: DataFrame, textCol: String): (DataFrame, Long) = {
    val counts = df
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // feeds the total AND the drift join
    val total = counts.agg(sum(col("c"))).head().getLong(0)
    (counts, total)
  }

  /** Full per-term drift table: (term, a_ppm, b_ppm, drift_ppm), one row
    * per term of the union vocabulary. */
  def vocabDrift(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    val (ca, na) = termCounts(a, textCol)
    val (cb, nb) = termCounts(b, textCol)
    require(na > 0 && nb > 0, "both corpora must contain tokens")
    ca.withColumnRenamed("c", "ca")
      .join(cb.withColumnRenamed("c", "cb"), Seq("term"), "full_outer")
      .select(col("term"),
        expr(s"coalesce(ca, 0L) * 1000000L div ${na}L").as("a_ppm"),
        expr(s"coalesce(cb, 0L) * 1000000L div ${nb}L").as("b_ppm"))
      .withColumn("drift_ppm", abs(col("a_ppm") - col("b_ppm")))
  }

  /** The `k` most-drifted terms by (drift_ppm DESC, term ASC) — the
    * triage list a monitoring alert carries. */
  def topDrift(a: DataFrame, b: DataFrame, textCol: String,
               k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    vocabDrift(a, b, textCol)
      .orderBy(col("drift_ppm").desc, col("term").asc)
      .limit(k)
  }

  /** Scalar total variation distance in ppm (halved sum of per-term
    * drift): 0 = identical term distributions, 10⁶ = disjoint. The
    * floor divisions make this a deterministic LOWER bound on exact TV
    * (each summand floors twice), which is the right direction for an
    * alert threshold — it never cries wolf from rounding. */
  def totalVariationPpm(a: DataFrame, b: DataFrame, textCol: String): Long =
    vocabDrift(a, b, textCol)
      .agg(sum(col("drift_ppm"))).head().getLong(0) / 2
}
