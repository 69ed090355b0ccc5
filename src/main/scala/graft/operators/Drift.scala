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
  * Scale shape: ONE pass — both sides union with a side tag, tokens
  * explode in-scan, and a single map-side-combined (term) aggregate
  * emits both counts per term via conditional sums, so there is no
  * vocabulary join at all and exactly one exchange (vocab-sized,
  * orders of magnitude under the token stream). The two totals come
  * off the checkpointed vocab in one scalar read and ride as literals.
  * Top-k is a TakeOrderedAndProject, never a full sort.
  */
object Drift {

  /** Full per-term drift table: (term, a_ppm, b_ppm, drift_ppm), one row
    * per term of the union vocabulary.
    *
    * ONE pass over both corpora: the sides union with a tag, one
    * map-side-combined (term) aggregate emits both counts per term
    * (conditional sums — no join, no second exchange), and the two
    * totals come off the checkpointed vocab in a single scalar read. */
  def vocabDrift(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    val tagged = a.select(explode(tokens(col(textCol))).as("term"),
        lit(1L).as("_sa"))
      .unionAll(b.select(explode(tokens(col(textCol))).as("term"),
        lit(0L).as("_sa")))
    val counts = tagged.groupBy("term")
      .agg(sum(col("_sa")).as("ca"),
        sum(lit(1L) - col("_sa")).as("cb"))
      .localCheckpoint(true) // feeds the totals AND the drift projection
    val t = counts.agg(sum(col("ca")), sum(col("cb"))).head()
    val (na, nb) = (t.getLong(0), t.getLong(1))
    require(na > 0 && nb > 0, "both corpora must contain tokens")
    counts
      .select(col("term"),
        expr(s"ca * 1000000L div ${na}L").as("a_ppm"),
        expr(s"cb * 1000000L div ${nb}L").as("b_ppm"))
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
