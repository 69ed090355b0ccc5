package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The sketch tier of the aggregation family — the 100 TB answer when
  * exact distinct/percentile/frequency aggregation is the bottleneck:
  *
  *  - exact `countDistinct` shuffles every distinct key (two exchanges,
  *    state proportional to cardinality); HyperLogLog++
  *    (`approx_count_distinct`, codegen'd, mergeable fixed-size state)
  *    costs one scan and kilobytes per group at a declared relative
  *    standard deviation.
  *  - exact percentiles need a sort or full value collection;
  *    `percentile_approx` (Greenwald-Khanna style) bounds state by the
  *    accuracy knob.
  *  - exact heavy-hitter counts need a full groupBy over ALL keys;
  *    a Count-Min Sketch aggregates into a fixed eps×confidence grid and
  *    answers point estimates with one-sided error (never undercounts).
  *
  * All three are Spark built-ins — declared here as the library's
  * documented scale path with their error contracts SPEC-PINNED against
  * exact computation on real data (no SQL oracle: DuckDB's approximate
  * aggregates use different algorithms, so cross-engine hash parity is
  * impossible by construction; the driver records a rows-only check for
  * the query surface and SketchesSpec carries the accuracy evidence).
  */
object Sketches {

  /** Per-group sketch statistics next to their exact-cost cousins:
    * (groupCol, n_rows, approx_distinct, approx_median). One scan, one
    * group-key exchange carrying fixed-size sketch state. */
  def groupStats(df: DataFrame, groupCol: String, distinctCol: String,
                 numCol: String, rsd: Double = 0.05,
                 percentileAccuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        approx_count_distinct(col(distinctCol), rsd).as("approx_distinct"),
        // percentile_approx preserves the input type; cast for a stable
        // output contract regardless of the numeric column's type
        percentile_approx(col(numCol), lit(0.5), lit(percentileAccuracy))
          .cast("double").as("approx_median"))

  /** The exact cousin of [[groupStats]], priced at what the sketches
    * avoid: `countDistinct` shuffles every distinct key (state grows with
    * cardinality) and the exact median ranks every group member (a second
    * full-width exchange on the group key). Runs on the small strata
    * where exactness is affordable — and doubles as the oracle-checkable
    * scaffolding proof for the sketch tier, whose own outputs can never
    * hash-match a foreign engine (q69 vs q68).
    *
    * The median is the LOW median (element at rank ⌈n/2⌉ by `numCol`),
    * an order statistic of the actual values — integer-exact and
    * engine-portable, where interpolated medians average two values in
    * float arithmetic. Ties on `numCol` leave row_number free to permute
    * equal VALUES, so the picked value is still deterministic. */
  def exactGroupStats(df: DataFrame, groupCol: String, distinctCol: String,
                      numCol: String): DataFrame = {
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val ranked = df.select(col(groupCol), col(distinctCol), col(numCol))
      .withColumn("_rn", row_number().over(byGroup.orderBy(col(numCol))).cast("long"))
      .withColumn("_cnt", count(lit(1)).over(byGroup))
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(distinctCol)).as("exact_distinct"),
        max(when(col("_rn") === expr("(_cnt + 1) div 2"),
          col(numCol))).cast("long").as("exact_median_low"))
  }

  /** EXACT global quantiles by DISTRIBUTION COMPRESSION — the scale path
    * for exact percentiles over low-cardinality numerics (token counts,
    * scores, lengths): instead of sorting the corpus (what a naive exact
    * quantile costs) or accepting sketch error (`percentile_approx`),
    * aggregate the VALUE HISTOGRAM first — one map-side-combining groupBy
    * whose output is bounded by the number of DISTINCT VALUES, not rows —
    * then rank the histogram. The only ordered pass runs over that bounded
    * table (same economics as the repo's ≤-`buckets` aggregations), so
    * 100 TB of documents with token counts under a million compresses to a
    * sub-million-row histogram before anything sorts.
    *
    * Quantile definition: type-1 / lower quantile — the smallest value v
    * with `cum_count(v) ≥ ⌈pct·n/100⌉`, stated in multiplication form
    * (`100·cum ≥ pct·n`) so the arithmetic is integer-exact and
    * engine-portable (no float ranks, no interpolation averaging two
    * values). NULL values are excluded (they have no rank); `valueCol`
    * must be integral-castable. Output: (pct, value), one row per
    * requested percentile. */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     pcts: Seq[Int]): DataFrame =
    quantilesOfHist(
      df.filter(col(valueCol).isNotNull)
        .groupBy(col(valueCol).cast("long").as("v"))
        .agg(count(lit(1)).as("c")),
      pcts)

  /** The rank half of [[exactQuantiles]], reusable over any (v, c) value
    * histogram (the streaming additive store hands its merged view here).
    * The single-partition window and both cross joins run over the
    * BOUNDED histogram / scalar total / pct literals — never corpus
    * rows. */
  def quantilesOfHist(hist: DataFrame, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty, "pass at least one percentile")
    require(pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $pcts")
    require(pcts.distinct.size == pcts.size, s"duplicate percentiles: $pcts")
    val spark = hist.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    hist.withColumn("cc", sum(col("c")).over(w))
      .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"))))
      .crossJoin(broadcast(pcts.toDF("pct")))
      .filter(col("cc") * 100 >= col("pct") * col("n"))
      .groupBy(col("pct")).agg(min(col("v")).as("value"))
  }

  /** Per-GROUP [[exactQuantiles]] — the same distribution compression,
    * partitioned: the histogram groups by (group, value) and the rank
    * windows partition by group, so nothing is single-partition at any
    * group count. Two exchanges — the (group, value) groupBy and a
    * group-keyed repartition for the windows (hash(g, v) cannot serve
    * `partitionBy(g)`; both windows share the second partitioning) —
    * but BOTH move histogram rows, bounded by groups × distinct values,
    * never corpus rows. Output: (groupCol, pct, value). Same
    * type-1/multiplication-form/NULL contract as the global operator. */
  def exactGroupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                          pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty, "pass at least one percentile")
    require(pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $pcts")
    require(pcts.distinct.size == pcts.size, s"duplicate percentiles: $pcts")
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val byG = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    val w = byG.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    hist.withColumn("cc", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(byG))
      .crossJoin(broadcast(pcts.toDF("pct")))
      .filter(col("cc") * 100 >= col("pct") * col("n"))
      .groupBy(col(groupCol), col("pct")).agg(min(col("v")).as("value"))
  }

  /** Count-Min point estimates for a candidate item set: ONE pass builds
    * the fixed-size sketch (no per-key shuffle state), the driver reads
    * the (tiny) sketch and answers each candidate. Estimates are
    * one-sided: `est >= true count`, and `est <= true + eps·N` with
    * probability `confidence`. The candidate list is driver-bounded by
    * contract (heavy-hitter verification, not enumeration). */
  def heavyHitterEstimates(df: DataFrame, itemCol: String,
                           candidates: Seq[String], eps: Double = 0.001,
                           confidence: Double = 0.99,
                           seed: Int = 42): DataFrame = {
    require(candidates.nonEmpty, "pass at least one candidate item")
    // the sketch hashes the column's NATIVE values; string candidates
    // queried against a non-string-built sketch hash differently and
    // silently undercount — cast upstream instead
    require(df.schema(itemCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"itemCol '$itemCol' must be STRING to match the string candidates " +
        s"(got ${df.schema(itemCol).dataType}) — cast it first")
    val sketch = df.stat.countMinSketch(itemCol, eps, confidence, seed)
    val spark = df.sparkSession
    val rows = candidates.map(c => Row(c, sketch.estimateCount(c)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("est_count",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
