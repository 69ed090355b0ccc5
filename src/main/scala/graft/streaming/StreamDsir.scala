package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Mixing

/** DSIR importance weighting under continuous ingestion — the q99
  * scorer as a stream stage, with the contract an online importance
  * sampler has to make explicit: the DISTRIBUTION BOOKS FREEZE at
  * binder creation. Both the target book (the reference slice — frozen
  * by definition) and the RAW book (the seed corpus the binder is built
  * over) are computed ONCE (`Mixing.dsirRatio`, two bounded bucket
  * aggregations) and every micro-batch then scores against them
  * statelessly (`Mixing.dsirScoreWith`: in-scan, zero shuffles, no
  * store).
  *
  * Why frozen, not accumulated: letting the raw book track the stream
  * would make a document's weight depend on WHEN it arrived (the same
  * text scores differently in batch 3 and batch 300), so shipped
  * weights would be unstable under replay and incomparable across the
  * corpus — the exact property q100's epoch artifacts and the split
  * tier's first-writer claims exist to prevent. Frozen books make
  * scoring pure: replays are bit-identical, a batch's weights never
  * change after shipment, and batch-vs-stream parity is exact
  * (StreamDsirSpec). The honest residual is RAW-DISTRIBUTION DRIFT:
  * when the live stream drifts from the seed corpus the ratios go
  * stale — measure it with [[StreamDrift.monitor]] over the same
  * hashed features and re-derive the binder per release (the batch
  * q99 remains ground truth), exactly the reconcile discipline the
  * split tier uses.
  */
object StreamDsir {

  /** Build the frozen-book scorer. `seedRaw` is the corpus the raw
    * distribution freezes over; `target` the reference slice. The
    * returned function is pure — use it in `foreachBatch` or a plain
    * `transform`. */
  def scorer(seedRaw: DataFrame, target: DataFrame, idCol: String,
             textCol: String, buckets: Int = 1024, maxFeatures: Int = 64,
             ngram: Int = 1): DataFrame => DataFrame = {
    val ratio = Mixing.dsirRatio(seedRaw, textCol, target, textCol,
      buckets, ngram)
    (batch: DataFrame) =>
      Mixing.dsirScoreWith(batch, idCol, textCol, ratio, maxFeatures, ngram)
  }

  /** The frozen-book SAMPLER (q103's weight-proportional ppm gate as a
    * stream stage): the ratio book AND the normalization base freeze
    * over the seed corpus — `basePpm = budgetPerSeed·10⁹ div Σ w_milli
    * (seed)` — so every document's keep rate is a pure function of its
    * content, independent of arrival time (replays keep identical
    * rows; a batch equal to the seed corpus keeps exactly the q103
    * set — StreamDsirSpec pins both). `budgetPerSeed` is the expected
    * kept count per seed-corpus volume: a stream slice keeps
    * proportionally to its volume × its target-likeness relative to
    * the seed (the honest semantics of a frozen rate; the raw-drift
    * caveat of the scorer applies to the base too — re-derive per
    * release). */
  def sampler(seedRaw: DataFrame, target: DataFrame, idCol: String,
              textCol: String, budgetPerSeed: Long, buckets: Int = 1024,
              maxFeatures: Int = 64, ngram: Int = 1,
              maxW: Double = 1000.0): DataFrame => DataFrame = {
    val ratio = Mixing.dsirRatio(seedRaw, textCol, target, textCol,
      buckets, ngram)
    val basePpm = Mixing.dsirBasePpm(seedRaw, textCol, ratio,
      budgetPerSeed, maxFeatures, ngram, maxW)
    (batch: DataFrame) =>
      Mixing.dsirSampleWith(batch, idCol, textCol, ratio, basePpm,
        maxFeatures, ngram, maxW)
  }
}
